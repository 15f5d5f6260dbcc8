from .program import (
    IncrementalProgram,
    SqlProgram,
    TableDef,
    ViewDef,
    compile_batch,
    compile_streaming,
)

__all__ = [
    "SqlProgram",
    "TableDef",
    "ViewDef",
    "compile_batch",
    "compile_streaming",
    "IncrementalProgram",
]
