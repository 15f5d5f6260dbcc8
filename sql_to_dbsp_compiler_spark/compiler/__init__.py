from .program import SqlProgram, TableDef, ViewDef, compile_batch, IncrementalProgram

__all__ = ["SqlProgram", "TableDef", "ViewDef", "compile_batch", "IncrementalProgram"]
