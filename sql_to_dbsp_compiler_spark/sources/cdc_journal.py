"""`cdc_journal` — a custom Python DataSource (Spark 4 datasource
API) that reads an insert/delete changelog journal directly into
Z-set deltas.

Journal format: a directory of `*.jsonl` files, one JSON object per
line: `{"op": "I"|"D", "row": {col: value, ...}}`. The source emits
the row columns plus `__weight` (+1 insert, −1 delete) — exactly the
shape `plans/zset.ZSet` and `compiler.IncrementalProgram.step` take,
so a journal directory IS an incremental-pipeline input:

    spark.dataSource.register(CdcJournalDataSource)
    delta = spark.read.format("cdc_journal").schema(ddl).load(path)
    inc.step({"t": ZSet(delta)})

The reference ingests change streams as native Z-set inputs
(TableContents tracks INSERT/DELETE; circuit inputs are weighted
collections); this source is the Spark-idiomatic equivalent of that
ingest edge, with two production details done properly:

- **Partitioned scan**: one input partition per journal file —
  parallel across executors, no driver-side parse.
- **Filter pushdown** (`pushFilters`): EqualTo / IsNotNull on
  journal columns are applied WHILE scanning lines, so filtered
  changelogs never materialize unmatched rows (Spark re-applies every
  filter after the scan, so over-accepting here is safe — pushdown is
  an optimization, not a correctness gate).

A streaming variant (`DataSourceStreamReader`) tails the directory by
file index with exactly-once offsets: `initialOffset` → file 0,
`latestOffset` → current file count; each micro-batch reads the
[start, end) file range, so a restarted query resumes from its
checkpointed offset without re-emitting deltas.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    InputPartition,
    IsNotNull,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

WEIGHT = "__weight"


@dataclass(frozen=True)
class _FilePartition(InputPartition):
    path: str


def _slot_of(name: str) -> "int | None":
    """Slot index of a journal basename ``j<digits>.jsonl`` — ANY
    digit count (``%06d`` widens past 999999, so 7+-digit names are
    legal), or None for foreign files."""
    stem = name[1:-6]
    return int(stem) if name.startswith("j") and stem.isdigit() else None


def _journal_files(path: str) -> list[str]:
    # Sort numerically by slot, not lexicographically: j1000000.jsonl
    # would sort before j999999.jsonl as a string, replaying commits
    # out of order once the index passes six digits.
    files = [f for f in os.listdir(path) if f.endswith(".jsonl")]
    files.sort(key=lambda f: (_slot_of(f) is None, _slot_of(f) or 0, f))
    return [os.path.join(path, f) for f in files]


def _emit_file(path: str, fields: list[str], accepted) -> "iter":
    """Emit tuples in declared-schema order: ``__weight`` may sit at
    any position in the user's schema (not just last)."""
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            weight = 1 if rec["op"] == "I" else -1
            row = rec["row"]
            if not all(f(row) for f in accepted):
                continue
            yield tuple(
                weight if c == WEIGHT else row.get(c) for c in fields
            )


def _compile_filters(pushed: list[Filter]):
    """Compile the supported filters to row-dict predicates."""
    fns = []
    for f in pushed:
        if isinstance(f, EqualTo):
            col, val = f.attribute[0], f.value
            fns.append(lambda r, c=col, v=val: r.get(c) == v)
        elif isinstance(f, IsNotNull):
            col = f.attribute[0]
            fns.append(lambda r, c=col: r.get(c) is not None)
    return fns


class CdcJournalReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict) -> None:
        self._path = options["path"]
        # full declared field order; _emit_file slots the weight in
        # wherever the schema declares __weight (any position)
        self._fields = [f.name for f in schema.fields]
        self._accepted: list[Filter] = []

    def pushFilters(self, filters: list[Filter]):
        for f in filters:
            if isinstance(f, (EqualTo, IsNotNull)) and len(f.attribute) == 1 \
                    and f.attribute[0] != WEIGHT:
                self._accepted.append(f)
            else:
                yield f  # unsupported — Spark keeps it post-scan

    def partitions(self) -> list[InputPartition]:
        return [_FilePartition(p) for p in _journal_files(self._path)] or [
            _FilePartition("")
        ]

    def read(self, partition: _FilePartition):
        if not partition.path:
            return
        yield from _emit_file(
            partition.path, self._fields, _compile_filters(self._accepted)
        )


class CdcJournalStreamReader(DataSourceStreamReader):
    """Offsets are file indexes into the sorted journal listing: a
    micro-batch covers files [start, end). Files must be appended with
    monotonically sorting names (the journal writer's contract)."""

    def __init__(self, schema: StructType, options: dict) -> None:
        self._path = options["path"]
        self._fields = [f.name for f in schema.fields]

    def initialOffset(self) -> dict:
        return {"index": 0}

    def latestOffset(self) -> dict:
        return {"index": len(_journal_files(self._path))}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        files = _journal_files(self._path)[start["index"]:end["index"]]
        return [_FilePartition(p) for p in files] or [_FilePartition("")]

    def read(self, partition: _FilePartition):
        if not partition.path:
            return
        yield from _emit_file(partition.path, self._fields, [])

    def commit(self, end: dict) -> None:
        pass  # journal files are immutable; nothing to clean up


class CdcJournalDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "cdc_journal"

    def reader(self, schema: StructType) -> CdcJournalReader:
        return CdcJournalReader(schema, self.options)

    def streamReader(self, schema: StructType) -> CdcJournalStreamReader:
        return CdcJournalStreamReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool) -> "CdcJournalWriter":
        return CdcJournalWriter(schema, self.options, overwrite)


@dataclass(frozen=True)
class _WroteFile(WriterCommitMessage):
    tmp_path: str
    rows: int


class CdcJournalWriter(DataSourceWriter):
    """Exactly-once journal sink: each task writes its partition to a
    hidden `.part` temp file and reports it in the commit message; the
    driver's `commit` renames them to the next `jNNN.jsonl` slots in
    one pass. Readers only list `*.jsonl`, so a failed/duplicated task
    attempt never becomes visible — the rename on commit is the
    atomicity boundary (the same manifest idea as the parquet file
    sink). `abort` deletes the temps.

    Single-writer assumption: concurrent commits to the same journal
    directory are NOT coordinated (slot numbering reads the directory
    listing); run one writer at a time per journal, like a parquet
    directory sink. Overwrite mode renames the NEW files into place
    first and deletes the old files last, so a crash mid-commit can
    leave old+new visible (a duplicated window, recoverable) but never
    an empty journal."""

    def __init__(self, schema: StructType, options: dict, overwrite: bool) -> None:
        self._path = options["path"]
        self._cols = [f.name for f in schema.fields if f.name != WEIGHT]
        self._has_weight = any(f.name == WEIGHT for f in schema.fields)
        self._overwrite = overwrite
        os.makedirs(self._path, exist_ok=True)

    def write(self, iterator) -> _WroteFile:
        import uuid

        tmp = os.path.join(self._path, f".{uuid.uuid4().hex}.part")
        n = 0
        with open(tmp, "w") as fh:
            for row in iterator:
                d = row.asDict()
                w = int(d.pop(WEIGHT, 1)) if self._has_weight else 1
                op = "I" if w > 0 else "D"
                for _ in range(abs(w)):
                    fh.write(json.dumps({"op": op, "row": d}) + "\n")
                    n += 1
        return _WroteFile(tmp, n)

    def commit(self, messages) -> None:
        # Slot numbering from the max existing index (not len()): a
        # prior overwrite leaves gaps, and len() could re-issue a live
        # slot name. New files land before old ones are removed, so a
        # crash between the two loops never loses the journal.
        old = _journal_files(self._path)
        slots = [
            s for f in old if (s := _slot_of(os.path.basename(f))) is not None
        ]
        start = max(slots, default=-1) + 1
        for i, m in enumerate(sorted(messages, key=lambda m: m.tmp_path)):
            os.rename(
                m.tmp_path, os.path.join(self._path, f"j{start + i:06d}.jsonl")
            )
        if self._overwrite:
            for f in old:
                os.remove(f)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)
