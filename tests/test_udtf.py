"""Python UDTFs (Spark 4 user-defined table functions) as a custom-
operator mechanism: a chunker UDTF must emit exactly the rows of the
oracle-gated expression-based x_doc_chunking — same chunking logic
expressed as a table function, lateral-joined per document."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import lit, udtf

from sql_to_dbsp_compiler_spark.queries import REGISTRY
from sql_to_dbsp_compiler_spark.sources.tables import load_table


@udtf(returnType="chunk_idx bigint, chunk_start bigint, chunk_len bigint")
class ChunkUdtf:
    def eval(self, text: str, size: int, stride: int):
        n = len(text or "")
        start = 0
        idx = 0
        while start == 0 or start < n:
            yield idx, start, min(size, max(n - start, 0))
            idx += 1
            start += stride
            if n <= 1:
                break


def test_chunk_udtf_matches_expression_chunker(spark, sf_correct_dir):
    from sql_to_dbsp_compiler_spark.queries.pipeline2 import (
        _CHUNK_SIZE,
        _CHUNK_STRIDE,
    )

    spark.udtf.register("chunk_udtf", ChunkUdtf)
    d = load_table(spark, sf_correct_dir, "documents")
    d.createOrReplaceTempView("docs_udtf")
    got = spark.sql(
        f"""
        SELECT d.doc_id, c.chunk_idx, c.chunk_start, c.chunk_len
        FROM docs_udtf d,
        LATERAL chunk_udtf(d.text, {_CHUNK_SIZE}, {_CHUNK_STRIDE}) c
        """
    )
    want = REGISTRY["x_doc_chunking"].fn(spark, sf_correct_dir).select(
        "doc_id", "chunk_idx", "chunk_start", "chunk_len"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
