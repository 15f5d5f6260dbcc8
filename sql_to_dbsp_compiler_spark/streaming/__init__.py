"""Incremental view maintenance via Structured Streaming.

The reference compiles SQL views to DBSP circuits that consume change
streams and emit output changes. The Spark-native equivalent: the SAME
DataFrame plan runs over a stream source with state kept in the
streaming state store; correctness criterion (asserted in tests) is
DBSP's own: streaming the input in pieces must produce the batch
result."""
