"""LLM-scale training-data pipeline operators: deduplication,
similarity search, text analysis, multimodal column handling.

Everything here is built for the 100 TB regime: JVM-side expressions
(no Python in hot paths), equi-join-shaped candidate generation for
near-dup (never O(n²) pair enumeration), and broadcast-based ANN
probing."""
