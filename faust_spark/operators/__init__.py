"""Operators beyond the reference's surface: the LLM-data-pipeline layer.

- :mod:`faust_spark.operators.dedup` — exact, MinHash+LSH, SimHash,
  n-gram Jaccard, embedding-cosine near-duplicate detection.
- :mod:`faust_spark.operators.similarity` — ANN over embedding columns
  (brute-force cosine top-k baseline; hyperplane-LSH bucketed scale path).
- :mod:`faust_spark.operators.text` — language ID, quality scoring, token
  counting, document fingerprinting.
- :mod:`faust_spark.operators.multimodal` — opaque binary columns with
  typed metadata; decode/feature steps as Arrow-batched pandas UDFs.

All deterministic hashing uses md5 (identical across Spark, DuckDB, and
Python) so every operator can be oracle-checked.
"""
