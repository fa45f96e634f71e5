"""Bloom-filter sketch operators (operators/sketch.py)."""

from pyspark.sql import functions as F

from faust_spark.operators.sketch import (
    bloom_build,
    bloom_might_contain,
    bloom_prefilter_dedup,
)


def test_bloom_no_false_negatives_and_low_fp(spark):
    corpus = spark.range(0, 2000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    bloom = bloom_build(corpus, "k", m_bits=1 << 16, k_hashes=4)
    assert len(bloom) == (1 << 16) // 64
    # every member must test positive (Bloom guarantees no false negatives)
    members = bloom_might_contain(corpus, "k", bloom)
    assert members.filter(~F.col("__might_contain")).count() == 0
    # non-members: false-positive rate stays near the design point
    # (n=2000, m=65536, k=4 → ~0.3%; assert well under 5%)
    others = spark.range(10_000, 14_000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    fp = (
        bloom_might_contain(others, "k", bloom)
        .filter(F.col("__might_contain"))
        .count()
    )
    assert fp < 200, f"false-positive rate too high: {fp}/4000"


def test_bloom_prefilter_dedup_matches_exact_antijoin(spark):
    # corpus keys 0..999; batch keys 500..1499 → admitted = 1000..1499
    corpus = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id")).alias("text"),
    )
    batch = spark.range(500, 1500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id")).alias("text"),
    )
    admitted = bloom_prefilter_dedup(batch, corpus, key="text")
    got = sorted(r.doc_id for r in admitted.collect())
    assert got == list(range(1000, 1500))
    # expression keys work too (content identity via md5)
    admitted2 = bloom_prefilter_dedup(batch, corpus, key=F.md5("text"))
    assert sorted(r.doc_id for r in admitted2.collect()) == got


def test_bloom_membership_is_codegen_no_corpus_join(spark):
    """The screen itself must be a broadcast + filter — the corpus
    appears in the plan only through the (already-collected) bitmap."""
    corpus = spark.range(0, 100).select(F.col("id").cast("string").alias("k"))
    bloom = bloom_build(corpus, "k", m_bits=1 << 10)
    screened = bloom_might_contain(
        spark.range(0, 10).select(F.col("id").cast("string").alias("k")),
        "k",
        bloom,
    )
    plan = screened._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "Broadcast" in plan
    assert "SortMergeJoin" not in plan
