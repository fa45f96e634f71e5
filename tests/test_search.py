"""BM25 search: hand-computed scores, postings, plan shape."""

import math

from pyspark.sql import functions as F

from faust_spark.catalog import load_table
from faust_spark.operators.search import bm25_topk, postings


def _bm25(tf, df, n, dl, avgdl, k1=1.2, b=0.75):
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))


def test_bm25_matches_hand_computation(spark):
    rows = [
        (1, "cat dog cat fish"),
        (2, "dog dog dog dog"),
        (3, "cat cat cat cat cat cat cat cat"),
        (4, "bird fish"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r.doc_id: (r.n_terms, r.score, r.rank)
        for r in bm25_topk(docs, ["cat", "fish"], k=10).collect()
    }
    n, avgdl = 4, (4 + 4 + 8 + 2) / 4.0
    exp = {
        1: _bm25(2, 2, n, 4, avgdl) + _bm25(1, 2, n, 4, avgdl),
        3: _bm25(8, 2, n, 8, avgdl),
        4: _bm25(1, 2, n, 2, avgdl),
    }
    assert set(out) == set(exp)  # doc 2 matches no query term
    for d, s in exp.items():
        assert abs(out[d][1] - s) < 1e-9, d
    ranks = {d: r for d, (_, _, r) in out.items()}
    want = sorted(exp, key=lambda d: (-exp[d], d))
    assert [d for d, _ in sorted(ranks.items(), key=lambda kv: kv[1])] == want


def test_bm25_deterministic_and_capped(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    a = bm25_topk(d, ["dup", "hash"], k=5).select("doc_id", "rank")
    b = bm25_topk(d, ["dup", "hash"], k=5).select("doc_id", "rank")
    assert a.subtract(b).count() == 0
    assert a.count() <= 5


def test_postings_tf_counts(spark):
    docs = spark.createDataFrame([(1, "a b a"), (2, "b")], ["doc_id", "text"])
    got = {
        (r.term, r.doc_id): r.tf for r in postings(docs).collect()
    }
    assert got == {("a", 1): 2, ("b", 1): 1, ("b", 2): 1}


def test_bm25_plan_is_take_ordered(spark, sf_dir):
    """Global top-k must plan as TakeOrderedAndProject, not a global sort."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    plan = (
        bm25_topk(d, ["dup"], k=20)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
