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


def test_bm25_multi_matches_single_query_form(spark):
    """bm25_multi_topk for one query == bm25_topk with that query's
    distinct tokens (same scores, same ranks)."""
    from faust_spark.operators.search import bm25_multi_topk

    rows = [
        (1, "cat dog cat fish"),
        (2, "dog dog dog dog"),
        (3, "cat cat cat cat cat cat cat cat"),
        (4, "bird fish"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    q = spark.createDataFrame([(99, "cat fish cat")], ["qid", "text"])
    multi = {
        r.doc_id: (r.n_terms, r.score, r.rank)
        for r in bm25_multi_topk(docs, q, k=10).collect()
    }
    single = {
        r.doc_id: (r.n_terms, r.score, r.rank)
        for r in bm25_topk(docs, ["cat", "fish"], k=10).collect()
    }
    assert set(multi) == set(single)
    for d in single:
        assert multi[d][0] == single[d][0]
        assert abs(multi[d][1] - single[d][1]) < 1e-12
        assert multi[d][2] == single[d][2]


def test_bm25_multi_exclude_self(spark):
    from faust_spark.operators.search import bm25_multi_topk

    rows = [(1, "cat dog"), (2, "cat bird"), (3, "dog bird")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    q = docs.select(F.col("doc_id").alias("qid"), "text")
    out = bm25_multi_topk(docs, q, k=10, exclude_self=True).collect()
    assert all(r.qid != r.doc_id for r in out)
    assert {r.qid for r in out} == {1, 2, 3}


def test_rrf_fuse_hand_computed(spark):
    """RRF on two hand-built rankings: fused order follows
    1/(60+r1)+1/(60+r2), absent-from-one-list contributes one term."""
    from faust_spark.operators.search import rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)], ["qid", "doc_id", "rank"]
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2), (1, 10, 3)], ["qid", "doc_id", "rank"]
    )
    out = {
        r.doc_id: r.fused_rank
        for r in rrf_fuse([a, b], k=10).collect()
    }
    score = {
        10: 1 / 61 + 1 / 63,
        11: 1 / 62 + 1 / 61,
        12: 1 / 63,
        13: 1 / 62,
    }
    want = sorted(score, key=lambda d: (-score[d], d))
    got = [d for d, _ in sorted(out.items(), key=lambda kv: kv[1])]
    assert got == want


def test_mmr_rerank_matches_numpy_reference_and_diversifies(spark):
    """MMR greedy selection pinned against a pure-numpy reference; a
    duplicated top hit must not be selected twice in the top ranks."""
    import numpy as np

    from pyspark.sql import functions as F

    from faust_spark.operators.search import mmr_rerank

    rng = np.random.default_rng(3)
    V = rng.normal(size=(12, 16))
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    V[1] = V[0]  # candidate 1 duplicates candidate 0
    rel = np.linspace(1.0, 0.4, 12)
    rel[1] = 0.99  # near-top relevance for the duplicate
    rows = [
        (7, int(i), float(rel[i]), [float(x) for x in V[i]])
        for i in range(12)
    ]
    df = spark.createDataFrame(
        rows, "qid long, nid long, score double, embedding array<double>"
    )
    got = [
        (r.nid, r.mmr_rank)
        for r in mmr_rerank(df, k=5, lam=0.6)
        .orderBy("mmr_rank")
        .collect()
    ]

    # pure-python greedy reference
    lam = 0.6
    chosen, max_sim = [], np.full(12, -np.inf)
    for _ in range(5):
        mmr = lam * rel - (1 - lam) * np.where(
            np.isfinite(max_sim), max_sim, 0.0
        )
        mmr[chosen] = -np.inf
        i = int(np.argmax(mmr))
        chosen.append(i)
        max_sim = np.maximum(max_sim, V @ V[i])
    assert [n for n, _ in got] == chosen
    # the duplicate (nid 1, cos=1 to rank-1 pick) is pushed out of top-5
    assert 1 not in [n for n, _ in got]
    assert [r for _, r in got] == [1, 2, 3, 4, 5]


def test_mmr_round_dp_matches_raw_selection(spark):
    """round_dp=9 (the engine-portable argmax the oracle unrolls) picks
    the same sequence as the raw-float argmax whenever scores are
    separated by more than the rounding grid — i.e. on any non-adversarial
    data the two modes are the same operator."""
    import numpy as np

    rng = np.random.RandomState(7)
    rows = []
    for qid in range(3):
        for nid in range(12):
            v = rng.randn(8).astype("float32")
            rows.append((qid, nid, [float(x) for x in v]))
    emb = spark.createDataFrame(
        rows, "qid int, nid int, embedding array<float>"
    )
    from faust_spark.operators.search import mmr_rerank
    from faust_spark.operators.similarity import cosine_expr

    q = emb.filter(F.col("nid") == 0).select(
        "qid", F.col("embedding").alias("qv")
    )
    cands = (
        emb.filter(F.col("nid") > 0)
        .join(q, "qid")
        .select(
            "qid",
            "nid",
            cosine_expr(F.col("qv"), F.col("embedding")).alias("score"),
            "embedding",
        )
    )

    def seq(df):
        return sorted(
            (r.qid, r.mmr_rank, r.nid) for r in df.collect()
        )

    raw = seq(mmr_rerank(cands, k=4, lam=0.7))
    portable = seq(mmr_rerank(cands, k=4, lam=0.7, round_dp=9))
    assert raw == portable
