"""Round-2 corpus-prep additions: tokenizer apply, boilerplate removal,
Zipf fit, SemDeDup, per-user anomaly screen (operators/text.py,
operators/dedup.py)."""

import hashlib
import math

from pyspark.sql import functions as F

from faust_spark.operators.dedup import semantic_dedup
from faust_spark.operators.text import (
    build_vocab,
    remove_boilerplate,
    tokenize_with_vocab,
    zipf_stats,
)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# ---------------------------------------------------------------- tokenize


def test_tokenize_with_vocab_known(spark):
    docs = spark.createDataFrame(
        [(1, "a b a c"), (2, "b q q q")], "doc_id int, text string"
    )
    vocab = spark.createDataFrame(
        [("a", 0), ("b", 1), ("c", 2)], "term string, token_id int"
    )
    rows = {r.doc_id: r for r in tokenize_with_vocab(docs, vocab).collect()}
    assert rows[1].n_tokens == 4 and rows[1].n_oov == 0
    assert rows[1].token_ids == [0, 1, 0, 2]  # document order preserved
    assert rows[2].n_tokens == 4 and rows[2].n_oov == 3
    assert rows[2].token_ids == [1]  # OOV dropped, in-vocab kept


def test_tokenize_with_vocab_all_oov(spark):
    docs = spark.createDataFrame([(1, "x y")], "doc_id int, text string")
    vocab = spark.createDataFrame([("a", 0)], "term string, token_id int")
    r = tokenize_with_vocab(docs, vocab).collect()[0]
    assert r.n_oov == 2 and r.token_ids == []


def test_tokenize_roundtrip_with_built_vocab(spark):
    """Vocab built from the corpus: every non-OOV id decodes back to the
    original term sequence."""
    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat") for i in range(4)],
        "doc_id int, text string",
    )
    vocab = build_vocab(docs, min_freq=1)
    id2term = {r.token_id: r.term for r in vocab.collect()}
    r = tokenize_with_vocab(docs, vocab).filter(F.col("doc_id") == 0).collect()[0]
    assert r.n_oov == 0
    assert [id2term[i] for i in r.token_ids] == "the cat sat on the mat".split()


# ------------------------------------------------------------ boilerplate


def test_remove_boilerplate_strips_shared_chunks(spark):
    # "h1 h2 h3" is a shared header chunk (docs 1 and 2); tails differ.
    docs = spark.createDataFrame(
        [
            (1, "h1 h2 h3 u1 u2 u3"),
            (2, "h1 h2 h3 v1 v2 v3"),
            (3, "w1 w2 w3 w4 w5 w6"),
        ],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r for r in remove_boilerplate(docs, size=3).collect()}
    assert rows[1].n_chunks == 2 and rows[1].n_kept == 1
    assert rows[1].clean_hash == _md5("u1 u2 u3")
    assert rows[2].clean_hash == _md5("v1 v2 v3")
    # untouched doc keeps everything, reassembled in order
    assert rows[3].n_kept == 2
    assert rows[3].clean_hash == _md5("w1 w2 w3 w4 w5 w6")


def test_remove_boilerplate_fully_boilerplate_doc(spark):
    docs = spark.createDataFrame(
        [(1, "h1 h2 h3"), (2, "h1 h2 h3")], "doc_id int, text string"
    )
    for r in remove_boilerplate(docs, size=3).collect():
        assert r.n_kept == 0 and r.clean_hash == _md5("")


def test_remove_boilerplate_ragged_tail_chunk(spark):
    """Last chunk shorter than size is still a chunk (slice clips)."""
    docs = spark.createDataFrame([(1, "a b c d")], "doc_id int, text string")
    r = remove_boilerplate(docs, size=3).collect()[0]
    assert r.n_chunks == 2 and r.n_kept == 2
    assert r.clean_hash == _md5("a b c d")


# ------------------------------------------------------------------ zipf


def test_zipf_slope_on_exact_zipf_corpus(spark):
    """freq(rank) = C / rank → ln-ln slope exactly -1 (up to fp noise)."""
    words = []
    for rank in range(1, 21):
        words += [f"w{rank:02d}"] * (2400 // rank)
    docs = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id int, text string"
    )
    r = zipf_stats(docs, min_freq=1).collect()[0]
    assert r.n_terms == 20
    assert abs(r.slope - (-1.0)) < 0.02
    assert abs(r.intercept - math.log(2400)) < 0.05


def test_zipf_slope_partitioning_invariant(spark):
    docs = spark.createDataFrame(
        [(i, "alpha beta beta gamma gamma gamma gamma") for i in range(20)],
        "doc_id int, text string",
    )
    a = zipf_stats(docs, min_freq=1).collect()[0]
    b = zipf_stats(docs.repartition(7), min_freq=1).collect()[0]
    assert (a.slope, a.intercept) == (b.slope, b.intercept)


# ------------------------------------------------------------ classifier


def test_classifier_score_known_logit(spark):
    from faust_spark.operators.text import classifier_score

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat")], "doc_id int, text string"
    )
    r = classifier_score(
        docs, weights={"stop_ratio": 2.0}, bias=-0.5
    ).collect()[0]
    # STOPWORDS hits in "the cat sat on the mat": "the" x2 -> ratio 2/6
    assert abs(r.logit - (-0.5 + 2.0 * (2 / 6))) < 1e-12
    assert bool(r.keep) is (r.logit > 0)


def test_classifier_score_rejects_unknown_feature(spark):
    import pytest as _pytest

    from faust_spark.operators.text import classifier_score

    docs = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    with _pytest.raises(ValueError):
        classifier_score(docs, weights={"nope": 1.0}, bias=0.0)


def test_classifier_partitioning_invariant(spark):
    from faust_spark.operators.text import classifier_score

    docs = spark.createDataFrame(
        [(i, f"the quick brown fox {i} jumps of and to") for i in range(40)],
        "doc_id int, text string",
    )
    kw = dict(
        weights={
            "ln_tokens": 0.35,
            "mean_word_len": 0.25,
            "stop_ratio": 6.0,
            "alpha_ratio": 1.2,
        },
        bias=-3.65,
    )
    a = {r.doc_id: r.logit for r in classifier_score(docs, **kw).collect()}
    b = {
        r.doc_id: r.logit
        for r in classifier_score(docs.repartition(7), **kw).collect()
    }
    assert a == b


# -------------------------------------------------------------- semdedup


def test_semantic_dedup_flags_near_dup_keeps_min_id(spark):
    cents = [[1.0, 0.0], [0.0, 1.0]]
    rows = [
        (1, [1.0, 0.05]),  # cell 0, keeper (lowest id)
        (2, [1.0, 0.06]),  # cell 0, near-dup of 1 → flagged
        (3, [0.05, 1.0]),  # cell 1, keeper
        (4, [1.0, -0.9]),  # cell 0 but far from 1/2 → kept
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    out = {r.vec_id: r for r in semantic_dedup(df, cents, threshold=0.98).collect()}
    assert len(out) == 4  # every input row present, flag not filter
    assert not out[1].is_dup and out[2].is_dup
    assert not out[3].is_dup and not out[4].is_dup
    assert out[1].cell == 0 and out[3].cell == 1


def test_semantic_dedup_no_cross_cell_comparison(spark):
    """Identical vectors in different cells are NOT compared — the
    SemDeDup contract (and what caps the quadratic term)."""
    cents = [[1.0, 0.0], [-1.0, 0.0]]
    df = spark.createDataFrame(
        [(1, [0.9, 0.1]), (2, [-0.9, -0.1])],
        "vec_id int, embedding array<float>",
    )
    # threshold=-2 flags ANY compared pair — rows stay clean only because
    # the equi-join on cell never pairs them
    out = semantic_dedup(df, cents, threshold=-2.0).collect()
    assert all(not r.is_dup for r in out)
