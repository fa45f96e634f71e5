"""Keyword search (BM25) over document tables.

The retrieval step of a training-data pipeline: targeted corpus probes
("find documents about X"), quality-list mining, and the candidate
generator for hard-negative mining.  Everything is JVM-side column
expressions — no UDF — so scoring stays inside whole-stage codegen.

Scale design: a query's term set is tiny, so term matching is a map-side
``isin`` filter on the exploded token stream — the corpus is scanned
ONCE and never joined against itself.  Document frequencies come from
the matched postings themselves (one partial-agg shuffle keyed by term,
broadcast back), and the corpus-wide (N, avgdl) statistics are a one-row
broadcast.  Global top-k is ``orderBy().limit(k)`` — Spark plans
TakeOrderedAndProject (per-partition heaps, no global sort).

For repeated querying at 100 TB you materialize :func:`postings` once,
bucketed by term (``storage.write_bucketed``): each query then reads
only its terms' buckets instead of re-scanning the corpus.

Score determinism: BM25 uses ln() — engines can differ in the last ulp,
so scores are returned for inspection but cross-engine verification
should compare (doc, rank) with the deterministic (score DESC, doc_id)
tie-break, the same contract as ``similarity.cosine_topk``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(term, doc, tf) postings — the inverted-index relation.

    Written bucketed by ``term`` this is a distributed inverted index:
    a query's lookup reads only the buckets its terms hash into.
    """
    toks = docs.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
    )
    return toks.groupBy("term", id_col).agg(F.count(F.lit(1)).alias("tf"))


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k documents for a bag-of-words query.

    Returns (id, n_terms, score, rank): matched-term count, BM25 score,
    and the global rank under (score DESC, id).  One corpus scan; the
    only shuffles are the (doc, term) tf aggregation and the final top-k.
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    toks = F.split(F.col(text_col), " ")
    base = docs.select(
        F.col(id_col),
        F.size(toks).alias("dl"),
        F.explode(F.filter(toks, lambda w: w.isin(*terms))).alias("term"),
    )
    tf = base.groupBy(id_col, "dl", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfs = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # corpus stats: avgdl as exact-integer token sum / count (deterministic)
    stats = docs.select(F.size(toks).alias("dl")).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum(idf * tf_part).alias("score"),
        )
    )
    top = scored.orderBy(F.desc("score"), F.col(id_col)).limit(k)
    w = W.orderBy(F.desc("score"), F.col(id_col))
    return top.withColumn("rank", F.row_number().over(w)).select(
        id_col, "n_terms", "score", "rank"
    )


__all__ = ["postings", "bm25_topk"]
