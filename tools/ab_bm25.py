"""Same-session interleaved A/B for the BM25 postings materialization.

OLD: tf / dfs / stats each replan a full corpus text pass (3 passes).
NEW (shipped): tf is checkpointed once; dfs and stats derive from it.

Verifies identical rows, then alternates noop-sink runs in one session.
Usage: python tools/ab_bm25.py [sf_dir]
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window as W
from pyspark.sql import functions as F


def old_multi(docs, queries, k=20, k1=1.2, b=0.75, text_col="text",
              id_col="doc_id", exclude_self=True):
    toks = F.split(F.col(text_col), " ")
    qterms = queries.select(
        F.col("qid"),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("term"),
    )
    tf = (
        docs.select(F.col(id_col), F.size(toks).alias("dl"), F.explode(toks).alias("term"))
        .groupBy(id_col, "dl", "term").agg(F.count(F.lit(1)).alias("tf"))
    )
    dfs = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = docs.select(F.size(toks).alias("dl")).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    matched = tf.join(F.broadcast(qterms), "term")
    if exclude_self:
        matched = matched.filter(F.col(id_col) != F.col("qid"))
    idf = F.log(F.lit(1.0) + (F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)))
    tf_part = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf") + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        matched.join(F.broadcast(dfs), "term").crossJoin(F.broadcast(stats))
        .groupBy("qid", id_col)
        .agg(F.count(F.lit(1)).alias("n_terms"), F.sum(idf * tf_part).alias("score"))
    )
    w = W.partitionBy("qid").orderBy(F.desc("score"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k).select("qid", id_col, "n_terms", "score", "rank")
    )


def main():
    from faust_spark.catalog import load_table
    from faust_spark.operators.search import bm25_multi_topk
    from faust_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ab_bm25")
    docs = load_table(spark, sf, "documents")
    spark.range(32).mapInPandas(lambda it: it, "id long").collect()
    queries = docs.orderBy("doc_id").limit(5).select(
        F.col("doc_id").alias("qid"), "text"
    )

    new = lambda: bm25_multi_topk(docs, queries, k=20, exclude_self=True)
    old = lambda: old_multi(docs, queries)
    old().collect()  # warm

    a = sorted(map(tuple, old().collect()))
    b = sorted(map(tuple, new().collect()))
    assert len(a) == len(b), (len(a), len(b))
    for ra, rb in zip(a, b):
        assert ra[:3] == rb[:3] and abs(ra[3] - rb[3]) < 1e-12 and ra[4] == rb[4], (ra, rb)
    print("results identical:", len(a), "rows", file=sys.stderr)

    def t(fn, name):
        spark.sparkContext.setJobDescription(f"ab-bm25:{name}")
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        return time.time() - t0

    olds, news = [], []
    for i in range(5):
        olds.append(t(old, "old"))
        news.append(t(new, "new"))
    print(json.dumps({
        "old_runs": [round(x, 3) for x in olds],
        "new_runs": [round(x, 3) for x in news],
        "old_min": round(min(olds), 3), "new_min": round(min(news), 3),
        "ratio_min": round(min(news) / min(olds), 3),
    }))


if __name__ == "__main__":
    main()
