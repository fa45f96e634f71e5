"""Same-session interleaved A/B: remove_boilerplate 3-pass vs 2-pass fold.

OLD: ch feeds (1) the boiler-hash agg, (2) the anti-join left side,
(3) the totals agg — the chunk explode (text payload!) runs 3x.
NEW: left-join the (distinct) boiler set and fold totals + per_doc into
ONE groupBy(id) with conditional aggregates — explode runs 2x.

Verifies bit-identical results (sorted rows), then alternates timed
noop-sink runs OLD,NEW,OLD,NEW,... in one warmed session.
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F


def old_shape(df, size=3, min_docs=2, text_col="text", id_col="doc_id"):
    ws = F.split(F.col(text_col), " ")
    starts = F.when(
        F.size(ws) >= 1, F.sequence(F.lit(1), F.size(ws), F.lit(size))
    ).otherwise(F.array().cast("array<int>"))
    ch = (
        df.select(F.col(id_col), ws.alias("__ws"), F.explode(starts).alias("start"))
        .select(
            id_col,
            "start",
            F.concat_ws(" ", F.slice(F.col("__ws"), F.col("start"), size)).alias("chunk"),
        )
        .withColumn("h", F.md5(F.col("chunk")))
    )
    boiler = (
        ch.groupBy("h")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("h")
    )
    kept = ch.join(boiler, "h", "left_anti")
    totals = ch.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_chunks"))
    per_doc = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col("start"), F.col("chunk")))),
                    lambda s: s["chunk"],
                ),
            )
        ).alias("clean_hash"),
    )
    empty_hash = F.md5(F.lit(""))
    return totals.join(per_doc, id_col, "left").select(
        id_col,
        "n_chunks",
        F.coalesce(F.col("n_kept"), F.lit(0).cast("bigint")).alias("n_kept"),
        F.coalesce(F.col("clean_hash"), empty_hash).alias("clean_hash"),
    )


def new_shape(df, size=3, min_docs=2, text_col="text", id_col="doc_id"):
    ws = F.split(F.col(text_col), " ")
    starts = F.when(
        F.size(ws) >= 1, F.sequence(F.lit(1), F.size(ws), F.lit(size))
    ).otherwise(F.array().cast("array<int>"))
    ch = (
        df.select(F.col(id_col), ws.alias("__ws"), F.explode(starts).alias("start"))
        .select(
            id_col,
            "start",
            F.concat_ws(" ", F.slice(F.col("__ws"), F.col("start"), size)).alias("chunk"),
        )
        .withColumn("h", F.md5(F.col("chunk")))
    )
    boiler = (
        ch.groupBy("h")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("h")
        .withColumn("__b", F.lit(1))
    )
    flagged = ch.join(boiler, "h", "left")
    kept_struct = F.when(
        F.col("__b").isNull(), F.struct(F.col("start"), F.col("chunk"))
    )
    empty_hash = F.md5(F.lit(""))
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.count(F.when(F.col("__b").isNull(), F.lit(1))).alias("n_kept"),
        F.coalesce(
            F.when(
                F.count(F.when(F.col("__b").isNull(), F.lit(1))) > 0,
                F.md5(
                    F.concat_ws(
                        " ",
                        F.transform(
                            F.array_sort(F.collect_list(kept_struct)),
                            lambda s: s["chunk"],
                        ),
                    )
                ),
            ),
            empty_hash,
        ).alias("clean_hash"),
    )


def main():
    from faust_spark.catalog import load_table
    from faust_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ab_rb")
    docs = load_table(spark, sf, "documents")
    # warm-up
    spark.range(32).mapInPandas(lambda it: it, "id long").collect()
    old_shape(docs).collect()

    a = sorted(map(tuple, old_shape(docs).collect()))
    b = sorted(map(tuple, new_shape(docs).collect()))
    assert a == b, f"RESULTS DIFFER: {len(a)} vs {len(b)} rows"
    print("results identical:", len(a), "rows", file=sys.stderr)

    def t(fn):
        spark.sparkContext.setJobDescription(f"ab:{fn.__name__}")
        t0 = time.time()
        fn(docs).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    olds, news = [], []
    for i in range(4):
        olds.append(t(old_shape))
        news.append(t(new_shape))
    print(json.dumps({
        "old_runs": [round(x, 3) for x in olds],
        "new_runs": [round(x, 3) for x in news],
        "old_min": round(min(olds), 3), "new_min": round(min(news), 3),
        "ratio_min": round(min(news) / min(olds), 3),
    }))


if __name__ == "__main__":
    main()
