"""Skew detection and targeted salting."""

from pyspark.sql import functions as F

from faust_spark.operators.skew import detect_heavy_hitters, salt_hot_keys


def skewed_df(spark):
    # key 7 holds ~50% of rows; the rest spread over 100 keys
    hot = spark.range(5000).select(F.lit(7).alias("k"), F.col("id").alias("v"))
    tail = spark.range(5000).select(
        (F.col("id") % 100 + 100).alias("k"), F.col("id").alias("v")
    )
    return hot.unionByName(tail)


def test_detect_heavy_hitters_finds_hot_key(spark):
    df = skewed_df(spark)
    hh = {r.k: r.share for r in detect_heavy_hitters(df, "k", 0.2).collect()}
    assert set(hh) == {7}
    assert 0.45 <= hh[7] <= 0.55


def test_salt_hot_keys_matches_plain_join(spark):
    df = skewed_df(spark)
    dim = df.select("k").distinct().withColumn("dim_tag", F.col("k") * 10)
    plain = df.join(dim, "k").count()
    salted = salt_hot_keys(df, dim, "k", hot_keys=[7], salt_buckets=8).count()
    assert salted == plain
    # tail keys must not have been replicated
    one_tail = salt_hot_keys(
        df.filter("k = 150"), dim, "k", hot_keys=[7], salt_buckets=8
    ).count()
    assert one_tail == df.filter("k = 150").count()
