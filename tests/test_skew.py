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


def test_detect_heavy_hitters_empty_keeps_key_type(spark):
    """Regression: the no-candidates path hardcoded a long key column; a
    string-keyed empty result must union cleanly with the non-empty shape."""
    from pyspark.sql.types import StringType

    df = spark.createDataFrame(
        [(f"u{i}",) for i in range(200)], ["user"]
    )
    out = detect_heavy_hitters(df, "user", min_share=0.5)
    assert out.count() == 0
    assert isinstance(out.schema["user"].dataType, StringType)
    # unions with the hot-key-present shape without a type conflict
    hot = spark.createDataFrame([("u1",)] * 150 + [("u2",)] * 3, ["user"])
    out2 = detect_heavy_hitters(hot, "user", min_share=0.5)
    assert out.unionByName(out2).count() == out2.count() == 1


def test_salting_is_deterministic_across_repartition(spark):
    """Salts are a pure function of the row (xxhash64 mod buckets), so the
    same rows salted under different partitionings agree — the property a
    task retry / AQE re-plan needs."""
    from faust_spark.joins import salted_join

    left = spark.createDataFrame(
        [(i % 5, f"v{i}") for i in range(500)], ["k", "v"]
    )
    right = spark.createDataFrame([(i, f"d{i}") for i in range(5)], ["k", "d"])
    a = salted_join(left, right, "k")
    b = salted_join(left.repartition(7, "v"), right, "k")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    plain = left.join(right, "k")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, plain.collect()))
