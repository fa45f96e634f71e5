"""Sketch-based operators: Bloom-filter membership prefilters.

The 100 TB shape this module exists for: testing a 100 GB daily batch
against a multi-TB corpus should not join the corpus — it should ship a
few MB of sketch to the batch. A Bloom filter built in ONE distributed
aggregation pass over corpus keys (never collecting the keys) gives a
no-false-negative membership screen; the occasional false positive is
removed by an exact verification join that only the screened survivors
pay for, so end results are EXACTLY the precise-join answer while the
corpus-side work drops to one scan + a model-sized bitmap.

(Spark uses the same idea internally for runtime row-group filtering;
``bloom_filter_agg`` is not exposed to the public SQL surface in 4.x, so
the bitmap is built from public primitives: ``xxhash64`` position hashes
bit-or-aggregated into 64-bit words.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from faust_spark.operators.mat import local_rows


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
) -> list[int]:
    """Build a Bloom bitmap over ``df[key_col]`` as ``m_bits/64`` longs.

    One narrow projection (k position hashes per key, ``xxhash64`` with
    the hash index as seed column) + one ``bit_or`` aggregation keyed by
    word index — the shuffle carries at most ``m_bits/64`` partially
    aggregated words per partition, NEVER the keys. The returned list is
    the driver-side model (128 KiB at the 1M-bit default): broadcast it
    back via :func:`bloom_might_contain`.

    Sizing: false-positive rate ≈ (1 - e^(-k·n/m))^k — the 1M-bit/4-hash
    default holds ~1% at n=100k keys; at corpus scale pass
    ``m_bits ≈ 10 × n`` (10 bits/key ≈ 0.8% with k=4). m_bits must be a
    multiple of 64.
    """
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    pos = df.select(
        F.explode(
            F.array(
                *[
                    F.pmod(
                        F.xxhash64(F.col(key_col), F.lit(i)), F.lit(m_bits)
                    )
                    for i in range(k_hashes)
                ]
            )
        ).alias("p")
    )
    words = (
        pos.select(
            (F.col("p") / 64).cast("long").alias("w"),
            # python-API shiftleft needs a literal bit count; the SQL
            # form takes an expression
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))")
            .alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    arr = [0] * (m_bits // 64)
    for r in words:
        arr[int(r.w)] = int(r.bits)
    return arr


def bloom_might_contain(
    df: DataFrame,
    key_col: str,
    bloom: list[int],
    k_hashes: int = 4,
    out_col: str = "__might_contain",
) -> DataFrame:
    """Add a boolean column: every one of the key's ``k_hashes`` Bloom
    bits is set. False → definitely absent; True → probably present.

    The bitmap rides as a one-row broadcast DataFrame (not a literal —
    a 16k-element literal array would bloat every plan that embeds it),
    and the membership test is pure codegen: ``element_at`` word lookup
    + bitwise AND per hash.
    """
    m_bits = len(bloom) * 64
    spark = df.sparkSession
    # local_rows (guide §4): LocalTableScan, no Python re-eval per action
    bdf = local_rows(spark, [(bloom,)], "__bloom array<long>")
    # positions materialize as aliased columns and the shift expression
    # references only those aliases — key_col is never interpolated into
    # SQL text, so names with dots/spaces/hyphens work like any column
    tagged = df.crossJoin(F.broadcast(bdf))
    pcols = []
    for i in range(k_hashes):
        pc = f"__bloom_p{i}"
        pcols.append(pc)
        tagged = tagged.withColumn(
            pc, F.pmod(F.xxhash64(df[key_col], F.lit(i)), F.lit(m_bits))
        )
    pred = None
    for pc in pcols:
        word = F.element_at(
            F.col("__bloom"), (F.col(pc) / 64).cast("int") + 1
        )
        bit = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(`{pc}` % 64 AS INT))"
        )
        hit = word.bitwiseAND(bit) != 0
        pred = hit if pred is None else (pred & hit)
    return tagged.withColumn(out_col, pred).drop("__bloom", *pcols)


def bloom_prefilter_dedup(
    new_df: DataFrame,
    corpus_df: DataFrame,
    key: Column | str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
) -> DataFrame:
    """Rows of ``new_df`` whose ``key`` does NOT already occur in
    ``corpus_df`` — the incremental-ingest exact-dedup admission check,
    with the corpus side reduced to one scan + a broadcast bitmap.

    Three stages, results IDENTICAL to a plain anti-join:

    1. corpus → Bloom bitmap (one pass, no key leaves the executors
       except as partially-aggregated words);
    2. the batch screens against the broadcast bitmap — no false
       negatives, so every true duplicate survives to stage 3 and
       every screened-out row is genuinely new;
    3. only the (few) probable-duplicate survivors pay an exact
       verification semi-join against the corpus keys, which removes
       Bloom false positives.

    ``key`` may be a column name or an expression (e.g.
    ``F.md5("text")`` for content identity).
    """
    kc = F.col(key) if isinstance(key, str) else key
    tagged_new = new_df.withColumn("__k", kc)
    tagged_corpus = corpus_df.select(kc.alias("__k"))
    bloom = bloom_build(tagged_corpus, "__k", m_bits, k_hashes)
    screened = bloom_might_contain(tagged_new, "__k", bloom, k_hashes)
    fresh = screened.filter(~F.col("__might_contain"))
    suspects = screened.filter(F.col("__might_contain"))
    verified_new = suspects.join(tagged_corpus, "__k", "left_anti")
    return fresh.unionByName(verified_new).drop("__might_contain", "__k")


def _md5_bucket(col: Column, salt: str, width: int) -> Column:
    """Engine-portable hash bucket: first 8 hex chars of
    ``md5(salt || key)`` as an integer, mod ``width`` — the same
    deterministic pattern the minhash/DSIR oracles replicate in SQL."""
    h = F.md5(F.concat(F.lit(salt), col.cast("string")))
    return F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint"), F.lit(width)
    )


def cms_counts(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-min sketch of ``df[key_col]`` as a (d, bucket, cnt) table.

    ONE pass over the data: each row explodes to ``depth`` (row, d,
    bucket) coordinates, then a partial-agg count keyed by (d, bucket) —
    the shuffle carries at most ``depth × width`` partially-aggregated
    rows per partition regardless of input size. The result is
    model-sized (4k rows at the default) — broadcast it into
    :func:`cms_estimate`, persist it as the running frequency model, or
    merge sketches from different corpus shards by summing counts
    (CMS is a linear sketch: cnt(a ∪ b) = cnt(a) + cnt(b)).

    Hashing is md5-derived (engine-portable), so the full sketch — and
    every estimate off it — is bit-reproducible anywhere, including a
    SQL oracle.
    """
    coords = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _md5_bucket(F.col(key_col), f"cms{d}:", width).alias(
                            "bucket"
                        ),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c")
    )
    return (
        coords.select("c.d", "c.bucket")
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    keys: DataFrame,
    counts: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    out_col: str = "cms_est",
) -> DataFrame:
    """Point-frequency estimates for ``keys`` against a
    :func:`cms_counts` sketch: ``min_d counts[d][h_d(key)]``.

    The classic CMS guarantee holds: the estimate NEVER undercounts
    (every true occurrence incremented every row's buckets) and
    overcounts only by collision mass (≤ e/width × N with prob
    1 − e^-depth per query). Implemented as a broadcast join of the
    model-sized counts table against the key set — no driver arrays,
    no UDF; an absent (d, bucket) coordinate means count 0.

    ``keys`` rows must be DISTINCT: the per-key min groups by every
    ``keys`` column, so duplicate probe rows collapse to one output row.
    Probe/join bookkeeping rides on ``__cms_``-prefixed internal aliases,
    so a ``keys`` table that already has d/bucket/cnt columns is safe.
    """
    probes = keys.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _md5_bucket(F.col(key_col), f"cms{d}:", width).alias(
                            "bucket"
                        ),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("__cms_c"),
    ).select(
        "*",
        F.col("__cms_c.d").alias("__cms_d"),
        F.col("__cms_c.bucket").alias("__cms_bucket"),
    ).drop("__cms_c")
    cnts = counts.select(
        F.col("d").alias("__cms_d"),
        F.col("bucket").alias("__cms_bucket"),
        F.col("cnt").alias("__cms_cnt"),
    )
    joined = probes.join(
        F.broadcast(cnts), ["__cms_d", "__cms_bucket"], "left"
    )
    others = [c for c in keys.columns]
    return (
        joined.groupBy(*others)
        .agg(
            F.min(F.coalesce(F.col("__cms_cnt"), F.lit(0))).alias(out_col)
        )
    )


def hll_sketches(
    df: DataFrame,
    key_col: str,
    *group_cols: str,
    lgk: int = 12,
) -> DataFrame:
    """Per-group HyperLogLog sketches of distinct ``key_col`` values
    (Spark's built-in Apache DataSketches HLL, binary column ``hll``).

    THE pre-aggregation pattern for distinct counts at 100 TB: sketch
    once at the finest grain (e.g. per day), persist the model-sized
    sketch table, and answer every coarser rollup by UNIONING sketches
    (:func:`hll_rollup_estimate`) — no rescan of raw data, ever.
    ``lgk=12`` → ~2 KB per sketch, ~2% standard error; exact below the
    sparse-mode threshold.
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(key_col), lgk).alias("hll")
    )


def hll_rollup_estimate(
    sketches: DataFrame,
    *group_cols: str,
    out_col: str = "distinct_est",
) -> DataFrame:
    """Merge per-fine-grain sketches up to ``group_cols`` and estimate:
    ``hll_union_agg`` is associative/commutative, so any rollup level
    costs one sketch-sized aggregation of the sketch TABLE, not a scan
    of the events."""
    return sketches.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll")).alias(out_col)
    )


def theta_sketches(
    df: DataFrame,
    key_col: str,
    *group_cols: str,
) -> DataFrame:
    """Per-group Theta sketches of distinct ``key_col`` values (binary
    column ``theta``). Unlike HLL, Theta sketches support SET ALGEBRA:
    :func:`theta_overlap_estimate` answers "distinct keys in BOTH group
    A and group B" / "in A but not B" from the sketch table alone — the
    audience-overlap query that is otherwise a distinct self-join over
    raw data."""
    return df.groupBy(*group_cols).agg(
        F.theta_sketch_agg(F.col(key_col)).alias("theta")
    )


def theta_overlap_estimate(
    sketches: DataFrame,
    group_col: str,
) -> DataFrame:
    """All group pairs' distinct-overlap estimates from a
    :func:`theta_sketches` table: (a, b, est_a, est_b, est_both,
    est_a_minus_b) for a < b. The pair join runs over the model-sized
    sketch table (G rows → G²/2 pairs of ~KB sketches), never the data.
    """
    a = sketches.select(
        F.col(group_col).alias("a"), F.col("theta").alias("ta")
    )
    b = sketches.select(
        F.col(group_col).alias("b"), F.col("theta").alias("tb")
    )
    return (
        a.join(b, F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.theta_sketch_estimate(F.col("ta")).alias("est_a"),
            F.theta_sketch_estimate(F.col("tb")).alias("est_b"),
            F.theta_sketch_estimate(
                F.theta_intersection(F.col("ta"), F.col("tb"))
            ).alias("est_both"),
            F.theta_sketch_estimate(
                F.theta_difference(F.col("ta"), F.col("tb"))
            ).alias("est_a_minus_b"),
        )
    )


def kll_sketches(
    df: DataFrame,
    value_col: str,
    *group_cols: str,
) -> DataFrame:
    """Per-group KLL quantile sketches of a double column (binary
    ``kll``). The mergeable complement of ``percentile_approx`` (whose
    GK summary is not exposed as a reusable value): sketch once at the
    finest grain, then answer ANY quantile at ANY rollup level from the
    sketch table via :func:`kll_rollup_quantiles` — no re-scan, rank
    error ~1.7% at the default k."""
    return df.groupBy(*group_cols).agg(
        F.kll_sketch_agg_double(F.col(value_col).cast("double")).alias("kll")
    )


def kll_rollup_quantiles(
    sketches: DataFrame,
    quantiles: list[float],
    *group_cols: str,
) -> DataFrame:
    """Merge per-fine-grain KLL sketches up to ``group_cols`` and read
    the requested quantiles: one ``q<percent>`` column each."""
    merged = sketches.groupBy(*group_cols).agg(
        F.kll_merge_agg_double("kll").alias("kll")
    )
    cols = [
        F.kll_sketch_get_quantile_double(F.col("kll"), F.lit(q)).alias(
            f"q{int(round(q * 100)):02d}"
        )
        for q in quantiles
    ]
    return merged.select(*group_cols, *cols)


__all__ = [
    "bloom_build",
    "bloom_might_contain",
    "bloom_prefilter_dedup",
    "cms_counts",
    "cms_estimate",
    "hll_sketches",
    "hll_rollup_estimate",
    "theta_sketches",
    "theta_overlap_estimate",
    "kll_sketches",
    "kll_rollup_quantiles",
]
