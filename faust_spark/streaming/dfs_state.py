"""DFS-sharded streaming sketch state: Bloom ever-seen dedup and
count-min accumulation whose state NEVER lands on the driver.

``streaming.bloom_dedup`` / ``streaming.cms_agg`` carry their state as a
driver-resident numpy array versioned into a local directory — honest
and fast at their documented cardinalities, but three scale limits bite
at 100 TB corpora (VERDICT r5): (a) a driver-machine loss loses the
state even though the Spark checkpoint survives on the DFS; (b) a
1B-key Bloom at 10 bits/key is a 1.25 GB driver array updated per
batch; (c) serializing the whole bitmap per batch is O(m_bits) driver
I/O. This module is the scale path:

- **State is a parquet relation, not an array.** Bloom state is
  (w, bits) words; CMS state is (d, bucket, cnt) cells. Both live under
  a caller-chosen DFS directory (put it NEXT TO the streaming
  checkpoint: same durability domain), written by executors with
  ordinary distributed parquet writes — no ``collect()``, no driver
  array, driver memory is flat in the key cardinality.
- **Versioned deltas + periodic compaction.** Each batch writes only
  its own aggregated updates (``delta_v<batch_id>``, model-sized);
  every ``compact_every`` batches the base and accumulated deltas fold
  into a new ``base_v<maxv>`` (Bloom OR / CMS sum are shard-local and
  associative, so folding commutes with replay). Per-batch write cost
  is O(batch words), not O(m_bits).
- **Replay-idempotent by construction.** Screening/accumulation for
  batch ``b`` reads ONLY versions strictly below ``b``; the batch's own
  delta is written after the caller's sink ran, with an idempotent
  overwrite (the delta content is a deterministic function of the batch
  data). Spark's at-least-once replay of the last uncommitted batch
  therefore sees the exact pre-batch state and reproduces byte-identical
  output — the same contract the driver-resident variant proved, carried
  over because OR/sum merges are order- and boundary-independent.
- **Directory validity = `_SUCCESS`.** A crash mid-write leaves a dir
  without the marker; readers skip it and the replay rewrites it.

All paths go through the Hadoop FileSystem API (scheme-portable:
``file:``, ``hdfs:``, ``s3a:``…), never ``os`` — this is what "under
the checkpoint DFS path" means operationally.
"""

from __future__ import annotations

import re
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------
# Hadoop FS helpers (scheme-portable listing/cleanup)
# ---------------------------------------------------------------------


def _fs(spark: SparkSession, dir_: str):
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(dir_)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, path, jvm


def _list_versions(spark: SparkSession, state_dir: str, prefix: str):
    """Committed (``_SUCCESS``-marked) versions of ``prefix_v<id>`` dirs."""
    fs, path, jvm = _fs(spark, state_dir)
    if not fs.exists(path):
        return []
    out = []
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        if not (st.isDirectory() and name.startswith(prefix + "_v")):
            continue
        try:
            v = int(name[len(prefix) + 2:])
        except ValueError:
            continue
        if fs.exists(
            jvm.org.apache.hadoop.fs.Path(st.getPath(), "_SUCCESS")
        ):
            out.append(v)
    return sorted(out)


def _rm(spark: SparkSession, dir_: str) -> None:
    fs, path, _ = _fs(spark, dir_)
    if fs.exists(path):
        fs.delete(path, True)


def _state_parts(
    spark: SparkSession,
    state_dir: str,
    before: int,
) -> tuple[list[str], list[int], Optional[int]]:
    """Paths contributing to the pre-``before`` state: the newest base
    below ``before`` plus every later delta below ``before``. Returns
    (paths, delta_versions_included, base_version)."""
    bases = [
        v for v in _list_versions(spark, state_dir, "base") if v < before
    ]
    base = max(bases) if bases else None
    deltas = [
        v
        for v in _list_versions(spark, state_dir, "delta")
        if v < before and (base is None or v > base)
    ]
    paths = []
    if base is not None:
        paths.append(f"{state_dir}/base_v{base}")
    paths.extend(f"{state_dir}/delta_v{v}" for v in deltas)
    return paths, deltas, base


# ---------------------------------------------------------------------
# Bloom ever-seen dedup
# ---------------------------------------------------------------------


def _bloom_words(
    df: DataFrame, key_col: str, m_bits: int, k_hashes: int
) -> DataFrame:
    """(w, bits) word updates for ``df[key_col]`` — the same distributed
    bit_or aggregation as ``operators.sketch.bloom_build``, kept as a
    DataFrame instead of collected."""
    pos = df.select(
        F.explode(
            F.array(
                *[
                    F.pmod(
                        F.xxhash64(df[key_col], F.lit(i)), F.lit(m_bits)
                    )
                    for i in range(k_hashes)
                ]
            )
        ).alias("p")
    )
    return (
        pos.select(
            (F.col("p") / 64).cast("long").alias("w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))"
            ).alias("bits"),
        )
        .groupBy("w")
        .agg(F.bit_or("bits").alias("bits"))
    )


def _read_state(
    spark: SparkSession, paths: list[str], schema: str
) -> DataFrame:
    if not paths:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*paths)


def _check_layout(spark: SparkSession, state_dir: str, shards: int) -> None:
    """Fail loudly when a reader's ``shards`` doesn't match the state
    dir's committed base layout — a mismatch is trivially detectable
    from the base dir names, and reading through it would SILENTLY drop
    every key already folded into the other layout's bases (the deltas
    those bases superseded are pruned, so the wrong-layout read returns
    plausible-but-incomplete state, the worst failure mode a dedup
    screen can have)."""
    fs, path, _ = _fs(spark, state_dir)
    if not fs.exists(path):
        return
    for st in fs.listStatus(path):
        name = st.getPath().getName()
        m = re.match(r"base(?:_s(\d+))?_v\d+$", name)
        if not m:
            continue
        s = m.group(1)
        if shards <= 1 and s is not None:
            raise ValueError(
                f"state dir {state_dir} holds sharded base {name!r} but "
                "is being read with shards=1 — pass the shards= value "
                "the sink was created with (a shards=1 read would "
                "silently drop all compacted state)"
            )
        if shards > 1 and s is None:
            raise ValueError(
                f"state dir {state_dir} holds unsharded base {name!r} "
                f"but is being read with shards={shards} — the layout "
                "is fixed for a state dir's lifetime"
            )
        if shards > 1 and s is not None and int(s) >= shards:
            raise ValueError(
                f"state dir {state_dir} holds base {name!r} for shard "
                f"{s} but is being read with shards={shards} — shard "
                "count must match the sink's"
            )


def bloom_state_words(
    spark: SparkSession,
    state_dir: str,
    before: int = 1 << 62,
    shards: int = 1,
) -> DataFrame:
    """The merged (w, bits) Bloom relation from versions < ``before`` —
    base and deltas OR-fold per word (shard-local merge).

    ``shards`` must match the value the sink was created with (the
    layout is fixed for the lifetime of a state dir): sharded state
    keeps one base per key-range shard (``base_s{s}_v*``) plus
    hive-partitioned deltas, so each shard's read set is its own base
    and only the delta slices newer than it."""
    _check_layout(spark, state_dir, shards)
    if shards <= 1:
        paths, _, _ = _state_parts(spark, state_dir, before)
        raw = _read_state(spark, paths, "w long, bits long")
    else:
        raw = _sharded_raw(
            spark, state_dir, before, shards, "w long, bits long"
        )
    return raw.groupBy("w").agg(F.bit_or("bits").alias("bits"))


def bloom_dedup_dfs_sink(
    sink: Callable[[DataFrame, int], None],
    key_col: str,
    state_dir: str,
    m_bits: int = 1 << 24,
    k_hashes: int = 4,
    compact_every: int = 8,
    shards: int = 1,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` wrapper: ever-seen Bloom screen with DFS-sharded
    state (the scale path of ``bloom_dedup.bloom_dedup_batch_sink`` —
    same semantics, same no-false-negative guarantee, state off-driver).

    Point ``state_dir`` under/next to the query's checkpoint location so
    state and progress share a durability domain. The membership test is
    a hash join of the batch's k·|keys| bit positions against the
    word relation — distributed end to end; nothing about the state
    touches the driver beyond file listings.

    ``shards > 1`` is DEPLOYMENT.md's 100× compaction knob made real:
    the word space splits into ``shards`` contiguous ranges, deltas
    are hive-partitioned by range, each range keeps its OWN base, and
    the ranges compact on a STAGGERED schedule (shard ``s`` folds at
    batches ``≡ s·compact_every/shards (mod compact_every)``). Total
    rewrite work per cycle is unchanged (each shard rewrites once),
    but the worst-case single-batch compaction stall drops from one
    O(state) rewrite to O(state/shards) — the latency spike a
    micro-batch pipeline actually cares about. ``shards`` is part of
    the state layout and must not change over a state dir's lifetime.
    """
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    if shards < 1 or shards > compact_every:
        # more shards than compaction slots would leave ranges that
        # NEVER compact (offsets collide past compact_every)
        raise ValueError(
            f"shards must be in [1, compact_every]; got {shards}"
        )
    n_words = m_bits // 64

    def wrapped(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if shards > 1:
            _compact_sharded(
                spark,
                state_dir,
                batch_id,
                compact_every,
                shards,
                "w long, bits long",
                lambda df: df.groupBy("w").agg(
                    F.bit_or("bits").alias("bits")
                ),
            )
        else:
            _compact_bloom(spark, state_dir, batch_id, compact_every)
        state = bloom_state_words(
            spark, state_dir, before=batch_id, shards=shards
        )
        keys = batch_df.dropDuplicates([key_col])
        # k positions per key; a key is "might contain" iff EVERY
        # position's word has the bit set in the pre-batch state
        pos = keys.select(
            F.col(key_col).alias("__k"),
            F.explode(
                F.array(
                    *[
                        F.pmod(
                            F.xxhash64(keys[key_col], F.lit(i)),
                            F.lit(m_bits),
                        )
                        for i in range(k_hashes)
                    ]
                )
            ).alias("__p"),
        ).select(
            "__k",
            (F.col("__p") / 64).cast("long").alias("w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(__p % 64 AS INT))"
            ).alias("__mask"),
        )
        verdict = (
            pos.join(state, "w", "left")
            .groupBy("__k")
            .agg(
                F.min(
                    F.coalesce(
                        F.col("bits").bitwiseAND(F.col("__mask")) != 0,
                        F.lit(False),
                    ).cast("int")
                ).alias("__all_set")
            )
            .filter(F.col("__all_set") == 0)
            .select("__k")
        )
        fresh = keys.join(
            verdict, keys[key_col] == verdict["__k"]
        ).drop("__k")
        # the sink sees survivors BEFORE state advances: a crash here
        # replays the batch against the same pre-batch state
        sink(fresh, batch_id)
        words = _bloom_words(keys, key_col, m_bits, k_hashes)
        if shards > 1:
            # contiguous key-range shard of the word space; the range
            # (not hash) split keeps each shard's base a contiguous
            # word interval, so min/max stats prune cross-shard reads
            words.withColumn(
                "shard",
                F.floor(F.col("w") * shards / n_words).cast("int"),
            ).write.partitionBy("shard").mode("overwrite").parquet(
                f"{state_dir}/delta_v{batch_id}"
            )
        else:
            words.write.mode("overwrite").parquet(
                f"{state_dir}/delta_v{batch_id}"
            )

    return wrapped


def _prune_superseded(
    spark: SparkSession, state_dir: str, base: Optional[int]
) -> None:
    """Remove dirs a committed base makes dead: deltas <= base and older
    bases (a crash between base-commit and cleanup leaves them; readers
    already ignore them, this just reclaims the space)."""
    if base is None:
        return
    for v in _list_versions(spark, state_dir, "delta"):
        if v <= base:
            _rm(spark, f"{state_dir}/delta_v{v}")
    for v in _list_versions(spark, state_dir, "base"):
        if v < base:
            _rm(spark, f"{state_dir}/base_v{v}")


def _compact_bloom(
    spark: SparkSession, state_dir: str, batch_id: int, compact_every: int
) -> None:
    """Fold base + deltas strictly below ``batch_id`` into a new base.

    Runs BEFORE the batch screens (inputs are immutable once batch_id
    started, so a replayed batch redoes an identical, idempotent fold);
    folded deltas and the superseded base are removed only after the new
    base commits (``_SUCCESS``), so a crash at any point leaves a
    readable state."""
    if compact_every <= 0 or batch_id == 0 or batch_id % compact_every:
        return
    paths, deltas, base = _state_parts(spark, state_dir, batch_id)
    if not deltas:
        _prune_superseded(spark, state_dir, base)
        return
    target = max(deltas)
    merged = (
        _read_state(spark, paths, "w long, bits long")
        .groupBy("w")
        .agg(F.bit_or("bits").alias("bits"))
    )
    merged.write.mode("overwrite").parquet(f"{state_dir}/base_v{target}")
    _prune_superseded(spark, state_dir, target)


def _sharded_raw(
    spark: SparkSession,
    state_dir: str,
    before: int,
    shards: int,
    schema: str,
) -> DataFrame:
    """UNMERGED union of a sharded state's contributing files below
    ``before``: every shard's newest base plus, per delta, the shard
    slices newer than that shard's base. Callers apply their own
    shard-local fold (bit_or / min / sum) — valid per shard because the
    shard column is a pure function of the fold's group key."""
    cols = [c.strip().split()[0] for c in schema.split(",")]
    rels = []
    bases = {}
    for s in range(shards):
        vs = [
            v
            for v in _list_versions(spark, state_dir, f"base_s{s}")
            if v < before
        ]
        bases[s] = max(vs) if vs else None
        if bases[s] is not None:
            rels.append(
                spark.read.schema(schema).parquet(
                    f"{state_dir}/base_s{s}_v{bases[s]}"
                )
            )
    for v in _list_versions(spark, state_dir, "delta"):
        if v >= before:
            continue
        live = [s for s in range(shards) if bases[s] is None or v > bases[s]]
        if not live:
            continue
        d = spark.read.schema(schema + ", shard int").parquet(
            f"{state_dir}/delta_v{v}"
        )
        if len(live) < shards:
            d = d.filter(F.col("shard").isin(live))
        rels.append(d.select(*cols))
    if not rels:
        return spark.createDataFrame([], schema)
    raw = rels[0]
    for r in rels[1:]:
        raw = raw.unionByName(r)
    return raw


def _compact_sharded(
    spark: SparkSession,
    state_dir: str,
    batch_id: int,
    compact_every: int,
    shards: int,
    schema: str,
    fold: Callable[[DataFrame], DataFrame],
) -> None:
    """Staggered per-shard fold: shard ``s`` compacts at batches
    ``batch_id % compact_every == s * compact_every // shards``, so
    each compaction event rewrites only its O(state/shards) range —
    the stall amortization DEPLOYMENT.md's 100×-knob paragraph names.
    ``fold`` is the sink's shard-local merge (bit_or for Bloom, MIN for
    LSH claims) — correct per shard because the shard column is a pure
    function of the merge's group key. Same crash discipline as the
    unsharded fold: the new shard base commits (``_SUCCESS``) before
    anything is pruned, and a delta dir dies only once EVERY shard's
    base has passed it."""
    if compact_every <= 0 or batch_id == 0:
        return
    s = next(
        (
            s
            for s in range(shards)
            if batch_id % compact_every == (s * compact_every) // shards
        ),
        None,
    )
    if s is None:
        return
    fs, _, jvm = _fs(spark, state_dir)
    bases = [
        v for v in _list_versions(spark, state_dir, f"base_s{s}") if v < batch_id
    ]
    base = max(bases) if bases else None
    deltas = [
        v
        for v in _list_versions(spark, state_dir, "delta")
        if v < batch_id and (base is None or v > base)
    ]
    if not deltas:
        _prune_sharded(spark, state_dir, shards)
        return
    rels = []
    if base is not None:
        rels.append(
            spark.read.schema(schema).parquet(f"{state_dir}/base_s{s}_v{base}")
        )
    for v in deltas:
        slice_path = f"{state_dir}/delta_v{v}/shard={s}"
        if fs.exists(jvm.org.apache.hadoop.fs.Path(slice_path)):
            rels.append(spark.read.schema(schema).parquet(slice_path))
    target = max(deltas)
    if not rels:
        # no rows ever landed in this range; an empty base still
        # advances the shard's watermark so deltas can be pruned
        merged = spark.createDataFrame([], schema)
    else:
        merged = rels[0]
        for r in rels[1:]:
            merged = merged.unionByName(r)
        merged = fold(merged)
    merged.write.mode("overwrite").parquet(
        f"{state_dir}/base_s{s}_v{target}"
    )
    _prune_sharded(spark, state_dir, shards)


def _prune_sharded(
    spark: SparkSession, state_dir: str, shards: int
) -> None:
    """Reclaim dirs no sharded reader can need: per shard, bases older
    than its newest; delta dirs every shard's newest base has passed.
    (A shard with NO base yet pins every delta — correct, since its
    range still reads them all.)"""
    newest = {}
    for s in range(shards):
        vs = _list_versions(spark, state_dir, f"base_s{s}")
        newest[s] = max(vs) if vs else None
        for v in vs:
            if v < newest[s]:
                _rm(spark, f"{state_dir}/base_s{s}_v{v}")
    if any(v is None for v in newest.values()):
        return
    floor = min(newest.values())
    for v in _list_versions(spark, state_dir, "delta"):
        if v <= floor:
            _rm(spark, f"{state_dir}/delta_v{v}")


# ---------------------------------------------------------------------
# count-min accumulation
# ---------------------------------------------------------------------


_CMS_SCHEMA = "d int, bucket bigint, cnt long"


def cms_state_cells(
    spark: SparkSession,
    state_dir: str,
    before: int = 1 << 62,
    shards: int = 1,
) -> DataFrame:
    """The merged (d, bucket, cnt) CMS relation from versions <
    ``before`` — CMS is linear, so merge is a per-cell SUM. Feed
    directly to ``operators.sketch.cms_estimate``. ``shards`` must
    match the sink's (the layout is fixed for a state dir's
    lifetime)."""
    _check_layout(spark, state_dir, shards)
    if shards <= 1:
        paths, _, _ = _state_parts(spark, state_dir, before)
        raw = _read_state(spark, paths, _CMS_SCHEMA)
    else:
        raw = _sharded_raw(spark, state_dir, before, shards, _CMS_SCHEMA)
    return raw.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_dfs_sink(
    key_col: str,
    state_dir: str,
    depth: int = 4,
    width: int = 1024,
    compact_every: int = 8,
    shards: int = 1,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` callback accumulating a CMS as DFS-sharded
    (d, bucket, cnt) deltas (the scale path of ``cms_agg.cms_batch_sink``
    — bit-identical accumulated sketch, state off-driver; the depth
    rows are natural shards and per-cell SUM is the shard-local merge).
    Read back with :func:`cms_state_cells`. ``shards > 1``: same
    staggered key-sharded compaction as the Bloom/LSH sinks — cells
    hash-shard on the ``(d, bucket)`` SUM-merge key, so per-shard
    folds are exact."""
    from faust_spark.operators.sketch import cms_counts

    if shards < 1 or shards > compact_every:
        raise ValueError(
            f"shards must be in [1, compact_every]; got {shards}"
        )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if shards > 1:
            _compact_sharded(
                spark,
                state_dir,
                batch_id,
                compact_every,
                shards,
                _CMS_SCHEMA,
                lambda df: df.groupBy("d", "bucket").agg(
                    F.sum("cnt").alias("cnt")
                ),
            )
        else:
            _compact_cms(spark, state_dir, batch_id, compact_every)
        counts = cms_counts(batch_df, key_col, depth, width)
        if shards > 1:
            counts.withColumn(
                "shard",
                F.pmod(
                    F.xxhash64(F.col("d"), F.col("bucket")), F.lit(shards)
                ).cast("int"),
            ).write.partitionBy("shard").mode("overwrite").parquet(
                f"{state_dir}/delta_v{batch_id}"
            )
        else:
            counts.write.mode("overwrite").parquet(
                f"{state_dir}/delta_v{batch_id}"
            )

    return sink


def _compact_cms(
    spark: SparkSession, state_dir: str, batch_id: int, compact_every: int
) -> None:
    if compact_every <= 0 or batch_id == 0 or batch_id % compact_every:
        return
    paths, deltas, base = _state_parts(spark, state_dir, batch_id)
    if not deltas:
        _prune_superseded(spark, state_dir, base)
        return
    target = max(deltas)
    merged = (
        _read_state(spark, paths, "d int, bucket bigint, cnt long")
        .groupBy("d", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    merged.write.mode("overwrite").parquet(f"{state_dir}/base_v{target}")
    _prune_superseded(spark, state_dir, target)


# ---------------------------------------------------------------------
# MinHash-LSH near-duplicate suppression
# ---------------------------------------------------------------------

_LSH_SCHEMA = "band int, band_sig string, min_id long"

#: sentinel bucket carrying the id high-watermark: real bands are
#: non-negative, so (band=-1, band_sig='__idwm__') can never collide
#: with a document claim. The watermark rides the SAME delta files and
#: the same MIN merge as the claims — we store ``-max_id``, so
#: ``-MIN(min_id)`` over sentinel rows is ``MAX(max_id)`` across
#: batches and survives compaction/replay with zero extra state files.
_LSH_IDWM_BAND = -1
_LSH_IDWM_SIG = "__idwm__"


def _lsh_raw(
    spark: SparkSession, state_dir: str, before: int, shards: int
) -> DataFrame:
    """Unmerged contributing LSH state rows below ``before``, either
    layout."""
    _check_layout(spark, state_dir, shards)
    if shards <= 1:
        paths, _, _ = _state_parts(spark, state_dir, before)
        return _read_state(spark, paths, _LSH_SCHEMA)
    return _sharded_raw(spark, state_dir, before, shards, _LSH_SCHEMA)


def lsh_bucket_state(
    spark: SparkSession,
    state_dir: str,
    before: int = 1 << 62,
    shards: int = 1,
) -> DataFrame:
    """The merged (band, band_sig, min_id) bucket-claim relation from
    versions < ``before`` — min is the shard-local merge (the lowest id
    ever seen in a bucket is order- and boundary-independent). The
    id-watermark sentinel (see ``_LSH_IDWM_BAND``) is filtered out:
    callers see document claims only. ``shards`` must match the sink's
    (the layout is fixed for a state dir's lifetime)."""
    raw = _lsh_raw(spark, state_dir, before, shards)
    return (
        raw.filter(F.col("band") != F.lit(_LSH_IDWM_BAND))
        .groupBy("band", "band_sig")
        .agg(F.min("min_id").alias("min_id"))
    )


def lsh_id_watermark(
    spark: SparkSession,
    state_dir: str,
    before: int = 1 << 62,
    shards: int = 1,
) -> Optional[int]:
    """Highest document id any state-writing batch < ``before`` has
    seen, or None before the first delta — the cheap detector for the
    sink's nondecreasing-ids ordering contract (ADVICE r8)."""
    raw = _lsh_raw(spark, state_dir, before, shards)
    row = (
        raw.filter(
            (F.col("band") == F.lit(_LSH_IDWM_BAND))
            & (F.col("band_sig") == F.lit(_LSH_IDWM_SIG))
        )
        .agg(F.min("min_id").alias("neg_max"))
        .first()
    )
    return -row["neg_max"] if row and row["neg_max"] is not None else None


def lsh_dedup_dfs_sink(
    sink: Callable[[DataFrame, int], None],
    state_dir: str,
    num_hashes: int = 16,
    band_size: int = 4,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    compact_every: int = 8,
    shards: int = 1,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` wrapper: streaming NEAR-duplicate suppression —
    the MinHash-LSH pendant of :func:`bloom_dedup_dfs_sink`'s exact
    ever-seen screen, with the same DFS-sharded state discipline.

    A document is emitted iff NO band of its MinHash-LSH signature
    (``operators.dedup.minhash_signatures`` + ``lsh_bands`` — identical
    banding to the batch ``minhash_lsh_pairs``) has been touched by a
    LOWER-id document, in this batch or any earlier one. The emitted set
    is therefore exactly ``{d : no d' < d shares a band with d}`` —
    batch-boundary-independent — PROVIDED ids are nondecreasing across
    batches (each batch's ids are all >= every earlier batch's), the
    natural shape for monotonically assigned document ids; within a
    batch, arrival order is irrelevant. Suppressors need not themselves
    survive (an "earlier doc", not an "earlier survivor" — the
    transitive-leader variant is ``connected_components`` territory).

    State is (band, band_sig, min_id) bucket claims: model-sized
    relative to the corpus (buckets ≪ docs under near-dup load), merged
    by MIN (associative, so delta folding commutes with replay), written
    by executors as versioned parquet deltas — no driver array, no
    collect. Screening is a left join of the batch's bands against the
    pre-batch claims; batch ``b`` reads only versions < b and rewrites
    its own delta idempotently, so at-least-once replay reproduces
    byte-identical output (same contract as the Bloom/CMS sinks).

    ``shards > 1``: same staggered key-sharded compaction as
    :func:`bloom_dedup_dfs_sink` — bucket claims hash-shard on
    ``(band, band_sig)`` (the MIN-merge group key, so per-shard folds
    are exact), deltas are hive-partitioned, each shard keeps its own
    base, and the worst-case compaction stall drops to
    O(state/shards). The id-watermark sentinel is one (band, sig) key
    and rides whichever shard its hash lands in. ``shards`` is part of
    the state layout and must not change over a state dir's lifetime.
    """
    from faust_spark.operators.dedup import lsh_bands, minhash_signatures

    def bands_fn(batch_df: DataFrame) -> DataFrame:
        return lsh_bands(
            minhash_signatures(
                batch_df, num_hashes, n, text_col=text_col, id_col=id_col
            ),
            band_size,
            id_col=id_col,
        )

    return _banded_dedup_dfs_sink(
        bands_fn,
        sink,
        state_dir,
        id_col=id_col,
        compact_every=compact_every,
        shards=shards,
        op_name="lsh_dedup_dfs_sink",
    )


def embedding_dedup_dfs_sink(
    sink: Callable[[DataFrame, int], None],
    state_dir: str,
    n_tables: int = 4,
    n_planes: int = 12,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    compact_every: int = 8,
    shards: int = 1,
) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` wrapper: streaming near-duplicate suppression
    for the EMBEDDING modality — the hyperplane-LSH pendant of
    :func:`lsh_dedup_dfs_sink`'s MinHash text screen, riding the
    identical banded bucket-claim state machinery (same ordering
    contract, id-watermark sentinel, replay idempotence, and
    ``shards=`` staggered compaction).

    A vector is emitted iff NO table's sign-bit signature
    (``operators.similarity.hyperplane_signature`` — deterministic
    md5-derived hyperplanes, seeds 1..n_tables, the same family as the
    batch ``ann_lsh_topk`` gate) was claimed by a LOWER-id vector, in
    this batch or any earlier one. Multi-table OR-banding is standard
    cosine-LSH dedup: near-identical embeddings agree on every table's
    signature w.h.p., while a random pair collides per table with
    probability ``(1 - θ/π)^n_planes``. State is (band=table,
    band_sig=bit-string, min_id) — model-sized relative to the corpus.

    Scale shape: signatures are a narrow codegen map (no shuffle); the
    screen is the same bucket equi-join as the text sink. ``n_planes``
    is part of the STATE LAYOUT (prior claims are signatures at that
    width), so it must be fixed at sink creation — size it with
    ``operators.similarity.hyperplane_params(expected_corpus_size)``
    (the same rules-not-constants family as ``simhash_params``; the
    gate applies it to the actual count), and grow ``n_tables`` with
    the recall you need.
    """
    from faust_spark.operators.similarity import hyperplane_bands_arrow

    def bands_fn(batch_df: DataFrame) -> DataFrame:
        # one Arrow pass for ALL tables' signatures (r12): the per-table
        # hyperplane_signature loop evaluated n_tables x n_planes
        # INTERPRETED zip_with/aggregate dots per row — profiled as 3-4s
        # of the ~5s per-batch cost at the 10x probe. Bit-identical
        # buckets (explicit ascending fold; parity pinned in
        # tests/test_similarity.py), so existing state layouts and the
        # gate's DuckDB oracle are untouched.
        return hyperplane_bands_arrow(
            batch_df,
            n_tables=n_tables,
            n_planes=n_planes,
            dim=dim,
            id_col=id_col,
            vec_col=vec_col,
        )

    return _banded_dedup_dfs_sink(
        bands_fn,
        sink,
        state_dir,
        id_col=id_col,
        compact_every=compact_every,
        shards=shards,
        op_name="embedding_dedup_dfs_sink",
    )


def _banded_dedup_dfs_sink(
    bands_fn: Callable[[DataFrame], DataFrame],
    sink: Callable[[DataFrame, int], None],
    state_dir: str,
    id_col: str,
    compact_every: int,
    shards: int,
    op_name: str,
) -> Callable[[DataFrame, int], None]:
    """Shared engine of the banded bucket-claim sinks: ``bands_fn``
    maps a batch to its ``(id_col, band int, band_sig string)`` rows;
    everything else — MIN-merged claims, ordering-contract watermark,
    screen, idempotent delta write, (sharded) compaction — is
    modality-independent."""
    if shards < 1 or shards > compact_every:
        raise ValueError(
            f"shards must be in [1, compact_every]; got {shards}"
        )

    def _shard_col():
        return F.pmod(
            F.xxhash64(F.col("band"), F.col("band_sig")), F.lit(shards)
        ).cast("int")

    def wrapped(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if shards > 1:
            _compact_sharded(
                spark,
                state_dir,
                batch_id,
                compact_every,
                shards,
                _LSH_SCHEMA,
                lambda df: df.groupBy("band", "band_sig").agg(
                    F.min("min_id").alias("min_id")
                ),
            )
        else:
            _compact_lsh(spark, state_dir, batch_id, compact_every)
        # ordering-contract detector (ADVICE r8): the emitted-set
        # equivalence to the batch NOT-EXISTS predicate needs ids
        # nondecreasing across batches; a violation must fail loudly,
        # not silently diverge from the oracle. One batch-sized agg;
        # the sentinel lookup and the claims relation share ONE
        # persisted read of the state files (the watermark action would
        # otherwise scan every base/delta a second time per batch).
        lo_hi = batch_df.agg(
            F.min(F.col(id_col).cast("long")).alias("lo"),
            F.max(F.col(id_col).cast("long")).alias("hi"),
        ).first()
        batch_lo, batch_hi = lo_hi["lo"], lo_hi["hi"]
        raw = _lsh_raw(spark, state_dir, batch_id, shards).persist()
        # try/finally (ADVICE r9): a raise from sink() or any
        # intermediate action must not leak the cached state relation
        # into the retried micro-batch — the executor block-manager
        # memory would otherwise accumulate one orphan per retry
        try:
            wm = (
                raw.filter(
                    (F.col("band") == F.lit(_LSH_IDWM_BAND))
                    & (F.col("band_sig") == F.lit(_LSH_IDWM_SIG))
                )
                .agg(F.min("min_id").alias("neg_max"))
                .first()
            )
            prev_max = (
                -wm["neg_max"] if wm and wm["neg_max"] is not None else None
            )
            if (
                batch_lo is not None
                and prev_max is not None
                and batch_lo < prev_max
            ):
                raise ValueError(
                    f"{op_name}: ordering contract violated — "
                    f"batch {batch_id} min {id_col}={batch_lo} is below the "
                    f"running max {prev_max} of earlier batches; emitted "
                    "set would silently diverge from the batch NOT-EXISTS "
                    "semantics (ids must be nondecreasing across batches)"
                )
            state = (
                raw.filter(F.col("band") != F.lit(_LSH_IDWM_BAND))
                .groupBy("band", "band_sig")
                .agg(F.min("min_id").alias("min_id"))
            )
            bands = bands_fn(batch_df)
            batch_claims = bands.groupBy("band", "band_sig").agg(
                F.min(id_col).alias("batch_min")
            )
            # a band suppresses the doc iff a lower id claimed it — in the
            # pre-batch state or inside this batch (batch_min == own id for
            # the batch's leader, so the leader is never self-suppressed)
            suppressed = (
                bands.join(batch_claims, ["band", "band_sig"])
                .join(state, ["band", "band_sig"], "left")
                .groupBy(id_col)
                .agg(
                    F.max(
                        (
                            F.coalesce(F.col("min_id"), F.col(id_col))
                            < F.col(id_col)
                        )
                        | (F.col("batch_min") < F.col(id_col))
                    ).alias("__dup")
                )
            )
            # anti-join on the SUPPRESSED ids (not inner-join on
            # survivors): a doc too short to produce any shingle has no
            # band rows and must pass through, exactly like the batch
            # operators treat it
            fresh = batch_df.join(
                suppressed.filter(F.col("__dup")).select(id_col),
                id_col,
                "left_anti",
            )
            # the sink sees survivors BEFORE state advances: a crash here
            # replays the batch against the same pre-batch state
            sink(fresh, batch_id)
            delta = batch_claims.select(
                "band", "band_sig", F.col("batch_min").alias("min_id")
            )
            if batch_hi is not None:
                # id-watermark sentinel rides the same delta (negated so
                # the MIN merge yields the running MAX; see
                # _LSH_IDWM_BAND). Built JVM-side: a Python-list
                # createDataFrame plans a Python-runner local scan
                # costing ~5s PER ACTION even for one row (measured on
                # the livecheck sentinel, r8) — at one sentinel per
                # micro-batch that fixed cost is the difference between
                # a 1s and a 6s batch.
                delta = delta.unionByName(
                    spark.range(1).select(
                        F.lit(_LSH_IDWM_BAND).cast("int").alias("band"),
                        F.lit(_LSH_IDWM_SIG).alias("band_sig"),
                        F.lit(-int(batch_hi)).cast("long").alias("min_id"),
                    )
                )
            if shards > 1:
                delta.withColumn("shard", _shard_col()).write.partitionBy(
                    "shard"
                ).mode("overwrite").parquet(f"{state_dir}/delta_v{batch_id}")
            else:
                delta.write.mode("overwrite").parquet(
                    f"{state_dir}/delta_v{batch_id}"
                )
        finally:
            raw.unpersist()

    return wrapped


def _compact_lsh(
    spark: SparkSession, state_dir: str, batch_id: int, compact_every: int
) -> None:
    if compact_every <= 0 or batch_id == 0 or batch_id % compact_every:
        return
    paths, deltas, base = _state_parts(spark, state_dir, batch_id)
    if not deltas:
        _prune_superseded(spark, state_dir, base)
        return
    target = max(deltas)
    merged = (
        _read_state(spark, paths, _LSH_SCHEMA)
        .groupBy("band", "band_sig")
        .agg(F.min("min_id").alias("min_id"))
    )
    merged.write.mode("overwrite").parquet(f"{state_dir}/base_v{target}")
    _prune_superseded(spark, state_dir, target)


__all__ = [
    "bloom_dedup_dfs_sink",
    "bloom_state_words",
    "cms_dfs_sink",
    "cms_state_cells",
    "lsh_bucket_state",
    "lsh_dedup_dfs_sink",
]
