"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale design notes (the point of each implementation):

- **exact_dedup**: hash-groupBy on md5(text) — one shuffle of (hash, id)
  pairs with map-side combine; never moves the text itself.
- **jaccard_pairs**: shingle → self-equi-join on shingle → per-pair
  intersection counts. The join key is the shingle hash, so co-occurrence
  is computed without any pairwise loop; frequency-capped shingles (df
  bound) keep hub shingles from exploding the join at corpus scale.
- **minhash_lsh**: k independent min-hashes from one explode, banded into
  b groups; candidate pairs only where a full band collides — the classic
  sub-quadratic near-dup path for 100 TB corpora. Exact Jaccard verifies
  candidates afterward (cheap: candidates ≪ pairs).
- **simhash**: 32-bit weighted-bit fingerprint; Hamming-adjacent banding
  is left to the caller (fingerprint equality already catches heavy dups).
- All hashes are md5-derived → reproducible in DuckDB for oracles and in
  any other engine for cross-system audits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# exact
# --------------------------------------------------------------------------


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """One row per distinct content hash: keeper id (min), group size."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


# --------------------------------------------------------------------------
# shingling + n-gram Jaccard
# --------------------------------------------------------------------------


def shingles(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distinct word n-gram shingles per document: (id, shingle).

    Documents shorter than ``n`` words produce no shingles (and therefore
    never enter pair generation) — Spark's ``sequence(1, 0)`` would count
    DOWN, so the short case needs an explicit empty guard.
    """
    words = F.split(F.col(text_col), " ")
    idx = F.when(
        F.size(words) >= n,
        F.sequence(F.lit(1), F.size(words) - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    sh = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i, n))
    )
    return (
        df.select(F.col(id_col), F.explode(sh).alias("shingle"))
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs by n-gram-shingle Jaccard similarity.

    ``max_shingle_freq`` drops shingles appearing in more than that many
    docs before the self-join — the standard hub-key guard: a stop-shingle
    occurring in 1M docs would otherwise contribute 10^12 join rows.
    """
    # the shingle set feeds the freq filter, both join sides, and the size
    # table — materialize once (on a cluster: prefer a checkpoint/Delta
    # staging table for multi-TB corpora)
    sh = shingles(df, n, text_col, id_col).persist()
    if max_shingle_freq is not None:
        freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        sh = (
            sh.join(freq.filter(F.col("df") <= max_shingle_freq), "shingle")
            .select(id_col, "shingle")
        )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .groupBy(
            F.col(f"a.{id_col}").alias("doc1"),
            F.col(f"b.{id_col}").alias("doc2"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    s1 = sizes.select(F.col(id_col).alias("doc1"), F.col("n_sh").alias("n1"))
    s2 = sizes.select(F.col(id_col).alias("doc2"), F.col("n_sh").alias("n2"))
    out = (
        inter.join(s1, "doc1")
        .join(s2, "doc2")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("n1") + F.col("n2") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("doc1", "doc2", "jaccard")


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, seed, minhash) — min over shingles of md5(seed || ':' || s).

    One explode of (shingle × seed) followed by a min-agg: partial
    aggregation makes the shuffle carry only (id, seed, current-min).
    """
    sh = shingles(df, n, text_col, id_col)
    return _signatures_from_shingles(sh, num_hashes, id_col)


def _signatures_from_shingles(
    sh: DataFrame, num_hashes: int, id_col: str
) -> DataFrame:
    seeds = F.explode(
        F.sequence(F.lit(0), F.lit(num_hashes - 1))
    ).alias("seed")
    exploded = sh.select(F.col(id_col), F.col("shingle"), seeds)
    return exploded.groupBy(id_col, "seed").agg(
        F.min(
            F.md5(F.concat_ws(":", F.col("seed"), F.col("shingle")))
        ).alias("mh")
    )


def lsh_bands(
    sigs: DataFrame,
    band_size: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, band, band_sig): md5 over the band's minhashes in seed order.

    Seed order is reconstructed with one conditional MIN per band slot
    (exactly one row exists per (id, seed)) — a plain codegen'd
    HashAggregate, instead of the ObjectHashAggregate a
    sort_array(collect_list(struct)) would force.
    """
    banded = sigs.withColumn("band", (F.col("seed") / band_size).cast("int"))
    slots = [
        F.min(F.when(F.col("seed") % band_size == r, F.col("mh"))).alias(
            f"__m{r}"
        )
        for r in range(band_size)
    ]
    agg = banded.groupBy(id_col, "band").agg(*slots)
    return agg.select(
        F.col(id_col),
        F.col("band"),
        F.md5(
            F.concat_ws(",", *[F.col(f"__m{r}") for r in range(band_size)])
        ).alias("band_sig"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 16,
    band_size: int = 4,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate pairs from LSH band collisions, verified by exact Jaccard.

    With k=16, b=4 bands of r=4 rows the collision curve is
    P(candidate) = 1-(1-j^4)^4 — steep around j≈0.5, the usual near-dup
    operating point. Verification joins shingle sets only for candidates.
    """
    # one shingle materialization serves signatures, verification joins,
    # and sizes (persist → localCheckpoint/Delta staging at corpus scale)
    sh = shingles(df, n, text_col, id_col).persist()
    sigs = _signatures_from_shingles(sh, num_hashes, id_col)
    bands = lsh_bands(sigs, band_size, id_col)
    b1, b2 = bands.alias("b1"), bands.alias("b2")
    cands = (
        b1.join(
            b2,
            (F.col("b1.band") == F.col("b2.band"))
            & (F.col("b1.band_sig") == F.col("b2.band_sig"))
            & (F.col(f"b1.{id_col}") < F.col(f"b2.{id_col}")),
        )
        .select(
            F.col(f"b1.{id_col}").alias("doc1"),
            F.col(f"b2.{id_col}").alias("doc2"),
        )
        .distinct()
    )
    # exact-Jaccard verification on candidates only
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col(id_col).alias("doc1"), F.col("shingle"))
    b = sh.select(F.col(id_col).alias("doc2"), F.col("shingle"))
    inter = (
        cands.join(a, "doc1")
        .join(b, ["doc2", "shingle"])
        .groupBy("doc1", "doc2")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    s1 = sizes.select(F.col(id_col).alias("doc1"), F.col("n_sh").alias("n1"))
    s2 = sizes.select(F.col(id_col).alias("doc2"), F.col("n_sh").alias("n2"))
    return (
        inter.join(s1, "doc1")
        .join(s2, "doc2")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("n1") + F.col("n2") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc1", "doc2", "jaccard")
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash(
    df: DataFrame,
    bits: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """32-bit SimHash fingerprint from distinct-word md5 bit votes.

    bit k of word-hash = nibble ``instr``-decoded from hex char k/4 of
    md5(word) — md5-derived so the DuckDB oracle can reproduce it exactly.

    Plan shape (iterated via .explain): one word-explode, then 32 vote
    sums as parallel aggregate COLUMNS over the word rows — not an
    explode(word × bit) row blowup. The shuffle carries one partially
    aggregated 32-column row per (partition, doc) instead of 32× the word
    rows; at corpus scale that's the difference between shuffling ~N·32
    rows and ~N words with map-side combine.
    """
    words = F.array_distinct(F.split(F.col(text_col), " "))
    w = df.select(F.col(id_col), F.explode(words).alias("word")).withColumn(
        "h", F.md5(F.col("word"))
    )

    def bit_expr(k: int):
        nibble = (
            F.instr(F.lit("0123456789abcdef"), F.substring("h", k // 4 + 1, 1))
            - 1
        )
        bit = F.shiftright(nibble, 3 - k % 4) % 2
        return bit * 2 - 1  # signed vote

    votes = w.groupBy(id_col).agg(
        *[F.sum(bit_expr(k)).alias(f"v{k}") for k in range(bits)]
    )
    fp = None
    for k in range(bits):
        term = F.when(F.col(f"v{k}") > 0, F.lit(1 << k)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return votes.select(
        F.col(id_col), fp.cast("bigint").alias("simhash")
    )


# --------------------------------------------------------------------------
# duplicate clustering (connected components)
# --------------------------------------------------------------------------


def connected_components(
    nodes: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iterations: int = 20,
    small_graph_edges: int = 1_000_000,
) -> DataFrame:
    """Label each node with the min id of its duplicate cluster.

    Iterative min-label propagation (the standard large-graph CC loop):
    every round each node takes the min of its own label and its
    neighbors' labels; converges in O(component diameter) rounds. Data
    stays distributed — the driver loop only checks a convergence count
    per round. Dup components from near-dup pair detection have tiny
    diameters, so 3-4 rounds is typical.

    ``nodes``: one column ``id_col``; ``pairs``: columns doc1/doc2.
    Returns (id_col, component).

    Fast path: near-dup edge sets are orders of magnitude smaller than
    the corpus (they're the *output* of candidate pruning), so when the
    edge list fits comfortably on the driver (≤ ``small_graph_edges``)
    a local union-find resolves components in one pass and only the
    node→component map is distributed again. The iterative join loop
    remains the fallback for genuinely huge duplicate graphs.
    """
    # materialize the pair list once — the union of both edge directions
    # would otherwise evaluate the (expensive) pair-generation pipeline
    # twice (persist alone is lazy; the count forces the cache to fill
    # before both branches read it)
    pairs = pairs.persist()
    pairs.count()
    edges = (
        pairs.select(F.col("doc1").alias("src"), F.col("doc2").alias("dst"))
        .unionByName(
            pairs.select(
                F.col("doc2").alias("src"), F.col("doc1").alias("dst")
            )
        )
        .distinct()
        .persist()
    )
    # only edge-connected nodes participate in propagation; isolated nodes
    # are their own component and join back at the end (in a dedup corpus
    # the connected subgraph is a tiny fraction of all docs)
    all_nodes = nodes.select(F.col(id_col).alias("node"))
    active = edges.select(F.col("src").alias("node")).distinct().persist()
    isolated = all_nodes.join(active, "node", "left_anti")

    if edges.count() <= small_graph_edges:
        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in edges.collect():
            a, b = r.src, r.dst
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        spark = nodes.sparkSession
        comp_rows = [(n, find(n)) for n in parent]
        edges.unpersist()
        active.unpersist()
        if comp_rows:
            resolved = spark.createDataFrame(
                comp_rows, "node long, component long"
            )
        else:
            resolved = all_nodes.limit(0).select(
                "node", F.col("node").alias("component")
            )
        # isolated = everything not in the (already collected) edge set —
        # an anti-join against the tiny resolved side, not a recompute of
        # the pair pipeline
        iso = all_nodes.join(
            F.broadcast(resolved.select("node")), "node", "left_anti"
        )
        return resolved.unionByName(
            iso.select("node", F.col("node").alias("component"))
        ).select(F.col("node").alias(id_col), "component")

    labels = active.select(
        "node", F.col("node").alias("label")
    ).persist()
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))
                ).alias("label"),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    active.unpersist()
    out = labels.unionByName(
        isolated.select("node", F.col("node").alias("label"))
    )
    return out.select(
        F.col("node").alias(id_col), F.col("label").alias("component")
    )


# --------------------------------------------------------------------------
# embedding near-dup
# --------------------------------------------------------------------------


def embedding_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate pairs by cosine similarity over an embedding column.

    Brute-force O(n²) form — correct baseline for modest n; at corpus
    scale route candidates through :func:`similarity.hyperplane_lsh`
    buckets first and apply this only within buckets.
    """
    from faust_spark.operators.similarity import cosine_expr

    a = emb.select(
        F.col(id_col).alias("doc1"), F.col(vec_col).alias("v1")
    )
    b = emb.select(
        F.col(id_col).alias("doc2"), F.col(vec_col).alias("v2")
    )
    return (
        a.join(b, F.col("doc1") < F.col("doc2"))
        .withColumn("cosine", cosine_expr(F.col("v1"), F.col("v2")))
        .filter(F.col("cosine") >= threshold)
        .select("doc1", "doc2", "cosine")
    )


__all__ = [
    "exact_dedup",
    "shingles",
    "jaccard_pairs",
    "minhash_signatures",
    "lsh_bands",
    "minhash_lsh_pairs",
    "simhash",
    "embedding_dup_pairs",
]
