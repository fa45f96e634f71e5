"""Deterministic sampling for reproducible training-data pipelines.

Random sampling (``df.sample``) differs run-to-run and engine-to-engine;
pipelines that must be re-runnable (and auditable) sample by *content
hash* instead: a row is in the sample iff a hash of its key falls under a
threshold. Same rows every run, on every engine, regardless of
partitioning — and the predicate pushes into the scan like any filter.

- :func:`hash_sample` — Bernoulli-style p-fraction sample by key hash.
- :func:`top_k_per_key` — deterministic "reservoir" of k rows per key
  (rank by key-salted hash); the per-key uniform sample used for
  per-domain caps in corpus curation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _hash01(col: Column, salt: str = "", hex_chars: int = 12) -> Column:
    """md5-derived uniform [0,1) value — engine-portable (md5 everywhere).

    ``hex_chars`` ≤ 12 keeps the value exact in a double.
    """
    h = F.md5(F.concat(F.lit(salt), col.cast("string")))
    return F.conv(F.substring(h, 1, hex_chars), 16, 10).cast("double") / F.lit(
        float(16**hex_chars)
    )


def hash_sample(
    df: DataFrame,
    key: str,
    fraction: float,
    salt: str = "",
    hex_chars: int = 12,
) -> DataFrame:
    """Keep rows whose key-hash falls under ``fraction`` (deterministic)."""
    return df.filter(_hash01(F.col(key), salt, hex_chars) < fraction)


def top_k_per_key(
    df: DataFrame,
    key: str,
    row_key: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic k-per-key sample: rank rows by salted row-hash within
    each key, keep the first k. One shuffle on the key; the uniform-ish
    order comes from the hash, not an RNG."""
    w = W.partitionBy(key).orderBy(
        F.md5(F.concat(F.lit(salt), F.col(row_key).cast("string"))),
        F.col(row_key),
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def mixture_sample(
    df: DataFrame,
    group_col: str,
    key: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
    hex_chars: int = 12,
) -> DataFrame:
    """Per-group sampling fractions — the data-mixing step of corpus
    curation (upweight/downweight domains or languages to hit a target
    mixture). A row stays iff its key-hash falls under its group's
    fraction; deterministic, engine-portable, and the predicate is a
    plain filter (pushes down, no shuffle, no RNG)."""
    frac = F.lit(default_fraction)
    for g, p in fractions.items():
        frac = F.when(F.col(group_col) == g, F.lit(p)).otherwise(frac)
    return df.filter(_hash01(F.col(key), salt, hex_chars) < frac)


def temperature_sample(
    df: DataFrame,
    group_col: str,
    key: str,
    alpha: float = 0.5,
    target_frac: float = 0.3,
    salt: str = "",
    hex_chars: int = 12,
    round_digits: int = 6,
) -> DataFrame:
    """Temperature-flattened mixture sampling — the multilingual /
    multi-domain upsampling rule (mT5, XLM-R style): group ``g`` keeps
    each row with probability

        p_g = min(1, round(target_frac · N · n_g^alpha /
                           (n_g · Σ_m n_m^alpha), round_digits))

    so the expected kept volume is ~``target_frac · N`` while the GROUP
    mixture is flattened toward ``n_g^alpha``: ``alpha=1`` preserves
    natural proportions, ``alpha=0`` is uniform-per-group, 0.5 the
    usual compromise that upsamples rare languages without letting them
    dominate.  Unlike :func:`mixture_sample` the fractions are derived
    FROM the corpus (one group-count partial agg + a one-row total,
    both broadcast back — model-sized), so the mixture tracks the data
    as it grows.  The keep rule is the same deterministic key-hash
    threshold (no RNG); ``p_g`` is quantized to ``round_digits`` so the
    cross-engine threshold is identical (pow/divide last-ulp drift
    cannot flip a row).
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    tot = counts.agg(
        F.sum("__n").alias("__t"),
        F.sum(F.pow("__n", F.lit(alpha))).alias("__w"),
    )
    p = F.round(
        F.lit(target_frac)
        * F.col("__t")
        * F.pow("__n", F.lit(alpha))
        / (F.col("__n") * F.col("__w")),
        round_digits,
    )
    pg = counts.crossJoin(F.broadcast(tot)).select(
        group_col, F.least(F.lit(1.0), p).alias("__p")
    )
    return (
        df.join(F.broadcast(pg), group_col)
        .filter(_hash01(F.col(key), salt, hex_chars) < F.col("__p"))
        .drop("__p")
    )


def split_expr(
    col: Column,
    splits: dict[str, float],
    salt: str = "split:",
    hex_chars: int = 8,
) -> Column:
    """The split-assignment rule as a bare Column expression.

    Factored out of :func:`assign_splits` so consumers that need a
    row's split WITHOUT carrying the assignment relation around — e.g.
    labeling both ends of a near-dup pair in :func:`split_leakage` —
    can apply the identical rule to any key column as a pure
    projection, instead of paying a join against the assignment table.
    """
    h = _hash01(col, salt, hex_chars)
    names = list(splits)
    out = F.lit(names[-1])
    bounds = []
    cum = 0.0
    for name in names[:-1]:
        cum += splits[name]
        bounds.append((cum, name))
    for cum, name in reversed(bounds):
        out = F.when(h < cum, name).otherwise(out)
    return out


def assign_splits(
    df: DataFrame,
    key: str,
    splits: dict[str, float],
    salt: str = "split:",
    hex_chars: int = 8,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by content hash.

    ``splits`` maps name -> fraction (must sum to ~1.0); a row lands in
    the first split whose cumulative fraction exceeds its key-hash. The
    same key always lands in the same split — on every run, every
    engine, and every partitioning — which is the leakage guarantee a
    training pipeline needs (a doc can never migrate from test to train
    between runs). Pure column expression: no shuffle, no RNG, and the
    derived column costs one md5 per row.
    """
    return df.withColumn(out_col, split_expr(F.col(key), splits, salt, hex_chars))


def split_leakage(
    pairs: DataFrame,
    splits: dict[str, float],
    left: str = "doc1",
    right: str = "doc2",
    salt: str = "split:",
    hex_chars: int = 8,
) -> DataFrame:
    """Cross-split leakage AUDIT over a near-dup pair relation.

    ``split_by_cluster`` PREVENTS leakage by splitting at near-dup-
    cluster granularity; this measures what a naive per-document split
    leaks: every near-dup pair straddling two splits is a potential
    train→test contamination channel (the model has effectively seen
    the test doc). Input is the output of any pair-producing dedup
    operator (:func:`~faust_spark.operators.dedup.jaccard_pairs_prefix`
    etc.); output is one row per unordered split pair
    ``(split_a <= split_b, n_pairs)`` — the diagonal rows are benign
    within-split duplicates, the off-diagonals are the leak.

    Scale shape: the split of each pair end is recomputed with
    :func:`split_expr` — a pure projection (one md5 per end), NOT a
    join against the assignment relation — so the audit adds ZERO
    shuffles beyond the dedup operator itself plus a ≤|splits|²-row
    partial agg. At 100 TB the cost is exactly the cost of the dedup
    pass you were already running.

    The reference has no analogue (faust has no relational layer);
    the closest published practice is the cross-split decontamination
    audit in LLM corpus reports.
    """
    s1 = split_expr(F.col(left), splits, salt, hex_chars)
    s2 = split_expr(F.col(right), splits, salt, hex_chars)
    return (
        pairs.select(
            F.least(s1, s2).alias("split_a"),
            F.greatest(s1, s2).alias("split_b"),
        )
        .groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    row_key: str,
    fraction: float,
    salt: str = "",
) -> DataFrame:
    """Exact-count stratified sample: ceil(fraction * n_g) rows from every
    stratum g, chosen deterministically by hash rank.

    ``hash_sample`` with a per-group fraction (``mixture_sample``) gives
    each row an independent p — the realized per-group count varies
    (binomial), which matters when strata are small or the mixture must
    be exact. This takes *exactly* ceil(fraction * count(g)) rows per
    stratum: rank rows within the stratum by salted row-hash, count the
    stratum with an unbounded window over the SAME partitioning (the sort
    for row_number is reused — one shuffle total, no second agg+join),
    keep rank <= ceil(fraction * count). Deterministic across runs,
    engines, partitionings.
    """
    w = W.partitionBy(stratum_col).orderBy(
        F.md5(F.concat(F.lit(salt), F.col(row_key).cast("string"))),
        F.col(row_key),
    )
    wcnt = W.partitionBy(stratum_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(wcnt))
        .filter(F.col("__rn") <= F.ceil(F.col("__n") * fraction))
        .drop("__rn", "__n")
    )


def shuffle_shards(
    df: DataFrame,
    key: str,
    n_shards: int,
    salt: str = "shuffle:",
    hex_chars: int = 8,
) -> DataFrame:
    """Deterministic global shuffle into ``n_shards`` ordered shards.

    Training wants data in a reproducible random order; a global
    ``ORDER BY hash`` is a single-partition sort at scale. Instead:
    shard = floor(hash01 * n) (uniform), position = row_number within
    the shard ordered by the full md5 (ties broken by key). One hash
    shuffle into n_shards groups, per-shard local sort — every shard
    sorts in parallel, nothing global. At 100 TB pick n_shards so a
    shard's keys fit an executor's sort buffer (the payload columns
    ride along; sort keys are 32-byte digests).
    """
    h = F.md5(F.concat(F.lit(salt), F.col(key).cast("string")))
    shard = F.floor(_hash01(F.col(key), salt, hex_chars) * n_shards).cast("int")
    out = df.withColumn("__h", h).withColumn("shard", shard)
    w = W.partitionBy("shard").orderBy("__h", F.col(key))
    return out.withColumn("pos", F.row_number().over(w)).drop("__h")


def weighted_sample_k(
    df: DataFrame,
    weight_col: str,
    k: int,
    key: str = "doc_id",
    per: str | None = None,
    salt: str = "",
    priority_decimals: int | None = 9,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis & Spirakis 2006, "Weighted random sampling with a
    reservoir"): each row draws priority ``u^(1/w)`` for a uniform
    ``u``; the top-k priorities ARE a weighted sample without
    replacement. The uniform comes from the engine-portable md5 hash
    (no RNG — replayable, resumable, oracle-checkable), and the top-k
    is ranked on the MONOTONE-equivalent key ``ln(u)/w`` (avoids
    ``pow``, whose last-ulp rounding differs across engines more often
    than ``ln``'s).

    ``per=None``: one global sample via TakeOrderedAndProject (no global
    sort). ``per=<col>``: k per group via a rank window — the standard
    per-language / per-source quota draw. Rows with weight <= 0 never
    sample. This is the principled replacement for "sort by score and
    take the head" when building score-weighted training mixtures: every
    row has inclusion probability proportional to its weight, not just
    the argmax rows.

    Returns the sampled rows with their ``__priority`` dropped.
    """
    u = _hash01(F.col(key), salt)
    # ln(u)/w: monotone in u^(1/w) for w>0 (ln u < 0, so LARGER is
    # better in both formulations); u=0 guard via the tiny-double floor.
    # The priority rounds to ``priority_decimals`` before ranking so a
    # last-ulp libm difference between engines can't flip ranks; genuine
    # rounding ties break on ``key`` deterministically. None = raw.
    prio = F.log(F.greatest(u, F.lit(1e-18))) / F.col(weight_col)
    if priority_decimals is not None:
        prio = F.round(prio, priority_decimals)
    tagged = df.filter(F.col(weight_col) > 0).withColumn("__prio", prio)
    if per is None:
        return tagged.orderBy(F.col("__prio").desc(), F.col(key)).limit(
            k
        ).drop("__prio")
    w = W.partitionBy(per).orderBy(F.col("__prio").desc(), F.col(key))
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn", "__prio")
    )


__all__ = [
    "token_budget_plan",
    "hash_sample",
    "top_k_per_key",
    "mixture_sample",
    "temperature_sample",
    "stratified_sample",
    "assign_splits",
    "shuffle_shards",
    "weighted_sample_k",
]


def token_budget_plan(
    docs: DataFrame,
    budget_tokens: int,
    group_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.7,
    round_digits: int = 9,
) -> DataFrame:
    """Epoch planning: per-group sampling plan that hits a global
    TOKEN budget under a temperature-flattened mixture — the step a
    corpus release runs before materializing an epoch (how much of
    each source to draw so the epoch is ``budget_tokens`` big with the
    desired n_g^alpha mixture).

    Returns (group, n_docs, n_tokens, share, target_tokens, fraction):
    share = ROUND(n_tokens^alpha / Σ n^alpha, round_digits); target =
    min(n_tokens, FLOOR(budget·share)) — a group can't be oversampled
    past its actual volume without replacement (the cap is reported,
    not silently redistributed); fraction = target/n_tokens, the
    number :func:`mixture_sample` then consumes.  One group-keyed
    partial agg + a one-row total broadcast — model-sized; share is
    quantized so pow/divide last-ulp drift is engine-invisible, and
    everything after the quantized share is exact integer/double
    arithmetic on identical operands.
    """
    counts = (
        docs.select(
            F.col(group_col).alias("grp"),
            F.size(F.split(F.col(text_col), " ")).alias("nt"),
        )
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").cast("bigint").alias("n_tokens"),
        )
    )
    tot = counts.agg(
        F.sum(F.pow(F.col("n_tokens").cast("double"), F.lit(alpha)))
        .alias("w")
    )
    share = F.round(
        F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))
        / F.col("w"),
        round_digits,
    )
    out = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "grp",
            "n_docs",
            "n_tokens",
            share.alias("share"),
        )
        .withColumn(
            "target_tokens",
            F.least(
                F.col("n_tokens"),
                F.floor(
                    F.lit(float(budget_tokens)) * F.col("share")
                ).cast("bigint"),
            ),
        )
        .withColumn(
            "fraction",
            F.round(
                F.col("target_tokens").cast("double")
                / F.col("n_tokens").cast("double"),
                round_digits,
            ),
        )
    )
    return out
