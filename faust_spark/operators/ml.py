"""Distributed model fitting for data-pipeline classifiers.

Training-data pipelines don't just APPLY quality classifiers (that's
``operators.text.quality_classifier`` — literal weights, one scan);
they FIT them: a small labeled seed set (human tags, a target-domain
sample) trains a linear model that then scores the whole corpus
(CCNet's LM-filter fit, fastText quality filters, Dolma's taggers).
This module is the fit step, Spark-shaped:

- **Full-batch gradient descent, one aggregation per step.** Each GD
  step for logistic regression is Σ_rows (σ(w·x) − y)·x_j — a
  partial-agg sum keyed by NOTHING (map-side combine all the way), so a
  step costs one corpus pass with a (d+1)-value result. ``steps``
  passes total; the model (d+1 doubles) is the only thing on the
  driver. No MLlib, no RDDs — plain column expressions in codegen.
- **Engine-portable by construction** (the repo's verification bar):
  features are max-|x|-normalized (exact division), every step's
  updated weight vector is ROUNDED to ``round_dp`` decimals *in Spark*
  (``F.round``, HALF_UP — matching DuckDB's ROUND) before it feeds the
  next step, so the weight trajectory is reproducible bit-for-bit by a
  SQL oracle that unrolls the same steps (the ``mmr_rerank`` rounding
  trick applied to iterative optimization). Cross-engine float-sum
  error (~1e-13 on the normalized sums) can only flip a rounded weight
  if the true value sits within that error of a 0.5·10^-round_dp grid
  boundary.

At 100 TB the labeled seed set is small (thousands-millions of rows) —
the fit runs on the seed, the APPLY runs on the corpus; both shapes are
one scan per pass with nothing wide ever shuffled.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from faust_spark.operators.mat import materialize

__all__ = [
    "logreg_fit",
    "logreg_predict",
    "feature_scales",
    "adaboost_fit",
    "adaboost_predict",
    "feature_ranges",
    "nb_fit",
    "nb_classify",
]


def feature_scales(
    df: DataFrame, feature_cols: Sequence[str]
) -> list[float]:
    """max(|x|) per feature (1.0 for all-zero columns) — the exact,
    engine-portable normalizer ``logreg_fit`` applies before descent."""
    row = df.agg(
        *[
            F.max(F.abs(F.col(c).cast("double"))).alias(c)
            for c in feature_cols
        ]
    ).first()
    return [float(row[c]) if row[c] else 1.0 for c in feature_cols]


def _z(weights: list[float], xcols: list[Column]) -> Column:
    z: Column = F.lit(float(weights[0]))  # bias
    for w, x in zip(weights[1:], xcols):
        z = z + F.lit(float(w)) * x
    return z


def logreg_fit(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    steps: int = 4,
    lr: float = 1.0,
    round_dp: int = 7,
    scales: Optional[Sequence[float]] = None,
) -> list[list[float]]:
    """Fit logistic regression by ``steps`` full-batch GD steps.

    Returns the weight TRAJECTORY: ``steps + 1`` vectors of
    ``len(feature_cols) + 1`` doubles (bias first), starting from the
    zero vector — every step's weights rounded to ``round_dp`` decimals
    (see module docstring for why that makes the whole trajectory
    SQL-oracle-verifiable). ``label_col`` must be 0/1-valued (booleans
    cast fine).

    Cost: one ``count``-free aggregation per step over ``df`` (the n
    divisor comes from the same aggregation), model-sized driver state.
    """
    d = len(feature_cols)
    # same narrow-projection materialization as adaboost_fit below: one
    # compute of the (often text-derived) feature expressions instead of
    # steps+1 replans against the heavy source. Values unchanged.
    base = materialize(df.select(label_col, *feature_cols))
    sc = list(scales) if scales is not None else feature_scales(
        base, feature_cols
    )
    xcols = [
        (F.col(c).cast("double") / F.lit(float(s)))
        for c, s in zip(feature_cols, sc)
    ]
    y = F.col(label_col).cast("double")
    w = [0.0] * (d + 1)
    traj = [list(w)]
    for _ in range(steps):
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(w, xcols)))
        err = p - y
        n = F.count(F.lit(1)).cast("double")
        aggs = [
            F.round(
                F.lit(float(w[0])) - F.lit(lr) * F.sum(err) / n, round_dp
            ).alias("w0")
        ] + [
            F.round(
                F.lit(float(w[j + 1]))
                - F.lit(lr) * F.sum(err * xcols[j]) / n,
                round_dp,
            ).alias(f"w{j + 1}")
            for j in range(d)
        ]
        row = base.agg(*aggs).first()
        w = [float(row[f"w{j}"]) for j in range(d + 1)]
        traj.append(list(w))
    return traj


def logreg_predict(
    df: DataFrame,
    feature_cols: Sequence[str],
    weights: Sequence[float],
    scales: Sequence[float],
    out_col: str = "p",
) -> DataFrame:
    """Score rows with a fitted model: σ(w·x_normalized) as ``out_col``
    — the same literal-weights one-scan shape as
    ``text.quality_classifier``, with the normalization the fit used."""
    xcols = [
        (F.col(c).cast("double") / F.lit(float(s)))
        for c, s in zip(feature_cols, scales)
    ]
    z = _z(list(weights), xcols)
    return df.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))


# ---------------------------------------------------------------------
# AdaBoost with decision stumps (round 6)
# ---------------------------------------------------------------------

def feature_ranges(
    df: DataFrame, feature_cols: Sequence[str]
) -> list[tuple[float, float]]:
    """(min, max) per feature — the binning model ``adaboost_fit``
    quantizes against.  min/max are order-independent aggregates, so
    the scalars are bit-identical across engines."""
    aggs = []
    for c in feature_cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"mn_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"mx_{c}"))
    row = df.agg(*aggs).first()
    return [
        (float(row[f"mn_{c}"]), float(row[f"mx_{c}"]))
        for c in feature_cols
    ]


def _bin_expr(
    col: Column, mn: float, mx: float, n_bins: int
) -> Column:
    """Engine-portable bin id in [0, n_bins-1]: FLOOR of the 9-dp
    ROUNDed scaled position (the rounding grid absorbs cross-engine
    ulp differences in the division; a flip needs the true position
    within float error of a grid boundary — the repo's accepted-risk
    class), clamped top and bottom."""
    if mx == mn:
        return F.lit(0)
    u = F.round(
        (col - F.lit(mn)) / F.lit(mx - mn) * F.lit(float(n_bins)), 9
    )
    return F.least(
        F.lit(n_bins - 1),
        F.greatest(F.lit(0), F.floor(u).cast("int")),
    )


def _stump_h(
    stump: tuple, bins: list[Column]
) -> Column:
    """h(x) = pol if bin_j(x) <= b else -pol, as a codegen expression."""
    j, b, pol = stump[0], stump[1], stump[2]
    return F.when(
        bins[j] <= F.lit(b), F.lit(float(pol))
    ).otherwise(F.lit(float(-pol)))


def adaboost_fit(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    rounds: int = 4,
    n_bins: int = 8,
    round_dp: int = 9,
    ranges: Optional[Sequence[tuple[float, float]]] = None,
) -> list[tuple[int, int, int, float, float]]:
    """AdaBoost.M1 over quantized decision stumps; returns the model
    as ``[(feat_idx, bin_threshold, polarity, alpha, eps), ...]``.

    The ensemble-training sibling of :func:`logreg_fit`, same
    verification bar: every round is ONE corpus aggregation pass —
    per-row weights ``w = exp(-y'·F(x))`` are an in-engine expression
    of the PRIOR stumps (discrete params + rounded alphas — no per-row
    state is ever stored or shuffled), and the pass emits weighted
    label masses per (feature, bin): a d×n_bins-sized result.  The
    best stump (threshold scan over the cumulative masses, both
    polarities) and its ``alpha = 0.5·ln((1-eps)/eps)`` are computed
    driver-side from that model-sized table, with eps and alpha
    ROUNDed to ``round_dp`` — every cross-round dependency flows
    through discrete or rounded values, so a SQL oracle replays the
    trajectory exactly.  Tie-break: (eps, feat, bin, polarity +1
    first).  ``label_col`` is 0/1; eps is clamped to
    [1e-9, 1 - 1e-9] before the log.
    """
    d = len(feature_cols)
    # materialize the NARROW (label + features) projection ONCE: every
    # boosting round re-aggregates the corpus, and the callers' feature
    # expressions are often text-derived (tokenize/ratio exprs) — without
    # this they replan and recompute against the heavy source on every
    # round, rounds+1 full passes for a relation that is d+1 numbers per
    # row. Values are unchanged (the same deterministic expressions,
    # computed once and stored); only the pass count drops.
    base = materialize(df.select(label_col, *feature_cols))
    rg = list(ranges) if ranges is not None else feature_ranges(
        base, feature_cols
    )
    bins = [
        _bin_expr(F.col(c).cast("double"), mn, mx, n_bins)
        for c, (mn, mx) in zip(feature_cols, rg)
    ]
    yp = (F.col(label_col).cast("double") * 2.0 - 1.0)  # ±1
    stumps: list[tuple[int, int, int, float, float]] = []
    for _ in range(rounds):
        fx: Column = F.lit(0.0)
        for s in stumps:
            fx = fx + F.lit(float(s[3])) * _stump_h(s, bins)
        w = F.exp(-yp * fx)
        # one pass: per-feature unpivot via a stacked struct array
        pairs = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"), bins[j].alias("bin")
                    )
                    for j in range(d)
                ]
            )
        ).alias("p")
        masses = (
            base.select(
                pairs,
                (w * F.when(yp > 0, 1.0).otherwise(0.0)).alias("wp"),
                (w * F.when(yp < 0, 1.0).otherwise(0.0)).alias("wn"),
            )
            .groupBy("p.j", "p.bin")
            .agg(F.sum("wp").alias("wp"), F.sum("wn").alias("wn"))
            .collect()
        )
        if not masses:
            raise ValueError(
                "adaboost_fit: empty training input — no rows to fit"
            )
        wp = {(r["j"], r["bin"]): r["wp"] for r in masses}
        wn = {(r["j"], r["bin"]): r["wn"] for r in masses}
        total_p = {j: 0.0 for j in range(d)}
        total_n = {j: 0.0 for j in range(d)}
        for j in range(d):
            for b in range(n_bins):  # ascending — the canonical order
                total_p[j] += wp.get((j, b), 0.0)
                total_n[j] += wn.get((j, b), 0.0)
        best = None
        for j in range(d):
            cwp = cwn = 0.0
            total = total_p[j] + total_n[j]
            for b in range(n_bins):
                cwp += wp.get((j, b), 0.0)
                cwn += wn.get((j, b), 0.0)
                # pol=+1 predicts +1 for bin<=b: misses wn below, wp
                # above; normalize by the total weight so eps ∈ [0, 1]
                ep = round_half_up(
                    (cwn + (total_p[j] - cwp)) / total, round_dp
                )
                en = round_half_up(1.0 - ep, round_dp)
                for pol, eps in ((1, ep), (-1, en)):
                    key = (eps, j, b, -pol)
                    if best is None or key < best[0]:
                        best = (key, j, b, pol, eps)
        _, j, b, pol, eps = best
        import math

        ec = min(max(eps, 1e-9), 1.0 - 1e-9)
        alpha = round_half_up(
            0.5 * math.log((1.0 - ec) / ec), round_dp
        )
        stumps.append((j, b, pol, alpha, eps))
    return stumps


def round_half_up(x: float, dp: int) -> float:
    """Python-side HALF_UP rounding matching F.round / DuckDB ROUND
    (Python's built-in round() is banker's — a tie would diverge)."""
    import decimal

    return float(
        decimal.Decimal(repr(float(x))).quantize(
            decimal.Decimal(1).scaleb(-dp),
            rounding=decimal.ROUND_HALF_UP,
        )
    )


def adaboost_predict(
    df: DataFrame,
    feature_cols: Sequence[str],
    stumps: Sequence[tuple],
    ranges: Sequence[tuple[float, float]],
    n_bins: int = 8,
    out_col: str = "score",
) -> DataFrame:
    """Score rows with a fitted ensemble: F(x) = Σ alpha·h(x) as
    ``out_col`` (sign = predicted class) — literal stump params in one
    codegen scan, the quality_classifier apply shape."""
    bins = [
        _bin_expr(F.col(c).cast("double"), mn, mx, n_bins)
        for c, (mn, mx) in zip(feature_cols, ranges)
    ]
    fx: Column = F.lit(0.0)
    for s in stumps:
        fx = fx + F.lit(float(s[3])) * _stump_h(s, bins)
    return df.withColumn(out_col, fx)


# ---------------------------------------------------------------------
# Multinomial Naive Bayes over the token stream (round 6)
# ---------------------------------------------------------------------

def nb_fit(
    docs: DataFrame,
    text_col: str = "text",
    class_col: str = "lang",
    round_dp: int = 9,
) -> tuple[DataFrame, DataFrame, int]:
    """Fit multinomial Naive Bayes with add-one smoothing over the
    lowercase ``^[a-z]+$`` token stream; returns ``(model, priors,
    vocab_size)`` where model = (class, w, lp) with lp =
    ROUND(ln((count+1)/(class_total+V)), round_dp) over the FULL
    vocab × class grid, and priors = (class, prior).

    One corpus pass builds the (class, word) counts; everything else is
    vocabulary-sized.  Log-probabilities are rounded AT SOURCE so
    downstream decimal sums are order-independent and engine-exact —
    the ``unigram_logprob`` verification trick applied to a trained
    classifier.  The token-level sibling of :func:`logreg_fit` /
    :func:`adaboost_fit`: the classic lang-id / source-id filter
    trained on the corpus itself.
    """
    words = docs.select(
        F.col(class_col).alias("cls"),
        F.explode(
            F.split(F.lower(F.col(text_col)), " ")
        ).alias("w"),
    ).filter(F.col("w").rlike("^[a-z]+$"))
    # r13 (guide §2.4/§5): the (class, word) count relation feeds an
    # eager vocab count at fit time PLUS the model join and totals in
    # every later classify/eval action — materialize the one corpus
    # explode (model-sized: ≤ |vocab|×|classes| rows) so each action
    # stops re-running it. Values are unchanged; the oracle re-verifies.
    wc = materialize(
        words.groupBy("cls", "w").agg(F.count(F.lit(1)).alias("cnt"))
    )
    vocab = wc.select("w").distinct()
    v_size = vocab.count()
    totals = wc.groupBy("cls").agg(F.sum("cnt").alias("tot"))
    # r14 (guide §1.2/§2.4): the per-class doc counts are model-sized —
    # collect them ONCE and re-enter as a LocalTableScan. The r13 shape
    # ran the docs aggregation as a plan subtree under BOTH the model
    # broadcast and the priors relation AND paid a third full corpus
    # scan for docs.count(); n_total is now the exact integer sum of
    # the collected counts (same value), and the priors' ln() stays
    # in-engine over the literal relation, so every emitted number is
    # bit-identical. Corpus passes at fit time: 3 -> 2.
    from faust_spark.operators.mat import local_rows

    cls_rows = sorted(
        (r["cls"], r["n_docs"])
        for r in docs.groupBy(F.col(class_col).alias("cls"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .collect()
    )
    cls_type = docs.schema[class_col].dataType.simpleString()
    classes = local_rows(
        docs.sparkSession, cls_rows, f"cls {cls_type}, n_docs bigint"
    )
    n_total = sum(n for _, n in cls_rows)
    model = (
        vocab.crossJoin(F.broadcast(classes.select("cls")))
        .join(wc, ["cls", "w"], "left")
        .join(F.broadcast(totals), "cls")
        .select(
            "cls",
            "w",
            F.round(
                F.log(
                    (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(1))
                    .cast("double")
                    / (F.col("tot") + F.lit(v_size)).cast("double")
                ),
                round_dp,
            ).alias("lp"),
        )
    )
    priors = classes.select(
        "cls",
        F.round(
            F.log(
                F.col("n_docs").cast("double")
                / F.lit(float(n_total))
            ),
            round_dp,
        ).alias("prior"),
    )
    return model, priors, v_size


def nb_classify(
    docs: DataFrame,
    model: DataFrame,
    priors: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_dp: int = 9,
    carry: Optional[list] = None,
) -> DataFrame:
    """Score every document against every class and pick the argmax;
    returns (id, pred, score) plus any ``carry`` columns of ``docs``
    passed through unchanged (so an evaluator can keep the truth label
    without a second corpus join).

    Per-class score = prior + Σ lp(w, class) over the doc's tokens
    (multinomial — duplicates count), summed in DECIMAL so the result
    is exact and order-independent; argmax tie-breaks on class name.
    The model joins broadcast (vocabulary-sized); tokens of unseen
    words at apply time simply don't join (documented drop). A document
    with NO in-vocab tokens (all-OOV / all-non-alpha) still gets a row:
    the likelihood term is empty, so its score is the bare prior and
    the prediction is the prior-argmax class — documents never silently
    vanish from the output (downstream routing and eval populations
    stay complete).

    ONE corpus shuffle: docs are hash-partitioned by id up front, and
    every later doc-keyed step reuses that distribution —
    HashPartitioning(id) satisfies the (id, cls) grouping's clustered
    requirement, the argmax is a partial-agg struct MIN over the same
    keys (no window sort), and the id-population left join sees two
    id-partitioned sides. The plan is explode + broadcast model join +
    two co-partitioned aggs + one co-partitioned join.

    EAGER: the prior-argmax fallback is resolved with a one-row
    collect() when this function is CALLED, so a (model-sized) Spark
    job runs at plan-construction time and the fallback class/prior
    are frozen as literals then. Raises ValueError on an empty priors
    table.
    """
    # decimal(20,9): sum -> decimal(30,9), + prior -> decimal(31,9) —
    # inside Spark's 38-digit cap, so the 9-digit SCALE IS PRESERVED.
    # decimal(28,9) would make the final addition need precision 39 and
    # Spark silently reduces scale to 8, truncating the score's last
    # digit (found by the oracle hash mismatch).
    dec = "decimal(20,9)"
    carry = list(carry or [])
    # carry columns ride through the internal lineage and the final
    # join — a name collision would either throw AMBIGUOUS_REFERENCE
    # deep in the plan or silently duplicate an output column
    reserved = {"id", "__txt", "cls", "total", "pred", "score"}
    clash = reserved.intersection(carry)
    if clash:
        raise ValueError(
            f"nb_classify: carry column(s) {sorted(clash)} collide with "
            f"internal/output names {sorted(reserved)}; alias them first"
        )
    base = docs.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("__txt"),
        *[F.col(c) for c in carry],
    ).repartition(F.col("id"))
    toks = base.select(
        "id",
        F.explode(
            F.split(F.lower(F.col("__txt")), " ")
        ).alias("w"),
    ).filter(F.col("w").rlike("^[a-z]+$"))
    scored = (
        toks.join(F.broadcast(model), "w")
        .groupBy("id", "cls")
        .agg(F.sum(F.col("lp").cast(dec)).alias("s"))
        .join(F.broadcast(priors), "cls")
        .select(
            "id",
            "cls",
            (F.col("prior").cast(dec) + F.col("s")).alias("total"),
        )
    )
    # argmax as a partial-aggregable struct MIN (desc total, asc cls ==
    # lexicographic min of (-total, cls)); decimal negation is exact,
    # so -(-total) round-trips bit-for-bit
    winner = (
        scored.groupBy("id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("total")).alias("nt"),
                    F.col("cls").alias("cls"),
                )
            ).alias("b")
        )
        .select(
            "id",
            F.col("b.cls").alias("cls"),
            (-F.col("b.nt")).alias("total"),
        )
    )
    # all-OOV fallback: empty likelihood ⇒ score = prior; prior-argmax
    # class, same tie-break. priors is class-count-sized, so the
    # argmax row is a model-sized driver value — folding it into
    # literals keeps the relational plan free of the one-row
    # nested-loop join the broadcast-crossJoin form needed.
    # NOTE: this collect() makes nb_classify EAGER at plan-build time —
    # a (one-row, model-sized) Spark job fires when the query is
    # constructed, and the fallback class/prior are frozen as literals
    # then, not at execution time. Guarded so an empty prior table is a
    # clear error instead of an IndexError.
    fb_rows = (
        priors.orderBy(F.desc("prior"), "cls")
        .limit(1)
        .select("cls", "prior")
        .collect()
    )
    if not fb_rows:
        raise ValueError(
            "nb_classify: empty priors table — the model has no classes"
        )
    fb = fb_rows[0]
    return (
        base.drop("__txt")
        .join(winner, "id", "left")
        .select(
            F.col("id"),
            F.coalesce("cls", F.lit(fb["cls"])).alias("pred"),
            F.coalesce(
                "total", F.lit(fb["prior"]).cast(dec)
            )
            .cast("double")
            .alias("score"),
            *[F.col(c) for c in carry],
        )
    )
