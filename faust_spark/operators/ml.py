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

__all__ = ["logreg_fit", "logreg_predict", "feature_scales"]


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
    sc = list(scales) if scales is not None else feature_scales(
        df, feature_cols
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
        row = df.agg(*aggs).first()
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
