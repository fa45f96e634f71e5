"""Distributed logistic-regression fit (operators/ml.py): GD math vs a
numpy reference, separation on separable data, scale fallbacks, and
predict round-trip."""

import numpy as np
from pyspark.sql import functions as F

from faust_spark.operators.ml import (
    feature_scales,
    logreg_fit,
    logreg_predict,
)


def _numpy_traj(X, y, steps, lr, round_dp):
    """Pure-numpy replica of the operator's exact recipe: max-|x|
    normalization, full-batch GD, per-step weight rounding."""
    sc = np.abs(X).max(axis=0)
    sc[sc == 0] = 1.0
    Xn = np.hstack([np.ones((len(X), 1)), X / sc])
    w = np.zeros(Xn.shape[1])
    traj = [w.copy()]
    for _ in range(steps):
        p = 1.0 / (1.0 + np.exp(-(Xn @ w)))
        g = (p - y) @ Xn / len(X)
        w = np.round(w - lr * g, round_dp)
        traj.append(w.copy())
    return traj


def test_logreg_fit_matches_numpy_reference(spark):
    rng = np.random.RandomState(11)
    X = rng.randn(200, 3) * np.array([5.0, 1.0, 0.2])
    y = (X @ np.array([1.0, -2.0, 3.0]) > 0).astype(float)
    df = spark.createDataFrame(
        [
            (float(yy), float(a), float(b), float(c))
            for yy, (a, b, c) in zip(y, X)
        ],
        "y double, f1 double, f2 double, f3 double",
    )
    got = logreg_fit(df, ["f1", "f2", "f3"], "y", steps=3, lr=1.0)
    want = _numpy_traj(X, y, steps=3, lr=1.0, round_dp=7)
    assert len(got) == 4
    for g, w in zip(got, want):
        assert np.allclose(g, w, atol=1e-7), (g, w)


def test_logreg_separates_and_loss_decreases(spark):
    """On linearly separable data the fitted model must classify the
    training set well and log-loss must fall monotonically over the
    trajectory (full-batch GD with a sane lr)."""
    rng = np.random.RandomState(5)
    X = np.vstack([rng.randn(150, 2) + 2.5, rng.randn(150, 2) - 2.5])
    y = np.array([1.0] * 150 + [0.0] * 150)
    df = spark.createDataFrame(
        [(float(yy), float(a), float(b)) for yy, (a, b) in zip(y, X)],
        "y double, f1 double, f2 double",
    )
    traj = logreg_fit(df, ["f1", "f2"], "y", steps=6, lr=4.0)
    sc = feature_scales(df, ["f1", "f2"])
    Xn = np.hstack([np.ones((len(X), 1)), X / np.array(sc)])

    def loss(w):
        p = 1.0 / (1.0 + np.exp(-(Xn @ np.array(w))))
        p = np.clip(p, 1e-12, 1 - 1e-12)
        return float(-(y * np.log(p) + (1 - y) * np.log(1 - p)).mean())

    losses = [loss(w) for w in traj]
    assert all(b < a for a, b in zip(losses, losses[1:])), losses
    scored = logreg_predict(df, ["f1", "f2"], traj[-1], sc)
    acc = scored.filter(
        ((F.col("p") > 0.5) & (F.col("y") == 1.0))
        | ((F.col("p") <= 0.5) & (F.col("y") == 0.0))
    ).count() / 300.0
    assert acc > 0.95, acc


def test_feature_scales_zero_column_fallback(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0, -8.0), (1.0, 0.0, 4.0)], "y double, z double, f double"
    )
    assert feature_scales(df, ["z", "f"]) == [1.0, 8.0]
    # fitting with an all-zero feature must not NaN out
    traj = logreg_fit(df, ["z", "f"], "y", steps=2, lr=1.0)
    assert all(np.isfinite(w).all() for w in map(np.array, traj))


def test_gd_step_plan_shape(spark):
    """Each GD step must plan as ONE scan: partial ungrouped aggregate
    -> single-row exchange -> final aggregate, all codegen, zero Python
    evals (the shape plancheck can't see because steps run eagerly
    inside logreg_fit)."""
    df = spark.createDataFrame(
        [(float(i % 2), float(i)) for i in range(100)], "y double, f double"
    )
    x = F.col("f").cast("double") / F.lit(99.0)
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.lit(0.0) + F.lit(0.0) * x)))
    step = df.agg(
        F.round(F.lit(0.0) - F.sum((p - F.col("y")) * x)
                / F.count(F.lit(1)).cast("double"), 7).alias("w1")
    )
    plan = step._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert plan.count("Exchange SinglePartition") == 1
    assert "HashAggregate" in plan


# ---- AdaBoost stumps (round 6)


def _py_adaboost(X, y, rounds=4, n_bins=8, dp=9):
    """Pure-python replica of adaboost_fit's recipe: quantized bins,
    weights from prior rounded alphas, normalized rounded errors,
    (eps, feat, bin, pol +1 first) tie-break."""
    import math

    from faust_spark.operators.ml import round_half_up

    d = X.shape[1]
    rg = [(float(X[:, j].min()), float(X[:, j].max())) for j in range(d)]

    def bins(j, v):
        mn, mx = rg[j]
        if mx == mn:
            return 0
        u = round_half_up((v - mn) / (mx - mn) * n_bins, 9)
        return min(n_bins - 1, max(0, math.floor(u)))

    B = [[bins(j, float(X[i, j])) for j in range(d)] for i in range(len(X))]
    yp = [1.0 if t > 0 else -1.0 for t in (y * 2 - 1)]
    stumps = []
    for _ in range(rounds):
        w = []
        for i in range(len(X)):
            fx = 0.0
            for (j, b, pol, alpha, _e) in stumps:
                h = pol if B[i][j] <= b else -pol
                fx += alpha * h
            w.append(math.exp(-yp[i] * fx))
        best = None
        for j in range(d):
            total = sum(w)
            for b in range(n_bins):
                miss_p = sum(
                    w[i]
                    for i in range(len(X))
                    if (B[i][j] <= b and yp[i] < 0)
                    or (B[i][j] > b and yp[i] > 0)
                )
                ep = round_half_up(miss_p / total, dp)
                en = round_half_up(1.0 - ep, dp)
                for pol, eps in ((1, ep), (-1, en)):
                    key = (eps, j, b, -pol)
                    if best is None or key < best[0]:
                        best = (key, j, b, pol, eps)
        _, j, b, pol, eps = best
        ec = min(max(eps, 1e-9), 1.0 - 1e-9)
        alpha = round_half_up(0.5 * math.log((1.0 - ec) / ec), dp)
        stumps.append((j, b, pol, alpha, eps))
    return stumps


def test_adaboost_matches_python_reference(spark):
    from faust_spark.operators.ml import adaboost_fit

    rng = np.random.RandomState(23)
    X = rng.randn(150, 3) * np.array([4.0, 1.0, 0.5])
    y = ((X[:, 0] - X[:, 2] * 3.0) > 0).astype(float)
    df = spark.createDataFrame(
        [
            (float(yy), float(a), float(b), float(c))
            for yy, (a, b, c) in zip(y, X)
        ],
        "y double, f1 double, f2 double, f3 double",
    )
    got = adaboost_fit(df, ["f1", "f2", "f3"], "y", rounds=4)
    want = _py_adaboost(X, y, rounds=4)
    assert got == want, (got, want)


def test_adaboost_separates_and_error_decreases(spark):
    from faust_spark.operators.ml import (
        adaboost_fit,
        adaboost_predict,
        feature_ranges,
    )

    rng = np.random.RandomState(5)
    X = np.vstack([rng.randn(150, 2) + 2.0, rng.randn(150, 2) - 2.0])
    y = np.array([1.0] * 150 + [0.0] * 150)
    df = spark.createDataFrame(
        [(float(yy), float(a), float(b)) for yy, (a, b) in zip(y, X)],
        "y double, f1 double, f2 double",
    )
    st = adaboost_fit(df, ["f1", "f2"], "y", rounds=4)
    # round-1 stump must be a better-than-chance learner, and every
    # round's eps stays below 0.5 (the boostability condition)
    assert all(s[4] < 0.5 for s in st), st
    rg = feature_ranges(df, ["f1", "f2"])
    sc = adaboost_predict(df, ["f1", "f2"], st, rg)
    acc = sc.filter(
        ((F.col("score") > 0) & (F.col("y") == 1.0))
        | ((F.col("score") <= 0) & (F.col("y") == 0.0))
    ).count() / 300.0
    assert acc > 0.9, acc


def test_adaboost_constant_feature_safe(spark):
    from faust_spark.operators.ml import adaboost_fit

    df = spark.createDataFrame(
        [(float(i % 2), 5.0, float(i)) for i in range(40)],
        "y double, z double, f double",
    )
    st = adaboost_fit(df, ["z", "f"], "y", rounds=2)
    assert len(st) == 2
    assert all(np.isfinite(s[3]) for s in st)


# ---- Naive Bayes (round 6)


def test_nb_classifies_separable_vocab(spark):
    """Two classes with disjoint dominant vocabularies: every doc
    classified correctly; scores are exact decimals (trailing
    1e-9-grid values)."""
    from faust_spark.operators.ml import nb_classify, nb_fit

    rows = []
    for i in range(30):
        rows.append((i, "aa", "alpha beta beta gamma"))
    for i in range(30, 60):
        rows.append((i, "bb", "delta delta epsilon zeta"))
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    )
    model, priors, v = nb_fit(docs)
    assert v == 6
    out = {
        r["id"]: r["pred"]
        for r in nb_classify(docs, model, priors).collect()
    }
    assert all(out[i] == "aa" for i in range(30))
    assert all(out[i] == "bb" for i in range(30, 60))


def test_nb_classify_carry_collision_raises(spark):
    """carry= columns that collide with the classifier's internal or
    output names must fail loudly at call time, not as an ambiguous-
    reference error deep in the plan (r11 review finding)."""
    import pytest

    from faust_spark.operators.ml import nb_classify, nb_fit

    docs = spark.createDataFrame(
        [(1, "aa", "alpha beta"), (2, "bb", "delta zeta")],
        "doc_id long, lang string, text string",
    )
    model, priors, _ = nb_fit(docs)
    with pytest.raises(ValueError, match="carry column"):
        nb_classify(docs, model, priors, carry=["pred"])
    # a non-colliding carry still rides through
    out = nb_classify(docs, model, priors, carry=["lang"]).columns
    assert "lang" in out and "pred" in out


def test_nb_matches_python_reference(spark):
    """Exact score parity with a pure-python replica (add-one
    smoothing, rounded-at-source logprobs, decimal sums)."""
    import decimal
    import math
    import random

    from faust_spark.operators.ml import nb_classify, nb_fit, round_half_up

    rng = random.Random(9)
    vocab_a = ["cat", "dog", "fish"]
    vocab_b = ["car", "bus", "dog"]
    rows = []
    for i in range(40):
        cls = "a" if i % 2 == 0 else "b"
        vs = vocab_a if cls == "a" else vocab_b
        text = " ".join(rng.choice(vs) for _ in range(rng.randint(2, 8)))
        rows.append((i, cls, text))
    docs = spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    )
    model, priors, V = nb_fit(docs)
    got = {
        r["id"]: (r["pred"], r["score"])
        for r in nb_classify(docs, model, priors).collect()
    }

    # python replica
    cnt: dict = {}
    totc: dict = {}
    ndoc: dict = {}
    for _i, cls, text in rows:
        ndoc[cls] = ndoc.get(cls, 0) + 1
        for w in text.split(" "):
            cnt[(cls, w)] = cnt.get((cls, w), 0) + 1
            totc[cls] = totc.get(cls, 0) + 1
    vocab = sorted({w for _, w in cnt})
    lp = {
        (c, w): round_half_up(
            math.log((cnt.get((c, w), 0) + 1) / (totc[c] + len(vocab))), 9
        )
        for c in ndoc
        for w in vocab
    }
    pri = {
        c: round_half_up(math.log(ndoc[c] / len(rows)), 9) for c in ndoc
    }
    D = decimal.Decimal
    for i, _cls, text in rows:
        scores = {}
        for c in ndoc:
            s = D(repr(pri[c])).quantize(D("1e-9"))
            for w in text.split(" "):
                s += D(repr(lp[(c, w)])).quantize(D("1e-9"))
            scores[c] = s
        best = min(scores, key=lambda c: (-scores[c], c))
        assert got[i][0] == best, (i, got[i], scores)
        assert abs(got[i][1] - float(scores[best])) < 1e-12


def test_nb_classify_all_oov_doc_gets_prior_argmax(spark):
    """A doc with zero in-vocab tokens must still get a row: pred =
    prior-argmax class, score = bare prior — not silently vanish."""
    from faust_spark.operators.ml import nb_classify, nb_fit

    train = spark.createDataFrame(
        [
            (1, "aa bb aa", "en"),
            (2, "aa bb cc", "en"),
            (3, "xx yy", "fr"),
        ],
        "doc_id long, text string, lang string",
    )
    model, priors, _ = nb_fit(train, text_col="text", class_col="lang")
    apply_df = spark.createDataFrame(
        [(10, "aa bb"), (11, "123 456"), (12, "zz qq")],
        "doc_id long, text string",
    )
    out = {r.id: r for r in nb_classify(apply_df, model, priors).collect()}
    assert set(out) == {10, 11, 12}  # nothing dropped
    assert out[10].pred == "en"
    # en has 2/3 of training docs -> the prior-argmax fallback
    pri = {r.cls: r.prior for r in priors.collect()}
    assert out[11].pred == "en" and abs(out[11].score - pri["en"]) < 1e-9
    assert out[12].pred == "en"


def test_adaboost_fit_empty_input_raises(spark):
    """Empty training input is a clear ValueError, not a tuple-unpack
    TypeError / ZeroDivisionError (VERDICT r7 item 5)."""
    import pytest

    from faust_spark.operators.ml import adaboost_fit

    df = spark.createDataFrame(
        [], "f0 double, f1 double, label int"
    )
    with pytest.raises(ValueError, match="empty training input"):
        adaboost_fit(df, ["f0", "f1"], "label", ranges=[(0, 1), (0, 1)])


def test_nb_classify_empty_priors_raises(spark):
    """Empty priors table is a clear ValueError, not an IndexError from
    the fallback-argmax collect (ADVICE r7)."""
    import pytest

    from faust_spark.operators.ml import nb_classify

    docs = spark.createDataFrame([(1, "aa bb")], "doc_id long, text string")
    model = spark.createDataFrame([], "w string, cls string, lp double")
    priors = spark.createDataFrame([], "cls string, prior double")
    with pytest.raises(ValueError, match="empty priors"):
        nb_classify(docs, model, priors)


def test_fit_inputs_materialized_once_and_values_unchanged(spark, monkeypatch):
    """r13: adaboost_fit/logreg_fit materialize the narrow
    (label + features) projection ONCE before the iteration loop, so the
    callers' (often text-derived) feature expressions are not replanned
    and recomputed against the heavy source on every round. The
    materialization must not change a single value of either trajectory."""
    import faust_spark.operators.ml as ml

    rng = np.random.RandomState(3)
    X = rng.randn(120, 3)
    y = (X @ np.array([2.0, -1.0, 0.5]) > 0).astype(float)
    df = spark.createDataFrame(
        [
            (float(yy), float(a), float(b), float(c))
            for yy, (a, b, c) in zip(y, X)
        ],
        "y double, f1 double, f2 double, f3 double",
    )

    calls = []
    real = ml.materialize

    def counting(frame, **kw):
        calls.append(1)
        return real(frame, **kw)

    monkeypatch.setattr(ml, "materialize", counting)
    st_mat = ml.adaboost_fit(df, ["f1", "f2", "f3"], "y", rounds=3)
    assert len(calls) == 1, "one materialization per fit, not per round"
    calls.clear()
    lr_mat = ml.logreg_fit(df, ["f1", "f2", "f3"], "y", steps=3)
    assert len(calls) == 1

    # identity pass-through (no materialization) must give the same model
    monkeypatch.setattr(ml, "materialize", lambda frame, **kw: frame)
    assert ml.adaboost_fit(df, ["f1", "f2", "f3"], "y", rounds=3) == st_mat
    assert ml.logreg_fit(df, ["f1", "f2", "f3"], "y", steps=3) == lr_mat
