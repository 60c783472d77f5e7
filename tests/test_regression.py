"""Distributed GD linear regression (queries/regression.py): training
actually learns (loss shrinks vs the zero model) — the oracle gate
already proves bit-exactness, this pins the semantics."""

from __future__ import annotations

from cheetah_spark.queries.regression import _GD_ITERS, _features, q_llm_quality_regression


def test_gd_regression_learns(spark, sf_dir):
    from pyspark.sql import functions as F

    import numpy as np

    row = q_llm_quality_regression(spark, sf_dir).collect()[0]
    assert row.n_iters == _GD_ITERS
    feats = _features(spark, sf_dir).collect()
    X = np.array([[1.0, r.x1, r.x2] for r in feats])
    y = np.array([r.y for r in feats])
    base = float((y**2).mean())  # loss of the zero model
    ols = float(((X @ np.linalg.pinv(X.T @ X) @ X.T @ y - y) ** 2).mean())
    # training must beat the zero model and land near the OLS floor
    # (the doc_id%100 noise term bounds what's learnable by design)
    assert row.final_mse < base
    assert row.final_mse <= ols * 1.05 + 1e-12
    # the target carries +0.8*x1: the learned x1 weight must be positive
    assert row.w1 > 0.0
