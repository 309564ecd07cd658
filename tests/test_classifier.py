"""Distributed logistic regression: parity with the numpy reference,
separation on planted quality labels, and scoring semantics."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from fetch_engines_ray.ops.classifier import (
    logreg_fit,
    logreg_fit_reference,
    logreg_score,
)

FEATURES = ["stopword_ratio", "mean_word_len"]


def _planted(seed=11, n=400):
    """Two separable 'quality' populations in a 2-feature space."""
    rng = np.random.RandomState(seed)
    good = np.column_stack([rng.normal(0.45, 0.05, n), rng.normal(4.8, 0.4, n)])
    bad = np.column_stack([rng.normal(0.10, 0.05, n), rng.normal(7.5, 0.8, n)])
    x = np.vstack([good, bad])
    y = np.r_[np.ones(n), np.zeros(n)]
    return x, y


@pytest.fixture(scope="module")
def planted_ds(ray_session):
    x, y = _planted()
    tbl = pa.table(
        {
            "doc_id": [f"d{i}" for i in range(len(y))],
            FEATURES[0]: x[:, 0],
            FEATURES[1]: x[:, 1],
            "label": y.astype(np.int64),
        }
    )
    return ray.data.from_arrow(tbl).repartition(5), x, y


def test_fit_matches_numpy_reference(planted_ds):
    ds, x, y = planted_ds
    got = logreg_fit(ds, FEATURES, n_iters=25, lr=0.5, l2=0.01)
    want = logreg_fit_reference(x, y, n_iters=25, lr=0.5, l2=0.01)
    np.testing.assert_allclose(got, want, atol=1e-8)
    # partitioning only perturbs float-sum order, not the result
    got2 = logreg_fit(ds.repartition(9), FEATURES, n_iters=25, lr=0.5, l2=0.01)
    np.testing.assert_allclose(got2, want, atol=1e-8)


def test_scores_separate_planted_populations(planted_ds):
    ds, x, y = planted_ds
    w = logreg_fit(ds, FEATURES, n_iters=60, lr=2.0)
    out = logreg_score(ds, w, FEATURES).to_pandas()
    acc = ((out["quality_score"] > 0.5).astype(float) == out["label"]).mean()
    assert acc > 0.98
    assert out["quality_score_x1m"].dtype == np.int64
    np.testing.assert_array_equal(
        out["quality_score_x1m"].to_numpy(),
        np.floor(out["quality_score"].to_numpy() * 1_000_000 + 0.5).astype(np.int64),
    )
    # score pass is append-only: input columns survive
    assert {"doc_id", "label", *FEATURES} <= set(out.columns)
