"""Corpus drift detection (ops/drift.py): identical snapshots read ~0,
planted shifts trip the PSI thresholds, histograms match numpy/pandas
exactly, and unseen categories land in the OTHER bucket."""

import numpy as np
import pandas as pd
import pytest


def _snapshot(seed: int, mean: float = 0.0, langs=("en", "de", "fr")):
    rng = np.random.RandomState(seed)
    n = 4000
    return pd.DataFrame(
        {
            "length": (rng.randn(n) * 10 + 50 + mean).astype(np.float64),
            "lang": rng.choice(langs, size=n, p=_p(len(langs))),
        }
    )


def _p(k):
    base = np.ones(k)
    base[0] = 3.0
    return base / base.sum()


def _ds(df):
    import ray.data

    return ray.data.from_pandas(df).repartition(4)


def test_identical_snapshots_are_stable(ray_session):
    from fetch_engines_ray.ops.drift import drift_report

    a = _snapshot(1)
    out = drift_report(_ds(a), _ds(a), numeric_cols=["length"], categorical_cols=["lang"])
    assert (out["status"] == "ok").all()
    assert (out["psi"] < 0.01).all()


def test_planted_numeric_shift_alerts(ray_session):
    from fetch_engines_ray.ops.drift import drift_report

    ref = _snapshot(1)
    cur = _snapshot(2, mean=15.0)  # 1.5 sigma mean shift
    out = drift_report(_ds(ref), _ds(cur), numeric_cols=["length"])
    assert out.iloc[0]["status"] == "alert"
    assert out.iloc[0]["psi"] > 0.25


def test_planted_categorical_shift_and_other_bucket(ray_session):
    from fetch_engines_ray.ops.drift import drift_report

    ref = _snapshot(1)
    cur = _snapshot(2, langs=("en", "zh", "ru"))  # two unseen languages
    out = drift_report(_ds(ref), _ds(cur), categorical_cols=["lang"])
    assert out.iloc[0]["status"] == "alert"


def test_numeric_histogram_matches_numpy(ray_session):
    from fetch_engines_ray.ops.drift import numeric_edges, numeric_histogram

    df = _snapshot(3)
    edges = numeric_edges(_ds(df), "length", n_buckets=10)
    got = numeric_histogram(_ds(df), "length", edges)
    want = np.bincount(
        np.searchsorted(edges, df["length"].to_numpy(), side="right"), minlength=10
    )
    assert got.tolist() == want.tolist()
    assert got.sum() == len(df)
    # quantile edges give near-equal buckets
    assert got.min() >= len(df) // 10 - len(df) // 50


def test_psi_properties():
    from fetch_engines_ray.ops.drift import kl_divergence, psi

    a = np.array([100, 100, 100, 100])
    assert psi(a, a) == 0.0
    assert kl_divergence(a, a) == 0.0
    b = np.array([400, 0, 0, 0])
    assert psi(a, b) > 0.25
    # symmetry of PSI, asymmetry of KL
    assert abs(psi(a, b) - psi(b, a)) < 1e-9
