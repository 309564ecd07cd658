"""Weighted sampling without replacement (ops/sampling.py)."""
import numpy as np
import pandas as pd
import pytest

from fetch_engines_ray.ops.sampling import _keys, weighted_sample


def _df(n, seed=0):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype="int64"),
            "w": rng.uniform(0.1, 5.0, n),
        }
    )


def _brute(df, k, seed):
    keys = _keys(df["doc_id"].tolist(), df["w"].to_numpy(), seed)
    d = df.assign(_key=keys).sort_values(["_key", "doc_id"], ascending=[False, True])
    return set(d.head(k)["doc_id"].tolist())


def test_weighted_sample_matches_brute_force(ray_session):
    import ray.data

    df = _df(500, seed=1)
    ds = ray.data.from_pandas(df).repartition(7)
    for k, seed in ((1, 0), (25, 0), (25, 99), (499, 3)):
        got = set(weighted_sample(ds, k, "w", seed=seed).to_pandas()["doc_id"])
        assert got == _brute(df, k, seed), (k, seed)


def test_weighted_sample_deterministic_across_partitionings(ray_session):
    import ray.data

    df = _df(300, seed=2)
    a = set(
        weighted_sample(ray.data.from_pandas(df).repartition(2), 40, "w", seed=7)
        .to_pandas()["doc_id"]
    )
    b = set(
        weighted_sample(ray.data.from_pandas(df).repartition(11), 40, "w", seed=7)
        .to_pandas()["doc_id"]
    )
    assert a == b


def test_weighted_sample_inclusion_tracks_weight(ray_session):
    import ray.data

    # one heavy item among light ones: across seeds it must appear far
    # more often than any individual light item
    df = pd.DataFrame(
        {"doc_id": np.arange(50, dtype="int64"), "w": [10.0] + [0.5] * 49}
    )
    ds = ray.data.from_pandas(df).repartition(4)
    heavy = sum(
        0 in set(weighted_sample(ds, 5, "w", seed=s).to_pandas()["doc_id"])
        for s in range(30)
    )
    assert heavy >= 25  # P(include) ~ 1 for w=10 vs 0.5 at k=5/50


def test_weighted_sample_edge_cases(ray_session):
    import ray.data

    df = pd.DataFrame(
        {"doc_id": np.arange(6, dtype="int64"), "w": [1.0, 0.0, -2.0, 1.0, 1.0, 1.0]}
    )
    ds = ray.data.from_pandas(df).repartition(2)
    # non-positive weights never sampled, even when k > n_positive
    got = weighted_sample(ds, 10, "w", seed=1).to_pandas()
    assert set(got["doc_id"]) == {0, 3, 4, 5}
    assert weighted_sample(ds, 0, "w").count() == 0
    with pytest.raises(ValueError):
        weighted_sample(ds, -1, "w")
