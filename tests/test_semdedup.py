"""SemDeDup (ops/semdedup.py): planted duplicate groups resolve to one
keeper each, the keep rule follows lowest-cosine-to-centroid, coverage
is total, and the component resolver matches the single-process
reference."""

import numpy as np
import pandas as pd
import pytest


def _rand_vecs(n: int, dim: int = 64, seed: int = 3) -> np.ndarray:
    rng = np.random.RandomState(seed)
    m = rng.randn(n, dim)
    return m / np.linalg.norm(m, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def planted_ds(ray_session):
    import ray.data

    base = _rand_vecs(200)
    rows = [{"vec_id": i, "embedding": base[i].tolist()} for i in range(200)]
    # planted exact-clone groups (same vector -> same cluster, cos = 1)
    for j in range(5):
        rows.append({"vec_id": 1000 + j, "embedding": base[0].tolist()})
    for j in range(3):
        rows.append({"vec_id": 2000 + j, "embedding": base[1].tolist()})
    return ray.data.from_pandas(pd.DataFrame(rows))


def test_semdedup_planted_groups(planted_ds):
    from fetch_engines_ray.ops.semdedup import semdedup

    out = semdedup(planted_ds, eps=0.95).to_pandas()
    assert len(out) == 208  # total coverage: one row per input vector
    g0 = out[out["vec_id"].isin([0, 1000, 1001, 1002, 1003, 1004])]
    g1 = out[out["vec_id"].isin([1, 2000, 2001, 2002])]
    # exactly one keeper per planted group; exact clones tie on cosine
    # so the lowest id wins
    assert g0["semdedup_keep"].sum() == 1 and int(g0[g0["semdedup_keep"]]["vec_id"].iloc[0]) == 0
    assert g1["semdedup_keep"].sum() == 1 and int(g1[g1["semdedup_keep"]]["vec_id"].iloc[0]) == 1
    # the random non-duplicates all survive (max off-diagonal cosine of
    # 64-dim gaussians is far below 0.95)
    rest = out[out["vec_id"].between(2, 199)]
    assert rest["semdedup_keep"].all()


def test_semdedup_keep_rule_lowest_cosine(ray_session):
    import ray.data

    from fetch_engines_ray.ops.semdedup import semdedup

    # one tight near-duplicate fan around a direction, plus distant
    # fillers so centroids exist; members differ in distance to centroid
    rng = np.random.RandomState(11)
    anchor = rng.randn(64)
    anchor /= np.linalg.norm(anchor)
    rows = []
    for j in range(6):
        v = anchor + 0.01 * j * rng.randn(64) / 8.0
        rows.append({"vec_id": 100 + j, "embedding": (v / np.linalg.norm(v)).tolist()})
    fill = _rand_vecs(60, seed=12)
    rows += [{"vec_id": i, "embedding": fill[i].tolist()} for i in range(60)]
    out = semdedup(ray.data.from_pandas(pd.DataFrame(rows)), eps=0.98, n_clusters=16).to_pandas()
    fan = out[out["vec_id"] >= 100].sort_values("vec_id")
    # the whole fan is mutually > 0.98 similar -> one keeper, and it is
    # the member with the LOWEST cosine to its centroid (ties impossible
    # here: perturbations are distinct)
    if fan["semdedup_keep"].sum() == 1:
        kept = fan[fan["semdedup_keep"]].iloc[0]
        assert kept["cos_to_centroid"] == fan["cos_to_centroid"].min()
    else:
        # fan members may straddle a cluster boundary (documented); per
        # cluster the invariant must still hold
        for _, sub in fan.groupby("cluster"):
            assert sub["semdedup_keep"].sum() == 1
            assert (
                sub[sub["semdedup_keep"]]["cos_to_centroid"].iloc[0]
                == sub["cos_to_centroid"].min()
            )


def test_resolver_matches_reference():
    from fetch_engines_ray.ops.semdedup import semdedup_reference

    ids = np.arange(10, dtype=np.int64)
    mat = _rand_vecs(10, seed=5)
    mat[7] = mat[2]  # one exact clone pair
    mat[9] = mat[2]
    keep = semdedup_reference(ids, mat, eps=0.95)
    assert keep.sum() == 8
    assert keep[2] and not keep[7] and not keep[9]


def test_transitive_chain_resolves_to_one_keeper():
    """a~b and b~c above eps but a~c below: SemDeDup components are
    transitive closures, so the chain keeps exactly one member."""
    from fetch_engines_ray.ops.semdedup import semdedup_reference

    a = np.zeros(8)
    a[0] = 1.0
    theta = np.deg2rad(10)
    b = np.zeros(8)
    b[0], b[1] = np.cos(theta), np.sin(theta)
    c = np.zeros(8)
    c[0], c[1] = np.cos(2 * theta), np.sin(2 * theta)
    mat = np.stack([a, b, c])
    # eps between cos(20deg) (the a~c pair, below) and cos(10deg) (the
    # adjacent pairs, above)
    eps = (np.cos(theta) + np.cos(2 * theta)) / 2
    keep = semdedup_reference(np.arange(3), mat, eps=eps)
    assert keep.sum() == 1
