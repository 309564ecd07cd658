"""Grouping-sets rollup (one-shuffle multi-level aggregation) and
distributed PCA (streaming moments, driver d x d eigh)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- rollup


def test_rollup_and_cube_lattices():
    from fetch_engines_ray.ops.rollup import cube_sets, rollup_sets

    assert rollup_sets(["a", "b"]) == [("a", "b"), ("a",), ()]
    cs = cube_sets(["a", "b"])
    assert set(cs) == {("a", "b"), ("a",), ("b",), ()}
    assert len(cube_sets(["a", "b", "c"])) == 8


def test_grouping_sets_aggregate_duckdb_parity(ray_session):
    import duckdb

    import ray.data
    from fetch_engines_ray.ops.rollup import cube_sets, grouping_sets_aggregate

    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame(
        {
            "a": rng.choice(["x", "y", "z"], n),
            "b": rng.choice(["p", "q"], n),
            "v": rng.integers(0, 1000, n).astype("int64"),
        }
    )
    ds = ray.data.from_pandas(df).repartition(7)
    got = grouping_sets_aggregate(ds, keys=["a", "b"], sum_cols=["v"], count_alias="n")

    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        "SELECT a, b, CAST(GROUPING(a, b) AS BIGINT) AS grouping_id,"
        " count(*) AS n, sum(v) AS v FROM t GROUP BY ROLLUP(a, b)"
        " ORDER BY grouping_id, a, b"
    ).df()
    # normalize: DuckDB NULL -> None/NaN; ours uses real None
    for fr in (got, want):
        fr["a"] = fr["a"].where(fr["a"].notna(), "<null>")
        fr["b"] = fr["b"].where(fr["b"].notna(), "<null>")
        fr["n"] = fr["n"].astype("int64")
        fr["v"] = fr["v"].astype("int64")
    pd.testing.assert_frame_equal(
        got.sort_values(["grouping_id", "a", "b"]).reset_index(drop=True),
        want.sort_values(["grouping_id", "a", "b"]).reset_index(drop=True),
        check_like=True,
    )

    # CUBE: the (b)-only level too, same one-shuffle operator
    got_cube = grouping_sets_aggregate(
        ds, keys=["a", "b"], sum_cols=["v"], sets=cube_sets(["a", "b"]), count_alias="n"
    )
    want_cube = con.execute(
        "SELECT a, b, CAST(GROUPING(a, b) AS BIGINT) AS grouping_id,"
        " count(*) AS n, sum(v) AS v FROM t GROUP BY CUBE(a, b)"
        " ORDER BY grouping_id, a, b"
    ).df()
    assert len(got_cube) == len(want_cube)
    b_only = got_cube[got_cube["grouping_id"] == 2]
    assert set(b_only["b"]) == {"p", "q"}
    assert b_only["n"].sum() == n


def test_lineitem_pricing_rollup_oracle_parity(ray_session):
    import duckdb

    from fetch_engines_ray.ops.rollup import (
        lineitem_pricing_rollup,
        lineitem_pricing_rollup_sql,
    )

    got = lineitem_pricing_rollup(SF)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
    )
    want = con.execute(lineitem_pricing_rollup_sql()).df()
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-9)
    # grand-total row consistency: n_items at gid=3 equals the sum of
    # the leaf level, and every level sums to the same revenue
    leaf = got[got["grouping_id"] == 0]
    total = got[got["grouping_id"] == 3]
    assert int(total["n_items"].iloc[0]) == int(leaf["n_items"].sum())
    assert abs(float(total["revenue"].iloc[0]) - float(leaf["revenue"].sum())) < 0.02


def test_grouping_sets_rejects_bad_sets(ray_session):
    import ray.data
    from fetch_engines_ray.ops.rollup import grouping_sets_aggregate

    ds = ray.data.from_pandas(pd.DataFrame({"a": ["x"], "v": [1]}))
    with pytest.raises(ValueError, match="non-keys"):
        grouping_sets_aggregate(ds, keys=["a"], sum_cols=["v"], sets=[("zz",)])
    with pytest.raises(ValueError, match="duplicate"):
        grouping_sets_aggregate(ds, keys=["a"], sum_cols=["v"], sets=[("a",), ("a",)])


# ------------------------------------------------------------------- PCA


def _numpy_pca(x: np.ndarray, k: int):
    mean = x.mean(axis=0)
    cov = np.cov(x, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    idx = np.argmax(np.abs(comps), axis=1)
    signs = np.sign(comps[np.arange(len(idx)), idx])
    signs[signs == 0] = 1.0
    return mean, comps * signs[:, None], evals[order]


def test_fit_pca_matches_exact_numpy(ray_session):
    import ray.data
    from fetch_engines_ray.ops.pca import fit_pca

    rng = np.random.default_rng(11)
    # anisotropic cloud: variance concentrated along known axes
    base = rng.normal(size=(2000, 6)) * np.array([5.0, 3.0, 1.0, 0.5, 0.1, 0.05])
    rot, _ = np.linalg.qr(rng.normal(size=(6, 6)))
    x = (base @ rot + rng.normal(size=6)).astype(np.float32)

    df = pd.DataFrame({"vec_id": np.arange(len(x)), "embedding": list(x)})
    ds = ray.data.from_pandas(df).repartition(9)
    model = fit_pca(ds, n_components=4, vec_col="embedding")

    mean, comps, evals = _numpy_pca(x.astype(np.float64), 4)
    np.testing.assert_allclose(model.mean, mean, atol=1e-6)
    np.testing.assert_allclose(model.explained_variance, evals, rtol=1e-6)
    np.testing.assert_allclose(model.components, comps, atol=1e-6)
    assert model.n_rows == len(x)
    # eigenvalues descending; ratio sums below 1
    assert np.all(np.diff(model.explained_variance) <= 1e-12)
    assert 0.9 < model.explained_variance_ratio.sum() <= 1.0 + 1e-9


def test_fit_pca_block_order_invariant(ray_session):
    import ray.data
    from fetch_engines_ray.ops.pca import fit_pca

    rng = np.random.default_rng(3)
    x = rng.normal(size=(500, 4)).astype(np.float32)
    df = pd.DataFrame({"embedding": list(x)})
    m1 = fit_pca(ray.data.from_pandas(df), n_components=3)
    m2 = fit_pca(ray.data.from_pandas(df.iloc[::-1]).repartition(11), n_components=3)
    np.testing.assert_allclose(m1.components, m2.components, atol=1e-8)
    np.testing.assert_allclose(m1.explained_variance, m2.explained_variance, rtol=1e-9)


def test_pca_project_shapes_and_values(ray_session):
    import ray.data
    from fetch_engines_ray.ops.pca import fit_pca, pca_project

    rng = np.random.default_rng(5)
    x = rng.normal(size=(300, 8)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(300), "embedding": list(x)})
    ds = ray.data.from_pandas(df).repartition(5)
    model = fit_pca(ds, n_components=2)
    out = pca_project(ds, model, out_col="pca").to_pandas()
    assert set(out.columns) == {"vec_id", "pca"}
    assert len(out) == 300
    out = out.sort_values("vec_id").reset_index(drop=True)
    proj = np.stack(out["pca"].to_numpy())
    want = (x.astype(np.float64) - model.mean) @ model.components.T
    np.testing.assert_allclose(proj, want, atol=1e-4)
    # projections are centered and decorrelated (covariance ~ diagonal)
    cov = np.cov(proj, rowvar=False)
    assert abs(cov[0, 1]) < 1e-3 * max(cov[0, 0], cov[1, 1])


def test_pca_on_real_embeddings_table(ray_session):
    from fetch_engines_ray.arrowclean import read_parquet_clean
    from fetch_engines_ray.ops.pca import fit_pca, pca_project

    ds = read_parquet_clean(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    model = fit_pca(ds, n_components=4)
    assert model.explained_variance.shape == (4,)
    projected = pca_project(ds, model, keep_input=False)
    row = projected.take(1)[0]
    assert len(row["pca"]) == 4


def test_grouping_sets_property_random(ray_session):
    """Property: for randomized frames and random grouping sets, the
    one-shuffle operator equals a per-set pandas reference."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    import ray.data
    from fetch_engines_ray.ops.rollup import _grouping_id, grouping_sets_aggregate

    @settings(max_examples=10, deadline=None)
    @given(
        seed=st.integers(0, 10_000),
        n=st.integers(1, 400),
        sets_mask=st.integers(1, 15),
    )
    def check(seed, n, sets_mask):
        rng = np.random.default_rng(seed)
        df = pd.DataFrame(
            {
                "a": rng.choice(["x", "y", "z", "w"], n),
                "b": rng.choice(["p", "q", "r"], n),
                "v": rng.integers(-50, 50, n).astype("int64"),
            }
        )
        all_sets = [("a", "b"), ("a",), ("b",), ()]
        sets = [s for i, s in enumerate(all_sets) if (sets_mask >> i) & 1]
        got = grouping_sets_aggregate(
            ray.data.from_pandas(df).repartition(3),
            keys=["a", "b"],
            sum_cols=["v"],
            sets=sets,
            count_alias="n",
        )
        frames = []
        for s in sets:
            if s:
                ref = df.groupby(list(s), as_index=False).agg(
                    n=("v", "size"), v=("v", "sum")
                )
            else:
                ref = pd.DataFrame({"n": [len(df)], "v": [df["v"].sum()]})
            for k in ("a", "b"):
                if k not in s:
                    ref[k] = None
            ref["grouping_id"] = _grouping_id(["a", "b"], s)
            frames.append(ref[["a", "b", "grouping_id", "n", "v"]])
        want = pd.concat(frames, ignore_index=True)
        for fr in (got, want):
            fr["a"] = fr["a"].where(fr["a"].notna(), "<null>")
            fr["b"] = fr["b"].where(fr["b"].notna(), "<null>")
            fr.sort_values(["grouping_id", "a", "b"], inplace=True)
            fr.reset_index(drop=True, inplace=True)
        assert got["n"].astype("int64").tolist() == want["n"].astype("int64").tolist()
        assert got["v"].astype("int64").tolist() == want["v"].astype("int64").tolist()
        assert got["a"].tolist() == want["a"].tolist()
        assert got["b"].tolist() == want["b"].tolist()

    check()


def test_pca_projection_preserves_knn_neighbors(ray_session):
    """Composition with the similarity stack: brute-force kNN in the
    4-dim PCA space of a 32-dim clustered cloud recovers the raw-space
    neighbors (high recall) — the dimensionality-reduction-before-ANN
    recipe."""
    import ray.data

    from fetch_engines_ray.ops.pca import fit_pca, pca_project

    rng = np.random.default_rng(21)
    centers = rng.normal(size=(5, 32)) * 4.0
    x = np.vstack(
        [c + rng.normal(size=(60, 32)) * 0.4 for c in centers]
    ).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(len(x)), "embedding": list(x)})
    ds = ray.data.from_pandas(df).repartition(6)
    model = fit_pca(ds, n_components=4)
    proj = (
        pca_project(ds, model)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    p = np.stack(proj["pca"].to_numpy())

    def topk(mat, k=10):
        d = ((mat[:, None, :] - mat[None, :, :]) ** 2).sum(-1)
        np.fill_diagonal(d, np.inf)
        return np.argsort(d, axis=1)[:, :k]

    # what dimensionality reduction must preserve for the ANN/SemDeDup
    # recipe is the CLUSTER structure, not the noise-dominated
    # within-cluster ordering (the discarded 28 dims are isotropic
    # noise by construction): every PCA-space neighbor must come from
    # the same cluster as its query
    labels = np.repeat(np.arange(5), 60)
    pca_nn = topk(p)
    same_cluster = np.mean(labels[pca_nn] == labels[:, None])
    assert same_cluster > 0.99, same_cluster
    # and the variance story holds: 4 components of a 5-cluster cloud
    # capture most of the energy
    assert model.explained_variance_ratio.sum() > 0.7


def test_pca_whitening_unit_variance(ray_session):
    import ray.data

    from fetch_engines_ray.ops.pca import fit_pca, pca_project

    rng = np.random.default_rng(8)
    x = (rng.normal(size=(1500, 6)) * np.array([9.0, 4.0, 2.0, 1.0, 0.5, 0.2])).astype(
        np.float32
    )
    df = pd.DataFrame({"embedding": list(x)})
    ds = ray.data.from_pandas(df).repartition(7)
    model = fit_pca(ds, n_components=3)
    w = np.stack(pca_project(ds, model, whiten=True).to_pandas()["pca"].to_numpy())
    var = w.var(axis=0, ddof=1)
    np.testing.assert_allclose(var, np.ones(3), rtol=0.05)


def test_fit_pca_empty_and_filtered_inputs_raise_cleanly(ray_session):
    """An empty (or fully-filtered) dataset must reach the intended
    'PCA needs >= 2 rows' ValueError, not die on the column-less
    moments frame (KeyError 'n' — the recurring empty-partition
    hazard, review finding)."""
    import ray.data

    from fetch_engines_ray.ops.pca import fit_pca

    rows = [{"embedding": [float(i), float(-i)]} for i in range(6)]
    ds = ray.data.from_items(rows).filter(lambda r: False)
    with pytest.raises(ValueError, match="PCA needs >= 2 rows, got 0"):
        fit_pca(ds, n_components=1)


def test_pca_project_survives_empty_blocks(ray_session):
    """0-row blocks (post-filter) must pass through project without the
    reshape(0, -1) crash, and non-empty rows still project exactly."""
    import ray.data

    from fetch_engines_ray.ops.pca import fit_pca, pca_project

    rng = np.random.default_rng(3)
    rows = [{"doc_id": i, "embedding": rng.normal(size=4).tolist()} for i in range(40)]
    ds = ray.data.from_items(rows)
    model = fit_pca(ds, n_components=2)
    # filter drops everything in some blocks, nothing in others
    filtered = ds.filter(lambda r: r["doc_id"] % 7 == 0)
    out = pca_project(filtered, model).to_pandas()
    assert len(out) == 6
    assert all(len(v) == 2 for v in out["pca"])


def test_grouping_sets_custom_sets_sentinel_collision_is_loud(ray_session):
    """With custom ``sets`` that omit the full key set there are no
    grouping_id==0 rows — the collision check must key off each
    column's own grouping bit or a data value equal to the sentinel is
    silently rewritten to NULL (review finding)."""
    import ray.data

    from fetch_engines_ray.ops.rollup import _ALL, grouping_sets_aggregate

    rows = [
        {"a": _ALL, "b": "x", "v": 1},
        {"a": "real", "b": "y", "v": 2},
    ]
    ds = ray.data.from_items(rows)
    with pytest.raises(AssertionError, match="sentinel collision"):
        grouping_sets_aggregate(ds, keys=["a", "b"], sum_cols=["v"], sets=[("a",), ()])


def test_grouping_sets_custom_sets_duckdb_parity(ray_session):
    """Custom grouping sets (no full key set) still match DuckDB."""
    import duckdb

    import ray.data
    from fetch_engines_ray.ops.rollup import grouping_sets_aggregate

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "a": rng.choice(["p", "q", "r"], size=500),
            "b": rng.choice(["u", "v"], size=500),
            "v": rng.integers(0, 100, size=500),
        }
    )
    got = grouping_sets_aggregate(
        ray.data.from_pandas(df), keys=["a", "b"], sum_cols=["v"], sets=[("a",), ()]
    )
    want = duckdb.sql(
        "SELECT a, NULL AS b, CAST(count(*) AS BIGINT) AS n_rows,"
        " CAST(sum(v) AS BIGINT) AS v FROM df GROUP BY a"
        " UNION ALL SELECT NULL, NULL, CAST(count(*) AS BIGINT),"
        " CAST(sum(v) AS BIGINT) FROM df"
    ).df()
    got_a = got[got["grouping_id"] == 0b01].sort_values("a").reset_index(drop=True)
    want_a = want[want["a"].notna()].sort_values("a").reset_index(drop=True)
    assert (got_a["a"].to_numpy() == want_a["a"].to_numpy()).all()
    assert (got_a["v"].astype("int64").to_numpy() == want_a["v"].astype("int64").to_numpy()).all()
    got_all = got[got["grouping_id"] == 0b11]
    assert int(got_all["v"].iloc[0]) == int(df["v"].sum())
