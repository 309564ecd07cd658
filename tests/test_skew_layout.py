"""Salted aggregation (ops/skew.py) and zone-map layout (ops/layout.py):
salting matches the plain groupby exactly while bounding per-key fanout,
and sorted writes let key-range reads skip files/row groups from footer
metadata alone."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def skewed_ds(ray_session):
    import ray.data

    rng = np.random.RandomState(31)
    # one hot key holds 80% of rows
    keys = np.where(rng.rand(20_000) < 0.8, 7, rng.randint(0, 50, size=20_000))
    vals = rng.randint(0, 1000, size=20_000)
    return ray.data.from_pandas(
        pd.DataFrame({"k": keys.astype(np.int64), "v": vals.astype(np.int64)})
    ).repartition(8)


def test_salted_aggregate_matches_plain_groupby(skewed_ds):
    from fetch_engines_ray.ops.skew import salted_aggregate

    got = (
        salted_aggregate(
            skewed_ds,
            "k",
            [
                ("v", "sum", "v_sum"),
                ("v", "count", "n"),
                ("v", "min", "v_min"),
                ("v", "max", "v_max"),
                ("v", "mean", "v_mean"),
            ],
            n_salts=16,
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pdf = skewed_ds.to_pandas()
    want = (
        pdf.groupby("k")["v"]
        .agg(v_sum="sum", n="count", v_min="min", v_max="max", v_mean="mean")
        .reset_index()
        .sort_values("k")
        .reset_index(drop=True)
    )
    for c in ("v_sum", "n", "v_min", "v_max"):
        assert got[c].astype("int64").tolist() == want[c].astype("int64").tolist(), c
    assert np.allclose(got["v_mean"], want["v_mean"])


def test_stage_one_bounds_hot_key_fanout(skewed_ds):
    """Stage 2 moves at most n_salts rows per key regardless of key
    heat — the skew guarantee itself."""
    from ray.data.aggregate import Count, Sum

    import pyarrow as pa

    n_salts = 8

    def add_salt(batch: pa.Table) -> pa.Table:
        salt = np.arange(batch.num_rows, dtype=np.int64) % n_salts
        return batch.append_column("__salt", pa.array(salt))

    stage1 = (
        skewed_ds.map_batches(add_salt, batch_format="pyarrow")
        .groupby(["k", "__salt"])
        .aggregate(Sum("v", alias_name="s"), Count(alias_name="c"))
        .to_pandas()
    )
    per_key = stage1.groupby("k").size()
    assert per_key.max() <= n_salts
    # the hot key's 16k rows fanned out across all salts
    assert per_key[7] == n_salts


def test_sorted_layout_prunes_files_and_row_groups(ray_session, tmp_path):
    import ray.data

    from fetch_engines_ray.ops.layout import plan_key_range, pruned_read, write_sorted

    rng = np.random.RandomState(5)
    n = 60_000
    df = pd.DataFrame(
        {
            "key": rng.randint(0, 1_000_000, size=n).astype(np.int64),
            "payload": rng.randint(0, 100, size=n).astype(np.int64),
        }
    )
    path = str(tmp_path / "sorted")
    n_files = write_sorted(
        ray.data.from_pandas(df).repartition(6),
        path,
        "key",
        target_rows_per_file=10_000,
        row_group_rows=2_048,
    )
    assert n_files >= 4

    lo, hi = 100_000, 150_000
    _, stats = plan_key_range(path, "key", lo, hi)
    # a 5% key range over a sorted layout reads a small fraction
    assert stats["files_read"] < stats["files_total"]
    assert stats["row_groups_read"] <= stats["row_groups_total"] * 0.25

    ds_out, stats2 = pruned_read(path, "key", lo, hi)
    got = ds_out.to_pandas().sort_values(["key", "payload"]).reset_index(drop=True)
    want = (
        df[(df["key"] >= lo) & (df["key"] <= hi)]
        .sort_values(["key", "payload"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["key", "payload"]], want)


def test_pruned_read_empty_range(ray_session, tmp_path):
    import ray.data

    from fetch_engines_ray.ops.layout import pruned_read, write_sorted

    df = pd.DataFrame({"key": np.arange(1000, dtype=np.int64), "v": np.ones(1000, dtype=np.int64)})
    path = str(tmp_path / "s2")
    write_sorted(ray.data.from_pandas(df), path, "key", target_rows_per_file=500)
    out, stats = pruned_read(path, "key", 10_000, 20_000)
    assert out.count() == 0
    assert stats["files_read"] == 0


def test_salted_join_matches_plain_join(skewed_ds, ray_session):
    """The replicated-right salted join returns exactly the plain
    pandas merge on a hot-key fact table x small dimension table."""
    import ray.data

    from fetch_engines_ray.ops.skew import salted_join

    dim = pd.DataFrame({"dk": np.arange(50, dtype=np.int64), "name": [f"n{i}" for i in range(50)]})
    out = (
        salted_join(skewed_ds, ray.data.from_pandas(dim), on="k", right_on="dk", n_salts=8)
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    want = (
        skewed_ds.to_pandas()
        .merge(dim, left_on="k", right_on="dk")
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    assert len(out) == len(want)
    assert out["k"].tolist() == want["k"].tolist()
    assert out["v"].tolist() == want["v"].tolist()
    assert out["name"].tolist() == want["name"].tolist()


def test_compact_sorted_runs_merges_without_shuffle(ray_session, tmp_path):
    """LSM-style compaction: three overlapping sorted runs merge into
    one layout with non-overlapping file key ranges, exact row parity,
    intact pruning, and killed-run resume."""
    import os

    import pyarrow.parquet as pq_

    import ray.data

    from fetch_engines_ray.ops.layout import (
        _files,
        compact_sorted_runs,
        pruned_read,
        write_sorted,
    )

    rng = np.random.RandomState(17)
    runs = []
    frames = []
    for r in range(3):
        df = pd.DataFrame(
            {
                "k": rng.randint(0, 10_000, size=4000),
                "run": r,
                "payload": rng.randint(0, 1 << 30, size=4000),
            }
        )
        frames.append(df)
        rp = str(tmp_path / f"run{r}")
        write_sorted(
            ray.data.from_pandas(df), rp, "k",
            target_rows_per_file=1500, row_group_rows=256,
        )
        runs.append(rp)

    out = str(tmp_path / "compacted")
    rep = compact_sorted_runs(runs, out, "k", target_rows_per_file=2500, row_group_rows=256)
    assert rep["rows"] == 12_000 == rep["input_rows"]
    assert rep["buckets"] >= 4 and rep["skipped_buckets"] == 0

    # exact multiset parity with the union of the runs
    got = (
        pq_.read_table(out)
        .to_pandas()
        .sort_values(["k", "run", "payload"])
        .reset_index(drop=True)
    )
    want = (
        pd.concat(frames)
        .sort_values(["k", "run", "payload"])
        .reset_index(drop=True)[["k", "run", "payload"]]
    )
    pd.testing.assert_frame_equal(got[["k", "run", "payload"]], want)

    # files carry NON-OVERLAPPING key ranges, in file order
    ranges = []
    for f in _files(out):
        md = pq_.ParquetFile(f).metadata
        ci = {md.schema.column(i).name: i for i in range(md.num_columns)}["k"]
        mins = [md.row_group(g).column(ci).statistics.min for g in range(md.num_row_groups)]
        maxs = [md.row_group(g).column(ci).statistics.max for g in range(md.num_row_groups)]
        ranges.append((min(mins), max(maxs)))
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
        assert a_hi < b_lo or a_hi <= b_lo  # strictly ordered buckets
        assert a_hi <= b_lo

    # pruning contract intact on the compacted layout
    ds_r, stats = pruned_read(out, "k", 100, 400)
    got_r = ds_r.to_pandas()
    assert sorted(got_r["k"].unique()) == sorted(
        want[(want["k"] >= 100) & (want["k"] <= 400)]["k"].unique()
    )
    assert stats["files_read"] < stats["files_total"]

    # resume: drop one output file, re-run — only that bucket rebuilds
    victim = _files(out)[1]
    mtimes = {f: os.path.getmtime(f) for f in _files(out) if f != victim}
    os.remove(victim)
    rep2 = compact_sorted_runs(runs, out, "k", target_rows_per_file=2500, row_group_rows=256)
    assert rep2["skipped_buckets"] == rep2["buckets"] - 1
    assert os.path.exists(victim)
    for f, m in mtimes.items():
        assert os.path.getmtime(f) == m  # untouched


@pytest.mark.parametrize("seed", [0, 7])
def test_compact_randomized_runs_property(ray_session, tmp_path, seed):
    """Randomized run shapes (skewed keys, duplicate keys, uneven run
    sizes, single-row runs): compaction preserves the exact multiset
    and the non-overlap contract."""
    import pyarrow.parquet as pq_

    import ray.data

    from fetch_engines_ray.ops.layout import _files, compact_sorted_runs, write_sorted

    rng = np.random.RandomState(seed)
    runs, frames = [], []
    for r in range(rng.randint(2, 5)):
        n = int(rng.choice([1, 17, 400, 2000]))
        # skew: half the keys from a hot band
        keys = np.where(
            rng.rand(n) < 0.5, rng.randint(0, 50, n), rng.randint(0, 100_000, n)
        )
        df = pd.DataFrame({"k": keys, "v": rng.randint(0, 1 << 30, n)})
        frames.append(df)
        rp = str(tmp_path / f"r{r}")
        write_sorted(ray.data.from_pandas(df), rp, "k", target_rows_per_file=700, row_group_rows=128)
        runs.append(rp)

    out = str(tmp_path / "out")
    rep = compact_sorted_runs(runs, out, "k", target_rows_per_file=900, row_group_rows=128)
    want = pd.concat(frames).sort_values(["k", "v"]).reset_index(drop=True)
    got = pq_.read_table(out).to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "v"]], want[["k", "v"]])
    assert rep["rows"] == len(want)

    prev_hi = None
    for f in _files(out):
        md = pq_.ParquetFile(f).metadata
        ci = {md.schema.column(i).name: i for i in range(md.num_columns)}["k"]
        lo = min(md.row_group(g).column(ci).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(ci).statistics.max for g in range(md.num_row_groups))
        if prev_hi is not None:
            assert lo > prev_hi or lo >= prev_hi  # ordered
            assert lo >= prev_hi
        prev_hi = hi


def test_merge_join_sorted_matches_duckdb(ray_session, tmp_path):
    """Storage-level merge join over two write_sorted layouts: exact
    inner/left/outer parity vs DuckDB with NO shuffle — multiple
    key-range buckets forced so cross-bucket correctness is exercised,
    and keys present on only one side land per join semantics."""
    import duckdb
    import numpy as np
    import pandas as pd

    import ray.data

    from fetch_engines_ray.ops.layout import merge_join_sorted, write_sorted

    rng = np.random.RandomState(9)
    left = pd.DataFrame(
        {
            "k": rng.permutation(np.arange(0, 3000, 2)),  # evens
            "a": rng.randint(0, 100, 1500).astype("int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.permutation(np.arange(0, 2250, 3)),  # multiples of 3
            "b": rng.randint(0, 100, 750).astype("int64"),
        }
    )
    lp, rp = str(tmp_path / "L"), str(tmp_path / "R")
    write_sorted(ray.data.from_pandas(left), lp, "k", target_rows_per_file=400, row_group_rows=64)
    write_sorted(ray.data.from_pandas(right), rp, "k", target_rows_per_file=400, row_group_rows=64)

    con = duckdb.connect()
    con.register("L", left)
    con.register("R", right)
    for how, sql_join in (("inner", "JOIN"), ("left", "LEFT JOIN"), ("outer", "FULL OUTER JOIN")):
        ds, stats = merge_join_sorted(lp, rp, "k", how=how, target_rows_per_bucket=500)
        assert stats["buckets"] > 2  # cross-bucket path is really exercised
        got = ds.to_pandas()
        key_sql = "coalesce(L.k, R.k) AS k" if how == "outer" else "L.k AS k"
        want = con.execute(
            f"SELECT {key_sql}, a, b FROM L {sql_join} R ON L.k = R.k"
        ).df()
        for fr in (got, want):
            fr.sort_values(["k", "a", "b"], inplace=True, na_position="last")
            fr.reset_index(drop=True, inplace=True)
        assert len(got) == len(want), how
        for c in ("k", "a", "b"):
            ga = got[c].to_numpy(dtype="float64", na_value=np.nan)
            wa = want[c].to_numpy(dtype="float64", na_value=np.nan)
            both_nan = np.isnan(ga) & np.isnan(wa)
            assert (both_nan | (ga == wa)).all(), (how, c)

    with pytest.raises(ValueError, match="unsupported how"):
        merge_join_sorted(lp, rp, "k", how="anti")
