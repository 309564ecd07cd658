"""One-shuffle wide pivot (ops/pivot.py) pytest-oracled against DuckDB
conditional aggregation over the real orders table — count / sum / min
pivots match exactly, including absent-combination fill semantics."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def month_status_ds(ray_session):
    from fetch_engines_ray.arrowclean import read_parquet_clean

    orders = read_parquet_clean(
        f"{SF}/orders.parquet",
        columns=["o_orderdate", "o_orderstatus", "o_totalprice"],
    )

    def prep(b: pa.Table) -> pa.Table:
        month = b["o_orderdate"].to_pandas().dt.strftime("%Y-%m")
        cents = np.floor(
            b["o_totalprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        return pa.table(
            {
                "month": pa.array(month.tolist()),
                "status": b["o_orderstatus"],
                "cents": pa.array(cents, type=pa.int64()),
            }
        )

    return orders.map_batches(prep, batch_format="pyarrow")


def _oracle() -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')"
    )
    return con.execute(
        "WITH t AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,"
        " o_orderstatus AS status,"
        " CAST(floor(o_totalprice*100+0.5) AS BIGINT) AS cents FROM orders)"
        " SELECT month,"
        " COUNT(CASE WHEN status='F' THEN 1 END) AS cF,"
        " COUNT(CASE WHEN status='O' THEN 1 END) AS cO,"
        " COUNT(CASE WHEN status='P' THEN 1 END) AS cP,"
        " COALESCE(SUM(CASE WHEN status='F' THEN cents END),0) AS sF,"
        " COALESCE(SUM(CASE WHEN status='O' THEN cents END),0) AS sO,"
        " COALESCE(SUM(CASE WHEN status='P' THEN cents END),0) AS sP,"
        " MIN(CASE WHEN status='F' THEN cents END) AS mF,"
        " MIN(CASE WHEN status='O' THEN cents END) AS mO,"
        " MIN(CASE WHEN status='P' THEN cents END) AS mP"
        " FROM t GROUP BY month ORDER BY month"
    ).df()


def _got(ds, **kw) -> pd.DataFrame:
    from fetch_engines_ray.ops.pivot import pivot_wide

    return (
        pivot_wide(ds, "month", "status", **kw)
        .to_pandas()
        .sort_values("month")
        .reset_index(drop=True)
    )


def test_pivot_count_matches_duckdb(month_status_ds):
    got = _got(month_status_ds, agg="count")
    want = _oracle()
    assert got["month"].tolist() == want["month"].tolist()
    assert np.array_equal(
        got[["status_F", "status_O", "status_P"]].to_numpy().astype(np.int64),
        want[["cF", "cO", "cP"]].to_numpy().astype(np.int64),
    )


def test_pivot_sum_matches_duckdb(month_status_ds):
    got = _got(month_status_ds, values="cents", agg="sum")
    want = _oracle()
    assert np.array_equal(
        got[["status_F", "status_O", "status_P"]].to_numpy().astype(np.int64),
        want[["sF", "sO", "sP"]].to_numpy().astype(np.int64),
    )


def test_pivot_min_matches_duckdb_with_null_fill(month_status_ds):
    got = _got(month_status_ds, values="cents", agg="min")
    want = _oracle()
    a = got[["status_F", "status_O", "status_P"]].to_numpy(dtype="float64")
    b = want[["mF", "mO", "mP"]].to_numpy(dtype="float64")
    assert ((np.isnan(a) & np.isnan(b)) | (a == b)).all()


def test_pivot_pinned_categories_and_errors(ray_session):
    import ray.data

    from fetch_engines_ray.ops.pivot import pivot_wide

    rows = [
        {"month": "m1", "status": "A", "cents": 5},
        {"month": "m1", "status": "A", "cents": 7},
        {"month": "m2", "status": "B", "cents": 1},
    ]
    ds = ray.data.from_items(rows).repartition(2)
    # pinned category list includes an EMPTY category -> all-zero column
    got = (
        pivot_wide(ds, "month", "status", values="cents", agg="sum",
                   categories=["A", "B", "Z"])
        .to_pandas()
        .sort_values("month")
        .reset_index(drop=True)
    )
    assert got["status_A"].tolist() == [12, 0]
    assert got["status_B"].tolist() == [0, 1]
    assert got["status_Z"].tolist() == [0, 0]
    with pytest.raises(ValueError, match="unsupported agg"):
        pivot_wide(ds, "month", "status", values="cents", agg="mean")
    with pytest.raises(ValueError, match="needs a values column"):
        pivot_wide(ds, "month", "status", agg="sum")
    with pytest.raises(ValueError, match="collide"):
        pivot_wide(ds, "month", "status", agg="count", categories=["A", "A"])


def test_unpivot_matches_duckdb_and_roundtrips(month_status_ds):
    """UNPIVOT of the pivoted wide table vs DuckDB UNPIVOT (null cells
    dropped), plus the pivot -> unpivot roundtrip recovering the
    original per-(month,status) sums."""
    import ray.data

    from fetch_engines_ray.ops.pivot import pivot_wide, unpivot_long

    wide = pivot_wide(month_status_ds, "month", "status", values="cents", agg="min")
    cols = ["status_F", "status_O", "status_P"]
    got = (
        unpivot_long(wide, ["month"], cols, var_name="status", value_name="m")
        .to_pandas()
        .sort_values(["month", "status"], kind="mergesort")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')"
    )
    want = con.execute(
        "WITH t AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,"
        " o_orderstatus AS status,"
        " CAST(floor(o_totalprice*100+0.5) AS BIGINT) AS cents FROM orders),"
        " w AS (SELECT month,"
        "  MIN(CASE WHEN status='F' THEN cents END) AS status_F,"
        "  MIN(CASE WHEN status='O' THEN cents END) AS status_O,"
        "  MIN(CASE WHEN status='P' THEN cents END) AS status_P"
        "  FROM t GROUP BY month)"
        " SELECT month, status, m FROM w"
        " UNPIVOT (m FOR status IN (status_F, status_O, status_P))"
        " ORDER BY month, status"
    ).df()
    assert got["month"].tolist() == want["month"].tolist()
    assert got["status"].tolist() == want["status"].tolist()
    assert np.array_equal(
        got["m"].to_numpy().astype(np.int64), want["m"].to_numpy().astype(np.int64)
    )

    # roundtrip: unpivot(pivot(sum)) summed back == plain groupby sums
    wide_sum = pivot_wide(month_status_ds, "month", "status", values="cents", agg="sum")
    back = (
        unpivot_long(wide_sum, ["month"], cols, var_name="status", value_name="s")
        .to_pandas()
    )
    back["status"] = back["status"].str.removeprefix("status_")
    back = back[back["s"] > 0].sort_values(["month", "status"]).reset_index(drop=True)
    plain = con.execute(
        "WITH t AS (SELECT strftime(o_orderdate, '%Y-%m') AS month,"
        " o_orderstatus AS status,"
        " CAST(floor(o_totalprice*100+0.5) AS BIGINT) AS cents FROM orders)"
        " SELECT month, status, SUM(cents) AS s FROM t GROUP BY month, status"
        " ORDER BY month, status"
    ).df()
    assert back["month"].tolist() == plain["month"].tolist()
    assert np.array_equal(
        back["s"].to_numpy().astype(np.int64), plain["s"].to_numpy().astype(np.int64)
    )


def test_unpivot_include_nulls(ray_session):
    import ray.data

    from fetch_engines_ray.ops.pivot import unpivot_long

    ds = ray.data.from_items([{"k": 1, "a": 10, "b": None}, {"k": 2, "a": None, "b": 5}])
    kept = unpivot_long(ds, ["k"], ["a", "b"]).to_pandas()
    assert len(kept) == 2
    full = unpivot_long(ds, ["k"], ["a", "b"], include_nulls=True).to_pandas()
    assert len(full) == 4
