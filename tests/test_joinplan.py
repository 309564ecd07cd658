"""Cost-based join planning (ops/joinplan.py): strategy selection from
size estimates, and result parity between the broadcast and shuffle
paths against a DuckDB join oracle — same rows, same schema."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_plan_join_strategy_matrix():
    from fetch_engines_ray.ops.joinplan import plan_join

    big, small = 100 << 30, 10 << 20
    assert plan_join(big, small) == "broadcast_right"
    assert plan_join(small, big) == "broadcast_left"
    assert plan_join(big, big) == "shuffle"
    assert plan_join(big, small, how="left") == "broadcast_right"
    # the preserved side of a LEFT join cannot be the broadcast side
    assert plan_join(small, big, how="left") == "shuffle"
    with pytest.raises(ValueError, match="unsupported how"):
        plan_join(1, 1, how="full")
    with pytest.raises(ValueError, match="arity"):
        from fetch_engines_ray.ops.joinplan import auto_join

        auto_join(None, None, on=("a", "b"), right_on="a")


@pytest.fixture(scope="module")
def sides(ray_session):
    from fetch_engines_ray.arrowclean import read_parquet_clean

    cust = read_parquet_clean(f"{SF}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    orders = read_parquet_clean(f"{SF}/orders.parquet", columns=["o_custkey", "o_orderkey"])
    return orders, cust


def _want() -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')")
    con.execute(f"CREATE VIEW customer AS SELECT * FROM read_parquet('{SF}/customer.parquet')")
    return con.execute(
        "SELECT o_custkey, o_orderkey, c_mktsegment FROM orders"
        " JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey"
    ).df()


def test_auto_join_parity_broadcast_vs_shuffle(sides):
    from fetch_engines_ray.ops.joinplan import auto_join

    orders, cust = sides
    want = _want()
    for kw in ({}, {"broadcast_threshold": 0, "num_partitions": 2}):
        got = (
            auto_join(orders, cust, on="o_custkey", right_on="c_custkey", **kw)
            .to_pandas()
            .sort_values("o_orderkey")
            .reset_index(drop=True)
        )
        # strategy-invariant schema: the right key column is dropped
        assert sorted(got.columns) == ["c_mktsegment", "o_custkey", "o_orderkey"], kw
        assert len(got) == len(want), kw
        assert np.array_equal(got["o_orderkey"].to_numpy(), want["o_orderkey"].to_numpy()), kw
        assert (got["c_mktsegment"].to_numpy() == want["c_mktsegment"].to_numpy()).all(), kw


def test_auto_join_left_keeps_unmatched(sides, ray_session):
    import ray.data

    from fetch_engines_ray.ops.joinplan import auto_join

    orders, cust = sides
    extra = ray.data.from_items([{"o_custkey": 99999999, "o_orderkey": -1}])
    got = (
        auto_join(orders.union(extra), cust, on="o_custkey",
                  right_on="c_custkey", how="left")
        .to_pandas()
    )
    assert len(got) == orders.count() + 1
    assert got[got["o_orderkey"] == -1]["c_mktsegment"].isna().all()


def test_auto_join_broadcast_left_small_side(sides):
    """When the LEFT side is the small one, the planner broadcasts it
    over the streaming right side — same rows as the oracle."""
    from fetch_engines_ray.ops.joinplan import auto_join

    orders, cust = sides
    want = _want()
    got = (
        auto_join(cust, orders, on="c_custkey", right_on="o_custkey",
                  left_bytes=1, right_bytes=100 << 30)
        .to_pandas()
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert np.array_equal(got["o_orderkey"].to_numpy(), want["o_orderkey"].to_numpy())
    assert "o_custkey" not in got.columns  # duplicated right key dropped
