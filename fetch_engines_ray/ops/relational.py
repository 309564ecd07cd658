"""Generic relational operators over the TPC-H-ish test tables.

Demonstrates the engine's wide-operation parity (groupby / sort / join /
distinct / filter) the Ray-Data-first way:

* aggregations pre-combine inside ``map_batches`` only when needed —
  Ray Data's ``groupby().aggregate()`` already does partial aggregation
  per block before the shuffle;
* small-side joins are **broadcast joins**: the small table is read
  once, put in the object store (``ray.put``), and looked up inside
  ``map_batches`` — no all-to-all shuffle;
* sorts that feed a ``limit(k)`` keep only per-block top-k first.

Every function returns columns named to match its DuckDB oracle SQL in
``__ray_entry__.oracle_sql`` exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from fetch_engines_ray.arrowclean import read_parquet_clean
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def _read(sf_dir: str, table: str, columns=None) -> "ray.data.Dataset":
    return read_parquet_clean(f"{sf_dir}/{table}.parquet", columns=columns)


def _add_int_scaled(ds, col: str, out_col: str, scale: float = 100.0):
    """Append ``out_col`` = round(col * scale) as int64.  Money/value
    columns in the test tables are exact 2-decimal values; summing them
    as scaled integers makes every aggregate EXACT and block-order
    independent — float sums land on either side of a round(3) half
    boundary depending on summation order, which flakes the DuckDB
    oracle hash (seen on lineitem_pricing_summary at sf0.001).

    The round mode is pinned to ``half_towards_infinity`` here and at
    every inline ``pc.round`` site below: pyarrow's default is
    half-to-even while DuckDB's ``round()`` is half-away-from-zero
    (``pc.round(0.5)`` = 0 vs SQL ``round(0.5)`` = 1) — current inputs
    are 2-decimal-exact and never land on a half, but a finer-precision
    column would silently diverge under the default."""

    def f(batch: pa.Table) -> pa.Table:
        v = pc.cast(pc.round(pc.multiply(batch[col], pa.scalar(scale)), round_mode="half_towards_infinity"), pa.int64())
        return batch.append_column(out_col, v)

    return ds.map_batches(f, batch_format="pyarrow", batch_size=65536)


def _round_cols(df: pd.DataFrame, cols: list[str], nd: int = 3) -> pd.DataFrame:
    for c in cols:
        df[c] = df[c].round(nd)
    return df


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------

def lineitem_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-shaped: grouped pricing summary with derived revenue."""
    ds = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
        ],
    )

    def add_disc_price(batch: pa.Table) -> pa.Table:
        # prices are 2-decimal, discounts 2-decimal → disc_price is an
        # exact multiple of 1e-4.  Sum in integer 1e-4 units (int64) so
        # the aggregate is EXACT and order-independent: float sums land
        # on either side of a round(3) boundary depending on block
        # order, which flaked the oracle hash at sf0.001.
        disc = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        disc_i = pc.cast(pc.round(pc.multiply(disc, pa.scalar(10000.0)), round_mode="half_towards_infinity"), pa.int64())
        base_i = pc.cast(
            pc.round(pc.multiply(batch["l_extendedprice"], pa.scalar(100.0)), round_mode="half_towards_infinity"), pa.int64()
        )
        batch = batch.append_column("disc_price_i", disc_i)
        return batch.append_column("base_price_i", base_i)

    ds = ds.map_batches(add_disc_price, batch_format="pyarrow", batch_size=65536)
    out = (
        ds.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("base_price_i", alias_name="base_price_i"),
            Sum("disc_price_i", alias_name="disc_price_i"),
            Mean("l_quantity", alias_name="avg_qty"),
            Count(alias_name="count_order"),
        )
        .to_pandas()
    )
    out["sum_base_price"] = out["base_price_i"] / 100.0
    # round to 3dp in INTEGER space, half away from zero (matching SQL
    # round()): a 1e-4-exact sum can land exactly on the 3dp half
    # boundary, where pandas' half-even disagrees with DuckDB
    out["sum_disc_price"] = ((out["disc_price_i"] + 5) // 10) / 1000.0
    out = out.drop(columns=["base_price_i", "disc_price_i"])
    out = out[
        ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
         "sum_disc_price", "avg_qty", "count_order"]
    ]
    out = _round_cols(out, ["sum_qty", "sum_base_price", "avg_qty"])
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def orders_by_status(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "orders", columns=["o_orderstatus", "o_totalprice"])
    ds = _add_int_scaled(ds, "o_totalprice", "cents")
    out = (
        ds.groupby("o_orderstatus")
        .aggregate(
            Count(alias_name="n_orders"),
            Sum("cents", alias_name="cents"),
            Min("o_totalprice", alias_name="min_price"),
            Max("o_totalprice", alias_name="max_price"),
        )
        .to_pandas()
    )
    out["total_price"] = out["cents"] / 100.0
    out = out.drop(columns=["cents"])
    out = out[["o_orderstatus", "n_orders", "total_price", "min_price", "max_price"]]
    return _round_cols(out, ["total_price", "min_price", "max_price"]).sort_values(
        "o_orderstatus"
    ).reset_index(drop=True)


def events_value_by_type(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", columns=["event_type", "value"])
    ds = _add_int_scaled(ds, "value", "cents")
    out = (
        ds.groupby("event_type")
        .aggregate(Count(alias_name="n_events"), Sum("cents", alias_name="cents"))
        .to_pandas()
    )
    out["total_value"] = out["cents"] / 100.0
    out = out.drop(columns=["cents"])
    return _round_cols(out, ["total_value"]).sort_values("event_type").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Broadcast joins
# ---------------------------------------------------------------------------

# Above this many build-side rows a broadcast map stops being "small"
# (every task holds the whole table) and a distributed hash join wins.
BROADCAST_JOIN_MAX_ROWS = 5_000_000


def _broadcast_attach(lookup_df: pd.DataFrame, key_col: str, val_col: str):
    """Vectorized broadcast-join attach: the small side is put in the
    object store ONCE as a (keys, values) Arrow pair; every batch does
    ``pc.index_in`` + ``take`` — no per-row dict lookups."""
    keys = pa.array(lookup_df[key_col])
    vals = pa.array(lookup_df[val_col])
    ref = ray.put((keys, vals))

    def attach(batch: pa.Table, batch_key: str, out_name: str, default=None) -> pa.Table:
        k, v = ray.get(ref)
        idx = pc.index_in(batch[batch_key], value_set=k)
        got = pc.take(v, idx)
        if default is not None:
            got = pc.fill_null(got, default)
        return batch.append_column(out_name, got)

    return attach


def customer_revenue_by_segment(sf_dir: str) -> pd.DataFrame:
    """orders ⋈ customer → revenue by market segment.

    Joins by broadcast (``index_in`` + ``take`` per batch) while the
    customer table is broadcast-small; above
    ``BROADCAST_JOIN_MAX_ROWS`` it switches to a distributed hash join
    — at 100x scale the customer map itself is GBs and must shuffle,
    not ship with every task."""
    cust_ds = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    n_cust = cust_ds.count()  # metadata-only on a parquet read
    if n_cust > BROADCAST_JOIN_MAX_ROWS:
        n_parts = max(2, min(64, n_cust // 1_000_000))
        joined = orders.join(
            cust_ds,
            join_type="inner",
            num_partitions=n_parts,
            on=("o_custkey",),
            right_on=("c_custkey",),
        )
    else:
        attach = _broadcast_attach(cust_ds.to_pandas(), "c_custkey", "c_mktsegment")

        def attach_segment(batch: pa.Table) -> pa.Table:
            # INNER semantics, matching the >threshold hash-join path
            # and the SQL oracle: an order with no customer row DROPS
            # (the old default="" kept it under a phantom "" segment, so
            # the same input returned a different group set depending on
            # which side of the planner threshold it landed)
            out = attach(batch, "o_custkey", "c_mktsegment")
            return out.filter(pc.is_valid(out["c_mktsegment"]))

        joined = orders.map_batches(attach_segment, batch_format="pyarrow", batch_size=65536)
    joined = _add_int_scaled(joined, "o_totalprice", "cents")
    out = (
        joined.groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_orders"), Sum("cents", alias_name="cents"))
        .to_pandas()
    )
    out["revenue"] = out["cents"] / 100.0
    out = out.drop(columns=["cents"])
    return _round_cols(out, ["revenue"]).sort_values("c_mktsegment").reset_index(drop=True)


def customers_per_nation(sf_dir: str) -> pd.DataFrame:
    """customer ⋈ nation (broadcast) → customer count per nation name."""
    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    attach = _broadcast_attach(nation, "n_nationkey", "n_name")

    def attach_nation(batch: pa.Table) -> pa.Table:
        # INNER semantics (the SQL oracle's JOIN): drop unmatched
        out = attach(batch, "c_nationkey", "n_name")
        return out.filter(pc.is_valid(out["n_name"]))

    cust = _read(sf_dir, "customer", columns=["c_nationkey"])
    out = (
        cust.map_batches(attach_nation, batch_format="pyarrow", batch_size=65536)
        .groupby("n_name")
        .aggregate(Count(alias_name="n_customers"))
        .to_pandas()
    )
    return out.sort_values("n_name").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Sort / top-k / distinct / filter
# ---------------------------------------------------------------------------

def top10_orders_by_price(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    out = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10).to_pandas()
    return _round_cols(out, ["o_totalprice"])


def high_value_open_orders(sf_dir: str) -> pd.DataFrame:
    """Vectorized filter inside map_batches (no row-wise ds.filter)."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus", "o_totalprice"])

    def flt(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.equal(batch["o_orderstatus"], pa.scalar("O")),
            pc.greater(batch["o_totalprice"], pa.scalar(200000.0)),
        )
        return batch.filter(mask)

    out = ds.map_batches(flt, batch_format="pyarrow", batch_size=65536).to_pandas()
    out = _round_cols(out, ["o_totalprice"])
    return out.sort_values("o_orderkey").reset_index(drop=True)


def distinct_part_brands(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "part", columns=["p_brand"])
    vals = sorted(ds.unique("p_brand"))
    return pd.DataFrame({"p_brand": vals})


def supplier_count_by_nation(sf_dir: str) -> pd.DataFrame:
    """Broadcast join supplier↔nation (nation is tiny: ray.put once,
    ``index_in`` + ``take`` per batch), then grouped count + balance sum."""
    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    attach = _broadcast_attach(nation, "n_nationkey", "n_name")

    def attach_name(batch: pa.Table) -> pa.Table:
        return attach(batch, "s_nationkey", "n_name")

    ds = _read(sf_dir, "supplier", columns=["s_nationkey", "s_acctbal"]).map_batches(
        attach_name, batch_format="pyarrow", batch_size=8192
    )
    ds = _add_int_scaled(ds, "s_acctbal", "cents")
    out = (
        ds.groupby("n_name")
        .aggregate(Count(alias_name="n_suppliers"), Sum("cents", alias_name="cents"))
        .to_pandas()
    )
    out["total_acctbal"] = out["cents"] / 100.0
    out = out.drop(columns=["cents"])
    out = _round_cols(out, ["total_acctbal"])
    return out.sort_values("n_name").reset_index(drop=True)


def orders_per_month(sf_dir: str) -> pd.DataFrame:
    """Temporal rollup: orders and revenue per calendar month."""

    def month(batch: pa.Table) -> pa.Table:
        m = pc.strftime(batch.column("o_orderdate"), format="%Y-%m")
        cents = pc.cast(
            pc.round(pc.multiply(batch.column("o_totalprice"), pa.scalar(100.0)), round_mode="half_towards_infinity"), pa.int64()
        )
        return pa.table({"month": m, "cents": cents})

    ds = _read(sf_dir, "orders", columns=["o_orderdate", "o_totalprice"]).map_batches(
        month, batch_format="pyarrow", batch_size=8192
    )
    out = (
        ds.groupby("month")
        .aggregate(Count(alias_name="n_orders"), Sum("cents", alias_name="cents"))
        .to_pandas()
    )
    out["revenue"] = out["cents"] / 100.0
    out = out.drop(columns=["cents"])
    out = _round_cols(out, ["revenue"])
    return out.sort_values("month").reset_index(drop=True)


def large_parts_by_brand(sf_dir: str) -> pd.DataFrame:
    """Filter pushdown + grouped sum: parts with p_size >= 25.  The
    money aggregate is emitted as integer cents — float means round
    differently across summation orders (distributed partials vs the
    oracle's sequential scan), integers hash identically."""
    ds = _read(sf_dir, "part", columns=["p_brand", "p_size", "p_retailprice"]).filter(
        expr="p_size >= 25"
    )
    ds = _add_int_scaled(ds, "p_retailprice", "total_cents")
    out = (
        ds.groupby("p_brand")
        .aggregate(Count(alias_name="n_parts"), Sum("total_cents", alias_name="total_cents"))
        .to_pandas()
    )
    out["total_cents"] = out["total_cents"].astype("int64")
    return out.sort_values("p_brand").reset_index(drop=True)


def distinct_users_by_event_type(sf_dir: str) -> pd.DataFrame:
    """COUNT(DISTINCT …) composed from two grouped passes: the first
    groupby dedups (event_type, user_id) pairs with partial aggregation
    per block, so the second shuffle sees only distinct pairs."""
    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    pairs = ds.groupby(["event_type", "user_id"]).aggregate(Count(alias_name="_n"))
    out = (
        pairs.groupby("event_type")
        .aggregate(Count(alias_name="n_users"))
        .to_pandas()
    )
    return out.sort_values("event_type").reset_index(drop=True)


def revenue_by_orderpriority(sf_dir: str) -> pd.DataFrame:
    """Large-side distributed HASH JOIN (lineitem ⋈ orders on orderkey)
    — the one relational query here where neither side is broadcast-
    small, so it exercises Ray Data's hash-shuffle join; the grouped
    rollup then runs on the joined stream."""
    lineitem = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def revenue(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            batch.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), batch.column("l_discount")),
        )
        # exact 1e-4-unit integers (2dp price x 2dp discount factor)
        rev_i = pc.cast(pc.round(pc.multiply(rev, pa.scalar(10000.0)), round_mode="half_towards_infinity"), pa.int64())
        return pa.table({"l_orderkey": batch.column("l_orderkey"), "rev_i": rev_i})

    lineitem = lineitem.map_batches(revenue, batch_format="pyarrow", batch_size=8192)
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    # cost-based strategy (ops/joinplan.py) with filesystem-metadata
    # size hints (zero execution): at bench scale the orders side is
    # broadcast-small (zero-shuffle Arrow join per batch), at 100 TB
    # the planner flips to the hash-shuffle join with partition count
    # scaled to input bytes — every join partition spins up a shuffle
    # aggregator actor, a multi-second fixed cost that dwarfs small
    # inputs.
    from fetch_engines_ray.ops.joinplan import auto_join, parquet_size_hint

    li_bytes = parquet_size_hint(f"{sf_dir}/lineitem.parquet")
    o_bytes = parquet_size_hint(f"{sf_dir}/orders.parquet")
    n_parts = max(2, min(16, li_bytes // (128 << 20) + 1))
    joined = auto_join(
        lineitem,
        orders,
        on="l_orderkey",
        right_on="o_orderkey",
        left_bytes=li_bytes,
        right_bytes=o_bytes,
        num_partitions=n_parts,
    )
    out = (
        joined.groupby("o_orderpriority")
        .aggregate(Count(alias_name="n_items"), Sum("rev_i", alias_name="rev_i"))
        .to_pandas()
    )
    # 3dp half-away-from-zero in integer space (matches SQL round())
    out["revenue"] = ((out["rev_i"] + 5) // 10) / 1000.0
    out = out.drop(columns=["rev_i"])
    return out.sort_values("o_orderpriority").reset_index(drop=True)


def events_tumbling_window(sf_dir: str, window_minutes: int = 60) -> pd.DataFrame:
    """Tumbling-window aggregate over the event stream: count + value
    sum per [window_start, window_start + w) bucket.  The bucket key is
    computed vectorized per batch (epoch floor-div), so the only wide
    op is the final grouped rollup — the streaming-window shape for a
    replayed log."""
    ds = _read(sf_dir, "events", columns=["ts", "value"])
    w_us = window_minutes * 60 * 1_000_000

    def bucket(batch: pa.Table) -> pa.Table:
        # integer epoch-second window key: timezone-free and exact-hash
        # stable against the SQL oracle (no strftime/locale drift).
        # FLOOR division via numpy `//` — pc.divide truncates toward
        # zero, putting pre-1970 timestamps in the wrong bucket (the
        # hopping window and the DuckDB oracle both floor)
        # normalize to MICROSECOND precision first: a ns-precision
        # events table (pandas' parquet default) would otherwise yield
        # epoch-ns integers and silently bucket 1000x off
        ts_us = pc.cast(batch.column("ts"), pa.timestamp("us"))
        epoch_us = pc.cast(ts_us, pa.int64()).combine_chunks().to_numpy()
        win = (epoch_us // w_us) * (window_minutes * 60)
        cents = pc.cast(
            pc.round(pc.multiply(batch.column("value"), pa.scalar(100.0)), round_mode="half_towards_infinity"), pa.int64()
        )
        return pa.table(
            {"window_start": pa.array(win, type=pa.int64()), "cents": cents}
        )

    out = (
        ds.map_batches(bucket, batch_format="pyarrow", batch_size=65536)
        .groupby("window_start")
        .aggregate(Count(alias_name="n_events"), Sum("cents", alias_name="cents"))
        .to_pandas()
    )
    out["total_value"] = out["cents"] / 100.0
    out = out.drop(columns=["cents"])
    out = _round_cols(out, ["total_value"])
    return out.sort_values("window_start").reset_index(drop=True)


def events_hopping_window(
    sf_dir: str, window_minutes: int = 60, hop_minutes: int = 30
) -> pd.DataFrame:
    """Hopping (sliding) window aggregate: count + value sum per
    [window_start, window_start + w) for windows starting every hop h
    (w must be a multiple of h).  Each event is replicated into the
    m = w/h windows covering it with one vectorized numpy repeat inside
    ``map_batches`` — the replication factor is the constant m, not data
    size — so the only wide op stays the final grouped rollup."""
    assert window_minutes % hop_minutes == 0
    m = window_minutes // hop_minutes
    h_us = hop_minutes * 60 * 1_000_000
    hop_s = hop_minutes * 60
    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def explode(batch: pa.Table) -> pa.Table:
        ts_us = pc.cast(batch.column("ts"), pa.timestamp("us"))
        epoch_us = pc.cast(ts_us, pa.int64()).combine_chunks().to_numpy()
        vals = batch.column("value").combine_chunks().to_numpy(zero_copy_only=False)
        # half-away-from-zero like every other int-scaled money site
        # (np.rint is half-even and diverges from SQL round() on
        # half-cent inputs)
        scaled = vals * 100.0
        cents = (np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype(np.int64)
        b = epoch_us // h_us  # hop-bucket index of each event
        # an event in hop bucket b lies inside windows starting at
        # (b - i) * hop for i in 0..m-1
        starts = (np.repeat(b, m) - np.tile(np.arange(m, dtype=np.int64), len(b))) * hop_s
        return pa.table(
            {
                "window_start": pa.array(starts, type=pa.int64()),
                "cents": pa.array(np.repeat(cents, m)),
            }
        )

    out = (
        ds.map_batches(explode, batch_format="pyarrow", batch_size=65536)
        .groupby("window_start")
        .aggregate(Count(alias_name="n_events"), Sum("cents", alias_name="cents"))
        .to_pandas()
    )
    out["total_value"] = out["cents"] / 100.0
    out = out.drop(columns=["cents"])
    out = _round_cols(out, ["total_value"])
    return out.sort_values("window_start").reset_index(drop=True)


def top_docs_per_lang(sf_dir: str, k: int = 3) -> pd.DataFrame:
    """Top-k rows per group (longest docs per language) with a
    per-block combiner: each block reduces to at most k rows per group
    BEFORE the shuffle, so the grouped finalize sees ~k × num_blocks
    rows per group instead of the whole corpus — the scale shape for
    rank-within-group over 10^12 rows.  Ties break on doc_id asc."""
    ds = _read(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])

    def partial_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(["n_chars", "doc_id"], ascending=[False, True])
        return pa.Table.from_pandas(df.groupby("lang", sort=False).head(k), preserve_index=False)

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(["n_chars", "doc_id"], ascending=[False, True]).head(k)
        group["rank"] = np.arange(1, len(group) + 1, dtype=np.int64)
        return group

    out = (
        ds.map_batches(partial_topk, batch_format="pyarrow", batch_size=65536)
        .groupby("lang")
        .map_groups(final_topk, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["lang", "rank"]).reset_index(drop=True)


def user_sessions(sf_dir: str, gap_minutes: int = 30) -> pd.DataFrame:
    """Sessionization (session windows): per-user event runs split on
    inactivity gaps > ``gap_minutes``.

    The wide op is ONE ``groupby(user_id).map_groups`` — each group
    sorts its own events and derives session boundaries vectorized
    (numpy diff on epoch seconds), so no cross-group state and no
    second shuffle.  Equivalent SQL needs lag() + a windowed running
    sum; see the oracle in __ray_entry__.oracle_sql.
    """
    gap_s = gap_minutes * 60
    ds = _read(sf_dir, "events", columns=["user_id", "event_id", "ts", "value"])

    def sessionize(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"])
        # microsecond integers end-to-end: fractional-second gaps and
        # round-vs-floor casts otherwise drift off the SQL oracle
        epoch_us = g["ts"].astype("datetime64[us]").astype("int64")
        new_sess = np.ones(len(g), dtype=np.int64)
        if len(g) > 1:
            new_sess[1:] = (np.diff(epoch_us.to_numpy()) > gap_s * 1_000_000).astype(np.int64)
        sess_idx = np.cumsum(new_sess) - 1
        g = g.assign(session_idx=sess_idx, epoch=epoch_us // 1_000_000)
        out = (
            g.groupby("session_idx", as_index=False)
            .agg(
                n_events=("event_id", "size"),
                start_epoch=("epoch", "min"),
                total_value=("value", "sum"),
            )
        )
        out.insert(0, "user_id", g["user_id"].iloc[0])
        out["n_events"] = out["n_events"].astype("int64")
        out["total_value"] = out["total_value"].round(3)
        return out[["user_id", "session_idx", "n_events", "start_epoch", "total_value"]]

    out = (
        ds.groupby("user_id")
        .map_groups(sessionize, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(["user_id", "session_idx"]).reset_index(drop=True)


def events_last_order_asof(sf_dir: str) -> pd.DataFrame:
    """AS-OF JOIN: for every event, the date of the same customer's
    latest order at-or-before the event time (-1 if none).

    Ray Data has no asof-join primitive; the Ray-Data-first composition
    is a tagged UNION of both streams followed by ONE
    ``groupby(key).map_groups`` — each group sorts its own order dates
    once and resolves all its events with a vectorized searchsorted.
    Output carries the matched order DATE (not key) so equal-date ties
    cannot make the result nondeterministic.  Partitioning assumption:
    one customer's events+orders fit in a group (same as any
    sort-merge-per-key operator; salt the key if a customer is hot).
    """
    events = _read(sf_dir, "events", columns=["user_id", "event_id", "ts"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])

    def tag_events(batch: pa.Table) -> pa.Table:
        t_us = pc.cast(batch.column("ts"), pa.int64())
        return pa.table(
            {
                "key": pc.cast(batch.column("user_id"), pa.int64()),
                "t_us": t_us,
                "event_id": pc.cast(batch.column("event_id"), pa.int64()),
            }
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        t_us = pc.cast(batch.column("o_orderdate"), pa.int64())
        return pa.table(
            {
                "key": pc.cast(batch.column("o_custkey"), pa.int64()),
                "t_us": t_us,
                "event_id": pa.array([-1] * batch.num_rows, type=pa.int64()),
            }
        )

    tagged = events.map_batches(tag_events, batch_format="pyarrow", batch_size=65536).union(
        orders.map_batches(tag_orders, batch_format="pyarrow", batch_size=65536)
    )

    def asof(group: pd.DataFrame) -> pd.DataFrame:
        ev = group[group["event_id"] >= 0]
        od = np.sort(group.loc[group["event_id"] < 0, "t_us"].to_numpy())
        if len(ev) == 0:
            return pd.DataFrame(columns=["event_id", "user_id", "last_order_epoch"])
        ev_t = ev["t_us"].to_numpy()
        if len(od) == 0:
            matched = np.full(len(ev), -1, dtype=np.int64)
        else:
            idx = np.searchsorted(od, ev_t, side="right") - 1
            matched = np.where(idx >= 0, od[np.clip(idx, 0, None)] // 1_000_000, -1)
        return pd.DataFrame(
            {
                "event_id": ev["event_id"].to_numpy(),
                "user_id": ev["key"].to_numpy(),
                "last_order_epoch": matched.astype("int64"),
            }
        )

    out = tagged.groupby("key").map_groups(asof, batch_format="pandas").to_pandas()
    return out.sort_values("event_id").reset_index(drop=True)


def events_props_k_by_type(sf_dir: str) -> pd.DataFrame:
    """Semi-structured extraction: the events table carries a JSON
    ``props`` column ('{"k": 87}'); extract the integer field with a
    vectorized regex (no per-row json.loads) and roll it up per
    event_type.  Oracle: DuckDB json_extract."""
    ds = _read(sf_dir, "events", columns=["event_type", "props"])

    def extract_k(batch: pa.Table) -> pa.Table:
        k = pc.extract_regex(batch.column("props"), pattern=r'"k":\s*(?P<k>-?\d+)')
        kv = pc.cast(pc.struct_field(k, "k"), pa.int64())
        return pa.table({"event_type": batch.column("event_type"), "k": kv})

    out = (
        ds.map_batches(extract_k, batch_format="pyarrow", batch_size=65536)
        .groupby("event_type")
        .aggregate(Count(alias_name="n_events"), Sum("k", alias_name="k_total"))
        .to_pandas()
    )
    out["k_total"] = out["k_total"].astype("int64")
    return out.sort_values("event_type").reset_index(drop=True)


def customers_without_orders(
    sf_dir: str, min_total: float = 0.0, num_partitions: int = 4
) -> pd.DataFrame:
    """Distributed ANTI join: customers with no order above
    ``min_total`` (TPC-H Q22 flavor) via Ray Data's native
    ``join_type="left_anti"`` — the same hash-partitioned exchange as an
    inner join, nothing driver-side.  Pytest oracles this directly
    against DuckDB (NOT IN subquery)."""
    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"]).filter(
        expr=f"o_totalprice > {min_total!r}"
    )
    out = cust.join(
        orders,
        join_type="left_anti",
        num_partitions=num_partitions,
        on=("c_custkey",),
        right_on=("o_custkey",),
    ).to_pandas()
    if "c_custkey" not in out.columns:  # empty anti result loses schema
        return pd.DataFrame({"c_custkey": pd.Series(dtype="int64")})
    return out.sort_values("c_custkey").reset_index(drop=True)


def customer_order_counts_outer(sf_dir: str, num_partitions: int = 4) -> pd.DataFrame:
    """Distributed LEFT OUTER join: every customer with their order
    count (0 for order-less customers) — pre-aggregate the orders side
    to (custkey, n) BEFORE the join so the wide exchange moves one row
    per customer, not one per order."""
    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    per_cust = (
        _read(sf_dir, "orders", columns=["o_custkey"])
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n_orders"))
    )
    out = cust.join(
        per_cust,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("c_custkey",),
        right_on=("o_custkey",),
    ).to_pandas()[["c_custkey", "n_orders"]]
    out["n_orders"] = out["n_orders"].fillna(0).astype("int64")
    return out.sort_values("c_custkey").reset_index(drop=True)


def customer_order_full_outer(
    sf_dir: str,
    min_acctbal: float = 7000.0,
    min_total: float = 400000.0,
    num_partitions: int = 4,
) -> pd.DataFrame:
    """Distributed FULL OUTER join (the last Ray-native join type the
    relational family didn't exercise): high-balance customers vs
    per-customer counts of high-value orders.  Both sides keep
    unmatched rows — customers with no qualifying order carry
    ``n_orders`` 0, qualifying orders whose customer misses the balance
    cut carry ``c_acctbal_cents`` -1 — so the result is the union of
    both key spaces (the reconciliation-report shape).  Orders
    pre-aggregate to one row per customer before the exchange."""
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])

    def keep_high(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.greater(batch["c_acctbal"], pa.scalar(min_acctbal))
        )
        cents = pc.cast(
            pc.round(
                pc.multiply(batch["c_acctbal"], 100.0),
                round_mode="half_towards_infinity",
            ),
            pa.int64(),
        )
        return pa.table({"c_custkey": batch["c_custkey"], "c_acctbal_cents": cents})

    left = cust.map_batches(keep_high, batch_format="pyarrow", batch_size=8192)
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    per_cust = (
        orders.map_batches(
            lambda b: b.filter(pc.greater(b["o_totalprice"], pa.scalar(min_total))),
            batch_format="pyarrow",
            batch_size=8192,
        )
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n_orders"))
    )
    out = left.join(
        per_cust,
        join_type="full_outer",
        num_partitions=num_partitions,
        on=("c_custkey",),
        right_on=("o_custkey",),
    ).to_pandas()
    # surviving key = customer key where present, else the order side's
    key = out["c_custkey"].where(out["c_custkey"].notna(), out.get("o_custkey"))
    res = pd.DataFrame(
        {
            "custkey": key.astype("int64"),
            "c_acctbal_cents": out["c_acctbal_cents"].fillna(-1).astype("int64"),
            "n_orders": out["n_orders"].fillna(0).astype("int64"),
        }
    )
    return res.sort_values("custkey").reset_index(drop=True)
