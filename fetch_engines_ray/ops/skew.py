"""Hot-key skew mitigation: salted two-stage aggregation.

A plain ``groupby(key).aggregate(...)`` routes EVERY row of a hot key
through one shuffle partition / one aggregator — on a web corpus where
one domain holds 20% of all documents, that single aggregator becomes
the pipeline's wall clock.  The standard fix (public knowledge in every
distributed-SQL engine) is salting: split each key into ``n_salts``
sub-keys, pre-aggregate the ``(key, salt)`` partials (stage 1 spreads
the hot key across ``n_salts`` aggregators), then combine the partials
with a second, tiny groupby on the bare key.

Correct for any DECOMPOSABLE aggregate; this module implements
sum / count / min / max directly and mean via its sum+count
decomposition.  Salt assignment is an arbitrary row partition — results
are independent of it (exactly for integer columns; float sums are
block-order dependent in a plain groupby too).
"""
from __future__ import annotations

from typing import TYPE_CHECKING, Optional, Sequence, Union

import numpy as np
import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    import ray

# (column, op, output_name); op in {"sum","count","min","max","mean"}
AggSpec = tuple[str, str, str]

_PARTIAL = {"sum": "Sum", "count": "Count", "nncount": "Count", "min": "Min", "max": "Max"}
# how stage 2 combines stage-1 partials
_COMBINE = {"sum": "Sum", "count": "Sum", "nncount": "Sum", "min": "Min", "max": "Max"}


def salted_aggregate(
    ds: "ray.data.Dataset",
    key: Union[str, Sequence[str]],
    aggs: Sequence[AggSpec],
    n_salts: int = 16,
) -> "ray.data.Dataset":
    """Two-stage skew-safe aggregation.

    ``aggs`` is a list of ``(column, op, out_name)``; ``op`` one of
    sum / count / min / max / mean ("count" ignores its column).  The
    hot key's rows fan out over ``n_salts`` stage-1 aggregators; stage 2
    moves one row per (key, salt) — bounded by ``n_salts`` per key no
    matter how hot the key is."""
    from ray.data.aggregate import Count, Max, Min, Sum

    classes = {"Sum": Sum, "Count": Count, "Min": Min, "Max": Max}
    keys = [key] if isinstance(key, str) else list(key)

    # expand mean -> sum + count partials; dedupe identical partials
    partial_specs: dict[str, tuple[str, str]] = {}  # alias -> (col, op)
    finals: list[tuple[str, str, str]] = []  # (out_name, kind, alias/aliases)
    for col, op, out in aggs:
        if op == "mean":
            # SQL AVG divides the null-skipping sum by the NON-NULL
            # count — pairing Sum(col) with the shared row count gave a
            # wrong mean on any group with nulls
            s_alias, c_alias = f"__{col}_sum", f"__{col}_nncount"
            partial_specs[s_alias] = (col, "sum")
            partial_specs[c_alias] = (col, "nncount")
            finals.append((out, "mean", f"{s_alias}|{c_alias}"))
        elif op in _PARTIAL:
            alias = f"__{col}_{op}" if op != "count" else "__rows_count"
            partial_specs[alias] = (col, op)
            finals.append((out, op, alias))
        else:
            raise ValueError(f"unsupported op: {op}")

    def add_salt(batch: pa.Table) -> pa.Table:
        salt = np.arange(batch.num_rows, dtype=np.int64) % n_salts
        return batch.append_column("__salt", pa.array(salt, type=pa.int64()))

    stage1_aggs = []
    for alias, (col, op) in partial_specs.items():
        cls = classes[_PARTIAL[op]]
        if op == "count":
            stage1_aggs.append(cls(alias_name=alias))
        elif op == "nncount":
            stage1_aggs.append(cls(col, ignore_nulls=True, alias_name=alias))
        else:
            stage1_aggs.append(cls(col, alias_name=alias))
    stage1 = (
        ds.map_batches(add_salt, batch_format="pyarrow", batch_size=8192)
        .groupby(keys + ["__salt"])
        .aggregate(*stage1_aggs)
    )

    stage2_aggs = []
    for alias, (col, op) in partial_specs.items():
        cls = classes[_COMBINE[op]]
        stage2_aggs.append(cls(alias, alias_name=alias))
    combined = stage1.groupby(keys).aggregate(*stage2_aggs)

    def finish(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols = {k: batch[k] for k in keys}
        for out, kind, alias in finals:
            if kind == "mean":
                s_alias, c_alias = alias.split("|")
                cols[out] = pc.divide(
                    pc.cast(batch[s_alias], pa.float64()),
                    pc.cast(batch[c_alias], pa.float64()),
                )
            else:
                cols[out] = batch[alias]
        return pa.table(cols)

    return combined.map_batches(finish, batch_format="pyarrow", batch_size=8192)


def salted_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    right_on: Optional[str] = None,
    n_salts: int = 8,
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """Skew-safe inner join for a hot LEFT key against a SMALL right
    side: the right side is replicated ``n_salts`` times (once per
    salt), each left row picks one salt, and the join runs on the
    composite ``(key, salt)`` — the hot key's rows spread over
    ``n_salts`` join partitions instead of funnelling through one.

    The replication factor prices the trade explicitly: right-side rows
    cross the exchange ``n_salts`` times, so this is for build sides
    that are small (dimension tables, winner sets) against skewed fact
    sides — the exact case where a plain hash join stalls on one
    aggregator.  Salts ride as int64 ``__lsalt``/``__rsalt`` columns;
    the output drops them and matches the plain join's columns."""
    right_on = right_on or on

    def left_salt(batch: pa.Table) -> pa.Table:
        salt = np.arange(batch.num_rows, dtype=np.int64) % n_salts
        return batch.append_column("__lsalt", pa.array(salt, type=pa.int64()))

    def right_replicate(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), n_salts))
        rep = batch.take(idx)
        salt = np.tile(np.arange(n_salts, dtype=np.int64), n)
        return rep.append_column("__rsalt", pa.array(salt, type=pa.int64()))

    lsalted = left.map_batches(left_salt, batch_format="pyarrow", batch_size=8192)
    rsalted = right.map_batches(right_replicate, batch_format="pyarrow", batch_size=8192)
    joined = lsalted.join(
        rsalted,
        join_type="inner",
        num_partitions=num_partitions,
        on=(on, "__lsalt"),
        right_on=(right_on, "__rsalt"),
    )

    def drop_salts(batch: pa.Table) -> pa.Table:
        return batch.drop_columns(
            [c for c in ("__lsalt", "__rsalt") if c in batch.column_names]
        )

    return joined.map_batches(drop_salts, batch_format="pyarrow", batch_size=8192)
