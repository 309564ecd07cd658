"""Stable global row indexing over a Dataset (Spark ``zipWithIndex``).

Ray Data has no built-in contiguous row index, but a materialized
Dataset exposes its blocks IN ORDER with per-block row counts in the
metadata (``iter_internal_ref_bundles``).  That is exactly the classic
two-phase zipWithIndex:

1. driver reads ONLY per-block row counts (one int per block — never a
   row) and prefix-sums them into block offsets;
2. one narrow remote task per block appends
   ``offset + arange(num_rows)`` — embarrassingly parallel, zero
   shuffle, blocks stay in the object store.

Cost model at 100 TB: the dataset must be materialized so block order
is pinned, but every caller here indexes AFTER a ``sort()`` — which is
an all-to-all barrier that materializes anyway — so the index adds
O(num_blocks) driver ints and one cheap per-block map, nothing more.
"""
from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


def zip_with_index(
    ds: "ray.data.Dataset", index_col: str = "row_index"
) -> "ray.data.Dataset":
    """Append a contiguous 0-based int64 row index in dataset order.

    The input is materialized (to pin block order); the returned
    Dataset is rebuilt from the SAME block objects plus the index
    column, so no row data moves through the driver.
    """
    import ray
    import ray.data

    sch = ds.schema()
    if sch is not None and index_col in sch.names:
        # Arrow happily appends a DUPLICATE column name, and downstream
        # name-based access then fails far from the cause — refuse here
        raise ValueError(
            f"column {index_col!r} already exists — drop it first or pass "
            "a different index_col"
        )
    m = ds.materialize()
    refs: list = []
    counts: list[int] = []
    for bundle in m.iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            if meta.num_rows is None:  # pragma: no cover - materialized blocks carry counts
                raise RuntimeError("materialized block missing num_rows metadata")
            refs.append(block_ref)
            counts.append(int(meta.num_rows))
    offsets = np.zeros(len(counts), dtype=np.int64)
    if counts:
        offsets[1:] = np.cumsum(counts[:-1])

    @ray.remote
    def _attach(block, offset: int) -> pa.Table:
        from ray.data.block import BlockAccessor

        t = BlockAccessor.for_block(block).to_arrow()
        idx = pa.array(offset + np.arange(t.num_rows, dtype=np.int64), type=pa.int64())
        return t.append_column(index_col, idx)

    if not refs:
        # empty input: preserve schema, add the index column
        sch = m.schema()
        base = (
            pa.schema(list(zip(sch.names, sch.types))).empty_table()
            if sch is not None
            else pa.table({})
        )
        base = base.append_column(index_col, pa.array([], type=pa.int64()))
        return ray.data.from_arrow(base)
    out_refs = [_attach.remote(r, int(o)) for r, o in zip(refs, offsets)]
    return ray.data.from_arrow_refs(out_refs)
