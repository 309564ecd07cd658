"""Token-budget document selection (pick the best N tokens, not rows).

The curation primitive behind "train on your best 1 T tokens": rank
documents by a quality score and keep the top of the ranking until a
GLOBAL token budget is spent.  Semantics are the SQL window rule

    SUM(tokens) OVER (ORDER BY score DESC, id ASC) <= budget

(the running total INCLUDES the row itself), which makes the operator
exactly DuckDB-oracle-able.

Scale design — no global sort, no corpus-sized driver pull:

1. **Per-score totals** (one shuffle, output one row per DISTINCT
   score): ``groupby(score).sum(tokens)``.  Quality scores are
   quantized in practice (int features, bucketed floats), so this
   table is small; for continuous scores quantize upstream.
2. **Threshold on the driver** over that small table: every score
   strictly better than the boundary score is fully kept, and the
   leftover budget ``r`` falls inside ONE score's tie group.
3. **Boundary resolution** inside the tie group, ordered by id.  Small
   groups are pulled directly; big ones first shrink via an
   order-preserving id-bucket pass (``groupby(id // width).sum``) so
   the driver only ever sees one bucket's rows — the pull is bounded
   by ``ties / 1024``, not by the corpus.
4. **Final filter** is one broadcast predicate per batch (score
   strictly inside, or boundary score + id in the kept set).
"""
from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

_BOUNDARY_PULL_LIMIT = 65536  # direct-pull cap for the tie group
_BOUNDARY_BUCKETS = 1024


def _boundary_kept_ids(
    boundary: "ray.data.Dataset",
    n_ties: int,
    remaining: int,
    token_col: str,
    id_col: str,
) -> np.ndarray:
    """Ids of the prefix (ordered by id asc) of the boundary tie group
    whose running token total stays within ``remaining``."""
    import pandas as pd

    from ray.data.aggregate import Sum

    prefix_total = 0
    if n_ties > _BOUNDARY_PULL_LIMIT:
        # order-preserving shrink: contiguous id buckets, keep whole
        # buckets while they fit, pull only the single split bucket
        lohi = boundary.map_batches(
            lambda b: pa.table(
                {
                    "lo": pa.array([pc.min(b[id_col]).as_py()], type=pa.int64()),
                    "hi": pa.array([pc.max(b[id_col]).as_py()], type=pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ).to_pandas()
        lo, hi = int(lohi["lo"].min()), int(lohi["hi"].max())
        width = max(1, (hi - lo + 1) // _BOUNDARY_BUCKETS)

        def add_bucket(b: pa.Table) -> pa.Table:
            ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            return b.append_column(
                "_bucket", pa.array((ids - lo) // width, type=pa.int64())
            )

        per_bucket = (
            boundary.map_batches(add_bucket, batch_format="pyarrow")
            .groupby("_bucket")
            .aggregate(Sum(token_col, alias_name="t"))
            .to_pandas()  # bounded: <= _BOUNDARY_BUCKETS + 1 rows
            .sort_values("_bucket")
        )
        cum = per_bucket["t"].cumsum()
        full = per_bucket[cum <= remaining]
        prefix_total = int(full["t"].sum())
        full_buckets = set(full["_bucket"].astype(int).tolist())
        split = per_bucket[cum > remaining].head(1)["_bucket"]
        if split.empty:
            # every bucket fits — keep the whole tie group
            def all_ids(b: pa.Table) -> pa.Table:
                return b.select([id_col])

            pulled = boundary.map_batches(all_ids, batch_format="pyarrow").to_pandas()
            return pulled[id_col].to_numpy().astype(np.int64)
        split_bucket = int(split.iloc[0])

        def in_split(b: pa.Table) -> pa.Table:
            ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            return b.filter(pa.array((ids - lo) // width == split_bucket))

        tail = (
            boundary.map_batches(in_split, batch_format="pyarrow")
            .select_columns([id_col, token_col])
            .to_pandas()  # bounded: one id-bucket of the tie group
        )
        kept_full = (
            boundary.map_batches(
                lambda b: b.filter(
                    pa.array(
                        np.isin(
                            (
                                b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
                                - lo
                            )
                            // width,
                            np.asarray(sorted(full_buckets), dtype=np.int64),
                        )
                    )
                ),
                batch_format="pyarrow",
            )
            .select_columns([id_col])
            .to_pandas()[id_col]
            .to_numpy()
            .astype(np.int64)
            if full_buckets
            else np.asarray([], dtype=np.int64)
        )
        df = tail
    else:
        df = boundary.select_columns([id_col, token_col]).to_pandas()
        kept_full = np.asarray([], dtype=np.int64)
    df = df.sort_values(id_col).reset_index(drop=True)
    cum = df[token_col].cumsum() + prefix_total
    kept_tail = df.loc[cum <= remaining, id_col].to_numpy().astype(np.int64)
    return np.concatenate([kept_full, kept_tail])


def select_token_budget(
    ds: "ray.data.Dataset",
    budget: int,
    score_col: str,
    token_col: str,
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Keep rows by descending ``score_col`` (ties broken by ascending
    ``id_col``) while the running ``token_col`` total — including the
    candidate row — stays ``<= budget``.

    Equivalent SQL (the pytest + registry oracle):
    ``SUM(tok) OVER (ORDER BY score DESC, id) <= budget``.
    """
    import ray

    from ray.data.aggregate import Count, Sum

    if budget < 0:
        raise ValueError("budget must be >= 0")

    per_score = (
        ds.groupby(score_col)
        .aggregate(Sum(token_col, alias_name="t"), Count(alias_name="c"))
        .to_pandas()  # bounded: one row per distinct score (quantize upstream)
        .sort_values(score_col, ascending=False)
        .reset_index(drop=True)
    )
    if per_score.empty:
        return ds
    cum = per_score["t"].cumsum()
    full = per_score[cum <= budget]
    spent = int(full["t"].sum())
    boundary_rows = per_score[cum > budget].head(1)
    if boundary_rows.empty:
        return ds  # whole corpus fits
    boundary_score = boundary_rows[score_col].iloc[0]
    n_ties = int(boundary_rows["c"].iloc[0])
    remaining = budget - spent
    # cutoff: the worst fully-kept score (strictly-better-than-boundary set)
    b_scalar = pa.scalar(boundary_score)

    boundary_ds = ds.map_batches(
        lambda b: b.filter(pc.equal(b[score_col], b_scalar)).select(
            [id_col, token_col]
        ),
        batch_format="pyarrow",
        batch_size=8192,
    )
    if n_ties > _BOUNDARY_PULL_LIMIT:
        # the bucket path consumes the tie group FOUR times (lo/hi,
        # per-bucket sums, split-bucket pull, full-bucket ids) — pin it
        # once (two int64 columns, tie-group-sized) so each pass is an
        # object-store read instead of a re-execution of ds's whole
        # upstream lineage
        boundary_ds = boundary_ds.materialize()
    kept_ids = _boundary_kept_ids(boundary_ds, n_ties, remaining, token_col, id_col)
    ids_ref = ray.put(np.sort(kept_ids))

    def keep(batch: pa.Table) -> pa.Table:
        ids = ray.get(ids_ref)
        s = batch[score_col]
        better = pc.greater(s, b_scalar).to_numpy(zero_copy_only=False)
        at = pc.equal(s, b_scalar).to_numpy(zero_copy_only=False)
        rid = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = better | (at & np.isin(rid, ids))
        return batch.filter(pa.array(sel))

    return ds.map_batches(keep, batch_format="pyarrow", batch_size=8192)
