"""Wide pivot (long -> columns-per-category) in ONE shuffle.

SQL's ``PIVOT`` / conditional-aggregation idiom::

    SELECT index,
           SUM(CASE WHEN cat = 'A' THEN v END) AS cat_A, ...
    FROM t GROUP BY index

The reference engine has no pivot surface (it is a per-URL extractor);
this is part of the analysis tier the north rule adds (SURVEY.md §2.8)
— e.g. docs-per-(language x quality-tier) matrices, event counts per
(user-cohort x event-type).

Ray-Data shape (the same partial-aggregation posture as
``ops/rollup.py``): each input block reduces to a WIDE partial — one
row per distinct index value in the block, one column per category —
inside ``map_batches`` (C-level pandas groupby + unstack), then ONE
``groupby(index)`` merges the partials with per-column Sum/Min/Max.
The shuffle moves pre-aggregated wide rows (<= distinct-index-values
per block), never one row per input record; the CATEGORY set must be
bounded (it becomes the schema), the index cardinality is unbounded —
the result stays a streaming Dataset.
"""
from __future__ import annotations

from typing import TYPE_CHECKING, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    import ray

_AGGS = ("sum", "count", "min", "max")


def pivot_wide(
    ds: "ray.data.Dataset",
    index: str,
    columns: str,
    values: Optional[str] = None,
    agg: str = "count",
    categories: Optional[Sequence] = None,
    prefix: Optional[str] = None,
) -> "ray.data.Dataset":
    """Pivot ``columns``'s categories into one aggregate column each.

    - ``agg="count"`` counts rows per (index, category); ``sum`` /
      ``min`` / ``max`` aggregate ``values``.
    - ``categories``: pass the expected category list to skip the
      discovery pass (and to pin column order / include empty
      categories); otherwise one bounded ``groupby(columns).count()``
      discovers them.
    - Absent (index, category) combinations are 0 for sum/count
      (matching ``SUM(CASE WHEN ... ELSE 0 END)`` / ``COUNT``), and
      NULL for min/max (matching ``MIN(CASE WHEN ... END)``).
    - Output column names are ``{prefix}{category}`` with
      ``prefix="{columns}_"`` by default.
    """
    import ray as _ray
    from ray.data.aggregate import Max as _Max, Min as _Min, Sum as _Sum

    if agg not in _AGGS:
        raise ValueError(f"unsupported agg: {agg} (want one of {_AGGS})")
    if agg != "count" and values is None:
        raise ValueError(f"agg={agg!r} needs a values column")

    if categories is None:
        cats = sorted(
            ds.groupby(columns).count().to_pandas()[columns].dropna().tolist()
        )
    else:
        cats = list(categories)
    pre = f"{columns}_" if prefix is None else prefix
    out_cols = [f"{pre}{c}" for c in cats]
    if len(set(out_cols)) != len(out_cols):
        raise ValueError("category names collide after prefixing")
    cat_ref = _ray.put(cats)

    sel = [index, columns] + ([values] if values else [])
    zero_fill = agg in ("sum", "count")

    def partial(batch: pa.Table) -> pa.Table:
        cats_l = _ray.get(cat_ref)
        names = [f"{pre}{c}" for c in cats_l]
        df = batch.select(sel).to_pandas()
        if agg == "count":
            df["__v"] = np.int64(1)
            vcol, f = "__v", "sum"
        else:
            vcol, f = values, agg
        g = (
            df.groupby([index, columns], sort=False, dropna=False)[vcol]
            .agg(f)
            .unstack(columns)
            .reindex(columns=cats_l)
        )
        g.columns = names
        if zero_fill:
            g = g.fillna(0)
            if agg == "count" or pd.api.types.is_integer_dtype(df[vcol]):
                g = g.astype("int64")
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    wide = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    merge = {"sum": _Sum, "count": _Sum, "min": _Min, "max": _Max}[agg]
    return wide.groupby(index).aggregate(
        *[merge(c, alias_name=c) for c in out_cols]
    )


def unpivot_long(
    ds: "ray.data.Dataset",
    index: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "name",
    value_name: str = "value",
    include_nulls: bool = False,
) -> "ray.data.Dataset":
    """Wide -> long (SQL ``UNPIVOT`` / pandas ``melt``): one output row
    per (input row, value column), carrying the column name in
    ``var_name`` and its value in ``value_name``.

    Embarrassingly parallel — a pure per-batch C-level ``melt`` with NO
    shuffle; row count multiplies by ``len(value_cols)`` but blocks
    stream through.  NULL cells are dropped by default (DuckDB UNPIVOT
    semantics); pass ``include_nulls=True`` to keep them (the
    ``UNPIVOT INCLUDE NULLS`` form).
    """
    index = list(index)
    value_cols = list(value_cols)

    def melt(df: pd.DataFrame) -> pd.DataFrame:
        out = df.melt(
            id_vars=index,
            value_vars=value_cols,
            var_name=var_name,
            value_name=value_name,
        )
        if not include_nulls:
            out = out[out[value_name].notna()]
        return out.reset_index(drop=True)

    return ds.map_batches(melt, batch_format="pandas", batch_size=65536)
