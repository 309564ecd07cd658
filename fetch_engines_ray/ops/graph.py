"""Distributed link-graph analytics: PageRank over an edge Dataset.

Public-knowledge basis: Page, Brin, Motwani, Winograd, "The PageRank
Citation Ranking" (1999).  Web-corpus curation uses link-graph authority
as a quality prior (e.g. Common-Crawl-derived corpora filter or weight
by harmonic centrality / PageRank), so the engine carries it next to
the per-domain rollups in ``ops/urlops.py``.

Ray-Data shape (one streaming pass per power iteration — the same
posture as ``ops/clustering.kmeans_fit``):

- edges live as a ``(src, dst)`` Dataset; out-degrees are ONE groupby,
  joined onto the edge table once up front (degree rides the edge row
  through every iteration instead of re-joining per pass);
- each iteration: ``map_batches`` computes per-edge contributions
  ``rank[src] / deg[src]`` against the BROADCAST rank vector (ranks are
  node-count-sized, not edge-count-sized — broadcastable far beyond the
  point where edges stop fitting anywhere), then ONE
  ``groupby(dst).sum`` shuffle builds the next vector;
- dangling-node mass and the teleport term are folded in driver-side
  (scalars).  The rank table is the only driver-resident state —
  ``O(nodes)``, with the documented handoff to a join-based rank table
  when even that outgrows the driver.

Determinism: ranks are float64; per-iteration sums run through Ray's
Sum aggregate (block-order dependent at the ULP level, like every
distributed float sum).  The pytest pins parity with a single-process
reference to 1e-9 and exact rank ORDER on fixtures.
"""
from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    import ray


def _node_index(edges: "ray.data.Dataset") -> np.ndarray:
    """Sorted unique node ids (src ∪ dst): two per-batch unique passes
    + one distinct groupby — node-table sized on the driver."""
    from ray.data.aggregate import Count

    def nodes(batch: pa.Table) -> pa.Table:
        u = np.unique(
            np.concatenate(
                [
                    batch["src"].to_numpy(zero_copy_only=False),
                    batch["dst"].to_numpy(zero_copy_only=False),
                ]
            )
        )
        return pa.table({"node": pa.array(u, type=pa.int64())})

    distinct = (
        edges.map_batches(nodes, batch_format="pyarrow", batch_size=8192)
        .groupby("node")
        .aggregate(Count(alias_name="_c"))
        .to_pandas()
    )
    if distinct.empty:  # empty graph: ray drops columns on empty frames
        return np.empty(0, dtype=np.int64)
    return np.sort(distinct["node"].to_numpy().astype(np.int64))


def pagerank(
    edges: "ray.data.Dataset",
    damping: float = 0.85,
    n_iters: int = 20,
    tol: float = 1e-9,
) -> pd.DataFrame:
    """PageRank over ``(src:int64, dst:int64)`` edges; returns
    ``(node, rank)`` summing to 1.0 (driver-resident: O(nodes))."""
    import ray
    from ray.data.aggregate import Count, Sum

    node_ids = _node_index(edges)
    n = len(node_ids)
    if n == 0:
        return pd.DataFrame({"node": pd.Series(dtype="int64"), "rank": pd.Series(dtype="float64")})

    deg = (
        edges.groupby("src").aggregate(Count(alias_name="deg")).to_pandas()
    )  # O(nodes) rows
    deg_map = np.zeros(n, dtype=np.int64)
    deg_map[np.searchsorted(node_ids, deg["src"].to_numpy())] = deg["deg"].to_numpy()

    rank = np.full(n, 1.0 / n)
    for _ in range(n_iters):
        # one broadcast per iteration: (node index, out-degrees, ranks)
        # — all O(nodes); the closure captures only the ObjectRef
        state_ref = ray.put((node_ids, deg_map, rank))

        def contribs(batch: pa.Table, ref=state_ref) -> pa.Table:
            ids_l, deg_l, r_l = ray.get(ref)
            src = batch["src"].to_numpy(zero_copy_only=False)
            dst = batch["dst"].to_numpy(zero_copy_only=False)
            si = np.searchsorted(ids_l, src)
            # per-batch pre-aggregation by dst before the shuffle
            d_u, inv = np.unique(dst, return_inverse=True)
            acc = np.zeros(len(d_u))
            np.add.at(acc, inv, r_l[si] / np.maximum(deg_l[si], 1))
            return pa.table(
                {"dst": pa.array(d_u, type=pa.int64()), "c": pa.array(acc, type=pa.float64())}
            )

        summed = (
            edges.map_batches(contribs, batch_format="pyarrow", batch_size=8192)
            .groupby("dst")
            .aggregate(Sum("c", alias_name="c"))
            .to_pandas()
        )
        new = np.zeros(n)
        if len(summed):
            new[np.searchsorted(node_ids, summed["dst"].to_numpy())] = summed["c"].to_numpy()
        dangling = rank[deg_map == 0].sum()
        new = (1.0 - damping) / n + damping * (new + dangling / n)
        delta = float(np.abs(new - rank).max())
        rank = new
        if delta < tol:
            break
    return pd.DataFrame({"node": node_ids, "rank": rank})


def pagerank_reference(
    edge_list: list[tuple[int, int]],
    damping: float = 0.85,
    n_iters: int = 20,
    tol: float = 1e-9,
) -> pd.DataFrame:
    """Single-process power iteration (pytest parity pin)."""
    nodes = np.sort(np.unique(np.asarray(edge_list).reshape(-1)))
    n = len(nodes)
    idx = {int(v): i for i, v in enumerate(nodes)}
    deg = np.zeros(n, dtype=np.int64)
    for s, _ in edge_list:
        deg[idx[s]] += 1
    rank = np.full(n, 1.0 / n)
    for _ in range(n_iters):
        new = np.zeros(n)
        for s, d in edge_list:
            new[idx[d]] += rank[idx[s]] / deg[idx[s]]
        dangling = rank[deg == 0].sum()
        new = (1.0 - damping) / n + damping * (new + dangling / n)
        delta = float(np.abs(new - rank).max())
        rank = new
        if delta < tol:
            break
    return pd.DataFrame({"node": nodes, "rank": rank})
