"""Web link-graph construction from extracted markdown spans.

The classic crawl-scale composition (Common Crawl host-level ranking):
extraction emits clean markdown with inline ``[text](url)`` links and a
``Source: <url>`` line (M22, ``functions/converter.py``); this module
turns that output into a host-level edge list that feeds
``ops.graph.pagerank`` / ``pagerank_distributed`` — the quality prior
a curation pipeline mixes into document scoring.

Scale shape: link extraction is one vectorized ``map_batches`` pass
(compiled regex per batch, no shuffle); the host graph is a single
``groupby`` over (src_host, dst_host) — edge-count-sized, n-gram-free;
node ids are stable 64-bit host hashes so the rank join needs no
driver-side vocabulary (collision odds at 10^9 hosts ~ birthday bound
on 64 bits, documented trade).
"""
from __future__ import annotations

import re
from typing import TYPE_CHECKING
from urllib.parse import urlparse

import numpy as np
import pandas as pd
import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

# markdown links, excluding images (leading !), http(s) targets only
_MD_LINK = re.compile(r"(?<!\!)\[[^\]]*\]\((https?://[^)\s]+)\)")
# the M22-injected plain-text source line: the document's own URL
_SOURCE_LINE = re.compile(r"(?m)^Source:\s+(https?://\S+)\s*$")


def _host(url: str) -> str:
    try:
        return (urlparse(url).netloc or "").lower()
    except ValueError:  # pragma: no cover - malformed IPv6 etc.
        return ""


def extract_link_edges(
    ds: "ray.data.Dataset",
    spans_col: str = "out_spans",
    id_col: str = "doc_id",
    drop_self: bool = True,
) -> "ray.data.Dataset":
    """One row per outbound markdown link in the extracted spans:
    ``(src_doc, src_host, dst_url, dst_host)``.

    ``src_host`` comes from the injected ``Source:`` line (empty when
    absent); ``drop_self`` removes same-host links (navigation noise
    for a cross-host rank)."""

    def edges(batch: pa.Table) -> pa.Table:
        src_doc: list = []
        src_host: list[str] = []
        dst_url: list[str] = []
        dst_host: list[str] = []
        for doc, spans in zip(
            batch[id_col].to_pylist(), batch[spans_col].to_pylist()
        ):
            text = "\n".join(
                s.get("text") or "" for s in (spans or []) if s.get("kind") == "text"
            )
            m = _SOURCE_LINE.search(text)
            sh = _host(m.group(1)) if m else ""
            for url in _MD_LINK.findall(text):
                dh = _host(url)
                if not dh or (drop_self and dh == sh):
                    continue
                src_doc.append(doc)
                src_host.append(sh)
                dst_url.append(url)
                dst_host.append(dh)
        return pa.table(
            {
                "src_doc": pa.array(src_doc, type=batch[id_col].type),
                "src_host": pa.array(src_host, type=pa.string()),
                "dst_url": pa.array(dst_url, type=pa.string()),
                "dst_host": pa.array(dst_host, type=pa.string()),
            }
        )

    return ds.map_batches(edges, batch_format="pyarrow", batch_size=1024)


def _host_hash(hosts) -> np.ndarray:
    return pd.util.hash_array(np.asarray(hosts, dtype=object)).astype(np.int64)


def host_link_graph(
    edges: "ray.data.Dataset",
) -> tuple["ray.data.Dataset", "ray.data.Dataset"]:
    """Distinct host-to-host edges as ``(src:int64, dst:int64)`` (the
    ``ops.graph`` contract) plus the ``(host, node)`` id table for
    joining ranks back to names.  One groupby each — edge-set-sized."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count

    with_src = edges.map_batches(
        lambda b: b.filter(pc.not_equal(b["src_host"], pa.scalar(""))),
        batch_format="pyarrow",
        batch_size=8192,
    )
    pairs = (
        with_src.groupby(["src_host", "dst_host"])
        .aggregate(Count(alias_name="n_links"))
    )

    def to_ids(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src": pa.array(_host_hash(batch["src_host"].to_pylist()), type=pa.int64()),
                "dst": pa.array(_host_hash(batch["dst_host"].to_pylist()), type=pa.int64()),
                "n_links": batch["n_links"],
            }
        )

    graph = pairs.map_batches(to_ids, batch_format="pyarrow", batch_size=8192)

    def hosts_of(batch: pa.Table) -> pa.Table:
        hs = set(batch["src_host"].to_pylist()) | set(batch["dst_host"].to_pylist())
        hs = sorted(hs)
        return pa.table(
            {
                "host": pa.array(hs, type=pa.string()),
                "node": pa.array(_host_hash(hs), type=pa.int64()),
            }
        )

    host_ids = (
        pairs.map_batches(hosts_of, batch_format="pyarrow", batch_size=8192)
        .groupby("host")
        .map_groups(lambda df: df.head(1), batch_format="pandas")
    )
    return graph, host_ids




def add_doc_host(
    batch: pa.Table, spans_col: str = "out_spans", id_col: str = "doc_id"
) -> pa.Table:
    """Append each document's own host (from the injected ``Source:``
    line in its extracted spans; empty when absent) — the key that
    joins a doc to host-level priors."""
    hosts: list[str] = []
    for spans in batch[spans_col].to_pylist():
        text = "\n".join(
            s.get("text") or "" for s in (spans or []) if s.get("kind") == "text"
        )
        m = _SOURCE_LINE.search(text)
        hosts.append(_host(m.group(1)) if m else "")
    return batch.append_column("host", pa.array(hosts, type=pa.string()))


def sample_by_host_rank(
    extracted: "ray.data.Dataset",
    k: int,
    damping: float = 0.85,
    n_iters: int = 20,
    seed: int = 0,
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Authority-weighted document sampling — the RefinedWeb-style
    'trust the linked-to hosts' prior, composed end-to-end: host
    PageRank over the corpus's own link graph → rank broadcast
    (host-cardinality-sized) and attached per doc in one map pass →
    Efraimidis–Spirakis weighted sampling without replacement
    (``ops/sampling.weighted_sample``: seed-stable across runs and
    partitionings).  Docs from unranked/absent hosts carry weight 0 and
    are NEVER drawn (weighted_sample's documented contract: exactly
    ``min(k, n_positive_weight)`` rows) — a corpus with no link graph
    samples nothing rather than uniformly."""
    import ray

    from .sampling import weighted_sample

    ranks = host_pagerank(
        extracted, damping=damping, n_iters=n_iters, id_col=id_col
    )
    # integer micro-rank weights: weighted_sample keys on ln(u)/w, and
    # the x1e9 scale keeps tiny rank differences from flushing to 0
    lut = {
        h: int(r * 1e9) for h, r in zip(ranks["host"], ranks["rank"]) if r > 0
    }
    ref = ray.put(lut)

    def attach(batch: pa.Table) -> pa.Table:
        table = ray.get(ref)
        batch = add_doc_host(batch, id_col=id_col)
        w = [table.get(h, 0) for h in batch["host"].to_pylist()]
        return batch.append_column("host_rank_x1e9", pa.array(w, type=pa.int64()))

    weighted = extracted.map_batches(attach, batch_format="pyarrow", batch_size=1024)
    return weighted_sample(
        weighted, k, weight_col="host_rank_x1e9", id_col=id_col, seed=seed
    )


def host_pagerank(
    extracted: "ray.data.Dataset",
    damping: float = 0.85,
    n_iters: int = 20,
    spans_col: str = "out_spans",
    id_col: str = "doc_id",
) -> pd.DataFrame:
    """End-to-end: extracted spans → link edges → host graph → PageRank
    → ``(host, rank)`` descending.  Driver-resident rank vector (host
    count, not doc count); swap in ``pagerank_distributed`` beyond
    ~10^8 hosts."""
    from .graph import pagerank

    graph, host_ids = host_link_graph(
        extract_link_edges(extracted, spans_col=spans_col, id_col=id_col)
    )
    ids = host_ids.to_pandas()  # bounded: one row per distinct host
    if ids.empty or "node" not in ids.columns:
        # empty link graph (no markdown links / no Source: lines): Ray
        # drops columns on empty frames — report "no hosts", don't
        # KeyError (same hazard graph._node_index guards)
        return pd.DataFrame(
            {"host": pd.Series(dtype=object), "rank": pd.Series(dtype="float64")}
        )
    ranks = pagerank(graph.select_columns(["src", "dst"]), damping, n_iters)
    out = ids.merge(ranks, left_on="node", right_on="node", how="left")
    out["rank"] = out["rank"].fillna(0.0)
    return (
        out[["host", "rank"]]
        .sort_values(["rank", "host"], ascending=[False, True])
        .reset_index(drop=True)
    )
