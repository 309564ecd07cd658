"""Link-graph construction from extracted markdown (ops/linkgraph.py)."""
import numpy as np
import pandas as pd

from fetch_engines_ray.ops.linkgraph import (
    _MD_LINK,
    _SOURCE_LINE,
    extract_link_edges,
    host_pagerank,
)


def _doc(doc_id, src_url, links, extra_text=""):
    md = f"# T\n\nSource: {src_url}\n\n" + extra_text
    md += "\n".join(f"see [x{i}]({u})" for i, u in enumerate(links))
    return {"doc_id": doc_id, "out_spans": [{"kind": "text", "text": md}]}


def test_link_regexes():
    text = (
        "Source: https://a.example/page\n"
        "a [link](https://b.example/x) and an image ![img](https://c.example/i.png)\n"
        "not-a-link (https://d.example) and [rel](/relative)\n"
    )
    assert _SOURCE_LINE.search(text).group(1) == "https://a.example/page"
    assert _MD_LINK.findall(text) == ["https://b.example/x"]


def test_extract_link_edges(ray_session):
    import ray.data

    rows = [
        _doc("d1", "https://a.example/1", ["https://b.example/x", "https://A.example/self"]),
        _doc("d2", "https://b.example/2", ["https://hub.example/y"]),
        {"doc_id": "d3", "out_spans": [{"kind": "text", "text": "no source, no links"}]},
    ]
    ds = ray.data.from_items(rows)
    edges = extract_link_edges(ds).to_pandas().sort_values("src_doc")
    # self-host link dropped (case-insensitive host), rel/images ignored
    assert list(edges["src_doc"]) == ["d1", "d2"]
    assert list(edges["src_host"]) == ["a.example", "b.example"]
    assert list(edges["dst_host"]) == ["b.example", "hub.example"]


def test_host_pagerank_hub_wins(ray_session):
    import ray.data

    # every spoke host links to the hub; the hub links to one spoke
    rows = []
    for i in range(8):
        rows.append(
            _doc(f"s{i}", f"https://spoke{i}.example/p", ["https://hub.example/h"])
        )
    rows.append(_doc("h", "https://hub.example/h", ["https://spoke0.example/p"]))
    ranks = host_pagerank(ray.data.from_items(rows).repartition(3))
    assert ranks.iloc[0]["host"] == "hub.example"
    # ranks form a probability vector over the 9 hosts
    assert abs(ranks["rank"].sum() - 1.0) < 1e-6
    assert len(ranks) == 9
    # spoke0 (receives the hub's only outlink) beats the other spokes
    spoke_ranks = ranks.set_index("host")["rank"]
    assert spoke_ranks["spoke0.example"] > spoke_ranks["spoke1.example"]


def test_host_pagerank_on_real_extraction(ray_session):
    """The composition runs over the actual flagship extraction output
    (synthetic sf0.001 corpus) without errors and yields hosts."""
    import importlib.util
    import os

    import ray.data

    spec = importlib.util.spec_from_file_location(
        "__ray_entry__",
        os.path.join(os.path.dirname(__file__), "..", "__ray_entry__.py"),
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    from fetch_engines_ray.pipelines.extract import PipelineConfig, extract_corpus

    corpus = m._synth_corpus("/root/testdata/sf0.001")
    ds = extract_corpus(corpus, PipelineConfig(batch_size=16, concurrency=(1, 2)))
    edges = extract_link_edges(ds)
    n = edges.count()
    if n == 0:  # corpus has no cross-host markdown links: still a pass
        return
    ranks = host_pagerank(ds)
    assert (ranks["rank"] >= 0).all()
    assert abs(ranks["rank"].sum() - 1.0) < 1e-6


def test_sample_by_host_rank_prefers_authority(ray_session):
    """Rank-weighted sampling: docs on the hub host dominate the draw;
    docs with no Source line carry weight 0 and never appear while
    positive-weight docs remain; the draw is seed-stable."""
    import ray.data

    from fetch_engines_ray.ops.linkgraph import sample_by_host_rank

    rows = []
    # 8 spoke hosts each link to the hub; the hub hosts 10 docs
    for i in range(8):
        rows.append(
            _doc(f"s{i}", f"https://spoke{i}.example/p", ["https://hub.example/h"])
        )
    for j in range(10):
        rows.append(
            _doc(f"h{j}", f"https://hub.example/h{j}", ["https://spoke0.example/p"])
        )
    rows.append({"doc_id": "orphan", "out_spans": [{"kind": "text", "text": "no source"}]})

    ds = ray.data.from_items(rows).repartition(3)
    got = sample_by_host_rank(ds, k=6, seed=1).to_pandas()
    assert len(got) == 6
    ids = set(got["doc_id"])
    assert "orphan" not in ids
    hub_share = sum(1 for i in ids if i.startswith("h"))
    assert hub_share >= 4  # authority host dominates the draw
    again = sample_by_host_rank(ds.repartition(5), k=6, seed=1).to_pandas()
    assert set(again["doc_id"]) == ids  # partitioning- and seed-stable


def test_host_pagerank_empty_link_graph(ray_session):
    """A corpus with no markdown links must yield an empty (host, rank)
    frame, not a KeyError on Ray's column-less empty frame (review
    finding); sample_by_host_rank also forwards a custom id_col."""
    import pyarrow as pa

    import ray.data
    from fetch_engines_ray.ops.linkgraph import host_pagerank, sample_by_host_rank

    span_t = pa.list_(
        pa.struct(
            [("kind", pa.string()), ("text", pa.string()),
             ("media_ref", pa.string()), ("order", pa.int64())]
        )
    )
    rows = pa.Table.from_pylist(
        [
            {"page_id": 1, "out_spans": [
                {"kind": "text", "text": "plain text, no links", "media_ref": "", "order": 0}]},
            {"page_id": 2, "out_spans": [
                {"kind": "text", "text": "also linkless", "media_ref": "", "order": 0}]},
        ],
        schema=pa.schema([("page_id", pa.int64()), ("out_spans", span_t)]),
    )
    ds = ray.data.from_arrow(rows)
    ranks = host_pagerank(ds, id_col="page_id")
    assert len(ranks) == 0 and list(ranks.columns) == ["host", "rank"]
    sampled = sample_by_host_rank(ds, k=1, id_col="page_id").to_pandas()
    # all hosts unranked → all weights 0 → nothing drawn (the
    # weighted_sample contract: exactly min(k, n_positive_weight))
    assert len(sampled) == 0
