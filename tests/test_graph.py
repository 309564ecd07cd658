"""Distributed PageRank (ops/graph.py): parity with the single-process
power iteration, authority ordering on a hub fixture, dangling-node
mass conservation, and empty/degenerate graphs."""

import numpy as np
import pandas as pd
import pytest


def _hub_graph():
    # 0 is an authority: everyone links to it; 1 links out only; a
    # chain 2->3->4 and a dangling node 9 (no out-links)
    edges = [(i, 0) for i in range(1, 8)]
    edges += [(2, 3), (3, 4), (0, 9)]
    return edges


def _ds(edges):
    import ray.data

    return ray.data.from_pandas(
        pd.DataFrame(edges, columns=["src", "dst"]).astype("int64")
    ).repartition(4)


def test_pagerank_matches_reference(ray_session):
    from fetch_engines_ray.ops.graph import pagerank, pagerank_reference

    edges = _hub_graph()
    got = pagerank(_ds(edges), n_iters=30).sort_values("node").reset_index(drop=True)
    want = pagerank_reference(edges, n_iters=30).sort_values("node").reset_index(drop=True)
    assert got["node"].tolist() == want["node"].tolist()
    assert np.allclose(got["rank"], want["rank"], atol=1e-9)


def test_pagerank_mass_and_order(ray_session):
    from fetch_engines_ray.ops.graph import pagerank

    out = pagerank(_ds(_hub_graph()), n_iters=40)
    assert abs(out["rank"].sum() - 1.0) < 1e-9  # dangling mass conserved
    by = dict(zip(out["node"], out["rank"]))
    # the authority out-ranks everything
    assert by[0] == max(by.values())
    # node 9 (linked only from the authority) out-ranks a mid-chain node
    assert by[9] > by[3] > by[1]


def test_pagerank_larger_random_graph_parity(ray_session):
    from fetch_engines_ray.ops.graph import pagerank, pagerank_reference

    rng = np.random.RandomState(41)
    edges = list({(int(a), int(b)) for a, b in rng.randint(0, 200, size=(3000, 2)) if a != b})
    got = pagerank(_ds(edges), n_iters=25).sort_values("node").reset_index(drop=True)
    want = pagerank_reference(edges, n_iters=25).sort_values("node").reset_index(drop=True)
    assert np.allclose(got["rank"], want["rank"], atol=1e-9)


def test_pagerank_empty_graph(ray_session):
    import ray.data

    from fetch_engines_ray.ops.graph import pagerank

    empty = ray.data.from_pandas(
        pd.DataFrame({"src": pd.Series(dtype="int64"), "dst": pd.Series(dtype="int64")})
    )
    out = pagerank(empty)
    assert out.empty
