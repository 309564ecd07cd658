"""URL ops: canonicalization closed forms, registered-domain rules,
domain rollup, and broadcast blocklist filtering."""

import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from fetch_engines_ray.ops.urlops import (
    add_url_columns,
    canonicalize_url,
    domain_doc_counts,
    filter_blocked_domains,
    registered_domain,
)


@pytest.mark.parametrize(
    "raw,canon",
    [
        ("HTTP://Example.COM:80/Path?b=2&a=1#frag", "http://example.com/Path?a=1&b=2"),
        ("https://example.com:443/", "https://example.com/"),
        ("https://example.com:8443/x", "https://example.com:8443/x"),
        (
            "https://shop.example.com/p?utm_source=nl&utm_medium=email&id=7&fbclid=xyz",
            "https://shop.example.com/p?id=7",
        ),
        ("https://example.com", "https://example.com/"),
        ("https://example.com/a?x=", "https://example.com/a?x="),
        ("not a url at all", "not a url at all"),
    ],
)
def test_canonicalize_url(raw, canon):
    assert canonicalize_url(raw) == canon
    assert canonicalize_url(canon) == canon  # idempotent


@pytest.mark.parametrize(
    "host,dom",
    [
        ("www.news.example.co.uk", "example.co.uk"),
        ("https://a.b.example.com/x", "example.com"),
        ("example.com", "example.com"),
        ("localhost", "localhost"),
        ("user@sub.site.com.au:8080", "site.com.au"),
        ("deep.sub.domain.example.org", "example.org"),
    ],
)
def test_registered_domain(host, dom):
    assert registered_domain(host) == dom


URLS = [
    "https://a.example.com/1?utm_source=x",
    "https://a.example.com/1",                 # same canonical as above
    "https://b.example.com/2",
    "https://Sub.Other.co.uk/x#f",
    "https://spam.bad-site.com/buy",
    "https://bad-site.com/buy2",
]


@pytest.fixture()
def url_ds(ray_session):
    tbl = pa.table(
        {"doc_id": [f"d{i}" for i in range(len(URLS))], "base_url": URLS}
    )
    return ray.data.from_arrow(tbl).repartition(3)


def test_add_url_columns_and_rollup(url_ds):
    out = add_url_columns(url_ds).to_pandas().set_index("doc_id")
    assert out.loc["d0", "canonical_url"] == out.loc["d1", "canonical_url"]
    assert out.loc["d3", "domain"] == "other.co.uk"

    stats = domain_doc_counts(url_ds).to_pandas().set_index("domain")
    assert stats.loc["example.com", "n_docs"] == 3
    assert stats.loc["example.com", "n_distinct_urls"] == 2  # d0/d1 collapse
    assert stats.loc["bad-site.com", "n_docs"] == 2
    assert stats["n_docs"].sum() == len(URLS)


def test_filter_blocked_domains(url_ds):
    kept = filter_blocked_domains(url_ds, ["bad-site.com"]).to_pandas()
    assert sorted(kept["doc_id"]) == ["d0", "d1", "d2", "d3"]
    # blocklist entries given as full URLs or subdomains also match
    kept2 = filter_blocked_domains(url_ds, ["https://x.bad-site.com/y"]).to_pandas()
    assert sorted(kept2["doc_id"]) == ["d0", "d1", "d2", "d3"]


def test_filter_blocklist_precomputed_domain_col(url_ds):
    from fetch_engines_ray.ops.urlops import add_url_columns

    with_cols = add_url_columns(url_ds)
    kept = filter_blocked_domains(
        with_cols, ["bad-site.com"], domain_col="domain"
    ).to_pandas()
    assert sorted(kept["doc_id"]) == ["d0", "d1", "d2", "d3"]


def test_induce_domain_blocklist(ray_session):
    """Per-domain quality rollup is exact, the min_docs gate protects
    small domains, and the induced list composes with
    filter_blocked_domains."""
    import pandas as pd

    import ray.data

    from fetch_engines_ray.ops.urlops import (
        domain_quality,
        filter_blocked_domains,
        induce_domain_blocklist,
    )

    rows = []
    for i in range(20):  # good.com: 20 docs, mean 0.9
        rows.append({"doc_id": i, "base_url": f"https://good.com/p{i}", "quality_score": 0.9})
    for i in range(20, 35):  # spam.net: 15 docs, mean 0.1 -> blocked
        rows.append({"doc_id": i, "base_url": f"http://www.spam.net/x{i}", "quality_score": 0.1})
    for i in range(35, 38):  # tiny.org: 3 low-score docs -> under min_docs
        rows.append({"doc_id": i, "base_url": f"https://tiny.org/{i}", "quality_score": 0.0})
    ds = ray.data.from_pandas(pd.DataFrame(rows))

    dq = domain_quality(ds).to_pandas().set_index("domain")
    assert dq.loc["good.com", "n_docs"] == 20
    assert abs(dq.loc["spam.net", "mean_score"] - 0.1) < 1e-12
    assert dq.loc["tiny.org", "n_docs"] == 3

    blocked = induce_domain_blocklist(ds, max_mean_score=0.2, min_docs=10).to_pandas()
    assert sorted(blocked["domain"]) == ["spam.net"]

    kept = filter_blocked_domains(ds, blocked["domain"].tolist()).to_pandas()
    assert len(kept) == 23  # 20 good + 3 tiny survive
    assert not kept["base_url"].str.contains("spam.net").any()
