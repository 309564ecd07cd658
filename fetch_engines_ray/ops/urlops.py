"""URL operations: canonicalization, registered-domain extraction,
per-domain rollups, and blocklist filtering.

Every crawl curation pipeline dedups and filters by URL before it
dedups by content (the reference normalizes relative links the same
way at convert time, ``src/utils/markdown-converter.ts:190-210`` /
M4); these are the corpus-side counterparts over the ``base_url``
column.  All stages are batch transforms; the only wide op is the
per-domain rollup (one groupby on the registered domain — bounded
cardinality relative to documents).  Blocklists broadcast via
``ray.put`` and filter inside ``map_batches`` — never a join.

Canonicalization is per-row stdlib ``urllib`` (string parsing with
bounded per-row cost; the regex pre-filter skips rows with nothing to
strip is deliberately NOT attempted — correctness first for URLs).
Registered-domain extraction uses an embedded subset of multi-label
public suffixes (no PSL wheel in this environment; the list is a
config constant to swap for the full PSL on a real deployment).
"""

from __future__ import annotations

from typing import Iterable
from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

import pyarrow as pa

import ray
import ray.data

# tracking params dropped at canonicalization (the industry-standard set)
TRACKING_PARAMS = frozenset(
    {
        "fbclid",
        "gclid",
        "msclkid",
        "dclid",
        "igshid",
        "mc_cid",
        "mc_eid",
        "ref",
        "ref_src",
    }
)
TRACKING_PREFIXES = ("utm_",)

# common multi-label public suffixes (swap for the full PSL in prod)
MULTI_LABEL_SUFFIXES = frozenset(
    {
        "co.uk",
        "org.uk",
        "ac.uk",
        "gov.uk",
        "com.au",
        "net.au",
        "org.au",
        "co.jp",
        "ne.jp",
        "or.jp",
        "com.br",
        "com.cn",
        "com.mx",
        "co.in",
        "co.kr",
        "co.za",
        "com.ar",
        "com.tr",
    }
)

_DEFAULT_PORTS = {"http": ":80", "https": ":443"}


def canonicalize_url(url: str) -> str:
    """Deterministic canonical form: lowercase scheme/host, strip
    default port, drop fragment, drop tracking params, sort surviving
    query params, '' path → '/'."""
    try:
        scheme, netloc, path, query, _frag = urlsplit(url.strip())
    except ValueError:
        return url.strip()
    scheme = scheme.lower()
    netloc = netloc.lower()
    default = _DEFAULT_PORTS.get(scheme)
    if default and netloc.endswith(default):
        netloc = netloc[: -len(default)]
    if query:
        kept = [
            (k, v)
            for k, v in parse_qsl(query, keep_blank_values=True)
            if k.lower() not in TRACKING_PARAMS
            and not k.lower().startswith(TRACKING_PREFIXES)
        ]
        query = urlencode(sorted(kept))
    if not path:
        path = "/"
    return urlunsplit((scheme, netloc, path, query, ""))


def registered_domain(host_or_url: str) -> str:
    """``www.news.example.co.uk`` → ``example.co.uk`` (embedded suffix
    subset; unknown TLD structure falls back to the last two labels)."""
    s = host_or_url.strip().lower()
    if "//" in s or s.startswith(("http:", "https:")):
        s = urlsplit(s).netloc
    s = s.split("@")[-1].split(":")[0]
    labels = [l for l in s.split(".") if l]
    if len(labels) <= 2:
        return ".".join(labels)
    if ".".join(labels[-2:]) in MULTI_LABEL_SUFFIXES:
        return ".".join(labels[-3:])
    return ".".join(labels[-2:])


def add_url_columns(
    ds: "ray.data.Dataset", url_col: str = "base_url"
) -> "ray.data.Dataset":
    """Append ``canonical_url`` + ``domain`` columns."""

    def add(batch: pa.Table) -> pa.Table:
        urls = batch[url_col].to_pylist()
        canon = [canonicalize_url(u or "") for u in urls]
        batch = batch.append_column("canonical_url", pa.array(canon, type=pa.string()))
        return batch.append_column(
            "domain", pa.array([registered_domain(u) for u in canon], type=pa.string())
        )

    return ds.map_batches(add, batch_format="pyarrow", batch_size=8192)


def domain_doc_counts(
    ds: "ray.data.Dataset", url_col: str = "base_url"
) -> "ray.data.Dataset":
    """(domain, n_docs, n_distinct_urls) — the crawl-health rollup.

    ONE shuffle on the domain key; each group is one domain's URL list
    and both stats come out of a single vectorized pandas pass.
    Hot-domain caveat: a domain with O(corpus) documents makes one
    giant group — salt the key or pre-cap per-domain docs upstream at
    crawl scale (same caveat as the tfidf df attach, documented
    there)."""
    with_urls = add_url_columns(ds, url_col)

    def project(batch: pa.Table) -> pa.Table:
        return batch.select(["domain", "canonical_url"])

    pairs = with_urls.map_batches(project, batch_format="pyarrow", batch_size=8192)

    def per_domain(batch: pa.Table) -> pa.Table:
        import pandas as pd

        df = batch.to_pandas()
        g = df.groupby("domain")["canonical_url"].agg(["size", "nunique"]).reset_index()
        return pa.table(
            {
                "domain": pa.array(g["domain"], type=pa.string()),
                "n_docs": pa.array(g["size"], type=pa.int64()),
                "n_distinct_urls": pa.array(g["nunique"], type=pa.int64()),
            }
        )

    return pairs.groupby("domain").map_groups(per_domain, batch_format="pyarrow")


def domain_quality(
    ds: "ray.data.Dataset",
    score_col: str = "quality_score",
    url_col: str = "base_url",
    domain_col: str | None = None,
) -> "ray.data.Dataset":
    """(domain, n_docs, mean_score) — per-domain quality rollup.

    Scale shape: each batch PRE-AGGREGATES to (domain, count, sum)
    partials before the shuffle (hot domains collapse inside every
    block, so the exchange carries domain-cardinality rows, not
    doc-cardinality), then one small ``groupby().sum`` over the
    partials and a vectorized mean."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        if domain_col is not None:
            domains = batch[domain_col].to_pylist()
        else:
            domains = [
                registered_domain(canonicalize_url(u or ""))
                for u in batch[url_col].to_pylist()
            ]
        df = pd.DataFrame(
            {"domain": domains, "s": batch[score_col].to_numpy(zero_copy_only=False)}
        )
        g = df.groupby("domain")["s"].agg(["size", "sum"]).reset_index()
        return pa.table(
            {
                "domain": pa.array(g["domain"], type=pa.string()),
                "n": pa.array(g["size"], type=pa.int64()),
                "s": pa.array(g["sum"], type=pa.float64()),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=8192)
        .groupby("domain")
        .aggregate(Sum("n", alias_name="n_docs"), Sum("s", alias_name="s"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        mean = pc.divide(
            pc.cast(batch["s"], pa.float64()), pc.cast(batch["n_docs"], pa.float64())
        )
        return pa.table(
            {
                "domain": batch["domain"],
                "n_docs": batch["n_docs"],
                "mean_score": mean,
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", batch_size=8192)


def induce_domain_blocklist(
    ds: "ray.data.Dataset",
    score_col: str = "quality_score",
    max_mean_score: float = 0.2,
    min_docs: int = 10,
    url_col: str = "base_url",
    domain_col: str | None = None,
) -> "ray.data.Dataset":
    """RefinedWeb-style blocklist induction: domains whose MEAN quality
    score over at least ``min_docs`` documents falls at or below
    ``max_mean_score``.  Returns a (domain, n_docs, mean_score) Dataset
    — blocklist-sized, so feeding it to :func:`filter_blocked_domains`
    (a broadcast) is the intended composition.  The ``min_docs`` gate
    keeps one unlucky page from banning a whole domain."""
    dq = domain_quality(ds, score_col=score_col, url_col=url_col, domain_col=domain_col)
    return dq.filter(
        expr=f"n_docs >= {int(min_docs)} and mean_score <= {float(max_mean_score)}"
    )


def filter_blocked_domains(
    ds: "ray.data.Dataset",
    blocklist: Iterable[str],
    url_col: str = "base_url",
    domain_col: str | None = None,
) -> "ray.data.Dataset":
    """Drop documents whose registered domain is blocklisted.  The
    blocklist broadcasts once via ``ray.put``; no shuffle.  Pass
    ``domain_col`` when :func:`add_url_columns` already ran — the
    filter then is a pure set-membership check instead of re-parsing
    every URL."""
    ref = ray.put(frozenset(registered_domain(d) for d in blocklist))

    def keep(batch: pa.Table) -> pa.Table:
        blocked = ray.get(ref)
        if domain_col is not None:
            domains = batch[domain_col].to_pylist()
        else:
            domains = [
                registered_domain(canonicalize_url(u or ""))
                for u in batch[url_col].to_pylist()
            ]
        return batch.filter(pa.array([d not in blocked for d in domains]))

    return ds.map_batches(keep, batch_format="pyarrow", batch_size=8192)
