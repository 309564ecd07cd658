"""Deterministic synthetic corpus generator.

Produces the interleaved-document input table from
``BASELINE.json.input_hint``::

    doc_id:   string   (zero-padded, sortable — the range-partition key)
    spans:    list<struct<kind, text, media_ref, offset:int32>>
    archetype, base_url, expected_route   (companion metadata columns)

Span kinds: ``html`` (markup), ``js_shell`` (deterministic hydration
payload a browser render would have produced), ``pdf`` (synthetic layout
stream), ``image``/``video``/``audio`` (opaque media refs).

Archetype mix mirrors the reference's live eval corpus
(/root/reference/src/evals/auto-render-cases.ts:27-187): roughly 60 %
static content pages, 30 % shell/soft-block (warm-routed), 10 %
forum + pdf.  Everything is seeded — same (seed, num_docs) → identical
bytes.
"""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from . import fixtures as fx

SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

INPUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_TYPE)),
        ("archetype", pa.string()),
        ("base_url", pa.string()),
        ("expected_route", pa.string()),
    ]
)

_WORDS = (
    "data engine stream batch shuffle partition cluster worker actor block "
    "schema column arrow vector query plan execute spill memory cache index "
    "document content extract markdown heading paragraph section article "
    "pipeline throughput latency scaling replica checkpoint resume lineage "
    "hash range skew broadcast merge union filter project aggregate sort "
    "design system service product release update feature guide tutorial "
    "install configure deploy monitor measure improve iterate review ship"
).split()

_TOPICS = (
    "Distributed Query Planning", "Streaming Execution Internals",
    "Columnar Storage Layout", "Checkpoint and Resume Semantics",
    "Skew-Aware Partitioning", "Actor Pool Scheduling",
    "Object Store Spilling", "Zero-Copy Batch Transforms",
    "Range Partitioning by Key", "Backpressure in Pipelines",
)


def _sentence(rng: random.Random, lo: int = 8, hi: int = 18) -> str:
    n = rng.randint(lo, hi)
    ws = [rng.choice(_WORDS) for _ in range(n)]
    return (" ".join(ws)).capitalize() + "."


def _paragraph(rng: random.Random, lo: int = 2, hi: int = 6) -> str:
    return " ".join(_sentence(rng) for _ in range(rng.randint(lo, hi)))


def _nav(rng: random.Random) -> str:
    links = "".join(
        f'<a href="/{rng.choice(_WORDS)}/{i}">{rng.choice(_WORDS).capitalize()} {rng.choice(_WORDS)}</a>'
        for i in range(rng.randint(4, 8))
    )
    return f"<nav class=\"site-nav\">{links}</nav>"


def _footer(rng: random.Random) -> str:
    return (
        '<footer class="site-footer"><p>All rights reserved.</p>'
        '<a href="/privacy">Privacy Policy</a><a href="/terms">Terms</a></footer>'
    )


def _cookie_banner() -> str:
    return (
        '<div id="cookie-banner-x" class="cookie-banner"><p>We use cookies.</p>'
        "<button>Accept cookies</button><button>Refuse all</button></div>"
    )


def _content_sections(rng: random.Random, n_sections: int) -> str:
    parts = []
    for i in range(n_sections):
        parts.append(f"<h2>{rng.choice(_TOPICS)}</h2>")
        for _ in range(rng.randint(1, 4)):
            parts.append(f"<p>{_paragraph(rng)}</p>")
        if rng.random() < 0.3:
            items = "".join(f"<li>{_sentence(rng, 4, 9)}</li>" for _ in range(rng.randint(3, 6)))
            parts.append(f"<ul>{items}</ul>")
        if rng.random() < 0.2:
            parts.append(f"<pre><code>pip install {rng.choice(_WORDS)}-{rng.choice(_WORDS)}</code></pre>")
        if rng.random() < 0.15:
            rows = "".join(
                "<tr>" + "".join(f"<td>{rng.choice(_WORDS)}</td>" for _ in range(3)) + "</tr>"
                for _ in range(rng.randint(2, 4))
            )
            parts.append(f"<table><tbody>{rows}</tbody></table>")
    return "".join(parts)


def _static_html(rng: random.Random, title: str, n_sections: int, semantic: bool) -> str:
    body_content = f"<h1>{title}</h1>" + _content_sections(rng, n_sections)
    inner = (
        f"<main><article>{body_content}</article></main>"
        if semantic
        else f'<div class="content-area">{body_content}</div>'
    )
    return (
        f"<html><head><title>{title}</title></head><body>"
        f"{_cookie_banner() if rng.random() < 0.4 else ''}{_nav(rng)}{inner}{_footer(rng)}"
        "</body></html>"
    )


def _shell_html(rng: random.Random) -> str:
    scripts = "".join(f'<script src="/assets/chunk{i}.js"></script>' for i in range(rng.randint(3, 5)))
    return (
        f"<html><head><title></title>{scripts}</head>"
        '<body><div id="root"></div>'
        "<noscript>You need to enable JavaScript to run this app.</noscript></body></html>"
    )


def _softblock_html(rng: random.Random) -> str:
    return (
        "<html><head><title>Just a moment...</title></head><body>"
        '<div class="cf-challenge"><h2>Checking your browser before accessing the site.</h2>'
        f"<p>{_sentence(rng, 6, 10)}</p></div></body></html>"
    )


def _forum_html(rng: random.Random, title: str) -> str:
    comments = "".join(
        f'<div class="comtr"><div class="comment">{_paragraph(rng, 1, 2)}</div></div>'
        for _ in range(rng.randint(3, 10))
    )
    return (
        f'<html><head><title>{title}</title>'
        '<link rel="canonical" href="https://news.ycombinator.com/item?id=1"></head><body>'
        f"<header>{_nav(rng)}</header>"
        f'<table class="fatitem"><tr><td class="titleline"><a href="https://example.org/x">{title}</a></td></tr>'
        f'<tr><td class="subtext"><span class="score">{rng.randint(5, 900)} points</span> '
        f"{_sentence(rng, 10, 20)}</td></tr></table>"
        f'<div class="comment-tree">{comments}<footer><a href="/faq">FAQ</a></footer></div>'
        "</body></html>"
    )


def _pdf_layout(rng: random.Random, title: str) -> str:
    lines = [f"h1\t{title}"]
    for _ in range(rng.randint(2, 6)):
        lines.append(f"h2\t{rng.choice(_TOPICS)}")
        for _ in range(rng.randint(1, 3)):
            lines.append(f"p\t{_paragraph(rng, 1, 3)}")
        if rng.random() < 0.3:
            lines.append("table\t" + ";".join("|".join(rng.choice(_WORDS) for _ in range(3)) for _ in range(3)))
    return "\n".join(lines)


def _maybe_media_spans(rng: random.Random, doc_id: str, offset: int) -> list[dict]:
    out = []
    n = rng.choices((0, 1, 2, 3), weights=(55, 25, 12, 8))[0]
    for k in range(n):
        kind = rng.choices(("image", "video", "audio"), weights=(70, 20, 10))[0]
        out.append(
            {
                "kind": kind,
                "text": "",
                "media_ref": f"media://{doc_id}/{offset + k}",
                "offset": offset + k,
            }
        )
    return out


def make_doc(idx: int, seed: int) -> dict:
    rng = random.Random((seed << 20) ^ idx)
    doc_id = f"doc{idx:010d}"
    roll = rng.random()
    title = f"{rng.choice(_TOPICS)} {idx}"
    base_url = f"https://corpus.example.com/{rng.choice(_WORDS)}/{idx}"
    spans: list[dict] = []
    offset = 0

    def add(kind: str, text: str = "", media_ref: str = "") -> None:
        nonlocal offset
        spans.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": offset})
        offset += 1

    def add_media() -> None:
        nonlocal offset
        for m in _maybe_media_spans(rng, doc_id, offset):
            spans.append(m)
            offset += 1

    if roll < 0.60:  # static content page
        archetype = rng.choice(("docs", "government", "knowledge", "marketing", "commerce", "static"))
        mega = rng.random() < 0.001
        n_sections = rng.randint(60, 120) if mega else max(1, int(rng.lognormvariate(1.0, 0.8)))
        n_html_spans = rng.randint(1, 3)
        for i in range(n_html_spans):
            semantic = rng.random() < 0.7
            add("html", _static_html(rng, title if i == 0 else f"{title} part {i}", n_sections, semantic))
            add_media()
        expected_route = "fast"
    elif roll < 0.82:  # JS app shell with hydration payload
        archetype = "spa"
        add("html", _shell_html(rng))
        payload = f"<main><h1>{title}</h1>" + _content_sections(rng, rng.randint(1, 4)) + "</main>"
        add("js_shell", payload)
        add_media()
        expected_route = "warm"
    elif roll < 0.90:  # soft-block / access-guarded
        archetype = "access-guarded"
        add("html", _softblock_html(rng))
        if rng.random() < 0.5:  # content behind the challenge
            add("js_shell", f"<main><h1>{title}</h1>" + _content_sections(rng, 2) + "</main>")
        expected_route = "warm"
    elif roll < 0.95:  # forum
        archetype = "forum"
        add("html", _forum_html(rng, title))
        expected_route = "fast"
    else:  # pdf
        archetype = "pdf"
        add("pdf", _pdf_layout(rng, title), f"pdf://{doc_id}")
        add_media()
        expected_route = "warm"

    return {
        "doc_id": doc_id,
        "spans": spans,
        "archetype": archetype,
        "base_url": base_url,
        "expected_route": expected_route,
    }


def fixture_docs() -> list[dict]:
    """The golden conformance fixtures (FIXTURES.md F01-F26) as corpus rows."""
    items: list[tuple[str, str, str, str]] = [
        # (fixture_id, html, base_url, expected_route)
        ("F01", fx.F01_TABLE, "", "fast"),
        ("F02", fx.F02_COOKIE_NAV_MAIN, "", "fast"),
        ("F03", fx.F03_NESTED_NAV_FOOTER, "", "fast"),
        ("F04", fx.F04_RELATIVE_URLS, fx.F04_BASE_URL, "fast"),
        ("F05", fx.F05_BUTTONS, "", "fast"),
        ("F06", fx.F06_DENSE_LINKS, "https://example.com/products/x", "fast"),
        ("F07", fx.F07_HEADING_LINKS, "https://example.com/", "fast"),
        ("F08", fx.F08_DOCS_SIDEBAR, "", "fast"),
        ("F09", fx.F09_DOCS_SHARED_CONTAINER, "", "fast"),
        ("F10", fx.F10_APP_SHELL, "", "warm"),
        ("F11", fx.F11_CONTENT_RICH, "", "fast"),
        ("F12", fx.F12_CLOUDFLARE, "", "warm"),
        ("F13", fx.F13_CAPTCHA, "", "warm"),
        ("F14", fx.F14_ACCESS_DENIED, "", "warm"),
        ("F15", fx.F15_TURNSTILE, "", "warm"),
        ("F16", fx.F16_GENUINE_DOCS, "", "fast"),
        ("F17", fx.F17_PAYWALL_MENTION, "", "fast"),
        ("F17B", fx.F17B_METERED_PAYWALL, "", "fast"),
        ("F18", fx.F18_FORUM, "", "fast"),
        ("F19", fx.F19_BREADCRUMB_SVG, "", "fast"),
        ("F20", fx.F20_NO_H1, "", "fast"),
        ("F25", fx.F25_REPEATED_LINES, "", "fast"),
        ("F26", fx.F26_CODE_FENCES, "", "fast"),
        ("F27", fx.F27_NESTED_LISTS, "", "fast"),
        ("F28", fx.F28_BLOCKQUOTE, "", "fast"),
        ("F29", fx.F29_TH_TABLE, "", "fast"),
        ("F30", fx.F30_INLINE_FORMATTING, "", "fast"),
        ("F31", fx.F31_ENTITIES, "", "fast"),
        ("F32", fx.F32_LINE_BREAKS, "", "fast"),
        ("F33", fx.F33_FIGURE, "", "fast"),
        ("F34", fx.F34_DEFINITION_LIST, "", "fast"),
        ("F35", fx.F35_NESTED_BLOCKQUOTE, "", "fast"),
    ]
    from ..functions import render_detection as rd

    rows = []
    for fid, html, base_url, _route in items:
        # expected_route is classifier-derived: bare HTML fragments without a
        # <title> legitimately score as render-suspect (C4), exactly as the
        # reference would route them (HybridEngine.ts:58-66).
        route = (
            "warm"
            if rd.is_soft_block_page(html) or rd.assess_html_render_need(html).render_likely_needed
            else "fast"
        )
        rows.append(
            {
                "doc_id": f"fixture-{fid}",
                "spans": [{"kind": "html", "text": html, "media_ref": "", "offset": 0}],
                "archetype": "fixture",
                "base_url": base_url,
                "expected_route": route,
            }
        )
    # F21: interleaved media document
    rng = random.Random(21)
    rows.append(
        {
            "doc_id": "fixture-F21",
            "spans": [
                {"kind": "html", "text": "<main><h1>Interleaved</h1><p>First html block with enough text to extract meaningfully here.</p></main>", "media_ref": "", "offset": 0},
                {"kind": "image", "text": "", "media_ref": "media://fixture-F21/1", "offset": 1},
                {"kind": "html", "text": "<main><p>Second html block follows the image span in strict order.</p></main>", "media_ref": "", "offset": 2},
                {"kind": "video", "text": "", "media_ref": "media://fixture-F21/3", "offset": 3},
                {"kind": "html", "text": "<main><p>Third html block closes the interleaved document.</p></main>", "media_ref": "", "offset": 4},
            ],
            "archetype": "fixture",
            "base_url": "https://example.com/interleaved",
            "expected_route": "warm",  # classifier-derived: short titleless fragments
        }
    )
    # F22: mega page
    mega_rng = random.Random(22)
    rows.append(
        {
            "doc_id": "fixture-F22",
            "spans": [
                {
                    "kind": "html",
                    "text": _static_html(mega_rng, "Mega Page", 150, True),
                    "media_ref": "",
                    "offset": 0,
                }
            ]
            + [
                {"kind": "image", "text": "", "media_ref": f"media://fixture-F22/{i}", "offset": i}
                for i in range(1, 9)
            ],
            "archetype": "fixture",
            "base_url": "",
            "expected_route": "fast",
        }
    )
    # F23: js-shell with deterministic hydration payload
    rows.append(
        {
            "doc_id": "fixture-F23",
            "spans": [
                {"kind": "html", "text": fx.F10_APP_SHELL, "media_ref": "", "offset": 0},
                {
                    "kind": "js_shell",
                    "text": "<main><h1>Hydrated Application</h1><p>Content produced by the deterministic hydration payload, long enough to win the best-of comparison against the empty shell baseline extraction result.</p></main>",
                    "media_ref": "",
                    "offset": 1,
                },
            ],
            "archetype": "fixture",
            "base_url": "",
            "expected_route": "warm",
        }
    )
    # F24: pdf-routed document
    rows.append(
        {
            "doc_id": "fixture-F24",
            "spans": [
                {
                    "kind": "pdf",
                    "text": "h1\tQuarterly Layout Report\np\tOpening summary paragraph of the synthetic document.\nh2\tResults\nli\tFirst finding\nli\tSecond finding\ntable\ta|b|c;1|2|3",
                    "media_ref": "pdf://fixture-F24",
                    "offset": 0,
                }
            ],
            "archetype": "fixture",
            "base_url": "",
            "expected_route": "warm",
        }
    )
    # F26: truncation doc is exercised at the operator level (max_content_length)
    return rows


def generate_corpus(
    out_dir: str,
    num_docs: int,
    seed: int = 42,
    include_fixtures: bool = True,
    rows_per_file: int = 2000,
) -> str:
    """Write the corpus as a directory of parquet part files."""
    os.makedirs(out_dir, exist_ok=True)
    rows: list[dict] = fixture_docs() if include_fixtures else []
    part = 0
    written = 0
    i = 0
    while written < num_docs or rows:
        while written < num_docs and len(rows) < rows_per_file:
            rows.append(make_doc(i, seed))
            i += 1
            written += 1
        chunk, rows = rows[:rows_per_file], rows[rows_per_file:]
        if not chunk:
            break
        table = pa.Table.from_pylist(chunk, schema=INPUT_SCHEMA)
        pq.write_table(table, os.path.join(out_dir, f"part-{part:05d}.parquet"))
        part += 1
    return out_dir
