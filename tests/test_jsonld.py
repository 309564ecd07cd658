"""JSON-LD extraction: entity expansion, wrapper tolerance, malformed
skip, and the corpus-level stage."""

import json

import pyarrow as pa
import pytest

import ray.data

from fetch_engines_ray.ops.jsonld import extract_jsonld_blocks, jsonld_extract

ARTICLE = {
    "@context": "https://schema.org",
    "@type": "Article",
    "headline": "A Story",
    "author": {"@type": "Person", "name": "Ada"},
}
GRAPH = {
    "@context": "https://schema.org",
    "@graph": [
        {"@type": "Organization", "name": "Acme"},
        {"@type": "WebSite", "name": "Acme Site"},
        "not-an-entity",
    ],
}


def _page(*scripts, extra=""):
    blocks = "".join(
        f'<script type="application/ld+json">{s}</script>' for s in scripts
    )
    return f"<html><head>{blocks}{extra}</head><body><p>hi</p></body></html>"


def test_single_entity_and_headline_name():
    ents = extract_jsonld_blocks(_page(json.dumps(ARTICLE)))
    assert len(ents) == 1
    e = ents[0]
    assert e["jsonld_type"] == "Article"
    assert e["name"] == "A Story"  # headline fallback
    assert json.loads(e["payload_json"])["author"]["name"] == "Ada"


def test_graph_and_list_expansion():
    ents = extract_jsonld_blocks(
        _page(json.dumps(GRAPH), json.dumps([ARTICLE, {"@type": "FAQPage"}]))
    )
    kinds = [(e["block_idx"], e["entity_idx"], e["jsonld_type"]) for e in ents]
    assert kinds == [
        (0, 0, "Organization"),
        (0, 1, "WebSite"),
        (1, 0, "Article"),
        (1, 1, "FAQPage"),
    ]


def test_wrappers_junk_and_type_variants():
    wrapped = "<!--\n" + json.dumps(ARTICLE) + "\n-->"
    cdata = "<![CDATA[" + json.dumps({"@type": ["Product", "Thing"], "name": "X"}) + "]]>;"
    page = _page(
        wrapped,
        cdata,
        "{broken json",
        extra='<script type="application/json">{"@type":"Ignored"}</script>'
        '<script type="APPLICATION/LD+JSON; charset=utf-8">'
        '{"@type":"Recipe","name":"Pie"}</script>',
    )
    ents = extract_jsonld_blocks(page)
    assert [e["jsonld_type"] for e in ents] == ["Article", "Product,Thing", "Recipe"]
    assert extract_jsonld_blocks("<html><body>none</body></html>") == []


def test_jsonld_extract_stage(ray_session):
    tbl = pa.table(
        {
            "doc_id": ["a", "b", "c"],
            "spans": [
                [{"kind": "html", "text": _page(json.dumps(ARTICLE)), "media_ref": "", "offset": 0}],
                [
                    {"kind": "text", "text": "plain", "media_ref": "", "offset": 0},
                    {"kind": "html", "text": _page(json.dumps(GRAPH)), "media_ref": "", "offset": 1},
                ],
                [{"kind": "html", "text": "<html><body>no metadata</body></html>", "media_ref": "", "offset": 0}],
            ],
        }
    )
    out = jsonld_extract(ray.data.from_arrow(tbl)).to_pandas()
    assert sorted(out["doc_id"].unique()) == ["a", "b"]
    assert set(out.loc[out["doc_id"] == "b", "jsonld_type"]) == {"Organization", "WebSite"}
    assert len(out) == 3
