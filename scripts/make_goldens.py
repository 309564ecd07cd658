"""Regenerate the golden span-equality fixtures.

Run after a DELIBERATE behavior change to the converter chain, then
review the diff:  ``python scripts/make_goldens.py``

The goldens pin per-document span-sequence equality on
``(kind, text, media_ref, order)`` — the north-rule invariant.  The
conformance suite (tests/test_converter_conformance.py) independently
validates the behavior with reference-derived contain/not-contain
assertions, so a golden regression cannot silently encode a wrong
extraction.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyarrow as pa

from fetch_engines_ray.corpus.generate import INPUT_SCHEMA, fixture_docs, make_doc
from fetch_engines_ray.stages.extract import DocumentExtractor

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens", "fixture_goldens.json")


def main() -> None:
    # fixtures + a deterministic slice of filler docs (seed 42)
    rows = fixture_docs() + [make_doc(i, 42) for i in range(50)]
    table = pa.Table.from_pylist(rows, schema=INPUT_SCHEMA)
    out = DocumentExtractor()(table)
    goldens = {}
    for r in out.to_pylist():
        goldens[r["doc_id"]] = {
            "out_spans": [
                {"kind": s["kind"], "text": s["text"], "media_ref": s["media_ref"], "order": s["order"]}
                for s in r["out_spans"]
            ],
            "title": r["title"],
            "route": r["route"],
        }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(goldens, f, indent=1, ensure_ascii=False, sort_keys=True)
    print(f"wrote {len(goldens)} goldens to {OUT}")


if __name__ == "__main__":
    main()
