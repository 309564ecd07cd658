"""Schema-driven structured extraction (A9 analog): validation contract
mirrors reference StructuredContentEngine.ts:117-158, extraction yields
typed columns with defaults on non-match."""

import pyarrow as pa
import pytest


def test_validate_schema_rejects_missing_descriptions():
    from fetch_engines_ray.stages.structured import FieldSpec, validate_schema

    with pytest.raises(ValueError, match="descriptions.*price"):
        validate_schema(
            [
                FieldSpec(name="title", description="doc title", pattern=r"(?P<v>.+)"),
                FieldSpec(name="price", description="", pattern=r"(?P<v>\d+)"),
            ]
        )
    with pytest.raises(ValueError, match="named capture group"):
        validate_schema(
            [FieldSpec(name="t", description="d", pattern=r"(\d+)")]
        )
    with pytest.raises(ValueError, match="at least one field"):
        validate_schema([])


def test_structured_extract_typed_fields(ray_session):
    import ray.data

    from fetch_engines_ray.stages.structured import FieldSpec, structured_extract

    ds = ray.data.from_items(
        [
            {"doc_id": "a", "text": "Price: 42 dollars for the widget"},
            {"doc_id": "b", "text": "no numerals in here at all"},
        ]
    )
    fields = [
        FieldSpec(
            name="price",
            description="first integer",
            pattern=r"(?P<v>\d+)",
            dtype=pa.int64(),
            default=-1,
        ),
        FieldSpec(
            name="after_the",
            description="word after 'the'",
            pattern=r"\bthe\s+(?P<v>\w+)",
            default="",
        ),
    ]
    rows = {r["doc_id"]: r for r in structured_extract(ds, fields).take_all()}
    assert rows["a"]["price"] == 42 and rows["a"]["after_the"] == "widget"
    assert rows["b"]["price"] == -1 and rows["b"]["after_the"] == ""
