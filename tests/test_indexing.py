"""Global row indexing (ops/indexing.py zip_with_index)."""
import numpy as np
import pandas as pd
import pyarrow as pa

from fetch_engines_ray.ops.indexing import zip_with_index


def test_zip_with_index_after_sort(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(100, dtype="int64"),
            "v": rng.integers(0, 1000, 100).astype("int64"),
        }
    )
    ds = ray.data.from_pandas(df).repartition(7).sort("v")
    out = zip_with_index(ds).to_pandas()
    assert list(out["row_index"]) == list(range(100))
    # index order agrees with the sort order
    assert out["v"].is_monotonic_increasing
    # same multiset of rows, nothing dropped or duplicated
    assert sorted(out["doc_id"]) == list(range(100))


def test_zip_with_index_contiguous_across_blocks(ray_session):
    import ray.data

    ds = ray.data.range(57).repartition(9)
    out = zip_with_index(ds, index_col="idx").to_pandas()
    assert sorted(out["idx"]) == list(range(57))


def test_zip_with_index_empty(ray_session):
    import ray.data

    empty = ray.data.from_arrow(
        pa.table({"a": pa.array([], type=pa.int64())})
    ).filter(lambda r: False)
    out = zip_with_index(empty)
    assert out.count() == 0
    sch = out.schema()
    assert "row_index" in sch.names


def test_zip_with_index_refuses_existing_column(ray_session):
    """Re-indexing a dataset that already carries the index column must
    raise, not append an ambiguous duplicate column (review finding)."""
    import pandas as pd
    import pytest

    import ray.data
    from fetch_engines_ray.ops.indexing import zip_with_index

    ds = zip_with_index(
        ray.data.from_pandas(pd.DataFrame({"doc_id": range(5)}))
    )
    with pytest.raises(ValueError, match="already exists"):
        zip_with_index(ds)
