"""Caption mining (ops/captions.py) and quality keep-best dedup
(ops/dedup.py::dedup_clusters_keep_best)."""

import pandas as pd
import pytest

from fetch_engines_ray.ops.captions import _clip_head, _clip_tail, mine_caption_pairs
from fetch_engines_ray.ops.dedup import dedup_clusters_keep_best


def _span(kind, text="", media_ref=""):
    return {"kind": kind, "text": text, "media_ref": media_ref}


def _docs_ds():
    import ray.data

    return ray.data.from_items(
        [
            {
                "doc_id": "d1",
                "out_spans": [
                    _span("text", "Intro paragraph before the figure."),
                    _span("image", media_ref="media://d1/1"),
                    _span("text", "Figure 1: the caption right after."),
                    _span("video", media_ref="media://d1/3"),
                ],
            },
            {
                "doc_id": "d2",
                "out_spans": [
                    _span("image", media_ref="media://d2/0"),  # no text at all
                ],
            },
            {
                "doc_id": "d3",
                "out_spans": [
                    _span("text", "Only text, no media."),
                ],
            },
        ]
    )


def test_mine_caption_pairs_adjacency(ray_session):
    out = mine_caption_pairs(_docs_ds()).to_pandas().set_index("media_ref")
    img = out.loc["media://d1/1"]
    assert img["caption_before"] == "Intro paragraph before the figure."
    assert img["caption_after"] == "Figure 1: the caption right after."
    assert img["caption"] == img["caption_after"] and img["caption_source"] == "after"
    vid = out.loc["media://d1/3"]
    # nothing after the trailing video -> falls back to the preceding text
    assert vid["caption"] == "Figure 1: the caption right after."
    assert vid["caption_source"] == "before"
    lonely = out.loc["media://d2/0"]
    assert lonely["caption"] == "" and lonely["caption_source"] == "none"
    assert "d3" not in set(out["doc_id"])  # text-only docs emit nothing


def test_mine_caption_pairs_require_caption(ray_session):
    out = mine_caption_pairs(_docs_ds(), require_caption=True).to_pandas()
    assert "media://d2/0" not in set(out["media_ref"])
    assert len(out) == 2


def test_caption_clipping_word_boundaries():
    text = "alpha beta gamma delta epsilon"
    assert _clip_head(text, 12) == "alpha beta"
    assert _clip_tail(text, 14) == "delta epsilon"
    assert _clip_head("short", 100) == "short"
    assert _clip_tail("  padded  ", 100) == "padded"


def test_mine_caption_pairs_kind_filter(ray_session):
    out = mine_caption_pairs(_docs_ds(), kinds=("image",)).to_pandas()
    assert set(out["kind"]) == {"image"}


def test_dedup_keep_best_prefers_high_score():
    pairs = pd.DataFrame({"doc_a": [1, 2], "doc_b": [2, 3]})  # cluster {1,2,3}
    scores = pd.DataFrame({"doc_id": [1, 2, 3], "score": [0.1, 0.9, 0.5]})
    out = dedup_clusters_keep_best(pairs, scores)
    kept = out[out["is_kept"]]["doc_id"].tolist()
    assert kept == [2]
    assert (out["best_rep"] == 2).all()


def test_dedup_keep_best_tie_breaks_min_id():
    pairs = pd.DataFrame({"doc_a": [10], "doc_b": [11]})
    scores = pd.DataFrame({"doc_id": [10, 11], "score": [0.7, 0.7]})
    out = dedup_clusters_keep_best(pairs, scores)
    assert out[out["is_kept"]]["doc_id"].tolist() == [10]


def test_dedup_keep_best_missing_score_never_wins():
    pairs = pd.DataFrame({"doc_a": [1], "doc_b": [2]})
    scores = pd.DataFrame({"doc_id": [2], "score": [0.0]})  # doc 1 unscored
    out = dedup_clusters_keep_best(pairs, scores)
    assert out[out["is_kept"]]["doc_id"].tolist() == [2]
