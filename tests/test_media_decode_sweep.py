"""Every-sweep media-decode assertions over extraction output — moved
verbatim from the retired ``media_decode`` registry slot (round 5; the
slot made room for the SQL-oracled ``neardup_cluster_verdicts``).

ALL image/audio/video spans of the synthetic extraction corpus must
decode ``decode_status="real"`` (the PNG / RIFF-PCM / GIF-LZW / JPEG
codecs actually parsed the planted payloads — a silent fallback to
``decode_error`` fails here), and the framed audio-feature path must
produce real per-frame DSP features over the same spans.
"""
import pytest


@pytest.fixture(scope="module")
def extracted(ray_session, tmp_path_factory):
    from fetch_engines_ray.corpus.generate import generate_corpus
    from fetch_engines_ray.pipelines.extract import extract_corpus

    path = str(tmp_path_factory.mktemp("mdsweep") / "corpus")
    generate_corpus(path, num_docs=120, seed=42, rows_per_file=60)
    return extract_corpus(path).materialize()


def test_media_decode_all_real(extracted, ray_session):
    from fetch_engines_ray.ops.multimodal import (
        decode_media,
        extract_audio_features,
        media_spans_dataset,
    )

    spans = media_spans_dataset(extracted)
    decoded = decode_media(spans, concurrency=2)
    out = decoded.to_pandas()
    img = out[out["kind"] == "image"]
    assert len(img) > 0 and (img["decode_status"] == "real").all(), (
        img["decode_status"].value_counts().to_dict()
    )
    assert (img["width"] > 0).all() and (img["height"] > 0).all()
    aud = out[out["kind"] == "audio"]
    assert len(aud) > 0 and (aud["decode_status"] == "real").all()
    assert (aud["duration_ms"] > 0).all()
    vid = out[out["kind"] == "video"]
    assert len(vid) > 0 and (vid["decode_status"] == "real").all(), (
        vid["decode_status"].value_counts().to_dict()
    )
    assert (vid["width"] > 0).all() and (vid["height"] > 0).all()
    assert (vid["duration_ms"] > 0).all()
    feats = extract_audio_features(decoded).to_pandas()
    assert len(feats) > 0 and (feats["feature_status"] == "real").all(), (
        feats["feature_status"].value_counts().to_dict()
    )
    assert (feats["n_frames"] > 0).all()
