"""Audio/video perceptual fingerprints (ops/mediahash.py): exact-integer
band energies, gain invariance, palette-permutation invariance, and the
end-to-end Ray near-dup sweeps with planted clones."""

import numpy as np
import pytest

from fetch_engines_ray.ops.gif import encode_gif, planted_frames, planted_palette
from fetch_engines_ray.ops.mediahash import (
    audio_fingerprint64,
    audio_near_dup_pairs,
    band_energy_matrix,
    video_fingerprint64,
    video_near_dup_pairs,
)
from fetch_engines_ray.ops.wav import decode_wav, encode_wav

RATE = 8000


def _tone(key: int, n: int = 4000, amp_mod: int = 8000) -> np.ndarray:
    i = np.arange(n, dtype=np.int64)
    return (((7 * i * i + 13 * i + key) % (2 * amp_mod)) - amp_mod).astype(np.int16)


def _clip(key: int, n: int = 4000) -> np.ndarray:
    """Key-distinct test audio: white noise with a per-segment gain
    envelope, so each key has its own time-energy landscape (the
    quadratic `_tone` pattern has near-identical band structure across
    keys and is only useful for exactness tests)."""
    rng = np.random.RandomState(key)
    seg = np.repeat(rng.randint(1, 16, size=8), n // 8 + 1)[:n]
    base = rng.randint(-500, 500, size=n)
    return (base * seg).astype(np.int16)  # |max| 7500: x2 gain stays in int16


def test_band_energy_matrix_exact_integer():
    s = np.array([1, -2, 3, -4] * 100, dtype=np.int16)
    e = band_energy_matrix(s, RATE, n_bands=4, frame_length_ms=25, hop_ms=10)
    flen = RATE * 25 // 1000  # 200
    assert e.shape == (3, 4)
    # first frame, first band = exact sum of squares of samples 0..49
    expect = int((s[:50].astype(np.int64) ** 2).sum())
    assert e[0, 0] == expect
    assert e.dtype == np.int64


def test_band_energy_stereo_mixdown():
    mono = _tone(5, n=1000)
    stereo = np.stack([mono, mono], axis=1)
    e_mono2 = band_energy_matrix(mono.astype(np.int64) * 2, RATE)
    e_stereo = band_energy_matrix(stereo, RATE)
    assert np.array_equal(e_mono2, e_stereo)


def test_audio_fingerprint_gain_invariant():
    s = _clip(11)
    assert audio_fingerprint64(s, RATE) == audio_fingerprint64(
        (s.astype(np.int64) * 2).astype(np.int16), RATE
    )
    assert audio_fingerprint64(s, RATE) == audio_fingerprint64(
        (s.astype(np.int64) * 3).astype(np.int32), RATE
    )


def test_audio_fingerprint_roundtrip_and_separation():
    a, b = _clip(11), _clip(9731)
    fa = audio_fingerprint64(a, RATE)
    dec = decode_wav(encode_wav(a, RATE))
    assert audio_fingerprint64(dec["samples"], dec["sample_rate"]) == fa
    xor = np.uint64(fa) ^ np.uint64(audio_fingerprint64(b, RATE))
    assert bin(int(xor)).count("1") > 3  # distinct content lands far apart


def test_audio_fingerprint_short_clip_is_zero():
    assert audio_fingerprint64(np.zeros(10, dtype=np.int16), RATE) == 0


def test_video_fingerprint_palette_permutation_invariant():
    frames = planted_frames(7)
    palette = planted_palette()
    n = palette.shape[0]
    rng = np.random.RandomState(3)
    perm = rng.permutation(n).astype(np.uint8)
    permuted_palette = np.zeros_like(palette)
    permuted_palette[perm] = palette  # color i now lives at slot perm[i]
    remapped = [perm[f] for f in frames]
    from fetch_engines_ray.ops.gif import decode_gif

    d1 = decode_gif(encode_gif(frames, palette, [10] * len(frames)))
    d2 = decode_gif(encode_gif(remapped, permuted_palette, [10] * len(frames)))
    assert np.array_equal(d1["frames"][0], d2["frames"][0])  # rendered pixels equal
    assert video_fingerprint64(d1["frames"]) == video_fingerprint64(d2["frames"])


def test_video_fingerprint_separates_distinct_animations():
    from fetch_engines_ray.ops.gif import decode_gif, planted_gif

    f1 = video_fingerprint64(decode_gif(planted_gif(3))["frames"])
    f2 = video_fingerprint64(decode_gif(planted_gif(977))["frames"])
    xor = np.uint64(f1) ^ np.uint64(f2)
    assert bin(int(xor)).count("1") > 3


def test_audio_near_dup_pairs_planted(ray_session):
    import ray.data

    base = _clip(42)
    rows = [
        {"doc_id": 1, "payload": encode_wav(base, RATE)},
        {"doc_id": 2, "payload": encode_wav((base.astype(np.int64) * 2).astype(np.int16), RATE)},
    ]
    for i in range(3, 20):
        rows.append({"doc_id": i, "payload": encode_wav(_clip(100 + 37 * i), RATE)})
    pairs = audio_near_dup_pairs(ray.data.from_items(rows))
    got = {(int(a), int(b)) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    assert (1, 2) in got
    assert pairs.loc[(pairs["doc_a"] == 1) & (pairs["doc_b"] == 2), "hamming"].iloc[0] == 0
    assert all(a >= 3 or b <= 2 for a, b in got)  # no planted-vs-filler false positives


def test_video_near_dup_pairs_planted(ray_session):
    import ray.data

    from fetch_engines_ray.ops.gif import planted_gif

    frames = planted_frames(13)
    palette = planted_palette()
    perm = np.roll(np.arange(palette.shape[0]), 5).astype(np.uint8)
    permuted_palette = np.zeros_like(palette)
    permuted_palette[perm] = palette
    rows = [
        {"doc_id": 1, "payload": encode_gif(frames, palette, [10] * len(frames))},
        {"doc_id": 2, "payload": encode_gif([perm[f] for f in frames], permuted_palette,
                                            [10] * len(frames))},
        {"doc_id": 3, "payload": planted_gif(505)},
        {"doc_id": 4, "payload": planted_gif(9091)},
    ]
    pairs = video_near_dup_pairs(ray.data.from_items(rows))
    got = {(int(a), int(b)) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    assert (1, 2) in got
    assert pairs.loc[(pairs["doc_a"] == 1) & (pairs["doc_b"] == 2), "hamming"].iloc[0] == 0


def test_scene_cut_indices_two_scene_video():
    from fetch_engines_ray.ops.mediahash import scene_cut_indices

    a = np.zeros((10, 10), dtype=np.uint8)
    b = np.full((10, 10), 200, dtype=np.uint8)
    assert scene_cut_indices([a, a, a, b, b]) == [0, 3]
    assert scene_cut_indices([a]) == [0]
    assert scene_cut_indices([]) == []
    # small noise below threshold never cuts
    n = a.copy(); n[0, 0] = 30
    assert scene_cut_indices([a, n, a]) == [0]


def test_keyframe_sampler_on_real_gif(ray_session):
    import ray.data

    from fetch_engines_ray.ops.gif import decode_gif, encode_gif
    from fetch_engines_ray.ops.mediahash import sample_keyframes, scene_cut_indices

    # two-scene animated GIF: 3 frames of palette idx 0, 2 of idx 40
    palette = np.stack(
        [np.arange(64, dtype=np.uint8) * 4] * 3, axis=1
    )
    f0 = np.zeros((8, 8), dtype=np.uint8)
    f1 = np.full((8, 8), 40, dtype=np.uint8)
    gif = encode_gif([f0, f0, f0, f1, f1], palette, [10, 10, 10, 20, 20])
    out = sample_keyframes(
        ray.data.from_items([{"media_ref": "v/1", "payload": gif}])
    ).to_pandas()
    assert out["n_scenes"].iloc[0] == 2
    assert out["frame_index"].tolist() == [0, 3]
    assert out["timestamp_ms"].tolist() == [0, 300]  # 3 x 10cs = 300ms
    # detector parity with a direct decode
    dec = decode_gif(gif)
    assert scene_cut_indices(dec["frames"]) == [0, 3]


def test_band_energy_matrix_low_sample_rate_no_crash():
    """Sample rates where hop floors to 0 (e.g. 50 Hz at 25/10 ms
    defaults) must degrade to an empty matrix, not ZeroDivisionError
    (review finding); slab framing stays bit-identical to the full
    matrix on normal input."""
    import numpy as np

    from fetch_engines_ray.ops.mediahash import band_energy_matrix

    assert band_energy_matrix(np.ones(500, dtype=np.int16), 50).shape == (0, 9)
    # slab-vs-reference parity on a clip spanning multiple slabs
    rng = np.random.default_rng(4)
    x = rng.integers(-3000, 3000, size=8000 * 60, dtype=np.int64)
    out = band_energy_matrix(x, 8000)
    flen, hop = 8000 * 25 // 1000, 8000 * 10 // 1000
    n = 1 + (len(x) - flen) // hop
    idx = np.arange(flen)[None, :] + hop * np.arange(n)[:, None]
    bounds = (np.arange(10, dtype=np.int64) * flen) // 9
    want = np.add.reduceat(x[idx] ** 2, bounds[:-1], axis=1)
    assert (out == want).all()


def test_fingerprinters_skip_corrupt_payloads(ray_session):
    """One malformed payload among many must not kill the fingerprint
    sweep: the row skips (no dup evidence → doc kept) instead of the
    FormatError aborting the task (review finding)."""
    import numpy as np

    import ray.data
    from fetch_engines_ray.ops.imagehash import ImageHasher
    from fetch_engines_ray.ops.mediahash import AudioFingerprinter
    from fetch_engines_ray.ops.png import encode_png
    from fetch_engines_ray.ops.wav import encode_wav

    png = encode_png((np.arange(64, dtype=np.uint8).reshape(8, 8)))
    wav = encode_wav(np.zeros(4000, dtype=np.int16), 8000)
    img = ray.data.from_items(
        [
            {"doc_id": 1, "payload": png},
            {"doc_id": 2, "payload": b"corrupt bytes"},
        ]
    ).map_batches(ImageHasher, batch_format="pyarrow", concurrency=1).to_pandas()
    assert img["doc_id"].tolist() == [1]
    aud = ray.data.from_items(
        [
            {"doc_id": 1, "payload": wav},
            {"doc_id": 2, "payload": b"RIFFgarbage"},
        ]
    ).map_batches(AudioFingerprinter, batch_format="pyarrow", concurrency=1).to_pandas()
    assert aud["doc_id"].tolist() == [1]
