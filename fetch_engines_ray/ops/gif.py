"""Pure-Python animated-GIF codec (stdlib ``struct`` only) — the VIDEO
analog of :mod:`ops.png` / :mod:`ops.wav`.

The container has no ffmpeg/PIL, but GIF89a is a self-describing public
format (CompuServe GIF89a specification, 1990) whose LZW entropy coding
is implementable from scratch — so planted video payloads in the
synthetic corpus are genuine multi-frame GIF bytes, and ``decode_gif``
does genuine work: header/logical-screen parse, global color table,
sub-block walking over extensions, per-frame Graphic Control Extension
delays, and a full variable-code-width LZW inflate (clear/EOI codes,
KwKwK case, 12-bit cap with table freeze + reset).

Reference analog: binary content handling in
/root/reference/src/FetchEngine.ts:211-225 (fetchContent returns typed
binary payloads) — here the payload is decoded to typed metadata +
per-frame pixels instead of passed through.

Scope: global color table only, full-logical-screen non-interlaced
frames (exactly what the encoder emits); local color tables, interlace
and partial-frame composition raise ``GifFormatError`` rather than
guessing.  Unknown extensions (application/comment/plain-text) are
tolerated and skipped via their sub-block chains, like PNG ancillary
chunks.

LZW code-width convention (derived, documented for the test suite):
after the decoder ADDS a table entry it bumps the read width when
``next_code >= 1 << width``; the encoder's table runs exactly one entry
ahead of the decoder's (the decoder learns each entry one code later —
that lag is why the KwKwK case exists), so the encoder bumps one add
later, when ``next_code - 1 >= 1 << width``.  The round-trip and
forced-width-growth tests in ``tests/test_gif.py`` pin this pairing.
"""

from __future__ import annotations

import struct
import zlib
from typing import Optional

import numpy as np

from .codecguard import guarded

_HEADER = b"GIF89a"
_MAX_CODE = 4096  # 12-bit LZW cap


class GifFormatError(ValueError):
    """Raised on malformed/unsupported GIF bytes (bad signature,
    truncated stream, local color table, interlace, partial frames,
    corrupt LZW)."""


# ---------------------------------------------------------------------------
# LZW (GIF variant: variable width, LSB-first bit packing)
# ---------------------------------------------------------------------------

def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    acc = 0
    nbits = 0
    out = bytearray()

    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh_table() -> dict:
        return {bytes([i]): i for i in range(clear)}

    table = fresh_table()
    next_code = eoi + 1
    emit(clear)
    cur = b""
    for b in indices:
        nxt = cur + bytes([b])
        if nxt in table:
            cur = nxt
            continue
        emit(table[cur])
        table[nxt] = next_code
        next_code += 1
        # encoder bumps one entry later than the decoder (see module
        # docstring); at the 12-bit cap emit a clear and reset
        if next_code - 1 >= (1 << width):
            if width < 12:
                width += 1
            else:
                emit(clear)
                table = fresh_table()
                next_code = eoi + 1
                width = min_code_size + 1
        cur = bytes([b])
    if cur:
        emit(table[cur])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, expected_len: int) -> bytes:
    if not 2 <= min_code_size <= 8:
        raise GifFormatError(f"bad LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                raise GifFormatError("LZW stream ended without EOI")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise GifFormatError(f"first LZW code {code} undefined")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
        else:
            raise GifFormatError(f"LZW code {code} beyond table ({len(table)})")
        out.extend(entry)
        if prev is not None and len(table) < _MAX_CODE:
            table.append(prev + entry[:1])
            if len(table) >= (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) > expected_len:
            raise GifFormatError(
                f"LZW output {len(out)} exceeds expected {expected_len}"
            )
    if len(out) != expected_len:
        raise GifFormatError(
            f"LZW output {len(out)} != expected {expected_len}"
        )
    return bytes(out)


# ---------------------------------------------------------------------------
# Container encode
# ---------------------------------------------------------------------------

def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


def encode_gif(
    frames: list[np.ndarray],
    palette: np.ndarray,
    delays_cs: list[int],
    loop: int = 0,
) -> bytes:
    """Encode palette-index frames as a valid animated GIF89a.

    ``frames``: list of ``(h, w)`` uint8 arrays of palette indices (all
    the same shape); ``palette``: ``(n, 3)`` uint8 RGB with ``n`` a
    power of two in [4, 256]; ``delays_cs``: per-frame delay in
    centiseconds.  Emits one Graphic Control Extension per frame and a
    Netscape loop extension, so decoders must walk real sub-block
    chains.
    """
    if not frames:
        raise GifFormatError("no frames")
    palette = np.asarray(palette, dtype=np.uint8)
    n_colors = palette.shape[0]
    if palette.ndim != 2 or palette.shape[1] != 3 or n_colors & (n_colors - 1):
        raise GifFormatError("palette must be (2^k, 3) uint8")
    if not 4 <= n_colors <= 256:
        raise GifFormatError("palette size must be in [4, 256]")
    size_field = n_colors.bit_length() - 2  # 2^(size_field+1) == n_colors
    mcs = max(2, n_colors.bit_length() - 1)  # LZW min code size
    h, w = frames[0].shape
    if h == 0 or w == 0:
        raise GifFormatError("empty frame")
    if len(delays_cs) != len(frames):
        raise GifFormatError("one delay per frame required")
    out = bytearray(_HEADER)
    # logical screen descriptor: GCT present, color resolution 8 bits
    out += struct.pack("<HHBBB", w, h, 0x80 | (7 << 4) | size_field, 0, 0)
    out += palette.tobytes()
    # Netscape looping application extension
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01" + struct.pack("<H", loop) + b"\x00"
    for frame, delay in zip(frames, delays_cs):
        frame = np.asarray(frame, dtype=np.uint8)
        if frame.shape != (h, w):
            raise GifFormatError("all frames must match the logical screen")
        if frame.max(initial=0) >= n_colors:
            raise GifFormatError("palette index out of range")
        # graphic control extension: disposal 0, no transparency
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", int(delay)) + b"\x00\x00"
        # image descriptor: full screen, no local table, no interlace
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(mcs)
        out += _sub_blocks(_lzw_encode(frame.tobytes(), mcs))
    out += b"\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# Container decode
# ---------------------------------------------------------------------------

def _read_sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise GifFormatError("truncated sub-block chain")
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(data):
            raise GifFormatError("truncated sub-block")
        out.extend(data[pos : pos + n])
        pos += n


def _parse_gif_container(data: bytes) -> tuple[int, int, np.ndarray, list[tuple[int, bytes, int]]]:
    """Container walk WITHOUT pixel decode: header + logical screen +
    global color table + the block chain, returning ``(w, h, palette,
    frames_raw)`` where each frames_raw entry is ``(min_code_size,
    lzw_bytes, delay_ms)``.  Walking the sub-block chains is cheap; the
    LZW inflate is the expensive part and the caller decides which
    frames pay it (all for :func:`decode_gif`, one for
    :func:`decode_gif_frame`)."""
    if len(data) < 13 or data[:6] not in (b"GIF89a", b"GIF87a"):
        raise GifFormatError("bad GIF signature")
    w, h, packed, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    if w == 0 or h == 0:
        raise GifFormatError("empty logical screen")
    if not packed & 0x80:
        raise GifFormatError("global color table required")
    n_colors = 2 << (packed & 0x07)
    pos = 13
    if pos + 3 * n_colors > len(data):
        raise GifFormatError("truncated global color table")
    palette = (
        np.frombuffer(data[pos : pos + 3 * n_colors], dtype=np.uint8)
        .reshape(n_colors, 3)
        .copy()
    )
    pos += 3 * n_colors
    frames_raw: list[tuple[int, bytes, int]] = []
    pending_delay_cs = 0
    while True:
        if pos >= len(data):
            raise GifFormatError("missing trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise GifFormatError("truncated extension")
            label = data[pos]
            pos += 1
            body, pos = _read_sub_blocks(data, pos)
            if label == 0xF9:  # graphic control
                if len(body) < 4:
                    raise GifFormatError("short graphic control extension")
                (pending_delay_cs,) = struct.unpack("<H", body[1:3])
            # other extensions (application/comment/plain text): skipped
            continue
        if block == 0x2C:  # image descriptor
            if pos + 9 > len(data):
                raise GifFormatError("truncated image descriptor")
            left, top, fw, fh, fpacked = struct.unpack("<HHHHB", data[pos : pos + 9])
            pos += 9
            if fpacked & 0x80:
                raise GifFormatError("local color table not supported")
            if fpacked & 0x40:
                raise GifFormatError("interlaced GIF not supported")
            if (left, top, fw, fh) != (0, 0, w, h):
                raise GifFormatError("partial-frame composition not supported")
            if pos >= len(data):
                raise GifFormatError("truncated image data")
            mcs = data[pos]
            pos += 1
            lzw, pos = _read_sub_blocks(data, pos)
            frames_raw.append((mcs, lzw, pending_delay_cs * 10))
            pending_delay_cs = 0
            continue
        raise GifFormatError(f"unknown block 0x{block:02x}")
    return w, h, palette, frames_raw


def _decode_one_frame(
    mcs: int, lzw: bytes, w: int, h: int, n_colors: int
) -> np.ndarray:
    raw = _lzw_decode(lzw, mcs, w * h)
    idx = np.frombuffer(raw, dtype=np.uint8).reshape(h, w).copy()
    if int(idx.max(initial=0)) >= n_colors:
        raise GifFormatError("pixel index beyond palette")
    return idx


@guarded(GifFormatError)
def decode_gif(data: bytes) -> dict:
    """Full decode → ``{width, height, n_frames, delays_ms, palette,
    index_frames, frames, duration_ms}``.

    ``index_frames``: list of ``(h, w)`` uint8 palette-index arrays;
    ``frames``: list of ``(h, w, 3)`` uint8 RGB arrays (palette
    applied); ``delays_ms``: per-frame delay in milliseconds.
    """
    w, h, palette, frames_raw = _parse_gif_container(data)
    n_colors = palette.shape[0]
    index_frames = [
        _decode_one_frame(mcs, lzw, w, h, n_colors) for mcs, lzw, _ in frames_raw
    ]
    delays_ms = [d for _, _, d in frames_raw]
    if not index_frames:
        raise GifFormatError("no image frames")
    frames = [palette[f] for f in index_frames]
    return {
        "width": w,
        "height": h,
        "n_frames": len(index_frames),
        "delays_ms": delays_ms,
        "duration_ms": int(sum(delays_ms)),
        "palette": palette,
        "index_frames": index_frames,
        "frames": frames,
    }


@guarded(GifFormatError)
def decode_gif_frame(data: bytes, index: Optional[int] = None) -> dict:
    """Selective decode: the container walk plus the LZW inflate of ONE
    frame (default: the MIDDLE frame, ``n_frames // 2`` — the
    fingerprinting convention).  For an n-frame GIF this skips
    ``(n-1)/n`` of the LZW cost, which dominates pure-Python decode —
    the fast path for ``pipelines/mmcurate.py``'s video fingerprints.

    Returns ``{width, height, n_frames, duration_ms, frame_index,
    index_frame, frame}`` (``frame``: the ``(h, w, 3)`` RGB frame)."""
    w, h, palette, frames_raw = _parse_gif_container(data)
    if not frames_raw:
        raise GifFormatError("no image frames")
    i = len(frames_raw) // 2 if index is None else index
    if not 0 <= i < len(frames_raw):
        raise GifFormatError(f"frame index {i} out of range")
    mcs, lzw, _ = frames_raw[i]
    idx = _decode_one_frame(mcs, lzw, w, h, palette.shape[0])
    return {
        "width": w,
        "height": h,
        "n_frames": len(frames_raw),
        "duration_ms": int(sum(d for _, _, d in frames_raw)),
        "frame_index": i,
        "index_frame": idx,
        "frame": palette[idx],
    }


# ---------------------------------------------------------------------------
# Planted payloads for the synthetic corpus
# ---------------------------------------------------------------------------

_PALETTE_N = 64


def planted_palette() -> np.ndarray:
    """The fixed 64-color planted palette:
    ``palette[i] = ((3i+7) % 256, (5i+11) % 256, (7i+13) % 256)``."""
    i = np.arange(_PALETTE_N, dtype=np.int64)
    return np.stack(
        [(3 * i + 7) % 256, (5 * i + 11) % 256, (7 * i + 13) % 256], axis=1
    ).astype(np.uint8)


def planted_frames(key: int) -> list[np.ndarray]:
    """Deterministic index frames for integer ``key``:
    ``(2 + key % 4)`` frames of ``(3 + key % 5)`` rows ×
    ``(4 + key % 11)`` cols with
    ``index[f, y, x] = (5x + 11y + 17f + key) % 64``.  The SQL oracle
    mirrors exactly this closed form (through the planted palette),
    while the engine recovers the values only by LZW-decoding the GIF
    bytes."""
    w = 4 + key % 11
    h = 3 + key % 5
    nf = 2 + key % 4
    x = np.arange(w, dtype=np.int64)
    y = np.arange(h, dtype=np.int64)
    return [
        ((5 * x[None, :] + 11 * y[:, None] + 17 * f + key) % _PALETTE_N).astype(
            np.uint8
        )
        for f in range(nf)
    ]


def planted_delays_cs(key: int) -> list[int]:
    """Per-frame delay (centiseconds): ``4 + (key + f) % 7``."""
    nf = 2 + key % 4
    return [4 + (key + f) % 7 for f in range(nf)]


def planted_gif(key: int) -> bytes:
    """Planted animated-GIF payload for integer ``key``."""
    return encode_gif(planted_frames(key), planted_palette(), planted_delays_cs(key))


def planted_gif_for_ref(media_ref: str) -> bytes:
    """Resolve a corpus ``media://...`` video ref to its planted GIF
    payload — the deterministic stand-in for the reference's network
    fetch of binary content (FetchEngine.ts:211-225).  The key is a
    stable hash of the ref, NOT parsed from it, so the decoder side
    cannot shortcut the codec."""
    key = zlib.crc32(media_ref.encode()) & 0x7FFFFFFF
    return planted_gif(key)
