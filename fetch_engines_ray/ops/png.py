"""Pure-Python PNG codec (stdlib ``zlib`` + ``struct`` only).

This is the REAL media-decode path for the multimodal stages: the
container has no PIL/ffmpeg, but PNG is a self-describing public format
(RFC 2083) that stdlib zlib can fully decode — so planted image payloads
in the synthetic corpus are genuine PNG bytes, and ``decode_png`` does
genuine work: signature check, chunk walk with CRC32 verification,
zlib inflate, and per-row de-filtering (all five PNG filter types).

Reference analog: binary content handling in
/root/reference/src/FetchEngine.ts:211-225 (fetchContent returns typed
binary payloads) — here the payload is decoded to typed metadata +
pixels instead of passed through.

Scope: 8-bit greyscale (color type 0) and 8-bit RGB (color type 2),
non-interlaced — enough for a real decode contract; other layouts raise
``PngFormatError`` rather than guessing.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from .codecguard import guarded

_SIGNATURE = b"\x89PNG\r\n\x1a\n"


class PngFormatError(ValueError):
    """Raised on malformed/unsupported PNG bytes (bad signature, CRC
    mismatch, unsupported color type / bit depth, truncated stream)."""


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _filter_row(ftype: int, row: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Apply PNG filter ``ftype`` to one raw row (uint8); returns the
    filtered bytes.  ``prev`` is the RAW previous row (zeros for row 0)."""
    r = row.astype(np.int64)
    left = np.zeros_like(r)
    left[bpp:] = r[:-bpp]
    up = prev.astype(np.int64)
    upleft = np.zeros_like(up)
    upleft[bpp:] = up[:-bpp]
    if ftype == 0:  # None
        out = r
    elif ftype == 1:  # Sub
        out = r - left
    elif ftype == 2:  # Up
        out = r - up
    elif ftype == 3:  # Average
        out = r - (left + up) // 2
    elif ftype == 4:  # Paeth
        p = left + up - upleft
        pa_, pb, pc_ = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
        pred = np.where((pa_ <= pb) & (pa_ <= pc_), left, np.where(pb <= pc_, up, upleft))
        out = r - pred
    else:
        raise PngFormatError(f"unknown filter type {ftype}")
    return (out % 256).astype(np.uint8)


def _unfilter_row(ftype: int, filt: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    """Reverse one row's filter; ``prev`` is the RECONSTRUCTED previous
    row.  Sub/Average/Paeth are sequential in the left neighbor, so the
    inner loop is per-byte — rows are short and bounded."""
    n = len(filt)
    out = np.zeros(n, dtype=np.int64)
    f = filt.astype(np.int64)
    up = prev.astype(np.int64)
    if ftype == 0:
        return filt.copy()
    if ftype == 2:
        return ((f + up) % 256).astype(np.uint8)
    for i in range(n):
        left = out[i - bpp] if i >= bpp else 0
        u = up[i]
        ul = up[i - bpp] if i >= bpp else 0
        if ftype == 1:
            pred = left
        elif ftype == 3:
            pred = (left + u) // 2
        elif ftype == 4:
            p = left + u - ul
            pa_, pb, pc_ = abs(p - left), abs(p - u), abs(p - ul)
            pred = left if (pa_ <= pb and pa_ <= pc_) else (u if pb <= pc_ else ul)
        else:
            raise PngFormatError(f"unknown filter type {ftype}")
        out[i] = (f[i] + pred) % 256
    return out.astype(np.uint8)


def encode_png(pixels: np.ndarray, row_filters=None) -> bytes:
    """Encode an ``(h, w)`` uint8 greyscale or ``(h, w, 3)`` uint8 RGB
    array as a valid non-interlaced 8-bit PNG.  ``row_filters`` (optional
    list/callable of per-row filter types 0-4) defaults to cycling all
    five filters so decoders must implement full de-filtering."""
    pixels = np.asarray(pixels, dtype=np.uint8)
    if pixels.ndim == 2:
        h, w = pixels.shape
        color_type, bpp = 0, 1
        raw = pixels
    elif pixels.ndim == 3 and pixels.shape[2] == 3:
        h, w, _ = pixels.shape
        color_type, bpp = 2, 3
        raw = pixels.reshape(h, w * 3)
    else:
        raise PngFormatError("pixels must be (h,w) grey or (h,w,3) rgb uint8")
    if h == 0 or w == 0:
        raise PngFormatError("empty image")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    body = bytearray()
    prev = np.zeros(raw.shape[1], dtype=np.uint8)
    for y in range(h):
        if row_filters is None:
            ftype = y % 5
        elif callable(row_filters):
            ftype = int(row_filters(y))
        else:
            ftype = int(row_filters[y % len(row_filters)])
        body.append(ftype)
        body.extend(_filter_row(ftype, raw[y], prev, bpp).tobytes())
        prev = raw[y]
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(body), 6))
        + _chunk(b"IEND", b"")
    )


def _walk_chunks(data: bytes):
    if data[:8] != _SIGNATURE:
        raise PngFormatError("bad PNG signature")
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        end = pos + 8 + length
        if end + 4 > len(data):
            raise PngFormatError(f"truncated chunk {tag!r}")
        payload = data[pos + 8 : end]
        (crc,) = struct.unpack(">I", data[end : end + 4])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise PngFormatError(f"CRC mismatch in chunk {tag!r}")
        yield tag, payload
        pos = end + 4
        if tag == b"IEND":
            return
    raise PngFormatError("missing IEND")


@guarded(PngFormatError)
def decode_png_header(data: bytes) -> dict:
    """Parse + CRC-verify just the IHDR chunk → width/height/bit_depth/
    color_type (cheap metadata-only path)."""
    for tag, payload in _walk_chunks(data):
        if tag != b"IHDR":
            raise PngFormatError("first chunk is not IHDR")
        w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", payload)
        if comp != 0 or filt != 0:
            raise PngFormatError("unsupported compression/filter method")
        if interlace != 0:
            raise PngFormatError("interlaced PNG not supported")
        return {"width": w, "height": h, "bit_depth": depth, "color_type": ctype}
    raise PngFormatError("no IHDR chunk")


@guarded(PngFormatError)
def decode_png(data: bytes) -> dict:
    """Full decode: header dict plus ``pixels`` — ``(h, w)`` uint8 for
    greyscale, ``(h, w, 3)`` uint8 for RGB.  Every chunk CRC is
    verified; IDAT is inflated and de-filtered row by row."""
    header = None
    idat = bytearray()
    for tag, payload in _walk_chunks(data):
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or ctype not in (0, 2):
                raise PngFormatError(
                    f"unsupported layout: bit_depth={depth} color_type={ctype}"
                )
            if comp != 0 or filt != 0 or interlace != 0:
                raise PngFormatError("unsupported compression/filter/interlace")
            header = {"width": w, "height": h, "bit_depth": depth, "color_type": ctype}
        elif tag == b"IDAT":
            if header is None:
                raise PngFormatError("IDAT before IHDR")
            idat.extend(payload)
    if header is None:
        raise PngFormatError("no IHDR chunk")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise PngFormatError(f"IDAT inflate failed: {exc}") from exc
    w, h = header["width"], header["height"]
    bpp = 1 if header["color_type"] == 0 else 3
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise PngFormatError(
            f"decoded length {len(raw)} != expected {h * (stride + 1)}"
        )
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    rows = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        prev = _unfilter_row(int(arr[y, 0]), arr[y, 1:], prev, bpp)
        rows[y] = prev
    pixels = rows if bpp == 1 else rows.reshape(h, w, 3)
    return {**header, "pixels": pixels}


# ---------------------------------------------------------------------------
# Planted payloads for the synthetic corpus
# ---------------------------------------------------------------------------

def planted_pixels(key: int) -> np.ndarray:
    """Deterministic greyscale test pattern for integer ``key``:
    ``(3 + key % 7)`` rows × ``(4 + key % 13)`` cols with
    ``pixel[y, x] = (7x + 13y + key) % 256``.  The SQL oracle mirrors
    exactly this closed form (width/height/pixel-sum), while the engine
    recovers the values only by actually decoding the PNG bytes."""
    w = 4 + key % 13
    h = 3 + key % 7
    x = np.arange(w, dtype=np.int64)
    y = np.arange(h, dtype=np.int64)
    return ((7 * x[None, :] + 13 * y[:, None] + key) % 256).astype(np.uint8)


def planted_png(key: int) -> bytes:
    """Planted PNG payload for integer ``key`` (cycling row filters, so
    a header-only peek cannot fake the pixel sum)."""
    return encode_png(planted_pixels(key))


def planted_png_for_ref(media_ref: str) -> bytes:
    """Resolve a corpus ``media://...`` image ref to its planted PNG
    payload — the deterministic stand-in for the reference's network
    fetch of binary content (FetchEngine.ts:211-225).  The key is a
    stable hash of the ref, NOT parsed from it, so the decoder side
    cannot shortcut the codec."""
    key = zlib.crc32(media_ref.encode()) & 0x7FFFFFFF
    return planted_png(key)
