"""Pure-stdlib PNG codec: the one REAL decoder this container can run.

The multimodal tier (operators/multimodal.py) gates its pixel stages on
Pillow/ffmpeg, which cannot be installed here, so rounds 1-7 exercised the
distributed plumbing with deterministic fakes only. PNG, however, is
stdlib-reachable — zlib inflate + struct chunk walking + the five RFC 2083
scanline filters — so this module upgrades ONE format end-to-end: real
bytes in, real pixels out, no third-party dependency.

Scope (deliberate): 8-bit, non-interlaced, color types 0 (grayscale),
2 (RGB), 4 (gray+alpha), 6 (RGBA). Palette (3), 16-bit, and Adam7
interlacing raise with a clear message — a real deployment swaps in
Pillow for those (and everything non-PNG), same call sites.

The codec is driven from Arrow-batched mapInPandas stages, so decode cost
is per-executor-core Python — the same budget the fake tier already paid.
Reference behavior cross-checked against RFC 2083 (filters, chunk layout)
and verified by encode→decode round-trip property tests.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
#: channels per color type
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def is_png(content: bytes) -> bool:
    return content[:8] == _SIG


def decode_png(content: bytes) -> np.ndarray:
    """PNG bytes → uint8 pixel array of shape (height, width, channels).

    Raises ValueError on malformed bytes and NotImplementedError on the
    documented out-of-scope variants (palette / 16-bit / interlaced)."""
    if not is_png(content):
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(content):
        (length,) = struct.unpack(">I", content[pos : pos + 4])
        ctype = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("not a PNG: missing IHDR")
    if bit_depth != 8:
        raise NotImplementedError(f"PNG bit depth {bit_depth} needs Pillow")
    if color_type not in _CHANNELS:
        raise NotImplementedError(f"PNG color type {color_type} needs Pillow")
    if interlace:
        raise NotImplementedError("Adam7-interlaced PNG needs Pillow")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    # Unfilter vectorized: None/Up are whole-row numpy ops, Sub is a
    # per-channel cumulative sum (its recurrence is exactly a running
    # mod-256 sum), and Average/Paeth — whose recurrence on the computed
    # LEFT pixel is inherently sequential — loop over pixel COLUMNS with
    # all channels as one vector op, never over individual bytes. Real
    # encoders filter heavily (Sub/Paeth dominate), so the interpreter
    # cost per image is O(width) pixels, not O(width·height·channels)
    # bytes.
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_start + 1
        )
        if ftype == 0:  # None
            cur = line.copy()
        elif ftype == 1:  # Sub: running per-channel sum mod 256
            cur = (
                line.reshape(width, ch).astype(np.int64).cumsum(axis=0) & 0xFF
            ).astype(np.uint8).reshape(stride)
        elif ftype == 2:  # Up
            cur = (line.astype(np.int64) + prev).astype(np.uint8)
        elif ftype == 3:  # Average — left-recursive; per-pixel, all channels at once
            lp = line.reshape(width, ch).astype(np.int64)
            pv = prev.reshape(width, ch).astype(np.int64)
            acc = np.zeros((width, ch), dtype=np.int64)
            left = np.zeros(ch, dtype=np.int64)
            for x in range(width):
                left = (lp[x] + ((left + pv[x]) >> 1)) & 0xFF
                acc[x] = left
            cur = acc.astype(np.uint8).reshape(stride)
        elif ftype == 4:  # Paeth — left-recursive; per-pixel, all channels at once
            lp = line.reshape(width, ch).astype(np.int64)
            pv = prev.reshape(width, ch).astype(np.int64)
            acc = np.zeros((width, ch), dtype=np.int64)
            a = np.zeros(ch, dtype=np.int64)  # left
            c = np.zeros(ch, dtype=np.int64)  # upper-left
            for x in range(width):
                b = pv[x]
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pr = np.where(
                    (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                )
                a = (lp[x] + pr) & 0xFF
                acc[x] = a
                c = b
            cur = acc.astype(np.uint8).reshape(stride)
        else:
            raise ValueError(f"PNG filter type {ftype} invalid")
        out[y] = cur
        prev = cur
    return out.reshape(height, width, ch)


def encode_png(pixels: np.ndarray) -> bytes:
    """uint8 pixel array (h, w) or (h, w, channels∈{1,2,3,4}) → PNG bytes
    (filter 0 everywhere — simple, valid, and what the round-trip tests
    feed back through decode_png)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def to_grayscale(pixels: np.ndarray) -> np.ndarray:
    """(h, w, ch) uint8 → (h, w) float64 luma (ITU-R 601 weights for RGB;
    alpha ignored; pass-through for grayscale)."""
    ch = pixels.shape[2]
    px = pixels.astype(np.float64)
    if ch >= 3:
        return 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    return px[:, :, 0]


def ahash_64(pixels: np.ndarray) -> tuple[int, int, int, int]:
    """Average hash over REAL pixels: grayscale → 8×8 block means → one
    bit per block (above strict mean) → four 16-bit band ints, the exact
    output shape of the codegen fake tier (multimodal.perceptual_hash),
    so phash_near_dup_pairs consumes either tier unchanged."""
    g = to_grayscale(pixels)
    h, w = g.shape
    ys = [h * i // 8 for i in range(9)]
    xs = [w * j // 8 for j in range(9)]
    blocks = np.array(
        [
            g[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
            for i in range(8)
            for j in range(8)
        ]
    )
    bits = blocks > blocks.mean()
    bands = []
    for b in range(4):
        v = 0
        for j in range(16):
            if bits[b * 16 + j]:
                v |= 1 << j
        bands.append(v)
    return tuple(bands)


def resize_nearest(pixels: np.ndarray, dst_w: int, dst_h: int) -> np.ndarray:
    """Nearest-neighbor resample — the dependency-free stand-in for
    Pillow's resize, deterministic across platforms (pure indexing)."""
    h, w, _ = pixels.shape
    yi = (np.arange(dst_h) * h // dst_h).clip(0, h - 1)
    xi = (np.arange(dst_w) * w // dst_w).clip(0, w - 1)
    return pixels[yi][:, xi]
