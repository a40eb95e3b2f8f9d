"""GIF codec tier (X78): lossless round trips, the GIF LZW variant,
interlace, partial frames + transparency + disposal, error tiers, and
the container-universal cross-format frame dedup."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.operators import (
    avi_codec,
    gif_codec,
    jpeg_codec,
    png_codec,
)


def _frames(n=3, h=10, w=14):
    out = []
    for i in range(n):
        base = (np.add.outer(np.arange(h), np.arange(w)) + i * 3) % 16
        out.append(
            np.stack(
                [base * 16, 255 - base * 16, np.full_like(base, i * 40)], axis=-1
            ).astype(np.uint8)
        )
    return out


def test_gif_lossless_round_trip_and_determinism():
    frames = _frames()
    g = gif_codec.encode_gif(frames, delay_cs=7)
    assert gif_codec.is_gif(g)
    d = gif_codec.decode_gif(g)
    assert (d["width"], d["height"], d["n_frames"]) == (14, 10, 3)
    assert d["delays_cs"] == [7, 7, 7]
    for i, f in enumerate(frames):
        # GIF is palette-lossless: EXACT pixels, not near-dup
        assert np.array_equal(d["frames"][i], f), i
    assert g == gif_codec.encode_gif(frames, delay_cs=7)


def test_gif_lzw_width_growth_large_frame():
    """A frame big enough that the LZW table grows past several width
    bumps (and a palette of 256 colors so codes start at 9 bits)."""
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 256, size=(64, 64), dtype=np.uint8)
    palette = np.stack([np.arange(256)] * 3, axis=-1).astype(np.uint8)
    f = palette[idx]
    g = gif_codec.encode_gif([f])
    assert np.array_equal(gif_codec.decode_gif(g)["frames"][0], f)


def test_gif_interlaced_fixture_decodes():
    """Hand-build an interlaced frame (the encoder never emits one): take
    a normal encode, flip the interlace bit, and permute the pixel rows
    into pass order — the decoder must undo the permutation exactly."""
    f = _frames(1)[0]
    h, w = f.shape[:2]
    g = bytearray(gif_codec.encode_gif([f]))
    # image descriptor starts after header(6)+lsd(7)+gct and the 8-byte GCE
    i = bytes(g).index(b"\x2c")
    fx, fy, fw, fh, packed = struct.unpack_from("<HHHHB", g, i + 1)
    assert (fw, fh) == (w, h) and packed == 0
    # interlaced row order
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, h, step))
    permuted = f[order]
    gi = gif_codec.encode_gif([permuted])
    j = bytes(gi).index(b"\x2c")
    gi = bytearray(gi)
    gi[j + 9] |= 0x40  # set the interlace flag
    got = gif_codec.decode_gif(bytes(gi))["frames"][0]
    assert np.array_equal(got, f)


def test_gif_partial_frame_transparency_and_disposal():
    """Hand-assembled animation: full base frame, then a partial frame at
    an offset with a transparent index and disposal 2 — composition must
    draw-over then restore the background region for the NEXT frame."""
    base = _frames(1)[0]
    h, w = base.shape[:2]
    g = bytearray(gif_codec.encode_gif([base]))
    # append a 4x3 partial frame at (2, 1): palette index 0 transparent,
    # index 1 painted
    patch_idx = np.array(
        [[1, 0, 1, 1], [0, 1, 1, 0], [1, 1, 0, 1]], dtype=np.uint8
    )
    mcs = 2
    lzw = gif_codec._lzw_encode(mcs, patch_idx.tobytes())
    gce = b"\x21\xf9\x04" + struct.pack("<BHB", (2 << 2) | 1, 5, 0) + b"\x00"
    desc = b"\x2c" + struct.pack("<HHHHB", 2, 1, 4, 3, 0)
    sub = bytes([mcs, len(lzw)]) + lzw + b"\x00"
    assert g[-1] == 0x3B
    g = g[:-1] + gce + desc + sub + b"\x3b"
    d = gif_codec.decode_gif(bytes(g))
    assert d["n_frames"] == 2
    # frame 2 = base with index-1 color painted where mask says so
    pal_color = gif_codec.decode_gif(
        gif_codec.encode_gif([base])
    )  # base round-trip sanity
    want = base.copy()
    colors = np.unique(base.reshape(-1, 3), axis=0)
    paint = colors[1]
    mask = patch_idx == 1
    region = want[1:4, 2:6]
    region[mask] = paint
    assert np.array_equal(d["frames"][1], want)
    del pal_color


def test_gif_error_tiers():
    f = _frames(1)[0]
    g = gif_codec.encode_gif([f])
    with pytest.raises(ValueError, match="not a GIF"):
        gif_codec.decode_gif(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError, match="truncated|trailer"):
        gif_codec.decode_gif(g[: len(g) // 2])
    with pytest.raises(ValueError, match="at least one frame"):
        gif_codec.encode_gif([])
    # >256 distinct colors -> loud NotImplementedError, never quantize
    rng = np.random.default_rng(9)
    noisy = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8).astype(np.uint8)
    with pytest.raises(NotImplementedError, match="distinct colors"):
        gif_codec.encode_gif([np.asarray(noisy)])
    # disposal 3 -> loud
    g2 = bytearray(gif_codec.encode_gif([f]))
    i = bytes(g2).index(b"\x21\xf9\x04")
    g2[i + 3] = (3 << 2)
    with pytest.raises(NotImplementedError, match="disposal"):
        gif_codec.decode_gif(bytes(g2))


def test_decode_media_meta_real_gif(spark):
    from pdf_parse_vector_db_spark.operators.multimodal import decode_media_meta

    g = gif_codec.encode_gif(_frames(4, h=12, w=20), delay_cs=10)
    df = spark.createDataFrame(
        [(0, "video", bytearray(g))], "doc_id long, kind string, content binary"
    )
    r = decode_media_meta(df, real_decoder=True).collect()[0]
    assert (r.width, r.height, r.n_frames, r.sample_rate) == (20, 12, 4, 10)


def test_cross_container_gif_avi_png_frame_dedup(spark):
    """The universal frame-phash tier must collapse the SAME pixels
    across all three containers: a GIF frame, an AVI (MJPEG) frame, and
    a still PNG — GIF and PNG are lossless (identical hash), the JPEG
    re-encode lands within the banding radius."""
    from pdf_parse_vector_db_spark.operators.multimodal import (
        animation_frame_phash,
        phash_near_dup_pairs,
    )

    # smooth low-frequency gradient: JPEG-friendly (the sawtooth palette
    # fixture's hard edges ring under quantization), <= 256 grays for GIF
    v = np.clip(
        np.add.outer(np.arange(16) * 5, np.arange(24) * 4), 0, 255
    ).astype(np.uint8)
    shared = np.stack([v, v, v], axis=-1)
    gif = gif_codec.encode_gif([shared] + _frames(2, h=16, w=24)[1:])
    avi = avi_codec.encode_avi([shared], fps=5)
    png = png_codec.encode_png(shared)
    df = spark.createDataFrame(
        [(0, bytearray(gif)), (1, bytearray(avi)), (2, bytearray(png))],
        "doc_id long, content binary",
    )
    hashes = animation_frame_phash(df).withColumn(
        "doc_id", F.col("doc_id") * 1000 + F.col("frame_idx")
    ).drop("frame_idx")
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in phash_near_dup_pairs(hashes).collect()
    }
    # GIF frame 0 vs still PNG: both lossless -> hamming 0
    assert pairs.get((0, 2000)) == 0, pairs
    # GIF frame 0 vs AVI frame 0: JPEG quantization noise stays inside
    # the banding radius (aHash block means are stable across it)
    assert (0, 1000) in pairs and pairs[(0, 1000)] <= 3, pairs
