"""Baseline-JPEG codec tier (X64): round trips, an encoder-free
hand-assembled fixture, out-of-scope behavior, and the full
decode-through-Spark path (real dims, cross-format near-dup through the
X47 banding join, JPEG thumbnailing).

The round-trip tests bound quantization error (flat blocks exact,
smooth gradients within ±3, q85 noise within JPEG's documented envelope);
the hand-built fixture decodes WITHOUT touching encode_jpeg — entropy
bits computed from the T.81 Annex-K tables by hand in the test — so the
decoder's huffman/dequant/IDCT chain is pinned independently of the
encoder it usually round-trips against.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.operators import jpeg_codec as jc
from pdf_parse_vector_db_spark.operators import multimodal, png_codec


def test_flat_block_roundtrip_exact():
    flat = np.full((16, 24, 3), 128, dtype=np.uint8)
    out = jc.decode_jpeg(jc.encode_jpeg(flat, quality=90))
    assert out.shape == (16, 24, 3)
    assert np.array_equal(out, flat)


def test_gradient_roundtrip_tight():
    yy, xx = np.mgrid[0:32, 0:48]
    grad = np.stack([yy * 3 % 256, xx * 2 % 256, (yy + xx) % 256], axis=-1).astype(
        np.uint8
    )
    out = jc.decode_jpeg(jc.encode_jpeg(grad, quality=90))
    err = np.abs(out.astype(int) - grad.astype(int))
    assert err.max() <= 3 and err.mean() < 1.0


def test_noise_roundtrip_bounded_and_deterministic():
    rng = np.random.default_rng(3)
    noise = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    b1 = jc.encode_jpeg(noise, quality=85)
    b2 = jc.encode_jpeg(noise, quality=85)
    assert b1 == b2  # byte-deterministic encode
    out = jc.decode_jpeg(b1)
    # q85 on white noise: JPEG's worst case, but still bounded
    assert np.abs(out.astype(int) - noise.astype(int)).mean() < 16


def test_grayscale_and_odd_dims():
    rng = np.random.default_rng(5)
    g = rng.integers(0, 256, (17, 23), dtype=np.uint8)
    out = jc.decode_jpeg(jc.encode_jpeg(g, quality=90))
    assert out.shape == (17, 23, 1)
    odd = rng.integers(0, 256, (9, 13, 3), dtype=np.uint8)
    assert jc.decode_jpeg(jc.encode_jpeg(odd, quality=95)).shape == (9, 13, 3)


def test_420_subsampling_roundtrip():
    yy, xx = np.mgrid[0:33, 0:47]  # odd dims force MCU edge padding
    grad = np.stack([yy * 3 % 256, xx * 2 % 256, (yy + xx) % 256], axis=-1).astype(
        np.uint8
    )
    out = jc.decode_jpeg(jc.encode_jpeg(grad, quality=90, subsample=True))
    assert out.shape == grad.shape
    assert np.abs(out.astype(int) - grad.astype(int)).mean() < 3.0


def _hand_built_fixture() -> bytes:
    """A minimal 8×8 grayscale baseline JPEG assembled byte-by-byte from
    the T.81 spec — NO encode_jpeg involved. Quant table all 16s; the
    scan encodes one block: DC diff = +8 (category 4 → Annex-K DC-luma
    code '101' + magnitude bits '1000'), then EOB ('1010'), 1-padded to
    two bytes = 0xB1 0x5F. Dequantized DC = 8·16 = 128; orthonormal
    DC-only IDCT gives 128/8 = 16; +128 level shift → every pixel 144."""
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([16] * 64)
    out += b"\xff\xc0" + struct.pack(">H", 11) + struct.pack(">BHHB", 8, 8, 8, 1)
    out += bytes([1, 0x11, 0])
    for tc, (bits, values) in ((0x00, jc._DC_LUMA), (0x10, jc._AC_LUMA)):
        payload = bytes([tc]) + bytes(bits) + bytes(values)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    out += b"\xff\xda" + struct.pack(">H", 8) + bytes([1, 1, 0x00, 0, 63, 0])
    out += bytes([0xB1, 0x5F])
    out += b"\xff\xd9"
    return bytes(out)


def test_decode_hand_built_fixture_encoder_free():
    px = jc.decode_jpeg(_hand_built_fixture())
    assert px.shape == (8, 8, 1)
    assert np.all(px == 144), px[:, :, 0]


def test_out_of_scope_variants_fail_loudly():
    good = jc.encode_jpeg(np.full((8, 8), 99, dtype=np.uint8))
    prog = bytearray(good)
    i = prog.index(b"\xff\xc0")
    prog[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="progressive"):
        jc.decode_jpeg(bytes(prog))
    with pytest.raises(ValueError, match="SOI"):
        jc.decode_jpeg(b"not a jpeg")
    trunc = good[: len(good) // 2]
    with pytest.raises((ValueError, NotImplementedError)):
        jc.decode_jpeg(trunc)


def _media_df(spark):
    """A JPEG base image, a JPEG near-dup (one block inverted), a PNG
    RE-ENCODE of the same base (the classic web-corpus duplicate: same
    picture, different container), and unrelated JPEG noise."""
    rng = np.random.default_rng(9)
    base = (
        np.add.outer(np.arange(64) * 4, np.arange(64) * 2) % 256
    ).astype(np.uint8)[:, :, None].repeat(3, axis=2)
    near = base.copy()
    near[0:8, 0:8] = 255 - near[0:8, 0:8]
    other = rng.integers(0, 256, size=(48, 80, 3), dtype=np.uint8)
    rows = [
        (0, "image", bytearray(jc.encode_jpeg(base, quality=85))),
        (1, "image", bytearray(jc.encode_jpeg(near, quality=85))),
        (2, "image", bytearray(png_codec.encode_png(base))),
        (3, "image", bytearray(jc.encode_jpeg(other, quality=85))),
    ]
    return spark.createDataFrame(rows, "doc_id long, kind string, content binary")


def test_decode_media_meta_real_tier_jpeg_dims(spark):
    got = {
        r.doc_id: r
        for r in multimodal.decode_media_meta(
            _media_df(spark), real_decoder=True
        ).collect()
    }
    assert (got[0].width, got[0].height) == (64, 64)
    assert (got[3].width, got[3].height) == (80, 48)
    assert got[0].n_frames == 1 and got[0].sample_rate == 0


def test_phash_finds_jpeg_and_cross_format_near_dups(spark):
    """X47 banding join over REAL JPEG pixels: the one-block edit stays
    in radius, AND the PNG re-encode of the same image pairs with both
    JPEG variants (aHash rides block means, so quantization noise
    doesn't flip bits) — the cross-container dup every web image corpus
    is full of. The noise image matches nothing."""
    hashes = multimodal.perceptual_hash_png(_media_df(spark))
    pairs = multimodal.phash_near_dup_pairs(hashes).collect()
    got = {(p.doc_a, p.doc_b) for p in pairs}
    assert (0, 2) in got  # same pixels, different container
    assert (0, 1) in got and (1, 2) in got  # one-block edit within radius
    assert not any(3 in p for p in got)


def test_resize_jpeg_real_tier(spark):
    media = _media_df(spark).filter(F.col("doc_id") == 3)
    r1 = multimodal.resize_media(media, max_side=32, real_decoder=True).collect()[0]
    assert (r1.src_w, r1.src_h) == (80, 48)
    assert r1.dst_w == 32 and r1.dst_h == int(48 * 32 / 80)
    r2 = multimodal.resize_media(media, max_side=32, real_decoder=True).collect()[0]
    assert r1.out_sha == r2.out_sha  # deterministic thumbnail bytes
    # the emitted payload is itself a decodable JPEG of the target dims
    content = bytes(media.collect()[0].content)
    small = png_codec.resize_nearest(jc.decode_jpeg(content), r1.dst_w, r1.dst_h)
    assert jc.decode_jpeg(jc.encode_jpeg(small)).shape == (r1.dst_h, r1.dst_w, 3)
