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
    arith = bytearray(good)
    i = arith.index(b"\xff\xc0")
    arith[i + 1] = 0xC9  # flip SOF0 -> SOF9 (arithmetic sequential)
    with pytest.raises(NotImplementedError, match="arithmetic"):
        jc.decode_jpeg(bytes(arith))
    with pytest.raises(ValueError, match="SOI"):
        jc.decode_jpeg(b"not a jpeg")
    trunc = good[: len(good) // 2]
    with pytest.raises((ValueError, NotImplementedError)):
        jc.decode_jpeg(trunc)


def test_component_count_and_scan_coverage_guards():
    """Round-9 ADVICE #2: a 4-component (CMYK/YCCK) SOF and a baseline
    image split across non-interleaved scans must fail loudly at the
    documented plug point, never silently return garbage RGB."""
    good = jc.encode_jpeg(
        np.full((8, 8, 3), 99, dtype=np.uint8)
    )
    cmyk = bytearray(good)
    i = cmyk.index(b"\xff\xc0")
    # SOF payload: len(2) prec(1) h(2) w(2) nc(1) — patch nc to 4 and pad
    # a 4th component spec into the segment
    seglen = int.from_bytes(cmyk[i + 2 : i + 4], "big")
    cmyk[i + 9] = 4
    cmyk[i + 2 : i + 4] = (seglen + 3).to_bytes(2, "big")
    cmyk[i + 4 + seglen - 2 : i + 4 + seglen - 2] = bytes([4, 0x11, 1])
    with pytest.raises(NotImplementedError, match="CMYK"):
        jc.decode_jpeg(bytes(cmyk))

    noninter = bytearray(good)
    j = noninter.index(b"\xff\xda")
    # SOS: len(2) ns(1) [cs td]*ns ss se ahal — shrink to a 1-comp scan
    noninter[j + 2 : j + 4] = (2 + 1 + 2 + 3).to_bytes(2, "big")
    noninter[j + 4] = 1
    del noninter[j + 7 : j + 11]  # drop comps 2 and 3 from the list
    with pytest.raises(NotImplementedError, match="non-interleaved"):
        jc.decode_jpeg(bytes(noninter))


def test_undefined_quant_table_is_valueerror():
    """Round-9 ADVICE #3: a SOF referencing a quant-table id no DQT
    defined surfaces as the designed 'not a JPEG' ValueError tier, not a
    raw KeyError escaping an executor."""
    good = jc.encode_jpeg(np.full((8, 8), 99, dtype=np.uint8))
    bad = bytearray(good)
    i = bad.index(b"\xff\xdb")
    bad[i + 4] = 3  # rename table 0 -> 3; SOF still references 0
    with pytest.raises(ValueError, match="quant table"):
        jc.decode_jpeg(bytes(bad))


def test_dri_restart_round_trip():
    """Round-9 ADVICE #1: spec-valid DRI streams (each interval 1-padded
    to a byte boundary before its RSTn) decode — including intervals
    whose pad forms a stuffed 0xFF — and restart placement is exact:
    decoded pixels equal the no-DRI encode of the same image across
    4:4:4, 4:2:0, and grayscale."""
    rng = np.random.default_rng(17)
    for shape, sub in (((40, 56, 3), False), ((41, 53, 3), True), ((24, 31), False)):
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        want = jc.decode_jpeg(jc.encode_jpeg(img, quality=90, subsample=sub))
        for ri in (1, 2, 5):
            got = jc.decode_jpeg(
                jc.encode_jpeg(img, quality=90, subsample=sub, restart_interval=ri)
            )
            assert np.array_equal(got, want), (shape, sub, ri)


def test_progressive_round_trip_equals_baseline():
    """X64→progressive (round-10): the SOF2 spectral-selection script
    over the same quantized coefficients decodes to EXACTLY the baseline
    reconstruction — multi-scan walk, interleaved DC scan, per-component
    non-interleaved AC bands, chroma-subsampled geometry included."""
    rng = np.random.default_rng(23)
    for shape, sub in (
        ((40, 56, 3), False),
        ((41, 53, 3), True),
        ((24, 31), False),
        ((8, 8), False),
    ):
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        want = jc.decode_jpeg(jc.encode_jpeg(img, quality=85, subsample=sub))
        got = jc.decode_jpeg(
            jc.encode_jpeg(img, quality=85, subsample=sub, progressive=True)
        )
        assert np.array_equal(got, want), (shape, sub)


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


def test_hand_assembled_progressive_successive_approximation():
    """Encoder-free SOF2 fixture (round-10, mirroring the baseline
    hand-assembled fixture): a 16x8 grayscale stream built bit-by-bit
    per T.81 G.2 with quant table all-ones, exercising all four
    progressive scan kinds — DC first (Al=1), AC first (Al=1) with an
    EOBn r>0 run spanning two blocks, DC refine, and AC refine with
    post-EOB correction bits — must reconstruct EXACTLY the IDCT of the
    known coefficients (block0: DC=6, zz1=3, zz5=-2; block1: DC=-5)."""
    import struct as _struct

    dc_enc, _ = jc._canonical_codes(*jc._DC_LUMA)
    # custom AC table: the Annex-K tables carry no EOBn>0 symbols, so the
    # fixture defines its own 3-symbol table {0x01, 0x31, 0x10(EOB1)}
    ac_bits = [0, 3] + [0] * 14
    ac_vals = [0x01, 0x31, 0x10]
    ac_enc, _ = jc._canonical_codes(ac_bits, ac_vals)

    def seg(marker, payload):
        return marker + _struct.pack(">H", 2 + len(payload)) + payload

    def sos(ss, se, ah, al):
        return seg(b"\xff\xda", bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))

    out = bytearray(b"\xff\xd8")
    out += seg(b"\xff\xdb", bytes([0]) + bytes([1] * 64))
    out += seg(
        b"\xff\xc2", _struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0])
    )
    out += seg(
        b"\xff\xc4", bytes([0x00]) + bytes(jc._DC_LUMA[0]) + bytes(jc._DC_LUMA[1])
    )
    out += seg(b"\xff\xc4", bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))

    # S1: DC first, Al=1 — diff-coded (DC >> 1): 3, then -3-3 = -6
    bw = jc._BitWriter()
    for diff in (3, -6):
        t, bits = jc._magnitude(diff)
        code, ln = dc_enc[t]
        bw.write(code, ln)
        if t:
            bw.write(bits, t)
    out += sos(0, 0, 0, 1) + bw.flush()

    # S2: AC first 1..63, Al=1 — zz1=+1, run-3 zz5=-1, EOB run of 2
    bw = jc._BitWriter()
    code, ln = ac_enc[0x01]
    bw.write(code, ln)
    bw.write(1, 1)  # +1
    code, ln = ac_enc[0x31]
    bw.write(code, ln)
    bw.write(0, 1)  # -1
    code, ln = ac_enc[0x10]
    bw.write(code, ln)
    bw.write(0, 1)  # EOBRUN = (1<<1) + 0 = 2: block0's tail + block1
    out += sos(1, 63, 0, 1) + bw.flush()

    # S3: DC refine (Ah=1, Al=0) — raw bits 6&1=0, (-5)&1=1
    bw = jc._BitWriter()
    bw.write(0, 1)
    bw.write(1, 1)
    out += sos(0, 0, 1, 0) + bw.flush()

    # S4: AC refine — EOB run of 2, then correction bits for zz1 (1) and
    # zz5 (0) absorbed inside block0's post-EOB sweep
    bw = jc._BitWriter()
    code, ln = ac_enc[0x10]
    bw.write(code, ln)
    bw.write(0, 1)
    bw.write(1, 1)
    bw.write(0, 1)
    out += sos(1, 63, 1, 0) + bw.flush()
    out += b"\xff\xd9"

    got = jc.decode_jpeg(bytes(out))
    zz0 = np.zeros(64)
    zz0[0], zz0[1], zz0[5] = 6, 3, -2
    zz1 = np.zeros(64)
    zz1[0] = -5
    blocks = [
        jc._C.T @ zz[jc._UNZIGZAG].reshape(8, 8) @ jc._C + 128.0
        for zz in (zz0, zz1)
    ]
    want = np.clip(np.rint(np.concatenate(blocks, axis=1)), 0, 255).astype(
        np.uint8
    )[:, :, None]
    assert got.shape == (8, 16, 1)
    assert np.array_equal(got, want), (got[..., 0], want[..., 0])


def test_progressive_through_spark_dims_and_banding_pair(spark):
    """The two round-10 'done' pins for SOF2: decode_media_meta returns
    TRUE dims for progressive bytes through the real-decoder mapInPandas
    tier, and a progressive re-encode of a baseline image lands inside
    the X47 perceptual-hash banding radius (here: identical pixels →
    identical aHash), while unrelated noise still matches nothing."""
    rng = np.random.default_rng(31)
    base = (
        np.add.outer(np.arange(64) * 4, np.arange(64) * 2) % 256
    ).astype(np.uint8)[:, :, None].repeat(3, axis=2)
    other = rng.integers(0, 256, size=(48, 80, 3), dtype=np.uint8)
    rows = [
        (0, "image", bytearray(jc.encode_jpeg(base, quality=85))),
        (1, "image", bytearray(jc.encode_jpeg(base, quality=85, progressive=True))),
        (2, "image", bytearray(jc.encode_jpeg(other, quality=85, progressive=True))),
    ]
    media = spark.createDataFrame(rows, "doc_id long, kind string, content binary")
    got = {
        r.doc_id: r
        for r in multimodal.decode_media_meta(media, real_decoder=True).collect()
    }
    assert (got[1].width, got[1].height) == (64, 64)
    assert (got[2].width, got[2].height) == (80, 48)
    pairs = {
        (p.doc_a, p.doc_b)
        for p in multimodal.phash_near_dup_pairs(
            multimodal.perceptual_hash_png(media)
        ).collect()
    }
    assert (0, 1) in pairs, pairs  # baseline/progressive near-dup pair
    assert not any(2 in p for p in pairs)
