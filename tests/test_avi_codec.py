"""MJPEG-AVI container tier (X75): round trips, error tiers, Spark
integration (real metadata decode, frame sampling, cross-video frame
near-dup through the shared banding join)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pyspark.sql import functions as F

from pdf_parse_vector_db_spark.operators import avi_codec, jpeg_codec, png_codec


def _frames(n=5, h=16, w=24, seed_shift=0):
    out = []
    base = np.linspace(0, 255, w, dtype=np.float64)
    for i in range(n):
        f = np.clip(
            np.add.outer(np.arange(h) * 3.0 + (i + seed_shift) * 19.0, base), 0, 255
        ).astype(np.uint8)
        out.append(np.stack([f, np.flipud(f), np.fliplr(f)], axis=-1))
    return out


def test_avi_round_trip_bit_exact():
    frames = _frames()
    avi = avi_codec.encode_avi(frames, fps=12, quality=80)
    assert avi_codec.is_avi(avi)
    meta = avi_codec.parse_avi(avi)
    assert (meta["width"], meta["height"], meta["fps"], meta["n_frames"]) == (
        24, 16, 12, 5,
    )
    # each container frame decodes EXACTLY like the standalone JPEG of
    # the same pixels — the container adds nothing to the pixel path
    for i, f in enumerate(frames):
        got = avi_codec.decode_frame(avi, i)
        want = jpeg_codec.decode_jpeg(jpeg_codec.encode_jpeg(f, quality=80))
        assert np.array_equal(got, want), i
    # byte-determinism: fixtures are encoder-free-checkable
    assert avi == avi_codec.encode_avi(frames, fps=12, quality=80)


def test_avi_grayscale_and_single_frame():
    g = [np.arange(64, dtype=np.uint8).reshape(8, 8)]
    avi = avi_codec.encode_avi(g, fps=1)
    meta = avi_codec.parse_avi(avi)
    assert meta["n_frames"] == 1 and meta["fps"] == 1
    # the JPEG decoder's grayscale convention: one explicit channel axis
    assert avi_codec.decode_frame(avi, 0).shape == (8, 8, 1)


def test_avi_error_tiers():
    with pytest.raises(ValueError, match="not an AVI"):
        avi_codec.parse_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="not an AVI"):
        avi_codec.parse_avi(b"\x00" * 40)
    avi = avi_codec.encode_avi(_frames(2), fps=5)
    with pytest.raises(ValueError, match="truncated"):
        avi_codec.parse_avi(avi[: len(avi) // 2])
    with pytest.raises(ValueError, match="out of range"):
        avi_codec.decode_frame(avi, 7)
    with pytest.raises(ValueError, match="at least one frame"):
        avi_codec.encode_avi([], fps=5)
    # frame-count lie in avih → loud, not silent truncation
    i = avi.index(b"avih") + 8 + 16
    bad = avi[:i] + struct.pack("<I", 9) + avi[i + 4 :]
    with pytest.raises(ValueError, match="frames"):
        avi_codec.parse_avi(bad)


def test_avi_non_mjpg_raises_not_implemented():
    avi = avi_codec.encode_avi(_frames(2), fps=5)
    # patch biCompression in strf from 'MJPG' to an uncovered codec
    i = avi.index(b"strf") + 8 + 16
    assert avi[i : i + 4] == b"MJPG"
    patched = avi[:i] + b"XVID" + avi[i + 4 :]
    with pytest.raises(NotImplementedError, match="XVID"):
        avi_codec.parse_avi(patched)


def test_avi_idx1_consistency_checked():
    avi = avi_codec.encode_avi(_frames(2), fps=5)
    i = avi.index(b"idx1") + 8 + 8  # first entry's dwChunkOffset
    (off,) = struct.unpack_from("<I", avi, i)
    bad = avi[:i] + struct.pack("<I", off + 2) + avi[i + 4 :]
    with pytest.raises(ValueError, match="idx1"):
        avi_codec.parse_avi(bad)


def _media_df(spark, payloads):
    return spark.createDataFrame(
        [(i, "video", bytearray(p)) for i, p in enumerate(payloads)],
        "doc_id long, kind string, content binary",
    )


def test_decode_media_meta_real_avi(spark):
    from pdf_parse_vector_db_spark.operators.multimodal import decode_media_meta

    avi = avi_codec.encode_avi(_frames(4, h=32, w=40), fps=8)
    rows = decode_media_meta(_media_df(spark, [avi]), real_decoder=True).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.width, r.height, r.n_frames, r.sample_rate) == (40, 32, 4, 8)


def test_video_frames_sampling(spark):
    from pdf_parse_vector_db_spark.operators.multimodal import video_frames

    avi = avi_codec.encode_avi(_frames(7), fps=10)
    rows = video_frames(_media_df(spark, [avi]), every_n=3).collect()
    assert sorted(r.frame_idx for r in rows) == [0, 3, 6]
    meta = avi_codec.parse_avi(avi)
    for r in rows:
        assert bytes(r.frame) == meta["frames"][r.frame_idx]
        assert (r.width, r.height) == (24, 16)


def test_cross_video_frame_near_dup(spark):
    """Two videos share one identical frame; a still JPEG re-encodes a
    third copy of it. The per-frame aHash tier must land all three in
    one near-dup cluster through the SAME banding join the image tiers
    use — video↔video and video↔still cross-container dedup."""
    from pdf_parse_vector_db_spark.operators.multimodal import (
        phash_near_dup_pairs,
        video_frame_phash,
    )

    shared = _frames(1, seed_shift=2)[0]
    vid_a = avi_codec.encode_avi(_frames(2) + [shared], fps=5)
    vid_b = avi_codec.encode_avi([shared] + _frames(2, seed_shift=7), fps=5)
    hashes = video_frame_phash(_media_df(spark, [vid_a, vid_b])).withColumn(
        "doc_id", F.col("doc_id") * 1000 + F.col("frame_idx")
    ).drop("frame_idx")
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in phash_near_dup_pairs(hashes).collect()}
    # vid 0 frame 2 vs vid 1 frame 0: same source pixels, same encoder →
    # identical JFIF bytes → hamming 0
    assert pairs.get((2, 1000)) == 0, pairs
    # and the still-image copy matches the in-video frame's hash exactly
    still = jpeg_codec.encode_jpeg(shared, quality=85)
    still_bands = png_codec.ahash_64(jpeg_codec.decode_jpeg(still))
    in_video = avi_codec.decode_frame(vid_a, 2)
    assert png_codec.ahash_64(in_video) == still_bands
