"""FLAC codec tier (X79): lossless round trips through the Rice/FIXED
paths, hand-assembled fixtures for the decoder surfaces the mirror
encoder never emits (stereo decorrelation, LPC, escape partitions),
CRC verification, error tiers, and Spark metadata integration."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pdf_parse_vector_db_spark.operators import flac_codec as fc


def _sig(n=4000, seed=7):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (2500 * np.sin(t / 40) + rng.integers(-60, 60, n)).astype(np.int16)


def test_flac_lossless_round_trip_stereo_and_mono():
    left, right = _sig(), _sig(seed=9)
    s = np.stack([left, right], axis=-1)
    f = fc.encode_flac(s, 8000)
    rate, nch, out = fc.decode_flac(f)
    assert (rate, nch) == (8000, 2)
    assert np.array_equal(out, s.astype(np.int32))
    # genuinely compressed: the FIXED+Rice path is live, not verbatim
    assert len(f) < 0.7 * s.nbytes
    # deterministic bytes + multi-block path (4000 < 4096 is one block;
    # force several)
    assert f == fc.encode_flac(s, 8000)
    f2 = fc.encode_flac(s, 8000, block=512)
    assert np.array_equal(fc.decode_flac(f2)[2], s.astype(np.int32))

    mono = fc.encode_flac(left, 16000)
    r, c, o = fc.decode_flac(mono)
    assert (r, c) == (16000, 1)
    assert np.array_equal(o[:, 0], left.astype(np.int32))


def _hand_frame(subframe_bits, nch_code, block, rate=8000, nch=2, bps=16):
    """Assemble a 1-frame FLAC around caller-provided subframe payloads."""
    out = bytearray(b"fLaC")
    si = fc._BitWriter()
    si.write(block, 16)
    si.write(block, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(block, 36)
    body = si.bytes() + b"\x00" * 16
    out += bytes([0x80]) + struct.pack(">I", len(body))[1:] + body

    head = bytearray()
    hw = fc._BitWriter()
    hw.write(0x3FFE, 14)
    hw.write(0, 2)
    hw.write(7, 4)  # 16-bit block size at end of header
    hw.write(0, 4)
    hw.write(nch_code, 4)
    hw.write(4, 3)  # 16 bps
    hw.write(0, 1)
    head += hw.bytes()
    head += fc._utf8_number(0)
    head += struct.pack(">H", block - 1)
    head.append(fc._crc8(bytes(head)))
    frame = bytes(head) + subframe_bits
    frame += struct.pack(">H", fc._crc16(frame))
    return bytes(out) + frame


def _verbatim(bw, vals, width):
    bw.write(0, 1)
    bw.write(1, 6)  # VERBATIM
    bw.write(0, 1)
    for v in vals:
        bw.write(int(v) & ((1 << width) - 1), width)


def test_flac_stereo_decorrelation_fixtures():
    """left/side, right/side, and mid/side frames hand-built with
    verbatim subframes must reconstruct the same (L, R) pair."""
    L = [100, -50, 32767, -32768, 7, 0, 1, -1]
    R = [90, -60, 32700, -32768, 3, 2, -5, 4]
    side = [l - r for l, r in zip(L, R)]
    for code, chans in (
        (8, (L, side)),  # left + side (side needs 17 bits)
        (9, (side, R)),  # side + right
    ):
        bw = fc._BitWriter()
        widths = (16, 17) if code == 8 else (17, 16)
        for vals, w in zip(chans, widths):
            _verbatim(bw, vals, w)
        bw.align()
        rate, nch, out = fc.decode_flac(_hand_frame(bw.bytes(), code, len(L)))
        assert nch == 2
        assert out[:, 0].tolist() == L and out[:, 1].tolist() == R, code
    # mid/side: mid = (L+R)>>1 (floor), side = L-R; the spec recovers the
    # dropped low bit of the sum from side's parity
    mid = [(l + r) >> 1 for l, r in zip(L, R)]
    bw = fc._BitWriter()
    _verbatim(bw, mid, 16)
    _verbatim(bw, side, 17)
    bw.align()
    _, _, out = fc.decode_flac(_hand_frame(bw.bytes(), 10, len(L)))
    assert out[:, 0].tolist() == L and out[:, 1].tolist() == R


def test_flac_lpc_subframe_fixture():
    """Hand-built LPC subframe (order 2, known coefficients/shift,
    verbatim-width residuals via the escape code) decodes to the exact
    recurrence."""
    order, prec, shift = 2, 12, 2
    coefs = [3, -2]
    warm = [10, 12]
    resid = [1, -1, 2, 0, -3, 5]
    block = order + len(resid)
    want = list(warm)
    for r in resid:
        acc = coefs[0] * want[-1] + coefs[1] * want[-2]
        want.append(r + (acc >> shift))
    bw = fc._BitWriter()
    bw.write(0, 1)
    bw.write(32 + order - 1, 6)  # LPC order 2
    bw.write(0, 1)
    for v in warm:
        bw.write(v & 0xFFFF, 16)
    bw.write(prec - 1, 4)
    bw.write(shift & 0x1F, 5)
    for c in coefs:
        bw.write(c & ((1 << prec) - 1), prec)
    # residual: method 0, partition order 0, ESCAPE with raw width 8
    bw.write(0, 2)
    bw.write(0, 4)
    bw.write(0xF, 4)
    bw.write(8, 5)
    for r in resid:
        bw.write(r & 0xFF, 8)
    bw.align()
    _, _, out = fc.decode_flac(_hand_frame(bw.bytes(), 0, block, nch=1))
    assert out[:, 0].tolist() == want


def test_flac_crc_and_error_tiers():
    s = _sig(1000)
    f = bytearray(fc.encode_flac(s, 8000))
    with pytest.raises(ValueError, match="not a FLAC"):
        fc.decode_flac(b"RIFF....WAVE")
    with pytest.raises(ValueError, match="truncated|bitstream"):
        fc.decode_flac(bytes(f[: len(f) // 2]))
    # flip one payload byte -> CRC-16 catches it
    bad = bytearray(f)
    bad[-40] ^= 0x40
    with pytest.raises(ValueError, match="CRC"):
        fc.decode_flac(bytes(bad))
    with pytest.raises(ValueError, match="int16"):
        fc.encode_flac(s.astype(np.int32), 8000)
    with pytest.raises(NotImplementedError, match="channels"):
        fc.encode_flac(np.zeros((10, 3), np.int16), 8000)
    with pytest.raises(ValueError, match="at least one"):
        fc.encode_flac(np.zeros((0,), np.int16), 8000)


def test_decode_media_meta_real_flac(spark):
    from pdf_parse_vector_db_spark.operators.multimodal import decode_media_meta

    f = fc.encode_flac(_sig(2048), 22050)
    df = spark.createDataFrame(
        [(0, "audio", bytearray(f))], "doc_id long, kind string, content binary"
    )
    r = decode_media_meta(df, real_decoder=True).collect()[0]
    assert (r.n_frames, r.sample_rate, r.width, r.height) == (2048, 22050, 0, 0)


def test_audio_features_identical_across_wav_and_flac():
    """The same samples through WAV and FLAC must yield IDENTICAL
    feature dicts — both containers are lossless, so the cross-container
    collapse is exact, not approximate."""
    from pdf_parse_vector_db_spark.operators import wav_codec

    s = _sig(3000)
    wav = wav_codec.encode_wav(s, 8000)
    flac = fc.encode_flac(s, 8000)
    fw = wav_codec.audio_features(wav)
    ff = wav_codec.audio_features(flac)
    assert fw == ff
    assert fw["sample_rate"] == 8000 and fw["n_frames"] == 3000
