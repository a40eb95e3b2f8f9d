"""MJPEG-AVI video container codec in pure stdlib Python + numpy (X75).

The reference pipeline's media surface is PDF-embedded imagery
(extract_and_embed.py:90-91 via PyMuPDF); video is the natural multimodal
extension a 100 TB training-data pipeline needs (frame sampling for
vision-language corpora). This module gives the engine a REAL video tier
with zero third-party dependencies, the same posture as the PNG/JPEG/WAV/
PDF codecs: Motion-JPEG inside the RIFF-AVI container (OpenDML / AVI 1.0,
'MJPG' fourcc) — each frame is an independent baseline JFIF stream, which
the existing operators/jpeg_codec.py already decodes, so the container
work here is exactly what a video tier needs at scale: locate frames,
sample them cheaply (no inter-frame state, MJPEG frames are all
keyframes), and hand bytes to the per-frame decode kernel.

Layout written by the mirror encoder (byte-deterministic, so fixtures are
encoder-free-checkable):

    RIFF('AVI '
      LIST('hdrl'
        'avih' 56-byte MainAVIHeader
        LIST('strl' 'strh' 56-byte stream header (fccType 'vids',
             handler 'MJPG'), 'strf' 40-byte BITMAPINFOHEADER
             (biCompression 'MJPG')))
      LIST('movi' '00dc' <JFIF bytes> [pad] ...)
      'idx1' 16-byte entries ('00dc', AVIIF_KEYFRAME, offset, size))

idx1 offsets follow the dominant convention: relative to the 'movi'
fourcc (offset 4 = first chunk header). The parser walks 'movi' directly
(index-optional, matching real-world files whose idx1 is absent or wrong)
but cross-checks idx1 when present and raises on inconsistency.

Error tiers match the sibling codecs: ValueError for not-an-AVI /
truncated / corrupt structure, NotImplementedError for valid AVIs this
tier doesn't cover (non-MJPG video compression, >1 video stream) — loud,
never garbage.
"""

from __future__ import annotations

import struct

import numpy as np

#: AVIF_HASINDEX | AVIF_ISINTERLEAVED off; index present, all keyframes.
_AVIF_HASINDEX = 0x00000010
_AVIIF_KEYFRAME = 0x00000010


def is_avi(content: bytes) -> bool:
    return (
        len(content) >= 12
        and content[:4] == b"RIFF"
        and content[8:12] == b"AVI "
    )


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    """fourcc + little-endian size + payload + word-alignment pad."""
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(
    jpeg_frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Pre-encoded JFIF frames → deterministic MJPEG-AVI bytes."""
    if not jpeg_frames:
        raise ValueError("encode_avi_mjpeg needs at least one frame")
    if fps <= 0:
        raise ValueError("fps must be positive")
    n = len(jpeg_frames)
    max_size = max(len(f) for f in jpeg_frames)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_size * fps,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        _AVIF_HASINDEX,  # dwFlags
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max_size,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIi4H",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate (rate/scale = fps)
            0,  # dwStart
            n,  # dwLength
            max_size,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (default)
            0,  # dwSampleSize (0: variable-size samples)
            0, 0, width & 0xFFFF, height & 0xFFFF,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        width,
        height,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        width * height * 3,  # biSizeImage (nominal)
        0, 0, 0, 0,  # XPels, YPels, ClrUsed, ClrImportant
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_payload = b""
    index_entries = []
    for f in jpeg_frames:
        # offset convention: relative to the 'movi' fourcc; the fourcc
        # itself is 4 bytes, so the first chunk header sits at offset 4
        index_entries.append((4 + len(movi_payload), len(f)))
        movi_payload += _chunk(b"00dc", f)
    movi = _list(b"movi", movi_payload)

    idx1 = b"".join(
        b"00dc" + struct.pack("<III", _AVIIF_KEYFRAME, off, size)
        for off, size in index_entries
    )
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_avi(
    frames: list[np.ndarray], fps: int = 10, quality: int = 85
) -> bytes:
    """uint8 pixel frames ((h, w) gray or (h, w, 3) RGB, all same shape)
    → MJPEG-AVI bytes via the deterministic JPEG encoder."""
    from pdf_parse_vector_db_spark.operators import jpeg_codec

    if not frames:
        raise ValueError("encode_avi needs at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all frames must share one (height, width)")
    jpegs = [jpeg_codec.encode_jpeg(f, quality=quality) for f in frames]
    return encode_avi_mjpeg(jpegs, w, h, fps)


def _read_chunks(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) walking [start, end)."""
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        payload = pos + 8
        if payload + size > end:
            raise ValueError("AVI chunk overruns its parent")
        yield fourcc, payload, size
        pos = payload + size + (size % 2)  # word alignment
    if pos != end and pos < end:
        # trailing slack smaller than a chunk header: tolerate zero pad only
        if any(b != 0 for b in data[pos:end]):
            raise ValueError("trailing garbage after last AVI chunk")


def parse_avi(content: bytes) -> dict:
    """RIFF-AVI bytes → {width, height, fps, n_frames, frames: [bytes]}.

    Walks LIST('movi') for the stream-0 video chunks ('00dc'/'00db'),
    skipping other streams' chunks (audio interleave); validates the
    header tree; cross-checks idx1 when present. Raises ValueError on
    structural corruption, NotImplementedError on valid-but-uncovered
    variants (non-MJPG compression, multiple video streams)."""
    if not is_avi(content):
        raise ValueError("not an AVI: missing RIFF/AVI signature")
    (riff_size,) = struct.unpack_from("<I", content, 4)
    if 8 + riff_size > len(content):
        raise ValueError("truncated AVI: RIFF size overruns the payload")
    end = 8 + riff_size

    avih = None
    streams: list[tuple[bytes, bytes, bytes | None]] = []  # (type, handler, compression)
    movi_span = None
    idx1_span = None
    for fourcc, p, sz in _read_chunks(content, 12, end):
        if fourcc == b"LIST":
            list_type = content[p : p + 4]
            if list_type == b"hdrl":
                for f2, p2, sz2 in _read_chunks(content, p + 4, p + sz):
                    if f2 == b"avih":
                        if sz2 < 56:
                            raise ValueError("avih too short")
                        avih = struct.unpack_from("<14I", content, p2)
                    elif f2 == b"LIST" and content[p2 : p2 + 4] == b"strl":
                        stype = shandler = scomp = None
                        for f3, p3, sz3 in _read_chunks(content, p2 + 4, p2 + sz2):
                            if f3 == b"strh":
                                if sz3 < 8:
                                    raise ValueError("strh too short")
                                stype = content[p3 : p3 + 4]
                                shandler = content[p3 + 4 : p3 + 8]
                            elif f3 == b"strf" and stype == b"vids":
                                if sz3 < 20:
                                    raise ValueError("strf too short for vids")
                                scomp = content[p3 + 16 : p3 + 20]
                        streams.append((stype or b"????", shandler or b"????", scomp))
            elif list_type == b"movi":
                movi_span = (p + 4, p + sz)
        elif fourcc == b"idx1":
            idx1_span = (p, sz)

    if avih is None:
        raise ValueError("AVI missing avih main header")
    if movi_span is None:
        raise ValueError("AVI missing movi list")
    vids = [s for s in streams if s[0] == b"vids"]
    if not vids:
        raise ValueError("AVI has no video stream")
    if len(vids) > 1:
        raise NotImplementedError("multiple video streams not supported")
    comp = vids[0][2] or b""
    if comp.upper() not in (b"MJPG",):
        raise NotImplementedError(
            f"AVI video compression {comp!r} not supported; this tier "
            "decodes Motion-JPEG ('MJPG') — other codecs plug in via ffmpeg"
        )

    us_per_frame, _, _, _, total_frames, _, _, _, width, height = avih[:10]
    # ansi: stdlib python; the ternary guards us_per_frame == 0
    fps = round(1_000_000 / us_per_frame) if us_per_frame else 0

    frames: list[bytes] = []
    frame_offsets: list[tuple[int, int]] = []
    mstart, mend = movi_span
    for fourcc, p, sz in _read_chunks(content, mstart, mend):
        if fourcc in (b"00dc", b"00db"):
            frames.append(content[p : p + sz])
            # offset of the chunk HEADER relative to the 'movi' fourcc
            frame_offsets.append((p - 8 - (mstart - 4), sz))
        # other streams' chunks (e.g. 01wb audio) are legitimately skipped

    if total_frames != len(frames):
        raise ValueError(
            f"avih says {total_frames} frames, movi contains {len(frames)}"
        )
    from pdf_parse_vector_db_spark.operators import jpeg_codec

    for i, f in enumerate(frames):
        if not jpeg_codec.is_jpeg(f):
            raise ValueError(f"frame {i} is not a JFIF stream")

    if idx1_span is not None:
        p, sz = idx1_span
        if sz % 16:
            raise ValueError("idx1 size not a multiple of 16")
        vid_entries = []
        for off in range(p, p + sz, 16):
            ckid = content[off : off + 4]
            _flags, coff, csize = struct.unpack_from("<III", content, off + 4)
            if ckid in (b"00dc", b"00db"):
                vid_entries.append((coff, csize))
        if vid_entries and vid_entries != frame_offsets:
            raise ValueError("idx1 video entries disagree with the movi walk")

    return {
        "width": int(width),
        "height": int(height),
        "fps": int(fps),
        "n_frames": len(frames),
        "frames": frames,
    }


def decode_frame(content: bytes, idx: int) -> np.ndarray:
    """Decode frame `idx` of an MJPEG-AVI to uint8 pixels."""
    from pdf_parse_vector_db_spark.operators import jpeg_codec

    meta = parse_avi(content)
    if not 0 <= idx < meta["n_frames"]:
        raise ValueError(f"frame index {idx} out of range 0..{meta['n_frames'] - 1}")
    return jpeg_codec.decode_jpeg(meta["frames"][idx])
