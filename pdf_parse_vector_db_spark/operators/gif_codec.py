"""GIF codec (87a/89a incl. animation) in pure stdlib Python + numpy (X78).

Completes the container family beside PNG/JPEG/WAV/AVI/PDF: GIF is the
other ubiquitous animation container in web corpora, and it is LOSSLESS
(palette indices round-trip exactly), which makes it the bit-exact
cross-container counterpart to the MJPEG-AVI tier — the same pixels can
be pinned identical through GIF, PNG, and an AVI frame.

Implemented surface:
  * header + logical screen descriptor, global/local color tables,
  * graphic-control extensions (frame delay, transparency index,
    disposal methods 0-2), other extensions skipped by sub-block walk,
  * image descriptors at arbitrary offsets, interlaced row order
    (the 8/8, 8/8+4, 4/2, 2/1 four-pass scheme),
  * the variable-code-width LZW of the GIF spec (LSB-first bit packing,
    clear/EOI codes, width growth at 2^w up to 12 bits) — note this is
    NOT the PDF/TIFF LZW in operators/pdf_codec (MSB-first, EarlyChange),
  * frame COMPOSITION: disposal 0/1 draw-over, disposal 2
    restore-to-background, transparency honored — decode returns fully
    composed RGB frames, the shape the phash/dedup consumers need,
  * a byte-deterministic mirror encoder (global palette built from the
    frames' unique colors, undisposed full-coverage frames, fixed
    sub-block segmentation) so fixtures are encoder-free-checkable.

Loud tiers, matching the sibling codecs: ValueError for not-a-GIF /
truncated / corrupt LZW streams, NotImplementedError for valid features
out of scope (disposal 3 restore-to-previous, >256 distinct colors at
encode).
"""

from __future__ import annotations

import struct

import numpy as np


def is_gif(content: bytes) -> bool:
    return content[:6] in (b"GIF87a", b"GIF89a")


# -- LZW (GIF variant: LSB-first packing, variable width 3..12 bits) --------


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> bytes:
    """GIF LZW: emits exactly `expected` palette indices or raises."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader state (LSB-first)
    acc = 0
    nbits = 0
    pos = 0

    def read_code(width: int) -> int:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    def reset_table():
        return {i: bytes([i]) for i in range(clear)}, min_code_size + 1

    table, width = reset_table()
    prev: bytes | None = None
    next_code = eoi + 1
    while True:
        code = read_code(width)
        if code == clear:
            table, width = reset_table()
            next_code = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code not in table:
                raise ValueError("GIF LZW: first code not in table")
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]
        else:
            raise ValueError("GIF LZW: code beyond table")
        out.extend(entry)
        if prev is not None:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
        if len(out) > expected:
            raise ValueError("GIF LZW: more pixels than the frame declares")
    if len(out) != expected:
        raise ValueError(
            f"GIF LZW: {len(out)} pixels decoded, frame declares {expected}"
        )
    return bytes(out)


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Deterministic GIF LZW: greedy longest-match, clear emitted only at
    table exhaustion — the canonical encoder every decoder accepts."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh():
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    width = min_code_size + 1
    next_code = eoi + 1
    emit(clear, width)
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        elif next_code > (1 << 12):
            emit(clear, width)
            table = fresh()
            width = min_code_size + 1
            next_code = eoi + 1
        run = bytes([b])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# -- container --------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    out = np.empty_like(rows)
    out[order] = rows
    return out


def _sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at pos; return (bytes, next)."""
    chunks = []
    while True:
        if pos >= len(data):
            raise ValueError("truncated GIF: unterminated sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        if pos + n > len(data):
            raise ValueError("truncated GIF: sub-block overruns payload")
        chunks.append(data[pos : pos + n])
        pos += n


def decode_gif(content: bytes) -> dict:
    """GIF bytes → {width, height, n_frames, delays_cs, frames} with
    `frames` a list of fully COMPOSED (h, w, 3) uint8 RGB arrays."""
    if not is_gif(content):
        raise ValueError("not a GIF: missing GIF87a/GIF89a signature")
    if len(content) < 13:
        raise ValueError("truncated GIF: missing logical screen descriptor")
    w, h, packed, bg, _ar = struct.unpack_from("<HHBBB", content, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 ** ((packed & 0x07) + 1)
        if pos + 3 * n > len(content):
            raise ValueError("truncated GIF: global color table")
        gct = np.frombuffer(content, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n

    frames: list[np.ndarray] = []
    delays: list[int] = []
    canvas = np.zeros((h, w, 3), np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:, :] = gct[bg]
    background = canvas.copy()
    transparent: int | None = None
    delay = 0
    disposal = 0
    prev_rect = None

    while True:
        if pos >= len(content):
            raise ValueError("truncated GIF: missing trailer")
        block = content[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(content):
                raise ValueError("truncated GIF extension")
            label = content[pos]
            pos += 1
            data, pos = _sub_blocks(content, pos)
            if label == 0xF9 and len(data) >= 4:
                flags, delay = struct.unpack_from("<BH", data, 0)
                disposal = (flags >> 2) & 0x7
                transparent = data[3] if flags & 1 else None
                if disposal == 3:
                    raise NotImplementedError(
                        "GIF disposal method 3 (restore-to-previous) "
                        "not supported"
                    )
            continue
        if block != 0x2C:
            raise ValueError(f"corrupt GIF: unknown block 0x{block:02x}")
        if pos + 9 > len(content):
            raise ValueError("truncated GIF image descriptor")
        fx, fy, fw, fh, fpacked = struct.unpack_from("<HHHHB", content, pos)
        pos += 9
        if fx + fw > w or fy + fh > h:
            raise ValueError("GIF frame rectangle outside the logical screen")
        ct = gct
        if fpacked & 0x80:
            n = 2 ** ((fpacked & 0x07) + 1)
            if pos + 3 * n > len(content):
                raise ValueError("truncated GIF: local color table")
            ct = np.frombuffer(content, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("GIF frame has no color table")
        if pos >= len(content):
            raise ValueError("truncated GIF: missing LZW min code size")
        mcs = content[pos]
        pos += 1
        if not 2 <= mcs <= 11:
            raise ValueError(f"GIF LZW min code size {mcs} out of range")
        data, pos = _sub_blocks(content, pos)
        idx = np.frombuffer(
            _lzw_decode(mcs, data, fw * fh), np.uint8
        ).reshape(fh, fw)
        if idx.max(initial=0) >= len(ct):
            raise ValueError("GIF pixel index beyond the color table")
        if fpacked & 0x40:
            idx = _deinterlace(idx)
        # composition: disposal of the PREVIOUS frame already applied;
        # draw this frame's non-transparent pixels onto the canvas
        region = canvas[fy : fy + fh, fx : fx + fw]
        px = ct[idx]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = px[mask]
        else:
            region[:, :] = px
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:
            canvas[fy : fy + fh, fx : fx + fw] = background[
                fy : fy + fh, fx : fx + fw
            ]
        prev_rect = (fx, fy, fw, fh)
        transparent = None
        delay = 0
        disposal = 0
    del prev_rect
    if not frames:
        raise ValueError("GIF contains no image data")
    return {
        "width": int(w),
        "height": int(h),
        "n_frames": len(frames),
        "delays_cs": delays,
        "frames": frames,
    }


def encode_gif(frames: list[np.ndarray], delay_cs: int = 10) -> bytes:
    """(h, w, 3) uint8 frames → deterministic GIF89a bytes (one global
    palette over all frames' unique colors, full-coverage undisposed
    frames). Raises NotImplementedError past 256 distinct colors —
    quantization is a modeling choice this deterministic tier refuses
    to make silently."""
    if not frames:
        raise ValueError("encode_gif needs at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape != (h, w, 3) for f in frames):
        raise ValueError("all frames must be (h, w, 3) and share one shape")
    colors = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in frames], axis=0), axis=0
    )
    if len(colors) > 256:
        raise NotImplementedError(
            f"{len(colors)} distinct colors: palette quantization needed "
            "(Pillow plug-point); this deterministic tier covers <=256"
        )
    # palette size = next power of two >= max(2, n_colors)
    size = 2
    while size < len(colors):
        size *= 2
    pal = np.zeros((size, 3), np.uint8)
    pal[: len(colors)] = colors
    # color -> index lookup
    lut = {tuple(c): i for i, c in enumerate(colors)}
    depth = max(1, size.bit_length() - 1)

    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (depth - 1), 0, 0)
    out += pal.tobytes()
    # Netscape looping extension (loop forever) for multi-frame files
    if len(frames) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    mcs = max(2, depth)
    for f in frames:
        out += b"\x21\xf9\x04" + struct.pack("<BHB", 0, delay_cs, 0) + b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        idx = np.array(
            [lut[tuple(c)] for c in f.reshape(-1, 3)], dtype=np.uint8
        ).tobytes()
        out.append(mcs)
        data = _lzw_encode(mcs, idx)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)
