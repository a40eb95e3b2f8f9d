"""Pure-stdlib PDF parser + deterministic mirror writer (S1 real tier).

The reference's entire ingest front door is PyMuPDF text extraction
(extract_and_embed.py:90-91 `fitz.open(pdf_path)` +
`"\\n".join(page.get_text() for page in doc)`; sorted first-page variant at
extract_and_embed_v2.py:398 `doc[0].get_text(sort=True)`). PyMuPDF is not
installed in this container, so — same posture as the JPEG/PNG/WAV codecs
(operators/jpeg_codec.py, png_codec.py, wav_codec.py) — this module
implements the actual file format from the published ISO 32000 spec in
stdlib-only Python, giving the engine a REAL `real=True` extraction tier
that needs no third-party wheel:

  parse side (reader):
    * object syntax: numbers, booleans, null, literal strings with the
      full escape table, hex strings, names with #xx escapes, arrays,
      dictionaries, indirect references (`n g R`), comments;
    * cross-reference machinery: classic `xref` tables with /Prev chains,
      hybrid /XRefStm, PDF-1.5 cross-reference STREAMS (/W packed
      big-endian fields + /Index subsections) and compressed object
      streams (/Type /ObjStm);
    * stream filters: FlateDecode (with the PNG row predictors 10-15 and
      TIFF predictor 2 used by xref streams), ASCIIHexDecode,
      ASCII85Decode, RunLengthDecode, LZWDecode (MSB-first 9-12 bit codes,
      EarlyChange); DCTDecode / image payloads pass through as bytes for
      operators/jpeg_codec.py;
    * page tree walk with attribute inheritance (/Resources, /MediaBox)
      and a shared-subtree/cycle guard;
    * content-stream interpretation: the text object machine (BT/ET, Tf,
      Td/TD/Tm/T*/TL, Tj/TJ/'/") with full text+graphics matrix tracking
      (q/Q/cm), font decoding via /Encoding (base encodings +
      /Differences glyph names) and /ToUnicode CMaps (bfchar/bfrange,
      1- and 2-byte codespaces, Type0), inline-image (BI..ID..EI) skip;
    * raw reading order (page_text) mirroring get_text(): one output line
      per text line, pages joined by "\\n" upstream; and a sort=True tier
      (first_page_sorted) ordering spans top-to-bottom / left-to-right in
      DEVICE space like the reference's metadata path;
    * image extraction (XObject /Image): DCTDecode members surface as
      JPEG bytes (decoded downstream by operators/jpeg_codec.decode_jpeg),
      Flate members as raw samples + geometry.

  write side (fixture generator, byte-deterministic like jpeg_codec's
  encoder): write_pdf renders page texts as Helvetica/WinAnsi content
  streams (Td/TL/T*/Tj — exactly the operators the reader interprets),
  classic xref by default, or /Type /XRef + /ObjStm modern layout with the
  PNG Up predictor applied to the xref rows so the reader's un-predictor
  is exercised by round trips; write_pdf_with_jpeg embeds a DCTDecode
  image XObject for the cross-codec (PDF→JPEG→perceptual-hash) contracts.

Error tiers mirror jpeg_codec: structurally-not-a-PDF → ValueError;
spec-valid but out of scope (encryption, JBIG2/CCITT/Crypt filters) →
loud NotImplementedError, never silent garbage. Everything here is a pure
byte→text/byte function used from Arrow-batched pandas UDFs
(sources/pdf.py) — one document per row, no driver involvement.
"""

from __future__ import annotations

import re
import struct
import zlib

__all__ = [
    "PdfDocument",
    "extract_pages",
    "extract_images",
    "first_page_sorted",
    "pdf_meta",
    "parse_pdf",
    "write_pdf",
    "write_pdf_with_jpeg",
]

# --------------------------------------------------------------------------
# object model
# --------------------------------------------------------------------------

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class Name(str):
    """A PDF name object (/Foo). Subclass of str so dict keys read clean."""

    __slots__ = ()


class Ref:
    """Indirect reference `num gen R`."""

    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int) -> None:
        self.num = num
        self.gen = gen

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"{self.num} {self.gen} R"

    def __eq__(self, other: object) -> bool:
        return (
            isinstance(other, Ref) and other.num == self.num and other.gen == self.gen
        )

    def __hash__(self) -> int:
        return hash((self.num, self.gen))


class StreamObj:
    """Stream object: its dictionary + the raw (still-encoded) bytes."""

    __slots__ = ("dict", "raw")

    def __init__(self, d: dict, raw: bytes) -> None:
        self.dict = d
        self.raw = raw


def _skip_ws(buf: bytes, pos: int) -> int:
    n = len(buf)
    while pos < n:
        c = buf[pos]
        if c in _WS:
            pos += 1
        elif c == 0x25:  # '%' comment runs to EOL
            while pos < n and buf[pos] not in b"\r\n":
                pos += 1
        else:
            break
    return pos


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_KEYWORD_RE = re.compile(rb"[A-Za-z'\"*]+")

_STR_ESCAPES = {
    0x6E: b"\n",  # \n
    0x72: b"\r",  # \r
    0x74: b"\t",  # \t
    0x62: b"\x08",  # \b
    0x66: b"\x0c",  # \f
    0x28: b"(",
    0x29: b")",
    0x5C: b"\\",
}


def _parse_literal_string(buf: bytes, pos: int) -> tuple[bytes, int]:
    # pos points at the opening '('
    out = bytearray()
    depth = 1
    pos += 1
    n = len(buf)
    while pos < n:
        c = buf[pos]
        if c == 0x5C:  # backslash
            pos += 1
            if pos >= n:
                break
            e = buf[pos]
            if e in _STR_ESCAPES:
                out += _STR_ESCAPES[e]
                pos += 1
            elif 0x30 <= e <= 0x37:  # octal, 1-3 digits
                oct_digits = bytearray([e])
                pos += 1
                while len(oct_digits) < 3 and pos < n and 0x30 <= buf[pos] <= 0x37:
                    oct_digits.append(buf[pos])
                    pos += 1
                out.append(int(oct_digits, 8) & 0xFF)
            elif e in b"\r\n":  # line continuation: swallow the EOL
                pos += 1
                if e == 0x0D and pos < n and buf[pos] == 0x0A:
                    pos += 1
            else:  # unknown escape: the char stands for itself
                out.append(e)
                pos += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            pos += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), pos + 1
            out.append(c)
            pos += 1
        elif c == 0x0D:  # any EOL inside a string reads as \n (spec 7.3.4.2)
            out.append(0x0A)
            pos += 1
            if pos < n and buf[pos] == 0x0A:
                pos += 1
        else:
            out.append(c)
            pos += 1
    raise ValueError("not a PDF: unterminated literal string")


def _parse_hex_string(buf: bytes, pos: int) -> tuple[bytes, int]:
    end = buf.find(b">", pos + 1)
    if end < 0:
        raise ValueError("not a PDF: unterminated hex string")
    hx = re.sub(rb"[^0-9A-Fa-f]", b"", buf[pos + 1 : end])
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii")), end + 1


def _parse_name(buf: bytes, pos: int) -> tuple[Name, int]:
    # pos points at '/'
    pos += 1
    start = pos
    n = len(buf)
    while pos < n and buf[pos] not in _WS and buf[pos] not in _DELIM:
        pos += 1
    raw = buf[start:pos]
    if b"#" in raw:
        raw = re.sub(
            rb"#([0-9A-Fa-f]{2})", lambda m: bytes([int(m.group(1), 16)]), raw
        )
    return Name(raw.decode("latin-1")), pos


def _parse_object(buf: bytes, pos: int) -> tuple[object, int]:
    """Recursive-descent parse of one object starting at/after `pos`."""
    pos = _skip_ws(buf, pos)
    if pos >= len(buf):
        raise ValueError("not a PDF: truncated object")
    c = buf[pos]
    if c == 0x2F:  # /Name
        return _parse_name(buf, pos)
    if c == 0x28:  # (string)
        return _parse_literal_string(buf, pos)
    if c == 0x3C:  # << dict >> or <hex>
        if buf[pos : pos + 2] == b"<<":
            d: dict[str, object] = {}
            pos += 2
            while True:
                pos = _skip_ws(buf, pos)
                if buf[pos : pos + 2] == b">>":
                    return d, pos + 2
                key, pos = _parse_object(buf, pos)
                if not isinstance(key, Name):
                    raise ValueError("not a PDF: non-name dict key")
                val, pos = _parse_object(buf, pos)
                d[str(key)] = val
        return _parse_hex_string(buf, pos)
    if c == 0x5B:  # [ array ]
        arr: list[object] = []
        pos += 1
        while True:
            pos = _skip_ws(buf, pos)
            if pos >= len(buf):
                raise ValueError("not a PDF: unterminated array")
            if buf[pos] == 0x5D:
                return arr, pos + 1
            item, pos = _parse_object(buf, pos)
            arr.append(item)
    m = _NUM_RE.match(buf, pos)
    if m:
        tok = m.group(0)
        end = m.end()
        if b"." not in tok:
            # lookahead for `num gen R` indirect reference
            save = end
            p2 = _skip_ws(buf, end)
            m2 = _NUM_RE.match(buf, p2)
            if m2 and b"." not in m2.group(0):
                p3 = _skip_ws(buf, m2.end())
                if buf[p3 : p3 + 1] == b"R" and (
                    p3 + 1 >= len(buf)
                    or buf[p3 + 1] in _WS
                    or buf[p3 + 1] in _DELIM
                ):
                    return Ref(int(tok), int(m2.group(0))), p3 + 1
            return int(tok), save
        return float(tok), end
    m = _KEYWORD_RE.match(buf, pos)
    if m:
        kw = m.group(0)
        if kw == b"true":
            return True, m.end()
        if kw == b"false":
            return False, m.end()
        if kw == b"null":
            return None, m.end()
        raise ValueError(f"not a PDF: unexpected keyword {kw[:16]!r}")
    raise ValueError(f"not a PDF: unexpected byte {bytes([c])!r} at {pos}")


# --------------------------------------------------------------------------
# stream filters
# --------------------------------------------------------------------------


def _png_unpredict(data: bytes, columns: int, colors: int, bpc: int) -> bytes:
    """PNG row predictors (/Predictor >= 10) as used by xref streams: each
    row is 1 filter byte + row bytes, un-filtered against the row above
    (same algorithm as operators/png_codec.py, restated here on plain
    bytes because predictor rows are tiny — a handful of bytes per xref
    entry — and this module must not import numpy)."""
    rowlen = (columns * colors * bpc + 7) // 8
    bpp = max(1, (colors * bpc + 7) // 8)
    out = bytearray()
    prev = bytearray(rowlen)
    pos = 0
    while pos + 1 + rowlen <= len(data):
        ft = data[pos]
        row = bytearray(data[pos + 1 : pos + 1 + rowlen])
        pos += 1 + rowlen
        if ft == 1:  # Sub
            for i in range(bpp, rowlen):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(rowlen):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(rowlen):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(rowlen):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                cc = prev[i - bpp] if i >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                row[i] = (row[i] + pred) & 0xFF
        elif ft != 0:
            raise ValueError(f"not a PDF: bad PNG predictor filter byte {ft}")
        out += row
        prev = row
    return bytes(out)


def _apply_predictor(data: bytes, parms: dict | None) -> bytes:
    if not parms:
        return data
    pred = parms.get("Predictor", 1)
    if pred in (None, 1):
        return data
    columns = int(parms.get("Columns", 1))
    colors = int(parms.get("Colors", 1))
    bpc = int(parms.get("BitsPerComponent", 8))
    if pred == 2:  # TIFF horizontal differencing (8-bit components only)
        if bpc != 8:
            raise NotImplementedError("TIFF predictor with BitsPerComponent != 8")
        rowlen = columns * colors
        out = bytearray(data)
        for r0 in range(0, len(out) - rowlen + 1, rowlen):
            for i in range(colors, rowlen):
                out[r0 + i] = (out[r0 + i] + out[r0 + i - colors]) & 0xFF
        return bytes(out)
    if pred >= 10:
        return _png_unpredict(data, columns, colors, bpc)
    raise NotImplementedError(f"predictor {pred}")


def _flate_decode(data: bytes, parms: dict | None) -> bytes:
    try:
        raw = zlib.decompress(data)
    except zlib.error:
        try:  # tolerate raw-deflate / trailing-garbage streams
            raw = zlib.decompressobj().decompress(data)
        except zlib.error:
            try:
                raw = zlib.decompressobj(-15).decompress(data)
            except zlib.error as exc:
                raise ValueError("not a PDF: bad Flate stream") from exc
    return _apply_predictor(raw, parms)


def _ascii_hex_decode(data: bytes, parms: dict | None) -> bytes:
    end = data.find(b">")
    if end >= 0:
        data = data[:end]
    hx = re.sub(rb"[^0-9A-Fa-f]", b"", data)
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii"))


def _ascii85_decode(data: bytes, parms: dict | None) -> bytes:
    data = re.sub(rb"\s", b"", data)
    if data.startswith(b"<~"):
        data = data[2:]
    if data.endswith(b"~>"):
        data = data[:-2]
    out = bytearray()
    group: list[int] = []

    def flush(g: list[int], pad: int) -> None:
        v = 0
        for d in g:
            v = v * 85 + d
        quad = struct.pack(">I", v)
        out.extend(quad[: 4 - pad])

    i = 0
    while i < len(data):
        c = data[i]
        if c == 0x7A and not group:  # 'z' = four zero bytes
            out += b"\x00\x00\x00\x00"
            i += 1
            continue
        if not 0x21 <= c <= 0x75:
            raise ValueError("not a PDF: bad ASCII85 byte")
        group.append(c - 0x21)
        if len(group) == 5:
            flush(group, 0)
            group = []
        i += 1
    if group:
        pad = 5 - len(group)
        group += [84] * pad
        flush(group, pad)
    return bytes(out)


def _run_length_decode(data: bytes, parms: dict | None) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        n = data[i]
        if n == 128:
            break
        if n < 128:
            out += data[i + 1 : i + 2 + n]
            i += 2 + n
        else:
            out += bytes([data[i + 1]]) * (257 - n)
            i += 2
    return bytes(out)


def _lzw_decode(data: bytes, parms: dict | None) -> bytes:
    """LZW per spec 7.4.4: MSB-first variable 9-12 bit codes, 256=clear,
    257=EOD, EarlyChange (default 1) bumps the code width one entry early."""
    early = 1
    if parms and parms.get("EarlyChange") is not None:
        early = int(parms["EarlyChange"])
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    acc = 0
    nbits = 0
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            nbits -= width
            code = (acc >> nbits) & ((1 << width) - 1)
            if code == 256:
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width = 9
                prev = None
                continue
            if code == 257:
                out_done = _apply_predictor(bytes(out), parms)
                return out_done
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            if len(table) + early - 1 >= (1 << width) and width < 12:
                width += 1
    return _apply_predictor(bytes(out), parms)


_FILTERS = {
    "FlateDecode": _flate_decode,
    "Fl": _flate_decode,
    "ASCIIHexDecode": _ascii_hex_decode,
    "AHx": _ascii_hex_decode,
    "ASCII85Decode": _ascii85_decode,
    "A85": _ascii85_decode,
    "RunLengthDecode": _run_length_decode,
    "RL": _run_length_decode,
    "LZWDecode": _lzw_decode,
    "LZW": _lzw_decode,
}

#: Filters whose output is an image payload consumed by a dedicated codec
#: (operators/jpeg_codec.py for DCTDecode) — passed through as bytes.
_IMAGE_FILTERS = {"DCTDecode", "DCT", "JPXDecode"}

#: Spec-valid filters this module deliberately does not implement — loud
#: NotImplementedError, same contract as jpeg_codec's progressive gate.
_UNSUPPORTED_FILTERS = {"JBIG2Decode", "CCITTFaxDecode", "CCF", "Crypt"}


# --------------------------------------------------------------------------
# document
# --------------------------------------------------------------------------


class PdfDocument:
    """Parsed PDF: xref map + object cache + page walk + text extraction."""

    def __init__(self, data: bytes) -> None:
        if not isinstance(data, (bytes, bytearray)):
            raise ValueError("not a PDF: expected bytes")
        data = bytes(data)
        head = data[:1024]
        at = head.find(b"%PDF-")
        if at < 0:
            raise ValueError("not a PDF: missing %PDF- header")
        self.version = data[at + 5 : at + 8].decode("latin-1", "replace")
        self._buf = data
        self._off = at  # spec: offsets are relative to the header position
        #: objnum -> ("n", byte_offset, gen) | ("o", objstm_num, index)
        self._xref: dict[int, tuple] = {}
        self._cache: dict[int, object] = {}
        self._objstm_cache: dict[int, tuple[list[tuple[int, int]], bytes, int]] = {}
        self.trailer: dict = {}
        self._load_xref_chain()
        if "Encrypt" in self.trailer:
            raise NotImplementedError(
                "encrypted PDF (/Encrypt): decryption is out of scope; "
                "decrypt with qpdf/pikepdf upstream"
            )
        if "Root" not in self.trailer:
            raise ValueError("not a PDF: trailer has no /Root")

    # -- xref ------------------------------------------------------------

    def _load_xref_chain(self) -> None:
        buf = self._buf
        tail = buf[-2048:]
        sx = tail.rfind(b"startxref")
        if sx < 0:
            raise ValueError("not a PDF: missing startxref")
        m = _NUM_RE.search(tail, sx + 9)
        if not m:
            raise ValueError("not a PDF: bad startxref offset")
        offset = int(m.group(0))
        seen: set[int] = set()
        while offset is not None and offset not in seen:
            seen.add(offset)
            offset = self._load_xref_section(self._off + offset)

    def _load_xref_section(self, pos: int) -> int | None:
        buf = self._buf
        pos = _skip_ws(buf, pos)
        if buf[pos : pos + 4] == b"xref":
            return self._load_classic_xref(pos + 4)
        return self._load_xref_stream(pos)

    def _load_classic_xref(self, pos: int) -> int | None:
        buf = self._buf
        while True:
            pos = _skip_ws(buf, pos)
            if buf[pos : pos + 7] == b"trailer":
                pos = _skip_ws(buf, pos + 7)
                trailer, pos = _parse_object(buf, pos)
                if not self.trailer:
                    self.trailer = dict(trailer)
                # hybrid-reference file: the xref STREAM holds entries the
                # table omits (typically the ObjStm members)
                if "XRefStm" in trailer:
                    self._load_xref_stream(self._off + int(trailer["XRefStm"]))
                prev = trailer.get("Prev")
                return int(prev) if prev is not None else None
            m = _NUM_RE.match(buf, pos)
            if not m:
                raise ValueError("not a PDF: bad xref subsection header")
            start = int(m.group(0))
            pos = _skip_ws(buf, m.end())
            m = _NUM_RE.match(buf, pos)
            if not m:
                raise ValueError("not a PDF: bad xref subsection count")
            count = int(m.group(0))
            pos = _skip_ws(buf, m.end())
            for i in range(count):
                em = re.compile(rb"(\d{10})\s+(\d{5})\s+([nf])\s*").match(buf, pos)
                if not em:
                    raise ValueError("not a PDF: malformed xref entry")
                num = start + i
                if em.group(3) == b"n" and num not in self._xref:
                    self._xref[num] = ("n", int(em.group(1)), int(em.group(2)))
                pos = em.end()

    def _load_xref_stream(self, pos: int) -> int | None:
        obj, stream = self._parse_indirect_at(pos)
        if stream is None or obj.get("Type") != "XRef":
            raise ValueError("not a PDF: expected cross-reference stream")
        data = self.stream_data(StreamObj(obj, stream))
        w = [int(x) for x in self.resolve(obj["W"])]
        size = int(self.resolve(obj["Size"]))
        index = self.resolve(obj.get("Index", [0, size]))
        index = [int(x) for x in index]
        rowlen = sum(w)
        p = 0
        for s in range(0, len(index), 2):
            start, count = index[s], index[s + 1]
            for i in range(count):
                if p + rowlen > len(data):
                    break
                fields = []
                for fw in w:
                    v = 0
                    for _ in range(fw):
                        v = (v << 8) | data[p]
                        p += 1
                    fields.append(v)
                ftype = fields[0] if w[0] else 1
                num = start + i
                if num in self._xref:
                    continue
                if ftype == 1:
                    self._xref[num] = ("n", fields[1], fields[2] if len(w) > 2 else 0)
                elif ftype == 2:
                    self._xref[num] = ("o", fields[1], fields[2])
        if not self.trailer:
            self.trailer = {
                k: obj[k] for k in ("Root", "Info", "Size", "ID") if k in obj
            }
        prev = obj.get("Prev")
        return int(prev) if prev is not None else None

    # -- object loading --------------------------------------------------

    def _parse_indirect_at(self, pos: int) -> tuple[object, bytes | None]:
        """Parse `num gen obj ... endobj` at a byte offset; return
        (object, raw_stream_bytes_or_None)."""
        buf = self._buf
        pos = _skip_ws(buf, pos)
        m = re.match(rb"(\d+)\s+(\d+)\s+obj\b", buf[pos : pos + 64])
        if not m:
            raise ValueError(f"not a PDF: no indirect object at offset {pos}")
        obj, pos = _parse_object(buf, pos + m.end())
        pos = _skip_ws(buf, pos)
        if buf[pos : pos + 6] != b"stream":
            return obj, None
        pos += 6
        if buf[pos : pos + 2] == b"\r\n":
            pos += 2
        elif buf[pos : pos + 1] in (b"\n", b"\r"):
            pos += 1
        length = self.resolve(obj.get("Length"))
        if isinstance(length, int) and 0 <= length <= len(buf) - pos:
            raw = buf[pos : pos + length]
            after = _skip_ws(buf, pos + length)
            if buf[after : after + 9] != b"endstream":
                end = buf.find(b"endstream", pos)  # tolerate a wrong /Length
                raw = buf[pos:end].rstrip(b"\r\n") if end > 0 else raw
        else:
            end = buf.find(b"endstream", pos)
            if end < 0:
                raise ValueError("not a PDF: unterminated stream")
            raw = buf[pos:end].rstrip(b"\r\n")
        return obj, raw

    def get_object(self, num: int, gen: int = 0) -> object:
        if num in self._cache:
            return self._cache[num]
        ent = self._xref.get(num)
        if ent is None:
            return None  # free / absent objects read as null (spec 7.3.9)
        if ent[0] == "n":
            obj, raw = self._parse_indirect_at(self._off + ent[1])
            if raw is not None:
                obj = StreamObj(obj, raw)
        else:
            obj = self._load_from_objstm(ent[1], ent[2])
        self._cache[num] = obj
        return obj

    def _load_from_objstm(self, stm_num: int, idx: int) -> object:
        if stm_num not in self._objstm_cache:
            stm = self.get_object(stm_num)
            if not isinstance(stm, StreamObj) or stm.dict.get("Type") != "ObjStm":
                raise ValueError("not a PDF: xref points into a non-ObjStm")
            data = self.stream_data(stm)
            n = int(self.resolve(stm.dict["N"]))
            first = int(self.resolve(stm.dict["First"]))
            pairs = []
            p = 0
            for _ in range(n):
                m = _NUM_RE.match(data, _skip_ws(data, p))
                onum = int(m.group(0))
                m2 = _NUM_RE.match(data, _skip_ws(data, m.end()))
                pairs.append((onum, int(m2.group(0))))
                p = m2.end()
            self._objstm_cache[stm_num] = (pairs, data, first)
        pairs, data, first = self._objstm_cache[stm_num]
        if idx >= len(pairs):
            raise ValueError("not a PDF: ObjStm index out of range")
        obj, _ = _parse_object(data, first + pairs[idx][1])
        return obj

    def resolve(self, obj: object, _depth: int = 0) -> object:
        while isinstance(obj, Ref):
            if _depth > 32:
                raise ValueError("not a PDF: reference cycle")
            obj = self.get_object(obj.num, obj.gen)
            _depth += 1
        return obj

    def stream_data(self, stm: StreamObj) -> bytes:
        """Fully-decoded stream bytes (all non-image filters applied)."""
        data, kind = self._stream_payload(stm)
        if kind != "data":
            raise NotImplementedError(
                f"stream filter {kind} yields an image payload, not data "
                "(route through extract_images/operators.jpeg_codec)"
            )
        return data

    def _stream_payload(self, stm: StreamObj) -> tuple[bytes, str]:
        filters = self.resolve(stm.dict.get("Filter"))
        if filters is None:
            filters = []
        elif isinstance(filters, Name):
            filters = [filters]
        parms = self.resolve(stm.dict.get("DecodeParms"))
        if parms is None:
            parms = [None] * len(filters)
        elif isinstance(parms, dict):
            parms = [parms]
        parms = list(parms) + [None] * (len(filters) - len(parms))
        data = stm.raw
        for f, pm in zip(filters, parms):
            fname = str(self.resolve(f))
            pm = self.resolve(pm)
            if fname in _UNSUPPORTED_FILTERS:
                raise NotImplementedError(
                    f"stream filter /{fname} not implemented (spec-valid; "
                    "plug point, same contract as jpeg_codec progressive)"
                )
            if fname in _IMAGE_FILTERS:
                return data, fname
            fn = _FILTERS.get(fname)
            if fn is None:
                raise ValueError(f"not a PDF: unknown stream filter /{fname}")
            data = fn(data, pm if isinstance(pm, dict) else None)
        return data, "data"

    # -- page tree -------------------------------------------------------

    @property
    def catalog(self) -> dict:
        root = self.resolve(self.trailer["Root"])
        if not isinstance(root, dict):
            raise ValueError("not a PDF: /Root is not a dictionary")
        return root

    def pages(self) -> list[dict]:
        """Flattened page list in document order, inheritable attributes
        (/Resources /MediaBox /Rotate) resolved onto each page."""
        out: list[dict] = []
        seen: set[int] = set()

        def walk(node_ref: object, inherited: dict, depth: int) -> None:
            if depth > 64:
                raise ValueError("not a PDF: page tree too deep")
            if isinstance(node_ref, Ref):
                if node_ref.num in seen:
                    raise ValueError("not a PDF: page tree cycle")
                seen.add(node_ref.num)
            node = self.resolve(node_ref)
            if not isinstance(node, dict):
                return
            inh = dict(inherited)
            for k in ("Resources", "MediaBox", "Rotate"):
                if k in node:
                    inh[k] = node[k]
            if node.get("Type") == "Page" or (
                "Contents" in node and "Kids" not in node
            ):
                page = dict(inh)
                page.update(node)
                out.append(page)
                return
            for kid in self.resolve(node.get("Kids", [])) or []:
                walk(kid, inh, depth + 1)

        walk(self.catalog.get("Pages"), {}, 0)
        return out

    @property
    def page_count(self) -> int:
        return len(self.pages())

    # -- text extraction -------------------------------------------------

    def _page_content(self, page: dict) -> bytes:
        contents = self.resolve(page.get("Contents"))
        if contents is None:
            return b""
        if isinstance(contents, StreamObj):
            return self.stream_data(contents)
        parts = []
        for c in contents:
            c = self.resolve(c)
            if isinstance(c, StreamObj):
                parts.append(self.stream_data(c))
        return b"\n".join(parts)

    def _page_fonts(self, page: dict) -> dict[str, "_FontDecoder"]:
        res = self.resolve(page.get("Resources")) or {}
        fonts = self.resolve(res.get("Font")) or {}
        out = {}
        for name, fref in fonts.items():
            fd = self.resolve(fref)
            if isinstance(fd, dict):
                out[str(name)] = _FontDecoder(self, fd)
        return out

    def page_spans(self, page: dict) -> list[tuple[float, float, int, str]]:
        """All text shows on a page as (device_x, device_y, seq, text)."""
        return _extract_spans(self._page_content(page), self._page_fonts(page))

    def page_text(self, page: dict) -> str:
        """Raw reading order, one output line per text line — the
        get_text() analog the full-text path uses
        (extract_and_embed.py:91)."""
        lines: list[str] = []
        cur: list[str] = []
        for kind, text in _extract_lines(
            self._page_content(page), self._page_fonts(page)
        ):
            if kind == "show":
                cur.append(text)
            else:  # line break
                lines.append("".join(cur))
                cur = []
        if cur:
            lines.append("".join(cur))
        return "\n".join(lines)

    def page_text_sorted(self, page: dict) -> str:
        """get_text(sort=True) analog (extract_and_embed_v2.py:398): spans
        grouped into lines by device y (descending — PDF y grows upward),
        each line left-to-right by device x."""
        spans = self.page_spans(page)
        by_line: dict[float, list[tuple[float, int, str]]] = {}
        for x, y, seq, text in spans:
            key = round(y, 1)
            by_line.setdefault(key, []).append((x, seq, text))
        out = []
        for y in sorted(by_line, reverse=True):
            parts = sorted(by_line[y])
            out.append("".join(p[2] for p in parts))
        return "\n".join(out)

    def extract_pages(self) -> list[str]:
        return [self.page_text(p) for p in self.pages()]

    def images(self) -> list[dict]:
        """Image XObjects across all pages: [{page, name, width, height,
        kind, data, ...}]. DCTDecode members pass through as JPEG bytes
        for operators/jpeg_codec.decode_jpeg; Flate members decode to raw
        samples."""
        out = []
        for pno, page in enumerate(self.pages()):
            res = self.resolve(page.get("Resources")) or {}
            xobjs = self.resolve(res.get("XObject")) or {}
            for name, xref_ in xobjs.items():
                x = self.resolve(xref_)
                if not isinstance(x, StreamObj):
                    continue
                if str(self.resolve(x.dict.get("Subtype"))) != "Image":
                    continue
                data, kind = self._stream_payload(x)
                out.append(
                    {
                        "page": pno,
                        "name": str(name),
                        "width": int(self.resolve(x.dict.get("Width", 0))),
                        "height": int(self.resolve(x.dict.get("Height", 0))),
                        "bpc": int(self.resolve(x.dict.get("BitsPerComponent", 8))),
                        "colorspace": str(self.resolve(x.dict.get("ColorSpace", ""))),
                        "kind": "jpeg" if kind in _IMAGE_FILTERS else "raw",
                        "data": data,
                    }
                )
        return out


# --------------------------------------------------------------------------
# fonts / encodings
# --------------------------------------------------------------------------


def _glyph_table() -> dict[str, str]:
    """Minimal Adobe-Glyph-List subset: ASCII + the common Latin-1 names —
    enough to honour /Differences arrays from mainstream generators."""
    t = {
        "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
        "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
        "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
        "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
        "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
        "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
        "backslash": "\\", "bracketright": "]", "asciicircum": "^",
        "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
        "braceright": "}", "asciitilde": "~", "quoteleft": "‘",
        "quoteright": "’", "quotedblleft": "“",
        "quotedblright": "”", "endash": "–", "emdash": "—",
        "bullet": "•", "ellipsis": "…", "fi": "ﬁ",
        "fl": "ﬂ", "degree": "°", "copyright": "©",
        "registered": "®", "trademark": "™", "euro": "€",
        "sterling": "£", "yen": "¥", "cent": "¢",
        "section": "§", "paragraph": "¶", "dagger": "†",
        "daggerdbl": "‡", "nbspace": " ",
    }
    for i in range(10):
        t["zero one two three four five six seven eight nine".split()[i]] = str(i)
    for c in "abcdefghijklmnopqrstuvwxyz":
        t[c] = c
        t[c.upper()] = c.upper()
    return t


_GLYPHS = _glyph_table()


class _FontDecoder:
    """Font byte-string → unicode, honouring /ToUnicode then /Encoding."""

    def __init__(self, doc: PdfDocument, font: dict) -> None:
        self.subtype = str(doc.resolve(font.get("Subtype", "")))
        self.code_bytes = 2 if self.subtype == "Type0" else 1
        self.cmap: dict[int, str] | None = None
        tu = doc.resolve(font.get("ToUnicode"))
        if isinstance(tu, StreamObj):
            self.cmap, width = _parse_tounicode(doc.stream_data(tu))
            if width:
                self.code_bytes = width
        self.base = "cp1252"  # StandardEncoding ~ WinAnsi on the ASCII range
        self.diff: dict[int, str] = {}
        enc = doc.resolve(font.get("Encoding"))
        if isinstance(enc, Name):
            self.base = _BASE_ENCODINGS.get(str(enc), "cp1252")
        elif isinstance(enc, dict):
            self.base = _BASE_ENCODINGS.get(
                str(doc.resolve(enc.get("BaseEncoding", ""))), "cp1252"
            )
            code = 0
            for item in doc.resolve(enc.get("Differences", [])) or []:
                item = doc.resolve(item)
                if isinstance(item, (int, float)):
                    code = int(item)
                elif isinstance(item, Name):
                    name = str(item)
                    if name in _GLYPHS:
                        self.diff[code] = _GLYPHS[name]
                    elif re.fullmatch(r"uni([0-9A-Fa-f]{4})", name):
                        self.diff[code] = chr(int(name[3:], 16))
                    else:
                        self.diff[code] = "�"
                    code += 1

    def decode(self, raw: bytes) -> str:
        if self.code_bytes == 2:
            codes = [
                (raw[i] << 8) | (raw[i + 1] if i + 1 < len(raw) else 0)
                for i in range(0, len(raw), 2)
            ]
            if self.cmap is not None:
                return "".join(self.cmap.get(c, "�") for c in codes)
            # Identity mapping is deterministic but usually wrong — real
            # CID fonts without /ToUnicode carry no text semantics at all.
            return "".join(chr(c) for c in codes)
        out = []
        for b in raw:
            if self.cmap is not None and b in self.cmap:
                out.append(self.cmap[b])
            elif b in self.diff:
                out.append(self.diff[b])
            else:
                out.append(bytes([b]).decode(self.base, "replace"))
        return "".join(out)


_BASE_ENCODINGS = {
    "WinAnsiEncoding": "cp1252",
    "MacRomanEncoding": "mac-roman",
    "StandardEncoding": "cp1252",
    "PDFDocEncoding": "cp1252",
}

_HEX_RE = re.compile(rb"<([0-9A-Fa-f]+)>")


def _parse_tounicode(data: bytes) -> tuple[dict[int, str], int | None]:
    """bfchar/bfrange sections of a /ToUnicode CMap → {code: text}."""

    def hex_code(h: bytes) -> int:
        return int(h, 16)

    def hex_text(h: bytes) -> str:
        b = bytes.fromhex(h.decode("ascii"))
        if len(b) % 2:
            b += b"\x00"
        return b.decode("utf-16-be", "replace")

    width = None
    m = re.search(
        rb"begincodespacerange\s*<([0-9A-Fa-f]+)>\s*<[0-9A-Fa-f]+>", data
    )
    if m:
        width = max(1, len(m.group(1)) // 2)
    cmap: dict[int, str] = {}
    for sec in re.findall(rb"beginbfchar(.*?)endbfchar", data, re.S):
        toks = _HEX_RE.findall(sec)
        for i in range(0, len(toks) - 1, 2):
            cmap[hex_code(toks[i])] = hex_text(toks[i + 1])
    for sec in re.findall(rb"beginbfrange(.*?)endbfrange", data, re.S):
        pos = 0
        while True:
            m1 = _HEX_RE.search(sec, pos)
            if not m1:
                break
            m2 = _HEX_RE.search(sec, m1.end())
            if not m2:
                break
            lo, hi = hex_code(m1.group(1)), hex_code(m2.group(1))
            nxt = _skip_ws(sec, m2.end())
            if sec[nxt : nxt + 1] == b"[":
                end = sec.find(b"]", nxt)
                dsts = _HEX_RE.findall(sec[nxt:end])
                for i, code in enumerate(range(lo, hi + 1)):
                    if i < len(dsts):
                        cmap[code] = hex_text(dsts[i])
                pos = end + 1
            else:
                m3 = _HEX_RE.search(sec, nxt)
                if not m3:
                    break
                base = m3.group(1)
                base_txt = hex_text(base)
                base_code = hex_code(base)
                for code in range(lo, hi + 1):
                    if len(base_txt) == 1:
                        cmap[code] = chr(
                            ord(base_txt) + (code - lo)
                        )
                    else:  # multi-char target: only exact start defined
                        cmap[code] = base_txt if code == lo else "�"
                    _ = base_code
                pos = m3.end()
    return cmap, width


# --------------------------------------------------------------------------
# content-stream text machine
# --------------------------------------------------------------------------

_ID = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def _mat_mul(m1: tuple, m2: tuple) -> tuple:
    a1, b1, c1, d1, e1, f1 = m1
    a2, b2, c2, d2, e2, f2 = m2
    return (
        a1 * a2 + b1 * c2,
        a1 * b2 + b1 * d2,
        c1 * a2 + d1 * c2,
        c1 * b2 + d1 * d2,
        e1 * a2 + f1 * c2 + e2,
        e1 * b2 + f1 * d2 + f2,
    )


_OP_RE = re.compile(rb"[A-Za-z'\"*]+[0-9]*")


def _tokenize_content(buf: bytes):
    """Yield ('obj', value) / ('op', name) tokens from a content stream.
    Inline images (BI .. ID <binary> EI) are skipped wholesale."""
    pos = 0
    n = len(buf)
    while True:
        pos = _skip_ws(buf, pos)
        if pos >= n:
            return
        c = buf[pos]
        if c == 0x2F or c == 0x28 or c == 0x3C or c == 0x5B:
            obj, pos = _parse_object(buf, pos)
            yield ("obj", obj)
            continue
        m = _NUM_RE.match(buf, pos)
        if m:
            tok = m.group(0)
            yield ("obj", float(tok) if b"." in tok else int(tok))
            pos = m.end()
            continue
        m = _OP_RE.match(buf, pos)
        if m:
            op = m.group(0).decode("latin-1")
            pos = m.end()
            if op == "BI":  # inline image: skip to EI after the ID payload
                idp = buf.find(b"ID", pos)
                if idp < 0:
                    return
                e = re.compile(rb"(?:\s)EI(?=\s|$)").search(buf, idp + 2)
                pos = e.end() if e else n
                continue
            yield ("op", op)
            continue
        pos += 1  # tolerate stray bytes (mirrors lenient real readers)


def _run_text_machine(buf: bytes, fonts: dict[str, _FontDecoder]):
    """Drive the spec 9.4 text-object state machine; yield
    ('show', x, y, text) and ('newline',) events in content order."""
    ctm = _ID
    ctm_stack: list[tuple] = []
    tm = tlm = _ID
    tl = 0.0
    font: _FontDecoder | None = None
    stack: list[object] = []

    def dev_xy() -> tuple[float, float]:
        m = _mat_mul(tm, ctm)
        return m[4], m[5]

    def decode(s: object) -> str:
        raw = s if isinstance(s, bytes) else b""
        if font is not None:
            return font.decode(raw)
        return raw.decode("cp1252", "replace")

    for kind, val in _tokenize_content(buf):
        if kind == "obj":
            stack.append(val)
            continue
        op = val
        try:
            if op == "q":
                ctm_stack.append(ctm)
            elif op == "Q":
                ctm = ctm_stack.pop() if ctm_stack else _ID
            elif op == "cm":
                a, b, c, d, e, f = (float(x) for x in stack[-6:])
                ctm = _mat_mul((a, b, c, d, e, f), ctm)
            elif op == "BT":
                tm = tlm = _ID
                yield ("newline",)
            elif op == "ET":
                yield ("newline",)
            elif op == "Tf":
                font = fonts.get(str(stack[-2]))
            elif op == "TL":
                tl = float(stack[-1])
            elif op == "Td":
                tx, ty = float(stack[-2]), float(stack[-1])
                tlm = _mat_mul((1, 0, 0, 1, tx, ty), tlm)
                tm = tlm
                yield ("newline",)
            elif op == "TD":
                tx, ty = float(stack[-2]), float(stack[-1])
                tl = -ty
                tlm = _mat_mul((1, 0, 0, 1, tx, ty), tlm)
                tm = tlm
                yield ("newline",)
            elif op == "Tm":
                a, b, c, d, e, f = (float(x) for x in stack[-6:])
                tlm = tm = (a, b, c, d, e, f)
                yield ("newline",)
            elif op == "T*":
                tlm = _mat_mul((1, 0, 0, 1, 0.0, -tl), tlm)
                tm = tlm
                yield ("newline",)
            elif op == "Tj":
                x, y = dev_xy()
                yield ("show", x, y, decode(stack[-1]))
            elif op == "'":
                tlm = _mat_mul((1, 0, 0, 1, 0.0, -tl), tlm)
                tm = tlm
                yield ("newline",)
                x, y = dev_xy()
                yield ("show", x, y, decode(stack[-1]))
            elif op == '"':
                tlm = _mat_mul((1, 0, 0, 1, 0.0, -tl), tlm)
                tm = tlm
                yield ("newline",)
                x, y = dev_xy()
                yield ("show", x, y, decode(stack[-1]))
            elif op == "TJ":
                x, y = dev_xy()
                parts = [
                    decode(item)
                    for item in stack[-1]
                    if isinstance(item, bytes)
                ]
                yield ("show", x, y, "".join(parts))
        except (IndexError, TypeError, ValueError):
            pass  # malformed operand run: skip the op, keep reading
        stack = []


def _extract_lines(buf: bytes, fonts: dict) -> list[tuple[str, str]]:
    """('show', text) / ('break', '') events with empty leading/duplicate
    breaks collapsed — a line exists once it has at least one show."""
    out: list[tuple[str, str]] = []
    line_open = False
    for ev in _run_text_machine(buf, fonts):
        if ev[0] == "show":
            out.append(("show", ev[3]))
            line_open = True
        elif line_open:
            out.append(("break", ""))
            line_open = False
    return out


def _extract_spans(buf: bytes, fonts: dict) -> list[tuple[float, float, int, str]]:
    spans = []
    for ev in _run_text_machine(buf, fonts):
        if ev[0] == "show":
            spans.append((ev[1], ev[2], len(spans), ev[3]))
    return [(x, y, seq, t) for (x, y, seq, t) in spans]


# --------------------------------------------------------------------------
# public byte-level API (the UDF surface)
# --------------------------------------------------------------------------


def parse_pdf(data: bytes) -> PdfDocument:
    """Parse with the jpeg_codec-style corrupt-input contract: structural
    garbage raises ValueError('not a PDF: ...'); in-scope-but-unsupported
    features raise NotImplementedError."""
    try:
        return PdfDocument(data)
    except (ValueError, NotImplementedError):
        raise
    except (IndexError, KeyError, TypeError, AttributeError, struct.error,
            zlib.error, OverflowError, RecursionError) as exc:
        raise ValueError(f"not a PDF: {type(exc).__name__}: {exc}") from exc


def extract_pages(data: bytes) -> list[str]:
    """Per-page text in raw reading order — the pure-Python analog of the
    reference's `[page.get_text() for page in doc]`
    (extract_and_embed.py:90-91); callers join with "\\n"."""
    doc = parse_pdf(data)
    try:
        return doc.extract_pages()
    except (ValueError, NotImplementedError):
        raise
    except (IndexError, KeyError, TypeError, AttributeError, struct.error,
            zlib.error, OverflowError, RecursionError) as exc:
        raise ValueError(f"not a PDF: {type(exc).__name__}: {exc}") from exc


def first_page_sorted(data: bytes) -> str:
    """Page-1 text in top-to-bottom / left-to-right order — the
    `doc[0].get_text(sort=True)` analog (extract_and_embed_v2.py:398)."""
    doc = parse_pdf(data)
    pages = doc.pages()
    return doc.page_text_sorted(pages[0]) if pages else ""


def extract_images(data: bytes) -> list[dict]:
    return parse_pdf(data).images()


def pdf_meta(data: bytes) -> dict:
    """Cheap structural metadata (decode_media_meta analog for PDFs)."""
    doc = parse_pdf(data)
    info = doc.resolve(doc.trailer.get("Info")) or {}
    title = info.get("Title") if isinstance(info, dict) else None
    return {
        "version": doc.version,
        "page_count": doc.page_count,
        "title": title.decode("cp1252", "replace")
        if isinstance(title, bytes)
        else None,
    }


# --------------------------------------------------------------------------
# writer (deterministic fixture generator / mirror encoder)
# --------------------------------------------------------------------------


def _esc_literal(s: str) -> bytes:
    b = s.encode("cp1252", "replace")
    return b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")


def _content_stream(lines: list[str], *, x0: int, y0: int, leading: int) -> bytes:
    parts = [b"BT /F1 12 Tf %d TL %d %d Td" % (leading, x0, y0)]
    for i, line in enumerate(lines):
        if i:
            parts.append(b"T*")
        parts.append(b"(" + _esc_literal(line) + b") Tj")
    parts.append(b"ET")
    return b" ".join(parts)


def write_pdf(
    pages: list[str],
    *,
    compress: bool = True,
    xref_stream: bool = False,
    use_objstm: bool = False,
    title: str | None = None,
    media_box: tuple[int, int] = (612, 792),
    start_xy: tuple[int, int] = (72, 720),
    leading: int = 14,
) -> bytes:
    """Byte-deterministic PDF: each page string becomes Helvetica text
    lines (split on \\n) shown via Td/TL/T*/Tj. `xref_stream` writes the
    PDF-1.5 /Type /XRef layout (rows packed /W [1 4 2] under the PNG Up
    predictor); `use_objstm` additionally packs the non-stream objects
    into a compressed /Type /ObjStm. The reader round-trips every mode:
    extract_pages(write_pdf(pages)) == [p for p in pages] line-exact."""
    if use_objstm:
        xref_stream = True
    n_pages = len(pages)
    # object numbers: 1 Catalog, 2 Pages, 3 Font, 4 Info,
    # then per page i: 5+2i Page, 6+2i Contents; optional ObjStm/XRef last
    page_obj = [5 + 2 * i for i in range(n_pages)]
    cont_obj = [6 + 2 * i for i in range(n_pages)]
    next_obj = 5 + 2 * n_pages

    bodies: dict[int, bytes] = {}
    stream_objs: dict[int, tuple[bytes, bytes]] = {}  # num -> (dict part, data)

    kids = b" ".join(b"%d 0 R" % p for p in page_obj)
    bodies[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    bodies[2] = b"<< /Type /Pages /Kids [ %s ] /Count %d /MediaBox [ 0 0 %d %d ] >>" % (
        kids,
        n_pages,
        media_box[0],
        media_box[1],
    )
    bodies[3] = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        b" /Encoding /WinAnsiEncoding >>"
    )
    bodies[4] = (
        b"<< /Producer (pdf_parse_vector_db_spark) %s>>"
        % (b"/Title (" + _esc_literal(title) + b") " if title else b"")
    )
    for i in range(n_pages):
        bodies[page_obj[i]] = (
            b"<< /Type /Page /Parent 2 0 R /Contents %d 0 R"
            b" /Resources << /Font << /F1 3 0 R >> >> >>" % cont_obj[i]
        )
        data = _content_stream(
            pages[i].split("\n"), x0=start_xy[0], y0=start_xy[1], leading=leading
        )
        if compress:
            comp = zlib.compress(data, 9)
            stream_objs[cont_obj[i]] = (
                b"<< /Length %d /Filter /FlateDecode >>" % len(comp),
                comp,
            )
        else:
            stream_objs[cont_obj[i]] = (b"<< /Length %d >>" % len(data), data)

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n" if xref_stream else
                    b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    in_objstm: dict[int, int] = {}  # objnum -> index within the ObjStm

    def emit(num: int, dict_part: bytes, stream: bytes | None = None) -> None:
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n" % num)
        out.extend(dict_part)
        if stream is not None:
            out.extend(b"\nstream\n")
            out.extend(stream)
            out.extend(b"\nendstream")
        out.extend(b"\nendobj\n")

    if use_objstm:
        # pack all plain-dict objects into one compressed object stream
        objstm_num = next_obj
        next_obj += 1
        members = sorted(bodies)
        header = bytearray()
        payload = bytearray()
        for idx, num in enumerate(members):
            in_objstm[num] = idx
        for num in members:
            header += b"%d %d " % (num, len(payload))
            payload += bodies[num] + b"\n"
        stm = bytes(header) + bytes(payload)
        comp = zlib.compress(stm, 9)
        emit(
            objstm_num,
            b"<< /Type /ObjStm /N %d /First %d /Length %d /Filter /FlateDecode >>"
            % (len(members), len(header), len(comp)),
            comp,
        )
    else:
        for num in sorted(bodies):
            emit(num, bodies[num])
    for num in sorted(stream_objs):
        dict_part, data = stream_objs[num]
        emit(num, dict_part, data)

    if not xref_stream:
        xref_pos = len(out)
        max_obj = max(offsets)
        out.extend(b"xref\n0 %d\n" % (max_obj + 1))
        out.extend(b"0000000000 65535 f \n")
        for num in range(1, max_obj + 1):
            out.extend(b"%010d 00000 n \n" % offsets.get(num, 0))
        out.extend(
            b"trailer\n<< /Size %d /Root 1 0 R /Info 4 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (max_obj + 1, xref_pos)
        )
        return bytes(out)

    # ---- cross-reference stream layout ----
    xref_num = next_obj
    size = xref_num + 1
    rows = []
    for num in range(size):
        if num == 0:
            rows.append((0, 0, 65535))
        elif num in in_objstm:
            rows.append((2, objstm_num, in_objstm[num]))
        elif num in offsets:
            rows.append((1, offsets[num], 0))
        elif num == xref_num:
            rows.append((1, 0, 0))  # patched below once position is known
        else:
            rows.append((0, 0, 0))
    xref_pos = len(out)
    rows[xref_num] = (1, xref_pos, 0)
    w = (1, 4, 2)
    packed = bytearray()
    prev_row = bytes(sum(w))
    for t, f2, f3 in rows:
        row = struct.pack(">B I H", t, f2, f3)
        # PNG Up filter (type 2): delta against the previous row, so the
        # reader's predictor-12 un-filter path is exercised by round trips
        packed.append(2)
        packed.extend((row[i] - prev_row[i]) & 0xFF for i in range(len(row)))
        prev_row = row
    comp = zlib.compress(bytes(packed), 9)
    xdict = (
        b"<< /Type /XRef /Size %d /W [ 1 4 2 ] /Index [ 0 %d ]"
        b" /Filter /FlateDecode"
        b" /DecodeParms << /Predictor 12 /Columns %d >>"
        b" /Length %d /Root 1 0 R /Info 4 0 R >>" % (size, size, sum(w), len(comp))
    )
    emit(xref_num, xdict, comp)
    out.extend(b"startxref\n%d\n%%%%EOF\n" % xref_pos)
    return bytes(out)


def write_pdf_with_jpeg(
    text: str,
    jpeg: bytes,
    width: int,
    height: int,
    *,
    grayscale: bool = False,
) -> bytes:
    """One-page PDF embedding `jpeg` as a /DCTDecode image XObject (the
    DCTDecode stream a real PDF carries verbatim) below the text — the
    cross-codec fixture: extract_images() returns these exact bytes and
    operators/jpeg_codec.decode_jpeg turns them into pixels."""
    content = _content_stream(text.split("\n"), x0=72, y0=720, leading=14)
    content += b" q %d 0 0 %d 72 %d cm /Im1 Do Q" % (width, height, 400)
    cs = b"/DeviceGray" if grayscale else b"/DeviceRGB"
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}

    def emit(num: int, dict_part: bytes, stream: bytes | None = None) -> None:
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n" % num)
        out.extend(dict_part)
        if stream is not None:
            out.extend(b"\nstream\n" + stream + b"\nendstream")
        out.extend(b"\nendobj\n")

    emit(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    emit(
        2,
        b"<< /Type /Pages /Kids [ 3 0 R ] /Count 1 /MediaBox [ 0 0 612 792 ] >>",
    )
    emit(
        3,
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R /Resources"
        b" << /Font << /F1 5 0 R >> /XObject << /Im1 6 0 R >> >> >>",
    )
    emit(4, b"<< /Length %d >>" % len(content), content)
    emit(
        5,
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        b" /Encoding /WinAnsiEncoding >>",
    )
    emit(
        6,
        b"<< /Type /XObject /Subtype /Image /Width %d /Height %d"
        b" /ColorSpace %s /BitsPerComponent 8 /Filter /DCTDecode /Length %d >>"
        % (width, height, cs, len(jpeg)),
        jpeg,
    )
    xref_pos = len(out)
    out.extend(b"xref\n0 7\n0000000000 65535 f \n")
    for num in range(1, 7):
        out.extend(b"%010d 00000 n \n" % offsets[num])
    out.extend(
        b"trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % xref_pos
    )
    return bytes(out)
