"""Pure-stdlib PDF parser/writer (operators/pdf_codec.py).

Mirrors the jpeg/png/wav codec test strategy: writer→reader round trips
across every layout the writer can emit, an ENCODER-FREE hand-assembled
fixture (so decode correctness never rests on inverting our own writer),
filter-tier unit fixtures (ASCIIHex/ASCII85/RunLength/LZW/predictors),
the cross-codec DCTDecode contract against operators/jpeg_codec, and the
loud error tiers (ValueError for garbage, NotImplementedError for
spec-valid-but-out-of-scope: encryption, JBIG2/CCITT)."""

from __future__ import annotations

import base64
import zlib

import pytest

from pdf_parse_vector_db_spark.operators import pdf_codec as P


# -------------------------------------------------------------------------
# writer → reader round trips
# -------------------------------------------------------------------------

PAGES = [
    "FIRST DISTRICT COURT\nCase No. 2023-0042\n\nJudgment for appellant",
    "page two body\nwith a second line",
    "",
]


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"compress": False},
        {"xref_stream": True},
        {"use_objstm": True},
    ],
    ids=["classic", "uncompressed", "xrefstream", "objstm"],
)
def test_round_trip_layouts(kw):
    data = P.write_pdf(PAGES, **kw)
    assert P.extract_pages(data) == PAGES
    meta = P.pdf_meta(data)
    assert meta["page_count"] == 3


def test_round_trip_escapes_and_cp1252():
    tricky = "parens () and \\ backslash\n(nested (deep)) %comment-ish\ntab\there"
    assert P.extract_pages(P.write_pdf([tricky])) == [tricky]
    latin = "café — naïve • résumé"  # cp1252-representable beyond ASCII
    assert P.extract_pages(P.write_pdf([latin])) == [latin]


def test_round_trip_empty_and_many_pages():
    assert P.extract_pages(P.write_pdf([])) == []
    assert P.extract_pages(P.write_pdf([""])) == [""]
    pages = [f"page {i}\nsecond line {i}" for i in range(40)]
    assert P.extract_pages(P.write_pdf(pages, use_objstm=True)) == pages


def test_title_and_version_metadata():
    m = P.pdf_meta(P.write_pdf(["x"], title="Case (42) \\ escaped"))
    assert m == {"version": "1.4", "page_count": 1, "title": "Case (42) \\ escaped"}
    assert P.pdf_meta(P.write_pdf(["x"], xref_stream=True))["version"] == "1.5"


# -------------------------------------------------------------------------
# encoder-free fixture: hand-assembled bytes, never touched by write_pdf
# -------------------------------------------------------------------------


def _hand_pdf() -> bytes:
    """Uncompressed classic-xref PDF written by hand: two content streams
    in a /Contents ARRAY, literal strings with octal + named escapes, a
    hex-string show, TD and ' operators — none of which our writer emits
    in this combination."""
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1"
        b" /MediaBox [0 0 612 792 ] >>",
        3: b"<< /Type /Page /Parent 2 0 R /Contents [4 0 R 6 0 R]"
        b" /Resources << /Font << /F9 5 0 R >> >> >>",
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier"
        b" /Encoding /WinAnsiEncoding >>",
    }
    c1 = b"BT /F9 10 Tf 20 TL 72 700 Td (Hex:) Tj <20416220432044> Tj ET"
    c2 = (
        b"BT /F9 10 Tf 72 650 Td (O\\143tal \\050esc\\051) Tj"
        b" 0 -20 TD (line two via TD) Tj"
        b" (line three via quote) ' ET"
    )
    streams = {4: c1, 6: c2}
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objs | streams):
        offsets[num] = len(out)
        out += b"%d 0 obj\n" % num
        if num in objs:
            out += objs[num]
        else:
            out += b"<< /Length %d >>\nstream\n" % len(streams[num])
            out += streams[num] + b"\nendstream"
        out += b"\nendobj\n"
    xref = len(out)
    out += b"xref\n0 7\n0000000000 65535 f \n"
    for num in range(1, 7):
        out += b"%010d 00000 n \n" % offsets[num]
    out += b"trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % xref
    return bytes(out)


def test_hand_assembled_fixture_decodes_exactly():
    pages = P.extract_pages(_hand_pdf())
    assert pages == [
        "Hex: Ab C D\nOctal (esc)\nline two via TD\nline three via quote"
    ]


def test_hand_fixture_sorted_order_is_device_order():
    # raw order == content order here, but sort must order by y descending:
    # the second content stream draws at y=650 < 700, so sorted output
    # keeps the same top-to-bottom sequence — and a deliberately
    # out-of-order fixture must be REORDERED (built below).
    objs_page = _hand_pdf()
    assert P.first_page_sorted(objs_page).startswith("Hex: Ab C D")


def _out_of_order_pdf() -> bytes:
    """Content draws the visually-LOWER line first; sort=True must flip."""
    content = (
        b"BT /F1 10 Tf 72 100 Td (bottom line) Tj ET"
        b" BT /F1 10 Tf 72 700 Td (top line) Tj ET"
    )
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}

    def emit(num, body, stream=None):
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n" % num + body)
        if stream is not None:
            out.extend(b"\nstream\n" + stream + b"\nendstream")
        out.extend(b"\nendobj\n")

    emit(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    emit(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>")
    emit(
        3,
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
        b" /Resources << /Font << /F1 5 0 R >> >> >>",
    )
    emit(4, b"<< /Length %d >>" % len(content), content)
    emit(5, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    xref = len(out)
    out += b"xref\n0 6\n0000000000 65535 f \n"
    for num in range(1, 6):
        out += b"%010d 00000 n \n" % offsets[num]
    out += b"trailer\n<< /Size 6 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % xref
    return bytes(out)


def test_sort_true_reorders_raw_does_not():
    data = _out_of_order_pdf()
    assert P.extract_pages(data) == ["bottom line\ntop line"]  # content order
    assert P.first_page_sorted(data) == "top line\nbottom line"  # device order


# -------------------------------------------------------------------------
# filters
# -------------------------------------------------------------------------


def _one_stream_pdf(filter_spec: bytes, raw: bytes, decode_parms: bytes = b"") -> bytes:
    content_plain = b"BT /F1 10 Tf 72 700 Td (filtered) Tj ET"
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}

    def emit(num, body, stream=None):
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n" % num + body)
        if stream is not None:
            out.extend(b"\nstream\n" + stream + b"\nendstream")
        out.extend(b"\nendobj\n")

    emit(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    emit(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>")
    emit(3, b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    emit(
        4,
        b"<< /Length %d /Filter %s %s>>" % (len(raw), filter_spec, decode_parms),
        raw,
    )
    xref = len(out)
    out += b"xref\n0 5\n0000000000 65535 f \n"
    for num in range(1, 5):
        out += b"%010d 00000 n \n" % offsets[num]
    out += b"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % xref
    return bytes(out), content_plain


def test_ascii_hex_filter():
    plain = b"BT /F1 10 Tf 72 700 Td (filtered) Tj ET"
    data, _ = _one_stream_pdf(b"/ASCIIHexDecode", plain.hex().encode() + b">")
    assert P.extract_pages(data) == ["filtered"]


def test_ascii85_filter():
    plain = b"BT /F1 10 Tf 72 700 Td (filtered) Tj ET"
    data, _ = _one_stream_pdf(b"/ASCII85Decode", base64.a85encode(plain) + b"~>")
    assert P.extract_pages(data) == ["filtered"]


def test_ascii85_then_flate_chain():
    plain = b"BT /F1 10 Tf 72 700 Td (filtered) Tj ET"
    enc = base64.a85encode(zlib.compress(plain)) + b"~>"
    data, _ = _one_stream_pdf(b"[/ASCII85Decode /FlateDecode]", enc)
    assert P.extract_pages(data) == ["filtered"]


def test_run_length_filter():
    plain = b"BT /F1 10 Tf 72 700 Td (filtered) Tj ET"

    def rle(b: bytes) -> bytes:  # naive literal-only RLE
        out = bytearray()
        for i in range(0, len(b), 100):
            chunk = b[i : i + 100]
            out.append(len(chunk) - 1)
            out += chunk
        out.append(128)
        return bytes(out)

    data, _ = _one_stream_pdf(b"/RunLengthDecode", rle(plain))
    assert P.extract_pages(data) == ["filtered"]


def _lzw_encode_literal(b: bytes) -> bytes:
    """Minimal valid LZW: clear, then one 9..N-bit code per input byte,
    then EOD — exercises the decoder's table growth and width bumps."""
    codes = [256] + list(b) + [257]
    out = bytearray()
    acc = 0
    nbits = 0
    width = 9
    table_len = 258
    for c in codes:
        acc = (acc << width) | c
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        if c not in (256, 257):
            table_len += 1  # decoder adds an entry per post-first code
            if table_len + 1 - 1 >= (1 << width) and width < 12:
                width += 1
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_lzw_filter():
    plain = b"BT /F1 10 Tf 72 700 Td (filtered) Tj ET"
    data, _ = _one_stream_pdf(b"/LZWDecode", _lzw_encode_literal(plain))
    assert P.extract_pages(data) == ["filtered"]


def test_flate_png_predictor_roundtrip_via_xref_stream():
    """xref_stream mode stores its rows under /Predictor 12 with the PNG
    Up filter — parsing the file at all proves the un-predictor."""
    data = P.write_pdf(["predictor pin"], xref_stream=True)
    assert b"/Predictor 12" in data
    assert P.extract_pages(data) == ["predictor pin"]


def test_tiff_predictor_2():
    plain = b"ABCDEFGH"  # one 8-byte row, colors=1
    diff = bytes([plain[0]] + [(plain[i] - plain[i - 1]) & 0xFF for i in range(1, 8)])
    out = P._flate_decode(
        zlib.compress(diff), {"Predictor": 2, "Columns": 8, "Colors": 1}
    )
    assert out == plain


# -------------------------------------------------------------------------
# fonts: /Differences and /ToUnicode
# -------------------------------------------------------------------------


def _font_pdf(font_body: bytes, content: bytes, extra_objs: dict | None = None):
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}

    def emit(num, body, stream=None):
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n" % num + body)
        if stream is not None:
            out.extend(b"\nstream\n" + stream + b"\nendstream")
        out.extend(b"\nendobj\n")

    emit(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    emit(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>")
    emit(
        3,
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
        b" /Resources << /Font << /F1 5 0 R >> >> >>",
    )
    emit(4, b"<< /Length %d >>" % len(content), content)
    emit(5, font_body)
    for num, (body, stream) in (extra_objs or {}).items():
        emit(num, body, stream)
    top = max(offsets)
    xref = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (top + 1)
    for num in range(1, top + 1):
        out += b"%010d 00000 n \n" % offsets.get(num, 0)
    out += b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % (
        top + 1,
        xref,
    )
    return bytes(out)


def test_encoding_differences():
    """Codes 65/66 remapped via /Differences to glyphs zed + uni0041."""
    font = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding"
        b" << /BaseEncoding /WinAnsiEncoding /Differences [65 /z /uni0042] >> >>"
    )
    content = b"BT /F1 10 Tf 72 700 Td (AB plain CD) Tj ET"
    data = _font_pdf(font, content)
    assert P.extract_pages(data) == ["zB plain CD"]


def test_tounicode_cmap_bfchar_and_bfrange():
    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"1 begincodespacerange <00> <FF> endcodespacerange\n"
        b"2 beginbfchar <41> <0058> <42> <20AC> endbfchar\n"
        b"1 beginbfrange <61> <63> <0070> endbfrange\n"
        b"endcmap end\n"
    )
    font = (
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica"
        b" /ToUnicode 6 0 R >>"
    )
    content = b"BT /F1 10 Tf 72 700 Td (ABabc) Tj ET"
    data = _font_pdf(
        font, content, {6: (b"<< /Length %d >>" % len(cmap), cmap)}
    )
    # A->X, B->EURO SIGN via bfchar; a,b,c -> p,q,r via bfrange
    assert P.extract_pages(data) == ["X€pqr"]


def test_type0_two_byte_codes_with_tounicode():
    cmap = (
        b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"2 beginbfchar <0041> <0057> <0042> <0105> endbfchar\n"
    )
    font = b"<< /Type /Font /Subtype /Type0 /BaseFont /X /ToUnicode 6 0 R >>"
    content = b"BT /F1 10 Tf 72 700 Td <00410042> Tj ET"
    data = _font_pdf(font, content, {6: (b"<< /Length %d >>" % len(cmap), cmap)})
    assert P.extract_pages(data) == ["Wą"]


# -------------------------------------------------------------------------
# images / cross-codec
# -------------------------------------------------------------------------


def test_dctdecode_image_passthrough_and_jpeg_codec_decode():
    import numpy as np

    from pdf_parse_vector_db_spark.operators import jpeg_codec as J

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (16, 24, 3)).astype(np.uint8)
    jpg = J.encode_jpeg(img)
    data = P.write_pdf_with_jpeg("caption", jpg, 24, 16)
    imgs = P.extract_images(data)
    assert len(imgs) == 1
    assert imgs[0]["kind"] == "jpeg"
    assert imgs[0]["data"] == jpg  # byte-verbatim DCTDecode passthrough
    assert (imgs[0]["width"], imgs[0]["height"]) == (24, 16)
    dec = J.decode_jpeg(imgs[0]["data"])
    assert dec.shape == img.shape
    # lossy but bounded (same contract as test_jpeg_codec round trips)
    assert float(np.abs(dec.astype(int) - img.astype(int)).mean()) < 24.0
    assert P.extract_pages(data) == ["caption"]  # text unharmed by the Do op


def test_flate_raw_image_extraction():
    samples = bytes(range(48))  # 4x4 RGB
    comp = zlib.compress(samples)
    img_obj = (
        b"<< /Type /XObject /Subtype /Image /Width 4 /Height 4"
        b" /ColorSpace /DeviceRGB /BitsPerComponent 8"
        b" /Filter /FlateDecode /Length %d >>" % len(comp)
    )
    content = b"q 4 0 0 4 72 400 cm /Im1 Do Q"
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}

    def emit(num, body, stream=None):
        offsets[num] = len(out)
        out.extend(b"%d 0 obj\n" % num + body)
        if stream is not None:
            out.extend(b"\nstream\n" + stream + b"\nendstream")
        out.extend(b"\nendobj\n")

    emit(1, b"<< /Type /Catalog /Pages 2 0 R >>")
    emit(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 /MediaBox [0 0 612 792] >>")
    emit(
        3,
        b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R"
        b" /Resources << /XObject << /Im1 6 0 R >> >> >>",
    )
    emit(4, b"<< /Length %d >>" % len(content), content)
    emit(6, img_obj, comp)
    xref = len(out)
    out += b"xref\n0 7\n0000000000 65535 f \n"
    for num in range(1, 7):
        out += b"%010d 00000 n \n" % offsets.get(num, 0)
    out += b"trailer\n<< /Size 7 /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n" % xref
    imgs = P.extract_images(bytes(out))
    assert len(imgs) == 1
    assert imgs[0]["kind"] == "raw"
    assert imgs[0]["data"] == samples
    assert imgs[0]["colorspace"] == "DeviceRGB"


# -------------------------------------------------------------------------
# error tiers
# -------------------------------------------------------------------------


def test_not_a_pdf_value_errors():
    for bad in [b"", b"garbage", b"%PDF-1.4\nno xref", b"\x00" * 64]:
        with pytest.raises(ValueError, match="not a PDF"):
            P.extract_pages(bad)


def test_encrypted_raises_not_implemented():
    data = P.write_pdf(["secret"])
    # splice an /Encrypt key into the trailer dictionary
    data = data.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 99 0 R")
    with pytest.raises(NotImplementedError, match="[Ee]ncrypt"):
        P.parse_pdf(data)


def test_unsupported_filter_raises_not_implemented():
    plain = b"BT ET"
    data, _ = _one_stream_pdf(b"/JBIG2Decode", plain)
    with pytest.raises(NotImplementedError, match="JBIG2"):
        P.extract_pages(data)


def test_truncated_tail_of_valid_pdf_is_value_error():
    data = P.write_pdf(["hello"])
    with pytest.raises(ValueError, match="not a PDF"):
        P.extract_pages(data[: len(data) // 2])


def test_corrupt_interior_bytes_raise_loudly_not_garbage():
    data = bytearray(P.write_pdf(["hello corruption"], compress=False))
    # zero out a span inside the first object region
    start = bytes(data).find(b"1 0 obj")
    data[start : start + 40] = b"\x00" * 40
    with pytest.raises((ValueError, NotImplementedError)):
        P.extract_pages(bytes(data))
