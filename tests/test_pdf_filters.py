"""Pure-Python PDF stream-filter codecs (functions/codecs.py): LZW,
ASCIIHex, ASCII85, RunLength, and chained filter arrays — the SRC1
boundary beyond FlateDecode (reference decodes via PyMuPDF,
utils.py:12-13; this environment has none, so the fallback must cover
every text-capable filter).

The LZW decoder is validated against the worked example in the PDF
spec (ISO 32000-1 §7.4.4.2, Example 2) — a known input/output vector,
not just a roundtrip against our own encoder.
"""

from __future__ import annotations

import zlib

import pytest

from resume_jd_matcher_spark.functions.codecs import (
    DecodeError,
    lzw_decode,
    pdf_extract_text,
)

CONTENT = b"BT /F1 12 Tf (Hello filter world) Tj ET"
EXPECTED = "Hello filter world"


def _mini_pdf(stream_body: bytes, filter_spec: bytes | None) -> bytes:
    """Smallest PDF shape the scanner understands: one stream object
    with an explicit /Filter entry."""
    filt = b" /Filter " + filter_spec if filter_spec else b""
    return (
        b"%PDF-1.4\n1 0 obj\n<< /Length "
        + str(len(stream_body)).encode()
        + filt
        + b" >>\nstream\n"
        + stream_body
        + b"\nendstream\nendobj\ntrailer\n%%EOF\n"
    )


def _lzw_encode(data: bytes, early_change: int = 1) -> bytes:
    """Test-side LZW encoder (spec bit-width discipline) for building
    fixtures; the decoder's correctness is pinned separately by the
    spec vector below."""
    table = {bytes([i]): i for i in range(256)}
    next_code, bits = 258, 9
    out = bytearray()
    buf = nbits = 0

    def emit(code: int) -> None:
        nonlocal buf, nbits
        buf = (buf << bits) | code
        nbits += bits
        while nbits >= 8:
            out.append((buf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    emit(256)  # leading clear-table, as PDF writers emit
    w = b""
    for ch in data:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
        else:
            emit(table[w])
            table[wc] = next_code
            next_code += 1
            # the decoder's table lags the encoder's by one entry, so
            # the encoder widens one code later than the decoder's
            # `next_code >= 2^bits - early_change` check
            if bits < 12 and next_code > (1 << bits) - early_change:
                bits += 1
            w = bytes([ch])
    if w:
        emit(table[w])
    emit(257)  # EOD
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_lzw_spec_vector():
    """ISO 32000-1 §7.4.4.2 Example 2: 45 45 45 45 45 65 45 45 45 66
    encodes to 80 0B 60 50 22 0C 0C 85 01."""
    encoded = bytes.fromhex("800B6050220C0C8501")
    assert lzw_decode(encoded) == bytes([45, 45, 45, 45, 45, 65, 45, 45, 45, 66])


def test_lzw_roundtrip_across_width_growth():
    """A payload large enough to push the code table past 511 entries
    exercises the 9->10 bit width switch on both sides."""
    data = bytes((i * 7 + (i >> 3)) % 251 for i in range(6000))
    assert lzw_decode(_lzw_encode(data)) == data


def test_lzw_corrupt_raises():
    with pytest.raises(DecodeError):
        # first code after implicit table state refers past the table
        lzw_decode(bytes.fromhex("FFFF"))


def test_pdf_lzw_stream():
    blob = _mini_pdf(_lzw_encode(CONTENT), b"/LZWDecode")
    assert EXPECTED.encode() not in blob  # genuinely compressed
    assert EXPECTED in pdf_extract_text(blob)


def test_pdf_asciihex_stream():
    body = CONTENT.hex().encode("ascii") + b">"
    assert EXPECTED in pdf_extract_text(_mini_pdf(body, b"/ASCIIHexDecode"))


def test_pdf_ascii85_stream():
    import base64

    body = base64.a85encode(CONTENT) + b"~>"
    assert EXPECTED in pdf_extract_text(_mini_pdf(body, b"/ASCII85Decode"))


def test_pdf_runlength_stream():
    # literal runs of <=128 bytes, terminated by the 128 EOD marker
    body = b""
    for i in range(0, len(CONTENT), 100):
        chunk = CONTENT[i : i + 100]
        body += bytes([len(chunk) - 1]) + chunk
    body += bytes([128])
    assert EXPECTED in pdf_extract_text(_mini_pdf(body, b"/RunLengthDecode"))


def test_pdf_chained_filters_decode_in_array_order():
    """[/ASCII85Decode /FlateDecode]: decode applies A85 first, then
    inflate — the spec's array order."""
    import base64

    body = base64.a85encode(zlib.compress(CONTENT)) + b"~>"
    blob = _mini_pdf(body, b"[/ASCII85Decode /FlateDecode]")
    assert EXPECTED in pdf_extract_text(blob)


def test_pdf_image_only_filter_skipped():
    """A DCTDecode (JPEG) stream carries no text: it must be skipped,
    not crash the decoder, and other streams still decode."""
    jpeg_like = b"\xff\xd8\xff\xe0 not really a jpeg \xff\xd9"
    img_obj = (
        b"2 0 obj\n<< /Length "
        + str(len(jpeg_like)).encode()
        + b" /Filter /DCTDecode >>\nstream\n"
        + jpeg_like
        + b"\nendstream\nendobj\n"
    )
    text_pdf = _mini_pdf(CONTENT, None)
    blob = text_pdf.replace(b"trailer", img_obj + b"trailer")
    assert EXPECTED in pdf_extract_text(blob)


def test_pdf_flate_without_declared_filter_still_inflates():
    """Historical fallback: a stream whose dict our scanner finds no
    /Filter in is still tried as Flate, then as raw bytes."""
    assert EXPECTED in pdf_extract_text(_mini_pdf(zlib.compress(CONTENT), None))
    assert EXPECTED in pdf_extract_text(_mini_pdf(CONTENT, None))


def test_lzw_roundtrip_fuzz():
    """Property: decode(encode(x)) == x for arbitrary byte strings,
    including ones that force table clears at every width."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=200, deadline=None)
    @given(st.binary(min_size=0, max_size=2000))
    def prop(data):
        assert lzw_decode(_lzw_encode(data)) == data

    prop()
