"""Document byte-codecs for the SRC1/SRC2 decode seam (SURVEY.md
§2.A; reference: PyMuPDFLoader / Docx2txtLoader,
``/root/reference/utils.py:12-15``).

Preference order per format:

1. the real library (pymupdf / docx2txt) when importable — NOT present
   in this environment, so the import gate normally falls through;
2. a dependency-free pure-Python fallback good enough for the golden
   fixtures and simple machine-generated documents:
   - PDF: text operators (``Tj`` / ``TJ``) inside content streams;
     every PDF *text-stream* filter decodes pure-Python — FlateDecode
     (stdlib zlib), LZWDecode (spec algorithm incl. EarlyChange),
     ASCIIHexDecode, ASCII85Decode, RunLengthDecode, and chained
     filter arrays thereof. Image-only filters (DCT/JPX/JBIG2/CCITT)
     carry no text by definition; their streams are skipped;
   - DOCX: stdlib ``zipfile`` + tag-strip of ``word/document.xml``
     (a DOCX *is* a zip; paragraphs become lines).

Both fallbacks are deterministic, total (bad bytes → DecodeError, not
a crash), and library-free, so the Spark-side plumbing is testable on
real file bytes in any environment.
"""

from __future__ import annotations

import re
import zipfile


class DecodeError(ValueError):
    """Raised when bytes cannot be decoded as the claimed format."""


# --- PDF -----------------------------------------------------------------

_STREAM_START_RE = re.compile(rb"stream\r?\n")
# (...) Tj   and   [(..) (..) ..] TJ  — the two text-showing operators.
_TJ_RE = re.compile(rb"\((?:\\.|[^()\\])*\)\s*Tj|\[(?:[^\]\\]|\\.)*\]\s*TJ")
_PAREN_RE = re.compile(rb"\(((?:\\.|[^()\\])*)\)")
_FILTER_RE = re.compile(
    rb"/(FlateDecode|Fl|LZWDecode|LZW|ASCIIHexDecode|AHx"
    rb"|ASCII85Decode|A85|RunLengthDecode|RL"
    rb"|DCTDecode|DCT|JPXDecode|JBIG2Decode|CCITTFaxDecode|CCF)\b"
)
_EARLY_CHANGE_RE = re.compile(rb"/EarlyChange\s+(\d+)")
_PDF_ESCAPES = {
    b"\\n": b"\n", b"\\r": b"\r", b"\\t": b"\t",
    b"\\(": b"(", b"\\)": b")", b"\\\\": b"\\",
}


def _unescape_pdf(s: bytes) -> bytes:
    for k, v in _PDF_ESCAPES.items():
        s = s.replace(k, v)
    return s


def lzw_decode(data: bytes, early_change: int = 1) -> bytes:
    """PDF/TIFF LZWDecode (PDF 32000-1 §7.4.4): MSB-first variable
    width codes starting at 9 bits, 256 = clear-table, 257 = EOD, code
    width grows at 512/1024/2048 minus ``early_change``. Pure Python —
    content streams are small relative to the documents table, and the
    decode runs inside the executors' Arrow-batched UDF, not the
    driver."""
    out = bytearray()
    table: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    next_code, bits = 258, 9
    prev: bytes | None = None
    buf = nbits = 0
    for byte in data:
        buf = (buf << 8) | byte
        nbits += 8
        while nbits >= bits:
            code = (buf >> (nbits - bits)) & ((1 << bits) - 1)
            nbits -= bits
            if code == 256:  # clear table
                table = {i: bytes([i]) for i in range(256)}
                next_code, bits, prev = 258, 9, None
                continue
            if code == 257:  # EOD
                return bytes(out)
            if prev is None:
                entry = table.get(code)
                if entry is None:
                    raise DecodeError("corrupt LZW stream: bad first code")
            elif code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]  # the KwKwK case
            else:
                raise DecodeError("corrupt LZW stream: code out of range")
            out += entry
            if prev is not None:
                table[next_code] = prev + entry[:1]
                next_code += 1
            prev = entry
            if bits < 12 and next_code >= (1 << bits) - early_change:
                bits += 1
    return bytes(out)


def _ascii_hex_decode(data: bytes) -> bytes:
    body = data.split(b">", 1)[0]
    compact = b"".join(body.split())
    if len(compact) % 2:  # odd length: final digit implies a 0
        compact += b"0"
    try:
        return bytes.fromhex(compact.decode("ascii"))
    except (UnicodeDecodeError, ValueError) as e:
        raise DecodeError(f"corrupt ASCIIHex stream: {e}") from e


def _ascii85_decode(data: bytes) -> bytes:
    import base64

    body = b"".join(data.split())  # whitespace is insignificant
    if body.startswith(b"<~"):
        body = body[2:]
    if body.endswith(b"~>"):
        body = body[:-2]
    try:
        return base64.a85decode(body)
    except ValueError as e:
        raise DecodeError(f"corrupt ASCII85 stream: {e}") from e


def _run_length_decode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        length = data[i]
        if length == 128:  # EOD
            break
        if length < 128:  # literal run of length+1 bytes
            out += data[i + 1 : i + 2 + length]
            i += 2 + length
        else:  # next byte repeated 257-length times
            if i + 1 >= len(data):
                raise DecodeError("corrupt RunLength stream: truncated run")
            out += bytes([data[i + 1]]) * (257 - length)
            i += 2
    return bytes(out)


def _flate_decode(data: bytes) -> bytes:
    import zlib

    try:
        return zlib.decompress(data)
    except zlib.error as e:
        raise DecodeError(f"corrupt Flate stream: {e}") from e


_TEXT_FILTERS = {
    b"FlateDecode": _flate_decode, b"Fl": _flate_decode,
    b"ASCIIHexDecode": _ascii_hex_decode, b"AHx": _ascii_hex_decode,
    b"ASCII85Decode": _ascii85_decode, b"A85": _ascii85_decode,
    b"RunLengthDecode": _run_length_decode, b"RL": _run_length_decode,
}


def _decode_stream(body: bytes, stream_dict: bytes) -> bytes | None:
    """Run the stream's declared filter chain (possibly an array) over
    the body. None = the stream cannot carry text (image-only filter)
    or is corrupt — the caller skips it, matching the decoder's
    total-function contract."""
    filters = _FILTER_RE.findall(stream_dict)
    if not filters:
        # No declared filter: PDFs in the wild sometimes omit the dict
        # our scanner sees — keep the historical behavior of trying
        # Flate first, else treating the bytes as a raw content stream.
        import zlib

        try:
            return zlib.decompress(body)
        except zlib.error:
            return body
    data = body
    for f in filters:
        if f in (b"LZWDecode", b"LZW"):
            ec = _EARLY_CHANGE_RE.search(stream_dict)
            early = int(ec.group(1)) if ec else 1
            try:
                data = lzw_decode(data, early_change=early)
            except DecodeError:
                return None
        elif f in _TEXT_FILTERS:
            try:
                data = _TEXT_FILTERS[f](data)
            except DecodeError:
                return None
        else:  # DCT/JPX/JBIG2/CCITT: image data, never text
            return None
    return data


def pdf_extract_text(blob: bytes) -> str:
    """Extract text from a text-first PDF: every stream's filter chain
    is decoded (Flate/LZW/AHx/A85/RunLength pure-Python; image-only
    filters skipped), then the Tj/TJ text-showing operators are
    scanned. Raises DecodeError if the bytes are not a PDF."""
    if not blob.startswith(b"%PDF"):
        raise DecodeError("not a PDF: missing %PDF header")
    try:
        import pymupdf  # type: ignore  # real codec, absent here

        with pymupdf.open(stream=blob, filetype="pdf") as doc:
            return "\n".join(page.get_text() for page in doc)
    except ImportError:
        pass

    lines: list[str] = []
    for m in _STREAM_START_RE.finditer(blob):
        start = m.end()
        end = blob.find(b"endstream", start)
        if end < 0:
            continue
        body = blob[start:end]
        if body.endswith(b"\r\n"):  # the EOL before `endstream`
            body = body[:-2]
        elif body.endswith((b"\n", b"\r")):
            body = body[:-1]
        # The stream's dictionary sits between the enclosing `N 0 obj`
        # and the `stream` keyword.
        obj_at = blob.rfind(b"obj", 0, m.start())
        stream_dict = blob[obj_at if obj_at >= 0 else 0 : m.start()]
        data = _decode_stream(body, stream_dict)
        if data is None:
            continue
        for op in _TJ_RE.findall(data):
            parts = [_unescape_pdf(p) for p in _PAREN_RE.findall(op)]
            if parts:
                lines.append(b"".join(parts).decode("latin-1"))
    return "\n".join(lines)


# --- DOCX ----------------------------------------------------------------

_WT_RE = re.compile(r"<w:t[^>]*>(.*?)</w:t>", re.S)
_WP_SPLIT_RE = re.compile(r"</w:p>")
_ENTITIES = {"&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"', "&apos;": "'"}


def docx_extract_text(blob: bytes) -> str:
    """Extract paragraph text from DOCX bytes (a zip archive). Raises
    DecodeError if the bytes are not a readable DOCX."""
    try:
        import docx2txt  # type: ignore  # real codec, absent here
        import io

        return docx2txt.process(io.BytesIO(blob))
    except ImportError:
        pass
    import io

    try:
        with zipfile.ZipFile(io.BytesIO(blob)) as z:
            xml = z.read("word/document.xml").decode("utf-8")
    except (zipfile.BadZipFile, KeyError, UnicodeDecodeError) as e:
        raise DecodeError(f"not a DOCX: {e}") from e
    paras = []
    for para in _WP_SPLIT_RE.split(xml):
        runs = _WT_RE.findall(para)
        if runs:
            text = "".join(runs)
            for ent, ch in _ENTITIES.items():
                text = text.replace(ent, ch)
            paras.append(text)
    return "\n".join(paras)


def txt_extract_text(blob: bytes) -> str:
    try:
        return blob.decode("utf-8")
    except UnicodeDecodeError as e:
        raise DecodeError(f"not utf-8 text: {e}") from e


CODECS = {"pdf": pdf_extract_text, "docx": docx_extract_text, "txt": txt_extract_text}
