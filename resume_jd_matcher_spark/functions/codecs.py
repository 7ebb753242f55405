"""Document byte-codecs for the SRC1/SRC2 decode seam (SURVEY.md
§2.A; reference: PyMuPDFLoader / Docx2txtLoader,
``/root/reference/utils.py:12-15``).

Preference order per format:

1. the real library (pymupdf / docx2txt) when importable — NOT present
   in this environment, so the import gate normally falls through;
2. a dependency-free pure-Python fallback good enough for the golden
   fixtures and simple machine-generated documents:
   - PDF: text operators (``Tj`` / ``TJ``) inside content streams;
     Flate-compressed streams (the common case in the wild) are
     inflated with stdlib ``zlib`` first, so both the uncompressed and
     the FlateDecode golden fixtures decode without pymupdf. Other
     filters (LZW, DCT, ...) still yield no text — route such corpora
     through the real codec;
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

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
# (...) Tj   and   [(..) (..) ..] TJ  — the two text-showing operators.
_TJ_RE = re.compile(rb"\((?:\\.|[^()\\])*\)\s*Tj|\[(?:[^\]\\]|\\.)*\]\s*TJ")
_PAREN_RE = re.compile(rb"\(((?:\\.|[^()\\])*)\)")
_PDF_ESCAPES = {
    b"\\n": b"\n", b"\\r": b"\r", b"\\t": b"\t",
    b"\\(": b"(", b"\\)": b")", b"\\\\": b"\\",
}


def _unescape_pdf(s: bytes) -> bytes:
    for k, v in _PDF_ESCAPES.items():
        s = s.replace(k, v)
    return s


def pdf_extract_text(blob: bytes) -> str:
    """Extract text from a text-first PDF with uncompressed content
    streams. Raises DecodeError if the bytes are not a PDF."""
    if not blob.startswith(b"%PDF"):
        raise DecodeError("not a PDF: missing %PDF header")
    try:
        import pymupdf  # type: ignore  # real codec, absent here

        with pymupdf.open(stream=blob, filetype="pdf") as doc:
            return "\n".join(page.get_text() for page in doc)
    except ImportError:
        pass
    import zlib

    lines: list[str] = []
    for stream in _STREAM_RE.findall(blob):
        # FlateDecode is by far the most common stream filter; inflate
        # when the bytes cooperate, otherwise scan the raw stream
        # (uncompressed PDFs). Non-Flate filters fail both ways and
        # contribute no text — same contract as before.
        try:
            stream = zlib.decompress(stream)
        except zlib.error:
            pass
        for op in _TJ_RE.findall(stream):
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
