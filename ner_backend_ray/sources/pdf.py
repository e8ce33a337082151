"""Minimal pure-Python PDF text extraction (no external libraries).

Fills the reference's ``parsePdf`` slot (internal/storage/parser.go:57-96,
go-fitz there): pages are extracted in page-tree order and joined with
``"\\n\\n"`` exactly like parser.go:90; the 512 MB cap is enforced by the
caller (sources/files.py).

Scope — built from the public PDF 1.7 spec (ISO 32000-1):

- classic cross-reference PDFs whose objects appear as ``N G obj … endobj``
  in the byte stream, plus objects inside /ObjStm object streams
  (FlateDecoded and re-scanned);
- content streams stored raw, /FlateDecode (zlib) or /LZWDecode (spec
  §7.4.4, EarlyChange=1 — the default; EarlyChange 0 streams are treated
  as unsupported);
- encrypted PDFs (/Encrypt in the trailer) raise :class:`EncryptedPdfError`
  so the dispatcher can route them to the skipped counter, mirroring the
  reference's unsupported-type skip (processor.go:321-328);
- text shown via ``Tj``, ``'``, ``"`` and ``TJ`` with literal ``(…)`` (all
  escape forms) and hex ``<…>`` strings, simple byte encodings (Standard /
  WinAnsi — decoded latin-1). CID/Type0 composite fonts need a ToUnicode CMap
  and are out of scope: their text extracts as best-effort raw bytes.

That covers machine-generated report/invoice-style PDFs — the dominant kind
in a web crawl — and everything the test writer produces. Line structure:
``Td/TD`` with a vertical component, ``T*`` and large negative ``TJ`` kerns
map to newline/space, the same heuristics public extractors (pdfminer,
MuPDF's text device) use.
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.S)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")


class EncryptedPdfError(ValueError):
    """The PDF trailer carries /Encrypt — key handling is out of scope, so the
    file is reported distinctly for the dispatcher's skipped counter."""


def _lzw_decode(raw: bytes) -> bytes:
    """PDF LZWDecode (ISO 32000-1 §7.4.4): MSB-first variable-width codes
    (9→12 bits), 256 = clear-table, 257 = EOD, EarlyChange=1 (the width
    grows one code early, as every known writer emits)."""
    base = [bytes([i]) for i in range(256)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev: bytes | None = None
    width, buf, nbits = 9, 0, 0
    for byte in raw:
        buf = (buf << 8) | byte
        nbits += 8
        while nbits >= width:
            nbits -= width
            code = (buf >> nbits) & ((1 << width) - 1)
            if code == 256:
                table = list(base)
                width, prev = 9, None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise ValueError("LZW: first code after clear not literal")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            elif code == len(table):  # the KwKwK case
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("LZW: code beyond table")
            out += entry
            prev = entry
            if len(table) == (1 << width) - 1 and width < 12:  # EarlyChange=1
                width += 1
    return bytes(out)  # missing EOD: tolerate, like zlib's truncated tail


def _parse_objects(data: bytes) -> dict[int, bytes]:
    """object number → object body (dict + optional stream), including objects
    unpacked from /ObjStm object streams."""
    objs: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(data):
        objs[int(m.group(1))] = m.group(3)
    # unpack object streams (PDF 1.5 compressed objects): the stream holds
    # "num offset num offset ..." then the serialized objects back to back
    for body in list(objs.values()):
        if b"/ObjStm" not in body:
            continue
        stream = _stream_bytes(body)
        if stream is None:
            continue
        n = _int_key(body, b"/N")
        first = _int_key(body, b"/First")
        if n is None or first is None:
            continue
        header = stream[:first].split()
        table = [(int(header[2 * i]), int(header[2 * i + 1])) for i in range(n)]
        for i, (num, off) in enumerate(table):
            end = table[i + 1][1] if i + 1 < n else len(stream) - first
            objs.setdefault(num, stream[first + off:first + end])
    return objs


def _int_key(body: bytes, key: bytes) -> int | None:
    m = re.search(re.escape(key) + rb"\s+(\d+)", body)
    return int(m.group(1)) if m else None


def _stream_bytes(body: bytes) -> bytes | None:
    """Decoded stream content of an object body (None if no stream)."""
    m = _STREAM_RE.search(body)
    if m is None:
        return None
    raw = m.group(1)
    head = body[:m.start()]
    if b"/FlateDecode" in head:
        try:
            return zlib.decompress(raw)
        except zlib.error:
            return None
    if b"/LZWDecode" in head:
        if re.search(rb"/EarlyChange\s+0", head):
            return None  # EarlyChange=0 writers are unheard of; stay honest
        try:
            return _lzw_decode(raw)
        except ValueError:
            return None
    if b"/Filter" in head:
        return None  # unsupported filter (DCT, CCITT, JBIG2, ...)
    return raw


def _page_order(objs: dict[int, bytes]) -> list[int]:
    """Page object numbers in page-tree order (root /Pages → /Kids traversal);
    falls back to object-number order when the tree is unresolvable."""
    pages_in_tree: list[int] = []

    def walk(num: int, depth: int = 0) -> None:
        if depth > 64 or num not in objs:
            return
        body = objs[num]
        if re.search(rb"/Type\s*/Page\b(?!s)", body):
            pages_in_tree.append(num)
            return
        kids = re.search(rb"/Kids\s*\[(.*?)\]", body, re.S)
        if kids:
            for r in _REF_RE.finditer(kids.group(1)):
                walk(int(r.group(1)), depth + 1)

    roots = [num for num, body in objs.items()
             if re.search(rb"/Type\s*/Pages\b", body) and b"/Parent" not in body]
    for root in sorted(roots):
        walk(root)
    if pages_in_tree:
        return pages_in_tree
    return sorted(num for num, body in objs.items()
                  if re.search(rb"/Type\s*/Page\b(?!s)", body))


def _content_streams(page_body: bytes, objs: dict[int, bytes]) -> list[bytes]:
    m = re.search(rb"/Contents\s*(\[(.*?)\]|\d+\s+\d+\s+R)", page_body, re.S)
    if m is None:
        return []
    out = []
    for r in _REF_RE.finditer(m.group(1)):
        s = _stream_bytes(objs.get(int(r.group(1)), b""))
        if s is not None:
            out.append(s)
    return out


_ESCAPES = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
            b"(": b"(", b")": b")", b"\\": b"\\"}


def _literal_string(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a PDF literal string starting at data[i] == '(' → (bytes, next_i)."""
    out = bytearray()
    depth = 1
    i += 1
    while i < len(data) and depth:
        c = data[i:i + 1]
        if c == b"\\":
            nxt = data[i + 1:i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
            elif nxt.isdigit():  # octal \ddd (1-3 digits)
                j = i + 1
                while j < len(data) and j < i + 4 and data[j:j + 1].isdigit():
                    j += 1
                out.append(int(data[i + 1:j], 8) & 0xFF)
                i = j
            elif nxt in (b"\n", b"\r"):  # line continuation
                i += 2
            else:
                i += 1
        elif c == b"(":
            depth += 1
            out += c
            i += 1
        elif c == b")":
            depth -= 1
            if depth:
                out += c
            i += 1
        else:
            out += c
            i += 1
    return bytes(out), i


_TOKEN_RE = re.compile(
    rb"\((?:\\.|[^\\()])|<[0-9A-Fa-f\s]*>|<<|>>|\[|\]|[-+]?\d*\.?\d+|/[^\s/<>\[\]()]*|[A-Za-z'\"*]+")


def _extract_page_text(streams: list[bytes]) -> str:
    """Walk the content stream, collect shown strings; Td/TD with dy, T* → line
    breaks; TJ kerns below -180/1000 em → word space."""
    parts: list[str] = []

    def show(raw: bytes) -> None:
        parts.append(raw.decode("latin-1"))

    def line_break() -> None:
        if parts:  # the initial Td positions the cursor; no leading break
            parts.append("\n")

    for data in streams:
        i = 0
        stack: list[object] = []
        n = len(data)
        while i < n:
            c = data[i:i + 1]
            if c == b"(":
                s, i = _literal_string(data, i)
                stack.append(s)
                continue
            if c == b"<" and data[i + 1:i + 2] != b"<":
                j = data.find(b">", i)
                if j < 0:
                    break
                hx = re.sub(rb"\s", b"", data[i + 1:j])
                if len(hx) % 2:
                    hx += b"0"
                stack.append(bytes.fromhex(hx.decode("ascii")))
                i = j + 1
                continue
            m = _TOKEN_RE.match(data, i)
            if m is None:
                i += 1
                continue
            tok = m.group(0)
            i = m.end()
            if tok in (b"Tj",):
                if stack and isinstance(stack[-1], bytes):
                    show(stack[-1])
                stack.clear()
            elif tok in (b"'", b'"'):
                if stack and isinstance(stack[-1], bytes):
                    line_break()
                    show(stack[-1])
                stack.clear()
            elif tok == b"TJ":
                # stack holds the array items since "["
                for item in stack:
                    if isinstance(item, bytes):
                        show(item)
                    elif isinstance(item, float) and item < -180:
                        parts.append(" ")
                stack.clear()
            elif tok in (b"Td", b"TD"):
                if len(stack) >= 2 and isinstance(stack[-1], float):
                    if stack[-1] != 0:
                        line_break()
                stack.clear()
            elif tok == b"T*":
                line_break()
                stack.clear()
            elif tok in (b"[", b"]", b"<<", b">>"):
                if tok == b"[":
                    stack.clear()
            elif re.fullmatch(rb"[-+]?\d*\.?\d+", tok):
                try:
                    stack.append(float(tok))
                except ValueError:
                    pass
            elif tok.startswith(b"/"):
                stack.append(tok)
            else:
                # any other operator ends its operand list
                if tok not in (b"BT", b"ET"):
                    stack.clear()
    text = "".join(parts)
    return text


def extract_pdf_text(data: bytes) -> str:
    """PDF bytes → text; pages joined with "\\n\\n" (parser.go:90). Raises
    ValueError when the bytes are not parseable as a PDF."""
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF (missing %PDF header)")
    # /Encrypt always points at the encryption dict as an indirect reference
    # from a (possibly incremental-update) trailer; one linear scan finds it
    if re.search(rb"/Encrypt\s+\d+\s+\d+\s+R", data):
        raise EncryptedPdfError("encrypted PDF (no key handling)")
    objs = _parse_objects(data)
    if not objs:
        raise ValueError("no PDF objects found")
    pages = []
    for num in _page_order(objs):
        streams = _content_streams(objs[num], objs)
        pages.append(_extract_page_text(streams))
    if not pages:
        raise ValueError("no pages found")
    return "\n\n".join(pages)
