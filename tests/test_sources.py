"""File-source dispatch (SURVEY.md §2.1 S5) and preview builder (M9) tests."""

import pyarrow as pa
import pytest


def test_parse_files_batch_dispatch():
    from ner_backend_ray.sources.files import parse_files_batch
    batch = pa.table({
        "path": ["a.txt", "b.HTML", "c.pdf", "d.exe", "e.json"],
        "bytes": [b"hello", b"<p>x</p>", b"%PDF-1.4", b"\x00\x01", b"{}"],
    })
    out = parse_files_batch(batch)
    got = dict(zip(out["path"].to_pylist(), out["status"].to_pylist()))
    assert got == {"a.txt": "succeeded", "b.HTML": "succeeded", "c.pdf": "failed",
                   "d.exe": "skipped", "e.json": "succeeded"}
    texts = dict(zip(out["path"].to_pylist(), out["text"].to_pylist()))
    assert texts["a.txt"] == "hello"          # identity extraction (parser.go:98-122)
    assert texts["b.HTML"] == "<p>x</p>"      # no tag stripping
    assert texts["d.exe"] == ""


def test_read_raw_files_and_counters(ray_session, tmp_path):
    from ner_backend_ray.sources.files import read_raw_files
    (tmp_path / "x.txt").write_bytes(b"alpha beta")
    (tmp_path / "y.csv").write_bytes(b"a,b\n1,2")
    (tmp_path / "z.bin").write_bytes(b"\xff")
    ds = read_raw_files(str(tmp_path))
    counts = {r["status"]: r["count()"] for r in ds.groupby("status").count().take_all()}
    assert counts == {"succeeded": 2, "skipped": 1}


def test_truncate_tokens_exact():
    from ner_backend_ray.ops.preview import truncate_tokens
    text = b"one two  three\nfour five"
    assert truncate_tokens(text, 3) == b"one two  three"
    assert truncate_tokens(text, 10) == text
    assert truncate_tokens(b"", 5) == b""


def test_preview_docs_tags(ray_session):
    import ray.data
    from ner_backend_ray.ops.preview import PreviewDocs
    rows = [{"url": "1", "text": "spark is fast and spark scales with join power"}]
    ds = ray.data.from_items(rows)
    out = ds.map_batches(PreviewDocs,
                         fn_constructor_kwargs=dict(
                             model_type="regex",
                             model_kwargs={"patterns": {"SPARKW": r"\bspark\b",
                                                        "JOINW": r"\bjoin\b"}},
                             text_column="text"),
                         batch_format="pyarrow", concurrency=1).take_all()
    tokens, tags = out[0]["tokens"], out[0]["tags"]
    assert tokens == ["spark", "is", "fast", "and", "spark", "scales", "with",
                      "join", "power"]
    assert tags == ["SPARKW", "O", "O", "O", "SPARKW", "O", "O", "JOINW", "O"]


# ------------------------------- PDF parsing -------------------------------

def _make_pdf(pages, compress=True):
    """Minimal valid PDF writer (classic xref, optional Flate content)."""
    import zlib
    objs = {}
    n_pages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    font = 3 + 2 * n_pages
    for i, text in enumerate(pages):
        pnum, cnum = 3 + 2 * i, 4 + 2 * i
        objs[pnum] = (f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                      f"/Contents {cnum} 0 R /Resources << /Font << /F1 {font} 0 R"
                      f" >> >> >>").encode()
        ops = ["BT", "/F1 12 Tf", "72 720 Td"]
        for j, line in enumerate(text.split("\n")):
            if j:
                ops.append("0 -14 Td")
            esc = (line.replace("\\", r"\\").replace("(", r"\(")
                   .replace(")", r"\)"))
            ops.append(f"({esc}) Tj")
        ops.append("ET")
        content = "\n".join(ops).encode("latin-1")
        if compress:
            comp = zlib.compress(content)
            objs[cnum] = (f"<< /Length {len(comp)} /Filter /FlateDecode >>".encode()
                          + b"\nstream\n" + comp + b"\nendstream")
        else:
            objs[cnum] = (f"<< /Length {len(content)} >>".encode()
                          + b"\nstream\n" + content + b"\nendstream")
    objs[font] = b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + objs[num] + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {max(objs) + 1}\n".encode() + b"0000000000 65535 f \n"
    for num in sorted(objs):
        out += f"{offsets[num]:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {max(objs) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_pos}\n%%EOF\n").encode()
    return bytes(out)


def test_pdf_extract_multipage_flate():
    from ner_backend_ray.sources.pdf import extract_pdf_text
    pages = ["Hello World\nSecond line with (parens) and \\ backslash",
             "Page two text here"]
    # pages joined with \n\n (parser.go:90)
    assert extract_pdf_text(_make_pdf(pages)) == "\n\n".join(pages)
    assert extract_pdf_text(_make_pdf(["plain"], compress=False)) == "plain"


def test_pdf_extract_tj_array_and_hex():
    import zlib
    from ner_backend_ray.sources.pdf import extract_pdf_text
    # hand-built content stream: TJ array with kern-space + hex string
    content = b"BT /F1 12 Tf 72 720 Td [(Hel) -20 (lo) -500 (world)] TJ " \
              b"0 -14 Td <48495821> Tj ET"
    pdf = _make_pdf(["placeholder"])
    comp = zlib.compress(content)
    import re
    repl = (b"4 0 obj\n<< /Length " + str(len(comp)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + comp
            + b"\nendstream\nendobj")
    pdf = re.sub(rb"4 0 obj\n.*?endobj", lambda _: repl, pdf, count=1, flags=re.S)
    assert extract_pdf_text(pdf) == "Hello world\nHIX!"


def test_pdf_dispatch_succeeds_and_fails():
    from ner_backend_ray.sources.files import parse_files_batch
    good = _make_pdf(["real pdf content"])
    batch = pa.table({"path": ["good.pdf", "corrupt.pdf"],
                      "bytes": [good, b"%PDF-1.4 garbage no objects"]})
    out = parse_files_batch(batch)
    got = dict(zip(out["path"].to_pylist(), out["status"].to_pylist()))
    assert got == {"good.pdf": "succeeded", "corrupt.pdf": "failed"}
    texts = dict(zip(out["path"].to_pylist(), out["text"].to_pylist()))
    assert texts["good.pdf"] == "real pdf content"


# ------------------------------- LZW / encryption -------------------------------

def _lzw_encode(data: bytes) -> bytes:
    """Test-side PDF LZW encoder (EarlyChange=1, MSB-first). Width bumps track
    the DECODER's table growth (which lags the encoder's by one code), so the
    streams stay bit-synchronized."""
    table = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    out = bytearray()
    buf = nbits = 0
    emitted = 0

    def emit(code):
        nonlocal buf, nbits, emitted, width
        buf = (buf << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((buf >> nbits) & 0xFF)

    emit(256)  # clear table
    w = b""
    for ch in data:
        c = bytes([ch])
        if w + c in table:
            w += c
            continue
        emit(table[w])
        emitted += 1
        table[w + c] = next_code
        next_code += 1
        # decoder has 258 + (emitted - 1) entries after reading this code
        if 258 + (emitted - 1) == (1 << width) - 1 and width < 12:
            width += 1
        if next_code == (1 << 12) - 1:  # table full: clear, like real writers
            emit(256)
            table = {bytes([i]): i for i in range(256)}
            next_code, width, emitted = 258, 9, 0
        w = c
    if w:
        emit(table[w])
        emitted += 1
        if 258 + (emitted - 1) == (1 << width) - 1 and width < 12:
            width += 1
    emit(257)  # EOD
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def test_lzw_decode_spec_vector():
    """ISO 32000-1 §7.4.4.3 example: 45 45 45 45 45 65 45 45 45 66 encodes to
    80 0B 60 50 22 0C 0C 85 01."""
    from ner_backend_ray.sources.pdf import _lzw_decode
    enc = bytes.fromhex("800B6050220C0C8501")
    assert _lzw_decode(enc) == bytes([45, 45, 45, 45, 45, 65, 45, 45, 45, 66])


def test_lzw_roundtrip_across_width_bumps():
    from ner_backend_ray.sources.pdf import _lzw_decode
    import random
    rng = random.Random(7)
    # enough distinct bigrams to push the table past the 9->10->11 bit bumps
    data = bytes(rng.randrange(256) for _ in range(8000))
    assert _lzw_decode(_lzw_encode(data)) == data
    assert _lzw_decode(_lzw_encode(b"")) == b""
    assert _lzw_decode(_lzw_encode(b"aaaaaaaaaaaaaaaa")) == b"a" * 16


def test_pdf_extract_lzw_content_stream():
    from ner_backend_ray.sources.pdf import extract_pdf_text
    pdf = _make_pdf(["LZW page text"])
    # recompress object 4's Flate content stream as LZWDecode
    import re as _re
    import zlib
    m = _re.search(rb"4 0 obj\n<< /Length \d+ /Filter /FlateDecode >>\n"
                   rb"stream\n(.*?)\nendstream", pdf, _re.S)
    content = zlib.decompress(m.group(1))
    lzw = _lzw_encode(content)
    repl = (b"4 0 obj\n<< /Length " + str(len(lzw)).encode()
            + b" /Filter /LZWDecode >>\nstream\n" + lzw
            + b"\nendstream\nendobj\n")
    pdf = _re.sub(rb"4 0 obj\n.*?endobj\n", lambda _: repl, pdf, count=1,
                  flags=_re.S)
    assert extract_pdf_text(pdf) == "LZW page text"


def test_encrypted_pdf_skipped():
    from ner_backend_ray.sources.files import parse_files_batch
    from ner_backend_ray.sources.pdf import EncryptedPdfError, extract_pdf_text
    pdf = _make_pdf(["secret"])
    enc = pdf.replace(b"/Root 1 0 R", b"/Root 1 0 R /Encrypt 9 0 R")
    import pytest
    with pytest.raises(EncryptedPdfError):
        extract_pdf_text(enc)
    batch = pa.table({"path": ["enc.pdf", "ok.pdf"],
                      "bytes": [enc, pdf]})
    got = parse_files_batch(batch).to_pydict()
    by_path = dict(zip(got["path"], got["status"]))
    assert by_path == {"enc.pdf": "skipped", "ok.pdf": "succeeded"}
