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
