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
