"""Raw-file source with extension-dispatch parsing (SURVEY.md §2.1 S1/S2/S5-S7).

The reference walks a bucket/directory (internal/storage/s3_connector.go:71-93,
local_connector.go:47-73) and dispatches on file extension
(internal/storage/parser.go:33-55): plaintext family → identity bytes
(parser.go:98-122); ``.pdf`` → text via the pure-Python extractor in
sources/pdf.py (the reference uses go-fitz, parser.go:57-96); anything else →
*skipped*, counted but not failed (internal/core/processor.go:321-328).

Ray form: ``ray.data.read_binary_files(paths, include_paths=True)`` does the
listing/reading (S1/S2/S8 subsumed), then one stateless ``map_batches`` parses and
routes. Status column carries succeeded/skipped/failed — the reference's file
counters (processor.go:140-153) become a trivial groupby over it.
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data

# parser.go:37-49
SUPPORTED_EXTENSIONS = {".txt", ".csv", ".html", ".json", ".xml"}
PDF_EXTENSION = ".pdf"
MAX_CHUNK_BYTES = 512 * 1024 * 1024  # parser.go:22-24


def parse_pdf(data: bytes) -> str:
    """The reference's parsePdf slot (parser.go:57-96): pure-Python extractor
    (sources/pdf.py) — pages joined with "\\n\\n", ValueError on unparseable
    input (routed to status="failed" by the dispatcher, matching the
    reference's Chunk{Error} path)."""
    from .pdf import extract_pdf_text
    return extract_pdf_text(data)


def parse_files_batch(batch: pa.Table, path_col: str = "path",
                      data_col: str = "bytes") -> pa.Table:
    """(path, bytes) rows → (path, text, status) rows.

    status: "succeeded" (plaintext family, text = identity bytes decoded),
    "skipped" (unsupported extension or encrypted PDF — counted, not failed;
    processor.go:321-328), "failed" (unparseable pdf / oversized)."""
    from .pdf import EncryptedPdfError
    paths = batch[path_col].to_pylist()
    datas = batch[data_col].to_pylist()
    texts: list[str] = []
    statuses: list[str] = []
    for path, data in zip(paths, datas):
        ext = os.path.splitext(path)[1].lower()
        if ext in SUPPORTED_EXTENSIONS:
            if len(data) > MAX_CHUNK_BYTES:
                texts.append("")
                statuses.append("failed")
            else:
                texts.append(data.decode("utf-8", "ignore"))
                statuses.append("succeeded")
        elif ext == PDF_EXTENSION:
            if len(data) > MAX_CHUNK_BYTES:
                # parser.go:58-64 — a PDF over the cap cannot be parsed at all
                texts.append("")
                statuses.append("failed")
            else:
                try:
                    texts.append(parse_pdf(data))
                    statuses.append("succeeded")
                except EncryptedPdfError:
                    # no key handling — counted, not failed, mirroring the
                    # reference's unsupported-type skip (processor.go:321-328)
                    texts.append("")
                    statuses.append("skipped")
                except Exception:
                    texts.append("")
                    statuses.append("failed")
        else:
            texts.append("")
            statuses.append("skipped")
    return pa.table({
        "path": pa.array(paths, pa.string()),
        "text": pa.array(texts, pa.string()),
        "status": pa.array(statuses, pa.string()),
    })


def read_raw_files(paths: str | list[str], filesystem=None) -> ray.data.Dataset:
    """Directory/file list → parsed (path, text, status) Dataset. File counters
    (succeeded/failed/skipped/total — processor.go:140-153) are
    ``ds.groupby("status").count()``.

    ``filesystem``: optional pyarrow or fsspec filesystem — the S3-connector
    seam (s3_connector.go:71-93); fsspec instances are wrapped for Arrow and
    pickle to the read tasks (tests/test_fs.py pins this)."""
    from .fs import wrap_for_arrow
    ds = ray.data.read_binary_files(paths, include_paths=True,
                                    filesystem=wrap_for_arrow(filesystem))
    return ds.map_batches(parse_files_batch, batch_format="pyarrow")
