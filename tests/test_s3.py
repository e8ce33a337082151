"""S3-protocol integration tests (round-3 verdict item 7).

Mirrors the reference's MinIO suite (internal/integration_tests/s3_test.go:
58-293) at the storage layer: the pages fixture is uploaded to an
S3-compatible endpoint (tests/s3_mock.py — real HTTP, real S3 REST protocol,
localhost) and read back through pyarrow's C++ S3FileSystem THREADED THROUGH
ray.data — the filesystem object pickles into distributed read tasks, so
listing (ListObjectsV2) and ranged GETs happen from worker processes, and
``write_parquet`` exercises the multipart-upload path end to end.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import sys

sys.path.insert(0, os.path.dirname(__file__))
from s3_mock import MockS3Server  # noqa: E402


@pytest.fixture(scope="module")
def s3():
    with MockS3Server() as srv:
        yield srv


def _fs(srv):
    from pyarrow.fs import S3FileSystem
    return S3FileSystem(access_key="test", secret_key="test",
                        endpoint_override=srv.endpoint, scheme="http",
                        region="us-east-1")


def _upload_dir(srv, local_dir: str, bucket: str, prefix: str) -> None:
    srv.state.buckets.setdefault(bucket, {})
    for root, _, files in os.walk(local_dir):
        for f in files:
            p = os.path.join(root, f)
            key = prefix + "/" + os.path.relpath(p, local_dir).replace(os.sep, "/")
            with open(p, "rb") as fh:
                srv.state.buckets[bucket][key] = fh.read()


def test_arrow_s3_roundtrip_single_object(s3):
    """Driver-side sanity: put via the S3 wire protocol (multipart), get it
    back, byte-identical — the s3_test.go upload/download pair."""
    fs = _fs(s3)
    s3.state.buckets.setdefault("artifacts", {})
    tbl = pa.table({"k": [1, 2, 3], "v": ["a", "b", "c"]})
    with fs.open_output_stream("artifacts/m/t.parquet") as out:
        pq.write_table(tbl, out)
    with fs.open_input_file("artifacts/m/t.parquet") as f:
        got = pq.read_table(f)
    assert got.equals(tbl)
    # listing sees it (ListObjectsV2 with delimiter)
    from pyarrow.fs import FileSelector
    infos = fs.get_file_info(FileSelector("artifacts/m/"))
    assert [i.base_name for i in infos] == ["t.parquet"]


def test_ray_reads_pages_fixture_from_s3(ray_session, s3, tiny_fixture):
    """The flagship's read stage against S3: read_pages(filesystem=S3) must
    return exactly the rows the local read returns. The S3FileSystem object
    is pickled into Ray read tasks — the ranged GETs come from workers, not
    the driver (s3_connector.go:71-93 bucket+prefix shape)."""
    from ner_backend_ray.pipelines.kg import read_pages

    _upload_dir(s3, os.path.join(tiny_fixture, "pages"), "corpus", "fix/pages")
    got = read_pages("corpus/fix", filesystem=_fs(s3)).materialize()
    want = read_pages(tiny_fixture).materialize()
    assert got.count() == want.count()
    gu = sorted(r["url"] for r in got.select_columns(["url"]).take_all())
    wu = sorted(r["url"] for r in want.select_columns(["url"]).take_all())
    assert gu == wu


def test_ray_write_parquet_to_s3_and_readback(ray_session, s3):
    """Distributed sink: write_parquet through the S3 multipart path from
    worker processes, read back through the same endpoint, equal content."""
    import ray.data

    s3.state.buckets.setdefault("out", {})
    fs = _fs(s3)
    ds = ray.data.range(1000, override_num_blocks=4).map_batches(
        lambda b: b.append_column("sq", pa.compute.multiply(b["id"], b["id"])),
        batch_format="pyarrow")
    ds.write_parquet("out/result", filesystem=fs)
    assert any(k.startswith("result/") and k.endswith(".parquet")
               for k in s3.state.buckets["out"])
    back = ray.data.read_parquet("out/result", filesystem=fs).materialize()
    assert back.count() == 1000
    rows = sorted((r["id"], r["sq"]) for r in back.take_all())
    assert rows[:3] == [(0, 0), (1, 1), (2, 4)] and rows[-1] == (999, 999 * 999)
