"""Checkpointed, resumable KG run: per-partition outputs + lineage + counters.

North-rule requirement (SURVEY.md §4 "checkpoint / resume"): the reference's
checkpoint is its task-status DB (cmd/local/main.go:75-106 — QUEUED tasks re-published
on boot, no partial-task resume). Ours is file-system-native:

- **Partition = one input pages parquet file** (the analog of a bin-packed
  InferenceTask shard, internal/storage/file_system_connector_utils.go:12-63; at real
  scale a shard is a ~200 MB-10 GB file, processor.go:715-718).
- Phase 1 (embarrassingly parallel, no shuffle) runs as an actor-pool ``map_batches``
  over the *task list* dataset: each call processes one file through the same
  extract→tag→link→triple stage functions as the streaming pipeline, writes
  ``{out}/{table}/part-{pid}.parquet`` atomically (tmp + rename), and finally writes
  ``{out}/_lineage/part-{pid}.json`` with input fingerprint + row counters. A
  partition's outputs are a pure function of its input file, so resumed runs are
  byte-identical.
- Resume = skip every pid whose lineage entry exists and matches the input
  fingerprint; partially-written partitions (no lineage yet) are overwritten.
- Phase 2 (the shuffles: canonicalize, nodes, edges) reads the phase-1 Parquet and
  re-runs whole; it is cheap relative to phase 1 and guarded by a ``_SUCCESS``
  marker with the set of contributing partitions.
"""

from __future__ import annotations

import glob
import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

from ..oracle import KGConfig
from ..stages.extract import extract_text_batch
from ..stages.link import LinkMentions, LinkTriples
from ..stages.tag import TagDocs, explode_groups, explode_mentions, explode_triples

PHASE1_TABLES = ("docs", "mentions", "groups", "triples")


def _fingerprint(path: str) -> dict:
    st = os.stat(path)
    return {"path": os.path.basename(path), "size": st.st_size}


def _atomic_write(table: pa.Table, path: str) -> None:
    tmp = path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, path)


class PartitionWorker:
    """Actor: model + alias dict loaded once; each __call__ processes whole input
    files (batch of task rows) and checkpoints them."""

    def __init__(self, cfg: KGConfig, fixture_dir: str, out_dir: str, batch_size: int):
        self.tagger = TagDocs(model_type=cfg.model_type, model_kwargs=cfg.model_kwargs,
                              tags=cfg.tags, custom_patterns=cfg.custom_patterns,
                              group_queries=cfg.group_queries, text_column="html")
        alias_path = os.path.join(fixture_dir, "alias_dict.parquet")
        self.link_mentions = LinkMentions(alias_path, cfg.min_link_score)
        self.link_triples = LinkTriples(alias_path, cfg.min_link_score)
        self.out_dir = out_dir
        self.batch_size = batch_size

    def __call__(self, batch: dict) -> pa.Table:
        results = []
        for path, pid in zip(batch["path"], batch["pid"]):
            results.append(self._process_file(str(path), int(pid)))
        return pa.table({k: pa.array([r[k] for r in results])
                         for k in results[0]}) if results else pa.table({"pid": pa.array([], pa.int64())})

    def _process_file(self, path: str, pid: int) -> dict:
        t0 = time.monotonic()
        pf = pq.ParquetFile(path)
        docs_parts, mention_parts, group_parts, triple_parts = [], [], [], []
        rows = 0
        for rb in pf.iter_batches(batch_size=self.batch_size, columns=["url", "html", "text"]):
            tbl = pa.Table.from_batches([rb])
            rows += tbl.num_rows
            tbl = extract_text_batch(tbl)
            docs = self.tagger(tbl.select(["url", "html"]))
            docs_parts.append(docs)
            mention_parts.append(self.link_mentions(explode_mentions(docs)))
            group_parts.append(explode_groups(docs))
            triple_parts.append(self.link_triples(explode_triples(docs)))

        tables = {
            "docs": pa.concat_tables(docs_parts),
            "mentions": pa.concat_tables(mention_parts),
            "groups": pa.concat_tables(group_parts),
            "triples": pa.concat_tables(triple_parts),
        }
        for name, table in tables.items():
            d = os.path.join(self.out_dir, name)
            os.makedirs(d, exist_ok=True)
            _atomic_write(table, os.path.join(d, f"part-{pid:05d}.parquet"))

        lineage = {
            "pid": pid,
            "input": _fingerprint(path),
            "rows": rows,
            "mentions": tables["mentions"].num_rows,
            "groups": tables["groups"].num_rows,
            "triples": tables["triples"].num_rows,
            "token_count": int(pa.compute.sum(tables["docs"]["token_count"]).as_py() or 0),
            "wall_sec": round(time.monotonic() - t0, 3),
        }
        ldir = os.path.join(self.out_dir, "_lineage")
        os.makedirs(ldir, exist_ok=True)
        tmp = os.path.join(ldir, f"part-{pid:05d}.json.tmp")
        with open(tmp, "w") as f:
            json.dump(lineage, f)
        os.replace(tmp, os.path.join(ldir, f"part-{pid:05d}.json"))
        return {"pid": pid, "rows": rows, "mentions": lineage["mentions"],
                "triples": lineage["triples"], "wall_sec": lineage["wall_sec"]}


def completed_partitions(out_dir: str) -> dict[int, dict]:
    done = {}
    for p in glob.glob(os.path.join(out_dir, "_lineage", "part-*.json")):
        with open(p) as f:
            entry = json.load(f)
        done[entry["pid"]] = entry
    return done


def run_phase1(fixture_dir: str, out_dir: str, cfg: KGConfig | None = None,
               concurrency: int | None = None, max_partitions: int | None = None) -> dict:
    """Tag/link/triple phase with per-partition checkpointing. ``max_partitions``
    exists for the kill/resume test (process only the first k partitions)."""
    cfg = cfg or KGConfig()
    files = sorted(glob.glob(os.path.join(fixture_dir, "pages", "part-*.parquet")))
    done = completed_partitions(out_dir)

    tasks = []
    for pid, path in enumerate(files):
        entry = done.get(pid)
        if entry is not None and entry["input"] == _fingerprint(path):
            continue  # resume: skip completed partition
        tasks.append({"path": path, "pid": pid})
    if max_partitions is not None:
        tasks = tasks[:max_partitions]

    skipped = len(files) - len(tasks)
    if tasks:
        if concurrency is None:
            concurrency = max(2, int(ray.cluster_resources().get("CPU", 4)) - 2)
        concurrency = min(concurrency, len(tasks))
        (ray.data.from_items(tasks)
            .map_batches(PartitionWorker,
                         fn_constructor_kwargs=dict(cfg=cfg, fixture_dir=fixture_dir,
                                                    out_dir=out_dir,
                                                    batch_size=cfg.batch_size),
                         batch_size=1, concurrency=concurrency, num_cpus=1)
            .materialize())

    done = completed_partitions(out_dir)
    return {"partitions_total": len(files), "partitions_run": len(tasks),
            "partitions_skipped": skipped,
            "rows": sum(e["rows"] for e in done.values()),
            "mentions": sum(e["mentions"] for e in done.values()),
            "triples": sum(e["triples"] for e in done.values()),
            "token_count": sum(e["token_count"] for e in done.values())}


def run_phase2(fixture_dir: str, out_dir: str, cfg: KGConfig | None = None) -> dict:
    """Shuffle phase over phase-1 Parquet: nodes + edges, sorted, written with a
    _SUCCESS marker recording the contributing partitions."""
    from .kg import kg_tables_from_parquet
    cfg = cfg or KGConfig()
    done = sorted(completed_partitions(out_dir))
    marker = os.path.join(out_dir, "graph", "_SUCCESS")
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f).get("partitions") == done:
                return {"skipped": True}

    counts = kg_tables_from_parquet(out_dir, cfg, fixture_dir,
                                    os.path.join(out_dir, "graph"))
    with open(marker, "w") as f:
        json.dump({"partitions": done, **counts}, f)
    return {"skipped": False, **counts}


def run_kg_checkpointed(fixture_dir: str, out_dir: str, cfg: KGConfig | None = None,
                        concurrency: int | None = None) -> dict:
    s1 = run_phase1(fixture_dir, out_dir, cfg, concurrency)
    s2 = run_phase2(fixture_dir, out_dir, cfg)
    return {**s1, **s2}


def lineage_metrics(out_dir: str) -> pa.Table:
    """Per-partition metrics table from the lineage sidecars — the analog of the
    reference's task-status rollup (internal/api/api.go:508-534: per-status
    count / sum(total_size) / sum(completed_size)) and throughput metrics
    (api.go:951-1011). One row per partition plus derived rates; aggregate with
    a plain groupby/sum over this (small) table."""
    done = completed_partitions(out_dir)
    pids = sorted(done)
    rows = [done[p] for p in pids]
    wall = [max(1e-9, r["wall_sec"]) for r in rows]
    return pa.table({
        "pid": pa.array(pids, pa.int64()),
        "input_file": pa.array([r["input"]["path"] for r in rows], pa.string()),
        "input_bytes": pa.array([r["input"]["size"] for r in rows], pa.int64()),
        "rows": pa.array([r["rows"] for r in rows], pa.int64()),
        "mentions": pa.array([r["mentions"] for r in rows], pa.int64()),
        "groups": pa.array([r["groups"] for r in rows], pa.int64()),
        "triples": pa.array([r["triples"] for r in rows], pa.int64()),
        "token_count": pa.array([r["token_count"] for r in rows], pa.int64()),
        "wall_sec": pa.array([r["wall_sec"] for r in rows], pa.float64()),
        "mb_per_hour": pa.array(
            [r["input"]["size"] / 1e6 / (w / 3600.0)
             for r, w in zip(rows, wall)], pa.float64()),
    })
