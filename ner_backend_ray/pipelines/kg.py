"""The flagship KG-construction pipeline, streaming Ray Data form.

Target lifecycle (SURVEY.md §3.4):

    read_parquet(pages)                               [driver plans blocks]
      → map_batches(extract_text_batch)               [stateless; byte-identity invariant]
      → map_batches(TagDocs, concurrency=N, ...)      [actor pool: clean→tag→validate→
                                                       coalesce→groups→triples per doc]
      → explode to mentions / groups / triples        [stateless]
      → LinkMentions / LinkTriples actor pools        [broadcast alias dict]
      → combiner map_batches + groupby shuffles       [canonicalize, edge dedup]
      → sort(canonical_id) → write_parquet

Everything upstream of canonicalization is embarrassingly parallel per-url; the only
shuffles are the three listed in SURVEY.md §4. The per-doc phase is consumed by
several downstream tables, so callers either materialize the (small, html-free) doc
dataset or run the checkpointed runner which persists it per-partition.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..oracle import KGConfig
from ..stages.canonicalize import (bucket_pairs, canonical_id, lsh_band_rows,
                                   finalize_node_group, partial_node_counts)
from ..stages.extract import extract_text_batch
from ..stages.link import LinkMentions, LinkTriples
from ..stages.tag import TagDocs, explode_groups, explode_mentions, explode_triples


def _auto_concurrency(cfg: KGConfig) -> int:
    if cfg.tag_concurrency is not None:
        return cfg.tag_concurrency
    try:
        n = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        n = 4
    return max(2, n - 2)  # leave CPUs for read/explode/write stages


def read_pages(fixture_dir: str) -> ray.data.Dataset:
    return ray.data.read_parquet(os.path.join(fixture_dir, "pages"))


def tag_pages(pages: ray.data.Dataset, cfg: KGConfig, fixture_dir: str) -> ray.data.Dataset:
    """pages → per-doc nested dataset (url, token_count, mentions, groups, triples)."""
    ds = pages.map_batches(extract_text_batch, batch_format="pyarrow",
                           zero_copy_batch=True)
    # the tagger works on raw bytes (html); drop everything else before the actor
    # pool so only (url, html) moves through the object store
    ds = ds.select_columns(["url", "html"])
    return ds.map_batches(
        TagDocs,
        fn_constructor_kwargs=dict(
            model_type=cfg.model_type, model_kwargs=cfg.model_kwargs,
            tags=cfg.tags, custom_patterns=cfg.custom_patterns,
            group_queries=cfg.group_queries, text_column="html"),
        batch_size=cfg.batch_size,
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=_auto_concurrency(cfg),
        num_cpus=1,
    )


def _linked_mentions(docs: ray.data.Dataset, cfg: KGConfig, alias_path: str) -> ray.data.Dataset:
    return (docs
            .map_batches(explode_mentions, batch_format="pyarrow")
            .map_batches(LinkMentions,
                         fn_constructor_kwargs=dict(alias_path=alias_path,
                                                    min_score=cfg.min_link_score),
                         batch_format="pyarrow", concurrency=cfg.link_concurrency))


def _linked_triples(docs: ray.data.Dataset, cfg: KGConfig, alias_path: str) -> ray.data.Dataset:
    return (docs
            .map_batches(explode_triples, batch_format="pyarrow")
            .map_batches(LinkTriples,
                         fn_constructor_kwargs=dict(alias_path=alias_path,
                                                    min_score=cfg.min_link_score),
                         batch_format="pyarrow", concurrency=cfg.link_concurrency))


def build_root_map(nodes_pre: ray.data.Dataset) -> dict[str, str]:
    """MinHash-LSH clustering of unlinked surface keys. The verified-pair list and
    the resulting root map cover only keys that actually cluster — a small set —
    so it is collected to the driver and broadcast (ray.put), never joined."""
    from ..stages.canonicalize import resolve_roots

    def band_rows(batch: pa.Table) -> pa.Table:
        keys, bands, hashes = [], [], []
        for key in batch["entity_key"].to_pylist():
            if not key.startswith("surf:"):
                continue
            for band, h in lsh_band_rows(key[5:]):
                keys.append(key); bands.append(band); hashes.append(h)
        return pa.table({"entity_key": pa.array(keys, pa.string()),
                         "band": pa.array(bands, pa.int32()),
                         "band_hash": pa.array(hashes, pa.int64())})

    pair_rows = (nodes_pre
                 .map_batches(band_rows, batch_format="pyarrow")
                 .groupby(["band", "band_hash"])
                 .map_groups(bucket_pairs, batch_format="pyarrow")
                 .take_all())
    edges = [(r["entity_key"], r["root"]) for r in pair_rows]
    return resolve_roots(edges)


def build_graph(mentions: ray.data.Dataset, triples: ray.data.Dataset) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """(linked mentions, linked triples) → (nodes, edges), both sorted.

    shuffle #1: canonicalization groupby over combiner partials;
    shuffle #2 avoided: the cluster root map is broadcast (ray.put), not joined;
    shuffle #3: edge dedup groupby over combiner partials."""
    nodes_pre = (mentions
                 .map_batches(partial_node_counts, batch_format="pyarrow")
                 .groupby("entity_key")
                 .map_groups(finalize_node_group, batch_format="pyarrow"))
    nodes_pre = nodes_pre.materialize()  # small (distinct entities); reused twice

    root_map_ref = ray.put(build_root_map(nodes_pre))

    def apply_roots_nodes(batch: pa.Table) -> pa.Table:
        root_map = ray.get(root_map_ref)
        cids = [canonical_id(root_map.get(k, k))
                for k in batch["entity_key"].to_pylist()]
        return batch.append_column("canonical_id", pa.array(cids, pa.string()))

    def merge_node_group(group: pa.Table) -> pa.Table:
        cid = group["canonical_id"][0].as_py()
        label_counts: dict[str, int] = {}
        surfaces: set[str] = set()
        total = 0
        for label, sf_list, cnt in zip(group["label"].to_pylist(),
                                       group["surface_forms"].to_pylist(),
                                       group["mention_count"].to_pylist()):
            label_counts[label] = label_counts.get(label, 0) + cnt
            surfaces.update(sf_list)
            total += cnt
        label = max(sorted(label_counts), key=lambda x: label_counts[x])
        return pa.table({
            "canonical_id": pa.array([cid], pa.string()),
            "surface_forms": pa.array([sorted(surfaces)], pa.list_(pa.string())),
            "label": pa.array([label], pa.string()),
            "mention_count": pa.array([total], pa.int64()),
        })

    nodes = (nodes_pre
             .map_batches(apply_roots_nodes, batch_format="pyarrow")
             .groupby("canonical_id")
             .map_groups(merge_node_group, batch_format="pyarrow")
             .sort("canonical_id"))

    # shuffle #3: edge dedup/weights over combiner partials
    def partial_edge_counts(batch: pa.Table) -> pa.Table:
        root_map = ray.get(root_map_ref)
        agg: dict[tuple[str, str, str], int] = {}
        for sk, p, ok in zip(batch["subj_key"].to_pylist(),
                             batch["pred"].to_pylist(),
                             batch["obj_key"].to_pylist()):
            k = (canonical_id(root_map.get(sk, sk)), p,
                 canonical_id(root_map.get(ok, ok)))
            agg[k] = agg.get(k, 0) + 1
        keys = list(agg)
        return pa.table({
            "subj_id": pa.array([k[0] for k in keys], pa.string()),
            "pred": pa.array([k[1] for k in keys], pa.string()),
            "obj_id": pa.array([k[2] for k in keys], pa.string()),
            "partial_weight": pa.array([agg[k] for k in keys], pa.int64()),
        })

    from ray.data.aggregate import Sum
    edges = (triples
             .map_batches(partial_edge_counts, batch_format="pyarrow")
             .groupby(["subj_id", "pred", "obj_id"])
             .aggregate(Sum("partial_weight", alias_name="weight"))
             .sort(["subj_id", "pred", "obj_id"]))

    return nodes, edges


def kg_tables(docs: ray.data.Dataset, cfg: KGConfig, fixture_dir: str) -> dict[str, ray.data.Dataset]:
    """Per-doc nested dataset → {mentions, groups, triples, nodes, edges} datasets.
    ``docs`` should be materialized or parquet-backed (it is consumed 4×)."""
    alias_path = os.path.join(fixture_dir, "alias_dict.parquet")

    mentions = _linked_mentions(docs, cfg, alias_path).materialize()
    triples = _linked_triples(docs, cfg, alias_path).materialize()
    groups = docs.map_batches(explode_groups, batch_format="pyarrow")

    nodes, edges = build_graph(mentions, triples)
    return {"mentions": mentions, "groups": groups, "triples": triples,
            "nodes": nodes, "edges": edges}


def kg_tables_from_parquet(out_dir: str, cfg: KGConfig, fixture_dir: str,
                           graph_dir: str) -> dict[str, int]:
    """Phase-2 entry for the checkpointed runner: read phase-1 mentions/triples
    Parquet (already linked), build + write nodes/edges."""
    mentions = ray.data.read_parquet(os.path.join(out_dir, "mentions"),
                                     columns=["entity_key", "label", "text"])
    triples = ray.data.read_parquet(os.path.join(out_dir, "triples"),
                                    columns=["subj_key", "pred", "obj_key"])
    nodes, edges = build_graph(mentions, triples)
    os.makedirs(graph_dir, exist_ok=True)
    nodes = nodes.materialize()
    edges = edges.materialize()
    nodes.write_parquet(os.path.join(graph_dir, "nodes"))
    edges.write_parquet(os.path.join(graph_dir, "edges"))
    return {"nodes": nodes.count(), "edges": edges.count()}


def run_kg_streaming(fixture_dir: str, cfg: KGConfig | None = None,
                     out_dir: str | None = None) -> dict:
    """End-to-end streaming run. Returns summary counts; writes Parquet when
    ``out_dir`` is given."""
    cfg = cfg or KGConfig()
    docs = tag_pages(read_pages(fixture_dir), cfg, fixture_dir).materialize()
    tables = kg_tables(docs, cfg, fixture_dir)

    summary: dict[str, int] = {}
    for name in ("mentions", "groups", "triples", "nodes", "edges"):
        ds = tables[name]
        if out_dir is not None:
            path = os.path.join(out_dir, name)
            os.makedirs(path, exist_ok=True)
            ds = ds.materialize()
            ds.write_parquet(path)
        summary[name] = ds.count()
    summary["docs"] = docs.count()
    return summary
