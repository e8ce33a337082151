#!/usr/bin/env python
"""Hardware-ceiling control for the scaling-efficiency criterion.

The north rule's criterion is throughput scaling efficiency >=0.8 from N to 4N
*nodes*. This sandbox emulates the two cluster sizes with num_cpus=8 vs 32 on
ONE box, which adds a term real multi-node scaling does not have: per-core
throughput drops when 30 cores are busy instead of 6 (shared memory bandwidth
/ LLC / all-core turbo). This control isolates that term with NO Ray at all:
the same tag kernel (the pipeline's dominant stage) runs under plain
multiprocessing at 6 and 30 workers on the same input, inner-timed per worker
(reads and pool startup excluded), steal-sampled.

    per_core_ratio = (docs/s/worker @ 6 procs) / (docs/s/worker @ 30 procs)

Any single-box 8-vs-32 measurement of the pipeline is capped by roughly
1 / per_core_ratio x (pool-size ratio / 4); the multi-node criterion is not.
Report alongside BENCH scaling batches (BASELINE.md).

Usage: python bench_hw_control.py [sf]   (default 0.4; one JSON line)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time


def _steal() -> tuple[int, int]:
    with open("/proc/stat") as f:
        v = list(map(int, f.readline().split()[1:]))
    return sum(v), v[7]


def _worker(args: tuple[int, int, float]) -> float:
    lo, hi, sf = args
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import pyarrow.parquet as pq

    from ner_backend_ray.fixtures.pages import pages_fixture_dir
    from ner_backend_ray.oracle import KGConfig
    from ner_backend_ray.stages.extract import extract_text_batch
    from ner_backend_ray.stages.tag import TagDocs

    fd = pages_fixture_dir(sf)
    cfg = KGConfig()
    td = TagDocs(model_type=cfg.model_type, model_kwargs=cfg.model_kwargs,
                 tags=cfg.tags, custom_patterns=cfg.custom_patterns,
                 group_queries=cfg.group_queries, text_column="html",
                 alias_path=os.path.join(fd, "alias_dict.parquet"),
                 min_link_score=cfg.min_link_score)
    t = pq.read_table(os.path.join(fd, "pages"),
                      columns=["url", "html"]).slice(lo, hi - lo)
    e = extract_text_batch(t).select(["url", "html"])
    t0 = time.time()
    for s in range(0, e.num_rows, 2000):
        td(e.slice(s, 2000))
    return time.time() - t0


def leg(procs: int, n_docs: int, sf: float) -> dict:
    chunk = -(-n_docs // procs)
    spans = [(i * chunk, min((i + 1) * chunk, n_docs), sf) for i in range(procs)]
    with mp.Pool(procs) as pool:
        s0 = _steal()
        inner = pool.map(_worker, spans)
        s1 = _steal()
    per_worker = sum(inner) / len(inner)
    # total actual docs / total worker-seconds: the last span is short when
    # procs doesn't divide n_docs, so chunk/mean would overstate throughput
    # by a different amount at each worker count and bias the leg ratio
    actual_docs = sum(hi - lo for lo, hi, _ in spans)
    docs_per_s_worker = actual_docs / max(1e-9, sum(inner))
    return {"procs": procs, "inner_mean_s": round(per_worker, 2),
            "docs_per_s_per_worker": round(docs_per_s_worker, 1),
            "steal_pct": round(100.0 * (s1[1] - s0[1]) / max(1, s1[0] - s0[0]), 2)}


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.4
    from ner_backend_ray.fixtures.pages import pages_fixture_dir, rows_for_sf
    pages_fixture_dir(sf)
    n_docs = min(rows_for_sf(sf), 240_000)
    # the control is as steal-sensitive as the thing it controls for: retry
    # each leg until it measures under the gate (keep the best attempt
    # otherwise, flagged), like bench.py --scaling
    gate = float(os.environ.get("SCALING_STEAL_MAX", "2.0"))
    attempts_max = int(os.environ.get("HW_CONTROL_ATTEMPTS", "5"))
    legs: dict[int, dict] = {}
    attempts: dict[int, list[dict]] = {6: [], 30: []}
    for procs in (6, 30):
        best = None
        for _ in range(attempts_max):
            rec = leg(procs, n_docs, sf)
            attempts[procs].append(rec)
            if best is None or rec["steal_pct"] < best["steal_pct"]:
                best = rec
            if rec["steal_pct"] <= gate:
                break
        legs[procs] = best
    ratio = legs[6]["docs_per_s_per_worker"] / legs[30]["docs_per_s_per_worker"]
    print(json.dumps({
        "metric": "per-core throughput ratio, 6 vs 30 busy cores (no Ray)",
        "value": round(ratio, 3),
        "unit": "x",
        "narrow": legs[6], "wide": legs[30],
        "gated": legs[6]["steal_pct"] <= gate and legs[30]["steal_pct"] <= gate,
        "steal_gate_pct": gate,
        "attempts": {str(k): v for k, v in attempts.items()},
        "sf": sf, "n_docs": n_docs,
        "note": "single-box memory-bandwidth/turbo term absent from real "
                "N->4N multi-node scaling; see BASELINE.md",
    }))


if __name__ == "__main__":
    main()
