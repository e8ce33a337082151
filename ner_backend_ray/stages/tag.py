"""NER tagging stage — the stateful actor-pool map_batches.

The analog of the reference's per-task inference loop
(internal/core/processor.go:174-406): the model is loaded ONCE per actor in
``__init__`` (the reference downloads + loads per task, processor.go:408-436; an
actor pool amortizes strictly better), then each Arrow batch of pages runs the
per-document chain (core/inference.py) and emits one row per document with nested
mentions/groups — downstream stateless stages explode those into flat tables.

Usage:
    ds.map_batches(TagDocs, fn_constructor_kwargs=dict(...), concurrency=N,
                   batch_size=B, batch_format="pyarrow", zero_copy_batch=True)
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..core.dsl import parse_query
from ..core.inference import run_inference_on_doc

MENTION_TYPE = pa.struct([
    ("start", pa.int64()), ("end", pa.int64()), ("label", pa.string()),
    ("text", pa.string()), ("lcontext", pa.string()), ("rcontext", pa.string()),
    ("is_custom", pa.bool_()),
])

TRIPLE_TYPE = pa.struct([
    ("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string()),
    ("subj_label", pa.string()), ("obj_label", pa.string()),
])

DOC_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("token_count", pa.int64()),
    ("mentions", pa.list_(MENTION_TYPE)),
    ("groups", pa.list_(pa.string())),
    ("triples", pa.list_(TRIPLE_TYPE)),
])


def _decode(b: bytes) -> str:
    # mention text for custom tags is the raw slice (processor.go:619); scrub at the
    # Arrow boundary only.
    return b.decode("utf-8", "ignore")


class TagDocs:
    def __init__(self,
                 model_type: str = "hash_embedding",
                 model_kwargs: dict | None = None,
                 tags: list[str] | None = None,
                 custom_patterns: dict[str, str] | None = None,
                 group_queries: dict[str, str] | None = None,
                 text_column: str = "html",
                 emit_triples: bool = True):
        from ..models import load_tagger  # late import keeps actor pickling light
        self.model = load_tagger(model_type, **(model_kwargs or {}))
        self.tags = set(tags) if tags is not None else None
        self.custom = {name: re.compile(p.encode("utf-8") if isinstance(p, str) else p)
                       for name, p in (custom_patterns or {}).items()}
        self.groups = {name: parse_query(q) for name, q in (group_queries or {}).items()}
        self.text_column = text_column
        self.emit_triples = emit_triples

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        col = batch[self.text_column]
        if pa.types.is_binary(col.type) or pa.types.is_large_binary(col.type):
            texts = col.to_pylist()
        else:
            texts = [t.encode("utf-8") for t in col.to_pylist()]

        from .triples import extract_triples_from_doc

        custom_names = set(self.custom)
        out_tokens: list[int] = []
        out_mentions: list[list[dict]] = []
        out_groups: list[list[str]] = []
        out_triples: list[list[dict]] = []
        for text in texts:
            res = run_inference_on_doc(text, self.model, self.tags, self.custom, self.groups)
            out_tokens.append(res.token_count)
            mentions = [
                {"start": m.start, "end": m.end, "label": m.label,
                 "text": _decode(m.text), "lcontext": _decode(m.lcontext),
                 "rcontext": _decode(m.rcontext), "is_custom": m.label in custom_names}
                for m in res.mentions
            ]
            out_mentions.append(mentions)
            out_groups.append(res.groups)
            if self.emit_triples:
                out_triples.append([
                    {"subj": s, "pred": p, "obj": o, "subj_label": sl, "obj_label": ol}
                    for (s, p, o, sl, ol) in extract_triples_from_doc(text, mentions)
                ])
            else:
                out_triples.append([])

        return pa.table({
            "url": pa.array(urls, pa.string()),
            "token_count": pa.array(out_tokens, pa.int64()),
            "mentions": pa.array(out_mentions, pa.list_(MENTION_TYPE)),
            "groups": pa.array(out_groups, pa.list_(pa.string())),
            "triples": pa.array(out_triples, pa.list_(TRIPLE_TYPE)),
        })


def explode_mentions(batch: pa.Table) -> pa.Table:
    """Stateless: per-doc nested rows → flat mentions table (the ObjectEntity analog,
    internal/database/schema.go:135-144)."""
    urls, starts, ends, labels, texts, lctx, rctx, is_custom = [], [], [], [], [], [], [], []
    mcol = batch["mentions"].to_pylist()
    ucol = batch["url"].to_pylist()
    for url, mentions in zip(ucol, mcol):
        for m in mentions:
            urls.append(url); starts.append(m["start"]); ends.append(m["end"])
            labels.append(m["label"]); texts.append(m["text"])
            lctx.append(m["lcontext"]); rctx.append(m["rcontext"])
            is_custom.append(m["is_custom"])
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "start": pa.array(starts, pa.int64()),
        "end": pa.array(ends, pa.int64()),
        "label": pa.array(labels, pa.string()),
        "text": pa.array(texts, pa.string()),
        "lcontext": pa.array(lctx, pa.string()),
        "rcontext": pa.array(rctx, pa.string()),
        "is_custom": pa.array(is_custom, pa.bool_()),
    })


def explode_triples(batch: pa.Table) -> pa.Table:
    """Stateless: per-doc nested triples → flat (url, subj, pred, obj, labels)."""
    o_url, o_s, o_p, o_o, o_sl, o_ol = [], [], [], [], [], []
    for url, triples in zip(batch["url"].to_pylist(), batch["triples"].to_pylist()):
        for t in triples:
            o_url.append(url); o_s.append(t["subj"]); o_p.append(t["pred"])
            o_o.append(t["obj"]); o_sl.append(t["subj_label"]); o_ol.append(t["obj_label"])
    return pa.table({
        "url": pa.array(o_url, pa.string()),
        "subj": pa.array(o_s, pa.string()),
        "pred": pa.array(o_p, pa.string()),
        "obj": pa.array(o_o, pa.string()),
        "subj_label": pa.array(o_sl, pa.string()),
        "obj_label": pa.array(o_ol, pa.string()),
    })


def explode_groups(batch: pa.Table) -> pa.Table:
    """Stateless: (url, group) rows — the ObjectGroup analog (schema.go:146-150)."""
    urls, groups = [], []
    for url, gs in zip(batch["url"].to_pylist(), batch["groups"].to_pylist()):
        for g in gs:
            urls.append(url)
            groups.append(g)
    return pa.table({"url": pa.array(urls, pa.string()),
                     "group_name": pa.array(groups, pa.string())})
