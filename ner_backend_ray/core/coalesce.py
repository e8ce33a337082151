"""Entity coalescing and excluded-tag policy.

Reference semantics: internal/core/processor.go:519-554 (coalesceEntities) and
processor.go:43-48 (ExcludedTags). Entities are flattened from the per-label map,
sorted by start offset, and adjacent same-label entities with a gap of at most one
byte are merged, stitching the gap bytes from the left entity's RContext.
"""

from __future__ import annotations

from .entity import Entity

# processor.go:43-48 — dropped unconditionally from model output.
EXCLUDED_TAGS = frozenset({"GENDER", "SEXUAL_ORIENTATION", "ETHNICITY", "SERVICE_CODE"})

_MAX_ENTITY_GAP = 1  # processor.go:520


def coalesce_entities(label_to_entities: dict[str, list[Entity]]) -> list[Entity]:
    flattened: list[Entity] = []
    for ents in label_to_entities.values():
        flattened.extend(ents)
    if not flattened:
        return []

    flattened.sort(key=lambda e: e.start)

    out: list[Entity] = []
    cur = flattened[0]
    # copy so merging never mutates caller-owned entities
    cur = Entity(cur.label, cur.text, cur.start, cur.end, cur.lcontext, cur.rcontext)
    for nxt in flattened[1:]:
        gap = nxt.start - cur.end
        if cur.label == nxt.label and nxt.start >= cur.end and gap <= _MAX_ENTITY_GAP:
            # processor.go:541-544 — stitch the gap from the RContext bytes.
            cur.text = cur.text + cur.rcontext[:gap] + nxt.text
            cur.end = nxt.end
            cur.rcontext = nxt.rcontext
        else:
            out.append(cur)
            cur = Entity(nxt.label, nxt.text, nxt.start, nxt.end, nxt.lcontext, nxt.rcontext)
    out.append(cur)
    return out
