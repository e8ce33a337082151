"""Configurable regex tagger.

Analog of the reference's test ``regexModel`` (internal/core/processor_test.go:18-46)
and the user custom-regex surface (processor.go:615-628): a pattern per label, all
matches become entities with ±20-byte contexts. Used as the cheap injectable tagger in
dataflow tests and for the SQL-verifiable mention queries.
"""

from __future__ import annotations

import re

from ..core.entity import Entity, create_entity
from .base import register_tagger


class RegexTagger:
    def __init__(self, patterns: dict[str, str | bytes]):
        self.patterns: dict[str, re.Pattern[bytes]] = {}
        for label, pat in patterns.items():
            if isinstance(pat, str):
                pat = pat.encode("utf-8")
            self.patterns[label] = re.compile(pat)

    def predict(self, text: bytes) -> list[Entity]:
        entities: list[Entity] = []
        for label, pattern in self.patterns.items():
            for m in pattern.finditer(text):
                entities.append(create_entity(label, text, m.start(), m.end()))
        # keep offset order across labels (FilterEntities expects token order)
        entities.sort(key=lambda e: (e.start, e.end))
        return entities


register_tagger("regex", lambda patterns: RegexTagger(patterns))
