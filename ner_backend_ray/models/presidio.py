"""Stateless pattern-recognizer bank ("presidio"-style tagger).

Analog of internal/core/presidio.go:50-243: a bank of scored regexes per entity type
(patterns adapted from the public Microsoft Presidio predefined recognizers, pinned to
the RE2-compatible subset — no lookaround, mirroring presidio.go:75-129's workarounds),
mapped onto the reference label set (presidio.go:32-45). Per text: every regex with
score >= threshold runs, matches are deduped on (label, start, end), credit cards must
pass Luhn, and recognizers may carry an extra validate hook.
"""

from __future__ import annotations

import re

from ..core.entity import Entity, create_entity
from ..core.validators import luhn_valid
from .base import register_tagger

DEFAULT_THRESHOLD = 0.5  # presidio.go defaultPresidioThreshold


def _pan_validate(s: bytes) -> bool:
    # presidio.go:74-95 — replaces the PAN low-strength lookahead
    letters = sum(1 for c in s if 65 <= c <= 90 or 97 <= c <= 122)
    digits = sum(1 for c in s if 48 <= c <= 57)
    return letters >= 1 and digits >= 4


def _vehicle1_validate(s: bytes) -> bool:
    return s[1:] != b"00000"  # presidio.go:97-110


def _vehicle2_validate(s: bytes) -> bool:
    return s[0:2] != b"00"  # presidio.go:112-123


_EMAIL = (rb"\b(([!#$%&'*+\-/=?^_`{|}~\w]|[!#$%&'*+\-/=?^_`{|}~\w]"
          rb"[!#$%&'*+\-/=?^_`{|}~.\w]*[!#$%&'*+\-/=?^_`{|}~\w])@\w+([-.]\w+)*\.\w+([-.]\w+)*)\b")

_URL_TLDS = rb"(com|net|org|edu|gov|mil|io|co|us|uk|de|jp|info|biz|dev|app|ai)"

# (label, pattern, score, validate)
_BANK: list[tuple[str, bytes, float, object]] = [
    ("SSN", rb"\b[0-9]{3}[- .][0-9]{2}[- .][0-9]{4}\b", 0.85, None),
    ("SSN", rb"\b[0-9]{9}\b", 0.05, None),                                  # weak, inert at default threshold
    ("EMAIL", _EMAIL, 1.0, None),
    ("URL", rb"\b(([a-z0-9][a-z0-9\-]*\.)+" + _URL_TLDS + rb")(/[^\s]*)?", 0.5, None),
    ("CARD_NUMBER",
     rb"\b((4[0-9]{3})|(5[0-5][0-9]{2})|(6[0-9]{3})|(1[0-9]{3})|(3[0-9]{3}))"
     rb"[- ]?([0-9]{3,4})[- ]?([0-9]{3,4})[- ]?([0-9]{3,5})\b", 1.0, "luhn"),
    ("DATE", rb"\b[0-9]{1,2}[/-][0-9]{1,2}[/-][0-9]{2,4}\b", 0.6, None),
    ("DATE", rb"\b[0-9]{4}-[0-9]{2}-[0-9]{2}\b", 0.6, None),
    ("DATE",
     rb"\b(Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]* [0-9]{1,2},? [0-9]{4}\b",
     0.6, None),
    ("VIN", rb"\b[A-HJ-NPR-Z0-9]{17}\b", 0.3, None),                        # weak driver/VIN
    ("ID_NUMBER", rb"\b9[0-9]{2}[- ]?(7[0-9]|8[0-8])[- ]?[0-9]{4}\b", 0.6, None),  # ITIN
    ("ID_NUMBER", rb"\b[0-9]{8,17}\b", 0.05, None),                          # bank acct, weak
    ("ID_NUMBER", rb"\b[\w@#$%^?~-]{10}\b", 0.05, _pan_validate),            # PAN, weak
    ("VIN", rb"\bI[0-9]{5}\b", 0.2, _vehicle1_validate),                     # vehicle reg pt 1
    ("VIN", rb"\b[0-9]{2}[A-FH-KPRX][0-9]{6}[A-Z]\b", 0.2, _vehicle2_validate),
]


class PresidioTagger:
    def __init__(self, threshold: float = DEFAULT_THRESHOLD):
        self.threshold = threshold
        self.bank = [(label, re.compile(pat), score, validate)
                     for label, pat, score, validate in _BANK]

    def predict(self, text: bytes) -> list[Entity]:
        results: list[tuple[str, int, int]] = []
        seen: set[tuple[str, int, int]] = set()
        for label, rx, score, validate in self.bank:
            if score < self.threshold:
                continue
            for m in rx.finditer(text):
                start, end = m.start(), m.end()
                key = (label, start, end)
                if key in seen:
                    continue
                seen.add(key)
                match = text[start:end]
                if validate == "luhn":
                    digits = re.sub(rb"\D", b"", match).decode("ascii")
                    if not luhn_valid(digits):
                        continue
                elif callable(validate):
                    if not validate(match):
                        continue
                results.append((label, start, end))
        results.sort(key=lambda r: (r[1], r[2]))
        return [create_entity(label, text, s, e) for label, s, e in results]


register_tagger("presidio", lambda threshold=DEFAULT_THRESHOLD: PresidioTagger(threshold))
