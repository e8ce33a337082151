"""Persistent chat-session redaction (internal/chat/session.go:67-226).

The reference keeps per-session ``TagMetadata`` (Assigned surface→placeholder,
TagMap placeholder→surface, per-label counters) in a DB row and re-loads /
re-saves it around every message (session.go:180-204, getTagMetadata /
updateTagMetadata), so ``[NAME_1]`` refers to the same person for the life of
the session, and replies containing placeholders can be restored for display.

Ray-native shape: one ``ChatSession`` per conversation. State is a plain JSON
document persisted through the sources/fs seam (local path or fsspec URL —
memory://, s3://, ... — standing in for the reference's DB row). At service
scale sessions are independent and tiny; host each as a named Ray actor keyed
by session id (``ray.remote(ChatSession)``) — no Dataset machinery belongs
here, a chat message is one row.
"""

from __future__ import annotations

import json
from typing import Callable, Sequence

from ..sources import fs
from .redact import redact_text


def _entity_dicts(entities: Sequence) -> list[dict]:
    """Accept Entity dataclasses (core/entity.py) or plain dicts."""
    out = []
    for e in entities:
        if isinstance(e, dict):
            out.append(e)
        else:
            text = e.text.decode("utf-8", "ignore") if isinstance(e.text, bytes) else e.text
            out.append({"start": e.start, "end": e.end,
                        "label": e.label, "text": text})
    return out


class ChatSession:
    """Stateful redaction session.

    ``predict``: callable ``bytes -> list[Entity|dict]`` (any registry model —
    hash tagger, presidio, ensemble). ``store``: optional path/URL where tag
    metadata + history persist across process restarts (session.go's DB)."""

    def __init__(self, predict: Callable, store: str | None = None):
        self._predict = predict
        self._store = store
        # TagMetadata (session.go:24-29)
        self.assigned: dict[str, str] = {}
        self.tag_map: dict[str, str] = {}
        self.label_counts: dict[str, int] = {}
        self.history: list[dict] = []  # saveMessage rows (session.go:206-226)
        if store is not None:
            try:
                with fs.open_file(fs.join(store, "session.json")) as f:
                    meta = json.load(f)
                self.assigned = meta["assigned"]
                self.tag_map = meta["tag_map"]
                self.label_counts = meta["label_counts"]
                self.history = meta["history"]
            except (FileNotFoundError, KeyError):
                pass  # new session

    def _save(self) -> None:
        if self._store is None:
            return
        fs.makedirs(self._store)
        with fs.open_file(fs.join(self._store, "session.json"), "w") as f:
            json.dump({"assigned": self.assigned, "tag_map": self.tag_map,
                       "label_counts": self.label_counts,
                       "history": self.history}, f)

    def redact(self, text: str | bytes) -> tuple[str, dict[str, str]]:
        """Redact one user message with session-stable placeholders; persists
        the updated TagMetadata (session.go:116-134 Redact + update). Returns
        (redacted_text, tag_map) like ChatItem (session.go:188-192)."""
        raw = text.encode("utf-8") if isinstance(text, str) else text
        ents = _entity_dicts(self._predict(raw))
        red, _ = redact_text(raw, ents, self.assigned, self.label_counts,
                             tag_map=self.tag_map)
        self._save()
        return red, dict(self.tag_map)

    def restore(self, text: str) -> str:
        """Replace placeholders with their original surfaces — the frontend's
        unredact over the yielded TagMap (session.go:188-192)."""
        for token, surface in self.tag_map.items():
            text = text.replace(token, surface)
        return text

    def send(self, user_text: str, reply_fn: Callable[[str], str]) -> dict:
        """One ChatStream turn (session.go:150-226): redact, build context from
        history, call the (external) reply function on REDACTED text only, and
        persist both messages atomically — the model never sees raw PII."""
        red, tag_map = self.redact(user_text)
        context = "".join(f'{m["role"]}: {m["content"]}\n' for m in self.history)
        reply = reply_fn(context + f"User: {red}\n")
        self.history.append({"role": "user", "content": red})
        self.history.append({"role": "ai", "content": reply})
        self._save()
        return {"redacted": red, "reply": reply, "tag_map": tag_map}
