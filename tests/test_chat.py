"""Persistent chat-session redaction (internal/chat/session.go:67-226)."""

import re

from ner_backend_ray.ops.chat import ChatSession


def _regex_predict(raw: bytes):
    """Toy NAME tagger: capitalized first+last name pairs."""
    ents = []
    for m in re.finditer(rb"[A-Z][a-z]+ [A-Z][a-z]+", raw):
        ents.append({"start": m.start(), "end": m.end(), "label": "NAME",
                     "text": m.group().decode()})
    return ents


def test_stable_placeholders_across_messages():
    s = ChatSession(_regex_predict)
    r1, tm1 = s.redact("I met Alice Smith and Bob Jones today")
    assert r1 == "I met [NAME_1] and [NAME_2] today"
    # same surface later in the session -> SAME tag (session.go:92-99)
    r2, tm2 = s.redact("Bob Jones called Carol White")
    assert r2 == "[NAME_2] called [NAME_3]"
    assert tm2 == {"[NAME_1]": "Alice Smith", "[NAME_2]": "Bob Jones",
                   "[NAME_3]": "Carol White"}
    assert s.restore("Tell [NAME_2] hi") == "Tell Bob Jones hi"


def test_session_persists_across_restart(tmp_path):
    """TagMetadata reload (session.go:180-204): a new process-level instance
    over the same store continues the numbering."""
    store = str(tmp_path / "sess1")
    s1 = ChatSession(_regex_predict, store=store)
    assert s1.redact("ping Alice Smith")[0] == "ping [NAME_1]"

    s2 = ChatSession(_regex_predict, store=store)  # "restart"
    r, tag_map = s2.redact("Alice Smith met Dave Brown")
    assert r == "[NAME_1] met [NAME_2]"
    assert tag_map["[NAME_1]"] == "Alice Smith"


def test_session_store_on_memory_fs():
    """The DB row stand-in works on a non-local filesystem too."""
    from fsspec.implementations.memory import MemoryFileSystem
    MemoryFileSystem.store.pop("/chat/s9/session.json", None)
    s1 = ChatSession(_regex_predict, store="memory://chat/s9")
    s1.redact("Alice Smith")
    s2 = ChatSession(_regex_predict, store="memory://chat/s9")
    assert s2.redact("Alice Smith again")[0] == "[NAME_1] again"


def test_send_turn_builds_redacted_context_only():
    """ChatStream (session.go:150-177): the reply fn sees ONLY redacted
    history + message; both sides of the turn land in history."""
    seen = []

    def reply_fn(prompt: str) -> str:
        seen.append(prompt)
        return "ok, noted [NAME_1]"

    s = ChatSession(_regex_predict)
    out1 = s.send("I'm Alice Smith", reply_fn)
    out2 = s.send("Alice Smith again", reply_fn)
    assert out1["redacted"] == "I'm [NAME_1]"
    assert out2["redacted"] == "[NAME_1] again"
    assert "Alice Smith" not in "".join(seen)  # raw PII never leaves
    assert "user: I'm [NAME_1]" in seen[1]
    assert s.restore(out1["reply"]) == "ok, noted Alice Smith"
