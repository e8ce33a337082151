"""Tagger protocol and registry.

Analog of the reference's Model interface + ModelLoader registry
(internal/core/model.go:13-75): an opaque stateful scorer loaded once per worker
(here: once per Ray actor in ``__init__``) exposing per-document prediction.

``predict`` takes raw document bytes and returns entities in token/offset order
(ascending start), as the reference taggers do (SURVEY.md §2.10) — FilterEntities
relies on that ordering.
"""

from __future__ import annotations

from typing import Callable, Protocol

from ..core.entity import Entity


class Tagger(Protocol):
    def predict(self, text: bytes) -> list[Entity]: ...


_REGISTRY: dict[str, Callable[..., Tagger]] = {}


def register_tagger(model_type: str, loader: Callable[..., Tagger]) -> None:
    _REGISTRY[model_type] = loader


def load_tagger(model_type: str, **kwargs) -> Tagger:
    """model.go:49-75 analog — keyed loader registry."""
    try:
        loader = _REGISTRY[model_type]
    except KeyError:
        raise ValueError(f"unknown model type {model_type!r}; known: {sorted(_REGISTRY)}")
    return loader(**kwargs)
