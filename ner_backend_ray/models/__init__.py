from .base import Tagger, load_tagger, register_tagger
from .regex_tagger import RegexTagger
from .presidio import PresidioTagger
from .hash_tagger import HashEmbeddingTagger, build_default_tagger
from .ensemble import EnsembleTagger

__all__ = [
    "Tagger", "load_tagger", "register_tagger",
    "RegexTagger", "PresidioTagger", "HashEmbeddingTagger", "build_default_tagger",
    "EnsembleTagger",
]

def _windowed_hash(window_tokens: int = 100, **kwargs):
    from .base import WindowedTagger
    from .hash_tagger import build_default_tagger
    return WindowedTagger(build_default_tagger(**kwargs), window_tokens)

from .base import register_tagger as _rt
_rt("windowed_hash", _windowed_hash)
