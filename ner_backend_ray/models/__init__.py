from .base import Tagger, load_tagger, register_tagger
from .regex_tagger import RegexTagger
from .presidio import PresidioTagger
from .hash_tagger import HashEmbeddingTagger, build_default_tagger

__all__ = [
    "Tagger", "load_tagger", "register_tagger",
    "RegexTagger", "PresidioTagger", "HashEmbeddingTagger", "build_default_tagger",
]
