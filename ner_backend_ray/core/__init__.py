from .entity import Entity, create_entity, to_valid_utf8, CONTEXT_LENGTH
from .clean import clean_text_with_spans
from .validators import filter_entities
from .coalesce import coalesce_entities, EXCLUDED_TAGS
from .crf import CRF, get_word_ids, aggregate_predictions
from .dsl import parse_query, QueryError

__all__ = [
    "Entity", "create_entity", "to_valid_utf8", "CONTEXT_LENGTH",
    "clean_text_with_spans", "filter_entities",
    "coalesce_entities", "EXCLUDED_TAGS",
    "CRF", "get_word_ids", "aggregate_predictions",
    "parse_query", "QueryError",
]
