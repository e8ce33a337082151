"""Shared mutable cluster state (SURVEY.md §2: the few things the Dataset API
can't express): a named metrics counter actor for lineage-observable events
(LSH bucket splits, dropped pairs, budget fallbacks)."""

from .metrics import get_metrics, incr_metric, metrics_snapshot, reset_metrics

__all__ = ["get_metrics", "incr_metric", "metrics_snapshot", "reset_metrics"]
