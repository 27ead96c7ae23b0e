from .categorizer import (
    categorize,
    categorize_pairs,
    summarize,
    summarize_fused,
    write_demultiplexed,
)
from .maker import build_filters, load_registry, size_filters
from .scoring import SegmentedBatch, score_batch

__all__ = [
    "categorize",
    "categorize_pairs",
    "summarize",
    "summarize_fused",
    "write_demultiplexed",
    "build_filters",
    "load_registry",
    "size_filters",
    "SegmentedBatch",
    "score_batch",
]
