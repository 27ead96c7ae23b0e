from .categorizer import (
    categorize,
    categorize_pairs,
    summarize,
    summarize_fused,
    write_demultiplexed,
)
from .cluster import connected_components, dedup_clusters
from .maker import build_filters, load_registry, merge_registries, size_filters
from .sampling import stratified_sample
from .scoring import SegmentedBatch, score_batch
from .sketch_audit import sketch_error_report
from .skew import (
    key_distribution,
    plan_salts,
    salted_repartition,
    skew_metrics,
    url_domain_col,
)

__all__ = [
    "categorize",
    "categorize_pairs",
    "summarize",
    "summarize_fused",
    "write_demultiplexed",
    "connected_components",
    "dedup_clusters",
    "build_filters",
    "load_registry",
    "merge_registries",
    "size_filters",
    "stratified_sample",
    "SegmentedBatch",
    "score_batch",
    "sketch_error_report",
    "key_distribution",
    "skew_metrics",
    "plan_salts",
    "salted_repartition",
    "url_domain_col",
]
