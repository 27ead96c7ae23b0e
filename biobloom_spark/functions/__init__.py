from .stats import betainc, binom_sf, min_count, score_to_fpr
from .text import (
    EXTRACTOR_VERSION,
    doc_shingle_hashes,
    dust_mask,
    extract_text,
    frame_count,
    tokenize,
)

__all__ = [
    "betainc",
    "binom_sf",
    "min_count",
    "score_to_fpr",
    "EXTRACTOR_VERSION",
    "doc_shingle_hashes",
    "dust_mask",
    "extract_text",
    "frame_count",
    "tokenize",
]
