"""Pure-numpy mergeable sketches.

Every sketch follows the (init, update_batch, merge, serialize/deserialize)
contract so the Spark layer can build partials per bucket inside Arrow UDFs
and reduce them associatively (SURVEY.md §2.11).
"""

from .bloom import (
    BloomSketch,
    approx_fpr,
    blocked_size_bits,
    optimal_hash_num,
    optimal_size_bits,
    resolve_block_layout,
)
from .countmin import CountMinSketch
from .hashing import bloom_indices, hash_bytes, hash_tokens, shingle_hashes, splitmix64
from .hll import HLLSketch
from .kll import KLLSketch
from .tdigest import TDigestSketch

__all__ = [
    "resolve_block_layout",
    "BloomSketch",
    "CountMinSketch",
    "HLLSketch",
    "KLLSketch",
    "TDigestSketch",
    "approx_fpr",
    "blocked_size_bits",
    "optimal_hash_num",
    "optimal_size_bits",
    "bloom_indices",
    "hash_bytes",
    "hash_tokens",
    "shingle_hashes",
    "splitmix64",
]
