"""Analytic model of the build-partials exchange volume vs corpus size.

The build's map tasks each ship their *unique* frame-hash set (6-byte
delta-packed, `maker._pack_slice_hashes`).  Whether that exchange is
"fixed" (amortizable by a larger corpus) or grows with the corpus depends
entirely on whether the realized shingle vocabulary saturates its space.
This model computes the expected distinct w-gram count exactly from the
synthetic corpus generator's probability structure (`corpus._vocab`:
per-lang 400 own tokens at p=1/533 plus 13 doubled + 107 single common
tokens), by probability classes:

    E[distinct after D iid draws] =
        sum_{c=0..3} C(3,c) 13^c 507^(3-c) (1 - (1 - 2^c/533^3)^D)

Validation: at 2M pages / coalesce 8 it predicts 1.38 GB of exchange —
the measured `partial_bytes_total` was 1.384 GB (BENCH.md 03:18 re-profile).

Usage: python tools/exchange_model.py [--docs 8000000 --tasks 8]
"""

from __future__ import annotations

import argparse
import math
from math import comb

FRAMES_PER_DOC = 118  # mean 120 tokens, shingle w=3
H8 = sum(1.0 / r for r in range(1, 9))  # zipf s=1 lang weights


def expected_distinct(draws: float) -> float:
    """Expected distinct ordered 3-grams after `draws` iid draws from one
    language's vocabulary (two probability classes, see module doc)."""
    tot = 0.0
    for c in range(4):
        n = comb(3, c) * 13**c * 507 ** (3 - c)
        p = (2.0**c) / 533**3
        tot += n * (1.0 - math.exp(draws * math.log1p(-p)))
    return tot


def exchange_rows(n_docs: int, tasks: int) -> tuple[float, float]:
    """(global distinct shingles, sum over tasks of per-task distinct) —
    the latter is what actually rides the partials exchange."""
    g = t = 0.0
    for r in range(1, 9):
        d_lang = n_docs * ((1.0 / r) / H8) * FRAMES_PER_DOC
        g += expected_distinct(d_lang)
        t += tasks * expected_distinct(d_lang / tasks)
    return g, t


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, nargs="*", default=[2_000_000, 8_000_000])
    ap.add_argument("--tasks", type=int, default=8)
    args = ap.parse_args()
    for n in args.docs:
        g, t = exchange_rows(n, args.tasks)
        print(
            f"{n:>12,} docs: global distinct {g/1e6:8.1f}M | "
            f"exchange rows {t/1e6:8.1f}M | "
            f"exchange bytes @6B {t*6/1e9:6.2f} GB"
        )


if __name__ == "__main__":
    main()
