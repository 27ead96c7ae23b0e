"""``.bf`` + INI file-format interop — the reference's on-disk contract.

The reference persists each filter as two files
(/root/reference/README.md:140-146):
- ``<id>.bf``: the raw little-endian bit-array dump, whose byte size is
  exactly the 64-rounded bit count / 8 (asserted by the reference's own
  test, /root/reference/Tests/BloomFilterTests.cpp:67-78);
- ``<id>.txt``: INI metadata with ``[user_input_options]`` and
  ``[runtime_options]`` sections (write:
  /root/reference/Common/BloomFilterInfo.cpp:81-116, read: :31-53).

This module reads/writes that exact container so a user can exchange
filter files with the reference installation.  Hash-family handling: the
reference hashes DNA k-mers with ntHash; this engine's native family is
FNV/splitmix polynomial shingles.  A container WITHOUT our sources
marker is treated as reference-built and probed through the published
ntHash recurrence (sketch.nthash) — the vendored btl_bloomfilter
submodule is absent from the checkout, so ntHash bit-compat is
per-published-spec, verified by the recurrence/symmetry tests rather
than against a reference binary.  Our own exports record their family
and canonical mode in the sources marker and round-trip losslessly.
Imported filters carry ``block_bits=0`` (the reference's classic
layout).
"""

from __future__ import annotations

import configparser
import os

import numpy as np

from ..sketch import BloomSketch

__all__ = ["write_bf", "read_bf", "registry_row_to_bf", "bf_to_registry_row"]


def write_bf(
    path_prefix: str,
    bitmap: bytes,
    *,
    filter_id: str,
    kmer_size: int,
    desired_fpr: float,
    num_hashes: int,
    expected_entries: int,
    num_entries: int,
    approx_fpr: float,
    redundant_sequences: int = 0,
    redundant_fpr: float = 0.0,
    sources: list[str] | None = None,
) -> tuple[str, str]:
    """Write ``<prefix>.bf`` + ``<prefix>.txt`` (printInfoFile field set,
    BloomFilterInfo.cpp:81-116).  Returns the two paths."""
    if len(bitmap) % 8:
        raise ValueError(".bf bitmap must be a multiple of 64 bits")
    bf_path, txt_path = path_prefix + ".bf", path_prefix + ".txt"
    with open(bf_path, "wb") as f:
        f.write(bitmap)
    src = " ".join(sources or []) + (" " if sources else "")
    with open(txt_path, "w") as f:
        f.write(
            "[user_input_options]\n"
            f"filter_id={filter_id}\n"
            f"kmer_size={kmer_size}\n"
            f"desired_false_positve_rate={desired_fpr}\n"  # sic: reference spelling
            f"number_of_hash_functions={num_hashes}\n"
            f"expected_num_entries={expected_entries}\n"
            f"sequence_sources={src}\n"
            "\n[runtime_options]\n"
            f"size={len(bitmap) * 8}\n"
            f"num_entries={num_entries}\n"
            f"approximate_false_positive_rate={approx_fpr}\n"
            f"redundant_sequences={redundant_sequences}\n"
            f"redundant_fpr={redundant_fpr}\n"
        )
    return bf_path, txt_path


def read_bf(path_prefix: str) -> tuple[BloomSketch, dict]:
    """Load ``<prefix>.bf`` + ``<prefix>.txt`` → (BloomSketch, info dict)
    (BloomFilterInfo's ctor field set, BloomFilterInfo.cpp:31-53).

    The .bf byte size must equal size/8 from the INI — the reference's
    own file-size invariant (Tests/BloomFilterTests.cpp:67-78).
    """
    cp = configparser.ConfigParser()
    with open(path_prefix + ".txt") as f:
        cp.read_string(f.read())
    u, r = cp["user_input_options"], cp["runtime_options"]
    info = {
        "filter_id": u["filter_id"],
        "kmer_size": int(u["kmer_size"]),
        "desired_fpr": float(u["desired_false_positve_rate"]),
        "num_hashes": int(u["number_of_hash_functions"]),
        "expected_entries": int(u["expected_num_entries"]),
        "sources": u.get("sequence_sources", "").split(),
        "size": int(r["size"]),
        "num_entries": int(r["num_entries"]),
        "approx_fpr": float(r["approximate_false_positive_rate"]),
        "redundant_sequences": int(r["redundant_sequences"]),
        "redundant_fpr": float(r["redundant_fpr"]),
    }
    with open(path_prefix + ".bf", "rb") as f:
        payload = f.read()
    if len(payload) * 8 != info["size"]:
        raise ValueError(
            f".bf size {len(payload) * 8} bits does not match INI size {info['size']}"
        )
    sketch = BloomSketch.deserialize(
        payload, info["size"], info["num_hashes"], copy=True, block_bits=0,
        n_new=info["num_entries"], n_inserted=info["num_entries"] + info["redundant_sequences"],
        n_redundant=info["redundant_sequences"],
    )
    return sketch, info


def registry_row_to_bf(row: dict, out_dir: str) -> tuple[str, str]:
    """Export one filter-registry row (maker.build_filters output) to the
    reference container.  Blocked-layout filters are exportable — the bit
    dump is layout-agnostic — but only classic (block_bits=0) filters are
    probe-compatible with a reference reader; a marker source records it.
    """
    sources = [
        f"biobloom_spark:block_bits={row.get('block_bits', 0)}"
        f",canonical={1 if row.get('canonical') else 0}"
        f",family={row.get('hash_family', 'poly')}"
    ]
    return write_bf(
        os.path.join(out_dir, str(row["filter_id"])),
        bytes(row["bitmap"]),
        filter_id=str(row["filter_id"]),
        kmer_size=int(row["shingle_w"]),
        desired_fpr=float(row["target_fpr"]),
        num_hashes=int(row["num_hashes"]),
        expected_entries=int(row["expected_entries"]),
        num_entries=int(row["num_entries"]),
        approx_fpr=float(row["approx_fpr"]),
        redundant_sequences=int(row["redundant_entries"]),
        redundant_fpr=float(row.get("occupancy_fpr", 0.0)),
        sources=sources,
    )


def bf_to_registry_row(path_prefix: str) -> dict:
    """Import a reference-container filter as a registry-shaped dict ready
    for ``categorize`` (block_bits=0 classic probing)."""
    sketch, info = read_bf(path_prefix)
    sources = info.get("sources", [])
    ours = any(s.startswith("biobloom_spark:") for s in sources)
    # our own exports carry a marker recording the native (poly) family and
    # canonical mode; a container WITHOUT the marker is reference-built →
    # probe with the published ntHash family (sketch.nthash), which is
    # canonical by construction
    canonical = any("canonical=1" in s for s in sources)
    if ours:
        family = "nthash" if any("family=nthash" in s for s in sources) else "poly"
    else:
        family = "nthash"
    return {
        "filter_id": info["filter_id"],
        "m_bits": info["size"],
        "num_hashes": info["num_hashes"],
        "block_bits": 0,
        "shingle_w": info["kmer_size"],
        "canonical": canonical,
        "hash_family": family,
        "bitmap": sketch.serialize(),
        "fpr": max(info["approx_fpr"], 1e-300),
        "target_fpr": info["desired_fpr"],
    }
