"""Build the deployable ``dist/biobloom_spark.zip`` artifact.

The north rule's deployment mode is ``spark-submit --py-files
biobloom_spark.zip job.py`` on a multi-executor cluster.  This tool
produces that artifact deterministically (stable member order, zeroed
timestamps, so the zip is byte-reproducible for a given tree — the same
property the registry layout-version guard relies on for cache keys).

Usage:  python tools/make_dist.py [--out dist/biobloom_spark.zip]
"""

from __future__ import annotations

import argparse
import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build_zip(out_path: str) -> str:
    pkg_dir = os.path.join(REPO, "biobloom_spark")
    os.makedirs(os.path.dirname(os.path.abspath(out_path)) or ".", exist_ok=True)
    members = []
    for root, _dirs, files in os.walk(pkg_dir):
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(root, f)
                rel = os.path.join("biobloom_spark", os.path.relpath(full, pkg_dir))
                members.append((rel, full))
    members.sort()
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_STORED) as zf:
        for rel, full in members:
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(rel, date_time=(1980, 1, 1, 0, 0, 0))
            zf.writestr(info, data)
    return out_path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, "dist", "biobloom_spark.zip"))
    args = ap.parse_args()
    path = build_zip(args.out)
    print(path)


if __name__ == "__main__":
    main()
