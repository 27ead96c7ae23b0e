"""Local stand-in for the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() twin on
DuckDB at sf0.01, compare row count, schema width, and order-insensitive
values (columns sorted by name, rows sorted, floats rounded)."""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
                if math.isnan(v):
                    v = "NaN"
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def main() -> int:
    from biobloom_spark.session import get_spark

    spark = get_spark("oracle_check", cores=8, shuffle_partitions=16)
    con = duckdb.connect()
    for name in ("region", "nation", "customer", "supplier", "part", "orders",
                 "lineitem", "events", "documents", "embeddings"):
        p = os.path.join(SF_DIR, f"{name}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    if len(sys.argv) > 1:  # optional: check only the named queries
        qs = {k: v for k, v in qs.items() if k in sys.argv[1:]}
    failures = 0
    for name, fn in qs.items():
        sdf = fn(spark, SF_DIR)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"{name:32s} ROWS-ONLY rows={len(srows)}")
            continue
        ores = con.execute(oracles[name])
        ocols = [d[0] for d in ores.description]
        orows = ores.fetchall()
        ok_cols = sorted(scols) == sorted(ocols)
        a, b = norm(srows, scols), norm(orows, ocols)
        ok = ok_cols and a == b
        status = "OK" if ok else "MISMATCH"
        print(f"{name:32s} {status} rows={len(srows)}/{len(orows)} cols={scols if not ok_cols else 'match'}")
        if not ok:
            failures += 1
            for i, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    print("   first diff:", x, "vs", y)
                    break
            if len(a) != len(b):
                print("   row count differs")
    spark.stop()
    return failures


if __name__ == "__main__":
    raise SystemExit(main())
