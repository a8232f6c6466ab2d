"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and the matching ``oracle_sql()``
on DuckDB over the same sf dir, then compares row count, column names, and
order-insensitive values. Usage:

    python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def norm_cell(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def frame_fingerprint(pdf):
    cols = sorted(pdf.columns)
    rows = [
        "|".join(norm_cell(row[c]) for c in cols)
        for row in pdf.to_dict("records")
    ]
    rows.sort()
    import hashlib

    h = hashlib.md5("\n".join(rows).encode()).hexdigest()
    return len(rows), cols, h, rows


def main():
    import os

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from ed_twitter_spark.session import get_spark

    spark = get_spark("oracle_check", cores=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    from ed_twitter_spark.caching import release_caches

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        finally:
            release_caches()
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"SKIP {name}: rows-only ({len(sdf)} rows, {t_spark:.1f}s)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        sn, scols, shash, srows = frame_fingerprint(sdf)
        on, ocols, ohash, orows = frame_fingerprint(odf)
        status = "OK" if (sn, scols, shash) == (on, ocols, ohash) else "MISMATCH"
        if status == "MISMATCH":
            failures.append(name)
        print(f"{status} {name}: spark {sn} rows / oracle {on} rows ({t_spark:.1f}s)")
        if status == "MISMATCH":
            if scols != ocols:
                print(f"  cols spark={scols} oracle={ocols}")
            else:
                sset, oset = set(srows), set(orows)
                for r in list(sset - oset)[:3]:
                    print(f"  spark-only: {r}")
                for r in list(oset - sset)[:3]:
                    print(f"  oracle-only: {r}")
    print("FAILURES:", failures if failures else "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
