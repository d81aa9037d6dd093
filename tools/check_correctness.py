"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB at sf0.01, compare
row count, column names, and the order-insensitive multiset of values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402
from geomesa_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for t in df.itertuples(index=False, name=None):
        rows.append(tuple(None if pd.isna(v) and not isinstance(v, (list, tuple)) else v for v in t))
    return sorted(rows, key=repr)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("correctness", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(sdf)} rows, {time.time() - t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failed.append(name)
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        else:
            for c in sdf.columns:
                ks, ko = sdf[c].dtype.kind, odf[c].dtype.kind
                # int vs int ok (width differs), float vs float ok; flag
                # category crossings (int vs float/object etc.)
                if {ks, ko} <= {"i", "u"} or ks == ko:
                    continue
                problems.append(f"dtype {c}: spark={sdf[c].dtype} oracle={odf[c].dtype}")
        if not problems:
            a, b = canon(sdf), canon(odf)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                only_a = [r for r in a if r not in set(b)][:3]
                problems.append(f"values differ; first diffs {diff or only_a}")
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failed.append(name)
        else:
            print(f"ok   {name}: {len(sdf)} rows match ({time.time() - t0:.1f}s)")
    print(f"\n{len(qs) - len(failed)}/{len(qs)} ok")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
