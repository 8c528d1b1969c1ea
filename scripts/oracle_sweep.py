#!/usr/bin/env python
"""Local replica of the driver's correctness sweep: run every registered
query and compare exact sorted rows against its DuckDB oracle SQL.

Usage: python scripts/oracle_sweep.py [sf_dir] [--queries a,b,c]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _norm(v):
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return v


def main() -> None:
    import duckdb

    import __spark_entry__ as m
    from nemo_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.01"
    qmap = m.queries()
    omap = m.oracle_sql()
    names = list(qmap)
    if "--queries" in sys.argv:
        names = sys.argv[sys.argv.index("--queries") + 1].split(",")

    spark = get_spark(app_name="oracle_sweep")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failed = []
    for name in names:
        try:
            got = sorted(tuple(_norm(v) for v in r) for r in qmap[name](spark, sf_dir).collect())
            sql = omap.get(name)
            if sql is None:
                print(f"{name}: NO ORACLE ({len(got)} rows)")
                continue
            want = sorted(tuple(_norm(v) for v in r) for r in con.sql(sql).fetchall())
            if got == want:
                print(f"{name}: OK ({len(got)} rows)")
            else:
                failed.append(name)
                print(f"{name}: MISMATCH spark={len(got)} oracle={len(want)}")
                only_g = [r for r in got if r not in want][:3]
                only_w = [r for r in want if r not in got][:3]
                print(f"  spark-only: {only_g}")
                print(f"  oracle-only: {only_w}")
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            print(f"{name}: ERROR {type(e).__name__}: {str(e)[:300]}")
    spark.stop()
    print(f"\n{len(names) - len(failed)}/{len(names)} OK; failed: {failed}")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
