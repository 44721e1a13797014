"""Driver-replica correctness gate: run EVERY oracle-gated registry query
in Spark AND in DuckDB over the same parquet tables at an arbitrary scale
factor, compare row count + schema + order-insensitive values on
name-sorted columns (the driver's comparison, CORRECTNESS_r*.json).

Usage: python tools/oracle_gate.py [--sf-dir /root/testdata/sf0.01]
                                   [--only name1,name2]
Exits nonzero listing any mismatching query.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
from datetime import date, datetime
from decimal import Decimal

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 6)
    if isinstance(v, Decimal):
        return round(float(v), 6)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if hasattr(v, "item"):
        return _norm_cell(v.item())
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _normalize(pdf):
    cols = sorted(pdf.columns)
    rows = [tuple(_norm_cell(v) for v in row)
            for row in pdf[cols].itertuples(index=False, name=None)]
    return cols, sorted(rows, key=lambda r: tuple(
        (x is None, str(type(x)), x) for x in r))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None,
                    help="comma-separated query names (default: all)")
    args = ap.parse_args()

    import duckdb

    from ocr_processing_pipeline_spark.plans.queries import QUERIES
    from ocr_processing_pipeline_spark.session import get_spark

    spark = get_spark("oracle_gate",
                      cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf_dir, f"{t}.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    names = (args.only.split(",") if args.only else
             [n for n, q in QUERIES.items() if q.sql is not None])
    failed = []
    for name in names:
        q = QUERIES[name]
        if q.sql is None:
            continue
        try:
            got = q.fn(spark, args.sf_dir).toPandas()
            exp = con.sql(q.sql).fetchdf()
            g_cols, g_rows = _normalize(got)
            e_cols, e_rows = _normalize(exp)
            ok = (len(got) == len(exp) and g_cols == e_cols
                  and g_rows == e_rows)
        except Exception as ex:  # noqa: BLE001 — report, keep gating
            ok, g_rows, e_rows = False, [f"ERR {ex!r}"], []
        print(f"{'OK  ' if ok else 'FAIL'} {name} "
              f"({len(g_rows)} vs {len(e_rows)} rows)")
        if not ok:
            failed.append(name)
    spark.stop()
    if failed:
        print("FAILED:", ", ".join(failed))
        return 1
    print(f"all {len(names)} oracle queries green at {args.sf_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
