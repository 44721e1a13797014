"""Local replica of the driver's correctness gate: every oracle-gated query
runs in Spark AND in DuckDB over the same parquet tables (sf0.001); results
must match (row count + order-insensitive values on name-sorted columns)."""

import math
import os
from datetime import date, datetime
from decimal import Decimal

import duckdb
import pytest

from ocr_processing_pipeline_spark.plans.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

ORACLE_QUERIES = sorted(n for n, q in QUERIES.items() if q.sql is not None)


def _duck(sql):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.sql(sql).fetchdf()


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
    if hasattr(v, "item"):          # numpy scalars
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


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, name):
    q = QUERIES[name]
    got = q.fn(spark, SF_DIR).toPandas()
    exp = _duck(q.sql)

    assert len(got) == len(exp), (
        f"{name}: row count {len(got)} vs oracle {len(exp)}")
    g_cols, g_rows = _normalize(got)
    e_cols, e_rows = _normalize(exp)
    assert g_cols == e_cols, f"{name}: columns {g_cols} vs {e_cols}"
    if g_rows != e_rows:
        diffs = [(a, b) for a, b in zip(g_rows, e_rows) if a != b][:3]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")
