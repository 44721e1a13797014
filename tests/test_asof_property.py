"""Property test: asof_join_backward ≡ DuckDB ASOF JOIN on random data."""

import datetime

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_processing_pipeline_spark.operators.asof import asof_join_backward

_T0 = datetime.datetime(2024, 1, 1)

events = st.lists(
    st.tuples(st.integers(0, 3),                 # key
              st.integers(0, 10_000),            # ts offset seconds
              st.integers(0, 100)),              # value
    min_size=1, max_size=25)


@settings(max_examples=25, deadline=None)
@given(left=events, right=events)
def test_asof_matches_duckdb(spark, left, right):
    lpdf = pd.DataFrame(
        [{"k": k, "ts": _T0 + datetime.timedelta(seconds=s), "lid": i}
         for i, (k, s, _) in enumerate(left)])
    rpdf = pd.DataFrame(
        [{"k": k, "ts": _T0 + datetime.timedelta(seconds=s),
          "v": float(v)} for (k, s, v) in right])
    # duckdb ASOF requires unique (k, ts) on the right for determinism
    rpdf = rpdf.sort_values(["k", "ts", "v"]).drop_duplicates(
        ["k", "ts"], keep="last")

    ldf = spark.createDataFrame(lpdf, "k int, ts timestamp, lid int")
    rdf = spark.createDataFrame(rpdf, "k int, ts timestamp, v double")
    got = (asof_join_backward(ldf, rdf, on="k", left_ts="ts",
                              right_ts="ts", value_cols=["v"])
           .toPandas())
    got_map = {int(r.lid): (None if pd.isna(r.v) else float(r.v))
               for r in got.itertuples()}

    con = duckdb.connect()
    con.register("l", lpdf)
    con.register("r", rpdf)
    exp = con.sql("""
        SELECT l.lid, r.v FROM l
        ASOF LEFT JOIN r ON l.k = r.k AND l.ts >= r.ts
    """).fetchdf()
    exp_map = {int(r.lid): (None if pd.isna(r.v) else float(r.v))
               for r in exp.itertuples()}
    assert got_map == exp_map
