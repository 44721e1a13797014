"""Driver-contract integrity: __spark_entry__ surface invariants."""

import inspect

import __spark_entry__ as E


def test_oracle_keys_subset_of_queries():
    q = E.queries()
    o = E.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 35
    # the pipeline queries are intentionally oracle-less (rows-only);
    # everything else must carry a DuckDB twin (media_features gained
    # its oracle in r5)
    oracle_less = set(q) - set(o)
    assert oracle_less == {"pipeline_extract_docs", "pipeline_chunks",
                           "pipeline_edges", "pipeline_layered_search"}


def test_query_callables_signature():
    for name, fn in E.queries().items():
        params = inspect.signature(fn).parameters
        assert len(params) == 2, f"{name} must take (spark, sf_dir)"


def test_oracle_sql_strings_nonempty():
    for name, sql in E.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_entry_schema_stable(spark):
    df = E.entry(spark)
    assert df.columns == [
        "doc_id", "url", "warc_ts", "lang", "detected_lang",
        "token_length", "failure_code", "content_kind", "n_chunks",
        "n_chunk_tokens", "n_entities"]
    assert df.count() > 0


def test_driver_priority_ordering():
    """The correctness driver samples the FIRST 50 registry entries in
    iteration order — the never-/least-recently-sampled queries must
    surface inside that window, and the priority list must be valid."""
    from ocr_processing_pipeline_spark.plans.queries import (
        _DRIVER_PRIORITY, QUERIES)
    assert len(set(_DRIVER_PRIORITY)) == len(_DRIVER_PRIORITY)
    assert set(_DRIVER_PRIORITY) <= set(QUERIES)
    first50 = list(E.queries())[:50]
    # r7 rotation: the r6-unsampled block (VERDICT r6 task 2) must
    # surface inside the 50-entry window
    for name in ("lsh_near_dup_pairs", "dedup_incremental",
                 "media_features", "url_canonicalize",
                 "snapshot_ingest", "embedding_quantize"):
        assert name in first50, f"{name} outside the driver sample window"
    # the whole priority list must actually land in the sampled window
    assert set(_DRIVER_PRIORITY) <= set(first50)
    # ordering must not lose or duplicate anything
    assert sorted(E.queries()) == sorted(QUERIES)
