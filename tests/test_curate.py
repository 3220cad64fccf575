"""Deterministic curation ops: stable hash sampling + stratified mixing."""

import duckdb
import pytest

from logstash_filter_elastic_integration_spark.operators.curate import (
    stable_sample, stratified_mix)

SF = "/root/testdata/sf0.01"


def test_stable_sample_deterministic_and_near_rate(spark):
    doc = spark.read.parquet(f"{SF}/documents.parquet")
    n = doc.count()
    a = {r.doc_id for r in stable_sample(doc, "doc_id", 0.3).select("doc_id").collect()}
    b = {r.doc_id for r in stable_sample(doc, "doc_id", 0.3).select("doc_id").collect()}
    assert a == b                       # rerun-identical
    assert abs(len(a) / n - 0.3) < 0.1  # near the target rate
    # nested property: a 20% sample is a subset of the 30% sample
    c = {r.doc_id for r in stable_sample(doc, "doc_id", 0.2).select("doc_id").collect()}
    assert c <= a
    # salt decorrelates
    d = {r.doc_id for r in stable_sample(doc, "doc_id", 0.3, salt="x").select("doc_id").collect()}
    assert d != a


def test_stable_sample_matches_duckdb_oracle(spark):
    """The kept set is bit-reproducible in SQL (md5-bucket portability)."""
    doc = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted(r.doc_id for r in
                 stable_sample(doc, "doc_id", 0.25).select("doc_id").collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    from logstash_filter_elastic_integration_spark.queries import _o_md5_long
    h = _o_md5_long("CAST(doc_id AS VARCHAR)")
    want = sorted(r[0] for r in con.execute(
        f"SELECT doc_id FROM documents WHERE ({h}) % 10000 < 2500").fetchall())
    assert got == want


def test_stratified_mix_rates_and_passthrough(spark):
    doc = spark.read.parquet(f"{SF}/documents.parquet")
    per = {r.source: r.n for r in
           doc.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    src = sorted(per)[0]
    mixed = stratified_mix(doc, "source", {src: 0.5}, key="doc_id")
    out = {r.source: r.n for r in
           mixed.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    # targeted stratum roughly halved, others untouched
    assert abs(out[src] / per[src] - 0.5) < 0.2
    for s in per:
        if s != src:
            assert out[s] == per[s]


def test_rate_validation():
    import pyspark.sql  # noqa: F401
    with pytest.raises(ValueError):
        stable_sample(None, "k", 1.5)
    with pytest.raises(ValueError):
        stratified_mix(None, "s", {"a": -0.1}, key="k")
