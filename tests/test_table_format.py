"""sources/table_format — the import-guarded Iceberg/parquet storage
layer (BASELINE.md "Iceberg note"). This container has no Iceberg
runtime, so these tests pin BOTH that the detection correctly reports
its absence AND that every call site behaves fully on the parquet +
manifest fallback (the sanctioned sandbox stand-in). On a deployment
with the jar, the same call sites take the ``format("iceberg")`` /
``writeTo`` branches."""

from __future__ import annotations

import json
import os

import pytest

from lucene_msmarco_spark.sources.table_format import (
    TRANSCRIPT_COLUMNS,
    iceberg_available,
    iceberg_catalogs,
    is_path_ref,
    read_table,
    read_transcripts,
    write_table,
)


def test_iceberg_absent_in_sandbox(spark):
    # the classpath probe must say "no" here — a True would mean the
    # fallback branches below are not what production exercises
    assert iceberg_available(spark) is False
    assert iceberg_catalogs(spark) == []


def test_is_path_ref():
    assert is_path_ref("/tmp/x")
    assert is_path_ref("s3://bucket/key")
    assert is_path_ref("rel/dir")
    assert not is_path_ref("db.table")
    assert not is_path_ref("catalog.db.table")
    assert not is_path_ref("plain_view")


def test_path_roundtrip_and_commit_sidecar(spark, tmp_path):
    ref = str(tmp_path / "tbl")
    df = spark.range(10).selectExpr("id", "id * 2 AS v")
    entry = write_table(df, ref)
    assert entry["commit_id"] == 0
    assert entry["rows"] == 10
    back = read_table(spark, ref)
    assert back.count() == 10
    assert {r["v"] for r in back.collect()} == {2 * i for i in range(10)}
    with open(os.path.join(ref, "_commit.json")) as f:
        side = json.load(f)
    assert side["commit_id"] == 0
    assert side["format"] == "parquet+manifest"


def test_path_append_bumps_commit_id(spark, tmp_path):
    ref = str(tmp_path / "tbl")
    write_table(spark.range(5).selectExpr("id"), ref)
    entry = write_table(
        spark.range(5, 9).selectExpr("id"), ref, mode="append"
    )
    assert entry["commit_id"] == 1
    assert entry["rows"] == 9  # commit records the table total
    assert read_table(spark, ref).count() == 9


def test_identifier_read_falls_back_to_session_catalog(spark):
    spark.range(3).createOrReplaceTempView("tf_fallback_view")
    assert read_table(spark, "tf_fallback_view").count() == 3


def test_identifier_write_refuses_without_runtime(spark):
    with pytest.raises(RuntimeError, match="Iceberg runtime"):
        write_table(spark.range(1), "db.some_table")


def test_read_transcripts_schema_and_pruning(spark, tmp_path):
    from lucene_msmarco_spark.sources.transcripts import (
        generate_transcripts,
    )

    ref = str(tmp_path / "tr")
    tr = generate_transcripts(spark, n_turns=40, seed=7)
    # extra column must be pruned away by the projection
    tr.selectExpr("*", "1 AS extraneous").write.parquet(ref)
    out = read_transcripts(spark, ref)
    assert [f.name for f in out.schema.fields] == list(TRANSCRIPT_COLUMNS)
    types = {f.name: f.dataType.simpleString() for f in out.schema.fields}
    assert types["turn_idx"] == "int"
    assert types["ts"] == "timestamp"
    assert out.count() == 40


def test_read_transcripts_missing_column_raises(spark, tmp_path):
    ref = str(tmp_path / "bad")
    spark.range(3).selectExpr(
        "CAST(id AS STRING) AS conv_id", "CAST(id AS INT) AS turn_idx"
    ).write.parquet(ref)
    with pytest.raises(ValueError, match="lacks columns"):
        read_transcripts(spark, ref)
