"""JSONL source/sink: roundtrip fidelity, quarantine semantics, pruning."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from asid_v2_data_pipeline_spark.schemas import load_table
from asid_v2_data_pipeline_spark.sources.jsonl import (
    corrupt_records,
    read_jsonl,
    valid_records,
    write_jsonl,
)

DOC_SCHEMA = (
    StructType()
    .add("doc_id", "long")
    .add("text", "string")
    .add("lang", "string")
    .add("source", "string")
    .add("n_chars", "long")
)


def test_jsonl_roundtrip_documents(spark, tmp_path):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out, compression=None)
    back = valid_records(read_jsonl(spark, out, DOC_SCHEMA))
    orig = {tuple(r) for r in docs.select(*DOC_SCHEMA.fieldNames()).collect()}
    got = {tuple(r) for r in back.select(*DOC_SCHEMA.fieldNames()).collect()}
    assert got == orig


def test_jsonl_quarantine_keeps_bad_lines(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "also ok", "lang": "de", "source": "s", "n_chars": 7}\n'
        '{"doc_id": 3, "text": "trailing garbage"\n'
    )
    df = read_jsonl(spark, str(p), DOC_SCHEMA)
    good = valid_records(df)
    bad = corrupt_records(df)
    assert sorted(r.doc_id for r in good.collect()) == [1, 2]
    bad_lines = [r["_corrupt_record"] for r in bad.collect()]
    assert "this is not json at all" in bad_lines
    assert len(bad_lines) == 2


def test_jsonl_failfast_raises(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"doc_id": 1}\nnot json\n')
    import pytest
    from py4j.protocol import Py4JJavaError

    df = read_jsonl(spark, str(p), DOC_SCHEMA, mode="FAILFAST")
    with pytest.raises(Exception) as exc:
        df.collect()
    assert "Malformed" in str(exc.value) or "FAILFAST" in str(exc.value)


def test_jsonl_partitioned_write_prunes(spark, tmp_path):
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = str(tmp_path / "by_lang")
    write_jsonl(docs, out, compression=None, partition_by=["lang"])
    # hive layout on disk
    assert any(d.startswith("lang=") for d in os.listdir(out))
    schema_no_lang = StructType(
        [f for f in DOC_SCHEMA.fields if f.name != "lang"]
    )
    back = read_jsonl(spark, out, schema_no_lang.add("lang", "string"))
    en = valid_records(back).filter(F.col("lang") == "en")
    plan = en._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(lang" in plan  # pruned at source
    n_en = (
        docs.filter(F.col("lang") == "en").count()
    )
    assert en.count() == n_en
