"""Malformed-CSV ingestion semantics (SURVEY §2.1 S1 robustness).

The reference infers schemas and silently coerces; explicit-schema
ingest must decide what a bad row does. Pins Spark's three contracts:
PERMISSIVE nulls the bad field and captures the raw line in
columnNameOfCorruptRecord, DROPMALFORMED removes the row, FAILFAST
raises — so the bronze layer's behavior under dirty input is a tested
choice, not an accident.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from brazilian_e_commerce_data_pipeline_analytics_spark.sources.readers import read_csv

CSV = "id,qty\n1,10\n2,notanumber\n3,30\n"


@pytest.fixture()
def csv_path(tmp_path):
    p = tmp_path / "dirty.csv"
    p.write_text(CSV, encoding="utf-8")
    return str(p)


def _schema(with_corrupt: bool) -> StructType:
    fields = [
        StructField("id", IntegerType()),
        StructField("qty", IntegerType()),
    ]
    if with_corrupt:
        fields.append(StructField("_corrupt_record", StringType()))
    return StructType(fields)


def test_permissive_captures_corrupt_record(spark, csv_path):
    df = read_csv(
        spark,
        csv_path,
        schema=_schema(True),
        mode="PERMISSIVE",
        columnNameOfCorruptRecord="_corrupt_record",
    ).cache()  # corrupt-record column requires a materialized parse
    rows = {r["id"]: (r["qty"], r["_corrupt_record"]) for r in df.collect()}
    assert rows[1] == (10, None)
    assert rows[3] == (30, None)
    assert rows[2][0] is None and rows[2][1] == "2,notanumber"


def test_dropmalformed_removes_bad_rows(spark, csv_path):
    df = read_csv(spark, csv_path, schema=_schema(False), mode="DROPMALFORMED")
    assert sorted(r["id"] for r in df.collect()) == [1, 3]


def test_failfast_raises(spark, csv_path):
    df = read_csv(spark, csv_path, schema=_schema(False), mode="FAILFAST")
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        df.collect()
