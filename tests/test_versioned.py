"""Versioned parquet tables (sources/versioned.py): snapshot isolation,
time travel, partition-level copy-on-write MERGE."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from brazilian_e_commerce_data_pipeline_analytics_spark.sources.versioned import (
    create_table,
    latest_version,
    merge_version,
    read_version,
)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def _mk(spark, data):
    return spark.createDataFrame([Row(d=d, k=k, v=v) for d, k, v in data])


def test_create_merge_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    base = _mk(spark, [("a", 1, 10), ("a", 2, 20), ("b", 3, 30)])
    assert create_table(base, t, "d") == 1

    # upsert: change (a,1), insert (a,9), leave partition b untouched
    upd = _mk(spark, [("a", 1, 11), ("a", 9, 90)])
    assert merge_version(spark, t, upd, key_cols=["d", "k"]) == 2

    v2 = _rows(read_version(spark, t))
    assert v2 == _rows(
        _mk(spark, [("a", 1, 11), ("a", 2, 20), ("a", 9, 90), ("b", 3, 30)])
    )
    # time travel: version 1 still reads the original snapshot
    assert _rows(read_version(spark, t, version=1)) == _rows(base)
    assert latest_version(t) == 2


def test_merge_is_copy_on_write_per_partition(spark, tmp_path):
    """Untouched partitions must keep referencing the SAME immutable
    data dir across versions — the whole point of copy-on-write."""
    import json

    t = str(tmp_path / "tbl")
    create_table(_mk(spark, [("a", 1, 10), ("b", 2, 20)]), t, "d")
    merge_version(spark, t, _mk(spark, [("a", 1, 11)]), key_cols=["d", "k"])
    m1 = json.load(open(os.path.join(t, "_v1.json")))["parts"]
    m2 = json.load(open(os.path.join(t, "_v2.json")))["parts"]
    assert m1["b"] == m2["b"]  # shared immutable dir
    assert m1["a"] != m2["a"]  # rewritten partition points elsewhere


def test_merge_inserts_new_partition(spark, tmp_path):
    t = str(tmp_path / "tbl")
    create_table(_mk(spark, [("a", 1, 10)]), t, "d")
    merge_version(spark, t, _mk(spark, [("c", 7, 70)]), key_cols=["d", "k"])
    assert _rows(read_version(spark, t)) == _rows(
        _mk(spark, [("a", 1, 10), ("c", 7, 70)])
    )


def test_partition_filter_prunes_dirs(spark, tmp_path):
    t = str(tmp_path / "tbl")
    create_table(_mk(spark, [("a", 1, 10), ("b", 2, 20), ("c", 3, 30)]), t, "d")
    pruned = read_version(spark, t, partition_filter=lambda v: v == "b")
    assert _rows(pruned) == _rows(_mk(spark, [("b", 2, 20)]))
    # pruning happens at planning: only one data dir is in the plan
    assert len(pruned.inputFiles()) == len(
        read_version(spark, t, partition_filter=lambda v: v == "a").inputFiles()
    )


def test_manifest_publish_is_atomic(spark, tmp_path):
    """No partially-visible manifests: every _v*.json on disk parses and
    lists only dirs that exist (rename-published)."""
    import json

    t = str(tmp_path / "tbl")
    create_table(_mk(spark, [("a", 1, 10)]), t, "d")
    for _ in range(3):
        merge_version(spark, t, _mk(spark, [("a", 1, 99)]), key_cols=["d", "k"])
    for name in os.listdir(t):
        if name.startswith("_v"):
            m = json.load(open(os.path.join(t, name)))
            for rel in m["parts"].values():
                assert os.path.isdir(os.path.join(t, rel)), (name, rel)
    assert latest_version(t) == 4


def test_typed_partition_column_round_trips(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [Row(d=1, k=1, v=10), Row(d=2, k=2, v=20)]
    )
    create_table(df, t, "d")
    out = read_version(spark, t)
    assert dict(out.dtypes)["d"] == "bigint"
    assert _rows(out) == _rows(df)
