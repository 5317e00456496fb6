"""Versioned parquet tables: snapshot isolation, time travel, and
partition-level copy-on-write MERGE — Delta/Iceberg's core storage
semantics re-expressed on plain parquet + JSON manifests (the jars are
not installable here; the reference's whole storage layer is an
updatable store, ``ingestion.py:15-22``).

Layout::

    table_dir/
      data/<partition>/<commit-uuid>/   parquet files (immutable once
                                        referenced by any manifest)
      _v1.json, _v2.json, ...           manifests: partition -> data dir

A manifest lists, for every partition, the ONE data directory holding
that partition's current rows, plus the partition column's name and
type. Committing a new version writes new data dirs for the partitions
it touches and re-points only those entries — untouched partitions keep
referencing the same immutable dirs (copy-on-write at partition
granularity, exactly Delta's file-level model coarsened to partitions).
The manifest is published with a temp-file + atomic rename, so readers
see either the old or the new version, never a half-written one
(snapshot isolation); old manifests are never deleted, so any
historical version stays readable (time travel).

Driver-side work is METADATA-sized only: the list of touched partition
values (the same thing Delta's commit protocol materializes) — row data
never passes through the driver. Reads plan one parquet scan per
referenced dir, unioned; a filter on the partition column prunes whole
dirs before Spark ever lists their files (`read_version(...,
partition_filter=...)`).
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Callable
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, f"_v{version}.json")


def latest_version(table_dir: str) -> int:
    versions = [
        int(name[2:-5])
        for name in os.listdir(table_dir)
        if name.startswith("_v") and name.endswith(".json")
    ]
    if not versions:
        raise FileNotFoundError(f"no manifest in {table_dir}")
    return max(versions)


def _read_manifest(table_dir: str, version: int) -> dict:
    with open(_manifest_path(table_dir, version), encoding="utf-8") as fh:
        return json.load(fh)


def _publish_manifest(table_dir: str, manifest: dict) -> None:
    """Atomic publish: readers see the manifest only when complete."""
    tmp = os.path.join(
        table_dir, f".tmp_v{manifest['version']}_{uuid.uuid4().hex}.json"
    )
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(manifest, fh, sort_keys=True)
    os.rename(tmp, _manifest_path(table_dir, manifest["version"]))


def _write_partitions(
    df: DataFrame, table_dir: str, partition_col: str, part_values: list[str]
) -> dict[str, str]:
    """Write one immutable data dir per partition value; returns the
    partition -> relative-dir mapping. One distributed write per commit
    (partitionBy splits the files); dirs are keyed by a fresh commit id
    so they can never collide with a dir an old manifest references."""
    commit_id = uuid.uuid4().hex[:12]
    staging = os.path.join(table_dir, "data", f"_staging_{commit_id}")
    df.write.mode("overwrite").partitionBy(partition_col).parquet(staging)
    wanted = {str(v) for v in part_values}
    parts: dict[str, str] = {}
    for entry in os.listdir(staging):
        if not entry.startswith(f"{partition_col}="):
            continue
        value = entry.split("=", 1)[1]
        if value not in wanted:
            continue
        rel = os.path.join("data", value, commit_id)
        os.makedirs(os.path.dirname(os.path.join(table_dir, rel)), exist_ok=True)
        os.rename(os.path.join(staging, entry), os.path.join(table_dir, rel))
        parts[value] = rel
    return parts


def create_table(df: DataFrame, table_dir: str, partition_col: str) -> int:
    """Version 1: materialize ``df`` as the initial snapshot."""
    os.makedirs(table_dir, exist_ok=True)
    values = [
        str(r[0])
        for r in df.select(partition_col).distinct().collect()  # metadata-sized
    ]
    parts = _write_partitions(df, table_dir, partition_col, values)
    _publish_manifest(
        table_dir,
        {
            "version": 1,
            "partition_col": partition_col,
            "partition_type": df.schema[partition_col].dataType.simpleString(),
            "parts": parts,
        },
    )
    return 1


def read_version(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    partition_filter: Callable[[str], bool] | None = None,
) -> DataFrame:
    """Snapshot read of ``version`` (default: latest). PartitionBy'd
    files don't store the partition column, so each scan re-attaches it
    as a typed literal from the manifest key — which is also what makes
    ``partition_filter`` true partition PRUNING: filtered-out dirs are
    never even listed."""
    v = latest_version(table_dir) if version is None else version
    m = _read_manifest(table_dir, v)
    pcol, ptype = m["partition_col"], m["partition_type"]
    items = sorted(m["parts"].items())
    if partition_filter is not None:
        items = [(val, rel) for val, rel in items if partition_filter(val)]
    scans = [
        spark.read.parquet(os.path.join(table_dir, rel)).withColumn(
            pcol, F.lit(val).cast(ptype)
        )
        for val, rel in items
    ]
    if not scans:
        raise ValueError(f"no partitions selected from {table_dir} v{v}")
    return reduce(DataFrame.unionByName, scans)


def merge_version(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    key_cols: list[str],
) -> int:
    """Copy-on-write MERGE (upsert): rows in ``updates`` replace
    current rows with equal keys; new keys insert. Only partitions
    present in ``updates`` are rewritten — every other partition entry
    is carried into the new manifest unchanged (same immutable dir).

    The distributed plan is q114's shape: current rows of the touched
    partitions, anti-joined on the keys, unioned with the updates. The
    only driver work is the touched-partition VALUE list (metadata) and
    the manifest swap."""
    current_version = latest_version(table_dir)
    m = _read_manifest(table_dir, current_version)
    pcol, ptype = m["partition_col"], m["partition_type"]
    parts = dict(m["parts"])
    touched = [str(r[0]) for r in updates.select(pcol).distinct().collect()]
    touched_existing = [v for v in touched if v in parts]
    if touched_existing:
        current = reduce(
            DataFrame.unionByName,
            [
                spark.read.parquet(os.path.join(table_dir, parts[v])).withColumn(
                    pcol, F.lit(v).cast(ptype)
                )
                for v in touched_existing
            ],
        )
        survivors = current.join(
            F.broadcast(updates.select(*key_cols).distinct()), key_cols, "left_anti"
        )
        merged = survivors.unionByName(updates.select(*survivors.columns))
    else:
        merged = updates
    parts.update(_write_partitions(merged, table_dir, pcol, touched))
    _publish_manifest(
        table_dir,
        {
            "version": current_version + 1,
            "partition_col": pcol,
            "partition_type": ptype,
            "parts": parts,
        },
    )
    return current_version + 1


def vacuum(table_dir: str, keep_last: int = 1) -> int:
    """Retention: drop manifests older than the newest ``keep_last``
    versions and delete every data dir no surviving manifest references.
    Returns the number of data dirs removed. The deletion set is
    computed from manifests only (metadata), then applied bottom-up —
    a reader of a SURVIVING version can never lose a file, because
    surviving manifests' dirs are excluded by construction."""
    import shutil

    latest = latest_version(table_dir)
    cutoff = latest - keep_last + 1
    keep_manifests = range(max(1, cutoff), latest + 1)
    referenced = set()
    for v in keep_manifests:
        referenced.update(_read_manifest(table_dir, v)["parts"].values())
    removed = 0
    data_root = os.path.join(table_dir, "data")
    for part in os.listdir(data_root):
        pdir = os.path.join(data_root, part)
        if not os.path.isdir(pdir) or part.startswith("_staging_"):
            if part.startswith("_staging_"):
                shutil.rmtree(pdir, ignore_errors=True)
            continue
        for commit in os.listdir(pdir):
            rel = os.path.join("data", part, commit)
            if rel not in referenced:
                shutil.rmtree(os.path.join(table_dir, rel), ignore_errors=True)
                removed += 1
    for v in range(1, max(1, cutoff)):
        path = _manifest_path(table_dir, v)
        if os.path.exists(path):
            os.remove(path)
    return removed


def restore_version(table_dir: str, to_version: int) -> int:
    """RESTORE: re-publish version ``to_version``'s snapshot as a NEW
    latest version (Delta's ``RESTORE TABLE ... TO VERSION AS OF k``,
    coarsened to this layout). Pure metadata: the new manifest re-points
    at the historical version's immutable data dirs — zero data copied,
    zero rows through the driver — and because the restore is itself a
    NEW commit, history keeps both the bad versions and the rollback (a
    later audit sees everything; a second restore can undo the first).
    The restored dirs become referenced-by-latest, so a subsequent
    ``vacuum(keep_last=1)`` RETAINS them while dropping the bad
    versions' dirs — restore-then-vacuum is the storage-level rollback
    a bad merge needs.

    ``to_version`` is validated up front (ADVICE r11): a vacuumed or
    never-existing version raises ``ValueError`` listing the versions
    that are still restorable, instead of a raw ``FileNotFoundError``
    from the manifest open; restoring to the CURRENT latest is a no-op
    (returns the latest version unchanged) rather than publishing a
    redundant commit."""
    current = latest_version(table_dir)
    if to_version == current:
        return current
    if not os.path.exists(_manifest_path(table_dir, to_version)):
        available = sorted(
            int(name[2:-5])
            for name in os.listdir(table_dir)
            if name.startswith("_v") and name.endswith(".json")
        )
        raise ValueError(
            f"cannot RESTORE {table_dir} to version {to_version}: manifest "
            f"missing (vacuumed or never written); restorable versions: "
            f"{available}"
        )
    src = _read_manifest(table_dir, to_version)
    new_v = current + 1
    _publish_manifest(
        table_dir,
        {
            "version": new_v,
            "partition_col": src["partition_col"],
            "partition_type": src["partition_type"],
            "parts": dict(src["parts"]),
            "restored_from": to_version,
        },
    )
    return new_v


def compact_partition(
    spark: SparkSession, table_dir: str, partition_value: str, target_files: int = 1
) -> int:
    """OPTIMIZE: rewrite one partition's (possibly many small) files
    into ``target_files`` files — the execution step of the q120
    compaction plan. Values are untouched; only the file layout and the
    manifest entry change, as a new version (old versions still read
    the uncompacted dirs until vacuumed)."""
    current = latest_version(table_dir)
    m = _read_manifest(table_dir, current)
    parts = dict(m["parts"])
    rel = parts[str(partition_value)]
    df = (
        spark.read.parquet(os.path.join(table_dir, rel))
        .repartition(target_files)
        .withColumn(m["partition_col"], F.lit(partition_value).cast(m["partition_type"]))
    )
    parts.update(
        _write_partitions(df, table_dir, m["partition_col"], [str(partition_value)])
    )
    _publish_manifest(
        table_dir,
        {
            "version": current + 1,
            "partition_col": m["partition_col"],
            "partition_type": m["partition_type"],
            "parts": parts,
        },
    )
    return current + 1


def apply_cdc(
    spark: SparkSession,
    table_dir: str,
    changes: DataFrame,
    key_cols: list[str],
    op_col: str = "op",
) -> int:
    """CDC MERGE: apply an insert/update/delete change batch.

    ``changes`` carries the table's columns plus ``op_col`` in
    {'I','U','D'}. 'D' rows remove their keys; 'I'/'U' rows upsert (the
    distinction is audit metadata — MERGE treats both as "make the row
    look like this"). Rows must carry the partition value of the key
    they target (keys that move partitions are a delete + an insert,
    as in every partitioned lakehouse).

    Copy-on-write at partition grain like :func:`merge_version`; the
    new wrinkle is shrinkage — a touched partition whose rows are ALL
    deleted produces no data dir, and its manifest entry is dropped so
    the partition ceases to exist (rather than pointing at stale data).
    """
    current_version = latest_version(table_dir)
    m = _read_manifest(table_dir, current_version)
    pcol, ptype = m["partition_col"], m["partition_type"]
    parts = dict(m["parts"])
    touched = [str(r[0]) for r in changes.select(pcol).distinct().collect()]
    touched_existing = [v for v in touched if v in parts]
    upserts = changes.filter(F.col(op_col) != "D").drop(op_col)
    if touched_existing:
        current = reduce(
            DataFrame.unionByName,
            [
                spark.read.parquet(os.path.join(table_dir, parts[v])).withColumn(
                    pcol, F.lit(v).cast(ptype)
                )
                for v in touched_existing
            ],
        )
        survivors = current.join(
            F.broadcast(changes.select(*key_cols).distinct()), key_cols, "left_anti"
        )
        merged = survivors.unionByName(upserts.select(*survivors.columns))
    else:
        merged = upserts
    written = _write_partitions(merged, table_dir, pcol, touched)
    parts.update(written)
    for v in touched:
        if v not in written:
            parts.pop(v, None)  # every row deleted: the partition is gone
    _publish_manifest(
        table_dir,
        {
            "version": current_version + 1,
            "partition_col": pcol,
            "partition_type": ptype,
            "parts": parts,
        },
    )
    return current_version + 1
