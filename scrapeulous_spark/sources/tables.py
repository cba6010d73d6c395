"""Snapshot-table storage layer (Iceberg-semantics parquet warehouse).

The sandbox's Spark 4.1.2 ships no Iceberg runtime jar and there is no
network to fetch one (verified — SURVEY.md §7.2), so this module
implements the subset of Iceberg semantics the engine needs behind a
small interface, on plain parquet + JSON manifests:

  * atomic snapshot commits (manifest lists the data dirs of a version)
  * append / overwrite (MERGE-by-rewrite) producing a NEW snapshot
  * time-travel-by-snapshot-id reads, resume from latest snapshot
  * per-commit lineage metadata carried on the snapshot record

Swapping in real Iceberg is config-only: every engine call goes through
``Warehouse``/``SnapshotTable``, whose ops map 1:1 onto Iceberg
``append``/``overwritePartitions``/``snapshots``.

On a real cluster the warehouse root is an object-store path; the
manifest write is a single small file PUT, which object stores make
atomic via rename-after-write here.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class SnapshotTable:
    def __init__(self, root: str, name: str, schema: T.StructType):
        self.dir = os.path.join(root, name)
        self.name = name
        self.schema = schema
        self._snap_dir = os.path.join(self.dir, "_snapshots")
        os.makedirs(self._snap_dir, exist_ok=True)
        os.makedirs(os.path.join(self.dir, "data"), exist_ok=True)

    # ---------------------------------------------------------- snapshots

    def snapshots(self) -> list[dict]:
        files = sorted(os.listdir(self._snap_dir))
        return [json.load(open(os.path.join(self._snap_dir, f))) for f in files]

    def current(self) -> dict | None:
        snaps = self.snapshots()
        return snaps[-1] if snaps else None

    def _commit(self, dirs: list[str], lineage: dict | None) -> dict:
        cur = self.current()
        snap = {
            "snapshot_id": (cur["snapshot_id"] + 1) if cur else 1,
            "parent_id": cur["snapshot_id"] if cur else None,
            "ts": time.time(),
            "dirs": dirs,
            "lineage": lineage or {},
        }
        tmp = os.path.join(self._snap_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            json.dump(snap, f)
        os.replace(tmp, os.path.join(self._snap_dir, f"{snap['snapshot_id']:012d}.json"))
        return snap

    # --------------------------------------------------------------- write

    def _write_data(self, df: DataFrame, partition_by: str | None = None) -> str:
        sub = os.path.join(self.dir, "data", uuid.uuid4().hex)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(partition_by)
        writer.parquet(sub)
        return sub

    def append(
        self, df: DataFrame, lineage: dict | None = None, partition_by: str | None = None
    ) -> dict:
        cur = self.current()
        dirs = (cur["dirs"] if cur else []) + [self._write_data(df, partition_by)]
        return self._commit(dirs, lineage)

    def overwrite(
        self, df: DataFrame, lineage: dict | None = None, partition_by: str | None = None
    ) -> dict:
        """MERGE-by-rewrite: the new snapshot references only the new data.
        Old data dirs stay on disk for time travel until vacuum().
        partition_by hive-partitions the data dir (Iceberg partition-spec
        analog) so per-partition reads are directory-pruned scans."""
        return self._commit([self._write_data(df, partition_by)], lineage)

    def merge(
        self,
        spark: SparkSession,
        source: DataFrame,
        key_cols: list[str],
        lineage: dict | None = None,
        partition_by: str | None = None,
    ) -> dict:
        """MERGE INTO (upsert-by-key): rows of `source` replace target
        rows with the same key; unmatched source rows insert — the
        copy-on-write Iceberg MERGE the north rule names for the
        frontier. Implemented as the standard COW plan: target
        LEFT-ANTI source on the key (survivors) unioned with source,
        written as a NEW snapshot — so the merge is itself atomic,
        time-travelable, and rollback-able like every other commit.
        The anti-join is an equi-join on the key (broadcast when the
        delta is small — the common case: one superstep's frontier
        delta vs the accumulated table). At real-Iceberg swap time this
        maps onto MERGE INTO ... WHEN MATCHED THEN UPDATE WHEN NOT
        MATCHED THEN INSERT.

        Iceberg-faithful validation: a source with duplicate keys (the
        MERGE cardinality error) or NULL keys (never equi-matches, so
        every replay would re-insert it — silently breaking replay
        idempotence) is rejected up front. Both probes run on the
        small delta side only."""
        from pyspark.sql import functions as F

        null_pred = None
        for k in key_cols:
            c = F.col(k).isNull()
            null_pred = c if null_pred is None else (null_pred | c)
        if source.filter(null_pred).limit(1).count() > 0:
            raise ValueError(f"{self.name}.merge: NULL in key columns {key_cols}")
        dups = (
            source.groupBy(*key_cols)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if dups:
            raise ValueError(
                f"{self.name}.merge: source has duplicate keys on {key_cols} "
                "(MERGE cardinality violation)"
            )
        target = self.read(spark)
        survivors = target.join(source.select(*key_cols), key_cols, "left_anti")
        merged = survivors.unionByName(source)
        return self._commit([self._write_data(merged, partition_by)], lineage)

    # ---------------------------------------------------------------- read

    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame:
        snaps = self.snapshots()
        if snapshot_id is not None:
            snaps = [s for s in snaps if s["snapshot_id"] == snapshot_id]
            if not snaps:
                raise KeyError(f"{self.name}: no snapshot {snapshot_id}")
        if not snaps or not snaps[-1]["dirs"]:
            return spark.createDataFrame([], self.schema)
        # one scan per data dir, unioned by name: a snapshot may mix
        # hive-partitioned dirs (partition_by writes) with plain ones,
        # and a single multi-path scan rejects that layout mix
        # (CONFLICTING_DIRECTORY_STRUCTURES). Per-dir scans keep
        # column pruning and partition pruning per commit.
        parts = [spark.read.schema(self.schema).parquet(d) for d in snaps[-1]["dirs"]]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def rollback(self, snapshot_id: int) -> None:
        """Drop snapshots newer than snapshot_id (0 == truncate table).
        Used by the resume protocol to discard partial-superstep commits."""
        for f in os.listdir(self._snap_dir):
            if f.endswith(".json") and int(f.split(".")[0]) > snapshot_id:
                os.remove(os.path.join(self._snap_dir, f))

    def vacuum(self) -> None:
        keep = set(self.current()["dirs"]) if self.current() else set()
        data = os.path.join(self.dir, "data")
        for d in os.listdir(data):
            p = os.path.join(data, d)
            if p not in keep:
                shutil.rmtree(p, ignore_errors=True)


class Warehouse:
    """A directory of snapshot tables + a tiny engine-state JSON."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def table(self, name: str, schema: T.StructType) -> SnapshotTable:
        return SnapshotTable(self.root, name, schema)

    # engine-state (superstep counter etc.) for resume
    @property
    def _state_path(self) -> str:
        return os.path.join(self.root, "engine_state.json")

    def load_state(self) -> dict | None:
        if os.path.exists(self._state_path):
            return json.load(open(self._state_path))
        return None

    def save_state(self, state: dict) -> None:
        tmp = self._state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self._state_path)

    def destroy(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)
