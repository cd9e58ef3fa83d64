"""Manifest-based snapshot store: versioned commits + time travel.

The reference keeps one mutable PostgreSQL state (design_table_schema
.ipynb DDL; loaders INSERT into it in place).  At 100 TB the warehouse
needs what a table format provides instead: immutable data files, an
atomic pointer flip per commit, snapshot-isolated readers, and time
travel.  This module implements that contract directly on parquet —
the same mechanism Delta/Iceberg use, reduced to its core:

- every commit writes NEW immutable parquet directories under
  ``<root>/data/`` (existing files are never modified or deleted);
- a commit is made visible by writing manifest ``_v<N>.json`` listing
  the data directories that constitute version N, via temp-file +
  ``os.rename`` (atomic on POSIX) — readers either see version N fully
  or not at all;
- optimistic concurrency: a committer that finds ``_v<N>.json``
  already present aborts with ``SnapshotConflict`` instead of
  clobbering (the loser retries on top of the winner, exactly the
  Delta protocol's behavior);
- ``read(version=...)`` pins any historical manifest: time travel for
  audits, reproducible training-data snapshots, and diffing (q71's
  snapshot-diff gets real versions to diff).

Scale notes: ``commit_append`` touches only the new files (O(batch)).
``commit_upsert`` rewrites the table through an anti-join here; on a
partitioned 100 TB table the same manifest mechanism applies per
partition so only touched partitions rewrite (catalog.py's
upsert_last_wins already demonstrates partition-pruned rewriting —
composing the two is mechanical).  Readers never list directories:
the manifest IS the file listing, so planning cost is O(files in
snapshot), not O(filesystem).
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


class SnapshotConflict(RuntimeError):
    """Another committer published this version first; retry on top."""


class SnapshotTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(os.path.join(root, "data"), exist_ok=True)

    # -- manifest bookkeeping ------------------------------------------------

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.root, f"_v{version:06d}.json")

    def current_version(self) -> int:
        versions = [
            int(f[2:8])
            for f in os.listdir(self.root)
            if f.startswith("_v") and f.endswith(".json")
        ]
        return max(versions, default=0)

    def _read_manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as fh:
            return json.load(fh)

    def history(self) -> list[dict]:
        return [
            self._read_manifest(v)
            for v in range(1, self.current_version() + 1)
        ]

    def _publish(self, version: int, dirs: list[str], op: str) -> int:
        manifest = {"version": version, "op": op, "dirs": dirs}
        path = self._manifest_path(version)
        if os.path.exists(path):
            raise SnapshotConflict(f"version {version} already committed")
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        try:
            # atomic visibility flip; a concurrent winner makes the
            # rename target exist -> surface as a conflict, data dirs
            # written by the loser are orphans (harmless, GC-able)
            os.rename(tmp, path)
        except OSError as exc:  # pragma: no cover - platform dependent
            raise SnapshotConflict(str(exc)) from exc
        return version

    # -- commits -------------------------------------------------------------

    def _write_data(self, df: DataFrame, version: int, tag: str) -> str:
        d = os.path.join(self.root, "data", f"c{version:06d}-{tag}")
        df.write.mode("error").parquet(d)
        return d

    def commit_append(self, df: DataFrame) -> int:
        """Version N+1 = version N plus the batch (blind append)."""
        v = self.current_version() + 1
        new_dir = self._write_data(df, v, "append")
        prev = self._read_manifest(v - 1)["dirs"] if v > 1 else []
        return self._publish(v, prev + [new_dir], "append")

    def commit_overwrite(self, df: DataFrame) -> int:
        """Version N+1 = exactly the batch; prior files stay for time
        travel (nothing is deleted)."""
        v = self.current_version() + 1
        new_dir = self._write_data(df, v, "overwrite")
        return self._publish(v, [new_dir], "overwrite")

    def commit_upsert(self, df: DataFrame, keys: Sequence[str]) -> int:
        """MERGE: batch rows replace same-key rows, others survive.

        Survivors are computed with one anti-join against the batch's
        keys and rewritten together with the batch as the new snapshot
        — the unpartitioned-table case; a partitioned table rewrites
        only touched partitions (see module docstring).
        """
        v = self.current_version() + 1
        if v == 1:
            return self.commit_overwrite(df)
        current = self.read()
        survivors = current.join(df.select(*keys), list(keys), "left_anti")
        merged = survivors.unionByName(df).localCheckpoint()
        new_dir = self._write_data(merged, v, "upsert")
        return self._publish(v, [new_dir], "upsert")

    # -- reads ---------------------------------------------------------------

    def read(self, version: int | None = None) -> DataFrame:
        """Snapshot-isolated read; ``version`` pins a historical state
        (time travel), default = latest."""
        v = self.current_version() if version is None else version
        if v < 1:
            raise ValueError(f"no snapshots in {self.root}")
        dirs = self._read_manifest(v)["dirs"]
        return self.spark.read.parquet(*dirs)
