"""Storage seam: Iceberg when available, plain parquet directories otherwise.

The engine's design target is Iceberg (snapshots = the reference's
base+change file sets, manifests = the per-cell header index
/root/reference/src/readpbf.rs:222-243, time travel = the timestamp filter
F7).  This sandbox has no Iceberg jars, so the seam degrades to
parquet-directory tables with a tiny JSON snapshot log that preserves the
semantics the engine relies on: named tables, append/overwrite snapshots,
and read-as-of-snapshot.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass


def _iceberg_available(spark) -> bool:
    try:
        spark.conf.get("spark.sql.catalog.spark_catalog")
        return True
    except Exception:
        return False


@dataclass
class Catalog:
    """Parquet-directory catalog with a snapshot log per table."""

    root: str

    def _dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _log(self, name: str) -> str:
        return os.path.join(self._dir(name), "_snapshots.json")

    def snapshots(self, name: str) -> list[dict]:
        try:
            with open(self._log(name)) as f:
                return json.load(f)
        except FileNotFoundError:
            return []

    def write(self, df, name: str, mode: str = "overwrite",
              partition_by: list[str] | None = None) -> dict:
        # snapshot ids are monotonic even across overwrites so a lazy plan
        # reading the current snapshot stays valid while the next one is
        # written (read-modify-write never clobbers the files it reads)
        prev = self.snapshots(name)
        snap_id = (max((s["id"] for s in prev), default=-1)) + 1
        snaps = prev if mode == "append" else []
        path = os.path.join(self._dir(name), f"snap={snap_id}")
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(path)
        snaps.append({"id": snap_id, "ts": time.time(), "path": path,
                      "mode": mode})
        os.makedirs(self._dir(name), exist_ok=True)
        with open(self._log(name), "w") as f:
            json.dump(snaps, f)
        return snaps[-1]

    def read(self, spark, name: str, as_of: int | None = None,
             timestamp: float | None = None):
        """Read the union of snapshots <= as_of/timestamp (the reference's
        'change files <= tstamp' selection, src/readpbf.rs:585-590)."""
        snaps = self.snapshots(name)
        if not snaps:
            raise FileNotFoundError(f"table {name} has no snapshots")
        if as_of is not None:
            snaps = [s for s in snaps if s["id"] <= as_of]
        if timestamp is not None:
            snaps = [s for s in snaps if s["ts"] <= timestamp]
        paths = [s["path"] for s in snaps]
        return spark.read.parquet(*paths)

    def exists(self, name: str) -> bool:
        return bool(self.snapshots(name))
