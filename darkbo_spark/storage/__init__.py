"""Storage backends behind one contract (storage/interface.VersionedTable).

`make_table` is the construction seam the pipeline uses: the default
SnapshotTable backend is dependency-free; DARKBO_STORAGE_BACKEND=iceberg
swaps in the pyiceberg-backed implementation (loud ImportError if the
library is missing — same seam discipline as DARKBO_REAL_EMBED).
"""

from __future__ import annotations

import os

from darkbo_spark.storage.interface import VersionedTable  # noqa: F401
from darkbo_spark.storage.snapshots import BuildLock, SnapshotTable  # noqa: F401


def make_table(base_dir: str, name: str) -> "VersionedTable":
    backend = os.environ.get("DARKBO_STORAGE_BACKEND", "snapshot")
    if backend == "iceberg":
        from darkbo_spark.storage.iceberg import IcebergTable, local_catalog

        return IcebergTable(local_catalog(base_dir), name)
    if backend != "snapshot":
        raise ValueError(f"unknown DARKBO_STORAGE_BACKEND: {backend!r}")
    return SnapshotTable(base_dir, name)
