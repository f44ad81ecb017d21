"""VersionedTable over a real Iceberg catalog via pyiceberg.

The production deployment of this repo writes every stage output through
Spark's Iceberg runtime (`df.writeTo(...)`, atomic snapshot commit,
`expire_snapshots`); this module proves the storage CONTRACT against a
real Iceberg metadata layer without that jar: a pyiceberg SqlCatalog
(sqlite + local warehouse), Arrow round-trip for data. That makes the
write path driver-sided — fine for contract tests, NOT the production
write path; the contract (atomic versioned commit, fingerprint skip,
snapshot time travel, retention) is what tests/test_storage_contract.py
pins across backends.

pyiceberg doesn't ship in this sandbox, so everything here is behind an
import-try; tests auto-skip when the library is missing (same seam
pattern as functions/embed.py's DARKBO_REAL_EMBED).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

try:  # pragma: no cover - exercised only where pyiceberg is installed
    from pyiceberg.catalog.sql import SqlCatalog

    HAVE_PYICEBERG = True
except ImportError:  # pragma: no cover
    SqlCatalog = None
    HAVE_PYICEBERG = False


def local_catalog(base_dir: str):
    """A file-backed Iceberg catalog rooted at base_dir (sqlite metadata +
    local warehouse) — the minimal real-Iceberg fixture."""
    if not HAVE_PYICEBERG:
        raise ImportError(
            "pyiceberg is not installed; IcebergTable is an optional backend "
            "(pip install pyiceberg[sql-sqlite]). The default SnapshotTable "
            "backend has no such dependency."
        )
    import os

    os.makedirs(base_dir, exist_ok=True)
    return SqlCatalog(
        "local",
        uri=f"sqlite:///{base_dir}/catalog.db",
        warehouse=f"file://{base_dir}/warehouse",
    )


class IcebergTable:
    """storage.interface.VersionedTable over a pyiceberg catalog table.

    Mapping of contract → Iceberg primitives:
      publish   → overwrite commit with the fingerprint in
                  snapshot_properties (and table properties for O(1) skip)
      versions  → the table's snapshot log (seq = commit order)
      read_version → scan(snapshot_id=...) time travel
      expire    → snapshot expiration, keep-last-N
    """

    def __init__(self, catalog, name: str, namespace: str = "darkbo"):
        self.catalog = catalog
        self.name = name
        self._ident = f"{namespace}.{name}"
        try:
            catalog.create_namespace(namespace)
        except Exception:
            pass  # already exists

    # -- helpers ------------------------------------------------------------
    def _table(self):
        from pyiceberg.exceptions import NoSuchTableError

        try:
            return self.catalog.load_table(self._ident)
        except NoSuchTableError:
            return None

    @staticmethod
    def _summary_get(snap, key: str) -> Optional[str]:
        s = snap.summary
        for probe in (
            lambda: s[key],
            lambda: s.additional_properties[key],
            lambda: dict(s)[key],
        ):
            try:
                return probe()
            except Exception:
                continue
        return None

    def _snapshots(self) -> list:
        t = self._table()
        if t is None:
            return []
        return sorted(t.metadata.snapshots, key=lambda s: s.timestamp_ms)

    # -- contract -----------------------------------------------------------
    def publish(
        self,
        df: DataFrame,
        fingerprint: str,
        partition_by: Optional[list[str]] = None,
        extra_meta: Optional[dict] = None,
    ) -> str:
        if self.current_fingerprint() == fingerprint:
            snaps = self._snapshots()
            return str(snaps[-1].snapshot_id)
        arrow = df.toArrow()  # driver-sided: contract-test path only
        props = {"fingerprint": fingerprint}
        for k, v in (extra_meta or {}).items():
            props[str(k)] = str(v)
        t = self._table()
        if t is None:
            t = self.catalog.create_table(self._ident, schema=arrow.schema)
        t.overwrite(arrow, snapshot_properties=props)
        t.refresh()
        return str(t.metadata.current_snapshot_id)

    def read(self, spark: SparkSession) -> DataFrame:
        t = self._table()
        if t is None or t.metadata.current_snapshot_id is None:
            raise FileNotFoundError(f"no current version for table {self.name}")
        return spark.createDataFrame(t.scan().to_arrow().to_pandas())

    def current_fingerprint(self) -> Optional[str]:
        snaps = self._snapshots()
        t = self._table()
        if t is None or not snaps:
            return None
        cur_id = t.metadata.current_snapshot_id
        for snap in snaps:
            if snap.snapshot_id == cur_id:
                return self._summary_get(snap, "fingerprint")
        return None

    def versions(self) -> list[dict]:
        return [
            {
                "version": str(s.snapshot_id),
                "seq": i + 1,
                "fingerprint": self._summary_get(s, "fingerprint"),
            }
            for i, s in enumerate(self._snapshots())
        ]

    def read_version(self, spark: SparkSession, seq: int) -> DataFrame:
        snaps = self._snapshots()
        if not 1 <= seq <= len(snaps):
            raise FileNotFoundError(
                f"no committed version seq={seq} for table {self.name} (expired?)"
            )
        t = self._table()
        scan = t.scan(snapshot_id=snaps[seq - 1].snapshot_id)
        return spark.createDataFrame(scan.to_arrow().to_pandas())

    def data_path(self) -> str:
        t = self._table()
        assert t is not None, f"no current version for {self.name}"
        loc = t.location()
        return loc[len("file://"):] + "/data" if loc.startswith("file://") else loc

    def expire(self, retain_last: int = 3) -> list[str]:
        """Keep-last-N snapshot retention. pyiceberg's maintenance API is
        still maturing across versions; where unavailable this is a
        metadata no-op (data stays, contract read paths unaffected) — in
        the Spark-runtime deployment this is `CALL expire_snapshots`."""
        snaps = self._snapshots()
        doomed = snaps[:-retain_last] if retain_last else snaps
        t = self._table()
        expired: list[str] = []
        for s in doomed:
            try:
                t.expire_snapshots().expire_snapshot_id(s.snapshot_id).commit()
                expired.append(str(s.snapshot_id))
            except Exception:
                break  # maintenance API unavailable in this pyiceberg
        return expired
