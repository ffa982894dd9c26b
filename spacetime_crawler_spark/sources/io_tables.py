"""Pluggable state-table IO with atomic per-round commits (SURVEY.md §4.4).

Two backends behind one interface:

- **ParquetManifestIO** (default; the only one runnable in this sandbox —
  no Iceberg jars exist offline): each round's snapshot of each state table
  is written to ``<root>/<table>/round=N/`` and made visible by writing a
  ``_COMMITTED.json`` manifest LAST (row count + schema).  A reader resolves
  the latest round whose manifest exists, so a crash mid-write is invisible:
  resume re-runs from the last committed round (the Spark analogue of the
  reference frontier's save-file sync — crawler/frontier.py::add_url's
  ``save.sync()``, UNVERIFIED, SURVEY §2 F10).

- **IcebergIO** (real cluster): same interface over an Iceberg catalog —
  ``writeTo(...).createOrReplace()`` per round gives snapshot isolation and
  time travel natively.  Activate with
  ``spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13
  --conf spark.sql.catalog.cr=org.apache.iceberg.spark.SparkCatalog ...``;
  untestable offline, kept thin and documented.

All tables are written partitioned/bucketable by their join key so the next
round's anti-join reads co-partitioned data.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

COMMIT_MARKER = "_COMMITTED.json"


@dataclass
class ParquetManifestIO:
    root: str

    def _round_dir(self, table: str, rnd: int) -> str:
        return os.path.join(self.root, table, f"round={rnd}")

    def write(self, table: str, rnd: int, df: DataFrame) -> int:
        """Write a full snapshot for (table, round); NOT yet visible."""
        path = self._round_dir(table, rnd)
        df.write.mode("overwrite").parquet(path)
        return rnd

    def commit(self, rnd: int, tables: dict[str, int]) -> None:
        """Publish all tables written for this round atomically-enough:
        manifests are written only after every table's data files exist, and
        readers require the manifest.  tables maps name -> row_count."""
        for table, n_rows in tables.items():
            manifest = {
                "table": table,
                "round": rnd,
                "rows": n_rows,
                "committed_at": time.time(),
            }
            path = os.path.join(self._round_dir(table, rnd), COMMIT_MARKER)
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(manifest, f)
            os.replace(tmp, path)  # atomic rename = the commit point

    def last_committed_round(self, table: str) -> int | None:
        base = os.path.join(self.root, table)
        if not os.path.isdir(base):
            return None
        rounds = []
        for entry in os.listdir(base):
            if entry.startswith("round="):
                rnd = int(entry.split("=", 1)[1])
                if os.path.exists(os.path.join(base, entry, COMMIT_MARKER)):
                    rounds.append(rnd)
        return max(rounds) if rounds else None

    def read(self, spark: SparkSession, table: str, rnd: int) -> DataFrame:
        path = self._round_dir(table, rnd)
        if not os.path.exists(os.path.join(path, COMMIT_MARKER)):
            raise FileNotFoundError(f"round {rnd} of {table} was never committed")
        return spark.read.parquet(path)

    def read_uncommitted(self, spark: SparkSession, table: str, rnd: int) -> DataFrame:
        """Read data written this round BEFORE its commit (writer-side only:
        cheaper than recomputing lineage for counts)."""
        return spark.read.parquet(self._round_dir(table, rnd))

    def manifest(self, table: str, rnd: int) -> dict:
        with open(os.path.join(self._round_dir(table, rnd), COMMIT_MARKER)) as f:
            return json.load(f)


class IcebergIO:
    """Iceberg backend sketch (requires iceberg-spark-runtime on the
    classpath — unavailable in this sandbox; see module docstring).  Same
    interface: round snapshots become Iceberg snapshots on one table, and
    resume = read the table (latest committed snapshot) filtered by the max
    committed round column."""

    def __init__(self, catalog: str, namespace: str):
        self.prefix = f"{catalog}.{namespace}"

    def write(self, table: str, rnd: int, df: DataFrame) -> int:
        df.writeTo(f"{self.prefix}.{table}_r{rnd}").createOrReplace()
        return rnd

    def commit(self, rnd: int, tables: dict[str, int]) -> None:
        # Iceberg's snapshot commit IS the atomic publish; nothing extra.
        pass

    def last_committed_round(self, table: str) -> int | None:
        raise NotImplementedError("requires a live Iceberg catalog")

    def read(self, spark: SparkSession, table: str, rnd: int) -> DataFrame:
        return spark.table(f"{self.prefix}.{table}_r{rnd}")
