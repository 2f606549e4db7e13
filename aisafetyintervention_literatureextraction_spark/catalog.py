"""Warehouse table catalog — Iceberg-shaped semantics on local parquet.

The production deployment target is an Iceberg catalog
(``df.writeTo("kg.nodes").append()`` / ``MERGE INTO``); this sandbox
has no Iceberg runtime jar, so the same semantics are provided here
over versioned parquet snapshot directories:

    <warehouse>/<table>/v=<n>/part-*.parquet
    <warehouse>/<table>/_latest          (text file: the live version)

Writers always write a NEW snapshot directory and then flip the
``_latest`` pointer — readers of the previous snapshot are never
disturbed (Iceberg's snapshot isolation, which also makes
read-modify-write ``merge_upsert`` safe, unlike in-place parquet
overwrite which Spark forbids on a path being read).

``merge_upsert`` reproduces the reference's Cypher ``MERGE ... SET``
last-writer-wins upsert (reference db.py:41-53) as one set-oriented
operation instead of O(rows) round-trips.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class Catalog:
    spark: SparkSession
    warehouse: str

    # -- snapshot plumbing -------------------------------------------------
    def _table_dir(self, name: str) -> str:
        return os.path.join(self.warehouse, name)

    def _latest_file(self, name: str) -> str:
        return os.path.join(self._table_dir(name), "_latest")

    def current_version(self, name: str) -> int | None:
        p = self._latest_file(name)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return int(f.read().strip())

    def _snapshot_path(self, name: str, version: int) -> str:
        return os.path.join(self._table_dir(name), f"v={version}")

    def exists(self, name: str) -> bool:
        return self.current_version(name) is not None

    # -- reads -------------------------------------------------------------
    def read(self, name: str, version: int | None = None) -> DataFrame:
        v = self.current_version(name) if version is None else version
        if v is None:
            raise FileNotFoundError(f"table {name} does not exist in {self.warehouse}")
        return self.spark.read.parquet(self._snapshot_path(name, v))

    def read_or_empty(self, name: str, schema) -> DataFrame:
        if self.exists(name):
            return self.read(name)
        return self.spark.createDataFrame([], schema)

    # -- writes ------------------------------------------------------------
    def _commit(self, df: DataFrame, name: str) -> int:
        """Write df as a new snapshot and flip the pointer atomically."""
        os.makedirs(self._table_dir(name), exist_ok=True)
        prev = self.current_version(name)
        new_v = 0 if prev is None else prev + 1
        path = self._snapshot_path(name, new_v)
        df.write.mode("overwrite").parquet(path)
        tmp = self._latest_file(name) + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(new_v))
        os.replace(tmp, self._latest_file(name))  # atomic pointer flip
        self._write_manifest(name, new_v)
        return new_v

    def _write_manifest(self, name: str, version: int) -> None:
        manifest = {
            "table": name,
            "version": version,
            "committed_at": time.time(),
        }
        with open(os.path.join(self._snapshot_path(name, version), "_manifest.json"), "w") as f:
            json.dump(manifest, f)

    def overwrite(self, df: DataFrame, name: str) -> int:
        return self._commit(df, name)

    def append(self, df: DataFrame, name: str) -> int:
        if self.exists(name):
            df = self.read(name).unionByName(df, allowMissingColumns=True)
        return self._commit(df, name)

    def merge_upsert(
        self,
        updates: DataFrame,
        name: str,
        keys: list[str],
        order_col: str | None = None,
    ) -> int:
        """``MERGE INTO <name> USING updates ON keys WHEN MATCHED THEN
        UPDATE WHEN NOT MATCHED THEN INSERT`` — last-writer-wins per key
        (reference db.py:41-53 MERGE+SET semantics).

        ``order_col``: column ranking writer recency; updates beat the
        existing rows, and among duplicate update rows the max
        ``order_col`` wins deterministically (reference behavior is
        "whatever arrived last in the loop"; ours must be order-free).
        """
        if not self.exists(name):
            base = updates.limit(0)
        else:
            base = self.read(name)
        base = base.withColumn("__gen", F.lit(0))
        ups = updates.withColumn("__gen", F.lit(1))
        order_expr = (
            F.struct(F.col("__gen"), F.col(order_col))
            if order_col
            else F.struct(F.col("__gen"))
        )
        cols = [c for c in ups.columns if c != "__gen"]
        merged = (
            base.unionByName(ups, allowMissingColumns=True)
            .groupBy(*keys)
            .agg(
                F.max_by(
                    F.struct(*[F.col(c) for c in cols if c not in keys]), order_expr
                ).alias("__row")
            )
            .select(*keys, "__row.*")
        )
        return self._commit(merged, name)

    def drop(self, name: str) -> None:
        d = self._table_dir(name)
        if os.path.exists(d):
            shutil.rmtree(d)
