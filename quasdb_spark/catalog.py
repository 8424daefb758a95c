"""Catalog — manage multiple named stores under one root directory.

The reference is a single embedded DB per directory (DB::Open,
kv/include/db.h:47-55); real deployments run many. The catalog is the
SparkSession-scoped registry SURVEY.md §1.1 calls for: create/open/
list/drop stores (KV or time-series) by name.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from quasdb_spark.store import KVStore
from quasdb_spark.tsstore import TSStore


class Catalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = os.path.abspath(root)
        os.makedirs(self.root, exist_ok=True)

    def _path(self, name: str) -> str:
        if not name or "/" in name or name.startswith("."):
            raise ValueError(f"invalid store name: {name!r}")
        return os.path.join(self.root, name)

    def create(self, name: str) -> KVStore:
        return KVStore.create(self.spark, self._path(name))

    def open(self, name: str) -> KVStore:
        return KVStore.open(self.spark, self._path(name))

    def open_or_create(self, name: str) -> KVStore:
        return KVStore.open_or_create(self.spark, self._path(name))

    def create_ts(self, name: str) -> TSStore:
        return TSStore.create(self.spark, self._path(name))

    def open_ts(self, name: str) -> TSStore:
        return TSStore.open(self.spark, self._path(name))

    def list(self) -> list[str]:
        """Names of valid stores (directories with a manifest) under
        the root."""
        out = []
        for name in sorted(os.listdir(self.root)):
            if os.path.exists(os.path.join(self.root, name,
                                           "_manifest", "CURRENT")):
                out.append(name)
        return out

    def drop(self, name: str) -> None:
        """DestroyDB for a named store."""
        self.open(name).destroy()

    def properties(self) -> dict[str, dict]:
        return {n: self.open(n).properties() for n in self.list()}
