"""TSStore — the typed time-series face of the engine (SURVEY.md §7.2
P5; the reference's intended deployment, README.md:1-2: series_id +
timestamp encoded into the ordered key space so a time-range query is a
key-range scan, with newest-version-wins from sequence numbers).

Built directly on KVStore: points are stored under key
``<series_id>:<ts-iso-micros>`` (zero-padded, order-preserving codec);
the observation is stored TYPED (value_schema="v double, tags_json
string" — native Parquet columns, so value predicates push down to the
scan; stores created by older rounds with JSON string values still
open and read through the same surface). All KV semantics carry over
unchanged — snapshots, LWW upsert per (series, ts), tombstone deletes,
compaction. On top, the typed query surface decodes to columns and
reuses operators/timeseries.py for windowing/downsampling/as-of.

The order-preserving codec is the documented answer to the reference's
pluggable Comparator (SURVEY.md §7.4 risk 4): arbitrary Python
comparators can't run inside Catalyst at scale, but any ordering
expressible as a key codec gives identical semantics with zero UDF
cost.
"""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from quasdb_spark.store import KVStore

_TS_FMT = "%Y-%m-%dT%H:%M:%S.%f"


def encode_ts(ts: dt.datetime) -> str:
    """Fixed-width ISO micros — lexicographic order == time order."""
    return ts.strftime(_TS_FMT)


def encode_key(series_id: str, ts: dt.datetime) -> str:
    if ":" in series_id:
        raise ValueError("series_id must not contain ':'")
    return f"{series_id}:{encode_ts(ts)}"


class TSStore:
    """Typed time-series store over a KVStore keyspace."""

    def __init__(self, store: KVStore):
        self.store = store

    VALUE_SCHEMA = "v double, tags_json string"

    @classmethod
    def create(cls, spark: SparkSession, path: str, *,
               typed: bool = True) -> "TSStore":
        """``typed=True`` (default) stores observations as native typed
        columns; ``typed=False`` keeps the legacy JSON-string value."""
        return cls(KVStore.create(
            spark, path, value_schema=cls.VALUE_SCHEMA if typed else None))

    @classmethod
    def open(cls, spark: SparkSession, path: str) -> "TSStore":
        return cls(KVStore.open(spark, path))

    @classmethod
    def open_embedded(cls, path: str) -> "TSStore":
        """Spark-free handle (KVStore.open_embedded): append/
        latest/asof_point/points pages run at embedded cost on the
        driver engine; DataFrame analytics (window/downsample/gapfill)
        raise the embedded RuntimeError until opened with a session."""
        return cls(KVStore.open_embedded(path))

    # ------------------------------------------------------------ writes
    def append(self, points: list[tuple[str, dt.datetime, float, dict | None]]) -> int:
        """Atomically append [(series_id, ts, value, tags), ...] as one
        batch (one seq). Same (series, ts) written again upserts (LWW)."""
        typed = self.store.value_schema is not None
        ops = []
        for series_id, ts, value, tags in points:
            if typed:
                payload = {"v": float(value),
                           "tags_json": json.dumps(tags or {},
                                                   sort_keys=True)}
            else:
                payload = json.dumps({"v": value, "tags": tags or {}},
                                     sort_keys=True)
            ops.append(("put", encode_key(series_id, ts), payload))
        return self.store.write_batch(ops)

    def delete_point(self, series_id: str, ts: dt.datetime) -> int:
        return self.store.delete(encode_key(series_id, ts))

    def ingest_df(self, df: DataFrame, *, series_col: str = "series_id",
                  ts_col: str = "ts", value_col: str = "value") -> int:
        """Bulk ingest a typed DataFrame as one atomic batch. The key
        codec runs as built-in expressions (date_format), fully
        distributed."""
        key = F.concat(F.col(series_col), F.lit(":"),
                       F.date_format(F.col(ts_col),
                                     "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")).alias("key")
        if self.store.value_schema is not None:
            keyed = df.select(
                key, F.col(value_col).cast("double").alias("v"),
                F.lit(None).cast("string").alias("tags_json"))
        else:
            keyed = df.select(
                key,
                F.to_json(F.struct(F.col(value_col).alias("v"))).alias("value"))
        return self.store.ingest(keyed)

    # ------------------------------------------------------------- reads
    def points(self, series_id: str | None = None, *,
               t0: dt.datetime | None = None, t1: dt.datetime | None = None,
               asof: int | None = None) -> DataFrame:
        """Typed range scan: decode the key-range back to
        (series_id, ts, value) columns. The time range becomes a key
        range — a pushed-down Parquet predicate plus manifest file
        pruning, exactly the reference's iterator-over-key-interval
        (kv/include/db.h:29-36)."""
        if series_id is not None:
            lo = encode_key(series_id, t0) if t0 else f"{series_id}:"
            hi = encode_key(series_id, t1) if t1 else f"{series_id};"  # ';' = ':'+1
            st = self.store.state(asof, key_from=lo, key_to=hi)
        else:
            st = self.store.state(asof)
        # split at the FIRST ':' only — the timestamp part itself
        # contains colons
        head = [F.substring_index("key", ":", 1).alias("series_id"),
                F.to_timestamp(F.expr("substring(key, instr(key, ':') + 1)"),
                               "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts")]
        if self.store.value_schema is not None:
            # typed store: native columns, no JSON parse in the plan
            return st.select(*head, F.col("v").alias("value"), "tags_json")
        return st.select(
            *head,
            F.get_json_object("value", "$.v").cast("double").alias("value"),
            F.get_json_object("value", "$.tags").alias("tags_json"))

    def _driver_point(self, series_id: str,
                      t1: dt.datetime | None, asof: int | None):
        """Newest live point of a series (optionally at-or-before t1)
        via the store's driver heap-merge engine: one reverse
        limit-1 page, no Spark job — the TSDB point query at the
        reference's embedded cost. Typed stores only (native columns
        round-trip exactly; the legacy JSON layout keeps the Spark
        path). Returns a ``pyspark.sql.Row`` with the same fields as
        the Spark path — item AND attribute access work identically on
        both engines: series_id, ts, value, tags_json."""
        lo = f"{series_id}:"
        hi = (encode_key(series_id, t1) if t1 is not None
              else f"{series_id};")    # ';' = ':' + 1
        rows = self.store.scan_rows(key_from=lo, key_to=hi, asof=asof,
                                    reverse=True, limit=1)
        if not rows:
            return None
        key, val = rows[0]
        _, _, tspart = key.partition(":")
        ts = dt.datetime.strptime(tspart, "%Y-%m-%dT%H:%M:%S.%f")
        return Row(series_id=series_id, ts=ts,
                   value=val["v"], tags_json=val["tags_json"])

    def _points_fast_ok(self) -> bool:
        return (self.store.value_schema is not None
                and self.store._driver_reads_ok())

    def points_rows(self, series_id: str, *,
                    t0: dt.datetime | None = None,
                    t1: dt.datetime | None = None,
                    asof: int | None = None, reverse: bool = False,
                    limit: int = 1000) -> list:
        """Bounded, driver-local page of one series' points — the
        embedded/serving counterpart of ``points()`` (which returns a
        DataFrame and needs a session). Rides the store's bounded
        scan surface: on driver-engine stores this is a heap-merge
        page with NO Spark job (single-digit ms — the TSDB range read
        at the reference's iterator cost); other stores fall back to
        the Spark scan inside scan_rows, same rows either way. Returns
        [Row(series_id, ts, value, tags_json)] ordered by ts
        (descending when ``reverse``); typed stores only (the same
        schema gate as latest/asof_point). Unbounded analytics belong
        on ``points()``."""
        if self.store.value_schema is None:
            raise ValueError(
                "points_rows needs a typed store (value_schema) — "
                "legacy JSON stores read through points()")
        lo = encode_key(series_id, t0) if t0 else f"{series_id}:"
        hi = encode_key(series_id, t1) if t1 else f"{series_id};"
        rows = self.store.scan_rows(key_from=lo, key_to=hi, asof=asof,
                                    reverse=reverse, limit=limit)
        out = []
        for key, val in rows:
            _, _, tspart = key.partition(":")
            out.append(Row(
                series_id=series_id,
                ts=dt.datetime.strptime(tspart, "%Y-%m-%dT%H:%M:%S.%f"),
                value=val["v"], tags_json=val["tags_json"]))
        return out

    def latest(self, series_id: str, asof: int | None = None):
        """Newest point of a series: reverse scan LIMIT 1 over the
        series' key prefix (SeekToLast analogue, S4). Driver engine
        when available (ms, no Spark job); both engines return the
        same fields, pinned by tests."""
        if self._points_fast_ok():
            return self._driver_point(series_id, None, asof)
        rows = (self.points(series_id, asof=asof)
                .orderBy(F.col("ts").desc()).limit(1).collect())
        return rows[0] if rows else None

    def asof_point(self, series_id: str, ts: dt.datetime,
                   asof: int | None = None):
        """Value at-or-before ``ts`` — the canonical TSDB point query.
        A bounded reverse key-range scan with LIMIT 1: the time bound
        becomes a key upper bound, so manifest/row-group pruning applies
        before the top-1 sort (driver engine when available)."""
        t1 = ts + dt.timedelta(microseconds=1)
        if self._points_fast_ok():
            return self._driver_point(series_id, t1, asof)
        rows = (self.points(series_id, asof=asof, t1=t1)
                .orderBy(F.col("ts").desc()).limit(1).collect())
        return rows[0] if rows else None

    def downsample(self, bucket: str, *, series_id: str | None = None,
                   asof: int | None = None) -> DataFrame:
        """Per-series bucket aggregates over the state view."""
        from quasdb_spark.operators.timeseries import tumbling

        pts = self.points(series_id, asof=asof)
        return tumbling(pts, "ts", bucket, keys=["series_id"], aggs=[
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.avg("value").alias("avg_value")])

    def snapshot(self, name: str | None = None) -> int:
        return self.store.snapshot(name)

    def compact(self) -> dict:
        return self.store.compact()

    def drop_before(self, cutoff: dt.datetime) -> dict:
        """Retention policy: physically purge every point with
        ts < cutoff across all series (the hypertable drop_chunks /
        retention-policy analogue), as a filtered full compaction —
        one distributed rewrite, no per-series tombstone storm. The
        time cut crosses every series' key range, so the scope is the
        whole store; the encoded-ts comparison is a plain string
        predicate on the key's fixed-width timestamp suffix."""
        bound = encode_ts(cutoff)
        # series_id cannot contain ':' and the encoded ts contains
        # exactly two, so the last-3-colon-fields suffix IS the ts
        drop = F.substring_index("key", ":", -3) < F.lit(bound)
        return self.store.compact(drop_where=drop)
