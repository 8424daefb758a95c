"""fsio: sidecar JSON through the Hadoop FileSystem resolver (ADVICE r5:
index metadata must ride the same FS abstraction as the parquet, and a
failed write must never destroy the previous sidecar)."""

import os

import pytest

from quasdb_spark import fsio


def test_write_read_roundtrip_and_overwrite(spark, tmp_path):
    p = str(tmp_path / "meta.json")
    assert not fsio.exists(spark, p)
    fsio.write_text(spark, p, '{"a": 1}')
    assert fsio.exists(spark, p)
    assert fsio.read_text(spark, p) == '{"a": 1}'
    # overwrite replaces atomically (temp name + rename)
    fsio.write_text(spark, p, '{"a": 2, "unicode": "é中"}')
    assert fsio.read_text(spark, p) == '{"a": 2, "unicode": "é中"}'
    # no temp litter left behind
    assert [f for f in os.listdir(tmp_path) if ".tmp-" in f] == []


def test_read_missing_raises(spark, tmp_path):
    with pytest.raises(Exception):
        fsio.read_text(spark, str(tmp_path / "absent.json"))


def test_dedup_index_meta_rides_fsio(spark, tmp_path, sf_dir):
    """build/load/append route their sidecar through fsio (works on any
    Hadoop-FS scheme; local file:// here) and refuse mismatched
    probes."""
    from quasdb_spark.operators.dedup import (build_dedup_index,
                                              load_dedup_index)
    from quasdb_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    path = str(tmp_path / "dedup_index")
    meta = build_dedup_index(docs, path, n_hashes=32, n_bands=8)
    _df, loaded = load_dedup_index(spark, path)
    assert loaded == meta
    core = {k: loaded[k] for k in ("n_hashes", "n_bands", "shingle_n",
                                   "scheme", "base_hash")}
    assert core == {"n_hashes": 32, "n_bands": 8, "shingle_n": 3,
                    "scheme": "md5", "base_hash": "md5"}
    # r15: build records bucket-shape stats for ensure_banded's free
    # health tick, and the in-memory meta carries the load path
    assert loaded["bucket_stats"]["n_entries"] > 0
    assert loaded["path"] == path
