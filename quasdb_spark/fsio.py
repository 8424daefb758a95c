"""Small text-file IO through Spark's Hadoop FileSystem API.

Index artifacts (dedup index, IVF lists) write their parquet through
Spark, which resolves any scheme the cluster knows (file://, hdfs://,
s3a://, gs://...). Their sidecar metadata must go through the SAME
resolver — a local ``open()`` silently breaks the moment the path is
an object store. These helpers route tiny JSON sidecars through
``org.apache.hadoop.fs.FileSystem`` with write-to-temp-then-rename, so
a reader never observes a half-written file and a failed job never
destroys the previous sidecar.

On stores without atomic rename (S3) the rename is copy+delete, which
is still last-writer-wins correct for a single maintenance writer —
the same contract the manifest's ConditionalPutStore documents
(manifest.py:110-135) for multi-writer commits.
"""

from __future__ import annotations

import uuid


def _fs(spark, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return jvm, fs, hpath


def write_text(spark, path: str, content: str) -> None:
    """Write ``content`` to ``path`` (any Hadoop-FS scheme) atomically:
    create under a temp name in the same directory, then rename over
    the destination. The destination is replaced only after the full
    payload is durable."""
    jvm, fs, hpath = _fs(spark, path)
    tmp = jvm.org.apache.hadoop.fs.Path(
        f"{path}.tmp-{uuid.uuid4().hex[:12]}")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(content.encode("utf-8")))
    finally:
        out.close()
    if fs.exists(hpath):
        fs.delete(hpath, False)
    if not fs.rename(tmp, hpath):
        fs.delete(tmp, False)
        raise IOError(f"rename {tmp} -> {path} failed")


def read_text(spark, path: str) -> str:
    """Read a whole small text file from any Hadoop-FS scheme."""
    jvm, fs, hpath = _fs(spark, path)
    stream = fs.open(hpath)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8")
    finally:
        stream.close()


def exists(spark, path: str) -> bool:
    _, fs, hpath = _fs(spark, path)
    return bool(fs.exists(hpath))
