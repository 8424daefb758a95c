"""Multimodal (image/audio/video) column plumbing for training-data
pipelines (charter extension — no reference counterpart).

Media travel as opaque ``binary`` columns plus typed metadata; all
per-item compute is Arrow-batched Python (``mapInPandas``) because
media decode is inherently a Python-library job. The Spark-side
contract — schemas, batch iteration, partition preservation — is real
and tested; the actual codec calls are STUBBED: this container has no
image/audio libraries, so ``decode_*`` uses a real library when
importable and otherwise falls back to a clearly-marked deterministic
fake that parses the synthetic blob header below.

Scale design (100 TB of media):
- mapInPandas streams Arrow record batches — per-executor memory is
  bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``, not by
  partition size;
- decode outputs keep the binary payload OUT of the returned columns
  unless asked (metadata-only passes don't rewrite blobs);
- frame sampling explodes to one row per sampled frame map-side — no
  shuffle; downstream embedding/dedup ops then treat frames as items.

Synthetic blob format (the deterministic fake "codec"):
  bytes[0:2]  magic b'QM'
  bytes[2]    kind: 1=image, 2=audio, 3=video
  bytes[3:7]  width | sample_rate | n_frames   (uint32 BE)
  bytes[7:11] height | n_samples | fps         (uint32 BE)
  bytes[11:]  payload (pseudo-random from md5 chain)
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, MapType, StringType, StructField,
                               StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("data", BinaryType()),
    StructField("meta", MapType(StringType(), StringType())),
])

_KIND_CODE = {"image": 1, "audio": 2, "video": 3}


def _fake_payload(seed: str, n: int) -> bytes:
    out = b""
    cur = seed.encode()
    while len(out) < n:
        cur = hashlib.md5(cur).digest()
        out += cur
    return out[:n]


def make_blob(kind: str, a: int, b: int, seed: str) -> bytes:
    """Deterministic synthetic media blob (see module docstring)."""
    head = b"QM" + bytes([_KIND_CODE[kind]]) + struct.pack(">II", a, b)
    return head + _fake_payload(seed, 64)


def synth_media(spark: SparkSession, n: int, kind: str = "image") -> DataFrame:
    """Deterministic synthetic media table for tests/benches."""
    rows = []
    for i in range(n):
        a = 32 + (i * 7) % 480   # width / rate / frames
        b = 32 + (i * 13) % 360  # height / samples / fps
        rows.append((i, kind, make_blob(kind, a, b, f"{kind}-{i}"),
                     {"source": f"synth://{kind}/{i}"}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_from_ids(df: DataFrame, id_col: str = "doc_id",
                   kind: str = "image") -> DataFrame:
    """Distributed synthetic-media ingestion shim: packs one
    deterministic QM blob per input id via mapInPandas (the same
    Arrow-batched path a real blob ingest would use — synth_media's
    driver loop is the test-only variant). Header dims are arithmetic
    in the id (width = 32 + 7·id mod 480, height = 32 + 13·id mod 360)
    so downstream decodes are oracle-checkable."""
    import pandas as pd

    def pack(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids = [int(i) for i in pdf[id_col]]
            yield pd.DataFrame({
                "media_id": ids,
                "kind": [kind] * len(ids),
                "data": [make_blob(kind, 32 + (i * 7) % 480,
                                   32 + (i * 13) % 360, f"{kind}-{i}")
                         for i in ids],
                "meta": [{"source": f"synth://{kind}/{i}"} for i in ids],
            })

    return df.select(id_col).mapInPandas(pack, MEDIA_SCHEMA)


def _parse_header(data: bytes) -> tuple[int, int, int]:
    if data is None or len(data) < 11 or data[:2] != b"QM":
        raise ValueError("not a QM synthetic blob")
    kind, a, b = data[2], *struct.unpack(">II", data[3:11])
    return kind, a, b


def _decode_image_real(data: bytes) -> dict[str, Any]:
    """Real decode path — requires an image library. STUB: raises
    NotImplementedError when PIL is unavailable (it is in this
    container); callers fall back to the deterministic fake."""
    try:
        import io

        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError("image decode requires PIL") from e
    img = Image.open(io.BytesIO(data))
    return {"width": img.width, "height": img.height, "mode": img.mode}


try:  # PIL's corrupt-image error, when the codec is present
    from PIL import UnidentifiedImageError as _UIE

    _IMAGE_DECODE_ERRORS: tuple[type[BaseException], ...] = (
        _UIE, OSError, ValueError)
except ImportError:  # pragma: no cover - PIL present in this container
    _IMAGE_DECODE_ERRORS = (OSError, ValueError)


DECODED_IMAGE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_bytes", LongType()),
    StructField("decode_path", StringType()),
])


def decode_images(media: DataFrame) -> DataFrame:
    """Image metadata decode over Arrow batches (mapInPandas).

    Tries the real codec per batch, falls back to the synthetic-header
    fake — the plumbing (schema, batching, null safety) is identical
    either way. Metadata-only output: blobs are not re-emitted.
    """
    import pandas as pd

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [],
                   "n_bytes": [], "decode_path": []}
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                blob = bytes(data) if data is not None else b""
                try:
                    d = _decode_image_real(blob)
                    w, h, path = d["width"], d["height"], "real"
                except (NotImplementedError, *_IMAGE_DECODE_ERRORS):
                    # NotImplementedError = codec unavailable; the decode
                    # errors = codec present but blob isn't a real image
                    # (QM synthetic blobs land here by design). Anything
                    # else propagates — a genuinely unexpected failure
                    # must not silently degrade to the fake parser.
                    try:
                        _, w, h = _parse_header(blob)
                        path = "fake"
                    except ValueError:
                        w, h, path = -1, -1, "error"
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_bytes"].append(len(blob))
                out["decode_path"].append(path)
            yield pd.DataFrame(out)

    return media.mapInPandas(fn, DECODED_IMAGE_SCHEMA)


def decode_path_counts(decoded: DataFrame) -> DataFrame:
    """Per-path decode outcome counts (real / fake / error) — the
    operational failure-rate surface: corrupt blobs are counted, not
    silently absorbed."""
    from pyspark.sql import functions as F

    return decoded.groupBy("decode_path").agg(F.count("*").alias("n"))


RESIZED_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("data", BinaryType()),
])


def resize_images(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize plumbing: emits new header + payload (STUB: payload is
    re-derived deterministically; a real impl swaps in the codec call,
    same batch shape)."""
    import pandas as pd

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = {"media_id": [], "width": [], "height": [], "data": []}
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                blob = bytes(data) if data is not None else b""
                rows["media_id"].append(mid)
                rows["width"].append(target_w)
                rows["height"].append(target_h)
                rows["data"].append(
                    make_blob("image", target_w, target_h, f"resized-{mid}"))
            yield pd.DataFrame(rows)

    return media.mapInPandas(fn, RESIZED_SCHEMA)


FRAME_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("frame_index", IntegerType()),
    StructField("frame", BinaryType()),
])


def sample_frames(video: DataFrame, every_k: int = 10) -> DataFrame:
    """Video → one row per sampled frame (every k-th). Map-side explode:
    output partitioning follows input partitioning, no shuffle."""
    import pandas as pd

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = {"media_id": [], "frame_index": [], "frame": []}
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                blob = bytes(data) if data is not None else b""
                try:
                    _, n_frames, _fps = _parse_header(blob)
                except ValueError:
                    continue
                for idx in range(0, n_frames, every_k):
                    rows["media_id"].append(mid)
                    rows["frame_index"].append(idx)
                    rows["frame"].append(
                        make_blob("image", 64, 64, f"frame-{mid}-{idx}"))
            yield pd.DataFrame(rows)

    return video.mapInPandas(fn, FRAME_SCHEMA)


EMBED_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("embedding", ArrayType(FloatType())),
])


def embed_media(media: DataFrame, dim: int = 8) -> DataFrame:
    """Feature extraction plumbing: binary → float vector. STUB: the
    vector is a deterministic md5-derived pseudo-embedding; a real
    model swaps in here (batched inference fits the same iterator).
    Output feeds operators/similarity.py unchanged."""
    import numpy as np
    import pandas as pd

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, vecs = [], []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                blob = bytes(data) if data is not None else b""
                raw = _fake_payload(hashlib.md5(blob).hexdigest(), dim * 4)
                v = (np.frombuffer(raw, dtype=">u4")[:dim].astype("float32")
                     / np.float32(2 ** 32))
                ids.append(mid)
                vecs.append(v.tolist())
            yield pd.DataFrame({"media_id": ids, "embedding": vecs})

    return media.mapInPandas(fn, EMBED_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-JVM metadata pass (no Python): size/kind stats — the shape
    of a 100 TB census query (map-side partial agg only)."""
    return (media.groupBy("kind")
            .agg(F.count(F.lit(1)).alias("n_items"),
                 F.sum(F.length("data")).alias("total_bytes"),
                 F.avg(F.length("data")).alias("avg_bytes")))
