"""Multimodal plumbing tests: schemas, Arrow batch shapes, decode
fallback, frame explode, embedding hand-off to similarity search."""

from quasdb_spark.operators import multimodal as MM
from quasdb_spark.operators.similarity import cosine_topk


def test_decode_images_fake_path(spark):
    media = MM.synth_media(spark, 20, "image")
    out = MM.decode_images(media)
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 20
    # deterministic synthetic dims: a = 32 + (i*7)%480
    assert rows[0]["width"] == 32 and rows[0]["height"] == 32
    assert rows[1]["width"] == 39 and rows[1]["height"] == 45
    assert all(r["n_bytes"] == 75 for r in rows.values())
    # decode_path records which codec ran (real PIL may be installed)
    assert set(r["decode_path"] for r in rows.values()) <= {"real", "fake"}


def test_decode_images_corrupt_blob(spark):
    import pyspark.sql.functions as F

    media = MM.synth_media(spark, 3, "image").withColumn(
        "data", F.when(F.col("media_id") == 1, F.lit(b"garbage"))
                 .otherwise(F.col("data")))
    decoded = MM.decode_images(media)
    rows = {r["media_id"]: r for r in decoded.collect()}
    assert rows[1]["decode_path"] == "error" and rows[1]["width"] == -1
    assert rows[0]["decode_path"] in ("real", "fake")
    # failure-rate surface: corrupt blobs are counted, not absorbed
    counts = {r["decode_path"]: r["n"]
              for r in MM.decode_path_counts(decoded).collect()}
    assert counts["error"] == 1 and sum(counts.values()) == 3


def test_resize_images(spark):
    media = MM.synth_media(spark, 5, "image")
    out = MM.resize_images(media, 128, 96).collect()
    assert len(out) == 5
    assert all(r["width"] == 128 and r["height"] == 96 for r in out)
    # payload is a valid blob with the new header
    assert all(bytes(r["data"])[:2] == b"QM" for r in out)


def test_sample_frames_explode(spark):
    video = MM.synth_media(spark, 4, "video")
    out = MM.sample_frames(video, every_k=50).collect()
    # frames per video = ceil(n_frames/50), n_frames = 32 + (i*7)%480
    import math

    expect = sum(math.ceil((32 + (i * 7) % 480) / 50) for i in range(4))
    assert len(out) == expect
    assert all(r["frame_index"] % 50 == 0 for r in out)


def test_embed_media_feeds_similarity(spark):
    media = MM.synth_media(spark, 30, "image")
    emb = MM.embed_media(media, dim=8)
    first = emb.orderBy("media_id").first()
    assert len(first["embedding"]) == 8
    assert all(0.0 <= x <= 1.0 for x in first["embedding"])
    # determinism: same input -> same embedding
    again = MM.embed_media(media, dim=8).orderBy("media_id").first()
    assert first["embedding"] == again["embedding"]
    # hand-off to the similarity operator
    queries = emb.where("media_id < 2")
    topk = cosine_topk(emb, queries, 3, id_col="media_id")
    got = topk.collect()
    assert len(got) == 6
    assert all(r["rank"] <= 3 for r in got)


def test_media_stats_jvm_only(spark):
    media = MM.synth_media(spark, 10, "audio")
    row = MM.media_stats(media).collect()[0]
    assert row["kind"] == "audio" and row["n_items"] == 10
    assert row["total_bytes"] == 750


def test_media_from_ids_matches_synth(spark):
    """The distributed packer produces byte-identical blobs to the
    driver-side synth_media generator for the same ids."""
    from quasdb_spark.operators.multimodal import media_from_ids, synth_media

    ids = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    packed = {r["media_id"]: bytes(r["data"])
              for r in media_from_ids(ids).collect()}
    synth = {r["media_id"]: bytes(r["data"])
             for r in synth_media(spark, 20).collect()}
    assert packed == synth
