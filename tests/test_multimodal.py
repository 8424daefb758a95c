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


def _wav_bytes(rate=8000, channels=2, frames=1000):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"\x00\x00" * channels * frames)
    return buf.getvalue()


def test_decode_audio_real_wav_roundtrip(spark):
    """In-test generated WAV decodes through the REAL path (stdlib
    wave), not the synthetic-header fake."""
    rows = [(1, "audio", _wav_bytes(8000, 2, 1000), {}),
            (2, "audio", _wav_bytes(44100, 1, 441), {})]
    df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in MM.decode_audio(df).collect()}
    assert got[1]["decode_path"] == "real"
    assert (got[1]["sample_rate"], got[1]["n_channels"],
            got[1]["n_samples"]) == (8000, 2, 1000)
    assert got[2]["sample_rate"] == 44100
    assert abs(got[2]["duration_s"] - 0.01) < 1e-6


def test_decode_audio_fake_and_error_paths(spark):
    df = spark.createDataFrame(
        [(7, "audio", MM.make_blob("audio", 16000, 320, "a7"), {}),
         (8, "audio", b"garbage-bytes", {}),
         (9, "audio", MM.make_blob("image", 64, 48, "i9"), {})],
        MM.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in MM.decode_audio(df).collect()}
    assert (got[7]["decode_path"], got[7]["sample_rate"],
            got[7]["n_samples"]) == ("fake", 16000, 320)
    assert got[8]["decode_path"] == "error"
    assert got[9]["decode_path"] == "error"  # image blob is not audio


def _png_bytes(w, h, color=2):
    """A real, valid PNG built with stdlib only (zlib + struct)."""
    import struct
    import zlib

    def chunk(typ, body):
        return (struct.pack(">I", len(body)) + typ + body +
                struct.pack(">I", zlib.crc32(typ + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x80" * (w * 3) for _ in range(h))
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def _jpeg_bytes(w, h):
    """Minimal real JPEG header: SOI + SOF0 carrying the dimensions."""
    import struct

    sof0 = (b"\xff\xc0" + struct.pack(">H", 17) + b"\x08" +
            struct.pack(">HH", h, w) + b"\x03" +
            b"\x01\x11\x00\x02\x11\x01\x03\x11\x01")
    return b"\xff\xd8" + sof0 + b"\xff\xd9"


def test_decode_images_real_png_jpeg(spark):
    """In-test generated PNG/JPEG decode through the REAL branch
    (pure-stdlib IHDR/SOF parse — no PIL in this container), and a
    PNG with a corrupted IHDR CRC is counted as 'error', not trusted
    (VERDICT r4 #6: the real branch must not be dead code)."""
    good_png = _png_bytes(320, 200)
    bad_crc = bytearray(good_png)
    bad_crc[30] ^= 0xFF  # flip one IHDR CRC byte
    rows = [(1, "image", good_png, {}),
            (2, "image", _jpeg_bytes(640, 480), {}),
            (3, "image", bytes(bad_crc), {}),
            (4, "image", MM.make_blob("image", 100, 50, "qm4"), {})]
    df = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in MM.decode_images(df).collect()}
    assert (got[1]["decode_path"], got[1]["width"],
            got[1]["height"]) == ("real", 320, 200)
    assert (got[2]["decode_path"], got[2]["width"],
            got[2]["height"]) == ("real", 640, 480)
    assert got[3]["decode_path"] == "error"
    assert (got[4]["decode_path"], got[4]["width"]) == ("fake", 100)


def test_decode_audio_riff_magic_corrupt_body(spark):
    """Valid RIFF/WAVE magic with a corrupt body raises wave.Error
    inside the real decoder — it must be counted as 'error', not
    crash the Spark task (ADVICE r4: wave.Error subclasses Exception
    directly, so it slipped past the EOFError/OSError/ValueError net)."""
    corrupt = b"RIFF" + b"\x24\x00\x00\x00" + b"WAVE" + b"\x00" * 16
    df = spark.createDataFrame(
        [(10, "audio", corrupt, {})], MM.MEDIA_SCHEMA)
    got = MM.decode_audio(df).collect()
    assert len(got) == 1 and got[0]["decode_path"] == "error"


def _mjpeg_frames(n_frames=5):
    """Minimal JPEG-framed byte strings: SOI+APP0 ... EOI. No codec
    needed to build or split them; payload varies per frame so exact
    byte round-trip is checkable."""
    return [b"\xff\xd8\xff\xe0" + bytes([i]) * 20 + b"\xff\xd9"
            for i in range(n_frames)]


def test_sample_frames_real_mjpeg_roundtrip(spark):
    """In-test generated MJPEG (concatenated JPEG frames) samples the
    REAL frame bytes: each sampled frame equals its source frame
    byte-for-byte (no synthetic substitution)."""
    frames_src = _mjpeg_frames(5)
    df = spark.createDataFrame([(3, "video", b"".join(frames_src), {})],
                               MM.MEDIA_SCHEMA)
    got = MM.sample_frames(df, every_k=2).collect()
    assert [f["frame_index"] for f in got] == [0, 2, 4]
    assert [bytes(f["frame"]) for f in got] == [
        frames_src[0], frames_src[2], frames_src[4]]


def test_sample_frames_qm_fake_unchanged(spark):
    """QM synthetic videos keep the deterministic fake frames (the
    oracle contract for mm_frame_sample)."""
    df = MM.synth_media(spark, 3, kind="video")
    frames = MM.sample_frames(df, every_k=10).collect()
    assert frames and all(len(bytes(f["frame"])) == 75 for f in frames)


def _avi_mjpeg_bytes(frames, with_rec=False):
    """A real, minimal RIFF/AVI-MJPEG container built with stdlib
    struct only: hdrl LIST (avih + strl/strh), movi LIST carrying one
    '00dc' chunk per JPEG frame (optionally nested in a 'rec ' LIST),
    an interleaved '01wb' audio chunk the walker must skip, and an
    idx1 chunk."""
    import struct

    def chunk(fourcc, body):
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(list_type, body):
        return chunk(b"LIST", list_type + body)

    avih = chunk(b"avih", struct.pack("<14I", 33333, 0, 0, 0,
                                      len(frames), 0, 1, 0, 64, 64,
                                      0, 0, 0, 0))
    strh = chunk(b"strh", b"vids" + b"MJPG"
                 + struct.pack("<10I", 0, 0, 0, 1, 30, 0,
                               len(frames), 0, 0, 0))
    hdrl = lst(b"hdrl", avih + lst(b"strl", strh))
    movi_chunks = b""
    for i, f in enumerate(frames):
        dc = chunk(b"00dc", f)
        if with_rec:
            dc = lst(b"rec ", dc)
        movi_chunks += dc
        if i == 0:  # interleaved audio chunk: must be skipped
            movi_chunks += chunk(b"01wb", b"\x00\x01" * 10)
    movi = lst(b"movi", movi_chunks)
    idx1 = chunk(b"idx1", b"\x00" * 16)
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_sample_frames_real_avi_container_roundtrip(spark):
    """In-test generated RIFF/AVI-MJPEG decodes through the REAL
    container branch (pure-stdlib RIFF walk — no PyAV in this
    container): sampled frames equal the source JPEGs byte-for-byte,
    audio/index chunks are skipped, word-alignment padding is honored
    (odd-length frames), and 'rec '-nested frames are found too."""
    frames_src = [b"\xff\xd8\xff\xe0" + bytes([i]) * (20 + (i & 1))
                  + b"\xff\xd9" for i in range(5)]  # odd+even lengths
    for with_rec in (False, True):
        blob = _avi_mjpeg_bytes(frames_src, with_rec=with_rec)
        df = spark.createDataFrame([(7, "video", blob, {})],
                                   MM.MEDIA_SCHEMA)
        got = MM.sample_frames(df, every_k=2).collect()
        assert [f["frame_index"] for f in got] == [0, 2, 4]
        assert [bytes(f["frame"]) for f in got] == [
            frames_src[0], frames_src[2], frames_src[4]]


def test_sample_frames_avi_without_frames_is_skipped(spark):
    """A structurally-valid RIFF/AVI with no video chunks raises inside
    the decoder and the row is skipped (not crashed), like any other
    undecodable blob; a non-MJPEG AVI payload falls through to the
    PyAV guard (absent here) and is skipped too."""
    import struct

    empty = b"RIFF" + struct.pack("<I", 4) + b"AVI "
    non_mjpeg = _avi_mjpeg_bytes([b"\x00\x01\x02\x03"])
    df = spark.createDataFrame(
        [(8, "video", empty, {}), (9, "video", non_mjpeg, {})],
        MM.MEDIA_SCHEMA)
    assert MM.sample_frames(df, every_k=1).collect() == []
