"""Banded sign-LSH near-dup: plan shape (no cross join) and recall
against the brute-force oracle on planted near-duplicates.

The brute-force ``neardup_pairs_cosine`` stays in the tree as the exact
recall oracle only — the suite's scale path is ``neardup_pairs_banded``.
"""

import math
import random

import pyspark.sql.functions as F
import pytest

from quasdb_spark.operators.similarity import (cosine_topk, ivf_topk,
                                               kmeans_centroids,
                                               neardup_pairs_banded,
                                               neardup_pairs_cosine)
from quasdb_spark.sources.tables import load_table


def test_banded_plan_has_no_cross_join(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    plan = neardup_pairs_banded(e, threshold=0.4)._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_banded_subset_of_brute_force(spark, sf_dir):
    """Every banded pair is a true pair (precision = 1.0): blocking only
    prunes candidates, never invents them."""
    e = load_table(spark, sf_dir, "embeddings")
    banded = {(r.id_a, r.id_b, r.score)
              for r in neardup_pairs_banded(e, threshold=0.4).collect()}
    brute = {(r.id_a, r.id_b, r.score)
             for r in neardup_pairs_cosine(e, threshold=0.4).collect()}
    assert banded <= brute
    assert banded  # finds something at this threshold on the testdata


def test_banded_recall_on_planted_neardups(spark):
    """Plant genuine near-duplicates (cos >= ~0.95) in a random corpus:
    banded LSH at 8x8 must recover nearly all of them. This is the
    regime near-dup detection is for; recall at weak thresholds
    (cos ~ 0.4, the random-similarity regime) is the LSH curve and is
    intentionally partial."""
    rng = random.Random(42)
    dims = 64
    rows = []
    for i in range(200):
        v = [rng.gauss(0, 1) for _ in range(dims)]
        rows.append((i, v))
    # 40 planted near-dups: base + small noise
    for j in range(40):
        base = rows[j][1]
        noise = [rng.gauss(0, 0.08) for _ in range(dims)]
        nrm = math.sqrt(sum(x * x for x in base))
        rows.append((1000 + j, [b + n * nrm / 8 for b, n in zip(base, noise)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    brute = {(r.id_a, r.id_b)
             for r in neardup_pairs_cosine(df, threshold=0.9).collect()}
    banded = {(r.id_a, r.id_b)
              for r in neardup_pairs_banded(df, threshold=0.9).collect()}
    assert banded <= brute
    assert len(brute) >= 30  # the plant worked
    recall = len(banded) / len(brute)
    assert recall >= 0.85, f"recall {recall:.2f} below banded-LSH expectation"


def test_kmeans_centroids_deterministic_and_trained(spark, sf_dir):
    """Two runs produce identical centroids (seeded init + rounded
    updates); the trained quantizer is a valid (c_label, centroid)
    table with the requested cluster count."""
    e = load_table(spark, sf_dir, "embeddings")
    c1 = {r["c_label"]: r["centroid"]
          for r in kmeans_centroids(e, 8, n_iter=2).collect()}
    c2 = {r["c_label"]: r["centroid"]
          for r in kmeans_centroids(e, 8, n_iter=2).collect()}
    assert c1 == c2
    assert 1 <= len(c1) <= 8
    assert all(len(v) == 64 for v in c1.values())
    # the bounded-sample numpy path (covering the whole corpus here)
    # must be bit-identical to the distributed path: same seed draw,
    # same dim-sequential fold arithmetic, same HALF_UP rounding
    c3 = {r["c_label"]: r["centroid"]
          for r in kmeans_centroids(e, 8, n_iter=2,
                                    sample_cap=100000).collect()}
    assert c3 == c1


def test_kmeans_ivf_recall_vs_brute_force(spark, sf_dir):
    """recall@10 against the exact brute-force top-10: the trained
    quantizer must beat the per-label stand-in it replaced (measured:
    0.46 vs 0.32 at nprobe=2 on the near-uniform testdata, where IVF
    recall is inherently modest — neighbors scatter across lists)."""
    e = load_table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") % 100 == 0)
    truth = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk(e, queries, 10).collect()}
    label = {(r["query_id"], r["neighbor_id"])
             for r in ivf_topk(e, queries, 10, nprobe=2).collect()}
    cents = kmeans_centroids(e, 10, n_iter=2)
    km = {(r["query_id"], r["neighbor_id"])
          for r in ivf_topk(e, queries, 10, nprobe=2, centroids=cents).collect()}
    r_label = len(label & truth) / len(truth)
    r_km = len(km & truth) / len(truth)
    assert r_km >= r_label, f"trained {r_km:.2f} < stand-in {r_label:.2f}"
    assert r_km >= 0.4, f"recall@10 {r_km:.2f} below IVF expectation"


def test_kmeans_ivf_on_clustered_data(spark):
    """On genuinely clustered data the trained quantizer recovers the
    cluster structure: nprobe=1 recall ~1.0 (measured 1.0)."""
    rng = random.Random(7)
    dims = 32
    centers = [[rng.gauss(0, 1) for _ in range(dims)] for _ in range(8)]
    rows = [(i, [x + rng.gauss(0, 0.15) for x in centers[i % 8]])
            for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.where(F.col("vec_id") % 40 == 0)
    truth = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk(df, q, 10).collect()}
    cents = kmeans_centroids(df, 8, n_iter=3)
    km = {(r["query_id"], r["neighbor_id"])
          for r in ivf_topk(df, q, 10, nprobe=1, centroids=cents).collect()}
    recall = len(km & truth) / len(truth)
    assert recall >= 0.9, f"clustered recall {recall:.2f}"


def test_ivf_materialized_lists_match_inline_assignment(spark, sf_dir,
                                                        tmp_path):
    """Probing materialized inverted lists (the FAISS add() artifact,
    parquet partitioned by list_label) returns EXACTLY the inline-
    assignment result — vectors/norms round-trip parquet bit-exactly —
    and the lists build runs once: a second get_or_build_lists call
    for the same key reuses the artifact."""
    import os

    from quasdb_spark.operators import quantizer as QZ

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") % 100 == 0)
    cents = kmeans_centroids(e, 10, n_iter=2)
    inline = sorted(map(tuple, ivf_topk(
        e, q, 10, nprobe=2, centroids=cents).collect()))
    lists = QZ.get_or_build_lists(e, cents, fingerprint="t-lists",
                                  n_clusters=10, root=str(tmp_path))
    probed = sorted(map(tuple, ivf_topk(
        e, q, 10, nprobe=2, centroids=cents, lists=lists).collect()))
    assert probed == inline
    path = QZ.lists_path(QZ._key("t-lists", 10, 2, None, 6),
                         str(tmp_path))
    mtime = os.path.getmtime(os.path.join(path, "_SUCCESS"))
    QZ.get_or_build_lists(e, cents, fingerprint="t-lists",
                          n_clusters=10, root=str(tmp_path))
    assert os.path.getmtime(os.path.join(path, "_SUCCESS")) == mtime
    # partition layout: one dir per inverted list
    parts = [d for d in os.listdir(path) if d.startswith("list_label=")]
    assert len(parts) == 10
    # lists=... without the matching centroids is a contract violation
    with pytest.raises(ValueError):
        ivf_topk(e, q, 10, lists=lists)


def test_int8_quantization_roundtrip_error_bound(spark):
    from quasdb_spark.operators.similarity import (dequantize_error,
                                                   quantize_int8)

    rows = [(1, [0.5, -1.27, 0.003, 0.0]),
            (2, [127.0, -127.0, 1.0, -1.0]),
            (3, [0.0, 0.0, 0.0, 0.0])]  # all-zero: scale undefined
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = {r["vec_id"]: r for r in quantize_int8(df).collect()}
    # codes bounded, extreme dims hit exactly +/-127
    assert q[2]["codes"] == [127, -127, 1, -1]
    assert all(-127 <= c <= 127 for c in q[1]["codes"])
    assert q[3]["codes"] is None and q[3]["scale"] is None
    # worst-case per-dim error is scale/2; mae must respect it
    e = {r["vec_id"]: r for r in dequantize_error(df).collect()}
    for vid in (1, 2):
        assert e[vid]["mae"] <= q[vid]["scale"] / 2 + 1e-12
    assert e[2]["mae"] == 0.0  # exact grid: zero reconstruction error


def test_hyperplane_bucket_dims_mismatch_raises(spark):
    """Wrong ``dims`` must RAISE, not silently zip-pad every projection
    to the all-'0' bucket (which a bucket-size cap then drops -> empty
    result with no error)."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PySparkException

    from quasdb_spark.operators.similarity import hyperplane_bucket

    df = spark.createDataFrame(
        [(1, [0.5] * 64)], "vec_id long, embedding array<double>")
    ok = df.select(hyperplane_bucket("embedding", 4, dims=64).alias("b"))
    assert ok.first()["b"] == ok.first()["b"]  # matching dims still works
    bad = df.select(hyperplane_bucket("embedding", 4, dims=32).alias("b"))
    with pytest.raises((PySparkException, Py4JJavaError)):
        bad.collect()


def test_hyperplane_bucket_null_vector_gets_null_bucket(spark):
    """A NULL embedding hashes to a NULL bucket (excluded by the
    downstream equi-join on bucket) instead of tripping the dims
    assert and killing the whole job — size(NULL) is NULL, which
    would otherwise feed NULL into assert_true (ADVICE r4)."""
    from quasdb_spark.operators.similarity import hyperplane_bucket

    df = spark.createDataFrame(
        [(1, [0.5] * 64), (2, None)],
        "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r["b"] for r in df.select(
        "vec_id",
        hyperplane_bucket("embedding", 4, dims=64).alias("b")).collect()}
    assert got[2] is None
    assert got[1] is not None and len(got[1]) == 4


def test_hyperplane_bucket_prefix_property(spark):
    """Bit j is independent of n_bits: a shorter bucket is always a
    prefix of a longer one (what lets auto_n_bits vary bits per corpus
    while oracles substring a max-width signature)."""
    from quasdb_spark.operators.similarity import hyperplane_bucket

    df = spark.createDataFrame(
        [(i, [((i * 31 + j * 7) % 13) - 6.0 for j in range(64)])
         for i in range(20)], "vec_id long, embedding array<double>")
    r = df.select(hyperplane_bucket("embedding", 6).alias("b6"),
                  hyperplane_bucket("embedding", 24).alias("b24")).collect()
    assert all(row.b24.startswith(row.b6) for row in r)


def test_knn_graph_skew_guard_bounds_hot_bucket(spark):
    """A degenerate corpus (many identical vectors -> one hot bucket)
    must NOT produce O(n^2) pairs: the over-cap bucket is dropped
    before the self-join, normal buckets still get neighbors."""
    from quasdb_spark.operators.similarity import knn_graph

    rng = random.Random(7)
    rows = [(i, [1.0] * 64) for i in range(60)]  # hot: identical vecs
    for i in range(60, 80):  # normal corpus
        rows.append((i, [rng.gauss(0, 1) for _ in range(64)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    out = knn_graph(df, 3, n_bits=4, max_bucket_size=30).collect()
    srcs = {r.src for r in out}
    assert not srcs & set(range(60))  # hot bucket dropped entirely
    assert srcs  # normal vectors still got neighbors
    # and with the guard off, the hot bucket IS the quadratic blowup
    raw = knn_graph(df, 3, n_bits=4, max_bucket_size=None).collect()
    assert {r.src for r in raw} & set(range(60))


def test_knn_graph_auto_bits_scales_with_corpus(spark):
    from quasdb_spark.operators.similarity import auto_n_bits

    assert auto_n_bits(100) == 4          # tiny corpus -> floor
    assert auto_n_bits(500) == 4          # sf0.01 embeddings
    assert auto_n_bits(1 << 20) == 13     # 1M vectors -> ~128/bucket
    assert auto_n_bits(10 ** 9) == 23     # 1B -> still under the cap
    assert auto_n_bits(10 ** 12) == 24    # clamped


def test_multiprobe_lifts_recall_over_single_bucket(spark, sf_dir):
    """probe_hamming=1 candidates strictly contain the single-bucket
    candidates (its probe set includes the exact bucket), so recall vs
    exact top-k can only rise — and on the testdata it measurably
    does, at (n_bits+1)x candidate volume, not 2^n_bits x."""
    from quasdb_spark.operators.similarity import bucketed_topk
    from quasdb_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") % 50 == 0)

    def pairs(df):
        return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}

    exact = pairs(cosine_topk(e, q, 5))
    single = pairs(bucketed_topk(e, q, 5, n_bits=8))
    probed = pairs(bucketed_topk(e, q, 5, n_bits=8, probe_hamming=1))
    r_single = len(single & exact) / len(exact)
    r_probe = len(probed & exact) / len(exact)
    assert r_probe >= r_single
    # on this corpus (uniform-random vectors — the HARD regime for
    # LSH) multiprobe still finds strictly more true neighbors
    assert len(probed & exact) > len(single & exact)
    assert r_probe > 0


def test_quantizer_on_miss_lifecycle(spark, tmp_path):
    """Production lifecycle guard: on an artifact MISS, on_miss='raise'
    refuses to train inside the query (QuantizerMiss); after an
    explicit retrain() the same call loads the artifact instantly."""
    import pytest

    from quasdb_spark.operators import quantizer as QZ

    QZ.clear_cache()
    root = str(tmp_path / "artifacts")
    df = spark.createDataFrame(
        [(i, [float((i * j) % 7 - 3) for j in range(8)])
         for i in range(60)], "vec_id long, embedding array<double>")
    with pytest.raises(QZ.QuantizerMiss):
        QZ.get_or_train(df, 4, fingerprint="fp-x", vec_col="embedding",
                        root=root, on_miss="raise", n_iter=1)
    QZ.retrain(df, 4, fingerprint="fp-x", vec_col="embedding",
               root=root, n_iter=1)  # the maintenance job
    cents = QZ.get_or_train(df, 4, fingerprint="fp-x",
                            vec_col="embedding", root=root,
                            on_miss="raise", n_iter=1)
    assert 1 <= cents.count() <= 4  # k-means may drop empty clusters


def test_semantic_dedup_keeps_one_per_component(spark):
    """SemDeDup semantics on planted duplicate groups: exactly one
    survivor (the min id) per duplicate component, singletons kept,
    kept+dropped partition the corpus."""
    rng = random.Random(9)
    dims = 64
    rows = []
    for i in range(60):
        rows.append((i, [rng.gauss(0, 1) for _ in range(dims)]))
    # two planted groups of 3 near-identical vectors each
    for base_id, new_ids in ((3, (100, 101)), (7, (200, 201))):
        base = rows[base_id][1]
        for nid in new_ids:
            noise = [rng.gauss(0, 0.02) for _ in range(dims)]
            rows.append((nid, [b + n for b, n in zip(base, noise)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    from quasdb_spark.operators.similarity import semantic_dedup

    out = {r["vec_id"]: r for r in
           semantic_dedup(df, threshold=0.95).collect()}
    assert len(out) == len(rows)  # one row per vector
    for base_id, new_ids in ((3, (100, 101)), (7, (200, 201))):
        grp = [out[base_id]] + [out[n] for n in new_ids]
        assert all(r["cluster_id"] == base_id for r in grp)
        assert all(r["n_members"] == 3 for r in grp)
        assert [r["is_kept"] for r in grp] == [True, False, False]
    # exactly one kept per cluster, clusters partition the corpus
    kept = [r for r in out.values() if r["is_kept"]]
    assert len({r["cluster_id"] for r in out.values()}) == len(kept)
    # a random singleton is its own kept cluster
    assert out[42]["is_kept"] and out[42]["n_members"] == 1


def test_ivf_incremental_append_matches_full_rebuild(spark, sf_dir,
                                                     tmp_path):
    """append_to_lists assigns ONLY the new vectors and appends them to
    the partitioned artifact: probing the appended lists equals probing
    lists rebuilt from the full corpus; appending into a missing
    artifact raises QuantizerMiss."""
    from quasdb_spark.operators import quantizer as QZ

    e = load_table(spark, sf_dir, "embeddings")
    base = e.where(F.col("vec_id") % 5 != 0)
    fresh = e.where(F.col("vec_id") % 5 == 0)
    q = e.where(F.col("vec_id") % 100 == 0)
    cents = kmeans_centroids(base, 10, n_iter=2)

    with pytest.raises(QZ.QuantizerMiss):
        QZ.append_to_lists(fresh, cents, fingerprint="t-app",
                           n_clusters=10, root=str(tmp_path))

    QZ.get_or_build_lists(base, cents, fingerprint="t-app",
                          n_clusters=10, root=str(tmp_path))
    appended = QZ.append_to_lists(fresh, cents, fingerprint="t-app",
                                  n_clusters=10, root=str(tmp_path))
    rebuilt = QZ.get_or_build_lists(e, cents, fingerprint="t-reb",
                                    n_clusters=10, root=str(tmp_path))
    got = sorted(map(tuple, ivf_topk(
        e, q, 10, nprobe=2, centroids=cents, lists=appended).collect()))
    want = sorted(map(tuple, ivf_topk(
        e, q, 10, nprobe=2, centroids=cents, lists=rebuilt).collect()))
    assert got == want and len(got) > 0


def test_vectorized_signature_bit_parity(spark):
    """The Arrow/numpy signature pass must equal the expression fold
    BIT-FOR-BIT — keys, norms, and widened vectors — because the suite
    oracles assume fold arithmetic. Covers the synthetic dims=64 AND a
    random higher-dims case (the width where the vectorized path is
    the only practical one); also NULL vectors and the wrong-length
    raise."""
    import random

    import pyspark.sql.functions as F
    import pytest

    from quasdb_spark.operators.similarity import (_as_double,
                                                   hyperplane_band_keys,
                                                   neardup_pairs_banded,
                                                   norm,
                                                   signature_frame_pandas)
    from quasdb_spark.sources.tables import load_table

    def check(df, dims, n_bands, band_bits):
        keys = hyperplane_band_keys("embedding", n_bands, band_bits,
                                    dims=dims, seed=0)
        expr = df.select(F.col("vec_id").alias("_id"),
                         _as_double("embedding").alias("_v"),
                         norm(_as_double("embedding")).alias("_n"),
                         keys.alias("_keys"))
        vec = signature_frame_pandas(df, n_bands=n_bands,
                                     band_bits=band_bits, dims=dims,
                                     seed=0)
        bad = (expr.alias("x").join(vec.alias("y"), "_id").where(
            (F.col("x._keys").cast("string")
             != F.col("y._keys").cast("string"))
            | (F.col("x._n") != F.col("y._n"))
            | (F.col("x._v").cast("string")
               != F.col("y._v").cast("string")))).count()
        assert bad == 0

    e = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    check(e, 64, 8, 8)

    rng = random.Random(3)
    wide = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(200)]) for i in range(60)],
        "vec_id long, embedding array<float>")
    check(wide, 200, 4, 6)

    # pair-level equality on the real corpus
    p1 = sorted(map(tuple, neardup_pairs_banded(
        e, threshold=0.40, n_bands=8, band_bits=8,
        max_bucket_size=1000).collect()))
    p2 = sorted(map(tuple, neardup_pairs_banded(
        e, threshold=0.40, n_bands=8, band_bits=8,
        max_bucket_size=1000, vectorized=True).collect()))
    assert p1 == p2

    # NULL vector -> NULL signature columns (no crash, no rows lost)
    with_null = spark.createDataFrame(
        [(1, [1.0] * 64), (2, None)], "vec_id long, embedding array<float>")
    got = {r["_id"]: r["_keys"] for r in signature_frame_pandas(
        with_null, n_bands=2, band_bits=4, dims=64).collect()}
    assert got[2] is None and got[1] is not None

    # wrong-length vector raises (assert_true parity)
    bad_len = spark.createDataFrame(
        [(1, [1.0] * 5)], "vec_id long, embedding array<float>")
    with pytest.raises(Exception, match="length"):
        signature_frame_pandas(bad_len, n_bands=2, band_bits=4,
                               dims=64).collect()


def test_decontaminate_matches_symmetric_pair_finder(spark, sf_dir):
    """similarity.decontaminate (probe-side: benchmark bands broadcast,
    corpus touched once map-only) must be RESULT-IDENTICAL to the
    symmetric pair finder post-filtered to cross (corpus, benchmark)
    pairs — same candidates (probed buckets are exactly the buckets
    that can produce a cross pair; the skew guard counts full bucket
    membership both ways) and bit-identical scores (same fold operand
    order). Checked for both the expression and Arrow-vectorized
    signature paths."""
    from quasdb_spark.operators.similarity import decontaminate

    e = load_table(spark, sf_dir, "embeddings")
    kw = dict(threshold=0.40, n_bands=8, band_bits=8,
              max_bucket_size=1000)
    bench = e.where(F.col("vec_id") % 5 == 0)
    corpus = e.where(F.col("vec_id") % 5 != 0)

    pairs = neardup_pairs_banded(e, **kw)
    a_bm = F.col("id_a") % 5 == 0
    b_bm = F.col("id_b") % 5 == 0
    want = {(r.corpus_id, r.benchmark_id, round(r.score, 4))
            for r in (pairs.where(a_bm != b_bm)
                      .select(F.when(a_bm, F.col("id_b"))
                               .otherwise(F.col("id_a")).alias("corpus_id"),
                              F.when(a_bm, F.col("id_a"))
                               .otherwise(F.col("id_b")).alias("benchmark_id"),
                              "score")).collect()}
    assert want  # the fixture data must actually plant cross near-dups

    for vectorized in (False, True):
        got = {(r.corpus_id, r.benchmark_id, round(r.score, 4))
               for r in decontaminate(corpus, bench, vectorized=vectorized,
                                      **kw).collect()}
        assert got == want


def test_decontaminate_plan_broadcasts_benchmark_only(spark, sf_dir):
    """The corpus side must never shuffle on band keys: every join in
    the decontaminate plan is a broadcast join (benchmark side), and
    there is no cartesian/BNLJ fallback."""
    from quasdb_spark.operators.similarity import decontaminate

    e = load_table(spark, sf_dir, "embeddings")
    plan = decontaminate(e.where(F.col("vec_id") % 5 != 0),
                         e.where(F.col("vec_id") % 5 == 0),
                         threshold=0.40)._jdf \
        .queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan
    # no shuffle-hash/sort-merge join anywhere: the only exchanges left
    # are aggregate/dedup shuffles, never a corpus-band equi-join
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_hard_negatives_semantics(spark):
    """Every mined negative carries a different label; per-anchor rows
    are ranked by cosine desc; a same-label near-identical vector is
    NEVER mined while a different-label identical vector ranks #1."""
    from quasdb_spark.operators.similarity import hard_negatives

    dims = 64
    base = [1.0] * dims
    ortho = [1.0, -1.0] * (dims // 2)
    rows = [
        (1, base, 0),
        (2, base, 0),            # same label twin: must not be mined
        (3, base, 1),            # different-label twin: rank 1 for 1
        (4, ortho, 1),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>, label int")
    out = hard_negatives(df, 3, dims=dims).collect()
    assert all(r.anchor_label != r.negative_label for r in out)
    mine1 = sorted([r for r in out if r.anchor_id == 1],
                   key=lambda r: r.rank)
    assert mine1 and mine1[0].negative_id == 3 and mine1[0].score == 1.0
    assert all(r.negative_id != 2 for r in mine1)
    # ranks are 1..n dense and scores non-increasing per anchor
    for aid in {r.anchor_id for r in out}:
        mine = sorted([r for r in out if r.anchor_id == aid],
                      key=lambda r: r.rank)
        assert [r.rank for r in mine] == list(range(1, len(mine) + 1))
        assert all(a.score >= b.score for a, b in zip(mine, mine[1:]))


def test_ivf_recall_query_shape(spark, sf_dir):
    """sim_ivf_recall: one row per query point, n_hits in [0, 10],
    recall = n_hits/10, and deterministic across runs (trained
    quantizer + seeded assignment, no RNG)."""
    from quasdb_spark import suite

    rows = suite.QUERIES["sim_ivf_recall"](spark, sf_dir).collect()
    assert rows, "no query points"
    for r in rows:
        assert 0 <= r.n_hits <= 10
        assert abs(r.recall_at_10 - round(r.n_hits / 10.0, 4)) < 1e-9
    again = suite.QUERIES["sim_ivf_recall"](spark, sf_dir).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))


def test_random_project_prefix_and_distance_preservation(spark):
    """Component j depends only on (seed, j, dims) — a narrower
    projection is a prefix of a wider one — and the scaled projection
    roughly preserves norms (the JL contract this operator exists
    for; ±1 families concentrate like Gaussians)."""
    from quasdb_spark.operators.similarity import random_project

    rows = [(i, [float((i * 31 + j * 7) % 13) - 6.0 for j in range(64)])
            for i in range(24)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    p8 = {r.vec_id: r.projected for r in
          random_project(df, 8, seed=3, scale=False).collect()}
    p16 = {r.vec_id: r.projected for r in
           random_project(df, 16, seed=3, scale=False).collect()}
    assert all(p16[k][:8] == p8[k] for k in p8)

    vecs = dict(rows)
    ratios = []
    for r in random_project(df, 16, seed=3).collect():
        on = math.sqrt(sum(x * x for x in vecs[r.vec_id]))
        pn = math.sqrt(sum(x * x for x in r.projected))
        ratios.append(pn / on)
    avg = sum(ratios) / len(ratios)
    assert 0.6 < avg < 1.4, avg


def test_random_project_null_and_length_contract(spark):
    """NULL vector -> NULL projection (no job failure); wrong length
    raises (same contract as hyperplane_bucket)."""
    from quasdb_spark.operators.similarity import random_project

    ok = spark.createDataFrame(
        [(1, None), (2, [1.0] * 64)],
        "vec_id long, embedding array<double>")
    got = {r.vec_id: r.projected for r in random_project(ok, 4).collect()}
    assert got[1] is None and got[2] is not None
    bad = spark.createDataFrame([(3, [1.0, 2.0])],
                                "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="random_project"):
        random_project(bad, 4).collect()


def test_pq_quantization_codebook_properties(spark, sf_dir):
    """PQ diagnostics contract: every (subspace, code) row is within
    range, per-subspace membership covers the whole corpus, and the
    trained codebooks actually fit — members' average cosine to their
    own centroid is high (assignment is argmax, so fit >= any random
    centroid's)."""
    from quasdb_spark.operators.similarity import pq_quantization
    from quasdb_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    n = e.count()
    rows = pq_quantization(e, m=4, k=8).collect()
    by_sub = {}
    for r in rows:
        assert 0 <= r.subspace < 4 and 0 <= r.c_label < 8
        assert r.min_cos <= r.avg_cos
        by_sub.setdefault(r.subspace, []).append(r)
    assert set(by_sub) == {0, 1, 2, 3}
    for s, rs in by_sub.items():
        assert sum(r.n_vecs for r in rs) == n, s
        # corpus-weighted fit: argmax-of-8 assignment on 16-dim
        # subvectors must beat the ~0 expectation of a random centroid
        w = sum(r.avg_cos * r.n_vecs for r in rs) / n
        assert w > 0.2, (s, w)


def test_pq_quantization_rejects_ragged_split(spark):
    from quasdb_spark.operators.similarity import pq_quantization

    df = spark.createDataFrame([(1, [1.0] * 64)],
                               "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="not divisible"):
        pq_quantization(df, m=5, k=4)


def test_ivfpq_topk_contract(spark, sf_dir):
    """IVFPQ search contract: dense unique ranks per query, ADC scores
    are true cosines against the PQ reconstruction (bounded by 1 up
    to micro rounding), and the quantized ranking still surfaces
    genuinely-similar vectors (top-1 ADC score is far above the ~0
    expectation of random 64-dim pairs)."""
    from quasdb_spark.operators.similarity import (ivfpq_topk,
                                                   kmeans_centroids)
    from quasdb_spark.operators.similarity import ivf_assign
    from quasdb_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") % 100 == 0)
    cents = kmeans_centroids(e, 10, n_iter=2, sample_cap=65536)
    lists = ivf_assign(e, cents)
    got = ivfpq_topk(e, queries, 10, nprobe=2,
                     centroids=cents, lists=lists).collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r.query_id, []).append(r)
        assert -1.01 <= r.score_adc <= 1.01
        assert r.neighbor_id != r.query_id
    for qid, rows in per_q.items():
        assert sorted(r.rank for r in rows) == list(range(1, len(rows) + 1))
        top1 = min(rows, key=lambda r: r.rank)
        assert top1.score_adc > 0.2, (qid, top1)


def test_pq_artifact_roundtrip_and_codes(spark, sf_dir, tmp_path):
    """PQ artifact lifecycle: loaded codebooks are bit-equal to the
    trained ones (JSON floats round-trip via repr), the code table
    covers every (vector, subspace), and an artifact-backed
    ivfpq_topk equals the inline-trained one row for row."""
    from quasdb_spark.operators import quantizer as QZ
    from quasdb_spark.operators.similarity import ivfpq_topk, ivf_assign, kmeans_centroids
    from quasdb_spark.sources.tables import load_table

    root = str(tmp_path / "artifacts")
    e = load_table(spark, sf_dir, "embeddings")
    fp = "test-fp"
    cbs = QZ.get_or_train_pq(e, fingerprint=fp, m=4, k=8, root=root,
                             force=True)
    loaded = QZ.get_or_train_pq(e, fingerprint=fp, m=4, k=8, root=root)
    assert sorted(map(tuple, cbs.collect())) == \
        sorted(map(tuple, loaded.collect()))
    codes = QZ.get_or_build_codes(e, cbs, fingerprint=fp, m=4, k=8,
                                  root=root)
    assert codes.count() == e.count() * 4

    queries = e.where(F.col("vec_id") % 100 == 0)
    cents = kmeans_centroids(e, 10, n_iter=2, sample_cap=65536)
    lists = ivf_assign(e, cents)
    with_art = ivfpq_topk(e, queries, 5, nprobe=2, centroids=cents,
                          lists=lists, codebooks=loaded, codes=codes)
    inline = ivfpq_topk(e, queries, 5, nprobe=2, centroids=cents,
                        lists=lists)
    assert sorted(map(tuple, with_art.collect())) == \
        sorted(map(tuple, inline.collect()))


def test_ivfpq_residual_contract(spark, sf_dir, tmp_path):
    """Residual IVF-PQ (the FAISS by_residual default): k rows per
    query, rank contiguous, deterministic across runs, and the
    artifact-backed run (residual-trained codebooks/codes persisted
    through the SAME quantizer machinery, vec_col='_rv') equals the
    inline-trained one row for row. Guards match ivfpq_topk."""
    import pytest

    from quasdb_spark.operators import quantizer as QZ
    from quasdb_spark.operators.similarity import (ivf_assign,
                                                   ivfpq_topk_residual,
                                                   kmeans_centroids,
                                                   residual_frame)
    from quasdb_spark.sources.tables import load_table

    root = str(tmp_path / "artifacts")
    e = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_centroids(e, 4, n_iter=1, sample_cap=4096)
    lists = ivf_assign(e, cents)
    queries = e.where(F.col("vec_id") % 200 == 0)
    out = ivfpq_topk_residual(queries, 5, nprobe=2, pq_k=4,
                              n_iter=1, centroids=cents, lists=lists)
    rows = sorted(map(tuple, out.collect()))
    assert rows == sorted(map(tuple, out.collect()))
    per_q = {}
    for qid, rank, nid, score in rows:
        per_q.setdefault(qid, []).append((rank, nid, score))
        assert qid != nid
    for qid, rs in per_q.items():
        assert [r for r, _, _ in sorted(rs)] == list(range(1, len(rs) + 1))
        scores = [s for _, _, s in sorted(rs)]
        assert scores == sorted(scores, reverse=True)
    # artifact path: residual frame through the standard quantizer
    res = residual_frame(cents, lists)
    cbs = QZ.get_or_train_pq(res, fingerprint="res-fp", m=4, k=4,
                             vec_col="_rv", n_iter=1, root=root,
                             force=True)
    codes = QZ.get_or_build_codes(res, cbs, fingerprint="res-fp",
                                  m=4, k=4, vec_col="_rv", root=root)
    with_art = ivfpq_topk_residual(queries, 5, nprobe=2, pq_k=4,
                                   n_iter=1, centroids=cents,
                                   lists=lists, codebooks=cbs,
                                   codes=codes)
    assert sorted(map(tuple, with_art.collect())) == rows
    with pytest.raises(ValueError, match="without the codebooks"):
        ivfpq_topk_residual(queries, 5, nprobe=2, centroids=cents,
                            lists=lists, codes=codes)


def test_pq_guards(spark, sf_dir, tmp_path):
    """Mismatched-artifact guards: codes without their codebooks raise
    (ADC table from fresh training + foreign codes = silently wrong
    scores); dims not divisible by m raises everywhere a subspace
    width is derived (training, encoding, search); a codes table
    missing a subspace row fails the per-candidate m-term assert
    instead of under-summing."""
    import pytest

    from quasdb_spark.operators import quantizer as QZ
    from quasdb_spark.operators.similarity import (ivf_assign,
                                                   ivfpq_topk,
                                                   kmeans_centroids,
                                                   pq_assign)
    from quasdb_spark.sources.tables import load_table

    root = str(tmp_path / "artifacts")
    e = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_centroids(e, 4, n_iter=1, sample_cap=4096)
    lists = ivf_assign(e, cents)
    queries = e.where(F.col("vec_id") % 200 == 0)
    cbs = QZ.get_or_train_pq(e, fingerprint="guard-fp", m=4, k=4,
                             root=root, n_iter=1, force=True)
    codes = QZ.get_or_build_codes(e, cbs, fingerprint="guard-fp",
                                  m=4, k=4, root=root)
    with pytest.raises(ValueError, match="without the codebooks"):
        ivfpq_topk(e, queries, 5, nprobe=2, centroids=cents,
                   lists=lists, codes=codes)
    with pytest.raises(ValueError, match="not divisible"):
        QZ.get_or_train_pq(e, fingerprint="bad", m=5, root=root)
    with pytest.raises(ValueError, match="not divisible"):
        pq_assign(e, cbs, m=5)
    # drop one subspace row for one corpus vector: the candidate must
    # fail the m-term assert, not score on 3 of 4 subspaces
    holey = codes.where(~((F.col("vec_id") == 7)
                          & (F.col("subspace") == 2)))
    with pytest.raises(Exception, match="subspaces|ASSERT"):
        ivfpq_topk(e, queries, 5, nprobe=4, centroids=cents,
                   lists=lists, codebooks=cbs, codes=holey).collect()


def test_ivfpq_array_codes_layout(spark, sf_dir, tmp_path):
    """The r10 serving layout: get_or_build_codes_array persists ONE
    row per vector with codes[s] positional by subspace, and
    ivfpq_topk over the array artifact equals the row-layout artifact
    AND the inline-trained run row for row (same integer ADC terms,
    inline lookup sum instead of the m-row join+groupBy)."""
    from quasdb_spark.operators import quantizer as QZ
    from quasdb_spark.operators.similarity import (ivf_assign,
                                                   ivfpq_topk,
                                                   kmeans_centroids)
    from quasdb_spark.sources.tables import load_table

    root = str(tmp_path / "artifacts")
    e = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_centroids(e, 10, n_iter=2, sample_cap=65536)
    lists = ivf_assign(e, cents)
    queries = e.where(F.col("vec_id") % 100 == 0)
    cbs = QZ.get_or_train_pq(e, fingerprint="arr-fp", m=4, k=8,
                             root=root, force=True)
    rows_codes = QZ.get_or_build_codes(e, cbs, fingerprint="arr-fp",
                                       m=4, k=8, root=root)
    arr_codes = QZ.get_or_build_codes_array(e, cbs, fingerprint="arr-fp",
                                            m=4, k=8, root=root)
    # one row per vector, m codes each, positional by subspace
    assert arr_codes.count() == e.count()
    assert arr_codes.where(F.size("codes") != 4).count() == 0
    sample = dict((r["vec_id"], r["codes"])
                  for r in arr_codes.limit(50).collect())
    row_map = {}
    for r in rows_codes.where(F.col("vec_id").isin(*sample)).collect():
        row_map.setdefault(r["vec_id"], {})[r["subspace"]] = r["code"]
    for vid, codes in sample.items():
        assert codes == [row_map[vid][s] for s in range(4)], vid
    via_arr = ivfpq_topk(e, queries, 5, nprobe=2, centroids=cents,
                         lists=lists, codebooks=cbs, codes=arr_codes)
    via_rows = ivfpq_topk(e, queries, 5, nprobe=2, centroids=cents,
                          lists=lists, codebooks=cbs, codes=rows_codes)
    inline = ivfpq_topk(e, queries, 5, nprobe=2, centroids=cents,
                        lists=lists)
    got = sorted(map(tuple, via_arr.collect()))
    assert got == sorted(map(tuple, via_rows.collect()))
    assert got == sorted(map(tuple, inline.collect()))


def test_hard_negatives_vectorized_scorer_bit_parity(spark, sf_dir):
    """The bucket-local Arrow scorer (one dims-sequential numpy Gram
    per LSH bucket + in-bucket top-k) must be BIT-identical to the
    expression fold — same rows, same ranks, same 4-decimal scores
    (the signature_frame_pandas float-order argument plus the
    partial-top-k losslessness argument)."""
    from quasdb_spark.operators.similarity import hard_negatives
    from quasdb_spark.sources.tables import load_table

    e = (load_table(spark, sf_dir, "embeddings")
         .withColumn("label", F.col("vec_id") % 5))
    a = sorted(map(tuple, hard_negatives(e, 3, vectorized=True)
                   .collect()))
    b = sorted(map(tuple, hard_negatives(e, 3, vectorized=False)
                   .collect()))
    assert a == b and len(a) > 0


def test_ivf_drop_from_lists_deletes_neighbors(spark, sf_dir, tmp_path):
    """Index deletion lifecycle (r10 VERDICT #3): a vector dropped
    from the materialized lists never appears as a neighbor again,
    append+drop equals a clean rebuild, and only the affected
    list_label partitions are rewritten."""
    import os

    from quasdb_spark.operators import quantizer as QZ

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") % 100 == 0)
    cents = kmeans_centroids(e, 10, n_iter=2)
    lists = QZ.get_or_build_lists(e, cents, fingerprint="t-drop",
                                  n_clusters=10, root=str(tmp_path))
    before = ivf_topk(e, q, 10, nprobe=2, centroids=cents,
                      lists=lists).collect()
    doomed = sorted({r.neighbor_id for r in before})[:5]
    assert doomed

    path = QZ.lists_path(QZ._key("t-drop", 10, 2, None, 6),
                         str(tmp_path))
    mtimes_before = {
        d: os.path.getmtime(os.path.join(path, d))
        for d in os.listdir(path) if d.startswith("list_label=")}
    # (captured before the drop: the old frame's file list dies with it)
    doomed_lbls = {r.list_label for r in lists.where(
        F.col("vec_id").isin(doomed)).select("list_label").collect()}
    lists2 = QZ.drop_from_lists(spark, doomed, fingerprint="t-drop",
                                n_clusters=10, root=str(tmp_path))
    after = ivf_topk(e, q, 10, nprobe=2, centroids=cents,
                     lists=lists2).collect()
    assert not {r.neighbor_id for r in after} & set(doomed)
    assert len(after) > 0
    # bounded rewrite: untouched partitions were not rewritten
    untouched = [d for d in mtimes_before
                 if int(d.split("=")[1]) not in doomed_lbls]
    assert untouched, "test corpus degenerate: every list affected"
    for d in untouched:
        assert os.path.getmtime(os.path.join(path, d)) \
            == mtimes_before[d], f"{d} rewritten needlessly"

    # append + drop == clean rebuild (same key space, orderless)
    base = e.where(F.col("vec_id") % 5 != 0)
    fresh = e.where(F.col("vec_id") % 5 == 0)
    QZ.get_or_build_lists(base, cents, fingerprint="t-ad",
                          n_clusters=10, root=str(tmp_path))
    QZ.append_to_lists(fresh, cents, fingerprint="t-ad",
                       n_clusters=10, root=str(tmp_path))
    dropped = QZ.drop_from_lists(
        spark, fresh.select("vec_id"), fingerprint="t-ad",
        n_clusters=10, root=str(tmp_path))
    rebuilt = QZ.get_or_build_lists(base, cents, fingerprint="t-ad2",
                                    n_clusters=10, root=str(tmp_path))
    got = sorted((r.vec_id, r.list_label, tuple(r.vec))
                 for r in dropped.collect())
    want = sorted((r.vec_id, r.list_label, tuple(r.vec))
                  for r in rebuilt.collect())
    assert got == want and len(got) > 0


def test_ivf_stale_index_guard(spark, sf_dir, tmp_path):
    """Searches against lists whose recorded corpus fingerprint no
    longer matches the live corpus raise StaleIndexError unless
    allow_stale=True; matching fingerprints and maintained artifacts
    pass."""
    import pytest as _pt

    from quasdb_spark.operators import quantizer as QZ

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") % 100 == 0)
    cents = kmeans_centroids(e, 10, n_iter=2)
    lists = QZ.get_or_build_lists(e, cents, fingerprint="fp-A",
                                  n_clusters=10, root=str(tmp_path))
    # matching fingerprint: fine
    ivf_topk(e, q, 5, nprobe=2, centroids=cents, lists=lists,
             corpus_fingerprint="fp-A").collect()
    # corpus moved on: guard trips...
    with _pt.raises(QZ.StaleIndexError):
        ivf_topk(e, q, 5, nprobe=2, centroids=cents, lists=lists,
                 corpus_fingerprint="fp-B")
    # ...unless explicitly allowed
    ivf_topk(e, q, 5, nprobe=2, centroids=cents, lists=lists,
             corpus_fingerprint="fp-B", allow_stale=True).collect()
    # the guard also works on a RELOADED frame (meta read from the
    # artifact sidecar via inputFiles, no stamp attribute)
    reloaded = spark.read.schema(QZ._LISTS_SCHEMA).parquet(
        QZ.lists_path(QZ._key("fp-A", 10, 2, None, 6), str(tmp_path)))
    with _pt.raises(QZ.StaleIndexError):
        ivf_topk(e, q, 5, nprobe=2, centroids=cents, lists=reloaded,
                 corpus_fingerprint="fp-B")
    # maintenance updates the recorded fingerprint
    upd = QZ.drop_from_lists(spark, [int(e.limit(1).collect()[0].vec_id)],
                             fingerprint="fp-A", n_clusters=10,
                             root=str(tmp_path), new_fingerprint="fp-B")
    ivf_topk(e, q, 5, nprobe=2, centroids=cents, lists=upd,
             corpus_fingerprint="fp-B").collect()


def test_ivf_half_drop_marker_rejected(spark, sf_dir, tmp_path):
    """A drop that crashes mid-partition-swap leaves _SUCCESS and the
    OLD fingerprint intact — the in-progress marker (written before
    the first swap, cleared only after the sidecar commit) is what
    makes the half-swapped artifact detectable: check_fresh and
    further maintenance reject it; a rebuild recovers and clears it."""
    import os

    import pytest as _pt

    from quasdb_spark.operators import quantizer as QZ

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") % 100 == 0)
    cents = kmeans_centroids(e, 10, n_iter=2)
    lists = QZ.get_or_build_lists(e, cents, fingerprint="fp-HD",
                                  n_clusters=10, root=str(tmp_path))
    path = QZ.lists_path(QZ._key("fp-HD", 10, 2, None, 6),
                         str(tmp_path))
    # simulate the crash window: marker present, artifact otherwise
    # looks healthy (fingerprint matches, _SUCCESS intact)
    with open(os.path.join(path, QZ._DROP_MARKER), "w") as f:
        f.write("{}")
    # stamped frame: the guard trips even with a matching fingerprint
    with _pt.raises(QZ.StaleIndexError, match="in progress"):
        ivf_topk(e, q, 5, nprobe=2, centroids=cents, lists=lists,
                 corpus_fingerprint="fp-HD")
    # reloaded frame (meta located via inputFiles): same
    reloaded = spark.read.schema(QZ._LISTS_SCHEMA).parquet(path)
    with _pt.raises(QZ.StaleIndexError, match="in progress"):
        ivf_topk(e, q, 5, nprobe=2, centroids=cents, lists=reloaded,
                 corpus_fingerprint="fp-HD")
    # maintenance on a half-swapped artifact would compound damage
    with _pt.raises(QZ.StaleIndexError):
        QZ.drop_from_lists(spark, [1], fingerprint="fp-HD",
                           n_clusters=10, root=str(tmp_path))
    with _pt.raises(QZ.StaleIndexError):
        QZ.append_to_lists(e.limit(1), cents, fingerprint="fp-HD",
                           n_clusters=10, root=str(tmp_path))
    # allow_stale is the explicit escape hatch
    ivf_topk(e, q, 5, nprobe=2, centroids=cents, lists=lists,
             corpus_fingerprint="fp-HD", allow_stale=True).collect()
    # recovery: non-force get_or_build treats the marker as unusable
    # and rebuilds (overwrite clears the marker)
    rebuilt = QZ.get_or_build_lists(e, cents, fingerprint="fp-HD",
                                    n_clusters=10, root=str(tmp_path))
    assert not os.path.exists(os.path.join(path, QZ._DROP_MARKER))
    ivf_topk(e, q, 5, nprobe=2, centroids=cents, lists=rebuilt,
             corpus_fingerprint="fp-HD").collect()
    # a completed drop leaves no marker behind
    QZ.drop_from_lists(spark, [int(e.limit(1).collect()[0].vec_id)],
                       fingerprint="fp-HD", n_clusters=10,
                       root=str(tmp_path))
    assert not os.path.exists(os.path.join(path, QZ._DROP_MARKER))


def test_pq_codes_drop_matches_rebuild(spark, sf_dir, tmp_path):
    """drop_from_codes_array == rebuilding codes on the surviving
    corpus (codes are a pure per-vector function), and ivfpq_topk
    never returns a dropped vector."""
    from quasdb_spark.operators import quantizer as QZ
    from quasdb_spark.operators.similarity import ivfpq_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") % 100 == 0)
    cents = kmeans_centroids(e, 10, n_iter=2)
    lists = QZ.get_or_build_lists(e, cents, fingerprint="t-pqd",
                                  n_clusters=10, root=str(tmp_path))
    cbs = QZ.get_or_train_pq(e, fingerprint="t-pqd", m=4, k=8,
                             root=str(tmp_path))
    codes = QZ.get_or_build_codes_array(e, cbs, fingerprint="t-pqd",
                                        m=4, k=8, root=str(tmp_path))
    before = ivfpq_topk(e, q, 10, nprobe=2, centroids=cents,
                        lists=lists, codebooks=cbs,
                        codes=codes).collect()
    doomed = sorted({r.neighbor_id for r in before})[:5]
    lists2 = QZ.drop_from_lists(spark, doomed, fingerprint="t-pqd",
                                n_clusters=10, root=str(tmp_path))
    codes2 = QZ.drop_from_codes_array(spark, doomed,
                                      fingerprint="t-pqd", m=4, k=8,
                                      root=str(tmp_path))
    after = ivfpq_topk(e, q, 10, nprobe=2, centroids=cents,
                       lists=lists2, codebooks=cbs,
                       codes=codes2).collect()
    assert not {r.neighbor_id for r in after} & set(doomed)
    assert len(after) > 0
    # drop == rebuild on the surviving corpus
    survivors = e.where(~F.col("vec_id").isin(doomed))
    rebuilt = QZ.get_or_build_codes_array(
        survivors, cbs, fingerprint="t-pqd2", m=4, k=8,
        root=str(tmp_path))
    got = sorted((r.vec_id, tuple(r.codes)) for r in codes2.collect())
    want = sorted((r.vec_id, tuple(r.codes)) for r in rebuilt.collect())
    assert got == want and len(got) > 0


def test_maybe_retrain_triggers_on_drift_and_noops_when_healthy(
        spark, sf_dir, tmp_path):
    """maybe_retrain is the compaction-picking analogue for the ANN
    index: a quantizer trained on a biased slice leaves the full
    corpus piled into few lists (skew/empty triggers) -> retrain +
    rebuild restores balance; a healthy index is left byte-untouched
    (no silent rewrites on every maintenance tick)."""
    import os

    from quasdb_spark.operators import quantizer as QZ

    e = load_table(spark, sf_dir, "embeddings")
    # bias: train 10 centroids on ONE label's vectors only
    biased = kmeans_centroids(e.where(F.col("label") == 0), 10, n_iter=2)
    lists = QZ.get_or_build_lists(e, biased, fingerprint="t-drift",
                                  n_clusters=10, root=str(tmp_path))
    h0 = QZ.index_health(lists, biased, n_clusters=10)
    assert h0["n_vectors"] > 0

    # the near-uniform testdata keeps lists balanced even under a
    # biased quantizer, so the FIT trigger is the live one here
    # (biased avg_cos ~0.228 vs ~0.277 after a full-corpus retrain)
    out = QZ.maybe_retrain(e, biased, lists, fingerprint="t-drift",
                           n_clusters=10, root=str(tmp_path),
                           max_size_skew=1e9, min_avg_cos=0.25)
    assert out["retrained"] is True
    h1 = out["health"]
    assert h1["n_vectors"] == h0["n_vectors"]       # nothing lost
    assert h1["avg_cos"] > h0["avg_cos"]            # better fit
    # meta op trail records the retrain
    meta = QZ.read_artifact_meta(QZ.lists_path(
        QZ._key("t-drift", 10, 2, None, 6), str(tmp_path)))
    assert meta["ops"][-1] == "retrain"
    # the rebuilt index still serves
    q = e.where(F.col("vec_id") % 100 == 0)
    assert ivf_topk(e, q, 5, nprobe=2, centroids=out["centroids"],
                    lists=out["lists"]).count() > 0

    # healthy path: generous thresholds -> no-op, artifact untouched
    path = QZ.lists_path(QZ._key("t-drift", 10, 2, None, 6),
                         str(tmp_path))
    mtimes = {d: os.path.getmtime(os.path.join(path, d))
              for d in os.listdir(path) if d.startswith("list_label=")}
    out2 = QZ.maybe_retrain(e, out["centroids"], out["lists"],
                            fingerprint="t-drift", n_clusters=10,
                            root=str(tmp_path), max_size_skew=1e9,
                            min_avg_cos=-1.0, max_empty_lists=10)
    assert out2["retrained"] is False
    for d, m in mtimes.items():
        assert os.path.getmtime(os.path.join(path, d)) == m


def test_cosine_topk_blocked_matches_perpair_on_testdata(spark, sf_dir):
    """The blocked brute-force scan (mapInPandas numpy passes) must
    reproduce the per-pair crossJoin fold ROW FOR ROW — same top-k
    sets, same ranks, same rounded scores — on the real testdata.
    The per-dimension accumulation order is engineered to be the
    identical IEEE-754 sequence as dot()/norm()'s sequential folds,
    so full-precision ranking cannot diverge."""
    from quasdb_spark.operators.similarity import cosine_topk_blocked

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") % 100 == 0)
    want = sorted(map(tuple, cosine_topk(e, queries, 10).collect()))
    got = sorted(map(tuple,
                     cosine_topk_blocked(e, queries, 10).collect()))
    assert want  # fixture must produce queries
    assert got == want


def test_cosine_topk_blocked_ties_nulls_and_small_corpus(spark):
    """Adversarial parity: exact score TIES (duplicated vectors — the
    (score DESC, id ASC) tie-break must agree), a corpus smaller than
    k, and NULL / wrong-length vectors (dropped; they can never
    out-rank a finite candidate)."""
    from quasdb_spark.operators.similarity import cosine_topk_blocked

    random.seed(7)
    base = [[random.uniform(-1, 1) for _ in range(8)] for _ in range(6)]
    rows = []
    vid = 0
    for v in base:
        for _ in range(3):  # exact duplicates -> exact cosine ties
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    rows.append((vid, None))  # NULL vector: dropped, never ranked
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    queries = corpus.where((F.col("vec_id") % 6 == 0)
                           & F.col("embedding").isNotNull())
    for k in (3, 5, 40):  # 40 > corpus: every finite candidate ranks
        want = sorted(map(tuple, cosine_topk(corpus.where(
            F.col("embedding").isNotNull()), queries, k).collect()))
        got = sorted(map(tuple, cosine_topk_blocked(
            corpus, queries, k).collect()))
        assert got == want, f"k={k}"


def test_cosine_topk_blocked_corpus_never_shuffles(spark, sf_dir):
    """Scale-shape pin: the corpus side feeds mapInPandas straight
    from the scan — no Exchange below the scoring stage; the only
    shuffle ranks the k-bounded candidate rows."""
    from quasdb_spark.operators.similarity import cosine_topk_blocked

    e = load_table(spark, sf_dir, "embeddings")
    queries = e.where(F.col("vec_id") % 100 == 0)
    plan = cosine_topk_blocked(e, queries, 10)._jdf \
        .queryExecution().executedPlan().toString()
    # exactly one exchange (the final bounded per-query ranking);
    # scoring must not reshuffle or replicate the corpus
    assert plan.count("Exchange") == 1
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cosine_topk_blocked_zero_norm_string_ids_ragged_queries(spark):
    """Review-driven edge parity: (a) ZERO-NORM vectors are excluded
    on BOTH paths (cosine undefined; under ANSI mode the per-pair 0/0
    would otherwise kill the job — this pins that it no longer can);
    (b) string ids work end to end (schema + native tie-break
    ordering); (c) a wrong-length query vector is skipped (documented
    deviation), never a driver crash."""
    from quasdb_spark.operators.similarity import cosine_topk_blocked

    random.seed(11)
    rows = [(f"doc-{i:02d}",
             [random.uniform(-1, 1) for _ in range(8)])
            for i in range(12)]
    rows.append(("doc-zz", [0.0] * 8))       # zero norm: excluded
    corpus = spark.createDataFrame(
        rows, "vec_id string, embedding array<double>")
    queries = corpus.where(F.col("vec_id").isin("doc-00", "doc-05",
                                                "doc-zz"))

    def canon(df):
        return sorted((r["query_id"], r["rank"], r["neighbor_id"],
                       round(r["score"], 4)) for r in df.collect())

    want = canon(cosine_topk(corpus, queries, 5))
    got = canon(cosine_topk_blocked(corpus, queries, 5))
    assert got == want
    assert want  # the per-pair path must not have crashed under ANSI
    ids_seen = {t[2] for t in got} | {t[0] for t in got}
    assert "doc-zz" not in ids_seen

    # ragged query vector: skipped, never a driver crash
    ragged = spark.createDataFrame(
        [("doc-00", rows[0][1]), ("junk", [1.0, 2.0])],
        "vec_id string, embedding array<double>")
    out = cosine_topk_blocked(corpus, ragged, 3).collect()
    assert {r["query_id"] for r in out} == {"doc-00"}


def test_check_fresh_probes_relocated_artifact_for_drop_marker(
        spark, sf_dir, tmp_path):
    """A copied/moved artifact tree carries a sidecar recording its
    ORIGINAL path; the half-drop marker must be probed where the data
    actually lives, so a crashed drop in the RELOCATED tree is still
    detected (and a read-only legacy artifact still loads — adoption
    is best-effort)."""
    import shutil as _sh

    from quasdb_spark.operators import quantizer as QZ

    e = load_table(spark, sf_dir, "embeddings")
    fp = QZ.corpus_fingerprint(
        str(__import__("os").path.join(sf_dir, "embeddings.parquet")))
    root_a = str(tmp_path / "cacheA")
    cents = QZ.get_or_train(e, 4, fingerprint=fp, root=root_a)
    lists = QZ.get_or_build_lists(e, cents, fingerprint=fp,
                                  n_clusters=4, root=root_a)
    QZ.check_fresh(lists, fp)  # fresh at origin: passes
    key = QZ._key(fp, 4, 2, None, 6)
    src = QZ.lists_path(key, root_a)
    # relocate the whole tree and simulate a crashed drop there
    root_b = str(tmp_path / "cacheB")
    dst = QZ.lists_path(key, root_b)
    _sh.copytree(src, dst)
    open(__import__("os").path.join(dst, QZ._DROP_MARKER), "w").close()
    relocated = spark.read.schema(QZ._LISTS_SCHEMA).parquet(dst)
    with pytest.raises(QZ.StaleIndexError, match="drop in progress"):
        QZ.check_fresh(relocated, fp)


def test_ensure_meta_adoption_is_best_effort(monkeypatch, tmp_path):
    """Loading a legacy artifact from a location where the sidecar
    cannot be written (read-only mount) must not crash — the guard
    just can't enforce on it, as before stamping existed."""
    from quasdb_spark.operators import quantizer as QZ

    d = str(tmp_path / "legacy")
    __import__("os").makedirs(d)

    def boom(path, meta):
        raise OSError("read-only file system")

    monkeypatch.setattr(QZ, "_write_artifact_meta", boom)
    meta = QZ._ensure_meta(d, "fp123", "key123")
    assert meta["fingerprint"] == "fp123" and meta["path"] == d


def test_kmeans_sample_prefilter_matches_exact_topcap(spark):
    """The md5-threshold pre-filter (r13: the sf100 sweep blew
    spark.driver.maxResultSize on TakeOrdered's per-task top-caps of
    full vectors) must return EXACTLY the global md5-ranked top-cap
    sample — identical centroids with and without the above-cap
    branch engaged."""
    import hashlib

    from quasdb_spark.operators.similarity import kmeans_centroids

    rows = [(i, [float(i % 7), float((i * 3) % 5), float(i % 11)])
            for i in range(500)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # cap < corpus: the pre-filter branch engages
    got = {r["c_label"]: r["centroid"] for r in
           kmeans_centroids(df, 4, n_iter=2, sample_cap=50).collect()}
    # reference: exact global top-50 by (md5(id), id), numpy Lloyd via
    # the same public API on JUST those rows (cap == corpus -> no
    # branch, the historical exact path)
    ranked = sorted(rows, key=lambda r: (hashlib.md5(
        str(r[0]).encode()).hexdigest(), r[0]))[:50]
    ref_df = spark.createDataFrame(ranked,
                                   "vec_id long, embedding array<double>")
    want = {r["c_label"]: r["centroid"] for r in
            kmeans_centroids(ref_df, 4, n_iter=2,
                             sample_cap=50).collect()}
    assert got == want


def test_ivf_assign_blocked_matches_sql_assign(spark, sf_dir):
    """The maintenance assigner (one BLAS matmul per Arrow batch,
    chunked) must reproduce the SQL crossJoin+max_by assignment on
    real data — same labels for every vector, vec/vec_norm intact.
    (Tie-break: argmax over ascending-label rows == max cosine then
    lowest c_label.)"""
    from quasdb_spark.operators.similarity import (ivf_assign,
                                                   ivf_assign_blocked,
                                                   kmeans_centroids)

    e = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_centroids(e, 10, n_iter=2)
    sql_rows = {r["vec_id"]: (r["list_label"], r["vec_norm"])
                for r in ivf_assign(e, cents).collect()}
    blk = ivf_assign_blocked(e, cents, max_cells=997).collect()
    assert len(blk) == len(sql_rows)
    for r in blk:
        lbl, nrm = sql_rows[r["vec_id"]]
        assert r["list_label"] == lbl, r["vec_id"]
        assert r["vec_norm"] == pytest.approx(nrm, rel=1e-12)


def test_shape_broken_index_triggers_retune_not_silent_shuffle(
        spark, sf_dir, tmp_path):
    """VERDICT r13 #1 pin: a materialized index whose average list has
    outgrown the cap must NOT be probed as-is (at sf100 that shape
    shuffled 8e9 candidate rows and spilled the disk dry). The search
    path's own maintenance tick either retunes (maintenance='auto',
    the default) or refuses loudly (maintenance='error') — and a
    HEALTHY index passes with zero artifact writes."""
    import os

    from quasdb_spark.operators import quantizer as QZ
    from quasdb_spark.operators.similarity import kmeans_centroids

    root = str(tmp_path / "art")
    e = load_table(spark, sf_dir, "embeddings")
    n = e.count()
    q = e.where(F.col("vec_id") % 100 == 0)
    cents = QZ.get_or_train(e, 2, fingerprint="shape", n_iter=2,
                            root=root)
    lists = QZ.get_or_build_lists(e, cents, fingerprint="shape",
                                  n_clusters=2, root=root)
    meta = lists._quasdb_ivf_meta
    assert meta["n_vectors"] == n and meta["params"]["n_clusters"] == 2

    # healthy (default cap): no retune, sidecar untouched
    path = meta["path"]
    before = os.path.getmtime(os.path.join(path, QZ._META_NAME))
    res = QZ.ensure_tuned(cents, lists)
    assert res["retuned"] is False
    assert os.path.getmtime(os.path.join(path, QZ._META_NAME)) == before

    # error mode: loud refusal naming the blowup
    with pytest.raises(QZ.StaleIndexError, match="SHAPE-BROKEN"):
        ivf_topk(e, q, 5, nprobe=2, centroids=cents, lists=lists,
                 maintenance="error", max_avg_list_rows=8)

    # auto (default): the query retunes to ~isqrt(n) and still answers
    got = ivf_topk(e, q, 5, nprobe=2, centroids=cents, lists=lists,
                   max_avg_list_rows=8)
    assert got.count() == q.count() * 5
    import math
    key2 = QZ._key("shape", max(math.isqrt(n), 3), 2, None, 6)
    meta2 = QZ.read_artifact_meta(QZ.lists_path(key2, root))
    assert meta2 is not None and "retune" in meta2["ops"]
    # audit trail on the old artifact points at the retuned key
    assert QZ.read_artifact_meta(path)["retuned_to"] == key2
    # retuned search == searching the retuned artifacts directly
    cents2 = QZ.get_or_train(e, max(math.isqrt(n), 3),
                             fingerprint="shape", root=root)
    lists2 = QZ.get_or_build_lists(e, cents2, fingerprint="shape",
                                   n_clusters=max(math.isqrt(n), 3),
                                   root=root)
    direct = sorted(map(tuple, ivf_topk(
        e, q, 5, nprobe=2, centroids=cents2, lists=lists2).collect()))
    assert sorted(map(tuple, got.collect())) == direct
    # the retune is idempotent: second auto query reuses the artifact
    m2time = os.path.getmtime(os.path.join(QZ.lists_path(key2, root),
                                           QZ._META_NAME))
    ivf_topk(e, q, 5, nprobe=2, centroids=cents, lists=lists,
             max_avg_list_rows=8).count()
    assert os.path.getmtime(os.path.join(QZ.lists_path(key2, root),
                                         QZ._META_NAME)) == m2time


def test_ivfpq_auto_retune_keeps_codes_valid(spark, sf_dir, tmp_path):
    """ivfpq's coarse retune touches only centroids+lists; the PQ
    codes are per-vector and stay valid — the retuned search runs and
    returns k rows per query with scores from the SAME codebooks."""
    from quasdb_spark.operators import quantizer as QZ
    from quasdb_spark.operators.similarity import ivfpq_topk

    root = str(tmp_path / "art")
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") % 100 == 0)
    cents = QZ.get_or_train(e, 2, fingerprint="pqshape", n_iter=2,
                            root=root)
    lists = QZ.get_or_build_lists(e, cents, fingerprint="pqshape",
                                  n_clusters=2, root=root)
    cbs = QZ.get_or_train_pq(e, fingerprint="pqshape", m=4, k=8,
                             dims=64, root=root)
    codes = QZ.get_or_build_codes_array(e, cbs, fingerprint="pqshape",
                                        m=4, k=8, dims=64, root=root)
    got = ivfpq_topk(e, q, 5, nprobe=2, centroids=cents, lists=lists,
                     codebooks=cbs, codes=codes, max_avg_list_rows=8)
    assert got.count() == q.count() * 5
    assert got.schema["score_adc"].dataType.typeName() == "double"


def test_ensure_tuned_auto_retunes_legacy_paramless_artifact(
        spark, sf_dir, tmp_path):
    """ADVICE r14 #1: a pre-r14 artifact (sidecar without ``params``)
    whose shape breaks the cap must NOT hard-fail under the default
    maintenance='auto' — a previously-working slow search keeps
    working after upgrade; the retune falls back to the observed
    shape plus the module's default hyperparameters. mode='error'
    still refuses loudly."""
    import json
    import os

    from quasdb_spark.operators import quantizer as QZ

    QZ.clear_cache()
    root = str(tmp_path / "art")
    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") % 100 == 0)
    cents = QZ.get_or_train(e, 2, fingerprint="legacy", n_iter=2,
                            root=root)
    lists = QZ.get_or_build_lists(e, cents, fingerprint="legacy",
                                  n_clusters=2, root=root)
    # strip the r14 param stamp to simulate a pre-r14 sidecar
    path = lists._quasdb_ivf_meta["path"]
    side = os.path.join(path, QZ._META_NAME)
    with open(side) as f:
        meta = json.load(f)
    meta.pop("params", None)
    meta.pop("n_vectors", None)
    meta.pop("n_clusters_observed", None)
    with open(side, "w") as f:
        json.dump(meta, f)
    lists = QZ._stamp(
        spark.read.schema(QZ._LISTS_SCHEMA).parquet(path),
        QZ.read_artifact_meta(path))

    with pytest.raises(QZ.StaleIndexError, match="SHAPE-BROKEN"):
        QZ.ensure_tuned(cents, lists, mode="error",
                        max_avg_list_rows=8)
    res = QZ.ensure_tuned(cents, lists, mode="auto",
                          max_avg_list_rows=8)
    assert res["retuned"] is True
    assert res["n_clusters"] >= math.isqrt(res["n_vectors"])
    assert res["n_clusters_before"] == 2
    # and the full search path answers through it
    got = ivf_topk(e, q, 5, nprobe=2, centroids=cents, lists=lists,
                   max_avg_list_rows=8)
    assert got.count() == q.count() * 5


def test_rescale_nprobe_budget_bounded():
    """ADVICE r14 #2: after a retune the caller's nprobe is scaled to
    keep the probed corpus fraction comparable — but only up to the
    candidate budget the caller's nprobe would buy on a just-healthy
    index (full proportionality would re-create the row blowup the
    retune exists to kill)."""
    from quasdb_spark.operators.similarity import _rescale_nprobe

    # no retune: untouched
    assert _rescale_nprobe(2, {"retuned": False}) == 2
    assert _rescale_nprobe(2, {"retuned": True,
                               "n_clusters_before": None}) == 2
    # the sf100 shape: n=2M, nlist 10 -> 1414, cap 65536, nprobe 2.
    # proportional would be 283 (preserves the broken index's 400k
    # candidates/query); the budget bound 2*65536/avg_list' = 92
    # wins: ~1/15 probed fraction, ~130k candidates.
    t = {"retuned": True, "n_clusters_before": 10, "n_clusters": 1414,
         "n_vectors": 2_000_000, "cap": 65536}
    assert _rescale_nprobe(2, t) == 92
    # tiny corpus, small cap: budget collapses below nprobe -> the
    # caller's nprobe is kept (never shrunk)
    t = {"retuned": True, "n_clusters_before": 2, "n_clusters": 22,
         "n_vectors": 500, "cap": 8}
    assert _rescale_nprobe(2, t) == 2
    # generous cap: proportional is the binding bound
    t = {"retuned": True, "n_clusters_before": 10, "n_clusters": 40,
         "n_vectors": 1000, "cap": 65536}
    assert _rescale_nprobe(2, t) == 8
    # never exceeds the new nlist
    t = {"retuned": True, "n_clusters_before": 1, "n_clusters": 4,
         "n_vectors": 10, "cap": 65536}
    assert _rescale_nprobe(3, t) <= 4


def test_ivf_assign_blocked_ragged_batch_raises(spark):
    """ADVICE r14 #3: a null or wrong-dimension embedding must fail
    the blocked assigner LOUDLY, naming the offending ids — silently
    skipping dropped the whole Arrow batch (valid vectors included)
    from the built artifact."""
    from quasdb_spark.operators.similarity import ivf_assign_blocked

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "c_label long, centroid array<double>")
    good = spark.createDataFrame(
        [(1, [1.0, 0.1]), (2, [0.1, 1.0])],
        "vec_id long, embedding array<double>")
    out = ivf_assign_blocked(good, cents).collect()
    assert {r["vec_id"] for r in out} == {1, 2}

    bad_null = spark.createDataFrame(
        [(1, [1.0, 0.1]), (7, None), (2, [0.1, 1.0])],
        "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="ragged.*7|7.*ragged"):
        ivf_assign_blocked(bad_null, cents).collect()

    bad_len = spark.createDataFrame(
        [(1, [1.0, 0.1]), (9, [1.0]), (2, [0.1, 1.0])],
        "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="ragged"):
        ivf_assign_blocked(bad_len, cents).collect()


def test_concurrent_ensure_tuned_single_winner(spark, sf_dir, tmp_path):
    """VERDICT r14 board #6: two handles hitting the same shape-broken
    artifact concurrently both retune toward the same keyed path; the
    CAS sidecar discipline makes the race harmless (last writer wins,
    both artifacts valid, no torn sidecar) and both callers get a
    servable retuned index."""
    import threading

    from quasdb_spark.operators import quantizer as QZ

    QZ.clear_cache()
    root = str(tmp_path / "art")
    e = load_table(spark, sf_dir, "embeddings")
    cents = QZ.get_or_train(e, 2, fingerprint="race", n_iter=2,
                            root=root)
    lists = QZ.get_or_build_lists(e, cents, fingerprint="race",
                                  n_clusters=2, root=root)
    path = lists._quasdb_ivf_meta["path"]

    results, errors = [], []

    def worker():
        try:
            # each worker re-reads its own stamped frame (two handles)
            QZ.clear_cache()
            mylists = QZ._stamp(
                spark.read.schema(QZ._LISTS_SCHEMA).parquet(path),
                QZ.read_artifact_meta(path))
            results.append(QZ.ensure_tuned(cents, mylists,
                                           fingerprint="race",
                                           max_avg_list_rows=8))
        except Exception as ex:  # pragma: no cover - the assert target
            errors.append(ex)

    ts = [threading.Thread(target=worker) for _ in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errors, errors
    assert all(r["retuned"] for r in results)
    assert len({r["n_clusters"] for r in results}) == 1
    # the retuned sidecar is intact (readable JSON, retune recorded)
    key2 = results[0]["lists"]._quasdb_ivf_meta["key"]
    meta2 = QZ.read_artifact_meta(QZ.lists_path(key2, root))
    assert meta2 is not None and "retune" in meta2.get("ops", [])
    # both callers' retuned frames answer identically
    a = sorted(map(tuple, results[0]["lists"]
                   .select("vec_id", "list_label").collect()))
    b = sorted(map(tuple, results[1]["lists"]
                   .select("vec_id", "list_label").collect()))
    assert a == b
    # the old artifact's audit trail survived the race
    assert QZ.read_artifact_meta(path).get("retuned_to") == key2


def test_ensure_tuned_memo_skips_consult(spark, sf_dir, tmp_path):
    """VERDICT r14 board #7: a healthy verdict is memoized per
    (artifact path, sidecar mtime) — the second query against the
    same artifact returns without consulting the stamped meta at all
    (observable: tampering the in-memory meta does not change the
    verdict while the sidecar mtime is unchanged), and any sidecar
    rewrite invalidates the memo."""
    import os

    from quasdb_spark.operators import quantizer as QZ

    QZ.clear_cache()
    root = str(tmp_path / "art")
    e = load_table(spark, sf_dir, "embeddings")
    cents = QZ.get_or_train(e, 4, fingerprint="memo", n_iter=2,
                            root=root)
    lists = QZ.get_or_build_lists(e, cents, fingerprint="memo",
                                  n_clusters=4, root=root)
    r1 = QZ.ensure_tuned(cents, lists)
    assert r1["retuned"] is False and r1["n_vectors"] == 500
    # memo hit: tamper the stamped meta — verdict must come from the
    # memo, not the dict (sidecar mtime unchanged)
    lists._quasdb_ivf_meta["n_vectors"] = 10 ** 9
    r2 = QZ.ensure_tuned(cents, lists)
    assert r2["n_vectors"] == 500
    # a sidecar rewrite (append/retune/adopt) invalidates the memo
    path = lists._quasdb_ivf_meta["path"]
    meta = QZ.read_artifact_meta(path)
    meta["n_vectors"] = 123
    QZ._write_artifact_meta(path, meta)
    fresh = QZ._stamp(
        spark.read.schema(QZ._LISTS_SCHEMA).parquet(path),
        QZ.read_artifact_meta(path))
    r3 = QZ.ensure_tuned(cents, fresh)
    assert r3["n_vectors"] == 123
