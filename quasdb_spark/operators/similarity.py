"""Similarity search over embedding columns (charter extension —
no reference counterpart, SURVEY.md §2.7).

Brute-force cosine top-k as the exact baseline, and a bucketed variant
as the approximate scale path. Vector math uses built-in higher-order
functions (zip_with + aggregate) in double precision — JVM-side, no
Python UDF, sequential left-fold summation so results are reproducible.

Scale design (billions of vectors):
- brute-force: broadcast the (small) query set, score map-side, then
  per-query top-k via window — shuffle carries only candidates;
- bucketed (LSH/IVF shape): assign each vector to a bucket key map-side,
  score only within the probe's bucket(s). The bucket function here is
  sign-bits of leading dimensions (deterministic); swap in random
  hyperplanes or k-means centroids (IVF) for production recall — the
  plumbing (bucket column, per-bucket topk) is identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from quasdb_spark.operators.dedup import drop_hot_buckets
from quasdb_spark.plans.parallel import ensure_parallelism


# SQL-text twins of the fold expressions below. Building a fold through
# the Column API costs ~30 py4j round-trips (each HOF lambda is its own
# gateway exchange); parsing the same expression as ONE F.expr string is
# a single round-trip and yields the IDENTICAL Catalyst tree (same
# lambda structure, same double-typed zero via the cast, which
# constant-folds to the same Literal(0.0d)) — so results are
# bit-identical while DataFrame CONSTRUCTION drops ~10x. Measured:
# ivfpq_topk construction 1.59 s -> this is the dominant term of every
# warm sim_* query at demo scale, and pure serial driver time at any
# scale. The str overloads below take a SQL expression SNIPPET (column
# name or rendered expression), not a quoted identifier.
_DOT_SQL = ("aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
            "cast(0.0 as double), (acc, v) -> acc + v)")
_NORM_SQL = ("sqrt(aggregate({a}, cast(0.0 as double), "
             "(acc, v) -> acc + v * v))")


def _dot_sql(a: str, b: str) -> str:
    return _DOT_SQL.format(a=a, b=b)


def _norm_sql(a: str) -> str:
    return _NORM_SQL.format(a=a)


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product in double (deterministic)."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(_dot_sql(a, b))
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column | str) -> Column:
    if isinstance(a, str):
        return F.expr(_norm_sql(a))
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _as_double(col: str) -> Column:
    return F.col(col).cast("array<double>")


def _adq(col: str) -> str:
    """SQL text of ``_as_double``: the cast rendered as a snippet for
    the string fast paths above (identical Cast node once parsed)."""
    return f"cast(`{col}` as array<double>)"


def cosine_topk(vectors: DataFrame, queries: DataFrame, k: int, *,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str | None = None) -> DataFrame:
    """Exact top-k neighbors per query by cosine similarity.

    ``queries`` is expected to be small → broadcast; scoring is a
    map-side nested loop over broadcast queries (no shuffle of the
    corpus), then one window per query for top-k.
    """
    qid = query_id_col or id_col
    # norms once per row, not per pair (identical float arithmetic —
    # same expression on the same input — at 1/3 the per-pair work).
    # Zero-norm vectors are EXCLUDED on both sides: cosine is
    # undefined for them, and under ANSI mode (Spark 4 default) the
    # 0/0 division would otherwise kill the whole job for one
    # degenerate row. cosine_topk_blocked shares this contract.
    q = queries.select(F.col(qid).alias("query_id"),
                       _as_double(vec_col).alias("_qv"),
                       norm(_adq(vec_col)).alias("_qn")) \
               .where(F.col("_qn") > 0)
    v = vectors.select(F.col(id_col).alias("neighbor_id"),
                       _as_double(vec_col).alias("_vv"),
                       norm(_adq(vec_col)).alias("_vn")) \
               .where(F.col("_vn") > 0)
    scored = (F.broadcast(q).crossJoin(v)
              .where(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("score", dot("_qv", "_vv")
                          / (F.col("_qn") * F.col("_vn"))))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("query_id", "rank", "neighbor_id",
                          (F.round("score", 4) + F.lit(0.0)).alias("score")))


def cosine_topk_blocked(vectors: DataFrame, queries: DataFrame, k: int, *,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        query_id_col: str | None = None) -> DataFrame:
    """Exact top-k neighbors per query by cosine — the BLOCKED
    brute-force scan (FAISS IndexFlat shape): same results as
    ``cosine_topk``, built for the regime where both the corpus and
    the query set are large and the per-pair crossJoin fold becomes
    the bottleneck (measured 100x data: the per-pair path is
    ~170 s on local[32]; this path is the same math as a handful of
    vectorized numpy passes per Arrow batch).

    Scale shape: the query set collects to a q × d float64 matrix on
    the driver and ships once per task (the same driver-bounded
    contract as the broadcast hash join in ``cosine_topk`` — the
    query set is the probe workload, never the corpus). The corpus
    NEVER shuffles: ``mapInPandas`` scores each Arrow batch as d
    fused multiply-add passes over a b × q block, keeps a per-batch
    candidate superset (everything >= the per-query k-th score), and
    emits exactly top-k per query per PARTITION — k·q rows per
    partition, so the final global window ranks
    (n_partitions × q × k) rows, never the corpus.

    Bit-parity with the declarative path (pinned row-for-row in
    tests, ties included): scores and norms accumulate per-DIMENSION
    in index order — the identical IEEE-754 add sequence as the
    sequential ``F.aggregate`` fold in ``dot``/``norm`` — and the
    denominator multiplies in the same (qn · vn) order, so
    full-precision doubles agree exactly and the (score DESC,
    neighbor_id ASC) ranking cannot diverge.

    Zero-norm vectors are excluded on both sides — the same contract
    as ``cosine_topk`` (cosine is undefined for them; scoring one
    would be a 0/0 that ANSI mode turns into a job failure). Rows
    with a NULL / wrong-length vector are dropped; a NULL /
    wrong-length QUERY vector is skipped rather than crashing the
    driver (the per-pair path would give it NULL scores — the one
    documented deviation).

    Ids may be any Spark type (string hashes, UUIDs, longs): the
    output schema reuses the input id types, and ranking tie-breaks
    compare ids with their native ordering."""
    import numpy as np
    import pandas as pd

    qid = query_id_col or id_col
    q_rows = (queries.select(F.col(qid).alias("query_id"),
                             _as_double(vec_col).alias("_qv"))
              .where(F.col("_qv").isNotNull()).collect())
    out_cols = ("query_id", "rank", "neighbor_id", "score")
    spark = vectors.sparkSession
    qid_dt = queries.schema[qid].dataType.simpleString()
    nid_dt = vectors.schema[id_col].dataType.simpleString()
    out_schema = (f"query_id {qid_dt}, rank int, "
                  f"neighbor_id {nid_dt}, score double")
    cand_schema = (f"query_id {qid_dt}, neighbor_id {nid_dt}, "
                   "score double")
    if q_rows:
        # dims = the dominant query vector length; stragglers of any
        # OTHER length are skipped (documented deviation), never crash
        # the driver with a ragged np.array
        from collections import Counter

        dims = Counter(len(r["_qv"]) for r in q_rows).most_common(1)[0][0]
        q_rows = [r for r in q_rows
                  if len(r["_qv"]) == dims
                  and any(x != 0.0 for x in r["_qv"])]
    if not q_rows:
        return (spark.createDataFrame([], out_schema)
                .select(*out_cols))
    q_ids = np.array([r["query_id"] for r in q_rows])
    Q = np.array([list(r["_qv"]) for r in q_rows], dtype=np.float64)
    nq = len(q_ids)

    def _seq_norm(M: "np.ndarray") -> "np.ndarray":
        # sqrt(((0 + x0*x0) + x1*x1) + ...) — norm()'s exact fold order
        acc = np.zeros(M.shape[0], dtype=np.float64)
        for d in range(M.shape[1]):
            acc = acc + M[:, d] * M[:, d]
        return np.sqrt(acc)

    qn = _seq_norm(Q)
    kk = int(k)
    # Bound the transient score block: S and its scratch are each
    # (rows x nq) float64 — an UNCHUNKED Arrow batch at nq=20k and
    # b=10k is ~1.6 GB PER ARRAY PER WORKER, which OOM-killed the
    # whole JVM at the sf100 (1000x) sweep: 32 workers x 2 arrays on
    # top of the 24g heap. ~8M cells keeps the pair under ~128 MB per
    # worker at ANY query-set size; correctness is untouched because
    # each chunk contributes a candidate SUPERSET (>= its own per-
    # query kth) and the exact top-k reduction runs over the union.
    row_chunk = max(64, 8_000_000 // max(nq, 1))
    # ... and bound the accumulated candidates too: at corpus scale a
    # partition can hold hundreds of chunks x O(k x nq) entries —
    # reduce to the exact running top-k whenever the union grows past
    # this (the reduction is the same total order as the final one,
    # so intermediate reduces never change the result).
    cand_cap = 4_000_000

    def _topk(cq, ci, cs):
        # exact per-query top-k by the total order (score DESC, id
        # ASC); object-dtype ids (strings) compare natively
        order = np.lexsort((ci, -cs, cq))
        cq, ci, cs = cq[order], ci[order], cs[order]
        grp = np.r_[True, cq[1:] != cq[:-1]]
        starts = np.nonzero(grp)[0]
        sizes = np.diff(np.r_[starts, len(cq)])
        rank = np.arange(len(cq)) - np.repeat(starts, sizes)
        keep = rank < kk
        return cq[keep], ci[keep], cs[keep]

    def _score_partition(batches):
        cand_q, cand_i, cand_s = [], [], []
        n_cand = 0
        tmp = None
        for pdf in batches:
            pdf = pdf[pdf["_vv"].notna()]
            if not len(pdf):
                continue
            vecs = [np.asarray(x, dtype=np.float64)
                    for x in pdf["_vv"].values]
            keep = [i for i, v in enumerate(vecs) if v.shape == (dims,)]
            if not keep:
                continue
            if len(keep) != len(vecs):
                pdf = pdf.iloc[keep]
                vecs = [vecs[i] for i in keep]
            V_all = np.stack(vecs)
            ids_all = pdf["neighbor_id"].to_numpy()
            vn_all = _seq_norm(V_all)
            nz = vn_all > 0                  # zero-norm: excluded
            if not nz.all():
                V_all, ids_all, vn_all = \
                    V_all[nz], ids_all[nz], vn_all[nz]
                if not len(ids_all):
                    continue
            for s0 in range(0, len(ids_all), row_chunk):
                V = V_all[s0:s0 + row_chunk]
                ids = ids_all[s0:s0 + row_chunk]
                vn = vn_all[s0:s0 + row_chunk]
                b = len(ids)
                S = np.zeros((b, nq), dtype=np.float64)
                if tmp is None or tmp.shape[0] < b:
                    tmp = np.empty((b, nq), dtype=np.float64)
                t = tmp[:b]
                for d in range(dims):
                    # ((0 + p0) + p1) + ... — dot()'s exact fold order
                    np.multiply(V[:, d, None], Q[None, :, d], out=t)
                    S += t
                S /= np.multiply(vn[:, None], qn[None, :], out=t)
                # self-pairs and zero-norm rows (NaN) are excluded by
                # the finite mask — the cosine_topk contract
                S[ids[:, None] == q_ids[None, :]] = -np.inf
                kth = min(kk, b)
                with np.errstate(invalid="ignore"):
                    thresh = -np.partition(-S, kth - 1, axis=0)[kth - 1]
                    mask = (S >= thresh[None, :]) & np.isfinite(S)
                rows, cols = np.nonzero(mask)
                cand_q.append(q_ids[cols])
                cand_i.append(ids[rows])
                cand_s.append(S[rows, cols])
                n_cand += len(rows)
                if n_cand > cand_cap:
                    cq, ci, cs = _topk(np.concatenate(cand_q),
                                       np.concatenate(cand_i),
                                       np.concatenate(cand_s))
                    cand_q, cand_i, cand_s = [cq], [ci], [cs]
                    n_cand = len(cq)
        if not cand_q:
            return
        cq, ci, cs = _topk(np.concatenate(cand_q),
                           np.concatenate(cand_i),
                           np.concatenate(cand_s))
        yield pd.DataFrame({"query_id": cq, "neighbor_id": ci,
                            "score": cs})

    src = vectors.select(F.col(id_col).alias("neighbor_id"),
                         _as_double(vec_col).alias("_vv"))
    cands = src.mapInPandas(_score_partition, schema=cand_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc())
    return (cands.withColumn("rank", F.row_number().over(w))
                 .where(F.col("rank") <= k)
                 .select("query_id", "rank", "neighbor_id",
                         (F.round("score", 4) + F.lit(0.0)).alias("score")))


def sign_bucket(vec_col: str = "embedding", n_bits: int = 8) -> Column:
    """Leading-dimension sign bits — the cheap axis-aligned bucket
    (kept for tests/compat; ``hyperplane_bucket`` is the real LSH)."""
    v = _as_double(vec_col)
    return F.concat(*[
        F.when(F.element_at(v, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(n_bits)])


def hyperplane_signs(n_bits: int, dims: int, seed: int = 0) -> list[list[float]]:
    """Deterministic ±1 random-hyperplane entries (md5-derived), shared
    verbatim between the Spark expression and the DuckDB oracle (the
    weights are inlined as literals on both sides)."""
    import hashlib

    return [[1.0 if int(hashlib.md5(
                f"hp:{seed}:{j}:{i}".encode()).hexdigest()[0], 16) < 8
             else -1.0
             for i in range(dims)]
            for j in range(n_bits)]


def _plane_proj_sql(v_sql: str, w: list[float]) -> str:
    """SQL text of one ±1-plane projection fold: identical tree to the
    Column-API ``aggregate(zip_with(v, ws, x*s), 0.0d, acc+t)`` form
    (the D suffix makes every sign a DoubleType literal, matching
    F.lit(±1.0)), at one py4j round-trip per PLANE instead of one per
    literal."""
    lits = ", ".join("1.0D" if x > 0 else "-1.0D" for x in w)
    return (f"aggregate(zip_with({v_sql}, array({lits}), "
            f"(x, s) -> x * s), cast(0.0 as double), (acc, t) -> acc + t)")


def _plane_bit_sql(v_sql: str, w: list[float]) -> str:
    return (f"(CASE WHEN {_plane_proj_sql(v_sql, w)} >= 0 "
            f"THEN '1' ELSE '0' END)")


def hyperplane_bucket(vec_col: str = "embedding", n_bits: int = 8, *,
                      dims: int = 64, seed: int = 0) -> Column:
    """SimHash-for-vectors bucket: sign of the projection onto
    ``n_bits`` deterministic ±1 hyperplanes (Charikar rounding — the
    real LSH family for cosine, P[bits agree] = 1 - angle/pi). Pure
    sequential-fold expressions: map-only, JVM-side, cross-engine
    reproducible.

    Bit ``j`` depends only on (seed, j, dims) — never on ``n_bits`` —
    so ``hyperplane_bucket(c, m)`` is always a prefix of
    ``hyperplane_bucket(c, n)`` for m < n (what lets callers pick
    n_bits per corpus size without re-deriving the hash family).

    A NON-NULL vector whose length != ``dims`` RAISES (assert_true in
    the expression). Silently zip-padding instead would hash every
    vector to the all-'0' bucket, which a downstream max_bucket_size
    guard then silently drops — 0 recall with no error. A NULL vector
    hashes to a NULL bucket (dropped by the downstream equi-join on
    bucket), NOT a job failure: one bad row shouldn't kill a 100 TB
    scan, and size(NULL) would otherwise feed NULL into the assert."""
    v = _as_double(vec_col)
    guard = F.assert_true(
        F.size(v) == dims,
        F.format_string(
            "hyperplane_bucket: vector length %s != dims " + str(dims),
            F.size(v)))
    # Per-plane folds, NOT a single fold over a transposed sign
    # matrix: a literal matrix referenced inside an interpreted HOF
    # lambda is re-evaluated per fold step (dims × n_bits × dims
    # literal evals per row — measured 10x slower per row than this
    # form, which evaluates each plane's literals once per bit).
    # The whole bit string parses as ONE SQL expression (see the
    # _DOT_SQL note): n_bits×dims literal Columns took ~1 py4j round
    # trip each to construct; the parsed tree is identical.
    bits = F.expr("concat(" + ", ".join(
        _plane_bit_sql(_adq(vec_col), w) for w in
        hyperplane_signs(n_bits, dims, seed)) + ")")
    return F.when(v.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(guard.isNull(), bits))


def bucketed_topk(vectors: DataFrame, queries: DataFrame, k: int, *,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  n_bits: int = 8, hyperplanes: bool = True,
                  dims: int = 64, seed: int = 0,
                  probe_hamming: int = 0) -> DataFrame:
    """Approximate top-k: score only vectors in the query's bucket.

    The bucket equality join replaces the cross join — shuffle/compare
    volume drops by ~2^n_bits. Same output contract as cosine_topk
    (rank within bucket). Buckets are random-hyperplane sign bits
    (Charikar LSH) by default; ``hyperplanes=False`` falls back to the
    cheaper axis-aligned leading-dim signs.

    ``probe_hamming=1`` is classic multiprobe LSH: each query also
    probes every bucket one bit-flip away (n_bits+1 probes), catching
    neighbors that fell just across a hyperplane — recall rises
    steeply for ~(n_bits+1)× the candidate volume, which is still
    2^n_bits/(n_bits+1) cheaper than exact. The probe fan-out explodes
    the QUERY side only (broadcast-tiny); vector buckets partition the
    corpus, so a neighbor is seen at most once — no dedup stage.
    """
    def bucket():
        if hyperplanes:
            return hyperplane_bucket(vec_col, n_bits, dims=dims, seed=seed)
        return sign_bucket(vec_col, n_bits)

    if probe_hamming not in (0, 1):
        raise ValueError("probe_hamming supports 0 (exact bucket) or 1 "
                         "(all one-bit-flip probes)")
    q = queries.select(F.col(id_col).alias("query_id"),
                       _as_double(vec_col).alias("_qv"),
                       norm(_adq(vec_col)).alias("_qn"),
                       bucket().alias("_b0"))
    if probe_hamming == 1:
        def flip(i: int) -> Column:
            c = F.substring("_b0", i + 1, 1)
            return F.concat(
                F.substring("_b0", 1, i),
                F.when(c == "1", F.lit("0")).otherwise(F.lit("1")),
                F.substring("_b0", i + 2, n_bits - i - 1))
        probes = F.array(F.col("_b0"), *[flip(i) for i in range(n_bits)])
        q = q.withColumn("_bucket", F.explode(probes)).drop("_b0")
    else:
        q = q.withColumnRenamed("_b0", "_bucket")
    v = vectors.select(F.col(id_col).alias("neighbor_id"),
                       _as_double(vec_col).alias("_vv"),
                       norm(_adq(vec_col)).alias("_vn"),
                       bucket().alias("_bucket"))
    scored = (F.broadcast(q).join(v, "_bucket")
              .where(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("score", dot("_qv", "_vv")
                          / (F.col("_qn") * F.col("_vn"))))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("query_id", "rank", "neighbor_id",
                          (F.round("score", 4) + F.lit(0.0)).alias("score")))


def neardup_pairs_cosine(vectors: DataFrame, *, id_col: str = "vec_id",
                         vec_col: str = "embedding", threshold: float = 0.9,
                         subset_mod: int | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ t),
    EXACT all-pairs variant — O(n²), kept ONLY as the recall oracle for
    tests (tests/test_similarity.py). The production/scale path is
    ``neardup_pairs_banded`` below; do not put this in the suite.

    ``subset_mod`` restricts the left side to ids ≡ 0 (mod m) — a
    harness knob to bound the quadratic cost in tests.
    """
    a = vectors.select(F.col(id_col).alias("id_a"),
                       _as_double(vec_col).alias("_va"))
    if subset_mod:
        a = a.where(F.col("id_a") % subset_mod == 0)
    b = vectors.select(F.col(id_col).alias("id_b"),
                       _as_double(vec_col).alias("_vb"))
    pairs = (F.broadcast(a).crossJoin(b)
             .where(F.col("id_a") < F.col("id_b"))
             .withColumn("score", cosine("_va", "_vb"))
             .where(F.col("score") >= threshold))
    return pairs.select("id_a", "id_b", (F.round("score", 4) + F.lit(0.0)).alias("score"))


def hyperplane_band_keys(vec_col: str, n_bands: int, band_bits: int, *,
                         dims: int = 64, seed: int = 0) -> Column:
    """Array of ``n_bands`` band-key strings — band ``b`` is bits
    ``[b*band_bits, (b+1)*band_bits)`` of ``hyperplane_bucket``'s bit
    string, built DIRECTLY from the per-bit folds so each projection
    is evaluated exactly once per row. Substringing one full signature
    column instead re-inlines the whole n_bands×band_bits expression
    into every band key under CollapseProject — measured 8× the map
    cost at n_bands=8 on the sf0.1 pair finder. Key strings are
    char-identical to the substring path (same bit exprs, same
    grouping), so LSH banding results are unchanged.

    NULL vector → NULL array (posexplode emits no rows — same net
    effect as the bucket string path, where NULL keys never survive
    the band equi-join); a non-NULL wrong-length vector raises."""
    v = _as_double(vec_col)
    guard = F.assert_true(
        F.size(v) == dims,
        F.format_string(
            "hyperplane_band_keys: vector length %s != dims " + str(dims),
            F.size(v)))
    bit_sqls = [_plane_bit_sql(_adq(vec_col), w)
                for w in hyperplane_signs(n_bands * band_bits, dims, seed)]
    bands = F.expr("array(" + ", ".join(
        "concat(" + ", ".join(bit_sqls[b * band_bits:(b + 1) * band_bits])
        + ")" for b in range(n_bands)) + ")")
    return F.when(v.isNull(), F.lit(None).cast("array<string>")).otherwise(
        F.when(guard.isNull(), bands))


def neardup_pairs_banded(vectors: DataFrame, *, id_col: str = "vec_id",
                         vec_col: str = "embedding", threshold: float = 0.9,
                         n_bands: int = 8, band_bits: int = 8,
                         max_bucket_size: int | None = 1000,
                         hyperplanes: bool = True, dims: int = 64,
                         seed: int = 0,
                         vectorized: bool = False,
                         _release_to: list | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded sign-LSH blocking
    (id_a < id_b, cos >= threshold) — the 100 TB-safe path.

    The full sign signature (``n_bands * band_bits`` random-hyperplane
    sign bits, Charikar LSH) is cut into ``n_bands`` bands; two vectors
    become a candidate pair iff they agree on at least one whole band
    (classic banded LSH, same scheme as the MinHash pair-finder). Only candidates
    are scored, so the cross join disappears:

    - bands table: n x n_bands rows of (band, key, id) — map-only;
    - self-equi-join on (band, key): shuffle hash join, quadratic only
      WITHIN a bucket; ``max_bucket_size`` drops degenerate buckets
      (standard LSH skew guard) so a hot key cannot O(n^2) a partition;
    - distinct candidate pairs then join back to the two vectors by id
      and are scored once.

    Recall is the banded-LSH curve 1-(1-p^band_bits)^n_bands with
    p = 1 - angle/pi: ~1.0 for genuine near-dups (cos >= 0.9), dropping
    steeply in the random-similarity regime (cos ~ 0.4 on uniform data)
    — measured on this repo's testdata in tests/test_suite.py; the
    brute-force ``neardup_pairs_cosine`` is the recall oracle there.
    """
    if vectorized:
        if not hyperplanes:
            raise ValueError("vectorized=True requires hyperplanes=True")
        # Arrow/numpy signature pass — bit-identical to the expression
        # fold (see signature_frame_pandas); the production path for
        # real embedding widths (768/1536 dims) where n_bits×dims
        # interpreted fold steps per row stop scaling.
        e = signature_frame_pandas(
            vectors, id_col=id_col, vec_col=vec_col, n_bands=n_bands,
            band_bits=band_bits, dims=dims, seed=seed).persist()
        if _release_to is not None:
            _release_to.append(e)
        return _banded_pairs_from_frame(e, threshold, max_bucket_size)
    if hyperplanes:
        keys = hyperplane_band_keys(vec_col, n_bands, band_bits,
                                    dims=dims, seed=seed)
    else:
        sig = sign_bucket(vec_col, n_bands * band_bits)
        keys = F.array(*[F.substring(sig, b * band_bits + 1, band_bits)
                         for b in range(n_bands)])
    # One pass computes signature keys AND the vector norm; the frame
    # is consumed by three branches (bands, verify-left, verify-right),
    # so persist it — otherwise each branch re-runs the signature/norm
    # projection over the corpus. Norms are computed ONCE per vector
    # here instead of twice per candidate pair inside cosine(): the
    # fold and operand order are unchanged, so scores are bit-identical
    # (measured ~2x on the sf0.1 verify stage; at scale it converts
    # O(pairs) norm folds into O(corpus)).
    e = ensure_parallelism(vectors).select(
        F.col(id_col).alias("_id"), _as_double(vec_col).alias("_v"),
        norm(_adq(vec_col)).alias("_n"),
        keys.alias("_keys")).persist()
    if _release_to is not None:
        _release_to.append(e)
    return _banded_pairs_from_frame(e, threshold, max_bucket_size)


def _banded_pairs_from_frame(e: DataFrame, threshold: float,
                             max_bucket_size: int | None) -> DataFrame:
    """Shared tail of neardup_pairs_banded: (_id, _v, _n, _keys) frame
    → banded candidates → skew-guarded buckets → scored pairs. Both
    the expression and the Arrow-vectorized signature paths feed this
    identically (so they produce identical pairs by construction once
    the signature frames are equal)."""
    bands = e.select("_id", F.posexplode("_keys").alias("_band", "_key"))
    if max_bucket_size is not None:
        bands = drop_hot_buckets(bands, ["_band", "_key"], max_bucket_size)
    a = bands.select(F.col("_id").alias("id_a"), "_band", "_key")
    b = bands.select(F.col("_id").alias("id_b"), "_band", "_key")
    cand = (a.join(b, ["_band", "_key"])
             .where(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b").distinct())
    va = e.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"),
                  F.col("_n").alias("_na"))
    vb = e.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"),
                  F.col("_n").alias("_nb"))
    return (cand.join(va, "id_a").join(vb, "id_b")
                .withColumn("score", dot("_va", "_vb")
                            / (F.col("_na") * F.col("_nb")))
                .where(F.col("score") >= threshold)
                .select("id_a", "id_b",
                        (F.round("score", 4) + F.lit(0.0)).alias("score")))


def semantic_dedup(vectors: DataFrame, *, id_col: str = "vec_id",
                   vec_col: str = "embedding", threshold: float = 0.9,
                   n_bands: int = 8, band_bits: int = 8,
                   max_bucket_size: int | None = 1000, dims: int = 64,
                   seed: int = 0, n_iter: int = 3,
                   vectorized: bool = False) -> DataFrame:
    """Semantic deduplication, SemDeDup-shaped (Abbas et al. 2023,
    arXiv:2303.09540): embeddings whose cosine exceeds ``threshold``
    are semantic duplicates of each other; keep exactly ONE
    representative per duplicate component and drop the rest — the
    embedding-space analogue of MinHash near-dup removal, and the
    step that catches paraphrases exact/shingle methods miss.

    Composition of this repo's scale-safe pieces, end to end:
    banded sign-LSH pair finding (``neardup_pairs_banded`` — no cross
    join, bucket-size skew guard), bounded-round min-label connected
    components (``dedup.cluster_assign`` — 2 shuffles/round, no
    collect), then min-id survivor per component (``cluster_id`` IS
    the survivor id by construction). Deterministic for a fixed seed,
    so a SQL oracle can replay it exactly.

    Returns one row per vector: (id, cluster_id, is_kept, n_members);
    singletons are their own cluster and kept. The drop set is
    ``is_kept = false``; apply with a LEFT ANTI join (cf.
    dedup.exact_dedup / q_dedup_apply).
    """
    from quasdb_spark.operators.dedup import cluster_assign

    owned: list = []
    pairs = neardup_pairs_banded(
        vectors, id_col=id_col, vec_col=vec_col, threshold=threshold,
        n_bands=n_bands, band_bits=band_bits,
        max_bucket_size=max_bucket_size, hyperplanes=True, dims=dims,
        seed=seed, vectorized=vectorized, _release_to=owned)
    labels = cluster_assign(pairs, vectors.select(id_col),
                            id_col=id_col, n_iter=n_iter, release=owned)
    sizes = labels.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"))
    return (labels.join(sizes, "cluster_id")
            .select(id_col, "cluster_id",
                    (F.col(id_col) == F.col("cluster_id")).alias("is_kept"),
                    "n_members"))


def hard_negatives(vectors: DataFrame, k: int = 5, *,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   label_col: str = "label", n_bands: int = 8,
                   band_bits: int = 8,
                   max_bucket_size: int | None = 1000, dims: int = 64,
                   seed: int = 0, vectorized: bool = False,
                   _release_to: list | None = None) -> DataFrame:
    """Contrastive hard-negative mining: for every anchor vector, the
    top-k most-cosine-similar vectors carrying a DIFFERENT label —
    the negatives that sit closest to the decision boundary, which is
    what contrastive/embedding-training pipelines actually sample
    (easy negatives teach nothing; in-batch random negatives are
    mostly easy). Returns (anchor_id, rank, negative_id,
    anchor_label, negative_label, score).

    Scale shape — the same no-cross-join discipline as the pair
    finders: candidates come from banded sign-LSH buckets (map-only
    signature pass, self-equi-join on (band, key), quadratic only
    within a bucket, ``max_bucket_size`` skew guard), the label
    inequality filters candidates BEFORE any scoring join, and the
    per-anchor top-k is a window PARTITIONED BY anchor (never
    global). Mined negatives are bucket-local: a negative whose every
    band differs from the anchor's is invisible — exactly the LSH
    recall curve, and the right trade at 100 TB (those are easy
    negatives anyway).
    """
    if vectorized:
        # Arrow path end to end: the vectorized signature pass (same
        # bit-identical frame semdedup rides) carries the label as a
        # passthrough column, then the bucket-local scorer runs one
        # numpy Gram per (band, key) bucket.
        e = signature_frame_pandas(
            vectors, id_col=id_col, vec_col=vec_col, n_bands=n_bands,
            band_bits=band_bits, dims=dims, seed=seed,
            passthrough={label_col: "_lbl"}).persist()
        if _release_to is not None:
            _release_to.append(e)
        return _hard_negatives_bucketed(e, k, max_bucket_size)
    keys = hyperplane_band_keys(vec_col, n_bands, band_bits,
                                dims=dims, seed=seed)
    e = ensure_parallelism(vectors).select(
        F.col(id_col).alias("_id"), F.col(label_col).alias("_lbl"),
        _as_double(vec_col).alias("_v"),
        norm(_adq(vec_col)).alias("_n"),
        keys.alias("_keys")).persist()
    if _release_to is not None:
        _release_to.append(e)
    bands = e.select("_id", "_lbl",
                     F.posexplode("_keys").alias("_band", "_key"))
    if max_bucket_size is not None:
        bands = drop_hot_buckets(bands, ["_band", "_key"], max_bucket_size)
    a = bands.select(F.col("_id").alias("anchor_id"),
                     F.col("_lbl").alias("anchor_label"), "_band", "_key")
    b = bands.select(F.col("_id").alias("negative_id"),
                     F.col("_lbl").alias("negative_label"),
                     "_band", "_key")
    cand = (a.join(b, ["_band", "_key"])
             .where((F.col("anchor_id") != F.col("negative_id"))
                    & (F.col("anchor_label") != F.col("negative_label")))
             .select("anchor_id", "anchor_label",
                     "negative_id", "negative_label")
             .distinct())
    va = e.select(F.col("_id").alias("anchor_id"),
                  F.col("_v").alias("_va"), F.col("_n").alias("_na"))
    vb = e.select(F.col("_id").alias("negative_id"),
                  F.col("_v").alias("_vb"), F.col("_n").alias("_nb"))
    score_expr = (dot("_va", "_vb")
                  / (F.col("_na") * F.col("_nb")))
    scored = (cand.join(va, "anchor_id").join(vb, "negative_id")
              .withColumn("score", score_expr))
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("score").desc(), F.col("negative_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("anchor_id", "rank", "negative_id", "anchor_label",
                    "negative_label",
                    (F.round("score", 4) + F.lit(0.0)).alias("score")))


def _hard_negatives_bucketed(e: DataFrame, k: int,
                             max_bucket_size: int | None) -> DataFrame:
    """BUCKET-LOCAL Arrow scorer for hard_negatives (VERDICT r9 #2):
    applyInPandas over each (band, key) LSH bucket computes the whole
    bucket's anchor×negative cosine table with ONE dims-sequential
    numpy Gram accumulation, emits each anchor's in-bucket top-k, and
    the global per-anchor top-k window runs over those candidates
    only. Each vector ships through Arrow ONCE PER BUCKET (n_bands
    rows), never once per candidate pair — the r9 per-pair Arrow
    scorer lost its A/B at dims=64 precisely because it shipped both
    64-double arrays per pair (6.99 vs 6.49 s); bucket-local transfer
    is ~|pairs|/|bucket| times smaller.

    BIT-IDENTICAL to the expression fold (pinned by test): the Gram
    loop accumulates G += V[:, i] ⊗ V[:, i] over dims in the fold's
    exact order with the same float64 elementwise ops, then divides
    by the SAME precomputed JVM-side norms (na*nb first), so every
    score — hence every rank at the 4-decimal boundary — is equal.

    In-bucket top-k is lossless for the global top-k: ranks use the
    strict total order (score desc, negative_id asc), and any
    candidate in an anchor's global top-k has fewer than k candidates
    above it globally, hence fewer than k above it in any shared
    bucket — the cosine_topk_pandas partial-top-k argument. Pairs
    sharing several buckets score identically in each, so the
    keep-any dropDuplicates is sound. A zero-norm vector scores
    NaN in numpy where the fold's x/0.0 yields NULL: both are emitted
    as NULL, ordered last, exactly like the fold path's NULLS LAST.
    """
    import numpy as np
    import pandas as pd

    id_t = e.schema["_id"].dataType.simpleString()
    lbl_t = e.schema["_lbl"].dataType.simpleString()
    out_schema = (f"anchor_id {id_t}, anchor_label {lbl_t}, "
                  f"negative_id {id_t}, negative_label {lbl_t}, "
                  f"score double")

    def score_bucket(pdf):
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                {c: [] for c in ("anchor_id", "anchor_label",
                                 "negative_id", "negative_label",
                                 "score")})
        ids = pdf["_id"].to_numpy()
        lbls = pdf["_lbl"].to_numpy()
        ns = pdf["_n"].to_numpy(dtype=np.float64)
        V = np.stack([np.asarray(v, dtype=np.float64)
                      for v in pdf["_v"]])
        # dims-sequential accumulation == the expression fold's float
        # order; do NOT replace with one matmul (pairwise summation
        # differs in the last ulp and can flip a rank boundary)
        G = np.zeros((n, n))
        for i in range(V.shape[1]):
            G = G + V[:, i:i + 1] * V[:, i][None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            S = G / (ns[:, None] * ns[None, :])
        out = {"anchor_id": [], "anchor_label": [], "negative_id": [],
               "negative_label": [], "score": []}
        for a in range(n):
            cand = np.flatnonzero((lbls != lbls[a]) & (ids != ids[a]))
            if not len(cand):
                continue
            s = S[a, cand]
            finite = np.isfinite(s)
            # fold-path order: score desc (NULLS LAST), id asc — rank
            # finite scores first, backfill NaN (→ NULL) by id asc
            fin = cand[finite]
            order = np.lexsort((ids[fin], -s[finite]))
            pick = list(fin[order][:k])
            if len(pick) < k:
                nf = cand[~finite]
                pick += list(nf[np.argsort(ids[nf])][:k - len(pick)])
            for j in pick:
                out["anchor_id"].append(ids[a])
                out["anchor_label"].append(lbls[a])
                out["negative_id"].append(ids[j])
                out["negative_label"].append(lbls[j])
                sc = S[a, j]
                out["score"].append(float(sc) if np.isfinite(sc)
                                    else None)
        return pd.DataFrame(out)

    bands = e.select("_id", "_lbl", "_v", "_n",
                     F.posexplode("_keys").alias("_band", "_key"))
    if max_bucket_size is not None:
        bands = drop_hot_buckets(bands, ["_band", "_key"],
                                 max_bucket_size)
    cands = bands.groupBy("_band", "_key").applyInPandas(
        score_bucket, out_schema)
    # Cross-bucket duplicates of an (anchor, negative) pair are
    # FULL-ROW duplicates (scores are bit-identical in every shared
    # bucket — see the Gram-order note above), so they sort adjacent
    # under (score desc, negative_id asc) within the anchor partition
    # and a lag() spots them. Doing the dedup inside the top-k window
    # replaces a dedicated (anchor_id, negative_id) exchange
    # (dropDuplicates over the full candidate volume) with one lag
    # pass over the already-required anchor partitioning — the
    # rank window reuses the same exchange AND sort (filters preserve
    # sort order), so candidates now cross the network once.
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("score").desc(), F.col("negative_id").asc())
    uniq = (cands.withColumn(
        "_dup", F.lag("negative_id").over(w) == F.col("negative_id"))
        .where(~F.coalesce(F.col("_dup"), F.lit(False))))
    return (uniq.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("anchor_id", "rank", "negative_id", "anchor_label",
                    "negative_label",
                    (F.round("score", 4) + F.lit(0.0)).alias("score")))


def decontaminate(corpus: DataFrame, benchmark: DataFrame, *,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  threshold: float = 0.9, n_bands: int = 8,
                  band_bits: int = 8,
                  max_bucket_size: int | None = 1000, dims: int = 64,
                  seed: int = 0, vectorized: bool = False,
                  _release_to: list | None = None) -> DataFrame:
    """Semantic eval-set decontamination, PROBE-SIDE: corpus vectors
    whose cosine to any benchmark vector clears ``threshold`` — the
    embedding-space analogue of n-gram decontamination
    (dedup.ngram_overlap), catching paraphrased leakage token overlap
    misses.

    The 100 TB shape, and why it is NOT "run the pair finder and
    filter": a self-join over corpus ∪ benchmark mines corpus↔corpus
    candidates that dominate candidate volume by orders of magnitude
    and are all discarded. Here the benchmark side (tiny and fixed by
    contract) is band-keyed and BROADCAST; the corpus is touched
    exactly once, map-only, to emit its band keys, and only corpus
    entries landing in a benchmark-probed bucket go any further —
    the same asymmetric shape as dedup.check_against_index.

    Result-identical to the symmetric pair finder post-filtered to
    cross pairs (pinned by test): candidate generation only ever
    needed buckets containing >=1 benchmark key, the skew guard is
    evaluated on FULL bucket membership (surviving corpus entries +
    benchmark entries — exactly the whole-table count for any bucket
    that can produce a cross pair), and the cosine is the same
    fold/operand order, so scores are bit-identical.

    Returns (corpus_id, benchmark_id, score), one row per
    contaminated pair over ``threshold``.
    """
    def frame(df: DataFrame) -> DataFrame:
        if vectorized:
            return signature_frame_pandas(
                df, id_col=id_col, vec_col=vec_col, n_bands=n_bands,
                band_bits=band_bits, dims=dims, seed=seed)
        keys = hyperplane_band_keys(vec_col, n_bands, band_bits,
                                    dims=dims, seed=seed)
        return ensure_parallelism(df).select(
            F.col(id_col).alias("_id"), _as_double(vec_col).alias("_v"),
            norm(_adq(vec_col)).alias("_n"), keys.alias("_keys"))

    c = frame(corpus)
    b = frame(benchmark).persist()
    c_bands = c.select(F.col("_id").alias("corpus_id"), "_v", "_n",
                       F.posexplode("_keys").alias("_band", "_key"))
    b_bands = (b.select(F.col("_id").alias("benchmark_id"),
                        F.posexplode("_keys").alias("_band", "_key"))
                .persist())
    if _release_to is not None:
        _release_to.extend([b, b_bands])
    # Corpus pass: keep only entries in benchmark-probed buckets
    # (broadcast semi-join — the corpus never shuffles on band keys).
    probed = c_bands.join(
        F.broadcast(b_bands.select("_band", "_key").distinct()),
        ["_band", "_key"]).persist()
    if _release_to is not None:
        _release_to.append(probed)
    if max_bucket_size is not None:
        # Full bucket membership for probed buckets = surviving corpus
        # entries (the semi-join keeps ALL corpus members of a probed
        # bucket) + benchmark entries; identical to the whole-table
        # count the symmetric finder guards on. Probed buckets number
        # at most |benchmark| * n_bands — broadcastable by contract.
        members = (probed.select("_band", "_key")
                   .unionAll(b_bands.select("_band", "_key")))
        ok = (members.groupBy("_band", "_key")
                     .agg(F.count(F.lit(1)).alias("_cnt"))
                     .where(F.col("_cnt") <= max_bucket_size)
                     .drop("_cnt"))
        probed = probed.join(F.broadcast(ok), ["_band", "_key"])
    cand = (probed.select("corpus_id", "_v", "_n", "_band", "_key")
                  .join(F.broadcast(b_bands), ["_band", "_key"])
                  .select("corpus_id", "benchmark_id", "_v", "_n")
                  .dropDuplicates(["corpus_id", "benchmark_id"]))
    vb = b.select(F.col("_id").alias("benchmark_id"),
                  F.col("_v").alias("_vb"), F.col("_n").alias("_nb"))
    return (cand.join(F.broadcast(vb), "benchmark_id")
                .withColumn("score", dot("_v", "_vb")
                            / (F.col("_n") * F.col("_nb")))
                .where(F.col("score") >= threshold)
                .select("corpus_id", "benchmark_id",
                        (F.round("score", 4) + F.lit(0.0)).alias("score")))


def auto_n_bits(n: int, target_bucket_size: int = 128, *,
                lo: int = 4, hi: int = 24) -> int:
    """Bucket-bit count for an ``n``-vector corpus: the smallest number
    of sign bits whose expected bucket (n / 2^bits) is at most
    ``target_bucket_size``, clamped to [lo, hi]. Within-bucket work is
    O(sum bucket_size^2), so bits must grow with the corpus — 4 bits
    at 500 vectors, ~20 bits at a billion."""
    import math

    if n <= target_bucket_size:
        return lo
    return max(lo, min(hi, math.ceil(math.log2(n / target_bucket_size))))


def knn_graph(vectors: DataFrame, k: int = 3, *, id_col: str = "vec_id",
              vec_col: str = "embedding", n_bits: int | None = None,
              dims: int = 64, seed: int = 0,
              max_bucket_size: int | None = 1000,
              target_bucket_size: int = 128,
              _release_to: list | None = None) -> DataFrame:
    """Corpus-to-corpus kNN graph (top-``k`` cosine neighbors per
    vector) within hyperplane-LSH buckets — the self-join variant of
    bucketed ANN used to build similarity graphs for clustering and
    near-dup mining.

    Scale guards (both on by default):
    - ``n_bits=None`` self-sizes from the corpus count via
      ``auto_n_bits`` (one count job, metadata-only on parquet), so
      expected bucket size stays ~``target_bucket_size`` instead of
      growing linearly with the corpus.
    - ``max_bucket_size`` drops buckets bigger than the cap BEFORE the
      self-join (the same pre-filter as neardup_pairs_banded): a hot
      bucket — skewed data, or every vector identical — would
      otherwise put O(bucket^2) pairs on one partition. Vectors in a
      dropped bucket get no neighbors (standard LSH skew-guard
      trade-off); at scale, re-probe them with more bits instead.
    """
    if n_bits is None:
        n_bits = auto_n_bits(vectors.count(), target_bucket_size)
    # same single-pass shape as neardup_pairs_banded: bucket + norm
    # computed once per vector, frame persisted for its three
    # consumers; per-pair scoring reuses the norms (fold and operand
    # order unchanged — scores bit-identical)
    b = ensure_parallelism(vectors).select(
        F.col(id_col).alias("_id"), _as_double(vec_col).alias("_v"),
        norm(_adq(vec_col)).alias("_vn"),
        hyperplane_bucket(vec_col, n_bits, dims=dims,
                          seed=seed).alias("_bucket")).persist()
    if _release_to is not None:
        _release_to.append(b)
    if max_bucket_size is not None:
        b = drop_hot_buckets(b, ["_bucket"], max_bucket_size)
    left = b.select(F.col("_id").alias("src"),
                    F.col("_v").alias("_lv"),
                    F.col("_vn").alias("_ln"), "_bucket")
    right = b.select(F.col("_id").alias("dst"),
                     F.col("_v").alias("_rv"),
                     F.col("_vn").alias("_rn"), "_bucket")
    scored = (left.join(right, "_bucket")
              .where(F.col("src") != F.col("dst"))
              .withColumn("_score", dot("_lv", "_rv")
                          / (F.col("_ln") * F.col("_rn"))))
    w = Window.partitionBy("src").orderBy(F.col("_score").desc(),
                                          F.col("dst").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("src", "rank", "dst",
                    (F.round("_score", 4) + F.lit(0.0)).alias("score")))


def label_centroids(vectors: DataFrame, *, label_col: str = "label",
                    vec_col: str = "embedding", round_to: int = 6) -> DataFrame:
    """Coarse-quantizer centroids: per-label mean vector.

    In production IVF the centroids come from k-means; here the label
    column stands in as the trained assignment so the whole pipeline is
    deterministic. Centroids are rounded so downstream distances are
    reproducible across engines. posexplode→avg→re-assemble: one
    shuffle of (labels × dims) rows.
    """
    ex = vectors.select(F.col(label_col).alias("c_label"),
                        F.posexplode(_as_double(vec_col)).alias("pos", "x"))
    per_dim = (ex.groupBy("c_label", "pos")
                 .agg(F.round(F.avg("x"), round_to).alias("cx")))
    return (per_dim.groupBy("c_label")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cx"))),
                lambda s: s["cx"]).alias("centroid")))


def _md5_ranked_sample(base: DataFrame, sample_cap: int) -> list:
    """The bounded deterministic training draw shared by every sampled
    trainer (kmeans_centroids, pq_quantization): the ``sample_cap``
    rows of ``base`` (columns ``_id``, ``_v``) ranked first by
    (md5(id), id), collected in rank order. Corpora over the cap take
    the distributed md5-threshold pre-filter first (see the inline
    note) so the global top-cap never ships tasks × cap full vectors
    to the driver."""
    src = base
    n = base.count()
    if n > sample_cap:
        # Distributed pre-filter before the global top-cap: a bare
        # orderBy(md5).limit(cap) plans as TakeOrderedAndProject,
        # which ships every task's top-cap of FULL VECTORS to the
        # driver — tasks x cap x dims doubles blew
        # spark.driver.maxResultSize at the 1000x sweep (2M
        # vectors, 33+ tasks x ~31 MB). The md5 prefix is uniform
        # on [0, 2^32), so a value threshold at ~1.05x the target
        # fraction keeps ~1.05*cap candidate rows GLOBALLY, and
        # the exact top-cap by (md5, id) among the survivors IS
        # the global top-cap whenever >= cap rows survive (every
        # top-cap md5 lies below the threshold by construction).
        # Pure function of the data (n = count), so determinism
        # and oracle parity hold; corpora <= cap never take this
        # branch, so test-SF behavior is bit-unchanged. On the
        # rare under-fill (uniformity tail), fall back to the
        # exact path — correctness over the driver-size guard.
        thr = min(4294967296,
                  int(1.05 * sample_cap / n * 4294967296))
        md5v = F.conv(F.substring(
            F.md5(F.col("_id").cast("string")), 1, 8), 16, 10) \
            .cast("bigint")
        cand = base.where(md5v < F.lit(thr))
        if cand.count() >= sample_cap:
            src = cand
    return (src
            .orderBy(F.md5(F.col("_id").cast("string")), F.col("_id"))
            .limit(sample_cap)
            .select("_v").collect())


def kmeans_centroids(vectors: DataFrame, n_clusters: int, *,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     n_iter: int = 2, round_to: int = 6,
                     sample_cap: int | None = None) -> DataFrame:
    """Trained coarse quantizer: deterministic seeded Lloyd k-means.

    Two physical strategies, identical semantics:

    - ``sample_cap=None`` (distributed): assignment = broadcast-centroid
      argmax, update = per-dimension mean, expressed as DataFrame ops;
      the corpus never leaves executors, each iteration is one map-side
      score + one partial-agg shuffle of (k × dims) cells.
    - ``sample_cap=N`` (sampled): train on the ``N`` vectors ranked
      first by md5(id) — the standard coarse-quantizer practice (FAISS
      trains on a bounded sample regardless of corpus size). The sample
      is collected once (bounded by contract: N × dims doubles) and
      Lloyd runs driver-side in numpy with dimension-sequential
      accumulation, which is bit-identical to the SQL fold arithmetic —
      so for corpora ≤ N the two strategies return the same centroids
      (tested), and iteration latency stops being per-job Spark
      overhead. At 100 TB this is the only sane shape: the quantizer
      sees a fixed-size sample; the full corpus is only ever ASSIGNED
      (one map-side pass in ivf_topk).

    Determinism (cross-engine reproducible, mirrored by the DuckDB
    oracle in suite.py): seeds are the ``n_clusters`` vectors ranked by
    md5(id) (a deterministic pseudo-random draw both engines compute
    identically); every centroid update rounds to ``round_to`` decimals;
    assignment ties break on the lowest cluster id. Empty clusters drop
    out (both engines mirror naturally).

    Returns (c_label LONG, centroid ARRAY<DOUBLE>) — drop-in for
    ``ivf_topk(centroids=...)``.
    """
    spark = vectors.sparkSession
    if sample_cap is not None:
        base = vectors.select(F.col(id_col).alias("_id"),
                              _as_double(vec_col).alias("_v"))
        sample = _md5_ranked_sample(base, sample_cap)
        rows = _kmeans_numpy([r["_v"] for r in sample], n_clusters,
                             n_iter=n_iter, round_to=round_to)
        return spark.createDataFrame(rows, "c_label long, centroid array<double>")
    # one partition of parquet would serialize every scoring pass on a
    # single core (and the corpus cast would recompute per iteration):
    # spread + pin it for the whole training loop
    v = ensure_parallelism(
        vectors.select(F.col(id_col).alias("_id"),
                       _as_double(vec_col).alias("_v"))).persist()
    try:
        seeds = (v.orderBy(F.md5(F.col("_id").cast("string")), F.col("_id"))
                  .limit(n_clusters)
                  .select(F.transform(
                      "_v", lambda x: F.round(x, round_to)).alias("centroid"))
                  .collect())
        cents_rows = [(i, list(r["centroid"])) for i, r in enumerate(seeds)]
        schema = "c_label long, centroid array<double>"
        for _ in range(n_iter):
            cents = F.broadcast(spark.createDataFrame(cents_rows, schema))
            scored = (v.crossJoin(cents)
                       .withColumn("_cs", cosine("_v", "centroid")))
            # argmax via max_by over (score, -label): one hash aggregate
            # with map-side combine, no per-id window sort
            assigned = scored.groupBy("_id").agg(
                F.max_by("c_label",
                         F.struct(F.col("_cs"), (-F.col("c_label")).alias("_t"))
                         ).alias("c_label"),
                F.first("_v").alias("_v"))
            ex = assigned.select("c_label", F.posexplode("_v").alias("pos", "x"))
            per_dim = (ex.groupBy("c_label", "pos")
                         .agg(F.round(F.avg("x"), round_to).alias("cx")))
            new_cents = (per_dim.groupBy("c_label")
                         .agg(F.transform(
                             F.array_sort(F.collect_list(F.struct("pos", "cx"))),
                             lambda s: s["cx"]).alias("centroid")))
            cents_rows = [(r["c_label"], list(r["centroid"]))
                          for r in new_cents.collect()]
            cents_rows.sort()
    finally:
        v.unpersist()
    return spark.createDataFrame(cents_rows, schema)


def _kmeans_numpy(vecs: list, n_clusters: int, *, n_iter: int,
                  round_to: int) -> list:
    """Driver-side Lloyd on an md5-ranked sample (already ordered).

    Arithmetic notes: dot/norm accumulate DIMENSION-SEQUENTIALLY
    (acc = acc + x_i*y_i, one fused elementwise step per dimension),
    reproducing the exact float64 sequence of the SQL
    aggregate/zip_with fold — scores, and therefore argmax
    assignments, are bit-identical to the distributed path. Per-dim
    means differ from engine sums only in summation order; rounding to
    ``round_to`` absorbs that (same tolerance the distributed path
    already relies on vs the DuckDB oracle).
    """
    import numpy as np

    def rnd(a):
        # HALF_UP away from zero — Spark/DuckDB round(), not numpy's
        # half-even; +0.0 normalizes -0.0
        s = 10.0 ** round_to
        return np.sign(a) * np.floor(np.abs(a) * s + 0.5) / s + 0.0

    X = np.asarray(vecs, dtype=np.float64)
    n, dims = X.shape
    cents = rnd(X[:n_clusters].copy())
    labels = np.arange(len(cents))
    xn = np.zeros(n)
    for i in range(dims):
        xn = xn + X[:, i] * X[:, i]
    xn = np.sqrt(xn)
    for _ in range(n_iter):
        k_ = len(cents)
        cn = np.zeros(k_)
        dots = np.zeros((n, k_))
        for i in range(dims):
            cn = cn + cents[:, i] * cents[:, i]
            dots = dots + X[:, i:i + 1] * cents[None, :, i]
        scores = dots / (xn[:, None] * np.sqrt(cn)[None, :])
        assign = np.argmax(scores, axis=1)  # first max = lowest label
        new_cents, new_labels = [], []
        for j in range(k_):
            members = X[assign == j]
            if len(members):
                new_cents.append(rnd(members.mean(axis=0)))
                new_labels.append(labels[j])
        cents = np.array(new_cents)
        labels = np.array(new_labels)
    return [(int(l), [float(x) for x in c]) for l, c in zip(labels, cents)]


def _nearest_lists(df, cn, id_alias, vec_alias, norm_alias, top_n):
    """Nearest ``top_n`` centroids for every row (``cn`` = centroids
    with a precomputed ``_cn`` norm column, broadcast). top_n == 1 is
    the corpus-sized path: one hash aggregate (map-side combine), no
    per-id window sort over n x n_lists rows."""
    scored = (df.crossJoin(F.broadcast(cn))
                .withColumn("_cs", dot(f"`{vec_alias}`", "centroid")
                            / (F.col(norm_alias) * F.col("_cn"))))
    if top_n == 1:
        return scored.groupBy(id_alias).agg(
            F.max_by("c_label",
                     F.struct(F.col("_cs"), (-F.col("c_label")).alias("_t"))
                     ).alias("c_label"),
            F.first(vec_alias).alias(vec_alias),
            F.first(norm_alias).alias(norm_alias))
    w = Window.partitionBy(id_alias).orderBy(
        F.col("_cs").desc(), F.col("c_label").asc())
    return (scored.withColumn("_cr", F.row_number().over(w))
                  .where(F.col("_cr") <= top_n)
                  .select(id_alias, vec_alias, norm_alias, "c_label"))


def ivf_assign(vectors: DataFrame, centroids: DataFrame, *,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """The IVF BUILD pass: assign every corpus vector to its nearest
    centroid. Returns (vec_id, vec array<double>, vec_norm,
    list_label) — the inverted-list layout, meant to be persisted
    partitioned by ``list_label`` (quantizer.get_or_build_lists) so
    queries probe lists instead of re-assigning the corpus.

    This is the FAISS add()/train() split: real IVF materializes
    inverted lists once at maintenance time; a query that re-runs the
    full-corpus assignment pays an O(corpus x n_lists) scan per
    execution and erases the n_lists/nprobe advantage (VERDICT r4)."""
    cn = (centroids.select("c_label", "centroid")
          .withColumn("_cn", norm("centroid")))
    v = ensure_parallelism(
        vectors.select(F.col(id_col).alias("vec_id"),
                       _as_double(vec_col).alias("vec"),
                       norm(_adq(vec_col)).alias("vec_norm")))
    return (_nearest_lists(v, cn, "vec_id", "vec", "vec_norm", 1)
            .withColumnRenamed("c_label", "list_label")
            .select("vec_id", "vec", "vec_norm", "list_label"))


def ivf_assign_blocked(vectors: DataFrame, centroids: DataFrame, *,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       max_cells: int = 8_000_000) -> DataFrame:
    """ivf_assign's output contract (vec_id, vec, vec_norm,
    list_label) computed as ONE Arrow-batched numpy pass: the k x dims
    centroid matrix rides the task closure (broadcast-sized by
    construction), each vector batch scores against ALL centroids with
    one BLAS matmul chunked to ``max_cells`` score cells (the
    cosine_topk_blocked memory discipline — similarity.py:161-258),
    and argmax over ascending-label-ordered centroids reproduces the
    SQL path's (max cosine, then lowest c_label) tie-break.

    This is the MAINTENANCE assigner for large nlist (ensure_tuned's
    retunes): the SQL crossJoin materializes n x nlist rows each
    paying a 64-dim aggregate fold — at 2M vectors x 1414 lists that
    is 2.8e9 folds, hours of plan time, while the matmul is ~1.8e11
    flops of BLAS, minutes. Last-ulp caveat: BLAS pairwise summation
    can differ from the SQL fold's sequential IEEE order in the final
    ulp, so a vector EXACTLY equidistant between two centroids could
    assign differently — an assignment-boundary artifact of an
    approximate index, never a scoring difference (scores are computed
    from the stored vectors either way). The oracle-gated suite
    artifacts keep the SQL assigner; parity is pinned by test on real
    data."""
    import numpy as np
    import pandas as pd

    rows = centroids.select("c_label", "centroid").collect()
    order = sorted(range(len(rows)), key=lambda i: rows[i]["c_label"])
    labels = np.array([rows[i]["c_label"] for i in order],
                      dtype=np.int64)
    C = np.array([list(rows[i]["centroid"]) for i in order],
                 dtype=np.float64)
    cn = np.sqrt((C * C).sum(axis=1))
    k = len(labels)
    chunk = max(1, max_cells // max(k, 1))

    dims = C.shape[1] if k else None

    def assign(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            if not len(ids):
                continue
            vecs = [None if v is None
                    else np.asarray(v, dtype=np.float64)
                    for v in pdf[vec_col]]
            # null or wrong-dimension embeddings: silently skipping
            # dropped EVERY row of the batch (valid vectors included)
            # from the built artifact (ADVICE r14 #3) — name the
            # offenders and refuse; the index build must not lose
            # valid vectors to a neighbor's bad row. Validated
            # against the CENTROID dimension so a single-row ragged
            # batch can't slip through as shape (1, 0).
            bad = [int(i) for i, v in zip(ids, vecs)
                   if v is None or v.ndim != 1 or len(v) != dims]
            if bad:
                raise ValueError(
                    "ivf_assign_blocked: ragged embedding batch — "
                    f"expected dimension {dims}, offending "
                    f"{id_col}s (first 10): {bad[:10]} — null or "
                    "wrong-dimension vectors cannot be assigned; "
                    "filter them out before the index build")
            V = np.array(vecs)
            out_lbl = np.empty(len(ids), dtype=np.int64)
            vnorm = np.sqrt((V * V).sum(axis=1))
            for lo in range(0, len(ids), chunk):
                hi = min(lo + chunk, len(ids))
                S = V[lo:hi] @ C.T
                S /= np.outer(vnorm[lo:hi], cn)
                # argmax returns the FIRST max — rows are ascending
                # c_label, so ties break to the lowest label, same as
                # the SQL max_by struct order
                out_lbl[lo:hi] = labels[np.argmax(S, axis=1)]
            yield pd.DataFrame({
                "vec_id": ids,
                "vec": [v.tolist() for v in V],
                "vec_norm": vnorm,
                "list_label": out_lbl})

    src = ensure_parallelism(
        vectors.select(F.col(id_col).alias(id_col),
                       _as_double(vec_col).alias(vec_col)))
    return src.mapInPandas(
        assign,
        "vec_id long, vec array<double>, vec_norm double, "
        "list_label long")


def _rescale_nprobe(nprobe: int, tuned: dict) -> int:
    """nprobe adjustment after an ensure_tuned retune (ADVICE r14
    #2): the caller chose ``nprobe`` against the OLD nlist, so keeping
    it fixed across a 10 → 1414 retune silently shrinks the probed
    corpus fraction ~140x in one query and recall can collapse. Full
    proportional scaling (nprobe × nlist'/nlist) would preserve the
    fraction — but it also preserves the shape-broken index's
    per-query candidate volume, i.e. the exact row blowup the retune
    exists to kill (VERDICT r13 #1). So the scale-up is
    fraction-preserving UP TO a candidate budget: the rows the
    caller's nprobe would scan on a just-healthy index
    (nprobe × cap, cap = the max_avg_list_rows threshold). At the
    sf100 shape (n=2M, nlist 10 → 1414, nprobe 2) this yields
    nprobe'=92 — a ~1/15 probed fraction, inside the regime the
    retune bench measured recall holding at, for ~130k candidates per
    query instead of 400k."""
    if not tuned.get("retuned") or not tuned.get("n_clusters_before"):
        return nprobe
    nlist1, nlist2 = tuned["n_clusters_before"], tuned["n_clusters"]
    n, cap = tuned["n_vectors"], tuned["cap"]
    proportional = round(nprobe * nlist2 / nlist1)
    budget = int(nprobe * cap * nlist2 / max(n, 1))  # nprobe·cap rows
    return max(nprobe, min(proportional, max(nprobe, budget), nlist2))


def ivf_topk(vectors: DataFrame, queries: DataFrame, k: int, *,
             id_col: str = "vec_id", vec_col: str = "embedding",
             label_col: str = "label", nprobe: int = 2,
             centroids: DataFrame | None = None,
             lists: DataFrame | None = None,
             corpus_fingerprint: str | None = None,
             allow_stale: bool = False,
             maintenance: str = "auto",
             max_avg_list_rows: int | None = None) -> DataFrame:
    """IVF-style approximate top-k: probe only the query's ``nprobe``
    nearest inverted lists.

    Staleness guard: pass ``corpus_fingerprint`` (the live corpus's
    quantizer.corpus_fingerprint) to assert the materialized lists
    were built/maintained against THIS corpus — deleted vectors must
    not resurface as neighbors, added ones must not be silently
    missing (quantizer.StaleIndexError otherwise; ``allow_stale=True``
    searches anyway, e.g. during a planned reindex window).

    Scale shape: centroids are tiny and broadcast; with materialized
    ``lists`` (ivf_assign persisted partitioned by list_label) a query
    is probe-selection (queries x k centroids) + one broadcast join
    that dynamic-partition-prunes the corpus scan down to the probed
    lists — search cost drops by ~n_lists/nprobe versus brute force
    and NO full-corpus pass happens at query time. Without ``lists``
    the assignment runs inline (ivf_assign) — fine for ad-hoc use,
    wrong lifecycle for a served index. ``centroids`` takes a trained
    quantizer (kmeans_centroids/quantizer.get_or_train); without one,
    the per-label mean stand-in is used.

    ``maintenance`` (default ``'auto'``) is the self-scheduled index
    maintenance tick (quantizer.ensure_tuned — the maybe_compact
    analogue): on every materialized-lists search the index shape is
    checked against its sidecar (free when the build recorded counts)
    and a shape-broken index — average list larger than
    ``max_avg_list_rows`` (default 65536) — is retuned to
    nlist'≈isqrt(n) before probing, instead of silently shuffling
    ~n/nlist candidates per query. ``'error'`` refuses loudly
    (StaleIndexError), ``'off'`` restores the legacy behavior.
    """
    if lists is not None:
        if centroids is None:
            raise ValueError("ivf_topk(lists=...) needs the quantizer "
                             "centroids the lists were built with")
        if corpus_fingerprint is not None:
            from quasdb_spark.operators.quantizer import check_fresh
            check_fresh(lists, corpus_fingerprint,
                        allow_stale=allow_stale)
        if maintenance != "off":
            from quasdb_spark.operators.quantizer import ensure_tuned
            tuned = ensure_tuned(centroids, lists,
                                 fingerprint=corpus_fingerprint,
                                 mode=maintenance,
                                 max_avg_list_rows=max_avg_list_rows)
            centroids, lists = tuned["centroids"], tuned["lists"]
            nprobe = _rescale_nprobe(nprobe, tuned)
        cents = centroids.select("c_label", "centroid")
        assigned = lists.select(F.col("vec_id").alias("neighbor_id"),
                                F.col("vec").alias("_vv"),
                                F.col("vec_norm").alias("_vn"),
                                "list_label")
    elif centroids is not None:
        cents = centroids.select("c_label", "centroid")
        assigned = (ivf_assign(vectors, cents, id_col=id_col,
                               vec_col=vec_col)
                    .withColumnsRenamed({"vec_id": "neighbor_id",
                                         "vec": "_vv",
                                         "vec_norm": "_vn"}))
    else:
        # tiny (n_lists rows) but its lineage scans the corpus —
        # persist so assignment + probe branches don't each recompute
        cents = label_centroids(vectors, label_col=label_col,
                                vec_col=vec_col).persist()
        assigned = (ivf_assign(vectors, cents, id_col=id_col,
                               vec_col=vec_col)
                    .withColumnsRenamed({"vec_id": "neighbor_id",
                                         "vec": "_vv",
                                         "vec_norm": "_vn"}))
    cn = cents.withColumn("_cn", norm("centroid"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       _as_double(vec_col).alias("_qv"),
                       norm(_adq(vec_col)).alias("_qn"))
    probes = _nearest_lists(q, cn, "query_id", "_qv", "_qn", nprobe) \
        .withColumnRenamed("c_label", "list_label")

    scored = (F.broadcast(probes).join(assigned, "list_label")
              .where(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("score", dot("_qv", "_vv")
                          / (F.col("_qn") * F.col("_vn"))))
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .where(F.col("rank") <= k)
                  .select("query_id", "rank", "neighbor_id",
                          (F.round("score", 4) + F.lit(0.0)).alias("score")))


def quantize_int8(vectors: DataFrame, *, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Scalar int8 quantization with a per-vector max-abs scale — the
    standard 4x storage compression for large embedding corpora (the
    shape FAISS calls SQ8). codes[i] = round(x[i] / scale) with
    scale = max|x| / 127, so nothing clips and the worst-case per-dim
    reconstruction error is scale/2.

    Map-only JVM expressions (no shuffle, no Python): at 100 TB this
    is a single pass that shrinks the embedding column 4x before it
    ever hits a shuffle or sink. Returns (id, codes ARRAY<TINYINT>,
    scale DOUBLE); all-zero vectors get NULL codes (scale 0 carries no
    information to reconstruct).
    """
    v = _as_double(vec_col)
    scale = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    codes = F.transform(F.col("_v"),
                        lambda x: F.round(x / F.col("_scale"))
                        .cast("tinyint"))
    return (vectors
            .select(F.col(id_col), v.alias("_v"),
                    F.nullif(scale, F.lit(0.0)).alias("_scale"))
            .select(F.col(id_col),
                    F.when(F.col("_scale").isNotNull(), codes)
                    .alias("codes"),
                    F.col("_scale").alias("scale")))


def dequantize_error(vectors: DataFrame, *, id_col: str = "vec_id",
                     vec_col: str = "embedding",
                     round_to: int = 6) -> DataFrame:
    """Per-vector int8 quantization diagnostics: the scale and the mean
    absolute reconstruction error of round-trip quantization. One
    map-only pass (quantize + dequantize fused — codes never
    materialize)."""
    v = _as_double(vec_col)
    scale = F.array_max(F.transform(v, lambda x: F.abs(x))) / F.lit(127.0)
    base = vectors.select(F.col(id_col), v.alias("_v"),
                          F.nullif(scale, F.lit(0.0)).alias("_scale"))
    err = F.aggregate(
        F.transform(F.col("_v"),
                    lambda x: F.abs(x - F.round(x / F.col("_scale"))
                                    * F.col("_scale"))),
        F.lit(0.0), lambda acc, e: acc + e) / F.size(F.col("_v"))
    return base.select(
        F.col(id_col),
        (F.round(F.col("_scale"), round_to) + F.lit(0.0)).alias("scale"),
        (F.round(err, round_to) + F.lit(0.0)).alias("mae"))


def pq_quantization(vectors: DataFrame, *, m: int = 4, k: int = 8,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    dims: int = 64, n_iter: int = 2,
                    sample_cap: int = 65536,
                    round_to: int = 6) -> DataFrame:
    """Product-quantization codebook diagnostics — the FAISS-PQ shape:
    split each vector into ``m`` contiguous subvectors, train an
    INDEPENDENT ``k``-centroid codebook per subspace (seeded sampled
    Lloyd, the kmeans_centroids contract), and code each vector as its
    per-subspace argmax centroid. Emits per-(subspace, code)
    membership and fit (n_vecs, avg/min cosine of member subvectors to
    their centroid) — the table that decides m and k before switching
    an ANN corpus to m*log2(k)-bit PQ storage (here 4x8: 12 bits vs
    2048 for float32x64, a 170x compression).

    Spherical variant: subspace assignment maximizes cosine, matching
    this module's k-means family end to end (classic PQ uses L2; for
    the normalized-embedding corpora these pipelines process, the two
    agree up to the subvector-norm weighting).

    Scale shape (r15: single-pass): TRAINING sees only ONE bounded
    md5-ranked sample of FULL vectors — every subspace's independent
    sample draw ranked the same ids, so slicing the one collected
    sample per subspace is the identical draw (slice commutes with the
    ranking) — and Lloyd runs per subspace driver-side on that sample
    (the kmeans_centroids sample_cap contract, bit-identical folds).
    The corpus is then ASSIGNED in ONE map-side pass that scores all m
    subspaces against the broadcast nested codebooks and aggregates
    per (subspace, code) with map-side combine — m*k output rows, one
    corpus scan and one bounded shuffle instead of m of each (was 4
    count jobs + 4 sample collects + 4 corpus scans; measured
    3.3 s -> ~1.3 s at sf0.1, and a 100 TB health check reads the
    corpus once). Scores/argmax are bit-identical: the per-element
    cosine is the same fold, and ``array_max`` over
    struct(_cs, -label) is the same comparator ``max_by`` used.
    ``dims % m`` must be 0; subvector widths stay equal.
    """
    if dims % m:
        raise ValueError(f"pq_quantization: dims {dims} not divisible "
                         f"by m {m}")
    sub = dims // m
    spark = vectors.sparkSession
    base = vectors.select(F.col(id_col).alias("_id"),
                          _as_double(vec_col).alias("_v"))
    full = [r["_v"] for r in _md5_ranked_sample(base, sample_cap)]
    cb_by_s = [_kmeans_numpy([v[s * sub:(s + 1) * sub] for v in full], k,
                             n_iter=n_iter, round_to=round_to)
               for s in range(m)]
    cb1 = spark.createDataFrame(
        [([[(l, list(c)) for l, c in cb_by_s[s]] for s in range(m)],)],
        "_cb array<array<struct<l: bigint, centroid: array<double>>>>")
    sv = f"slice(_v, s * {sub} + 1, {sub})"
    cos = (f"({_dot_sql(sv, 'e.centroid')} / "
           f"({_norm_sql(sv)} * {_norm_sql('e.centroid')}))")
    per = (base.crossJoin(F.broadcast(cb1))
           .select(F.posexplode(F.expr(
               f"transform(sequence(0, {m - 1}), s -> "
               f"array_max(transform(element_at(_cb, s + 1), e -> "
               f"struct({cos} as _cs, -e.l as _t))))"))
               .alias("subspace", "_b"))
           .select("subspace", (-F.col("_b._t")).alias("c_label"),
                   F.round(F.col("_b._cs"), 6).alias("_cs6")))
    return (per.groupBy("subspace", "c_label")
            .agg(F.count(F.lit(1)).alias("n_vecs"),
                 (F.round(F.avg("_cs6"), 4) + F.lit(0.0)).alias("avg_cos"),
                 (F.round(F.min("_cs6"), 6) + F.lit(0.0)).alias("min_cos"))
            .select("subspace", "c_label", "n_vecs", "avg_cos",
                    "min_cos"))


def _pq_subspace(vectors: DataFrame, s: int, sub: int, k: int, *,
                 id_col: str, vec_col: str, n_iter: int,
                 sample_cap: int, round_to: int):
    """One PQ subspace: train a k-centroid codebook on the sliced
    vectors (seeded sampled Lloyd) and assign every vector its argmax
    code. Returns (codebook, assigned) with assigned carrying
    ``_a.c_label`` / ``_a._cs`` per ``_id``."""
    sl = vectors.select(
        F.col(id_col).alias("_id"),
        F.slice(_as_double(vec_col), s * sub + 1, sub).alias("_sv"))
    cents = kmeans_centroids(sl, k, id_col="_id", vec_col="_sv",
                             n_iter=n_iter, sample_cap=sample_cap,
                             round_to=round_to)
    scored = (sl.crossJoin(F.broadcast(cents))
              .withColumn("_cs", cosine("_sv", "centroid")))
    assigned = scored.groupBy("_id").agg(
        F.max_by(F.struct("c_label", "_cs"),
                 F.struct(F.col("_cs"),
                          (-F.col("c_label")).alias("_t"))).alias("_a"))
    return cents, assigned


def pq_assign(vectors: DataFrame, codebooks: DataFrame, *,
              m: int = 4, dims: int = 64, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """PQ encode: (id, subspace, code) for every vector against GIVEN
    per-subspace codebooks (subspace, c_label, centroid) — the add()
    pass, meant to be persisted (quantizer.get_or_build_codes) so
    queries read codes instead of re-encoding the corpus. m map-side
    broadcast-argmax passes, no shuffle of the corpus."""
    if dims % m:
        raise ValueError(f"pq_assign: dims {dims} not divisible by "
                         f"m {m} — the trailing dims % m dimensions "
                         "would be silently dropped from encoding")
    sub = dims // m
    outs = []
    for s in range(m):
        cents = (codebooks.where(F.col("subspace") == s)
                 .select("c_label", "centroid"))
        sl = vectors.select(
            F.col(id_col).alias("vec_id"),
            F.slice(_as_double(vec_col), s * sub + 1, sub).alias("_sv"))
        assigned = (sl.crossJoin(F.broadcast(cents))
                    .withColumn("_cs", cosine("_sv", "centroid"))
                    .groupBy("vec_id")
                    .agg(F.max_by("c_label",
                                  F.struct(F.col("_cs"),
                                           (-F.col("c_label"))
                                           .alias("_t"))).alias("code")))
        outs.append(assigned.select("vec_id", F.lit(s).alias("subspace"),
                                    F.col("code").cast("long")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def ivfpq_topk(vectors: DataFrame, queries: DataFrame, k: int, *,
               id_col: str = "vec_id", vec_col: str = "embedding",
               m: int = 4, pq_k: int = 8, dims: int = 64,
               nprobe: int = 2, centroids: DataFrame,
               lists: DataFrame, n_iter: int = 2,
               sample_cap: int = 65536,
               round_to: int = 6,
               codebooks: DataFrame | None = None,
               codes: DataFrame | None = None,
               corpus_fingerprint: str | None = None,
               allow_stale: bool = False,
               maintenance: str = "auto",
               max_avg_list_rows: int | None = None) -> DataFrame:
    """FAISS-IVFPQ search shape: coarse IVF probe pruning composed
    with asymmetric distance computation (ADC) over product-quantized
    codes. Candidates come from the query's ``nprobe`` nearest
    inverted lists (the materialized coarse index — only ids and list
    labels are read); each candidate is represented ONLY by its m
    per-subspace codes (m*log2(pq_k) bits — 12 here), and its score
    is reconstructed from a per-query ADC TABLE of m × pq_k exact
    query-sub-dot-codebook entries: the classic lookup-table search,
    in which the corpus's float vectors are never touched at query
    time.

    score_adc(q, x) = <q, x̂> / (|q| · |x̂|) with x̂ the concatenated
    code centroids — cosine against the PQ reconstruction (spherical
    variant, consistent with this module's k-means family).

    Determinism: ADC table entries and code-centroid norms² are
    rounded to integer MICROS; a candidate's numerator/norm² are then
    ORDER-FREE integer sums of m table entries, so Spark and the SQL
    oracle rank identical doubles (the bm25/lm-score contract applied
    to ANN scoring).

    Scale shape (r10 array-codes layout): codes travel as ONE row per
    corpus vector carrying an m-length ``array<long>`` (production
    materializes them next to the inverted lists —
    quantizer.get_or_build_codes_array); the ADC table and the
    code-centroid norms² are nested array columns on the (broadcast)
    query frame, built from one-row code-ordered codebook arrays; a
    candidate's score is an INLINE sum of m element_at lookups — no
    per-(candidate, subspace) row amplification and no groupBy in the
    scoring path (the r9 layout shipped m rows per candidate and
    aggregated them back; VERDICT r9 #1). The probe join
    dynamic-partition-prunes the corpus to nprobe lists per query. No
    full-width vector math touches the corpus at query time.

    The completeness guard is now structural: size(codes) == m (and,
    for row-layout inputs, subspaces exactly 0..m-1), asserted in a
    USED column so pruning can't drop it; a code outside the codebook
    range fails the lookup-null assert instead of silently ranking
    the candidate out.
    """
    if dims % m:
        raise ValueError(f"ivfpq_topk: dims {dims} not divisible "
                         f"by m {m}")
    if codes is not None and codebooks is None:
        # ADC entries would come from freshly trained codebooks while
        # the candidates are scored through externally persisted codes
        # — silently wrong scores if they came from a different
        # training run. Persisted artifacts travel as a pair
        # (quantizer.get_or_train_pq + get_or_build_codes).
        raise ValueError("ivfpq_topk: codes provided without the "
                         "codebooks that produced them — pass both "
                         "persisted artifacts or neither")
    if corpus_fingerprint is not None:
        # staleness guard (see ivf_topk): lists AND codes must have
        # been maintained against the live corpus — a vector dropped
        # from the lists but not the codes (or vice versa) is the
        # split-brain this catches
        from quasdb_spark.operators.quantizer import check_fresh
        check_fresh(lists, corpus_fingerprint, allow_stale=allow_stale)
        if codes is not None:
            check_fresh(codes, corpus_fingerprint,
                        allow_stale=allow_stale)
    if maintenance != "off":
        # self-scheduled COARSE-index maintenance (see ivf_topk): a
        # shape-broken nlist would stream ~n/nlist candidates per
        # query into the codes join — at 2M vectors x nlist=10 x 20k
        # queries that was the 8e9-row shuffle that spilled sf100 dry
        # (VERDICT r13 #1). Retuning touches only centroids+lists;
        # the PQ codes are keyed per-vector and stay valid.
        from quasdb_spark.operators.quantizer import ensure_tuned
        tuned = ensure_tuned(centroids, lists,
                             fingerprint=corpus_fingerprint,
                             mode=maintenance,
                             max_avg_list_rows=max_avg_list_rows)
        centroids, lists = tuned["centroids"], tuned["lists"]
        nprobe = _rescale_nprobe(nprobe, tuned)
    sub = dims // m
    q = queries.select(F.col(id_col).alias("query_id"),
                       _as_double(vec_col).alias("_qv"),
                       norm(_adq(vec_col)).alias("_qn"))
    # Per-subspace codebooks: provided (the persisted-artifact serving
    # path — quantizer.get_or_train_pq) or trained inline (ad-hoc).
    # Provided codes skip the encode pass entirely: the corpus float
    # vectors are then never touched by this query.
    cents_by_s, code_frames = [], []
    for s in range(m):
        if codebooks is not None:
            cents = (codebooks.where(F.col("subspace") == s)
                     .select("c_label", "centroid"))
            assigned = None
        else:
            cents, assigned = _pq_subspace(
                vectors, s, sub, pq_k, id_col=id_col, vec_col=vec_col,
                n_iter=n_iter, sample_cap=sample_cap, round_to=round_to)
        cents_by_s.append(cents)
        if codes is None:
            if assigned is None:
                sl = vectors.select(
                    F.col(id_col).alias("_id"),
                    F.slice(_as_double(vec_col), s * sub + 1, sub)
                    .alias("_sv"))
                assigned = (sl.crossJoin(F.broadcast(cents))
                            .withColumn("_cs", cosine("_sv", "centroid"))
                            .groupBy("_id")
                            .agg(F.max_by(
                                F.struct("c_label", "_cs"),
                                F.struct(F.col("_cs"),
                                         (-F.col("c_label"))
                                         .alias("_t"))).alias("_a")))
            code_frames.append(assigned.select(
                F.col("_id").alias("neighbor_id"), F.lit(s).alias("_s"),
                F.col("_a.c_label").alias("_code")))
    codes_arr = _codes_array_frame(codes, code_frames)
    # Per-query nested tables: _adc[s][code+1] = round(<q_s, c>·1e6),
    # _cn2[s][code+1] = round(|c|²·1e6) — both derived from ONE
    # one-row nested codebook frame (all m subspaces, code-ordered),
    # so the whole query-side prep is a single broadcast cross join
    # instead of m of them (each broadcast exchange is a fixed-cost
    # stage; at demo sf the query is stage-count-bound). The integer
    # table entries are IDENTICAL to r9's, so candidate sums — hence
    # scores and the SQL oracle — are unchanged.
    if codebooks is not None:
        # r16 (VERDICT r15 #5): the persisted codebooks are
        # DRIVER-LOCAL by construction (quantizer.get_or_train_pq
        # returns a local relation of m·pq_k rows rebuilt from the JSON
        # artifact), yet the nested one-row table was assembled
        # DISTRIBUTED — m filtered views unioned, one collect_list
        # aggregate, then the broadcast — a fixed multi-job/8-scan tax
        # on every query. Collect the bounded rows once (m·pq_k by
        # contract — the same bounded-collect class as the Lloyd
        # codebook collect) and ship the nested table as a ONE-ROW
        # local relation: the broadcast builds driver-side with zero
        # distributed stages. Doubles travel unparsed (no literal
        # round-trip), so ADC entries — hence scores and the SQL
        # oracle — are bit-identical.
        cb1 = _codebooks_nested_local(codebooks, m, pq_k)
    else:
        cb1 = _codebooks_nested(cents_by_s, m)
    adc_q = q.crossJoin(F.broadcast(cb1))
    # each nested table parses as ONE SQL expression (the _DOT_SQL
    # note): m transform-over-codebook lambdas built per-Column cost
    # ~0.5 s of py4j round-trips per query construction
    adc_tbl = adc_q.select(
        "query_id",
        F.expr("array(" + ", ".join(
            f"transform(element_at(_cb, {s + 1}), c -> cast(round("
            + _dot_sql(f"slice(_qv, {s * sub + 1}, {sub})", "c")
            + " * 1e6, 0) as bigint))" for s in range(m)) + ")")
        .alias("_adc"),
        F.expr("array(" + ", ".join(
            f"transform(element_at(_cb, {s + 1}), c -> cast(round("
            + _dot_sql("c", "c")
            + " * 1e6, 0) as bigint))" for s in range(m)) + ")")
        .alias("_cn2"))
    cn = (centroids.select("c_label", "centroid")
          .withColumn("_cn", norm("centroid")))
    probes = _nearest_lists(q, cn, "query_id", "_qv", "_qn", nprobe) \
        .withColumnRenamed("c_label", "list_label")
    # fold the nested ADC/norm tables INTO the broadcast probe frame
    # (a tiny queries×nprobe ⋈ queries join) so the candidate stream
    # takes ONE broadcast hash join instead of two — at 7M+ candidate
    # rows per query batch the second probe-side join is pure waste
    probes_full = (probes.select("query_id", "_qn", "list_label")
                   .join(adc_tbl, "query_id"))
    cand = (F.broadcast(probes_full)
            .join(lists.select(F.col("vec_id").alias("neighbor_id"),
                               "list_label"), "list_label")
            .where(F.col("query_id") != F.col("neighbor_id")))
    scored = cand.join(codes_arr, "neighbor_id")
    scored = _fold_codes_guard(
        scored, m, "ivfpq_topk",
        {"_dm": _adc_lookup_sum(m, "_adc"),
         "_n2": _adc_lookup_sum(m, "_cn2")})
    score = (F.col("_dm") / 1e6) \
        / (F.col("_qn") * F.sqrt(F.col("_n2") / 1e6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("_score").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("_score", score)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id",
                    (F.round("_score", 4) + F.lit(0.0))
                    .alias("score_adc")))


def _codes_array_frame(codes: DataFrame | None,
                       code_frames: list[DataFrame]) -> DataFrame:
    """Normalize PQ codes to the array layout: one row per vector,
    (neighbor_id, _codes array<long>[, _subs array<long>]).

    Array-layout inputs (vec_id, codes) — the persisted
    quantizer.get_or_build_codes_array artifact — pass through with
    positions trusted (positional-by-construction contract). Row
    layout (vec_id, subspace, code) — the legacy artifact or the
    inline encode frames — is collapsed by one aggregate, keeping the
    subspace ids alongside so the scorer can assert they are exactly
    0..m-1 (a duplicated/missing subspace row must fail loudly, not
    misalign the positional lookup)."""
    if codes is not None and "codes" in codes.columns:
        return codes.select(F.col("vec_id").alias("neighbor_id"),
                            F.col("codes").alias("_codes"))
    if codes is not None:
        src = codes.select(F.col("vec_id").alias("neighbor_id"),
                           F.col("subspace").cast("long").alias("_s"),
                           F.col("code").alias("_code"))
    else:
        src = code_frames[0]
        for f_ in code_frames[1:]:
            src = src.unionAll(f_)
        src = src.select("neighbor_id", F.col("_s").cast("long"),
                         "_code")
    pairs = F.sort_array(F.collect_list(F.struct("_s", "_code")))
    return (src.groupBy("neighbor_id")
            .agg(F.transform(pairs, lambda x: x["_code"]).alias("_codes"),
                 F.transform(pairs, lambda x: x["_s"]).alias("_subs")))


def _codebook_array(cents: DataFrame) -> DataFrame:
    """One-row frame (_ca array<array<double>>): a subspace codebook's
    centroids ordered by code label, so _ca[code+1] is code's
    centroid. A keyless aggregate over pq_k rows — statically bounded
    (the plan doctor's BNLJ contract)."""
    return cents.groupBy().agg(F.transform(
        F.sort_array(F.collect_list(F.struct("c_label", "centroid"))),
        lambda x: x["centroid"]).alias("_ca"))


def _codebooks_nested(cents_by_s: list[DataFrame], m: int) -> DataFrame:
    """One-row frame (_cb array<array<array<double>>>): ALL m subspace
    codebooks nested as _cb[s+1][code+1] = centroid — built by ONE
    keyless aggregate over the m·pq_k codebook rows, so the query-side
    ADC prep broadcasts a single constant-size row instead of m
    per-subspace ones (each broadcast exchange is a fixed-cost
    stage)."""
    src = cents_by_s[0].select(F.lit(0).alias("_s"), "c_label",
                               "centroid")
    for s, cents in enumerate(cents_by_s[1:], start=1):
        src = src.unionAll(cents.select(F.lit(s).alias("_s"), "c_label",
                                        "centroid"))
    flat = F.sort_array(F.collect_list(
        F.struct(F.col("_s"), F.col("c_label"), F.col("centroid"))))
    return (src.groupBy().agg(flat.alias("_flat"))
            .select(F.expr(
                f"transform(sequence(0, {m - 1}), s -> transform("
                "filter(_flat, x -> x._s = s), x -> x.centroid))")
                .alias("_cb")))


def _codebooks_nested_local(codebooks: DataFrame, m: int,
                            pq_k: int) -> DataFrame:
    """``_codebooks_nested`` for PROVIDED codebooks: the same one-row
    (_cb array<array<array<double>>>) frame, built driver-side from a
    bounded collect of the m·pq_k codebook rows instead of a
    distributed union+aggregate. The positional lookup contract
    (_cb[s+1][code+1] = subspace-s centroid for code) requires every
    subspace to carry EXACTLY the labels 0..pq_k-1 — asserted here so a
    sparse/duplicated codebook fails loudly instead of misaligning the
    ADC table (the get_or_build_codes_array guard, applied to the
    codebook side)."""
    rows = codebooks.select("subspace", "c_label", "centroid").collect()
    by_s: dict[int, dict[int, list[float]]] = {}
    for r in rows:
        by_s.setdefault(int(r["subspace"]), {})[int(r["c_label"])] = \
            [float(x) for x in r["centroid"]]
    want = set(range(pq_k))
    for s in range(m):
        got = set(by_s.get(s, {}))
        if got != want:
            raise ValueError(
                f"_codebooks_nested_local: subspace {s} carries labels "
                f"{sorted(got)}, expected exactly 0..{pq_k - 1} — "
                "positional ADC lookup would misalign")
    if set(by_s) != set(range(m)):
        raise ValueError(
            f"_codebooks_nested_local: subspaces {sorted(by_s)} != "
            f"0..{m - 1}")
    nested = [[by_s[s][c] for c in range(pq_k)] for s in range(m)]
    return codebooks.sparkSession.createDataFrame(
        [(nested,)], "_cb array<array<array<double>>>")


def _adc_lookup_sum(m: int, tbl: str) -> Column:
    """Inline Σ_s tbl[s][codes[s]+1] over the per-query nested table —
    m integer element_at lookups, whole-stage-codegen'd, replacing the
    r9 (candidate × subspace) join+groupBy."""
    # try_element_at (not element_at): Spark 4 element_at THROWS on an
    # out-of-bounds index before the shape assert can run; try_ makes a
    # short/invalid codes array surface as NULL, which the guard then
    # reports with the artifact-mismatch message instead of a bare
    # INVALID_ARRAY_INDEX error.
    return F.expr(" + ".join(
        f"try_element_at(try_element_at({tbl}, {s + 1}), "
        f"cast(try_element_at(_codes, {s + 1}) + 1 as int))"
        for s in range(m)))


def _fold_codes_guard(scored: DataFrame, m: int, op: str,
                      exprs: dict[str, Column]) -> DataFrame:
    """Attach every ``exprs[out_col]`` gated behind the codes-shape
    asserts: size(_codes) == m, row-layout subspaces exactly 0..m-1
    (when present), and every lookup in range (each expr non-null —
    an out-of-range code makes try_element_at NULL, which would
    silently rank the candidate out). Folded into the USED columns
    (the random_project pattern) so pruning can't drop the assert.

    EVERY lookup sum the score touches must come through here, not
    just one: Spark's Divide/Mod eval SHORT-CIRCUITS — the right
    operand is evaluated first and a NULL right returns NULL without
    ever evaluating the left — so a guard folded only into the
    numerator never runs when an unguarded denominator term is NULL
    (found the hard way in r10: the holey-codes assert silently
    stopped firing)."""
    ok = F.size("_codes") == m
    if "_subs" in scored.columns:
        ok = ok & (F.col("_subs")
                   == F.array(*[F.lit(s).cast("long") for s in range(m)]))
    for expr in exprs.values():
        ok = ok & expr.isNotNull()
    guard = F.assert_true(
        ok, F.format_string(
            op + ": candidate %s carries codes %s for subspaces %s — "
            "expected " + str(m) + " codes for subspaces 0.."
            + str(m - 1) + " within the codebook range; the codes "
            "artifact is incomplete or mismatched",
            F.col("neighbor_id"),
            F.col("_codes").cast("string"),
            (F.col("_subs") if "_subs" in scored.columns
             else F.lit(None)).cast("string")))
    for out_col, expr in exprs.items():
        scored = scored.withColumn(out_col, F.when(guard.isNull(), expr))
    return scored


def residual_frame(centroids: DataFrame, lists: DataFrame) -> DataFrame:
    """(vec_id, list_label, _rv): each corpus vector's residual
    against its assigned coarse centroid — the encode input of
    FAISS-style residual IVFPQ (faiss IndexIVFPQ encodes
    x − centroid(list(x)) by default; by_residual=true). Reads the
    materialized inverted-list layout (ivf_assign / get_or_build_lists
    carry the vector alongside its label), joins the tiny centroid
    table broadcast: one map-side pass, no corpus shuffle.

    PQ training/encoding on residuals reuses the untouched quantizer
    artifacts machinery: pass this frame with ``vec_col="_rv"`` (and a
    residual-namespaced fingerprint) to get_or_train_pq /
    get_or_build_codes."""
    c = centroids.select(F.col("c_label").alias("list_label"),
                         F.col("centroid").alias("_c"))
    return (lists.join(F.broadcast(c), "list_label")
            .select("vec_id", "list_label",
                    F.zip_with("vec", "_c", lambda x, y: x - y)
                    .alias("_rv")))


def ivfpq_topk_residual(queries: DataFrame, k: int, *,
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        m: int = 4, pq_k: int = 8, dims: int = 64,
                        nprobe: int = 2, centroids: DataFrame,
                        lists: DataFrame, n_iter: int = 2,
                        sample_cap: int = 65536, round_to: int = 6,
                        codebooks: DataFrame | None = None,
                        codes: DataFrame | None = None) -> DataFrame:
    """IVF-PQ search with RESIDUAL encoding — the FAISS IndexIVFPQ
    default (by_residual): codes quantize r = x − c_list rather than x
    itself, spending the codebook's resolution on the within-list
    spread instead of re-describing the coarse structure.

    Score is cosine against the reconstruction x̂ = c_list + r̂:
      <q, x̂>  = <q, c>          (per query×probed-list scalar)
               + Σ_s <q_s, r̂_s>  (per query×subspace×code ADC table)
      |x̂|²    = |c|²            (per list scalar)
               + Σ_s (2<c_s, r̂_s> + |r̂_s|²)
                                  (per list×subspace×code cross table)
    Every term is rounded to integer MICROS, so candidate sums stay
    order-free and cross-engine exact (the ivfpq_topk contract). The
    extra cost vs raw-vector PQ is the cross table — n_lists × m ×
    pq_k rows, broadcast by construction — plus a per-(query, list)
    coarse-dot scalar already needed for probing.

    Same artifact lifecycle as ivfpq_topk: pass residual-trained
    ``codebooks``/``codes`` (see residual_frame) or let it train
    inline; codes without codebooks raises (mismatched-artifact
    guard). The corpus is defined ENTIRELY by ``lists``/``centroids``
    (residuals are x − c_list over the materialized inverted lists) —
    there is deliberately no ``vectors`` parameter: r9 accepted one
    and silently ignored it (ADVICE r9), an API trap vs ivfpq_topk.

    r10 array-codes layout, same as ivfpq_topk: one array row per
    candidate, nested per-query ADC / per-list cross tables, inline
    m-lookup sums — identical integer terms, so scores and the SQL
    oracle are unchanged."""
    if dims % m:
        raise ValueError(f"ivfpq_topk_residual: dims {dims} not "
                         f"divisible by m {m}")
    if codes is not None and codebooks is None:
        raise ValueError("ivfpq_topk_residual: codes provided without "
                         "the codebooks that produced them — pass "
                         "both persisted artifacts or neither")
    sub = dims // m
    q = queries.select(F.col(id_col).alias("query_id"),
                       _as_double(vec_col).alias("_qv"),
                       norm(_adq(vec_col)).alias("_qn"))
    res = residual_frame(centroids, lists)
    cents_by_s, code_frames = [], []
    for s in range(m):
        if codebooks is not None:
            cents = (codebooks.where(F.col("subspace") == s)
                     .select("c_label", "centroid"))
        else:
            sl = res.select(F.col("vec_id").alias("_id"),
                            F.slice("_rv", s * sub + 1, sub)
                            .alias("_sv"))
            cents = kmeans_centroids(sl, pq_k, id_col="_id",
                                     vec_col="_sv", n_iter=n_iter,
                                     sample_cap=sample_cap,
                                     round_to=round_to)
        cents_by_s.append(cents)
        if codes is None:
            sl = res.select("vec_id",
                            F.slice("_rv", s * sub + 1, sub)
                            .alias("_sv"))
            assigned = (sl.crossJoin(F.broadcast(cents))
                        .withColumn("_cs", cosine("_sv", "centroid"))
                        .groupBy("vec_id")
                        .agg(F.max_by(
                            "c_label",
                            F.struct(F.col("_cs"),
                                     (-F.col("c_label")).alias("_t")))
                            .alias("_code")))
            code_frames.append(assigned.select(
                F.col("vec_id").alias("neighbor_id"),
                F.lit(s).alias("_s"), F.col("_code")))
    codes_arr = _codes_array_frame(codes, code_frames)
    # Per-query ADC nested table: _adc[s][code+1] = <q_s, r̂_code>
    # micros — from ONE one-row nested codebook broadcast
    # (ivfpq_topk's r10 layout; same integer entries as the r9 row
    # table). r16: provided codebooks ship as a one-row LOCAL relation
    # (see ivfpq_topk — zero distributed stages to build the
    # broadcast; values bit-identical).
    if codebooks is not None:
        cb1 = _codebooks_nested_local(codebooks, m, pq_k)
    else:
        cb1 = _codebooks_nested(cents_by_s, m)
    adc_q = q.crossJoin(F.broadcast(cb1))
    adc_tbl = adc_q.select("query_id", F.expr("array(" + ", ".join(
        f"transform(element_at(_cb, {s + 1}), c -> cast(round("
        + _dot_sql(f"slice(_qv, {s * sub + 1}, {sub})", "c")
        + " * 1e6, 0) as bigint))" for s in range(m)) + ")").alias("_adc"))
    # Per-list cross nested table: _xtb[s][code+1] =
    # 2<c_{list,s}, r̂_code> + |r̂_code|² micros — n_lists rows, same
    # single nested-codebook broadcast.
    cl = centroids.select(F.col("c_label").alias("list_label"),
                          F.col("centroid").alias("_cv"))
    xt = cl.crossJoin(F.broadcast(cb1))
    cross_tbl = xt.select("list_label", F.expr("array(" + ", ".join(
        f"transform(element_at(_cb, {s + 1}), c -> cast(round("
        + _dot_sql(f"slice(_cv, {s * sub + 1}, {sub})", "c")
        + " * 2e6, 0) as bigint) + cast(round("
        + _dot_sql("c", "c")
        + " * 1e6, 0) as bigint))" for s in range(m)) + ")").alias("_xtb"))
    cn = (centroids.select("c_label", "centroid")
          .withColumn("_cn", norm("centroid")))
    probes = _nearest_lists(q, cn, "query_id", "_qv", "_qn", nprobe) \
        .withColumnRenamed("c_label", "list_label")
    # Per (query, probed list): coarse dot + |c|² scalars, micros
    pl = (probes.join(F.broadcast(cl), "list_label")
          .select("query_id", "_qn", "list_label",
                  F.round(dot("_qv", "_cv") * 1e6)
                  .cast("long").alias("_qcm"),
                  F.round(dot("_cv", "_cv") * 1e6)
                  .cast("long").alias("_cn2m")))
    # fold the per-query ADC table AND the per-list cross table into
    # the broadcast probe frame (tiny query-side joins), so the
    # candidate stream takes ONE broadcast hash join (ivfpq_topk's
    # r10 shape)
    pl_full = (pl.join(adc_tbl, "query_id")
               .join(F.broadcast(cross_tbl), "list_label"))
    cand = (F.broadcast(pl_full)
            .join(lists.select(F.col("vec_id").alias("neighbor_id"),
                               "list_label"), "list_label")
            .where(F.col("query_id") != F.col("neighbor_id")))
    scored = cand.join(codes_arr, "neighbor_id")
    scored = _fold_codes_guard(
        scored, m, "ivfpq_topk_residual",
        {"_qr": _adc_lookup_sum(m, "_adc"),
         "_xn": _adc_lookup_sum(m, "_xtb")})
    score = ((F.col("_qcm") + F.col("_qr")) / 1e6) \
        / (F.col("_qn")
           * F.sqrt((F.col("_cn2m") + F.col("_xn")) / 1e6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("_score").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("_score", score)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id",
                    (F.round("_score", 4) + F.lit(0.0))
                    .alias("score_adc")))


def random_project(vectors: DataFrame, out_dim: int = 16, *,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   dims: int = 64, seed: int = 0,
                   scale: bool = True) -> DataFrame:
    """Johnson-Lindenstrauss ±1 random projection to ``out_dim``
    dimensions: projected[j] = (1/sqrt(out_dim)) * sum_i v[i]*s(j,i)
    with the same deterministic md5-derived sign family as
    ``hyperplane_bucket`` (Achlioptas 2003: ±1 entries satisfy the JL
    lemma with the same distortion bound as Gaussians, and stay exact
    cross-engine). Component j depends only on (seed, j, dims), so a
    16-dim projection is always a prefix of a 32-dim one — callers can
    widen the sketch without recomputing the old columns.

    The standard pre-step before clustering / dedup / ANN on very
    wide embeddings: one map-only JVM pass (no shuffle, no Python)
    that shrinks the vector 4x before anything downstream shuffles
    it. Returns (id, projected ARRAY<DOUBLE>); NULL vectors project
    to NULL, a non-NULL vector of the wrong length raises (same
    contract as ``hyperplane_bucket``).
    """
    v = _as_double(vec_col)
    guard = F.assert_true(
        F.size(v) == dims,
        F.format_string(
            "random_project: vector length %s != dims " + str(dims),
            F.size(v)))
    inv = 1.0 / (out_dim ** 0.5) if scale else 1.0
    # One fold per output component, literals evaluated once per
    # component (see the hyperplane_bucket note: a literal matrix
    # inside a single fold re-evaluates per step); the whole projected
    # array parses as ONE SQL expression (the _DOT_SQL note — the
    # repr()'d scale with a D suffix is the same DoubleType literal as
    # F.lit(inv), so components are bit-identical).
    comps = F.expr("array(" + ", ".join(
        f"({_plane_proj_sql(_adq(vec_col), w)} * {inv!r}D)"
        for w in hyperplane_signs(out_dim, dims, seed)) + ")")
    out = F.when(v.isNull(),
                 F.lit(None).cast("array<double>")).otherwise(
        F.when(guard.isNull(), comps))
    return vectors.select(F.col(id_col), out.alias("projected"))


def cosine_topk_pandas(vectors: DataFrame, queries: DataFrame, k: int, *,
                       id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Arrow-batched numpy variant of cosine_topk: queries are
    collected (small by contract) and shipped in the closure; each
    Arrow batch of the corpus is scored as ONE numpy matmul.

    Same output contract as cosine_topk; per-batch partial top-k is
    emitted (k rows per query per batch), then the exact global top-k
    window runs over candidates only. For wide vectors this trades the
    expression tree for BLAS throughput.
    """
    import numpy as np

    q_rows = queries.select(F.col(id_col).alias("query_id"),
                            _as_double(vec_col).alias("qv")).collect()
    if not q_rows:
        return (vectors.sparkSession
                .createDataFrame([], "query_id long, rank int, "
                                     "neighbor_id long, score double"))
    q_ids = np.array([r["query_id"] for r in q_rows])
    qm = np.array([r["qv"] for r in q_rows], dtype=np.float64)
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    from pyspark.sql.types import (DoubleType, LongType, StructField,
                                   StructType)
    out_schema = StructType([
        StructField("query_id", LongType()),
        StructField("neighbor_id", LongType()),
        StructField("score", DoubleType())])

    def score(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            vm = np.array(list(pdf[vec_col]), dtype=np.float64)
            vm = vm / np.linalg.norm(vm, axis=1, keepdims=True)
            sims = qm @ vm.T  # (n_queries, batch)
            top = min(k + 1, sims.shape[1])
            idx = np.argpartition(-sims, top - 1, axis=1)[:, :top]
            rows = {"query_id": [], "neighbor_id": [], "score": []}
            for qi in range(len(q_ids)):
                for j in idx[qi]:
                    if ids[j] == q_ids[qi]:
                        continue
                    rows["query_id"].append(int(q_ids[qi]))
                    rows["neighbor_id"].append(int(ids[j]))
                    rows["score"].append(float(sims[qi, j]))
            yield pd.DataFrame(rows)

    cands = vectors.select(id_col, vec_col).mapInPandas(score, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc())
    return (cands.withColumn("rank", F.row_number().over(w))
                 .where(F.col("rank") <= k)
                 .select("query_id", "rank", "neighbor_id",
                         (F.round("score", 4) + F.lit(0.0)).alias("score")))


def signature_frame_pandas(vectors: DataFrame, *, id_col: str = "vec_id",
                           vec_col: str = "embedding", n_bands: int = 8,
                           band_bits: int = 8, dims: int = 64,
                           seed: int = 0,
                           passthrough: dict[str, str] | None = None,
                           ) -> DataFrame:
    """Arrow-vectorized twin of the expression signature projection in
    ``neardup_pairs_banded`` — same output frame (_id, _v, _n, _keys),
    BIT-IDENTICAL floats and keys, built with numpy instead of
    interpreted per-element folds.

    Why it exists: the expression path evaluates n_bits × dims
    higher-order-function steps per row. At this repo's synthetic
    dims=64 that is fine; at REAL embedding widths (768/1536) it is
    ~100k interpreted lambda steps per row — the one place the
    "everything is a JVM expression" rule stops scaling. This is the
    sanctioned Pandas-UDF escape hatch (same policy as multimodal):
    Arrow batches in, one vectorized multiply-add per dim, Arrow out.

    Bit-identity argument (pinned by tests): the expression fold
    computes acc ← acc + v_i·w_i sequentially in IEEE float64; the
    numpy loop accumulates over dims in the SAME order with the SAME
    float64 elementwise ops (and float32→float64 widening is exact),
    so every projection, norm, and sign — hence every band key — is
    equal, not just close. NULL vectors yield NULL columns (dropped by
    the band join downstream); a wrong-length vector raises, matching
    the expression path's assert_true.
    """
    import numpy as np
    import pandas as pd

    planes = hyperplane_signs(n_bands * band_bits, dims, seed)
    n_bits = n_bands * band_bits
    id_type = vectors.schema[id_col].dataType.simpleString()
    # passthrough: {source_col: out_col} columns copied verbatim onto
    # the signature frame (e.g. a label for hard-negative mining) —
    # saves the downstream join that re-attaching them would cost
    passthrough = passthrough or {}
    extra_schema = "".join(
        f", {out} {vectors.schema[src].dataType.simpleString()}"
        for src, out in passthrough.items())
    out_schema = (f"_id {id_type}, _v array<double>, _n double, "
                  f"_keys array<string>{extra_schema}")

    def gen(batches):
        W = np.asarray(planes, dtype=np.float64)  # (bits, dims)
        for pdf in batches:
            ids = pdf[id_col].tolist()
            cells = pdf[vec_col].tolist()
            m = len(cells)
            vs: list = [None] * m
            valid_idx = []
            for r, c in enumerate(cells):
                if c is None:
                    continue
                a = np.asarray(c, dtype=np.float64)
                if a.shape[0] != dims:
                    raise ValueError(
                        f"signature_frame_pandas: vector length "
                        f"{a.shape[0]} != dims {dims}")
                vs[r] = a
                valid_idx.append(r)
            keys_out: list = [None] * m
            n_out: list = [None] * m
            v_out: list = [None] * m
            if valid_idx:
                V = np.stack([vs[r] for r in valid_idx])
                acc = np.zeros((V.shape[0], n_bits))
                nrm = np.zeros(V.shape[0])
                # dims-sequential accumulation == the expression fold's
                # rounding order; do NOT replace with a matmul (pairwise
                # summation would differ in the last ulp and can flip a
                # boundary sign)
                for i in range(dims):
                    acc = acc + V[:, i:i + 1] * W[:, i][None, :]
                    nrm = nrm + V[:, i] * V[:, i]
                nrm = np.sqrt(nrm)
                bits = np.where(acc >= 0.0, "1", "0")
                for k, r in enumerate(valid_idx):
                    row_bits = bits[k]
                    keys_out[r] = ["".join(row_bits[b * band_bits:
                                                    (b + 1) * band_bits])
                                   for b in range(n_bands)]
                    n_out[r] = float(nrm[k])
                    v_out[r] = V[k].tolist()
            out = {"_id": ids, "_v": v_out, "_n": n_out,
                   "_keys": keys_out}
            for src, dst in passthrough.items():
                out[dst] = pdf[src]
            yield pd.DataFrame(out)

    return ensure_parallelism(vectors).mapInPandas(gen, out_schema)
