"""Deduplication operators for training-data pipelines (charter
extension — no reference counterpart, SURVEY.md §2.7).

Exact, MinHash+LSH, SimHash, and n-gram-Jaccard dedup over a document
corpus. All hashing is md5 (cross-engine reproducible: DuckDB oracles
produce identical values), all comparisons are deterministic, and every
stage is built-in-expression only (whole-stage codegen; the per-doc
signature computation is a map-only pass).

Scale design (100 TB corpus):
- signatures are computed map-side, one pass, no shuffle;
- LSH banding turns the O(n²) all-pairs problem into a groupBy on band
  keys + within-bucket pairing, so shuffle volume is (docs × bands) and
  pair generation only happens inside buckets;
- the Jaccard verify join carries shingle arrays only for candidate
  pairs (a tiny fraction of the corpus);
- exact dedup is a hash-groupBy with map-side combine.
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from quasdb_spark.functions.text import exact_fingerprint, tokens
from quasdb_spark.plans.parallel import ensure_parallelism

N_MINHASH = 8  # minhash signature length; bands of 4 → 2 bands


def shingles(text_col="text", n: int = 3) -> F.Column:
    """Distinct n-word shingles (the unit of near-dup comparison)."""
    w = tokens(text_col)
    idx = F.sequence(F.lit(0), F.size(w) - n)
    grams = F.transform(idx, lambda i: F.concat_ws(
        " ", *[F.element_at(w, (i + k + 1).cast("int")) for k in range(n)]))
    # guard: sequence(0, negative) would generate a DESCENDING sequence
    # for docs shorter than n tokens
    return F.when(F.size(w) >= n, F.array_distinct(grams)) \
            .otherwise(F.array().cast("array<string>"))


def with_shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    return df.withColumn("shingles", shingles(text_col, n))


def minhash_signature(df: DataFrame, text_col: str = "text", *,
                      n_hashes: int = N_MINHASH, shingle_n: int = 3,
                      nonempty_only: bool = False) -> DataFrame:
    """MinHash signature: for each seed, the minimum md5 over the
    document's shingles. Lexicographic min of fixed-width lowercase hex
    == numeric min, so signatures are portable strings.

    One map-only pass; O(shingles × n_hashes) per doc, all JVM-side.

    ``nonempty_only=True`` drops docs with no shingles (under
    ``shingle_n`` tokens, or NULL text) BEFORE the signature
    projection. Callers that band the output must use this instead of
    post-hoc filtering on the signature column: a Filter on a computed
    column makes Catalyst inline the generating expression into the
    Filter and evaluate it twice, interpreted — measured ~30x on the
    r8 dedup_incremental path (0.87 s -> 15 s). The predicate here is
    over the RAW text (token count >= shingle_n — exactly "shingle
    set nonempty"), so the filter costs one split(), not a second
    k-fold signature or even a second shingle build.
    """
    if "shingles" in df.columns:
        out = df
        if nonempty_only:
            out = out.where(F.size("shingles") > 0)
        out = out.withColumn("_sh", F.col("shingles"))
    else:
        out = ensure_parallelism(df)
        if nonempty_only:
            out = out.where(F.size(tokens(text_col)) >= shingle_n)
        out = out.withColumn("_sh", shingles(text_col, shingle_n))

    def hasher(seed: int):
        tag = F.lit(f"#{seed}")
        # NB: the lambda must take exactly ONE parameter — F.transform
        # passes the element index to a second parameter if present.
        return lambda s: F.md5(F.concat(s, tag))

    sig = F.array(*[
        F.array_min(F.transform(F.col("_sh"), hasher(seed)))
        for seed in range(n_hashes)])
    return out.withColumn("minhash_sig", sig).drop("_sh")


# The affine-rehash ("one-hash") MinHash scheme: hash every shingle
# ONCE, then derive each of the k minhashes as min over (a_i*h + b_i)
# mod p — the standard production construction (Broder's permutation
# family; what datasketch/Spark-ML-MinHashLSH do), turning the md5
# scheme's O(shingles × k) hashing into O(shingles + k) cheap integer
# multiply-adds. p is the smallest prime above 2^32 so the family
# covers the full 32-bit base-hash range; a < 2^31 and h < 2^32 keep
# a*h + b under 2^63 (no signed-bigint overflow in either engine).
P32 = 4294967311  # smallest prime > 2^32


def affine_params(n_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) per seed — LCG-scrambled constants,
    identical across engines/runs so signatures are reproducible and
    DuckDB oracles can mirror them."""
    return [((i * 1103515245 + 12345) % 2147483646 + 1,
             (i * 69069 + 1234567) % 2147483647)
            for i in range(n_hashes)]


def base_hash32(s: F.Column) -> F.Column:
    """Portable 32-bit shingle hash: the first 8 hex chars of md5,
    parsed as an integer (Spark conv(…,16,10); DuckDB
    ('0x'||…)::BIGINT — bit-identical both sides)."""
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint")


def base_hash32_xxh(s: F.Column) -> F.Column:
    """Production 32-bit shingle hash: JVM xxhash64 folded to its low
    32 bits. Spark-only — DuckDB exposes no XXH64 (its md5 family and
    engine-private hash() are the only options), so queries gated by
    the cross-engine oracle must stay on ``base_hash32``; this is the
    throughput path for real curation runs, where the md5 base hash is
    the dominant constant (90% of the sf100 dedup_minhash_pairs wall,
    VERDICT r12 #2). Cheaper on three axes: non-crypto hash vs md5,
    no 32-char hex string materialized per shingle, no conv() string
    parse. Same [0, 2^32) range contract as base_hash32, so the
    affine-rehash overflow bound (a*h + b < 2^63) is unchanged."""
    return F.xxhash64(s).bitwiseAND(F.lit(4294967295))


_BASE_HASHES = {"md5": base_hash32, "xxhash64": base_hash32_xxh}


def minhash_signature_fast(df: DataFrame, text_col: str = "text", *,
                           n_hashes: int = 64, shingle_n: int = 3,
                           engine: str = "arrow",
                           base_hash: str = "md5",
                           nonempty_only: bool = False) -> DataFrame:
    """Affine-rehash MinHash signature (``minhash_sig`` as
    array<bigint>): one md5 per shingle, k derived minima. This is the
    path for production widths (64-128 hashes). Same empty-shingle
    contract as the md5 scheme: docs under ``shingle_n`` tokens get an
    all-NULL signature that ``_nonempty_sig`` filters before banding.

    ``engine``: both produce BIT-IDENTICAL signatures (exact integer
    arithmetic, pinned by tests).
    - "expr": k interpreted array_min(transform(...)) folds. Measured
      at sf0.1: the k traversals, not the hashing, dominate — 64
      hashes cost ~the md5 scheme's 64 (SCALE.md §7), so this engine
      only wins for narrow signatures.
    - "arrow" (default): base hashes stay JVM-side (md5+conv), then
      ONE vectorized pandas pass computes all k minima per doc —
      (shingles × k) multiply-add-mod in numpy int64 instead of k
      interpreted traversals. The sanctioned Pandas-UDF escape hatch,
      same policy as similarity.signature_frame_pandas."""
    # Cheap raw-text pre-filter; see minhash_signature's nonempty_only
    # note (never filter on the computed signature/shingle columns).
    if "shingles" in df.columns:
        out = df
        if nonempty_only:
            out = out.where(F.size("shingles") > 0)
        out = out.withColumn("_sh", F.col("shingles"))
    else:
        out = ensure_parallelism(df)
        if nonempty_only:
            out = out.where(F.size(tokens(text_col)) >= shingle_n)
        out = out.withColumn("_sh", shingles(text_col, shingle_n))
    out = out.withColumn(
        "_bh", F.transform(F.col("_sh"), _BASE_HASHES[base_hash]))

    if engine == "arrow":
        import numpy as np
        import pandas as pd
        from pyspark.sql.types import ArrayType, LongType

        params = affine_params(n_hashes)
        av = [a for a, _ in params]
        bv = [b for _, b in params]

        # A/B'd against a fully-flattened variant (concatenate all
        # cells + one (M, k) rehash + np.minimum.reduceat over doc
        # offsets, chunked 16k-8M elements): the reduceat shape LOST at
        # every doc length (0.76-0.97x; 10k docs x 64 hashes, lengths
        # 5-15/5-100/200-600) — the per-doc numpy ops below already run
        # at int64 multiply-add-mod throughput (~12 ns/element), and
        # flattening only adds a concat copy + strided reduceat. The
        # Python loop is per-DOCUMENT (not per-element) and is not the
        # bottleneck at any realistic shingle count. See SCALE.md §4c⁴.
        @F.pandas_udf(ArrayType(LongType()))
        def _sig(bh):
            a = np.asarray(av, dtype=np.int64)  # (k,)
            b = np.asarray(bv, dtype=np.int64)
            nulls = [None] * len(a)
            res = []
            for cell in bh:
                if cell is None or len(cell) == 0:
                    res.append(nulls)
                    continue
                h = np.asarray(cell, dtype=np.int64)  # (m,), < 2^32
                # h*a + b < 2^63: exact in int64, same as the JVM path
                res.append((h[:, None] * a + b).__mod__(P32)
                           .min(axis=0).tolist())
            return pd.Series(res)

        return (out.withColumn("minhash_sig", _sig(F.col("_bh")))
                   .drop("_sh", "_bh"))

    def affine(a: int, b: int):
        # NB: the returned lambda must take exactly ONE parameter —
        # F.transform feeds the element index to any second one (and
        # default args count as parameters)
        return lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(P32)

    sig = F.array(*[
        F.array_min(F.transform(F.col("_bh"), affine(a, b)))
        for a, b in affine_params(n_hashes)])
    return out.withColumn("minhash_sig", sig).drop("_sh", "_bh")


def lsh_band_keys(sig_col: str = "minhash_sig", *, n_bands: int = 2,
                  rows_per_band: int = N_MINHASH // 2) -> list[F.Column]:
    """Band keys: md5 of each band's concatenated signature slice.
    Docs sharing any band key are near-dup candidates. The cast makes
    the keys scheme-agnostic: md5 signatures are already strings (a
    no-op) and the fast scheme's bigint minima render identically in
    Spark and DuckDB (concat_ws over integers)."""
    keys = []
    for b in range(n_bands):
        lo = b * rows_per_band
        parts = [F.element_at(F.col(sig_col), i + 1).cast("string")
                 for i in range(lo, lo + rows_per_band)]
        keys.append(F.md5(F.concat_ws("|", *parts)).alias(f"band_{b}"))
    return keys


def drop_hot_buckets(df: DataFrame, key_cols: list[str],
                     max_bucket_size: int) -> DataFrame:
    """The LSH hot-bucket skew guard shared by every banded pair
    finder (MinHash, SimHash, sign-LSH, bucketed kNN, hard-negative
    mining): drop all rows of buckets holding more than
    ``max_bucket_size`` entries, so no single degenerate key can turn
    a within-bucket pair join quadratic. Recall inside dropped buckets
    is sacrificed — callers expose the cap and default it per the
    operator's exactness contract."""
    ok = (df.groupBy(*key_cols)
            .agg(F.count(F.lit(1)).alias("__bucket_n"))
            .where(F.col("__bucket_n") <= max_bucket_size)
            .drop("__bucket_n"))
    # shuffle_hash, never broadcast: ``ok`` is ~the distinct-bucket
    # set — corpus-scale and data-dependent. Same trap class the 100x
    # sweep caught in duplicate_spans: AQE broadcasts it when its
    # compressed bytes dip under the threshold, then the deserialized
    # hash table blows the build. Both sides shuffle on the bucket
    # key anyway (ok IS a groupBy on it), so the exchange is reused.
    return df.join(ok.hint("shuffle_hash"), key_cols)


def _nonempty_sig(sig_col: str = "minhash_sig") -> F.Column:
    """True iff the MinHash signature is real — i.e. the doc had at
    least one shingle. Docs shorter than ``shingle_n`` tokens have an
    empty shingle set, so array_min over it is NULL for EVERY seed and
    concat_ws skips NULLs: all such docs would share md5('') as their
    band key in every band — one degenerate quadratic hot bucket on a
    short-doc-heavy corpus. Their pairs can never survive Jaccard
    verification (0/0 → NULL → filtered), so excluding them changes no
    verified output while removing the O(n²) bucket.

    PERF NOTE — kept for signatures materialized by someone else
    (e.g. read back from a dedup index). For signatures computed in
    the SAME plan, do NOT filter on this: Catalyst inlines the whole
    k-fold signature expression into the Filter (~30x, the r8
    dedup_incremental regression). Pass ``nonempty_only=True`` to the
    signature functions instead, which pre-filter on the cheap
    ``size(_sh) > 0`` predicate."""
    return F.element_at(F.col(sig_col), 1).isNotNull()


def minhash_candidate_pairs(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text", *,
                            n_hashes: int = N_MINHASH, n_bands: int = 2,
                            shingle_n: int = 3,
                            max_bucket_size: int | None = None,
                            scheme: str = "md5",
                            engine: str = "arrow",
                            base_hash: str = "md5",
                            _release_to: list | None = None) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash-LSH.

    shuffle = docs × n_bands rows keyed by band hash; pairs are formed
    only within buckets (self-join on band key), deduped across bands.
    Empty-shingle docs (< shingle_n tokens) are excluded up front —
    see ``_nonempty_sig``. ``max_bucket_size`` additionally drops
    degenerate hot buckets (boilerplate-heavy corpora): recall inside
    dropped buckets is sacrificed, so leave None when exactness vs the
    all-pairs result matters more than skew safety. ``scheme`` picks
    the signature family: "md5" (k independent md5 minima — the
    demo-scale default) or "fast" (affine rehash of one base hash,
    ``minhash_signature_fast`` — use for production widths);
    ``engine`` selects the fast scheme's implementation (arrow/expr,
    ignored for md5)."""
    if n_bands <= 0 or n_hashes % n_bands != 0:
        # rows_per_band = 0 would band EVERY doc on md5('') (a full
        # O(n^2) cross); a truncating divide would silently drop the
        # tail of the signature — same contract as build_dedup_index
        raise ValueError(
            f"n_bands ({n_bands}) must evenly divide n_hashes "
            f"({n_hashes})")
    rows_per_band = n_hashes // n_bands
    if scheme == "fast":
        sig = minhash_signature_fast(df, text_col, n_hashes=n_hashes,
                                     shingle_n=shingle_n, engine=engine,
                                     base_hash=base_hash,
                                     nonempty_only=True)
    else:
        sig = minhash_signature(df, text_col, n_hashes=n_hashes,
                                shingle_n=shingle_n, nonempty_only=True)
    bands = sig.select(
        F.col(id_col),
        F.explode(F.array(*[k for k in lsh_band_keys(
            n_bands=n_bands, rows_per_band=rows_per_band)])).alias("band_key"))
    # r15: persist the banded rows BEFORE the self-join. Both sides of
    # the band-key join (and the hot-bucket guard's aggregate) read
    # this frame — without the cache each side re-runs the whole
    # signature pass over the corpus (the plan showed the Arrow
    # signature UDF evaluated twice). The cached rows are (id,
    # band_key) only — docs x n_bands small rows, a tiny fraction of
    # corpus bytes (guide §5: cache when reuse beats recompute; here
    # recompute is the dominant map cost).
    bands = bands.persist()
    if _release_to is not None:
        _release_to.append(bands)
    if max_bucket_size is not None:
        bands = drop_hot_buckets(bands, ["band_key"], max_bucket_size)
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (a.join(b, (F.col("a.band_key") == F.col("b.band_key")) &
                    (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
              .select(F.col(f"a.{id_col}").alias("id_a"),
                      F.col(f"b.{id_col}").alias("id_b"))
              .distinct())
    return pairs


def jaccard_pairs(df: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", *, shingle_n: int = 3,
                  threshold: float = 0.5) -> DataFrame:
    """Verify candidate pairs with exact shingle-set Jaccard ≥ threshold.
    Arrays travel only for candidate pairs (broadcast-able when the
    candidate set is small; hash join otherwise)."""
    if "shingles" in df.columns:
        sh = df.select(id_col, "shingles")
    else:
        sh = with_shingles(ensure_parallelism(df.select(id_col, text_col)),
                           text_col, shingle_n).select(id_col, "shingles")
    j = (pairs
         .join(sh.withColumnRenamed(id_col, "id_a")
                 .withColumnRenamed("shingles", "sh_a"), "id_a")
         .join(sh.withColumnRenamed(id_col, "id_b")
                 .withColumnRenamed("shingles", "sh_b"), "id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (j.withColumn("jaccard", F.round(inter.cast("double") / union, 4))
             .where(F.col("jaccard") >= threshold)
             .select("id_a", "id_b", "jaccard"))


def near_dup_pairs(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", *, threshold: float = 0.5,
                   shingle_n: int = 3, n_hashes: int = N_MINHASH,
                   n_bands: int = 2,
                   max_bucket_size: int | None = None,
                   scheme: str = "md5",
                   engine: str = "arrow",
                   base_hash: str = "md5",
                   _release_to: list | None = None) -> DataFrame:
    """MinHash-LSH candidates → exact Jaccard verification.

    Shingles are computed ONCE and cached: the candidate-generation
    branch and the verify branch both read the same shingled
    DataFrame (at 100 TB this halves the dominant map cost; the cache
    holds shingle arrays, ~2-3× the text bytes, spilling to disk).
    ``n_hashes``/``n_bands`` set the signature width and banding —
    the defaults are demo-scale (8×2); production near-dup runs
    64-128 hashes × 8-16 bands (bench.py probes that regime, see
    SCALE.md). ``max_bucket_size`` is the LSH hot-bucket skew guard
    (see minhash_candidate_pairs) — None keeps exact parity with the
    unguarded all-candidates result."""
    # r16: cache the NARROW (id, shingles) projection, not the text —
    # every consumer (signature pass, both verify sides) reads only the
    # shingle arrays, so the raw text column was dead weight in every
    # cached block (guide §2.3 "project before the exchange" applied to
    # the cache: fewer bytes written on the cold rep, fewer read on
    # every reuse). Shingle values and row set are unchanged.
    shingled = with_shingles(
        ensure_parallelism(df.select(id_col, text_col)), text_col, shingle_n
    ).select(id_col, "shingles").persist()
    if _release_to is not None:
        _release_to.append(shingled)
    cands = minhash_candidate_pairs(shingled, id_col, text_col,
                                    n_hashes=n_hashes, n_bands=n_bands,
                                    shingle_n=shingle_n,
                                    max_bucket_size=max_bucket_size,
                                    scheme=scheme, engine=engine,
                                    base_hash=base_hash,
                                    _release_to=_release_to)
    return jaccard_pairs(shingled, cands, id_col, text_col,
                         shingle_n=shingle_n, threshold=threshold)


def cluster_assign(pairs: DataFrame, nodes: DataFrame, *,
                   id_col: str = "doc_id", a_col: str = "id_a",
                   b_col: str = "id_b", n_iter: int = 3,
                   checkpoint_every: int = 4,
                   release: list | None = None) -> DataFrame:
    """Connected components over a near-dup pair graph by UNROLLED
    min-label propagation — the pairs→clusters→keep-one step every
    near-dup pipeline runs after LSH. Every node's cluster_id becomes
    the smallest id reachable within ``n_iter`` hops, which is the true
    component id once ``n_iter`` >= the component diameter (near-dup
    components are overwhelmingly tiny — size 2-3 — because LSH pairs
    are transitively similar documents; convergence for larger
    diameters is a matter of raising ``n_iter`` or looping to a
    fixpoint, see tests).

    Scale shape (r16): label propagation runs over the TOUCHED nodes
    only — the ids that appear in the pair graph (edge endpoints are a
    subset of ``nodes`` by contract: every in-repo pair finder derives
    pairs from the same frame). An isolated node can never change its
    label (no neighbors), so rounds over the full corpus carried the
    entire node set through every iteration's joins for nothing; now
    each iteration is one TINY edge-keyed equi-join + one min-aggregate
    (both map-side combinable, proxy-sized rows — guide §2.3 "shuffle
    keys and metadata instead of payloads"), and the corpus is touched
    exactly once by a final left join that labels untouched nodes with
    their own id. Round 1 is algebraically folded: against identity
    labels, min(label(dst)) == min(dst), so it is a single aggregate
    over the edge list with no join. Labels are identical for every
    node and any n_iter. Deterministic (min is order-insensitive), so
    a SQL oracle can unroll the same rounds.
    """
    from quasdb_spark.plans.materialize import materialize

    # both directions via ONE map-side explode, not a union of two
    # projections: a union's branches are separate subtrees, so the
    # whole pair pipeline (LSH banding + exact verify over the corpus)
    # would EXECUTE TWICE to build the edge list (r16; guide §1.2
    # "don't compute things twice" — at 100 TB that second pass is the
    # dominant map cost, and locally it was ~1/3 of emb_semdedup's
    # edge-checkpoint action). Row multiset identical.
    edges = (pairs.select(F.explode(F.array(
                F.struct(F.col(a_col).alias("src"),
                         F.col(b_col).alias("dst")),
                F.struct(F.col(b_col).alias("src"),
                         F.col(a_col).alias("dst")))).alias("_e"))
             .select("_e.src", "_e.dst"))
    # The pair graph's lineage is the EXPENSIVE part (LSH banding +
    # exact verification over the corpus); every round joins against
    # it, so without materialization Spark re-runs that whole pipeline
    # once per round (measured: 22.6 s -> ~7 s for emb_semdedup at
    # sf0.1). Edges are one small row per near-dup pair — CHECKPOINT
    # them (eager, lineage-cut) rather than persist(): a persisted
    # block under executor storage pressure can be dropped and
    # recomputed from its full lineage, which at sf100 (5M docs) made
    # every propagation round re-run the candidate+verify pipeline —
    # the ~47x/decade super-linearity VERDICT r13 flagged. Once the
    # checkpoint materializes, the pair pipeline's pinned caches
    # (shingle/signature/band frames in ``release``) are dead weight:
    # materialize() unpersists them NOW instead of waiting for driver
    # GC (multi-query sessions measured 5-20x slowdowns from storage
    # churn), and upgrades to a reliable checkpoint when a checkpoint
    # dir is configured.
    edges = materialize(edges, release=release)
    if n_iter <= 0:
        return materialize(nodes.select(
            F.col(id_col), F.col(id_col).alias("cluster_id")))
    # round 1 folded: labels are the identity, so each touched node's
    # new label is least(own id, min of its neighbor ids) — one
    # aggregate over the edge list. Every endpoint appears as ``src``
    # (edges carry both directions), so this frame IS the touched set.
    labels = (edges.groupBy("src").agg(F.min("dst").alias("_m"))
              .select(F.col("src").alias("id"),
                      F.least(F.col("src"), F.col("_m")).alias("label")))
    for i in range(1, n_iter):
        nbr = (edges.join(labels, edges.dst == labels.id)
               .groupBy("src").agg(F.min("label").alias("nlab")))
        labels = (labels.join(nbr, labels.id == nbr.src, "left")
                  .select(F.col("id"),
                          F.least(F.col("label"),
                                  F.coalesce(F.col("nlab"), F.col("label")))
                          .alias("label")))
        # each round references the previous labels twice, doubling the
        # lazy plan — break lineage periodically or deep iteration
        # counts make PLANNING (not execution) the bottleneck
        if (i + 1) % checkpoint_every == 0 and (i + 1) < n_iter:
            labels = materialize(labels)
    # ONE corpus-touching stage: untouched nodes label themselves. Then
    # break the lineage before handing the result to consumers that
    # reference it more than once (cluster sizes + member join is the
    # common pattern): one row per node, evaluated once.
    out = (nodes.select(F.col(id_col))
           .join(labels, F.col(id_col) == labels.id, "left")
           .select(F.col(id_col),
                   F.coalesce(F.col("label"), F.col(id_col))
                   .alias("cluster_id")))
    return materialize(out)


def cluster_assign_cc(pairs: DataFrame, nodes: DataFrame, *,
                      id_col: str = "doc_id", a_col: str = "id_a",
                      b_col: str = "id_b", max_rounds: int = 16,
                      validate: bool = True,
                      release: list | None = None) -> DataFrame:
    """TRUE connected components over a near-dup pair graph by
    alternating large-star / small-star contraction (Kiveris et al.
    2014, "Connected Components in MapReduce and Beyond") — the
    web-scale CC engine ``cluster_assign``'s bounded-round propagation
    hands off to when component diameters can exceed a fixed hop
    budget. Each node's cluster_id is the exact minimum id of its
    component, for ANY diameter.

    Large-star connects every neighbor larger than a node to the
    minimum of its neighborhood; small-star does the same for the
    not-larger neighbors. Alternating the two strictly preserves
    connectivity and converges to a forest of stars centered at
    component minima in O(log n) rounds (vs O(diameter) for plain
    label propagation).

    Scale shape: each round is two neighborhood min-aggregates + two
    map-side projections — all shuffles are keyed by node id with
    map-side combine, no collect, and the edge set shrinks toward one
    edge per non-minimum node. Lineage is cut with an eager local
    checkpoint every round (iterative plans otherwise double per
    round); the fixpoint test is one tiny order-free aggregate
    (bit_xor of edge hashes + count) per round.

    ``validate=True`` (default) adds one O(E) consistency pass over
    the ORIGINAL pairs: both endpoints of every input pair must have
    landed in the same cluster. Contraction can only preserve
    connectivity (never bridge components), so consistency here is a
    proof of exactness — it turns "the loop says it converged" into a
    checked contract and raises instead of silently under-merging.
    """
    def canon(df: DataFrame) -> DataFrame:
        return (df.where(F.col("a") != F.col("b"))
                .select(F.least("a", "b").alias("u"),
                        F.greatest("a", "b").alias("v"))
                .distinct())

    def both_dirs(df: DataFrame) -> DataFrame:
        # ONE map-side explode, not a union of two projections — a
        # union's branches re-execute the (possibly un-checkpointed)
        # upstream subtree twice (r16; see cluster_assign's edges)
        return (df.select(F.explode(F.array(
                    F.struct(F.col("u").alias("u"),
                             F.col("v").alias("v")),
                    F.struct(F.col("v").alias("u"),
                             F.col("u").alias("v")))).alias("_e"))
                .select("_e.u", "_e.v"))

    # ONE evaluation of the expensive pair pipeline, materialized to
    # executor-local disk with lineage CUT before any round touches it
    # — every contraction round (and the final validate pass) reads
    # these blocks, never the candidate+verify lineage (VERDICT r13:
    # re-derivable caches got dropped under sf100 storage pressure and
    # each round recomputed the upstream pipeline)
    from quasdb_spark.plans.materialize import materialize

    # (r16: routed through materialize() — reliable checkpoint when a
    # dir is configured; releases the pair pipeline's caches, see
    # cluster_assign.) Input edges are NORMALIZED but not dedup'd: the
    # distinct was a full exchange+aggregate over the edge list that
    # is a no-op for every in-repo pair finder (verified pairs carry
    # id_a < id_b uniquely by construction), and for dirty inputs the
    # contraction rounds depend on edge SUPPORT only (each round's own
    # canon() restores distinctness before the fixpoint stats), so
    # labels and the validate verdict are identical either way.
    e = materialize(
        pairs.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
             .where(F.col("a") != F.col("b"))
             .select(F.least("a", "b").alias("u"),
                     F.greatest("a", "b").alias("v")),
        release=release)
    e0 = e  # the canonical input edges, for the validate pass
    prev: tuple | None = None
    for _ in range(max_rounds):
        # large-star: (node u, neighborhood min m) — every neighbor
        # v > u re-attaches to m = min(Γ(u) ∪ {u})
        nbrs = both_dirs(e)
        g = nbrs.groupBy("u").agg(F.min("v").alias("mn"))
        # e1 is normalized but NOT dedup'd (r16): the mid-round
        # distinct was a full exchange+aggregate whose only effect was
        # removing duplicate rows that the round's remaining operators
        # are insensitive to — small-star's min-aggregate and joins
        # depend on e1's SUPPORT only, and the round's final canon()
        # below restores distinctness before the fixpoint stats read
        # it. Duplicate multiplicity is bounded by |e| (each input
        # orientation contributes one row), so volume cannot blow up.
        # Round outputs, stats trajectory and labels are IDENTICAL.
        e1 = (nbrs.join(g, "u")
              .where(F.col("v") > F.col("u"))
              .select(F.col("v").alias("a"),
                      F.least("u", "mn").alias("b"))
              .where(F.col("a") != F.col("b"))
              .select(F.least("a", "b").alias("u"),
                      F.greatest("a", "b").alias("v")))
        # small-star: the not-larger neighbors (and u itself)
        # re-attach to the min of that set
        sm = both_dirs(e1).where(F.col("v") < F.col("u"))
        g2 = sm.groupBy("u").agg(F.min("v").alias("mn"))
        # NON-eager checkpoint: the fixpoint-stats job right below is
        # the first action on ``e``, so it materializes the checkpoint
        # as a side effect — one Spark job per round instead of two
        # (eager checkpoint + separate stats job); later rounds read
        # the checkpointed blocks either way.
        e = materialize(
            canon(sm.join(g2, "u")
                  .select(F.col("v").alias("a"), F.col("mn").alias("b"))
                  .union(g2.select(F.col("u").alias("a"),
                                   F.col("mn").alias("b")))),
            eager=False)
        cs = e.agg(F.expr("bit_xor(xxhash64(u, v))").alias("x"),
                   F.count(F.lit(1)).alias("n")).first()
        if prev == (cs["x"], cs["n"]):
            break
        prev = (cs["x"], cs["n"])
    else:
        raise RuntimeError(
            f"cluster_assign_cc: no fixpoint within {max_rounds} rounds")
    # star forest: every non-center node has exactly its center as the
    # smaller endpoint; centers and singletons label themselves
    lab = e.groupBy("v").agg(F.min("u").alias("_lab"))
    labels = materialize(
        nodes.select(F.col(id_col).alias("_id"))
             .join(lab, F.col("_id") == lab.v, "left")
             .select(F.col("_id").alias(id_col),
                     F.coalesce("_lab", F.col("_id"))
                     .alias("cluster_id")))
    if validate:
        # consistency is checked against the CHECKPOINTED canonical
        # edges (the same pair set, dedup'd) — referencing ``pairs``
        # here would re-run the whole LSH+verify pipeline once more
        la = labels.select(F.col(id_col).alias("u"),
                           F.col("cluster_id").alias("_ca"))
        lb = labels.select(F.col(id_col).alias("v"),
                           F.col("cluster_id").alias("_cb"))
        bad = (e0.join(la, "u").join(lb, "v")
               .where(F.col("_ca") != F.col("_cb")).limit(1).count())
        if bad:
            raise RuntimeError(
                "cluster_assign_cc: post-contraction labels split an "
                "input pair across clusters (not converged)")
    return labels


def exact_dedup(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Exact duplicate groups on normalized-text md5: every doc mapped
    to its group fingerprint, group size, and canonical (min-id) doc.
    Hash groupBy — map-side combine, shuffle one row per distinct text."""
    fp = df.select(F.col(id_col), exact_fingerprint(text_col).alias("fingerprint"))
    groups = (fp.groupBy("fingerprint")
                .agg(F.count(F.lit(1)).alias("n_docs"),
                     F.min(id_col).alias("canonical_id")))
    return groups


def ngram_overlap(corpus: DataFrame, benchmark: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text", *,
                  n: int = 3) -> DataFrame:
    """Benchmark decontamination: corpus documents sharing any distinct
    word n-gram with the benchmark set, with overlap counts — the
    standard eval-leakage check in training-data pipelines (the
    PaLM/GPT-3 style n-gram collision test).

    Scale shape: benchmark gram sets are tiny by contract (eval suites,
    not corpora) → distinct + broadcast; the corpus side is one
    map-only shingle pass + explode, the join is broadcast-hash (the
    corpus never shuffles), and the per-doc count is a partial
    aggregate. Only contaminated docs are emitted.
    """
    c = with_shingles(
        ensure_parallelism(corpus.select(id_col, text_col)), text_col, n)
    cg = c.select(F.col(id_col), F.size("shingles").alias("n_grams"),
                  F.explode("shingles").alias("_g"))
    bg = (with_shingles(benchmark.select(text_col), text_col, n)
          .select(F.explode("shingles").alias("_g")).distinct())
    return (cg.join(F.broadcast(bg), "_g")
              .groupBy(id_col, "n_grams")
              .agg(F.count(F.lit(1)).alias("n_overlap"))
              .withColumn("overlap_frac",
                          F.round(F.col("n_overlap").cast("double")
                                  / F.col("n_grams"), 4))
              .select(id_col, "n_grams", "n_overlap", "overlap_frac"))


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            *, bits: int = 60) -> DataFrame:
    """SimHash over distinct tokens: bit i of the hash is 1 iff a
    majority of token-md5s have bit i set (ties → 0). Emitted as a
    ``bits``-char '0'/'1' string (MSB first) — portable, no int64
    overflow concerns.

    Implemented as explode(tokens) → md5 → per-bit conditional sums in
    ONE hash aggregate (map-side partial agg; shuffle is docs × 1 row of
    ``bits`` counters). Hex digits are decoded arithmetically so the
    DuckDB oracle can mirror it exactly.
    """
    n_digits = (bits + 3) // 4
    toks = (ensure_parallelism(df)
              .select(F.col(id_col),
                      F.explode(F.array_distinct(tokens(text_col))).alias("_t")))
    if bits <= 60:
        # r15: decode the leading hex chars ONCE into a single bigint
        # (4·n_digits ≤ 60 bits < 2^63, so conv() is exact and
        # non-negative) and count bit i as sum(shiftright(h, s) & 1).
        # Same bit values as the per-digit decode — bit i of the
        # MSB-first hex prefix sits at shift 4·n_digits − 1 − i — at a
        # fraction of the work: one conv() per token row instead of
        # n_digits instr() string searches, and a two-op bitwise
        # aggregate instead of div/mod/case per bit (guide §1.2 "per-
        # task work"). The whole aggregate + bit-string projection is
        # built as THREE parsed expressions, not 4·bits Column objects
        # — at small SFs driver-side plan construction was a measured
        # ~0.9 s of this query's wall.
        toks = toks.select(
            F.col(id_col),
            F.expr(f"cast(conv(substring(md5(_t), 1, {n_digits}), 16, 10) "
                   "as bigint)").alias("_h"))
        agg_sql = "struct(" + ", ".join(
            f"sum(shiftright(_h, {4 * n_digits - 1 - i}) & 1) as c{i}"
            for i in range(bits)) + ")"
        counted = toks.groupBy(id_col).agg(
            F.expr("count(1)").alias("_n"), F.expr(agg_sql).alias("_c"))
        bit_sql = "concat(" + ", ".join(
            f"if(_c.c{i} * 2 > _n, '1', '0')" for i in range(bits)) + ")"
        return counted.select(F.col(id_col),
                              F.expr(bit_sql).alias("simhash"),
                              F.col("_n").alias("n_tokens"))
    # generic path (bits > 60: the decoded prefix would not fit a
    # signed bigint) — per-digit decode, per-bit div/mod counting
    toks = (toks.withColumn("_h", F.md5(F.col("_t")))
              # decode each hex digit ONCE per row (4 bits share it)
              # instead of once per bit — same integer values, 1/4 the
              # string-search work in the hot aggregate
              .select(id_col, *[
                  F.expr(f"instr('0123456789abcdef', substring(_h, {p + 1}, 1)) - 1")
                   .alias(f"_d{p}") for p in range(n_digits)]))
    aggs, names = [], []
    for i in range(bits):
        pos = i // 4       # hex char position, 0-based
        bit = i % 4        # bit within that hex digit, 3=MSB of digit
        expr = f"sum(case when ((_d{pos}) div {2 ** (3 - bit)}) % 2 = 1 then 1 else 0 end)"
        name = f"_c{i}"
        aggs.append(F.expr(expr).alias(name))
        names.append(name)
    counted = toks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_n"), *aggs)
    bitstr = F.concat(*[
        F.when(F.col(n) * 2 > F.col("_n"), F.lit("1")).otherwise(F.lit("0"))
        for n in names])
    return counted.select(F.col(id_col), bitstr.alias("simhash"),
                          F.col("_n").alias("n_tokens"))


def simhash_hamming_pairs_banded(sim: DataFrame, id_col: str = "doc_id", *,
                                 max_hamming: int = 3, bits: int = 60,
                                 n_bands: int | None = None,
                                 max_bucket_size: int | None = None,
                                 _release_to: list | None = None) -> DataFrame:
    """FULL-RECALL near-dup pairs by SimHash Hamming distance via the
    Manku rotated-block trick (Detecting Near-Duplicates for Web
    Crawling, WWW'07): split the ``bits``-bit hash into
    ``max_hamming + 1`` blocks — by pigeonhole, two hashes differing in
    at most ``max_hamming`` bits agree on at least one WHOLE block, so
    block-equality banding never misses a pair inside the budget, and
    the exact Hamming verify keeps precision at 1. The banded result is
    therefore EXACTLY the all-pairs result, with no cross join.

    Scale shape (mirrors neardup_pairs_banded): bands table is a
    map-only posexplode (docs × n_bands rows); the self-equi-join on
    (band, block value) is a shuffle hash join, quadratic only within a
    bucket (each band has 2^(bits/n_bands) buckets — with the default
    3-of-60 budget, 4 bands × 32768 buckets). ``max_bucket_size`` drops
    degenerate hot buckets (skew guard; sacrifices the exactness
    guarantee for those buckets — leave None for exact).
    """
    n_bands = n_bands or (max_hamming + 1)
    base, extra = divmod(bits, n_bands)
    # band b covers [off_b, off_b + w_b): first `extra` bands one wider
    offs, widths, off = [], [], 1
    for b in range(n_bands):
        w = base + (1 if b < extra else 0)
        offs.append(off)
        widths.append(w)
        off += w
    # r15: ``sim`` is usually a full corpus aggregation (dedup.simhash)
    # and this function reads it four ways (both sides of the band
    # self-join + both verify sides) — persist the (id, simhash) rows
    # so the upstream aggregate runs once, not four times. Tiny rows:
    # id + ``bits`` chars (guide §5: reuse beats recompute).
    s = sim.select(F.col(id_col).alias("_id"), "simhash").persist()
    if _release_to is not None:
        _release_to.append(s)
    keys = F.array(*[F.substring("simhash", offs[b], widths[b])
                     for b in range(n_bands)])
    bands = s.select("_id", F.posexplode(keys).alias("_band", "_key"))
    if max_bucket_size is not None:
        bands = drop_hot_buckets(bands, ["_band", "_key"], max_bucket_size)
    a = bands.select(F.col("_id").alias("id_a"), "_band", "_key")
    b = bands.select(F.col("_id").alias("id_b"), "_band", "_key")
    cand = (a.join(b, ["_band", "_key"])
             .where(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b").distinct())
    sh = s.select(F.col("_id"), F.col("simhash"))
    pairs = (cand
             .join(sh.select(F.col("_id").alias("id_a"),
                             F.col("simhash").alias("sh_a")), "id_a")
             .join(sh.select(F.col("_id").alias("id_b"),
                             F.col("simhash").alias("sh_b")), "id_b"))
    ham = F.size(F.filter(
        F.zip_with(F.split("sh_a", ""), F.split("sh_b", ""),
                   lambda x, y: x != y),
        lambda v: v))
    return (pairs.withColumn("hamming", ham)
                 .where(F.col("hamming") <= max_hamming)
                 .select("id_a", "id_b", "hamming"))


def simhash_hamming_pairs(sim: DataFrame, id_col: str = "doc_id", *,
                          max_hamming: int = 8, prefix_bits: int = 12) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, bucketed by ONE bit
    prefix so only same-prefix docs are compared — the cheap
    PARTIAL-RECALL variant (misses pairs whose differing bits land in
    the prefix). ``simhash_hamming_pairs_banded`` is the full-recall
    rotated-block version (Manku); this one stays for the loose-budget
    regime (large max_hamming) where banding degenerates.
    """
    s = sim.select(F.col(id_col), "simhash",
                   F.substring("simhash", 1, prefix_bits).alias("_bucket")) \
           .persist()  # both self-join sides re-run ``sim`` otherwise
    a, b = s.alias("a"), s.alias("b")
    pairs = (a.join(b, (F.col("a._bucket") == F.col("b._bucket")) &
                    (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
              .select(F.col(f"a.{id_col}").alias("id_a"),
                      F.col(f"b.{id_col}").alias("id_b"),
                      F.col("a.simhash").alias("sh_a"),
                      F.col("b.simhash").alias("sh_b")))
    # hamming distance between equal-length bit strings
    ham = F.size(F.filter(
        F.zip_with(F.split("sh_a", ""), F.split("sh_b", ""),
                   lambda x, y: x != y),
        lambda v: v))
    return (pairs.withColumn("hamming", ham)
                 .where(F.col("hamming") <= max_hamming)
                 .select("id_a", "id_b", "hamming"))


# ---------------------------------------------------------------------
# Incremental near-dup index: the production "daily batch vs existing
# corpus" shape. The corpus's banded MinHash entries are MATERIALIZED
# once as a Parquet artifact (maintenance, like the IVF inverted
# lists); each new batch computes its own signatures map-only and
# joins the index on band keys — the corpus TEXT is never rescanned
# and never reshuffled. At 100 TB: the index is ~docs x n_bands small
# rows; a daily batch is tiny relative to it, so AQE broadcasts the
# batch side and the check is one index scan, no corpus pass at all.
# ---------------------------------------------------------------------

def _index_signature(df: DataFrame, text_col: str, meta: dict) -> DataFrame:
    """Signature a frame under an index's PERSISTED scheme params —
    the single place build/check/append derive their hashing from, so
    a probe can never mix schemes with the index it joins (VERDICT r13
    #5: the xxhash64 production path must reach the incremental
    curation shape; the sidecar records scheme+base_hash and every
    consumer goes through here)."""
    scheme = meta.get("scheme", "md5")
    if scheme == "fast":
        return minhash_signature_fast(
            df, text_col, n_hashes=meta["n_hashes"],
            shingle_n=meta["shingle_n"],
            base_hash=meta.get("base_hash", "md5"), nonempty_only=True)
    if scheme != "md5":
        raise ValueError(f"dedup index scheme {scheme!r} unknown "
                         "(expected 'md5' or 'fast') — the index meta "
                         "is from a newer writer or corrupted")
    return minhash_signature(df, text_col, n_hashes=meta["n_hashes"],
                             shingle_n=meta["shingle_n"],
                             nonempty_only=True)


def build_dedup_index(df: DataFrame, path: str, *, id_col: str = "doc_id",
                      text_col: str = "text", n_hashes: int = N_MINHASH,
                      n_bands: int = 2, shingle_n: int = 3,
                      mode: str = "overwrite",
                      scheme: str = "md5",
                      base_hash: str = "md5") -> dict:
    """Materialize the banded-MinHash index of ``df`` at ``path``:
    one row per (band, band_key, doc_id) carrying the full signature,
    partitioned by band and sorted by band_key within files (row-group
    min/max then prunes band-key range scans). Returns the params
    dict, also written as ``_dedup_index_meta.json`` so
    ``load_dedup_index`` can refuse mismatched probes.

    ``scheme``/``base_hash`` select the signature engine and are
    PERSISTED in the sidecar: ``scheme='fast', base_hash='xxhash64'``
    is the production path (one non-crypto hash per shingle + one
    vectorized Arrow rehash — the 5x constant-cut measured at sf100,
    SCALE.md §7b) for daily curation runs; the md5 default stays the
    cross-engine-oracle anchor. check/append derive their hashing from
    the sidecar, never from caller args, so probes cannot mix schemes
    with the index they join.

    The sidecar goes through the same Hadoop-FS resolver as the
    parquet (fsio.write_text: temp name + rename AFTER the parquet job
    succeeds), so the index works on hdfs://s3a:// paths and a failed
    build never leaves a half-written meta."""
    import json

    from .. import fsio

    if n_hashes % n_bands:
        raise ValueError("n_bands must divide n_hashes")
    rows_per_band = n_hashes // n_bands
    meta = {"n_hashes": n_hashes, "n_bands": n_bands,
            "shingle_n": shingle_n, "scheme": scheme,
            "base_hash": base_hash}
    sig = _index_signature(df.select(id_col, text_col), text_col, meta)
    keys = lsh_band_keys(n_bands=n_bands, rows_per_band=rows_per_band)
    entries = sig.select(
        F.col(id_col).alias("doc_id"),
        F.col("minhash_sig").cast("array<string>").alias("minhash_sig"),
        F.posexplode(F.array(*keys)).alias("band", "band_key"))
    (entries.repartition("band").sortWithinPartitions("band_key")
            .write.mode(mode).partitionBy("band").parquet(path))
    # record bucket-shape stats at build so the per-probe health check
    # (ensure_banded — the index's maybe_compact tick) is sidecar-only
    # until the next append: the same counts-at-write trick as the ANN
    # lists' n_vectors (VERDICT r14 board #2)
    meta["bucket_stats"] = index_bucket_stats(
        df.sparkSession.read.parquet(path))
    fsio.write_text(df.sparkSession, f"{path}/_dedup_index_meta.json",
                    json.dumps(meta))
    meta["path"] = path
    return meta


def load_dedup_index(spark, path: str) -> tuple[DataFrame, dict]:
    import json

    from .. import fsio

    # open-handle memo (the quantizer._DF_MEMO pattern): per (Spark
    # app, path, sidecar mtime) the parsed meta and the lazy scan
    # DataFrame are reused — a DataFrame holds no data, and every
    # append/reband rewrites the sidecar, bumping the mtime. Probing
    # queries were re-paying sidecar read + datasource resolution on
    # every call (~0.1-0.2 s at sf0.1). POSIX-path only: remote
    # sidecars (s3a/hdfs) have no local mtime, so they take the
    # uncached branch unchanged.
    mtime = _sidecar_mtime(path)
    mk = (spark.sparkContext.applicationId, path, mtime)
    if mtime is not None:
        with _IDX_LOCK:
            hit = _IDX_MEMO.get(mk)
        if hit is not None:
            df, meta = hit
            return df, dict(meta)
    meta = json.loads(
        fsio.read_text(spark, f"{path}/_dedup_index_meta.json"))
    # in-memory only (never persisted): where this index was actually
    # loaded from — ensure_banded needs it to re-band/persist, same as
    # the ANN sidecars' path stamping (quantizer._ensure_meta)
    meta["path"] = path
    df = spark.read.parquet(path)
    if mtime is not None:
        with _IDX_LOCK:
            _IDX_MEMO[mk] = (df, dict(meta))
    return df, dict(meta)


def check_against_index(new_df: DataFrame, index: DataFrame, meta: dict,
                        *, id_col: str = "doc_id",
                        text_col: str = "text",
                        min_est_jaccard: float = 0.5,
                        broadcast_new: bool = True,
                        maintenance: str = "auto",
                        max_bucket_rows: int | None = None) -> DataFrame:
    """Near-dups of ``new_df`` against an indexed corpus WITHOUT
    touching corpus text: signature the new batch (map-only), join the
    index on (band, band_key), then keep pairs whose
    signature-ESTIMATED Jaccard (fraction of equal MinHash components
    — the unbiased MinHash estimator) clears ``min_est_jaccard``.
    Returns (new_id, match_id, est_jaccard) with one row per surviving
    pair. ``broadcast_new`` force-broadcasts the new batch's banded
    rows — correct for the daily-batch shape; pass False for a
    backfill-sized batch and let AQE decide.

    The batch is signatured under the INDEX's persisted scheme params
    (_index_signature reads the sidecar ``meta``) — a fast/xxhash64
    index probes with fast/xxhash64 signatures by construction; there
    is no caller knob to mix schemes.

    ``maintenance`` (default ``'auto'``) is the index's self-scheduled
    health tick (ensure_banded — the ensure_tuned analogue, VERDICT
    r14 board #2): every probe shape-checks the index against its
    sidecar (free when build/append recorded stats) and a
    shape-broken index — hottest bucket over ``max_bucket_rows`` —
    is re-banded from its own stored signatures before probing.
    ``'error'`` refuses loudly, ``'off'`` skips the check."""
    if maintenance != "off":
        tuned = ensure_banded(index, meta, mode=maintenance,
                              max_bucket_rows=max_bucket_rows)
        index, meta = tuned["index"], tuned["meta"]
    n_hashes, n_bands = meta["n_hashes"], meta["n_bands"]
    rows_per_band = n_hashes // n_bands
    sig = _index_signature(new_df.select(id_col, text_col), text_col,
                           meta)
    keys = lsh_band_keys(n_bands=n_bands, rows_per_band=rows_per_band)
    bands_new = sig.select(
        F.col(id_col).alias("new_id"),
        F.col("minhash_sig").cast("array<string>").alias("new_sig"),
        F.posexplode(F.array(*keys)).alias("band", "band_key"))
    if broadcast_new:
        bands_new = F.broadcast(bands_new)
    cand = (index.join(bands_new, ["band", "band_key"])
                 .select("new_id", "new_sig",
                         F.col("doc_id").alias("match_id"),
                         "minhash_sig")
                 .dropDuplicates(["new_id", "match_id"]))
    est = (F.size(F.filter(
        F.zip_with(F.col("new_sig"), F.col("minhash_sig"),
                   lambda x, y: x == y), lambda v: v))
        .cast("double") / n_hashes)
    return (cand.withColumn("est_jaccard", F.round(est, 4))
                .where(F.col("est_jaccard") >= min_est_jaccard)
                .select("new_id", "match_id", "est_jaccard"))


def append_to_index(new_df: DataFrame, path: str, *,
                    id_col: str = "doc_id", text_col: str = "text",
                    maintenance: str = "auto",
                    max_bucket_rows: int | None = None) -> None:
    """Fold a checked batch into the index (the add() half): computes
    the batch's banded entries under the INDEX's persisted params and
    appends — no rebuild, no corpus pass. Run after check_against_index
    has decided which docs to keep; dedup policy (append all vs only
    keepers) is the caller's.

    The append records itself in the sidecar op-trail and drops the
    recorded bucket stats (the shape changed); ``maintenance`` then
    fires the health tick (ensure_banded) on the grown index — the
    write-path half of the self-maintenance contract, like the
    embedded store's auto_compact-after-commit."""
    import json

    from .. import fsio

    meta = json.loads(
        fsio.read_text(new_df.sparkSession, f"{path}/_dedup_index_meta.json"))
    rows_per_band = meta["n_hashes"] // meta["n_bands"]
    # hashing comes from the index's persisted params — an append can
    # never fold differently-schemed signatures into the artifact
    sig = _index_signature(new_df.select(id_col, text_col), text_col,
                           meta)
    keys = lsh_band_keys(n_bands=meta["n_bands"],
                         rows_per_band=rows_per_band)
    entries = sig.select(
        F.col(id_col).alias("doc_id"),
        F.col("minhash_sig").cast("array<string>").alias("minhash_sig"),
        F.posexplode(F.array(*keys)).alias("band", "band_key"))
    (entries.repartition("band").sortWithinPartitions("band_key")
            .write.mode("append").partitionBy("band").parquet(path))
    # the append changed the index's bucket shape: record the op and
    # drop the recorded stats so the next health check re-measures
    # (and the sidecar rewrite invalidates the ensure_banded memo) —
    # the append_to_lists n_vectors-pop discipline
    meta.pop("bucket_stats", None)
    meta["ops"] = (meta.get("ops") or []) + ["append"]
    fsio.write_text(new_df.sparkSession, f"{path}/_dedup_index_meta.json",
                    json.dumps({k: v for k, v in meta.items()
                                if k != "path"}))
    if maintenance != "off":
        meta["path"] = path
        ensure_banded(new_df.sparkSession.read.parquet(path), meta,
                      mode=maintenance, max_bucket_rows=max_bucket_rows)


# ---------------------------------------------------------------------
# Dedup-index self-maintenance (VERDICT r14 board #2): the banded
# index's n_bands are fixed at build, but the corpus it indexes grows
# via append_to_index — band buckets get hotter and every probe joins
# more candidates per key, the exact shape-degradation the ANN side
# repairs with ensure_tuned. ensure_banded is the same contract for
# the dedup index: a sidecar-counted bucket-size health check fired
# from the probe/append paths, with auto-re-band / refuse-loudly /
# off modes, persisted params, and the op-trail. Reference lens:
# every index maintains itself from its read/write paths
# (kv/db/version_set.cpp:475-489 seek stats -> compaction).
# ---------------------------------------------------------------------

# A band bucket larger than this makes one probe key join more
# candidate rows than a 64k-doc brute scan would — the same
# shape-broken bar as the ANN side (quantizer._AUTO_MAX_LIST_ROWS).
# Corpus-x-corpus PAIR generation (bucket² blowup) wants a much
# smaller cap — those paths keep their own drop_hot_buckets guards.
_AUTO_MAX_BUCKET_ROWS = 65536

# healthy-verdict memo: (index path, sidecar mtime_ns, cap) -> stats.
# Sidecar rewrites (append/reband) bump the mtime, invalidating it.
_BANDED_MEMO: dict[tuple, dict] = {}

# open-handle memo for load_dedup_index: (app id, path, sidecar
# mtime_ns) -> (scan DataFrame, parsed meta). Same invalidation rule
# as _BANDED_MEMO; callers get a fresh dict copy of the meta.
_IDX_MEMO: dict[tuple, tuple] = {}
_IDX_LOCK = threading.Lock()


def index_bucket_stats(index: DataFrame) -> dict:
    """Bucket-shape stats of a banded index in ONE aggregation job:
    the max and count of (band, band_key) bucket sizes plus the total
    entry count. Partial aggregation runs map-side; the shuffle is
    keys-only."""
    row = (index.groupBy("band", "band_key").count()
           .agg(F.max("count").alias("mx"),
                F.sum("count").alias("n"),
                F.count(F.lit(1)).alias("k"))
           .collect()[0])
    return {"max_bucket": int(row["mx"] or 0),
            "n_keys": int(row["k"] or 0),
            "n_entries": int(row["n"] or 0)}


def _sidecar_mtime(path: str):
    try:
        return os.stat(
            os.path.join(path, "_dedup_index_meta.json")).st_mtime_ns
    except OSError:
        return None


def ensure_banded(index: DataFrame, meta: dict, *, mode: str = "auto",
                  max_bucket_rows: int | None = None,
                  target_bands: int | None = None) -> dict:
    """The dedup index's read/write-path maintenance tick — the exact
    analogue of quantizer.ensure_tuned for the banded-MinHash index
    (VERDICT r14 board #2): called by check_against_index and
    append_to_index, it health-checks the index's bucket shape from
    its sidecar (zero Spark jobs when build/append recorded stats —
    build does; an append drops them so the next probe re-measures
    once) and, when the largest (band, band_key) bucket exceeds
    ``max_bucket_rows`` (default 65536):

    - ``mode='auto'``: RE-BAND from the index's own stored signatures
      (no corpus text pass, the retrain-on-the-lists'-own-vectors
      trick): candidate bandings are the divisors of n_hashes below
      the current n_bands, largest first (longer band keys = more
      selective buckets, least recall sacrificed); the first whose
      measured max bucket clears the cap wins, and the index is
      rewritten in place under the new banding with the op-trail
      (``ops += ['reband']``, ``rebanded_from``) and fresh stats in
      the sidecar. Fewer/longer bands raise the effective candidate
      threshold s* ≈ (1/b)^(1/r): high-similarity pairs still
      collide, low-similarity candidates are pruned — probe cost
      stays bounded at a bounded recall cost, which the sidecar
      records instead of hiding.
    - ``mode='error'``: raise StaleIndexError naming the blowup.
    - ``mode='off'``: no check (legacy behavior).

    If even banding at n_bands=1 (the full signature as one key)
    leaves a bucket over the cap, the mass is IDENTICAL signatures —
    true duplicate content no banding can separate — and ensure_banded
    refuses loudly in every mode: the fix is deduplicating the corpus,
    not re-banding the index.

    A healthy verdict is memoized per (path, sidecar mtime, cap);
    re-bands to the same index are serialized by an flock (single
    winner; losers reload the finished artifact) — the ensure_tuned
    concurrency contract. Returns {"rebanded", "index", "meta",
    "stats"}."""
    import json

    from .. import fsio

    out = {"rebanded": False, "index": index, "meta": meta,
           "stats": meta.get("bucket_stats")}
    if mode == "off":
        return out
    if mode not in ("auto", "error"):
        raise ValueError(f"ensure_banded: unknown mode {mode!r} "
                         "(expected 'auto', 'error' or 'off')")
    path = meta.get("path")
    if not path:
        return out  # unstamped frame — nothing to enforce, as check_fresh
    cap = max_bucket_rows if max_bucket_rows is not None \
        else _AUTO_MAX_BUCKET_ROWS
    spark = index.sparkSession
    mt = _sidecar_mtime(path)
    if mt is not None:
        verdict = _BANDED_MEMO.get((path, mt, cap))
        if verdict is not None:
            out["stats"] = verdict
            return out
    sidecar = f"{path}/_dedup_index_meta.json"
    # On a memo miss the SIDEcar is the source of truth, not the
    # caller's meta dict: a handle loaded before an append still
    # carries pre-append stats in memory, and memoizing those under
    # the post-append mtime would hide the growth the tick exists to
    # catch. Reading the sidecar happens once per (path, mtime).
    try:
        side_meta = json.loads(fsio.read_text(spark, sidecar))
        meta = {**side_meta, "path": path}
    except Exception:
        pass  # unreadable sidecar: fall back to the caller's dict
    stats = meta.get("bucket_stats")
    if stats is None:
        # append (or a pre-stats build) left the shape unrecorded:
        # measure ONCE and persist, so every later check is free
        stats = index_bucket_stats(index)
        meta = {**meta, "bucket_stats": stats}
        try:
            fsio.write_text(spark, sidecar,
                            json.dumps({k: v for k, v in meta.items()
                                        if k != "path"}))
            mt = _sidecar_mtime(path)
        except Exception:
            pass
        meta["path"] = path
    out["stats"], out["meta"] = stats, meta
    if stats["max_bucket"] <= cap:
        if mt is not None:
            _BANDED_MEMO[(path, mt, cap)] = stats
        return out

    from quasdb_spark.operators.quantizer import StaleIndexError

    n_hashes, n_bands = meta["n_hashes"], meta["n_bands"]
    if mode == "error":
        raise StaleIndexError(
            f"dedup index is SHAPE-BROKEN for its corpus: hottest "
            f"band bucket holds {stats['max_bucket']} entries "
            f"(cap {cap}) — one probe key joins that many candidates. "
            f"Re-band to fewer/longer bands (ensure_banded with "
            f"maintenance='auto') or rebuild (build_dedup_index)")
    # ---- auto re-band, single winner (flock; losers reload) ----
    import fcntl

    # the lock lives NEXT TO the index dir, not inside it: the
    # in-place overwrite deletes the dir, and a lock file deleted
    # under the holder would let a second winner recreate+acquire it
    # mid-write. On non-POSIX paths (hdfs://, s3a://) the local open
    # fails — proceed unlocked (best-effort; the sidecar publish is
    # still atomic via fsio's temp+rename, so the worst case is a
    # redundant double re-band, not a torn index)
    try:
        lock_fd = os.open(path.rstrip("/") + ".reband.lock",
                          os.O_CREAT | os.O_RDWR, 0o644)
    except OSError:
        lock_fd = None
    try:
        if lock_fd is not None:
            fcntl.flock(lock_fd, fcntl.LOCK_EX)
        now = _sidecar_mtime(path)
        if now is not None and mt is not None and now != mt:
            # another handle rebanded while we waited: reload
            idx2, meta2 = load_dedup_index(spark, path)
            return {"rebanded": True, "index": idx2, "meta": meta2,
                    "stats": meta2.get("bucket_stats")}
        # signatures in hand — one distinct row per doc, eagerly
        # checkpointed so the in-place overwrite can't chase its own
        # input files (the cluster_assign edges discipline)
        sigs = (index.select("doc_id", "minhash_sig")
                .dropDuplicates(["doc_id"]).localCheckpoint())
        cands = [target_bands] if target_bands else \
            [d for d in range(n_bands - 1, 0, -1) if n_hashes % d == 0]
        chosen, chosen_stats = None, None
        for d in cands:
            keys = lsh_band_keys(n_bands=d,
                                 rows_per_band=n_hashes // d)
            ent = sigs.select(
                F.posexplode(F.array(*keys)).alias("band", "band_key"))
            st = index_bucket_stats(ent)
            if st["max_bucket"] <= cap:
                chosen, chosen_stats = d, st
                break
        if chosen is None:
            if target_bands:
                raise StaleIndexError(
                    f"re-band to n_bands={target_bands} still leaves "
                    f"a bucket over the cap ({cap}) — pick a smaller "
                    "target (longer keys) or let auto choose "
                    "(target_bands=None)")
            raise StaleIndexError(
                f"dedup index bucket of {stats['max_bucket']} entries "
                f"(cap {cap}) is IDENTICAL-signature mass: even "
                f"banding the full {n_hashes}-hash signature as one "
                "key leaves it hot. No re-banding separates true "
                "duplicates — deduplicate the corpus (exact_dedup / "
                "apply_dedup) and rebuild the index")
        keys = lsh_band_keys(n_bands=chosen,
                             rows_per_band=n_hashes // chosen)
        entries = sigs.select(
            "doc_id",
            F.col("minhash_sig").cast("array<string>")
            .alias("minhash_sig"),
            F.posexplode(F.array(*keys)).alias("band", "band_key"))
        (entries.repartition("band").sortWithinPartitions("band_key")
                .write.mode("overwrite").partitionBy("band")
                .parquet(path))
        meta2 = {k: v for k, v in meta.items() if k != "path"}
        meta2["rebanded_from"] = n_bands
        meta2["n_bands"] = chosen
        meta2["bucket_stats"] = chosen_stats
        meta2["ops"] = (meta2.get("ops") or []) + ["reband"]
        fsio.write_text(spark, sidecar, json.dumps(meta2))
        meta2["path"] = path
        return {"rebanded": True, "index": spark.read.parquet(path),
                "meta": meta2, "stats": chosen_stats}
    finally:
        if lock_fd is not None:
            fcntl.flock(lock_fd, fcntl.LOCK_UN)
            os.close(lock_fd)


def duplicate_spans(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", *, k: int = 8,
                    min_count: int = 2,
                    keep_first: bool = False) -> DataFrame:
    """Exact-substring duplicate spans (the hashed-window
    approximation of Lee et al.'s suffix-array exact-substring dedup,
    "Deduplicating Training Data Makes Language Models Better"): every
    k-token window whose hash occurs >= ``min_count`` times in the
    corpus (same doc or across docs) is a duplicated window;
    overlapping duplicated windows merge into one (doc, span) —
    returns (id, span_start, span_end) in TOKEN positions
    (end exclusive), the spans a cleaning pass would drop.

    ``keep_first=True`` implements the keep-one-occurrence policy: for
    each duplicated window hash, the single occurrence at the smallest
    (id, position) is NOT reported, so dropping every reported span
    still leaves at least one copy of each duplicated substring.

    100 TB shape:
    - window extraction is MAP-ONLY (in-row sequence explode + array
      slice, the doc_chunking pattern): one row per token position,
      so the exploded volume ~ corpus token count — linear, known up
      front;
    - the only shuffles are a hash-count aggregate (map-side partial
      combine; shuffle bytes ~ distinct windows) and the join of
      windows back to over-threshold hashes; span merging is one
      window function partitioned BY DOC (never global);
    - the window hash is md5 over the LENGTH-PREFIXED token slice
      (each token rendered ``len:token`` before joining): token
      boundaries stay unambiguous for ANY token content — a bare
      separator join is not enough, because the whitespace tokenizer
      (Java \\s = [ \\t\\n\\x0B\\f\\r]) does NOT split on other control
      characters, so tokens can contain the separator byte. Exact
      matching, cross-engine reproducible, no Python anywhere.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    toks = F.coalesce(tokens(text_col), F.array(F.lit("")))
    # length-prefix each token ONCE PER DOC (before the window
    # explode); per-window work is then slice + concat_ws + md5 over
    # ready-made strings. Prefixing inside the per-window transform
    # re-ran length+concat k times per token position — 2.5x the whole
    # extraction pass at sf0.1 (1.75 s -> 0.70 s), and the extraction
    # runs twice (count side + join side). Hash bytes are identical.
    pref = F.transform(toks, lambda t: F.concat(
        F.length(t).cast("string"), F.lit(":"), t))
    base = (df.select(F.col(id_col).alias("_id"), pref.alias("_p"),
                      F.size(toks).alias("_n"))
              .where(F.col("_n") >= k))
    wins = (base.select(
                "_id", "_p",
                F.explode(F.sequence(F.lit(0), F.col("_n") - k))
                 .alias("pos"))
                .select("_id", "pos",
                        F.md5(F.concat_ws(
                            "\x1f",
                            F.slice(F.col("_p"), F.col("pos") + 1, k)))
                         .alias("_h")))
    hot = (wins.groupBy("_h")
               .agg(F.count(F.lit(1)).alias("_c"))
               .where(F.col("_c") >= min_count)
               .select("_h"))
    # shuffle_hash, NEVER broadcast: ``hot`` is the duplicated-window
    # hash set — data-dependent and unbounded (grows with corpus
    # duplication), so letting AQE broadcast it when its compressed
    # shuffle bytes happen to dip under the threshold is a scale trap:
    # the 100x sweep caught exactly that ("Not enough memory to build
    # and broadcast the table" at sf10 — the deserialized hash table
    # is many times the compressed estimate, and at 100 TB it would
    # be GBs). Both sides already shuffle on _h (hot comes from a
    # groupBy("_h")), so the hash join reuses that partitioning.
    dup = wins.join(hot.hint("shuffle_hash"), "_h")
    if keep_first:
        # survivor occurrence per hash: smallest (id, pos) — a min
        # over an orderable struct, then filtered out
        first = (dup.groupBy("_h")
                    .agg(F.min(F.struct("_id", "pos")).alias("_f"))
                    .select("_h", F.col("_f._id").alias("_fid"),
                            F.col("_f.pos").alias("_fpos")))
        dup = (dup.join(first.hint("shuffle_hash"), "_h")
                  .where(~((F.col("_id") == F.col("_fid"))
                           & (F.col("pos") == F.col("_fpos")))))
    # NO dropDuplicates here: ``wins`` carries exactly one row per
    # (_id, pos) by construction and both joins are 1:1 against
    # distinct-_h frames, so the dedup was a corpus-scale
    # exchange+aggregate that could never remove a row (and the span
    # merge below is insensitive to duplicates anyway — a repeated pos
    # gets _new = 0 and lands in the same span group).
    dup = dup.select("_id", "pos")
    # interval-merge overlapping windows per doc: a new span starts
    # where pos exceeds the running max end of all earlier windows
    w = Window.partitionBy("_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + k).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = dup.withColumn(
        "_new", F.when(prev_end.isNull()
                       | (F.col("pos") > prev_end), 1).otherwise(0))
    grouped = flagged.withColumn(
        "_g", F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    return (grouped.groupBy("_id", "_g")
            .agg(F.min("pos").alias("span_start"),
                 (F.max("pos") + k).alias("span_end"))
            .select(F.col("_id").alias(id_col),
                    F.col("span_start").cast("int").alias("span_start"),
                    F.col("span_end").cast("int").alias("span_end")))


def drop_duplicate_spans(df: DataFrame, spans: DataFrame,
                         id_col: str = "doc_id",
                         text_col: str = "text", *,
                         out_col: str = "clean_text") -> DataFrame:
    """Apply ``duplicate_spans`` output: drop every token whose
    position falls inside one of the doc's spans and rejoin the rest —
    the cleaning half of exact-substring dedup (run duplicate_spans
    with ``keep_first=True`` first if one copy of each substring
    should survive corpus-wide).

    Output text is in TOKEN space (the same lowercase/whitespace
    normalization the span positions were computed against) — the
    contract every downstream token-counting/packing operator here
    shares. Docs with no spans pass through with the same
    normalization applied, so ``out_col`` is uniformly comparable.

    100 TB shape: one left join spans→docs (spans are a small
    fraction of docs by construction) and a per-row higher-order
    filter over the token array — no explode, no window, no Python.
    """
    from ..functions.text import tokens

    sp = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("span_start", "span_end"))
         .alias("_spans"))
    toks = F.coalesce(tokens(text_col), F.array(F.lit("")))
    covered = F.coalesce(
        F.col("_spans"),
        F.array().cast("array<struct<span_start:int,span_end:int>>"))
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(
            covered, lambda s: (i >= s["span_start"])
            & (i < s["span_end"])))
    return (df.join(sp, id_col, "left")
              .withColumn(out_col, F.concat_ws(" ", kept))
              .drop("_spans"))


# Composite paragraph id for fuzzy paragraph dedup: pid preserves the
# corpus order (doc_id, para_idx) as a single orderable long, so the
# min-label connected-components keeper IS the globally-first
# paragraph. Contract: para_idx < 2^20 paragraphs per doc and
# doc_id < 2^43 (asserted in the plan).
PARA_ID_STRIDE = 1 << 20


def split_paragraphs(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", *,
                     delimiter: str | None = None,
                     para_tokens: int = 10) -> DataFrame:
    """Explode documents to (id, para_idx, para) — the map-only first
    stage of sub-document dedup. Two paragraph definitions:

    - ``delimiter`` (a regex, e.g. ``r"\\n{2,}"``): the CCNet /
      RefinedWeb shape — split on blank lines, trim, drop empties.
    - ``delimiter=None`` (default): FIXED TOKEN BLOCKS of
      ``para_tokens`` whitespace tokens (lowercased — the repo's token
      normalization). The structural fallback for corpora without
      newline structure, and the deterministic unit the SQL oracle
      mirrors; the trailing block may be shorter.

    One pass, no shuffle; empty documents produce no rows (both
    engines agree: range(0, 0) / posexplode of an empty array)."""
    if delimiter is not None:
        return (df.select(F.col(id_col),
                          F.posexplode(F.split(F.col(text_col), delimiter))
                          .alias("para_idx", "para"))
                .withColumn("para", F.trim("para"))
                .where(F.length("para") > 0))
    w = tokens(text_col)
    # Empty/whitespace-only docs produce NO paragraphs. The guard must
    # be on the trimmed TEXT, not size(tokens): split('', '\\s+') is
    # [''] (size 1) in both engines, which would otherwise emit one
    # empty paragraph per blank doc — found by the randomized
    # invariant test. (The length check also covers sequence(0, -1)
    # descending in Spark.)
    blocks = F.when(
        F.length(F.trim(F.col(text_col)
                        if isinstance(text_col, str) else text_col)) > 0,
        F.transform(
            F.sequence(F.lit(0),
                       F.ceil(F.size(w) / F.lit(float(para_tokens)))
                       .cast("int") - 1),
            lambda i: F.concat_ws(
                " ", F.slice(w, i * para_tokens + 1, para_tokens))))
    return df.select(F.col(id_col),
                     F.posexplode(blocks).alias("para_idx", "para"))


def paragraph_dedup(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", *, mode: str = "exact",
                    delimiter: str | None = None, para_tokens: int = 10,
                    threshold: float = 0.7, n_hashes: int = N_MINHASH,
                    n_bands: int = 2, shingle_n: int = 3,
                    n_iter: int = 3,
                    max_bucket_size: int | None = None,
                    scheme: str = "md5",
                    engine: str = "arrow",
                    base_hash: str = "md5") -> DataFrame:
    """PARAGRAPH-level dedup with document reconstruction — the
    CCNet/RefinedWeb deployment shape (VERDICT r9 #6): explode docs to
    paragraphs (``split_paragraphs``), drop every paragraph that
    duplicates an earlier one corpus-wide (keep-first: smallest
    (doc_id, para_idx) survives — the duplicate_spans policy), and
    reconstruct each document from its kept paragraphs in order.

    ``mode="exact"``: duplicates share the md5 of the normalized
    paragraph; keep-first is one window over the fingerprint (shuffle
    keyed by fingerprint — the exact_dedup shape at paragraph grain).
    ``mode="minhash"``: near-duplicate paragraphs found by the
    repo's banded MinHash-LSH + exact-Jaccard verify (>= threshold),
    connected-components'd (min-label propagation), keeping each
    component's globally-first paragraph. Paragraphs shorter than
    ``shingle_n`` tokens never produce shingles and are always kept
    (the pair finders' nonempty contract); exact duplicates of
    shingled paragraphs always collide into the same bucket
    (identical signatures), so minhash mode subsumes exact mode for
    shingle-able paragraphs.

    Returns one row per NON-EMPTY document: (id, n_paras, n_kept,
    new_text) — new_text joins kept paragraphs with a space (block
    mode) or a blank line (delimiter mode). At 100 TB: one map-only
    explode, one fingerprint-keyed shuffle (exact) or the banded-LSH
    pipeline (minhash), one doc-keyed reconstruction aggregate."""
    paras = split_paragraphs(df, id_col, text_col, delimiter=delimiter,
                             para_tokens=para_tokens)
    if mode == "exact":
        w = Window.partitionBy(F.md5("para")).orderBy(
            F.col(id_col).asc(), F.col("para_idx").asc())
        kept = (paras.withColumn("_rn", F.row_number().over(w))
                .withColumn("is_kept", F.col("_rn") == 1).drop("_rn"))
    elif mode == "minhash":
        guard = F.assert_true(
            (F.col("para_idx") < PARA_ID_STRIDE)
            & (F.col(id_col) < (1 << 43)),
            F.format_string(
                "paragraph_dedup: composite pid overflow — doc_id=%s "
                "para_idx=%s exceed the dedup.PARA_ID_STRIDE contract "
                "(para_idx < 2^20 paragraphs/doc, doc_id < 2^43). "
                "Raise PARA_ID_STRIDE (and keep doc_id*stride within "
                "int64) or split oversized docs upstream "
                "(chunk_by_tokens).",
                F.col(id_col), F.col("para_idx")))
        pid = F.when(guard.isNull(),
                     F.col(id_col) * PARA_ID_STRIDE + F.col("para_idx"))
        pf = paras.withColumn("_pid", pid).persist()
        # scheme/engine/base_hash thread through to the signature
        # engine: paragraph grain is the daily-curation hot path, so
        # the fast/xxhash64 production scheme must reach it (VERDICT
        # r13 #5); md5 stays the oracle-gated default
        _owned: list = []  # pf itself stays pinned (the final join
        # reads it); the band cache is dead once cluster_assign's
        # eager edge checkpoint materializes the verified pairs
        pairs = minhash_candidate_pairs(
            pf, id_col="_pid", text_col="para", n_hashes=n_hashes,
            n_bands=n_bands, shingle_n=shingle_n,
            max_bucket_size=max_bucket_size, scheme=scheme,
            engine=engine, base_hash=base_hash, _release_to=_owned)
        verified = jaccard_pairs(pf, pairs, id_col="_pid",
                                 text_col="para", shingle_n=shingle_n,
                                 threshold=threshold)
        labels = cluster_assign(verified.select("id_a", "id_b"),
                                pf.select("_pid"), id_col="_pid",
                                n_iter=n_iter, release=_owned)
        kept = (pf.join(labels, "_pid")
                .withColumn("is_kept", F.col("_pid") == F.col("cluster_id"))
                .drop("cluster_id", "_pid"))
    else:
        raise ValueError(f"paragraph_dedup: unknown mode {mode!r} "
                         "(exact | minhash)")
    joiner = "\n\n" if delimiter is not None else " "
    kp = F.when(F.col("is_kept"), F.struct("para_idx", "para"))
    return (kept.groupBy(id_col)
            .agg(F.count(F.lit(1)).cast("int").alias("n_paras"),
                 F.sum(F.col("is_kept").cast("int")).cast("int")
                 .alias("n_kept"),
                 F.concat_ws(joiner, F.transform(
                     F.sort_array(F.collect_list(kp)),
                     lambda x: x["para"])).alias("new_text")))
