"""Corpus sampling and sequence packing for training-data pipelines
(charter extension — no reference counterpart).

- ``deterministic_sample``: hash-threshold sampling — membership is a
  pure function of (salt, id), so the sample is reproducible across
  runs, engines, and cluster sizes (no RNG state), and per-stratum
  rates give stratified sampling. Map-only, no shuffle.

- ``pack_by_token_budget``: assign documents (in global id order) to
  fixed token-budget packs — the "concat documents into 8k-token
  training sequences" step. Implemented as a TWO-PHASE cumulative sum:
  per-range-partition running sums plus broadcast partition offsets, so
  there is no single-partition global window; scales to any corpus
  (the per-partition totals are one tiny driver round-trip, like
  Spark's own zipWithIndex).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from quasdb_spark.plans.materialize import materialize


def sample_hash(id_col: Column, salt: str) -> Column:
    """First 8 hex chars of md5(salt|id) as a uniform [0, 2^32) draw."""
    return F.conv(F.substring(F.md5(F.concat(F.lit(salt + "|"),
                                             id_col.cast("string"))), 1, 8),
                  16, 10).cast("long")


def deterministic_sample(df: DataFrame, id_col: str, rate: float, *,
                         salt: str = "s1",
                         stratum_rates: dict[str, float] | None = None,
                         stratum_col: str | None = None) -> DataFrame:
    """Keep each row iff hash(salt, id) < rate·2^32; with
    ``stratum_rates``, the rate is chosen per stratum value (default
    ``rate`` for unlisted strata)."""
    h = sample_hash(F.col(id_col), salt)
    scale = float(1 << 32)
    if stratum_rates and stratum_col:
        thr: Column = F.lit(rate * scale)
        for val, r in sorted(stratum_rates.items()):
            thr = F.when(F.col(stratum_col) == val, F.lit(r * scale)) \
                   .otherwise(thr)
    else:
        thr = F.lit(rate * scale)
    return df.where(h < thr)


def weighted_sample(df: DataFrame, id_col: str, rate_col: Column, *,
                    salt: str = "s1") -> DataFrame:
    """Importance sampling with a PER-ROW keep probability (any Column
    expression in [0,1], e.g. a quality score): keep iff
    hash(salt, id) < rate·2^32. Deterministic (pure function of salt
    and id), map-only, no shuffle — the upsampling/downsampling step of
    quality-weighted corpus mixing."""
    h = sample_hash(F.col(id_col), salt)
    return df.where(h < rate_col * float(1 << 32))


def fixed_size_sample(df: DataFrame, id_col: str, k: int, *,
                      salt: str = "s1",
                      stratum_col: str | None = None) -> DataFrame:
    """EXACTLY-k deterministic sample (per stratum when ``stratum_col``
    is given): rank rows by md5(salt|id) and keep the first ``k``.
    Membership depends only on (salt, the id set) — reproducible across
    runs, engines and cluster sizes, unlike rate-based sampling whose
    output size varies.

    Scale shape: stratified → one shuffle keyed by stratum, rank-k
    window within each stratum (state bounded by k per stratum).
    Unstratified → ``orderBy(hash).limit(k)``, which Spark plans as
    TakeOrderedAndProject: each partition keeps its local top-k and
    only k-row heads merge — never a global sort.
    """
    h = sample_hash(F.col(id_col), salt)
    if stratum_col is None:
        return df.orderBy(h.asc(), F.col(id_col).asc()).limit(k)
    w = (Window.partitionBy(stratum_col)
         .orderBy(h.asc(), F.col(id_col).asc()))
    return (df.withColumn("_rk", F.row_number().over(w))
              .where(F.col("_rk") <= k).drop("_rk"))


def global_ranks(df: DataFrame, order_cols: list[Column], *,
                 n_parts: int | None = None,
                 rank_col: str = "_rank",
                 total_col: str = "_n") -> DataFrame:
    """Distributed global row_number over ``order_cols`` — the
    scale-safe replacement for ``Window.orderBy(...)`` with no
    PARTITION BY (which funnels the whole dataset through ONE task).

    Two-phase, same shape as ``pack_by_token_budget``:
    range-repartition on the ordering (partition i holds the i-th key
    range), rank within each partition, then add broadcast
    per-partition row-count offsets. The only global stage is a
    cumulative sum over ONE ROW PER PARTITION — bounded by cluster
    parallelism, not by data.

    Adds ``rank_col`` (1-based, unique, == row_number over the given
    ordering) and ``total_col`` (total row count); with a tie-free
    ordering these give every SQL ranking function in closed form:
    rank == dense_rank == row_number == r, percent_rank ==
    (r-1)/(n-1), cume_dist == r/n, ntile(k) by integer bucket
    arithmetic (see suite.q_rel_customer_quartiles).
    """
    spark = df.sparkSession
    n_parts = n_parts or max(1, spark.sparkContext.defaultParallelism)
    # eager localCheckpoint before the two-consumer fan-out (window +
    # per-partition counts): without it the counts aggregate re-ran
    # the whole upstream subtree — for the quartiles caller that is a
    # second scan + second revenue aggregate (see pack_by_token_budget,
    # same r15 fix). Checkpointed rows are the ranked frame itself
    # (narrow by contract at every call site); one sampled range
    # partitioning is pinned for both consumers.
    # r16: routed through the shared materialize() so a configured
    # checkpoint dir upgrades this to RELIABLE storage on clusters
    # (raw localCheckpoint loses blocks with a lost executor under
    # dynamic allocation — VERDICT r15 #7); local mode unchanged.
    parted = materialize(df.repartitionByRange(n_parts, *order_cols)
                           .withColumn("_pid", F.spark_partition_id()))
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    counts = parted.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    woff = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    wall = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    offsets = (counts
               .withColumn("_off", F.sum("_cnt").over(woff) - F.col("_cnt"))
               .withColumn(total_col, F.sum("_cnt").over(wall))
               .drop("_cnt"))
    return (parted.join(F.broadcast(offsets), "_pid")
                  .withColumn(rank_col,
                              (F.row_number().over(w) + F.col("_off"))
                              .cast("long"))
                  .drop("_pid", "_off"))


def pack_by_token_budget(df: DataFrame, id_col: str, tokens_col: str,
                         budget: int) -> DataFrame:
    """Pack rows (in ascending ``id_col`` order) into consecutive packs
    of ~``budget`` tokens: pack_id = (running_total - own_tokens) div
    budget — a row starts in the pack where its first token lands.

    Scalable global cumulative sum: range-repartition by id, running
    sum within each partition, then add broadcast per-partition offsets
    (computed from the tiny per-partition totals). No global window.

    r15: the range-partitioned (id, tokens, _pid) frame is eagerly
    localCheckpoint-ed before fanning out to its two consumers (the
    per-partition window AND the per-partition totals). Without the
    checkpoint the totals aggregate re-executed the entire subtree —
    second scan of the input, second tokenize in the common
    size(tokens) caller shape, second range exchange (the sf0.1 plan
    showed both scans). The checkpointed rows are just
    (id, token-count, partition id) — tiny at any corpus scale vs
    re-reading text — and each execution pays its own materialization
    (no cross-run cache). pack_id/offset values are unchanged; the
    checkpoint also pins ONE sampled range partitioning for both
    consumers by construction.
    """
    spark = df.sparkSession
    n_parts = max(1, spark.sparkContext.defaultParallelism)
    # r16: shared materialize() — reliable checkpoint when a dir is
    # configured, localCheckpoint otherwise (see global_ranks)
    parted = materialize(df.repartitionByRange(n_parts, F.col(id_col))
                           .withColumn("_pid", F.spark_partition_id()))
    w = (Window.partitionBy("_pid").orderBy(F.col(id_col))
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    run = F.sum(F.col(tokens_col)).over(w)
    # tiny: one row per partition → driver-safe, broadcast back
    totals = (parted.groupBy("_pid")
                    .agg(F.sum(F.col(tokens_col)).alias("_tot")))
    woff = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    offsets = totals.withColumn(
        "_off", F.sum("_tot").over(woff) - F.col("_tot")).drop("_tot")
    out = (parted.join(F.broadcast(offsets), "_pid")
                 .withColumn("_cum", (run + F.col("_off")).cast("long"))
                 .withColumn("pack_id", F.expr(
                     f"(_cum - cast({tokens_col} as bigint)) div {budget}"))
                 # where the doc's first token lands inside its pack —
                 # the attention-boundary offset a training loader
                 # needs alongside the pack assignment (packs overflow
                 # by at most one doc, so offset < budget always)
                 .withColumn("offset_in_pack", F.expr(
                     f"_cum - cast({tokens_col} as bigint) "
                     f"- pack_id * {budget}").cast("int")))
    return out.drop("_pid", "_off", "_cum")


def hash_split(df: DataFrame, id_col: str, *,
               splits: dict[str, float] | None = None,
               salt: str = "split1",
               out_col: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment: each row lands in one
    split by its hash(salt, id) position within cumulative fraction
    boundaries — a pure function of (salt, id), so the assignment is
    stable across runs, machines, and engines, and adding new rows
    never reassigns old ones (the property random() splits lack).
    Map-only, no shuffle; fractions must sum to 1.0.
    """
    splits = splits or {"train": 0.98, "val": 0.01, "test": 0.01}
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions sum to {total}, expected 1.0")
    h = sample_hash(F.col(id_col), salt)
    scale = float(1 << 32)
    expr = None
    # deterministic boundary order: as-given insertion order. Each
    # boundary is the CORRECTLY-ROUNDED prefix sum (math.fsum), not a
    # sequential float accumulation — 0.8+0.1 sequentially is
    # 0.9000000000000001, which differs in the last ulp from the exact
    # literal an external oracle would write; fsum makes the
    # cross-engine bit-exact contract hold for arbitrary fraction sets.
    items = list(splits.items())
    fracs = [f for _, f in items]
    for i, (name, frac) in enumerate(items[:-1]):
        acc = math.fsum(fracs[:i + 1])
        cond = h < F.lit(acc * scale)
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(out_col, expr)


def chunk_by_tokens(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", *,
                    max_tokens: int = 512,
                    overlap: int = 0) -> DataFrame:
    """Split documents into context-window-bounded token chunks with
    optional overlap — the standard pre-training/embedding prep step
    (a doc longer than the model context becomes ceil((n-overlap) /
    (max_tokens-overlap)) chunks; consecutive chunks share ``overlap``
    tokens so no span is ever cut without context).

    Returns (id, chunk_id, chunk_text, n_tokens), one row per chunk;
    chunk i covers tokens [i*stride, i*stride + max_tokens) with
    stride = max_tokens - overlap; every doc yields >= 1 chunk (a
    short doc is its own single chunk).

    100 TB shape: MAP-ONLY — the token array is built once per row,
    chunk ids come from an in-row ``sequence`` explode, and each chunk
    slices that array; no shuffle, no window, output partitioning
    follows input. The explode factor is n_tokens/stride, i.e. output
    volume ~ input volume * (1 + overlap/stride) — bounded and known
    up front. Tokenization is the whitespace contract shared with
    token_counts (functions/text.tokens), so chunk token counts
    reconcile with corpus-level token accounting.
    """
    from ..functions.text import tokens

    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"overlap must be in [0, max_tokens); got {overlap} "
            f"vs max_tokens={max_tokens}")
    stride = max_tokens - overlap
    # NULL text folds to the empty-string token array (same one-token
    # result '' gets from split) — otherwise least()/greatest() skip
    # the NULL token count and a NULL doc would emit one phantom chunk
    # claiming n_tokens == max_tokens, corrupting token accounting.
    toks = F.coalesce(tokens(text_col), F.array(F.lit("")))
    n = F.size(toks)
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((n - F.lit(overlap)) / F.lit(float(stride))).cast("int"))
    return (df.select(F.col(id_col), toks.alias("_toks"), n.alias("_n"),
                      F.explode(F.sequence(F.lit(0), n_chunks - 1))
                       .alias("chunk_id"))
              .select(F.col(id_col),
                      F.col("chunk_id").cast("int").alias("chunk_id"),
                      F.concat_ws(" ", F.slice(
                          F.col("_toks"),
                          F.col("chunk_id") * stride + 1,
                          F.lit(max_tokens))).alias("chunk_text"),
                      F.least(F.lit(max_tokens),
                              F.col("_n") - F.col("chunk_id") * stride)
                       .cast("int").alias("n_tokens")))


def global_shuffle(df: DataFrame, id_col: str = "doc_id", *,
                   n_shards: int = 8,
                   salt: str = "epoch0") -> DataFrame:
    """Deterministic corpus-order randomization — the "shuffle the
    dataset before training" step, as a pure function of (salt, id)
    so every run/engine/cluster size produces the SAME order (change
    ``salt`` per epoch for a fresh permutation; no RNG state to
    coordinate across executors).

    Every row gets (shard, pos): ``shard`` by hash (uniform, so shard
    sizes are balanced without a count pass), ``pos`` by ranking the
    same hash within the shard. A training loader reads shards in any
    order and rows by pos — the composition is a uniform pseudo-random
    permutation of the corpus.

    100 TB shape: ONE shuffle (hash-partition by shard) + a per-shard
    sort — Spark runs one sort task per shard, so size ``n_shards`` to
    the cluster (production: one shard per output file, hundreds to
    thousands); there is NO global single-partition window anywhere.
    The md5 sort key is data-independent, so no skew by construction.
    """
    key = F.md5(F.concat(F.lit(salt + "|"), F.col(id_col).cast("string")))
    shard = F.pmod(
        F.conv(F.substring(key, 1, 8), 16, 10).cast("long"),
        F.lit(n_shards)).cast("int")
    out = df.withColumn("_skey", key).withColumn("shard", shard)
    w = Window.partitionBy("shard").orderBy("_skey", id_col)
    return (out.withColumn(
        "pos", (F.row_number().over(w) - 1).cast("int")).drop("_skey"))


def materialize_mixture(df: DataFrame, factors: DataFrame, *,
                        id_col: str = "doc_id",
                        domain_col: str = "source",
                        factor_col: str = "oversample",
                        salt: str = "mix0",
                        max_factor: float = 100.0) -> DataFrame:
    """Materialize a training mixture: emit each row round(f) times
    where f is its domain's sampling factor (e.g. the ``oversample``
    column of ``functions.text.domain_mix_weights``) — f > 1
    up-samples by repetition, f < 1 down-samples by dropping.

    The fractional part is resolved by a DETERMINISTIC hash draw per
    (salt, id): a row with f = 2.3 yields 2 copies always and a 3rd
    iff hash(salt|id)/2^32 < 0.3 — so expected copies = f exactly, the
    realized corpus is a pure function of (salt, id, factors), and
    re-runs/engines agree row-for-row (no RNG). Output: input columns
    plus ``copy`` (0-based repeat index); rows drawn to 0 copies
    disappear. A NULL factor (e.g. an all-empty domain) contributes
    nothing. A domain entirely ABSENT from ``factors`` RAISES — a
    truncated factors table must not silently shrink the epoch
    (explicitly exclude a domain by giving it a NULL factor or 0.0).

    Scale shape: factors is per-domain — tiny by contract — and
    BROADCAST; the explode is in-row with output volume =
    sum(f_d · rows_d), known up front. No shuffle at all: a map-only
    pass over the corpus. ``max_factor`` guards against a degenerate
    tiny domain exploding the output (alpha-tempered factors grow as
    share^(alpha-1) — cap and log rather than OOM); capped domains
    are still emitted at ``max_factor``.

    Cross-engine note: the strict ``draw < frac(f)`` compare is only
    reproducible if the factor doubles are bit-identical across
    engines. For domain_mix_weights' rounded oversample that is
    pinned upstream — the doc_domain_mix gate hash-compares the
    factors themselves, so any engine divergence fails THERE before
    it could skew a copy count here.
    """
    # Cap under a NULL guard: F.least skips NULLs, so least(NULL, cap)
    # would resurrect a NULL-factor domain at max_factor. NULL-factor
    # domains stay IN fac (with _f NULL, contributing nothing) so the
    # left join below can tell "domain excluded on purpose" from
    # "domain missing from a truncated factors table" — the latter
    # fails loudly via the assert folded into _n (a used column, so
    # column pruning can't drop it).
    f = F.when(F.col(factor_col).isNotNull(),
               F.least(F.col(factor_col).cast("double"),
                       F.lit(float(max_factor))))
    fac = factors.select(F.col("domain").alias("_dom"), f.alias("_f"))
    draw = sample_hash(F.col(id_col), salt) / F.lit(4294967296.0)
    n_copies = (F.floor("_f") +
                F.when(draw < F.col("_f") - F.floor("_f"), 1).otherwise(0)
                ).cast("int")
    guard = F.assert_true(
        F.col("_dom").isNotNull(),
        F.format_string(
            "materialize_mixture: domain %s has no row in factors — "
            "a truncated factors table would silently shrink the "
            "epoch (exclude a domain explicitly with a NULL factor)",
            F.col(domain_col)))
    out = (df.join(F.broadcast(fac), df[domain_col] == F.col("_dom"),
                   "left")
             .withColumn("_n", F.when(guard.isNull(), n_copies))
             .where(F.col("_n") > 0)
             .select(*df.columns,
                     F.explode(F.sequence(
                         F.lit(0), F.col("_n") - 1)).alias("copy")))
    return out
