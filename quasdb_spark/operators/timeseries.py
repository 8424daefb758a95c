"""Time-series operators — the typed face of the "tiny time series
database" (reference README.md:1-2; the reference realizes time series as
key-encoded range scans over its ordered KV map, kv/include/db.h:38-41 —
here they are first-class DataFrame operators).

Every operator is a pure DataFrame→DataFrame function built from
built-in JVM expressions (no Python UDFs), so Catalyst/AQE handle
pushdown, partial aggregation, and skew. Scale notes are on each op.

Determinism: every operator that orders within a key takes a unique
``tiebreak_col`` so results are stable across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling(df: DataFrame, ts_col: str, duration: str, *,
             keys: list[str] | None = None,
             aggs: list[F.Column] | None = None) -> DataFrame:
    """Tumbling-window aggregate (epoch-aligned, e.g. '1 hour').

    Scale: map-side partial agg → shuffle only (keys × windows) groups.
    """
    keys = keys or []
    win = F.window(F.col(ts_col), duration)
    out = (df.groupBy(win.alias("w"), *keys)
             .agg(*(aggs or [F.count(F.lit(1)).alias("n")])))
    return out.withColumn("window_start", F.col("w.start")).drop("w")


def sliding(df: DataFrame, ts_col: str, duration: str, slide: str, *,
            keys: list[str] | None = None,
            aggs: list[F.Column] | None = None) -> DataFrame:
    """Sliding-window aggregate: each row lands in duration/slide
    overlapping windows (Spark's window() emits one row per window —
    the explode happens map-side before partial aggregation)."""
    keys = keys or []
    win = F.window(F.col(ts_col), duration, slide)
    out = (df.groupBy(win.alias("w"), *keys)
             .agg(*(aggs or [F.count(F.lit(1)).alias("n")])))
    return out.withColumn("window_start", F.col("w.start")).drop("w")


def downsample_last(df: DataFrame, ts_col: str, bucket: str, keys: list[str],
                    value_cols: list[str], tiebreak_col: str) -> DataFrame:
    """Per (keys, bucket): the row with the greatest (ts, tiebreak) —
    'last observation per interval' downsampling.

    Uses max_by over a struct (one hash aggregate with map-side combine,
    no window sort) — at 100 TB this shuffles one row per bucket, not
    every observation.
    """
    win = F.window(F.col(ts_col), bucket)
    order = F.struct(F.col(ts_col), F.col(tiebreak_col))
    payload = F.struct(*[F.col(c) for c in value_cols])
    out = (df.groupBy(win.alias("w"), *keys)
             .agg(F.max_by(payload, order).alias("_last"),
                  F.count(F.lit(1)).alias("n_obs")))
    return (out.select(*keys, F.col("w.start").alias("bucket_start"),
                       *[F.col(f"_last.{c}").alias(c) for c in value_cols],
                       "n_obs"))


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str, right_ts: str, *,
              right_cols: list[str], tolerance_seconds: int | None = None,
              how: str = "inner",
              right_tiebreak: str | None = None,
              direction: str = "backward") -> DataFrame:
    """As-of join: for each left row, the matching right row on the
    same keys by ``direction``:

    - ``backward`` (default): newest right with right_ts <= left_ts
    - ``forward``: earliest right with right_ts >= left_ts
    - ``nearest``: whichever of the two is closer in time; an exact
      tie prefers the backward match (the convention that "what was
      already known at t" beats "what arrived after t")

    Implemented as union + running ``last(..., ignoreNulls)`` window —
    ONE shuffle by the join keys and a sorted pass, instead of a range
    join that explodes to |left|×|right-per-key| comparisons. This is
    the scalable shape for 100 TB: cost is a sort-merge pass per key
    partition, skew handled by AQE. ``nearest`` runs two window passes
    (one per scan order) over the SAME shuffled partition — the
    exchange is reused, only the sort doubles.

    At equal timestamps the right row is considered visible (<= / >=
    are inclusive), so rights sort before lefts at the same instant.
    When several right rows share the same (keys, right_ts), pass
    ``right_tiebreak`` to pick a deterministic winner (greatest
    tiebreak value wins) — the same determinism contract as every
    other ordering op here. ``tolerance_seconds`` bounds |left_ts -
    right_ts| in whichever direction(s) apply.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest,"
                         f" got {direction!r}")
    lcols = left.columns
    # right_ts always rides along inside the match struct (as _rts) so
    # the tolerance check never depends on the caller including it in
    # right_cols — that was an implicit, unchecked contract (ADVICE r1).
    rstruct_cols = [F.col(c) for c in right_cols] + [
        F.col(right_ts).alias("_rts")]
    rschema = (right.select(*right_cols, F.col(right_ts).alias("_rts"))
                    .schema)
    marker = F.lit(1)
    lpart = (left.withColumn("_t", F.col(left_ts))
                 .withColumn("_is_left", marker)
                 .select(*on, "_t", "_is_left",
                         F.struct(*[F.col(c) for c in lcols]).alias("_l"),
                         F.lit(None).cast(rschema).alias("_r"),
                         F.lit(None).cast(
                             right.schema[right_tiebreak].dataType
                             if right_tiebreak else "long").alias("_rtb")))
    rpart = (right.withColumn("_t", F.col(right_ts))
                  .withColumn("_is_left", F.lit(0))
                  .select(*on, "_t", "_is_left",
                          F.lit(None).cast(left.select(*lcols).schema).alias("_l"),
                          F.struct(*rstruct_cols).alias("_r"),
                          (F.col(right_tiebreak) if right_tiebreak
                           else F.lit(0)).alias("_rtb")))
    u = lpart.unionByName(rpart)
    # nulls-first asc puts left rows' null _rtb before right rows only
    # within the same (_t, _is_left) group, where it cannot matter.
    # Backward scans time ascending; forward scans descending — in
    # both, rights at the left's own instant sort BEFORE the left row
    # (_is_left asc), making the bound inclusive, and the last right
    # seen among equal timestamps carries the greatest _rtb.
    wb = (Window.partitionBy(*on)
                .orderBy(F.col("_t").asc(), F.col("_is_left").asc(),
                         F.col("_rtb").asc())
                .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wf = (Window.partitionBy(*on)
                .orderBy(F.col("_t").desc(), F.col("_is_left").asc(),
                         F.col("_rtb").asc())
                .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    if direction != "forward":
        u = u.withColumn("_mb", F.last("_r", ignorenulls=True).over(wb))
    if direction != "backward":
        u = u.withColumn("_mf", F.last("_r", ignorenulls=True).over(wf))
    matched = u.where(F.col("_is_left") == 1)
    lts = F.unix_timestamp(F.col("_t"))

    def _within(m, gap):
        if tolerance_seconds is None:
            return m
        ok = m.isNotNull() & (gap <= tolerance_seconds)
        return F.when(ok, m)

    if direction == "backward":
        matched = matched.withColumn(
            "_match", _within(F.col("_mb"),
                              lts - F.unix_timestamp(F.col("_mb._rts"))))
    elif direction == "forward":
        matched = matched.withColumn(
            "_match", _within(F.col("_mf"),
                              F.unix_timestamp(F.col("_mf._rts")) - lts))
    else:  # nearest: closer wins, exact tie -> backward
        mb = _within(F.col("_mb"), lts - F.unix_timestamp(F.col("_mb._rts")))
        mf = _within(F.col("_mf"), F.unix_timestamp(F.col("_mf._rts")) - lts)
        # distance comparison in exact integer MICROSECONDS
        # (unix_micros == DuckDB epoch_us): tolerance stays in whole
        # seconds, but which side is closer must not depend on
        # second-flooring or float epochs. NTZ timestamps cast through
        # TIMESTAMP (session tz is UTC — session.py pins it — so the
        # mapping is exact and linear).
        def _us(c):
            return F.unix_micros(c.cast("timestamp"))

        lus = _us(F.col("_t"))
        matched = (matched.withColumn("_vb", mb).withColumn("_vf", mf)
                   .withColumn(
                       "_match",
                       F.when(F.col("_vb").isNull(), F.col("_vf"))
                        .when(F.col("_vf").isNull(), F.col("_vb"))
                        .when((_us(F.col("_vf._rts")) - lus)
                              < (lus - _us(F.col("_vb._rts"))),
                              F.col("_vf"))
                        .otherwise(F.col("_vb"))))
    if how == "inner":
        matched = matched.where(F.col("_match").isNotNull())
    return matched.select(
        *[F.col(f"_l.{c}").alias(c) for c in lcols],
        *[F.col(f"_match.{c}").alias(f"right_{c}") for c in right_cols])


def interval_join(left: DataFrame, right: DataFrame, on: list[str],
                  left_ts: str, right_ts: str, *,
                  lower_seconds: int, upper_seconds: int,
                  right_cols: list[str],
                  bucket_seconds: int | None = None,
                  max_explode: int = 64, how: str = "inner",
                  left_id_col: str | None = None) -> DataFrame:
    """Flink-style interval join: pair each left row ``l`` with the
    right rows ``r`` sharing its keys whose timestamp falls in
    ``[l.ts + lower_seconds, l.ts + upper_seconds]`` (both inclusive).

    Scale shape: a plain key-equi-join with a range post-filter makes
    every hot key a |L_k| x |R_k| cross inside its sort-merge group —
    quadratic in the key's row count. Instead both sides are bucketed
    on ``floor(ts / W)`` with W defaulting to the window span: the
    right row lands in exactly one bucket, the left row explodes to
    the (at most 2 when W >= span) buckets its window can touch, and
    the join key becomes (keys..., bucket). The per-group cross is
    then bounded by rows per (key, W-wide time slice), not rows per
    key — the standard range-join binning rewrite (same idea as the
    RANGE_JOIN bin hint in Spark-based warehouses), expressed with
    sequence + explode so Catalyst still sees a plain equi-join with
    pushed filters on both scans.

    Pass ``bucket_seconds`` to override W: finer buckets trade a
    larger left explode factor (guarded by ``max_explode``) for
    tighter per-bucket crosses on dense data. Output = all left
    columns + ``right_<c>`` for each of ``right_cols`` (each
    qualifying (l, r) pair appears exactly once because a right row
    occupies exactly one bucket).

    ``how="left"`` keeps unmatched left rows with NULL right columns;
    it requires ``left_id_col`` naming a UNIQUE left column — the
    unmatched set is recovered with an anti-join on that id (a
    synthetic monotonically_increasing_id would be assigned
    independently in the matched and unmatched branches, so the
    caller must supply real identity).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if how == "left" and not left_id_col:
        raise ValueError("how='left' requires left_id_col (a unique "
                         "left column) to recover unmatched rows")
    if upper_seconds < lower_seconds:
        raise ValueError(f"empty interval: [{lower_seconds}, "
                         f"{upper_seconds}]")
    span = upper_seconds - lower_seconds
    w = int(bucket_seconds) if bucket_seconds else max(span, 1)
    if w <= 0:
        raise ValueError(f"bucket_seconds must be positive, got {w}")
    factor = span // w + 2  # worst-case buckets a left window touches
    if factor > max_explode:
        raise ValueError(
            f"window span {span}s over {w}s buckets explodes each left "
            f"row into up to {factor} copies (> max_explode="
            f"{max_explode}); raise bucket_seconds")
    lcols = left.columns
    lsec = F.unix_timestamp(F.col(left_ts))
    lx = left.withColumn(
        "_b", F.explode(F.sequence(
            F.floor((lsec + F.lit(lower_seconds)) / w).cast("long"),
            F.floor((lsec + F.lit(upper_seconds)) / w).cast("long"))))
    rsel = right.select(
        *[F.col(k).alias(f"_rk{i}") for i, k in enumerate(on)],
        F.col(right_ts).alias("_rts"),
        *[F.col(c).alias(f"right_{c}") for c in right_cols])
    rx = rsel.withColumn(
        "_b", F.floor(F.unix_timestamp(F.col("_rts")) / w).cast("long"))
    cond = lx["_b"] == rx["_b"]
    for i, k in enumerate(on):
        cond = cond & (lx[k] == rx[f"_rk{i}"])
    lref = F.unix_timestamp(lx[left_ts])
    rref = F.unix_timestamp(rx["_rts"])
    matched = (lx.join(rx, cond, "inner")
                 .where((rref >= lref + F.lit(lower_seconds)) &
                        (rref <= lref + F.lit(upper_seconds))))
    inner = matched.select(*lcols, *[f"right_{c}" for c in right_cols])
    if how == "inner":
        return inner
    unmatched = (left.join(
        inner.select(F.col(left_id_col).alias("_mid")).distinct(),
        left[left_id_col] == F.col("_mid"), "left_anti")
        .select(*lcols, *[F.lit(None).cast(
            right.schema[c].dataType).alias(f"right_{c}")
            for c in right_cols]))
    return inner.unionByName(unmatched)


def sessionize(df: DataFrame, ts_col: str, keys: list[str],
               gap_seconds: int, tiebreak_col: str) -> DataFrame:
    """Gap-based sessions: a new session starts when the time since the
    previous event on the same keys exceeds ``gap_seconds``.

    lag + conditional cumulative sum — two passes over one
    key-partitioned sort (a single shuffle).
    """
    order = [F.col(ts_col).asc(), F.col(tiebreak_col).asc()]
    w = Window.partitionBy(*keys).orderBy(*order)
    prev = F.lag(F.col(ts_col)).over(w)
    is_new = (prev.isNull() |
              (F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(prev)
               > F.lit(gap_seconds))).cast("long")
    sess = df.withColumn("_new", is_new).withColumn(
        "session_id", F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    return sess.drop("_new")


def session_stats(df: DataFrame, ts_col: str, keys: list[str],
                  gap_seconds: int, tiebreak_col: str) -> DataFrame:
    """Per-session rollup: start/end/duration/event count."""
    s = sessionize(df, ts_col, keys, gap_seconds, tiebreak_col)
    return (s.groupBy(*keys, "session_id")
             .agg(F.min(ts_col).alias("session_start"),
                  F.max(ts_col).alias("session_end"),
                  (F.unix_timestamp(F.max(ts_col)) -
                   F.unix_timestamp(F.min(ts_col))).alias("duration_s"),
                  F.count(F.lit(1)).alias("n_events")))


def moving_agg(df: DataFrame, ts_col: str, keys: list[str], value_col: str,
               n_preceding: int, tiebreak_col: str,
               agg: str = "avg") -> DataFrame:
    """Rows-based moving aggregate over the previous ``n_preceding``
    rows + current, per key, ordered by (ts, tiebreak)."""
    w = (Window.partitionBy(*keys)
               .orderBy(F.col(ts_col).asc(), F.col(tiebreak_col).asc())
               .rowsBetween(-n_preceding, Window.currentRow))
    fn = getattr(F, agg)
    return df.withColumn(f"mov_{agg}", fn(F.col(value_col)).over(w))


def rate(df: DataFrame, ts_col: str, keys: list[str], value_col: str,
         tiebreak_col: str) -> DataFrame:
    """Per-key rate of change vs the previous observation:
    (value - prev_value) / (epoch_seconds - prev_epoch_seconds)."""
    w = Window.partitionBy(*keys).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc())
    pv = F.lag(F.col(value_col)).over(w)
    pt = F.lag(F.col(ts_col)).over(w)
    dt = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(pt)
    return df.withColumn(
        "rate", (F.col(value_col) - pv) / F.nullif(dt.cast("double"), F.lit(0.0)))


def topk_per_group(df: DataFrame, keys: list[str], order_col: str,
                   k: int, tiebreak_col: str, *,
                   descending: bool = True) -> DataFrame:
    """Top-k rows per group by ``order_col`` (ties broken by the unique
    tiebreak column). row_number over a key-partitioned sort; at scale
    AQE splits skewed key partitions."""
    oc = F.col(order_col).desc() if descending else F.col(order_col).asc()
    w = Window.partitionBy(*keys).orderBy(oc, F.col(tiebreak_col).asc())
    return (df.withColumn("rank", F.row_number().over(w))
              .where(F.col("rank") <= k))


def gapfill(df: DataFrame, ts_col: str, bucket_seconds: int,
            keys: list[str], agg_col: F.Column,
            fill_value=0, chunk_buckets: int = 4096) -> DataFrame:
    """Dense time grid per key: aggregate to buckets, then join against
    the full per-key [min, max] bucket range and fill missing buckets.

    Scale: the grid is generated per key from that key's own span (no
    driver-side collect, no global grid materialization), and in TWO
    explode levels — chunk starts, then ≤ ``chunk_buckets`` buckets per
    chunk — so a key spanning years at small buckets never materializes
    its whole span as one array row (the round-1 single-`sequence`
    version would build a multi-million-element array); peak row size
    is bounded by ``chunk_buckets`` elements.
    """
    bucketed = (df.withColumn(
        "_b", F.timestamp_seconds(
            (F.unix_timestamp(F.col(ts_col)) / bucket_seconds)
            .cast("long") * bucket_seconds))
        .groupBy(*keys, "_b").agg(agg_col.alias("agg_value")))
    spans = (bucketed.groupBy(*keys)
             .agg(F.min("_b").alias("_lo"), F.max("_b").alias("_hi")))
    chunk_span = bucket_seconds * chunk_buckets
    lo_e, hi_e = F.unix_timestamp("_lo"), F.unix_timestamp("_hi")
    chunks = spans.select(
        *keys, hi_e.alias("_hi_e"),
        F.explode(F.sequence(lo_e, hi_e, F.lit(chunk_span))).alias("_c0"))
    grid = chunks.select(
        *keys,
        F.explode(F.sequence(
            F.col("_c0"),
            F.least(F.col("_c0") + F.lit(chunk_span - bucket_seconds),
                    F.col("_hi_e")),
            F.lit(bucket_seconds))).alias("_bs")
    ).select(*keys, F.timestamp_seconds("_bs").alias("bucket_start"))
    joined = grid.join(
        bucketed.withColumnRenamed("_b", "bucket_start"),
        on=[*keys, "bucket_start"], how="left")
    return joined.withColumn(
        "agg_value", F.coalesce(F.col("agg_value"), F.lit(fill_value)))


def gapfill_interpolate(df: DataFrame, ts_col: str, bucket_seconds: int,
                        keys: list[str], agg_col: F.Column,
                        chunk_buckets: int = 4096) -> DataFrame:
    """Gapfill with linear interpolation (TimescaleDB ``interpolate()``
    semantics): a missing bucket gets the value on the line between the
    surrounding observed buckets; leading/trailing edges carry the
    nearest observed value (backfill / LOCF).

    Scale shape: reuses the chunked per-key grid of :func:`gapfill`
    (bounded row sizes, no driver collect), then two per-key ordered
    windows (last-observed-before, first-observed-after) — one shuffle
    keyed by ``keys``, state bounded per key. The observed (t, v) pair
    travels as a struct so each window carries one column.
    """
    filled = gapfill(df, ts_col, bucket_seconds, keys, agg_col,
                     fill_value=None, chunk_buckets=chunk_buckets)
    e = F.unix_timestamp(F.col("bucket_start"))
    wprev = (Window.partitionBy(*keys).orderBy("bucket_start")
             .rowsBetween(Window.unboundedPreceding, 0))
    wnext = (Window.partitionBy(*keys).orderBy("bucket_start")
             .rowsBetween(0, Window.unboundedFollowing))
    obs = F.when(F.col("agg_value").isNotNull(),
                 F.struct(e.cast("double").alias("t"),
                          F.col("agg_value").cast("double").alias("v")))
    prev = F.last(obs, ignorenulls=True).over(wprev)
    nxt = F.first(obs, ignorenulls=True).over(wnext)
    interp = (prev["v"] + (nxt["v"] - prev["v"])
              * (e.cast("double") - prev["t"]) / (nxt["t"] - prev["t"]))
    val = (F.when(F.col("agg_value").isNotNull(),
                  F.col("agg_value").cast("double"))
           .when(prev.isNotNull() & nxt.isNotNull(), interp)
           .when(prev.isNotNull(), prev["v"])
           .otherwise(nxt["v"]))
    return filled.withColumn("value_interp", val)


def first_last(df: DataFrame, ts_col: str, keys: list[str],
               value_col: str, tiebreak_col: str) -> DataFrame:
    """Per key: first and last observed value, observation count —
    min_by/max_by hash aggregate (map-side combine, no window)."""
    order = F.struct(F.col(ts_col), F.col(tiebreak_col))
    return (df.groupBy(*keys)
              .agg(F.min_by(F.col(value_col), order).alias("first_value"),
                   F.max_by(F.col(value_col), order).alias("last_value"),
                   F.min(ts_col).alias("first_ts"),
                   F.max(ts_col).alias("last_ts"),
                   F.count(F.lit(1)).alias("n_obs")))


def trailing_range_agg(df: DataFrame, ts_col: str, keys: list[str],
                       value_col: str, window_seconds: int,
                       agg: str = "sum") -> DataFrame:
    """Time-range moving aggregate: value aggregated over the trailing
    ``window_seconds`` (inclusive) per key, ordered by event time.

    RANGE frame over epoch seconds — one shuffle+sort per key, frame
    peers resolved by value not row position, so same-timestamp ties
    are deterministic without a tiebreak column.
    """
    epoch = F.unix_timestamp(F.col(ts_col))
    w = (Window.partitionBy(*keys).orderBy(epoch.cast("long"))
               .rangeBetween(-(window_seconds - 1), Window.currentRow))
    fn = getattr(F, agg)
    return df.withColumn(f"trailing_{agg}", fn(F.col(value_col)).over(w))
