"""Physical-plan regression guards for the SCALE.md claims: predicate
pushdown reaches the parquet scan, dimension joins broadcast, and no
operator silently reintroduces a cartesian product. These are the
properties that decide whether the plans survive a 100 TB input, so
they are pinned here rather than only documented."""

import pyspark.sql.functions as F

from quasdb_spark import suite
from quasdb_spark.store import KVStore


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_point_get_pushes_key_filter(spark, tmp_path):
    st = KVStore.create(spark, str(tmp_path / "s"))
    st.write_batch([("put", f"k{i:03d}", str(i)) for i in range(50)])
    plan = st.state(key_from="k010", key_to="k020") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(key" in plan and "LessThan(key" in plan


def test_region_revenue_joins_all_broadcast(spark, sf_dir):
    """At test sf, AQE's size estimates broadcast every dim (orders/
    customer are tiny here) — the fact table never shuffles."""
    plan = _plan(suite.QUERIES["rel_region_revenue"](spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_region_revenue_no_forced_broadcast_of_growing_dims(spark,
                                                            sf_dir):
    """At 100 TB customer/orders no longer fit in a broadcast, and a
    HINT would force one anyway (AQE cannot override hints) — so with
    size-based broadcasting disabled, the only broadcasts left must be
    the constant-size region/nation hints; lineitem x orders and
    x customer fall back to shuffle joins (VERDICT r4)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold",
                       "-1")
        df = suite.QUERIES["rel_region_revenue"](spark, sf_dir)
        plan = df._jdf.queryExecution().sparkPlan().toString()
        assert plan.count("BroadcastHashJoin") == 2  # region + nation
        assert "SortMergeJoin" in plan  # li x o, x customer shuffle
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        if old_aqe is not None:
            spark.conf.set(
                "spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)


def test_pricing_summary_prunes_columns(spark, sf_dir):
    plan = _plan(suite.QUERIES["rel_pricing_summary"](spark, sf_dir))
    scan = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert scan, "no parquet scan with ReadSchema in plan"
    # the scan must not read the full 16-column lineitem schema
    assert "l_comment" not in scan[0] and "l_orderkey" not in scan[0]


def test_no_cartesian_products_in_pair_finders(spark, sf_dir):
    for name in ("dedup_minhash_pairs", "dedup_simhash_pairs",
                 "sim_neardup_cosine", "emb_semdedup"):
        plan = _plan(suite.QUERIES[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_pii_redact_is_map_only(spark, sf_dir):
    """Redaction is a scan->regexp_replace projection: no shuffle
    beyond the suite's parallelism repair, no Python — a 100 TB pass
    is one codegen stage."""
    plan = _plan(suite.QUERIES["text_pii_redact"](spark, sf_dir))
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_lww_state_view_aggregates_partially(spark, tmp_path):
    """The LWW dedup must partial-aggregate map-side (shuffle one row
    per key per partition, not the whole log)."""
    st = KVStore.create(spark, str(tmp_path / "s2"))
    st.write_batch([("put", f"k{i % 10}", str(i)) for i in range(100)])
    plan = st.state()._jdf.queryExecution().executedPlan().toString()
    assert "partial_max_by" in plan or "partial_" in plan


def test_salted_join_equals_plain_join(spark):
    """Salting only changes physical distribution: results identical on
    a hot-key-skewed input, for inner and left joins."""
    import random

    from quasdb_spark.plans.skew import salted_join

    rng = random.Random(3)
    # 80% of facts hit key 0 (the AQE-resistant regime)
    facts = spark.createDataFrame(
        [(0 if rng.random() < 0.8 else rng.randrange(50), i)
         for i in range(5000)], "k long, payload long")
    dim = spark.createDataFrame(
        [(k, f"d{k}") for k in range(40)], "k long, label string")

    for how in ("inner", "left"):
        plain = {tuple(r) for r in facts.join(dim, ["k"], how).collect()}
        salted = {tuple(r) for r in
                  salted_join(facts, dim, ["k"], n_salts=8, how=how).collect()}
        assert salted == plain, how


def test_curation_pipeline_no_cartesian_all_hash_joins(spark, sf_dir):
    """The curation pipeline's filter signals must stay map-side
    expressions (no Python UDFs) and its joins keyed — never a nested
    loop/cartesian."""
    plan = _plan(suite.QUERIES["pipeline_curation"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_token_counts_is_map_only(spark, sf_dir):
    """BPE/whitespace token counting must be a pure scan->project plan:
    no semantic shuffle (the suite's round-robin parallelism repair is
    allowed), no Python."""
    plan = _plan(suite.QUERIES["text_token_counts"](spark, sf_dir))
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ivf_quantization_broadcasts_centroids(spark, sf_dir):
    """Corpus-side assignment must join broadcast centroids (the corpus
    never shuffles) and aggregate partially map-side."""
    plan = _plan(suite.QUERIES["sim_ivf_quantization"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "partial_" in plan


def test_ivf_topk_probes_pruned_lists(spark, sf_dir):
    """The served IVF query must PROBE materialized inverted lists,
    never re-assign the corpus: the lists scan carries a dynamic-
    partition-pruning filter on list_label (only probed lists are
    read), and the probe side joins broadcast — at 100 TB the
    per-query cost is |probed lists|, not the corpus (VERDICT r4)."""
    df = suite.QUERIES["sim_ivf_topk"](spark, sf_dir)
    formatted = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert "dynamicpruningexpression(list_label" in formatted
    assert "CartesianProduct" not in formatted


def test_quantize_int8_is_map_only(spark, sf_dir):
    plan = _plan(suite.QUERIES["emb_quantize_int8"](spark, sf_dir))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_probe_and_knn_stay_bucket_joined(spark, sf_dir):
    """Multiprobe ANN and the guarded kNN graph must never degrade to
    a cartesian/BNLJ product — the probe fan-out and bucket caps only
    reshape equality joins."""
    for name in ("sim_probe_topk", "sim_knn_graph"):
        plan = _plan(suite.QUERIES[name](spark, sf_dir))
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_typed_store_rollup_state_has_no_json(spark, tmp_path):
    """Typed-store rollup reads must stay JSON-free end to end (the
    whole point of value_schema: native columns all the way down)."""
    from quasdb_spark.store import KVStore
    from quasdb_spark.streaming.rollup import rollup_state

    st = KVStore.create(spark, str(tmp_path / "ts"),
                        value_schema="n long, total double")
    st.put("2024-01-01T00:00:00|a", {"n": 3, "total": 1.5})
    plan = _plan(rollup_state(st, ["k"]))
    assert "from_json" not in plan.lower()


def test_interval_join_is_equi_join_with_pushed_filters(spark, sf_dir):
    """The bucketized rewrite must reach Catalyst as a plain equi-join:
    no nested-loop/cartesian fallback, and the event_type filters
    pushed to both scans (SCALE.md §4c³ interval_join)."""
    plan = _plan(suite.QUERIES["ts_interval_join"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("EqualTo(event_type") >= 2


def test_q6_filters_reach_the_scan(spark, sf_dir):
    """rel_forecast_revenue is scan→filter→agg: shipdate/discount/
    quantity predicates must appear as PushedFilters so footer min/max
    can prune row groups at scale."""
    plan = _plan(suite.QUERIES["rel_forecast_revenue"](spark, sf_dir))
    assert "PushedFilters" in plan
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert frag in plan, frag
    assert "Join" not in plan


def test_asof_nearest_reuses_one_exchange(spark, sf_dir):
    """direction='nearest' runs two window passes (asc + desc scan)
    over the SAME key partitioning: exactly one hash Exchange, two
    Window nodes — the SCALE.md §6.8 claim that only the sort doubles,
    not the shuffle."""
    plan = _plan(suite.QUERIES["ts_asof_nearest"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window [last") == 2


def test_disjunctive_revenue_or_arms_pushed_to_both_scans(spark,
                                                          sf_dir):
    """Q19 shape: Catalyst must split the cross-table OR into per-table
    implied disjunctions and push them into BOTH parquet scans; the
    join stays a broadcast hash join (part side bounded by the brand
    filter), lineitem never shuffles."""
    df = suite.QUERIES["rel_disjunctive_revenue"](spark, sf_dir)
    # toString() truncates long PushedFilters lists; formatted mode
    # prints them in full per scan
    jvm = spark._jvm
    plan = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    # lineitem scan carries the quantity-arm Or; part scan the brand/size Or
    assert "Or(Or(And(GreaterThanOrEqual(l_quantity,1.0)" in plan
    assert "Or(Or(And(EqualTo(p_brand,Brand#3)" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dedup_incremental_broadcasts_batch_not_corpus(spark, sf_dir):
    """The daily batch's banded rows broadcast; the index parquet is
    the streamed side — no shuffle of index entries, no corpus text
    column anywhere in the plan."""
    plan = _plan(suite.QUERIES["dedup_incremental"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # corpus text is never rescanned: the only text column read is the
    # new batch's (documents scan), the index scan reads hashes only
    assert "minhash_sig" in plan


def test_doc_chunking_is_map_only(spark, sf_dir):
    """Context-window chunking is one codegen stage: in-row sequence
    explode + array slice — no shuffle, no Python, so 100 TB of docs
    chunk at scan throughput with output partitioning following
    input."""
    plan = _plan(suite.QUERIES["doc_chunking"](spark, sf_dir))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Generate explode" in plan


def test_emb_project_is_map_only(spark, sf_dir):
    """The JL projection is one codegen projection over the scan: no
    shuffle, no Python — at 100 TB it is a single map pass that
    shrinks the vector column 4x before anything downstream
    shuffles it."""
    plan = _plan(suite.QUERIES["emb_project"](spark, sf_dir))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_doc_importance_broadcasts_model(spark, sf_dir):
    """DSIR scoring must join the 256-bucket importance model as a
    BROADCAST (the model is tiny by construction); the only
    corpus-keyed exchange is the per-doc sum. A shuffle join on
    bucket would re-partition the whole exploded-token stream by a
    256-value key — a guaranteed skew disaster at 100 TB."""
    plan = _plan(suite.QUERIES["doc_importance"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # doc-sum exchange + the raw/tgt bucket aggregates (partial→final
    # on a 256-value key, tiny by construction)
    assert plan.count("Exchange hashpartitioning") <= 5


def test_late_orders_is_semi_join_no_distinct(spark, sf_dir):
    """Q4's correlated EXISTS must decorrelate to a LEFT SEMI join
    with the lateness predicate inside the join condition — never a
    fan-out join + distinct (which would shuffle the duplicated
    orders stream again at 100 TB)."""
    plan = _plan(suite.QUERIES["rel_late_orders"](spark, sf_dir))
    assert "LeftSemi" in plan
    assert "HashAggregate(keys=[o_orderkey" not in plan  # no dedup agg
    assert "CartesianProduct" not in plan


def test_part_supplier_counts_anti_joins_exclusion(spark, sf_dir):
    """Q16's NOT IN must become a broadcast ANTI join against the
    tiny exclusion set — a shuffle anti join would repartition the
    whole pair stream by suppkey for a 6-row lookup."""
    plan = _plan(suite.QUERIES["rel_part_supplier_counts"](spark,
                                                           sf_dir))
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_important_stock_scalar_subquery_is_one_row_bnlj(spark,
                                                         sf_dir):
    """Q11's scalar subquery must decorrelate to a 1-row aggregate
    joined by BroadcastNestedLoopJoin — constant cost at any sf; a
    real nested-loop over data-sized inputs would be flagged by the
    doctor lint instead."""
    plan = _plan(suite.QUERIES["rel_important_stock"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    assert "SubqueryExec" not in plan


def test_ivfpq_scoring_has_no_aggregate_or_row_amplification(spark,
                                                             sf_dir):
    """r10 array-codes layout: a candidate's ADC score is an inline
    sum of m element_at lookups over broadcast nested tables — the
    scoring stage must contain NO sum aggregate (the r9 layout
    shipped m rows per candidate and summed them back) and no
    SortMergeJoin; the codes scan reads exactly (vec_id, codes)."""
    plan = _plan(suite.QUERIES["sim_ivfpq_topk"](spark, sf_dir))
    assert "partial_sum" not in plan and "sum(_dotm" not in plan
    assert "SortMergeJoin" not in plan
    assert "struct<vec_id:bigint,codes:array<bigint>>" in plan


def test_hard_negatives_scores_bucket_local(spark, sf_dir):
    """r10 bucket-local scorer: exactly one grouped-Arrow stage
    (FlatMapGroupsInPandas per LSH bucket) plus the signature
    mapInPandas — vectors must NOT join per candidate pair (no
    SortMergeJoin of vector arrays, no per-pair ArrowEvalPython)."""
    plan = _plan(suite.QUERIES["emb_hard_negatives"](spark, sf_dir))
    assert "FlatMapGroupsInPandas" in plan
    assert "ArrowEvalPython" not in plan  # the losing per-pair scorer
    assert "SortMergeJoin" not in plan


def test_dedup_paragraphs_two_exchanges(spark, sf_dir):
    """Paragraph dedup: map-only explode, ONE fingerprint-keyed
    window (corpus-wide keep-first), one doc-keyed reconstruction
    aggregate — two exchanges total; paragraph text shuffles once."""
    plan = _plan(suite.QUERIES["dedup_paragraphs"](spark, sf_dir))
    assert plan.count("Exchange hashpartitioning") == 2
    assert "Generate posexplode" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_customer_quartiles_distributed_rank(spark, sf_dir):
    """rel_customer_quartiles must NOT funnel all customers through a
    single-partition window (the r10 VERDICT's one scale-killer): its
    only Exchange SinglePartition is the per-partition-totals offsets
    frame (one row per partition), which the doctor proves bounded."""
    from quasdb_spark.plans.doctor import _single_partition_counts

    plan = _plan(suite.QUERIES["rel_customer_quartiles"](spark, sf_dir))
    bounded, unbounded = _single_partition_counts(plan)
    assert unbounded == 0
    assert "ntile" not in plan        # closed-form, no ranking window
    assert "percent_rank" not in plan


def test_global_ranks_matches_global_window(spark):
    """global_ranks == row_number over a bare global window, on a
    shuffled frame with duplicate sort values (ties broken by id)."""
    from pyspark.sql import Window

    from quasdb_spark.operators.packing import global_ranks

    df = (spark.range(0, 977).withColumn("k", (F.col("id") * 37) % 11)
          .repartition(7))
    cols = ["id", "k", "_rank", "_n"]
    got = global_ranks(df, [F.col("k").desc(), F.col("id").asc()],
                       n_parts=5).select(cols)
    want = df.withColumn(
        "_rank", F.row_number().over(
            Window.orderBy(F.col("k").desc(), F.col("id").asc()))
        .cast("long")).withColumn("_n", F.lit(977).cast("long")) \
        .select(cols)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # n smaller than n_parts: every row still ranked exactly once
    tiny = global_ranks(spark.range(3).withColumn("k", F.lit(0)),
                        [F.col("id").asc()], n_parts=8)
    assert [r._rank for r in tiny.orderBy("id").collect()] == [1, 2, 3]


def test_bm25_one_filtered_explode_no_dl_join(spark, sf_dir):
    """r15 bm25 shape: the term filter runs IN-ROW before the explode
    (only matching tokens become rows) and doc length travels through
    the tf aggregate — the all-docs dl join (the old corpus-sized
    exchange) is gone, so no join in the plan is sort-merge and the
    corpus is scanned at most 3x (stats + tf; was 4)."""
    plan = _plan(suite.QUERIES["text_bm25_search"](spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert plan.count("FileScan parquet") <= 3
    # the explode's child is the filtered array, not the raw tokens
    assert "filter(split(" in plan
    # r15 second pass: the narrow (id, dl, filtered-tokens) frame and
    # the tf table are persisted, so stats/tf and dfreq/scoring share
    # ONE executed scan+tokenize — every repeated textual FileScan
    # above sits under an InMemoryRelation and executes as cache reads
    assert "InMemoryTableScan" in plan


def test_pack_by_token_budget_checkpoints_fanout(spark, sf_dir):
    """r15: the range-partitioned (id, tokens, _pid) frame is
    checkpointed before its two consumers — the final plan reads the
    materialized rows (ExistingRDD), never the parquet scan twice
    (the before-plan had two full scan+tokenize subtrees)."""
    plan = _plan(suite.QUERIES["doc_token_packing"](spark, sf_dir))
    assert "ExistingRDD" in plan
    assert "FileScan parquet" not in plan


def test_importance_weights_predicate_equals_frame_target(spark):
    """The r15 predicate-target fast path of importance_weights must be
    bit-identical to the DataFrame-target path (same model counts, same
    integer-micro weights)."""
    from quasdb_spark.functions.text import importance_weights

    rows = [(i, ("the quick brown fox " * (i % 3 + 1)).strip(),
             "en" if i % 2 == 0 else "de")
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    via_frame = importance_weights(
        df, df.where(F.col("lang") == "en"), n_buckets=16) \
        .orderBy("doc_id").collect()
    via_pred = importance_weights(
        df, F.col("lang") == "en", n_buckets=16) \
        .orderBy("doc_id").collect()
    assert [tuple(r) for r in via_frame] == [tuple(r) for r in via_pred]
