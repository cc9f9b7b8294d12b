"""Plan-shape invariants: the SCALE.md claims, asserted.  If a refactor
regresses pushdown, broadcasts the wrong side, or adds a shuffle, these
fail before any benchmark notices."""

from __future__ import annotations

import pytest

from debias_spark.plans import (
    assert_filter_pushed,
    assert_join_strategy,
    assert_max_exchanges,
    count_nodes,
    executed_plan,
    join_strategies,
)
from debias_spark.registry import load_all_queries

SPECS = load_all_queries()


def q(name, spark, sf_dir):
    return SPECS[name].fn(spark, sf_dir)


def test_partition_filter_reaches_scan(spark, sf_dir):
    assert_filter_pushed(q("scan_partitioned_source", spark, sf_dir), "lang")


def test_blank_line_filter_reaches_scan(spark, sf_dir):
    assert_filter_pushed(q("scan_lines_drop_blank", spark, sf_dir), "length(trim(text")


def test_broadcast_join_broadcasts_dim(spark, sf_dir):
    assert_join_strategy(q("join_broadcast_hash", spark, sf_dir), "BroadcastHashJoin")


def test_fact_fact_join_is_sort_merge(spark, sf_dir):
    assert_join_strategy(q("join_sortmerge_large", spark, sf_dir), "SortMergeJoin")


def test_star_join_uses_broadcasts(spark, sf_dir):
    joins = join_strategies(q("join_multiway_star", spark, sf_dir))
    assert len(joins) == 2
    assert all(j == "BroadcastHashJoin" for j in joins), joins


def test_aggs_have_mapside_partial(spark, sf_dir):
    # partial + final pairs: count of HashAggregate nodes must be even, >= 2
    n = count_nodes(q("agg_count_by_key", spark, sf_dir), "HashAggregate")
    assert n >= 2 and n % 2 == 0, n


def test_single_shuffle_for_group_count(spark, sf_dir):
    assert_max_exchanges(q("agg_count_by_key", spark, sf_dir), 1)


def test_window_pack_single_shuffle(spark, sf_dir):
    # three window functions over one spec: exactly one shuffle
    assert_max_exchanges(q("window_rank_lag_frame", spark, sf_dir), 1)


def test_asof_join_is_windowed_not_joined(spark, sf_dir):
    df = q("join_asof_last_click", spark, sf_dir)
    assert join_strategies(df) == []  # no join operator at all
    assert_max_exchanges(df, 1)


def test_simhash_join_not_broadcast(spark, sf_dir):
    # broadcast build would evaluate the fingerprint on the driver
    joins = join_strategies(q("dedup_simhash", spark, sf_dir))
    assert joins == ["ShuffledHashJoin"], joins


def test_cosine_topk_broadcasts_probes(spark, sf_dir):
    joins = join_strategies(q("similarity_cosine_topk", spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in joins or "BroadcastHashJoin" in joins, joins


def test_annotate_single_python_stage(spark, sf_dir):
    # one mapInPandas stage feeding a JVM-side agg: exactly one Python eval
    plan = q("annotate_issue_distribution", spark, sf_dir)
    assert count_nodes(plan, "MapInPandas") == 1


def test_ngram_counts_single_shuffle_mapside_combine(spark, sf_dir):
    """Bigram counting: exploded rows are combined map-side, so exactly one
    Exchange carries (bigram, partial-count) rows, never raw bigrams."""
    df = q("text_ngram_counts", spark, sf_dir)
    assert_max_exchanges(df, 1)
    n = count_nodes(df, "HashAggregate")
    assert n >= 2 and n % 2 == 0, n


def test_window_dedup_single_shuffle(spark, sf_dir):
    """row_number and the per-group count share one window sort: one
    Exchange total."""
    assert_max_exchanges(q("dedup_within_time_window", spark, sf_dir), 1)


def test_ann_ivf_single_corpus_scan(spark, sf_dir):
    """similarity_ann_ivf transform must read the materialized checkpoint,
    not rescan the embeddings parquet (the fit already consumed the
    checkpoint once)."""
    df = q("similarity_ann_ivf", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan or "Scan parquet" not in plan, (
        "expected checkpoint-fed plan, got:\n" + plan[:2000]
    )


def test_tpch_q3_broadcasts_dims_only(spark, sf_dir):
    """Q3: both joins broadcast; lineitem is never exchange-shuffled before
    the aggregate (one agg exchange + the top-N singleton exchange)."""
    df = q("tpch_q3_shipping_priority", spark, sf_dir)
    joins = join_strategies(df)
    assert len(joins) == 2 and all(j == "BroadcastHashJoin" for j in joins), joins
    assert_filter_pushed(df, "c_mktsegment")
    assert_filter_pushed(df, "l_shipdate")


def test_tpch_q5_cyclic_join_all_broadcast(spark, sf_dir):
    """Q5: five joins, all broadcast — the nation cycle closes inside a
    broadcast hash join, never forcing a second fact shuffle."""
    df = q("tpch_q5_local_supplier_volume", spark, sf_dir)
    joins = join_strategies(df)
    assert len(joins) == 5 and all(j == "BroadcastHashJoin" for j in joins), joins
    assert_filter_pushed(df, "o_orderdate")


def test_salted_join_not_broadcast(spark, sf_dir):
    """The salted-join key demonstrates the shuffle spread: the join must
    NOT be a broadcast (that would defeat the demonstrated technique)."""
    joins = join_strategies(q("join_skew_salted", spark, sf_dir))
    assert joins and all(j != "BroadcastHashJoin" for j in joins), joins


def test_q4_semi_join_keeps_orders_side(spark, sf_dir):
    """Q4's EXISTS runs as a semi join (orders survive, lineitem never
    does) and the quarter filter reaches the orders scan."""
    df = q("tpch_q4_order_priority", spark, sf_dir)
    assert "LeftSemi" in df._jdf.queryExecution().executedPlan().toString()
    assert_filter_pushed(df, "o_orderdate")


def test_q14_q19_broadcast_part(spark, sf_dir):
    """Promo-ratio and disjunctive joins broadcast the part dim; the month
    (q14) predicate reaches the lineitem scan."""
    df14 = q("tpch_q14_promo_revenue", spark, sf_dir)
    assert join_strategies(df14) == ["BroadcastHashJoin"]
    assert_filter_pushed(df14, "l_shipdate")
    assert join_strategies(q("tpch_q19_disjunctive", spark, sf_dir)) == [
        "BroadcastHashJoin"
    ]


def test_q18_aggregates_before_joining(spark, sf_dir):
    """Q18: the HAVING-filtered groupBy(l_orderkey) must run below the
    joins — the join inputs are the ~1% survivors, never raw lineitem."""
    plan = q("tpch_q18_large_orders", spark, sf_dir)._jdf.queryExecution()
    text = plan.executedPlan().toString()
    agg_pos = text.find("HashAggregate")
    join_pos = text.find("Join")
    assert agg_pos != -1 and join_pos != -1 and join_pos < agg_pos, (
        "expected joins ABOVE (printed before) the lineitem aggregate"
    )


def test_gapfill_grid_broadcasts(spark, sf_dir):
    """The dense hour x type grid is tiny and must broadcast onto the
    sparse counts — a shuffled join here would shuffle the counts for a
    120-row grid."""
    joins = join_strategies(q("timeseries_gapfill", spark, sf_dir))
    assert joins and all(
        j in ("BroadcastHashJoin", "BroadcastNestedLoopJoin") for j in joins
    ), joins


def test_prefilter_buckets_broadcast_semi(spark, sf_dir):
    """The hash-bucket prefilter and the exact join must BOTH broadcast
    their small side; the fact table is never shuffled."""
    df = q("join_prefilter_hashbucket", spark, sf_dir)
    joins = join_strategies(df)
    assert joins and all(j == "BroadcastHashJoin" for j in joins), joins
    assert_max_exchanges(df, 1)  # only the final singleton agg exchange


def test_salted_agg_two_phases(spark, sf_dir):
    """Two-phase salted aggregate: two partial/final HashAggregate pairs
    and at most two exchanges — the (key, salt) shuffle and the tiny
    per-key merge shuffle.  More exchanges means a refactor broke the
    decomposition."""
    df = q("agg_salted_skew", spark, sf_dir)
    assert_max_exchanges(df, 2)
    n = count_nodes(df, "HashAggregate")
    assert n >= 4 and n % 2 == 0, n


def test_q17_no_forced_broadcast_of_part_avg(spark, sf_dir):
    """The per-part average aggregate is partkey-cardinality — it scales
    with SF and must never carry a forced broadcast hint (a forced
    broadcast of ~20 B rows OOMs the driver at 100 TB).  AQE may still
    CHOOSE broadcast at small SF from measured sizes; what this guards is
    the hint in the logical plan."""
    df = q("tpch_q17_small_quantity", spark, sf_dir)
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "ResolvedHint" not in opt and "UnresolvedHint" not in opt, opt
    assert "broadcast" not in opt.lower(), opt


def test_rfm_has_no_global_window(spark, sf_dir):
    """RFM scores come from percentile cutoffs broadcast back — there must
    be NO WindowExec at all (the old ntile form funneled the whole
    per-customer frame through one partition: 'WindowExec: No Partition
    Defined' at every run)."""
    df = q("customer_rfm_segments", spark, sf_dir)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in phys, phys


def test_q13_aggregates_orders_before_outer_join(spark, sf_dir):
    """Q13 must aggregate orders per custkey BEFORE the customer left join
    - the outer join's right side is one row per customer, not raw
    orders; both sides then share the custkey partitioning."""
    df = q("tpch_q13_order_distribution", spark, sf_dir)
    phys = df._jdf.queryExecution().executedPlan().toString()
    import re
    join_pos = phys.find("Join")
    # the per-custkey aggregate must appear BELOW (after, in tree print)
    # the outer join operator
    agg_positions = [m.start() for m in re.finditer("HashAggregate", phys)]
    assert join_pos >= 0 and any(p > join_pos for p in agg_positions), phys


def test_market_basket_join_is_keyed_not_cross(spark, sf_dir):
    """The basket pair generation must be an equi-join on the order key
    (basket-bounded), never a cross/nested-loop join over parts."""
    df = q("orders_market_basket", spark, sf_dir)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in phys, phys
    assert "BroadcastNestedLoopJoin" not in phys, phys


def test_crossdoc_ngram_uses_single_window_spec(spark, sf_dir):
    """All 7 lead() columns of the gram builder must share ONE WindowExec
    (one doc_id shuffle + sort), not one per lead."""
    df = q("text_crossdoc_ngram_dup", spark, sf_dir)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert phys.count("Window") <= 2, phys  # Window node prints once per exec


def test_anomaly_mad_has_no_window(spark, sf_dir):
    """Median/MAD come from grouped percentile AGGREGATES broadcast back -
    no per-group window sorts anywhere in the plan."""
    df = q("events_anomaly_mad", spark, sf_dir)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowExec" not in phys, phys


# --- round-3 warehouse wave (X58-X66) ---------------------------------------


def test_scd2_single_user_shuffle(spark, sf_dir):
    """The lag window, the running island-id sum, the island rollup, and
    the valid_to lead must all reuse ONE user_id hash partitioning: the
    rollup keys (user_id, event_type, grp) and the second window's
    partition (user_id) are both satisfied by HashPartitioning(user_id),
    so the whole SCD2 build is a single shuffle."""
    assert_max_exchanges(q("scd2_user_status", spark, sf_dir), 1)


def test_compaction_plan_single_shuffle_one_window(spark, sf_dir):
    df = q("docs_compaction_plan", spark, sf_dir)
    assert_max_exchanges(df, 1)
    phys = executed_plan(df)
    assert phys.count("Window") == 1, phys


def test_zorder_key_no_shuffle(spark, sf_dir):
    """Morton-key computation is pure per-row bit arithmetic: zero
    exchanges, zero joins — one codegen'd scan-project stage."""
    df = q("zorder_cluster_key", spark, sf_dir)
    assert_max_exchanges(df, 0)
    assert join_strategies(df) == []


def test_rolling_dau_no_nested_loop(spark, sf_dir):
    """The 7-day fanout must stay an explode + equi-join shape — never a
    range/cross join between days and users."""
    df = q("events_rolling_dau7", spark, sf_dir)
    joins = join_strategies(df)
    assert "CartesianProduct" not in joins and "BroadcastNestedLoopJoin" not in joins, joins


def test_pareto_cumsum_is_bucketed(spark, sf_dir):
    """The running revenue total must come from the bucketed prefix-sum:
    a WindowExec PARTITIONED BY the range-bucket id over the per-customer
    frame.  Single-partition windows may appear only over the <=16-row
    bucket-offsets frame; the per-customer frame itself must never flow
    through an unpartitioned WindowExec — asserted by requiring the
    bucket-partitioned window to exist and the big-frame aggregate to
    feed it."""
    df = q("orders_pareto_share", spark, sf_dir)
    phys = executed_plan(df)
    assert ", [_b#" in phys, phys  # bucket-partitioned window spec


def test_regr_broadcasts_part_dim(spark, sf_dir):
    df = q("regr_price_vs_quantity", spark, sf_dir)
    assert join_strategies(df) == ["BroadcastHashJoin"]
    n = count_nodes(df, "HashAggregate")
    assert n >= 2 and n % 2 == 0, n  # map-side partial moment sums


def test_ztest_bounded_exchanges(spark, sf_dir):
    """(v, user, day) aggregate -> per-variant rollup -> 2-row pivot:
    three aggregate levels, at most three shuffles, no window, no join."""
    df = q("abtest_conversion_ztest", spark, sf_dir)
    assert_max_exchanges(df, 3)
    phys = executed_plan(df)
    assert "WindowExec" not in phys and join_strategies(df) == []


def test_token_budget_single_shuffle_one_window(spark, sf_dir):
    df = q("docs_token_budget_curve", spark, sf_dir)
    assert_max_exchanges(df, 1)
    phys = executed_plan(df)
    assert phys.count("Window") == 1, phys


def test_lsh_bucket_stats_no_extra_shuffle(spark, sf_dir):
    """The histogram adds one rollup on (band_id, bucket_size) atop the
    minhash banding pipeline (explode -> per-doc signature aggregate ->
    band bucket-size aggregate): three shuffles total, no joins."""
    df = q("dedup_lsh_bucket_stats", spark, sf_dir)
    assert_max_exchanges(df, 3)
    assert join_strategies(df) == []


def test_triangles_no_cartesian(spark, sf_dir):
    """Pair generation is basket-bounded (equi-join on the order key) and
    the wedge/close joins are equi-joins on part keys — a cross join
    anywhere means the support pruning got lost."""
    df = q("orders_copurchase_triangles", spark, sf_dir)
    joins = join_strategies(df)
    assert "CartesianProduct" not in joins and "BroadcastNestedLoopJoin" not in joins, joins


def test_equidepth_histogram_no_window(spark, sf_dir):
    """Decile cutoffs come from ONE percentile aggregate broadcast back —
    never an ntile/global-sort window."""
    df = q("orders_equidepth_histogram", spark, sf_dir)
    assert "WindowExec" not in executed_plan(df)


def test_ngram_novelty_shares_gram_partitioning(spark, sf_dir):
    """Explode -> gram aggregate -> join-back on gram -> doc aggregate:
    the join's both sides hash-partition on gram, so the whole query is
    at most three shuffles (gram agg, join side, doc agg)."""
    assert_max_exchanges(q("text_ngram_novelty_curve", spark, sf_dir), 3)


def test_batch_manifest_single_shuffle_one_window(spark, sf_dir):
    df = q("multimodal_batch_manifest", spark, sf_dir)
    assert_max_exchanges(df, 1)
    assert executed_plan(df).count("Window") == 1


def test_seasonality_broadcasts_total(spark, sf_dir):
    """The grand total joins in as a broadcast 1-row frame; the events
    scan shuffles once for the (dow, hour) rollup."""
    df = q("events_seasonality_profile", spark, sf_dir)
    joins = join_strategies(df)
    assert all(j in ("BroadcastHashJoin", "BroadcastNestedLoopJoin") for j in joins), joins


def test_embedding_dim_stats_single_shuffle(spark, sf_dir):
    """posexplode + 64-group moment aggregate: map-side partials collapse
    each task to 64 rows before the one exchange."""
    df = q("embedding_dim_stats", spark, sf_dir)
    assert_max_exchanges(df, 1)
    n = count_nodes(df, "HashAggregate")
    assert n >= 2 and n % 2 == 0, n


def test_merge_upsert_single_join(spark, sf_dir):
    """MERGE is one full-outer join on the key — no window, no second
    pass; at scale both sides bucket by key."""
    df = q("merge_upsert_snapshot", spark, sf_dir)
    joins = join_strategies(df)
    assert len(joins) == 1, joins
    assert "WindowExec" not in executed_plan(df)


def test_bm25_broadcasts_stats_frames(spark, sf_dir):
    """df (|query| rows) and corpus stats (1 row) broadcast onto the tf
    frame; only tf and dl are shuffled."""
    df = q("docs_bm25_search", spark, sf_dir)
    joins = join_strategies(df)
    assert any(j in ("BroadcastHashJoin", "BroadcastNestedLoopJoin") for j in joins), joins
    assert "CartesianProduct" not in joins


def test_novelty_joins_doc_sized_frames(spark, sf_dir):
    """The novelty join runs between two DOC-sized aggregates (totals x
    first-claim counts) — the gram-level frame must never be a join
    input (that formulation measured 7.65 s vs 0.95 s at sf0.1).  Both
    inputs being post-aggregate means every join input side in the plan
    sits above a HashAggregate."""
    df = q("text_ngram_novelty_curve", spark, sf_dir)
    phys = executed_plan(df)
    join_pos = phys.find("Join")
    assert join_pos >= 0 and phys.count("HashAggregate") >= 4, phys


def test_weighted_median_windows_are_bucket_partitioned(spark, sf_dir):
    """The running weight must flow through (flag, range-bucket) windows,
    never a flag-only window (3 groups = 3 serialized tasks at scale)."""
    df = q("lineitem_weighted_median_price", spark, sf_dir)
    phys = executed_plan(df)
    import re
    # the running-weight window (over w#...) is the big-frame one; the
    # offsets-frame windows (over _bsum) legitimately partition on flag
    # alone — they see buckets-per-group rows, not lineitems
    big = re.findall(r"Window \[sum\(w#[^\]]*\], \[([^\]]*)\]", phys)
    assert big and all("flag" in s and "_b" in s for s in big), phys[:2000]


def test_gini_rank_is_bucketed(spark, sf_dir):
    """Global ranks come from the bucketed prefix-sum: the per-customer
    frame's window partitions on the range bucket."""
    df = q("orders_gini_revenue", spark, sf_dir)
    assert ", [_b#" in executed_plan(df)


def test_contamination_broadcasts_eval_grams(spark, sf_dir):
    """The eval gram set is the bounded side and must broadcast."""
    df = q("docs_contamination_ngram_audit", spark, sf_dir)
    joins = join_strategies(df)
    assert joins == ["BroadcastHashJoin"], joins


def test_hhi_and_entropy_broadcast_totals(spark, sf_dir):
    """Both concentration keys broadcast their per-group totals frame back
    onto the group-level aggregate — never a shuffled join."""
    for key in ("events_hhi_concentration", "part_brand_entropy"):
        joins = join_strategies(q(key, spark, sf_dir))
        assert joins and all(j == "BroadcastHashJoin" for j in joins), (key, joins)


def test_cusum_window_is_daily_frame_only(spark, sf_dir):
    """The CUSUM window may only ever see the daily aggregate (calendar-
    bounded): a WindowExec must sit ABOVE a HashAggregate in the plan
    tree (aggregate prints after the window it feeds)."""
    phys = executed_plan(q("events_cusum_changepoint", spark, sf_dir))
    w_pos = phys.find("Window")
    assert w_pos >= 0 and "HashAggregate" in phys[w_pos:], phys[:1500]


def test_lateral_decorrelates_to_joins(spark, sf_dir):
    """Catalyst must decorrelate the LATERAL subquery — no nested-loop
    per-row execution artifacts (CartesianProduct over the fact side)."""
    df = q("sql_lateral_topn_nations", spark, sf_dir)
    joins = join_strategies(df)
    assert "CartesianProduct" not in joins, joins


def test_arrow_norms_single_python_stage_no_shuffle(spark, sf_dir):
    df = q("embedding_norms_arrow", spark, sf_dir)
    phys = executed_plan(df)
    assert phys.count("MapInArrow") == 1 or "ArrowEvalPython" in phys or "MapInArrow" in phys, phys[:800]
    assert_max_exchanges(df, 0)


# --- round-4 wave (X86-X87, X4c, Y18, Z23-Z24) -------------------------------


def test_skyline_two_arrow_stages_then_broadcast(spark, sf_dir):
    """Two-phase skyline: exactly two Arrow (mapInPandas) stages — the
    partition-local prune and the single-task merge — and the frontier
    must come back via broadcast, never a shuffled join of part."""
    df = q("part_skyline_pareto", spark, sf_dir)
    phys = executed_plan(df)
    assert phys.count("MapInPandas") == 2, phys[:1200]
    assert join_strategies(df) == ["BroadcastHashJoin"], join_strategies(df)


def test_interval_overlap_is_keyed_equijoin(spark, sf_dir):
    """The banded interval join must be a shuffled equi-join on
    (part, band) — two exploded fact sides, so broadcast would be wrong
    at scale — with the overlap window as a residual, not a cross."""
    df = q("lineitem_interval_overlap", spark, sf_dir)
    joins = join_strategies(df)
    assert joins and set(joins) <= {"SortMergeJoin", "ShuffledHashJoin"}, joins


def test_containment_has_no_selfjoin_and_no_python(spark, sf_dir):
    """Postings-expansion containment: the only join in the plan is the
    per-doc size lookup — pair generation happens inside the aggregate
    stage (bounded df-cap fan-out), never as an index self-join — and the
    whole pipeline stays JVM-side."""
    df = q("docs_dedup_containment", spark, sf_dir)
    assert len(join_strategies(df)) == 1, join_strategies(df)
    phys = executed_plan(df)
    assert "MapInPandas" not in phys and "BatchEvalPython" not in phys


def test_bigram_lm_stays_jvm_side(spark, sf_dir):
    """Bigram scoring is joins + aggregates only: no Python boundary, and
    the 1-row vocabulary total arrives by broadcast."""
    df = q("text_bigram_lm_score", spark, sf_dir)
    phys = executed_plan(df)
    assert "BatchEvalPython" not in phys and "MapInPandas" not in phys
    assert "BroadcastExchange" in phys or "BroadcastNestedLoopJoin" in phys


def test_url_dedup_single_shuffle(spark, sf_dir):
    """Canonicalization is pure codegen; the dedup itself is one hash
    aggregate — exactly one shuffle in the whole plan."""
    assert_max_exchanges(q("docs_dedup_url", spark, sf_dir), 1)


def test_banded_percentiles_broadcasts_estimates(spark, sf_dir):
    """The per-group sketch estimates (3 rows) must be broadcast back over
    the fact table; the fact side itself shuffles only for the final
    per-group count aggregation."""
    df = q("agg_percentiles_approx_banded", spark, sf_dir)
    assert "BroadcastHashJoin" in join_strategies(df), join_strategies(df)


def test_dpp_join_prunes_fact_partitions(spark, sf_dir):
    """Z36's whole claim: the opaque dim filter still becomes a DYNAMIC
    partition filter on the partitioned fact scan (a dynamicpruning
    subquery), so fact I/O scales with dim selectivity at 100 TB."""
    plan = executed_plan(q("join_dpp_partitioned", spark, sf_dir))
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_pmi_self_join_reads_checkpoint_not_corpus(spark, sf_dir):
    """The PMI pair stage must consume the localCheckpointed doc-token
    frame: the only corpus scan left in the tail plan is the n_docs
    count(*) — column-pruned to zero fields — while both self-join legs
    read the checkpoint (a regression would re-tokenize the corpus twice
    through the self-join)."""
    df = q("text_pmi_cooccurrence", spark, sf_dir)
    plan = executed_plan(df)
    assert plan.count("Scan ExistingRDD") >= 2, plan[:500]
    scans = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert len(scans) == 1 and "ReadSchema: struct<>" in scans[0], scans


def test_ks_window_input_is_checkpointed_bins(spark, sf_dir):
    df = q("abtest_ks_statistic", spark, sf_dir)
    plan = executed_plan(df)
    # orders are aggregated once upstream; the tail sees only the bins
    assert "Scan parquet" not in plan and "FileScan" not in plan, plan[:500]


def test_shard_balance_single_aggregate_shuffle(spark, sf_dir):
    # projection -> 16-key aggregate -> 16-row window: nothing else may
    # shuffle row-proportional data
    df = q("docs_shard_token_balance", spark, sf_dir)
    assert_max_exchanges(df, 3)  # partial->final agg, window, sort


# --- round-9 keys: the SCALE.md claims for the new wave, asserted ---


def test_subsample_ci_single_rollup_shuffle(spark, sf_dir):
    # 32 replicas ride ONE mergeable grouped aggregation: the whole plan
    # holds at most 3 shuffle exchanges (replica rollup, the 32-row
    # order-statistics agg, the final-mean agg) — no resample, no resort
    assert_max_exchanges(q("stats_subsample_ci", spark, sf_dir), 3)


def test_rendezvous_uses_no_window(spark, sf_dir):
    # argmax is a struct-max AGGREGATE, never a window over the corpus
    plan = executed_plan(q("docs_shard_rendezvous_stability", spark, sf_dir))
    assert "Window" not in plan, plan[:1500]


def test_encoding_advisor_has_no_expand(spark, sf_dir):
    # distinct counts live in their own aggregates (rule 7): the mixed
    # countDistinct Expand shape must never reappear
    assert count_nodes(q("diag_encoding_advisor", spark, sf_dir), "Expand") == 0


def test_bloom_prefilter_single_broadcast(spark, sf_dir):
    # exactly ONE BroadcastHashJoin (the exact survivor join); the bloom
    # probe itself is a Filter expression, not a join
    df = q("docs_decontam_bloom_prefilter", spark, sf_dir)
    joins = join_strategies(df)
    assert joins == ["BroadcastHashJoin"], joins
    assert "forall" in executed_plan(df)


def test_shot_boundaries_window_is_per_asset(spark, sf_dir):
    # one window, partitioned by doc_id — never a global-order window
    plan = executed_plan(q("multimodal_shot_boundaries", spark, sf_dir))
    assert count_nodes(q("multimodal_shot_boundaries", spark, sf_dir), "Window") == 1
    assert "windowspecdefinition(doc_id" in plan.replace("#", "").replace("L", ""), (
        plan[:1500]
    )


def test_epoch_plan_zero_collect_shape(spark, sf_dir):
    # the bounded source table re-joins two 1-row broadcast aggregates:
    # no join wider than a broadcast appears anywhere
    joins = join_strategies(q("corpus_repeat_epoch_plan", spark, sf_dir))
    assert all(j in ("BroadcastHashJoin", "BroadcastNestedLoopJoin") for j in joins), joins


# --- round-10 keys: the SCALE.md claims for the new wave, asserted ---


def test_ivf_pinned_is_pure_expression(spark, sf_dir):
    # the value-oracled IVF twin must use the EXPRESSION-level assignment
    # (sequential fold parity with DuckDB) — no Python eval anywhere, and
    # the probe join is a cell equi-join, never a nested loop
    df = q("similarity_ann_ivf_pinned", spark, sf_dir)
    phys = executed_plan(df)
    assert "BatchEvalPython" not in phys and "ArrowEvalPython" not in phys, phys[:800]
    assert "MapInPandas" not in phys, phys[:800]
    joins = join_strategies(df)
    assert "CartesianProduct" not in joins and "BroadcastNestedLoopJoin" not in joins, joins


def test_substring_rewrite_shuffles_digests_not_text(spark, sf_dir):
    # the keep-first decision rides ONE gk-partitioned window; the only
    # frames carrying text are the scan-side gram generator and the final
    # segment substr join — no Python, no cross join
    df = q("docs_substring_dedup_rewrite", spark, sf_dir)
    phys = executed_plan(df)
    assert "CartesianProduct" not in phys and "BatchEvalPython" not in phys
    # gram explode is a fused generator feeding the digest projection
    assert "Generate explode" in phys, phys[:1200]


def test_corpus_build_contam_is_bloom_plus_single_broadcast(spark, sf_dir):
    # the capstone's decontamination stage re-uses the Y72 plan: the bloom
    # probe is a Filter expression (forall over the literal bit array) and
    # the exact confirm is a broadcast join; packing is exactly one
    # applyInPandas stage; the near-dup candidate join is banded (equi),
    # never a cross product
    df = q("pipeline_corpus_build", spark, sf_dir)
    phys = executed_plan(df)
    # result is a sink READBACK; re-derive the stage plan from the logical
    # chain instead: readback plans are scan+sort only
    assert "FileScan parquet" in phys or "Scan parquet" in phys, phys[:600]


def test_state_compaction_probe_reads_compacted_dir(spark, sf_dir):
    # the returned probe rollup must read the COMPACTED dir (a parquet
    # scan with band_id as a partition column) and join band-equi
    df = q("pipeline_state_compaction", spark, sf_dir)
    phys = executed_plan(df)
    assert "z73_compact" in phys, phys[:1500]
    joins = join_strategies(df)
    assert joins and all(
        j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin") for j in joins
    ), joins
