"""Physical-plan regression tests for the performance-critical queries.

Correctness is the oracle gate's job; these tests pin the *plan shapes*
that matter at 100 TB — filter pushdown, column pruning, broadcast
joins, exchange counts — so a refactor that silently de-optimizes a
query fails CI, not the cluster.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def plans(spark):
    qs = entry_mod.queries()

    def plan_of(name: str) -> str:
        return qs[name](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()

    return plan_of


class TestScanShapes:
    def test_q1_filter_pushed_and_columns_pruned(self, plans):
        p = plans("q1_pricing_summary")
        assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in p
        # Projection reaches the scan: no pgn-wide reads, only the 7
        # needed lineitem columns.
        read = p.split("ReadSchema:", 1)[1].splitlines()[0]
        assert "l_comment" not in read and "l_orderkey" not in read

    def test_key_scan_reads_one_column(self, plans):
        p = plans("s4_key_scan")
        read = p.split("ReadSchema:", 1)[1].splitlines()[0]
        assert read.count(":") == 1  # struct<o_orderkey:bigint>


class TestJoinShapes:
    def test_star_join_broadcasts_all_dims(self, plans):
        p = plans("j3_star_join")
        assert p.count("BroadcastHashJoin") == 3
        assert "SortMergeJoin" not in p
        # The fact side shuffles exactly once (the final groupBy).
        assert p.count("Exchange hashpartitioning") == 1

    def test_topn_semi_join_broadcasts(self, plans):
        p = plans("j4_topn_semi")
        assert "BroadcastHashJoin" in p and "LeftSemi" in p

    def test_brand_revenue_broadcasts_part(self, plans):
        p = plans("f4_top5_by_measure")
        assert "BroadcastHashJoin" in p
        assert "SortMergeJoin" not in p


class TestAggWindowShapes:
    def test_card_measures_single_pass(self, plans):
        p = plans("a1_card_measures")
        # One aggregate pair (partial+final), no join, no extra exchange.
        assert p.count("HashAggregate") == 2
        assert "Join" not in p

    def test_rolling_window_preaggregates(self, plans):
        p = plans("w1_rolling_12d")
        # Window runs over per-day partials: the Window node sits above
        # an aggregation, and the frame is RANGE, not ROWS.
        assert "Window" in p
        assert "RangeFrame" in p
        assert "RowFrame" not in p

    def test_order_limit_is_top_k(self, plans):
        p = plans("f5_order_limit")
        assert "TakeOrderedAndProject" in p


class TestBeyondParityShapes:
    def test_asof_join_single_shuffle_no_bnl(self, plans):
        p = plans("j5_asof_join")
        assert "BroadcastNestedLoopJoin" not in p
        assert "CartesianProduct" not in p
        # The union-tag plan: one hash exchange for the per-key window,
        # plus one for the query's right-side (user, ts) pre-aggregation.
        assert p.count("Exchange hashpartitioning") == 2

    def test_range_join_is_equi_join_on_bins(self, plans):
        p = plans("j6_range_join")
        assert "BroadcastNestedLoopJoin" not in p
        assert "CartesianProduct" not in p

    def test_winnow_is_scan_local(self, plans):
        # Fingerprinting is explode-only: no KEYED shuffle anywhere.
        # Since optimization r15 the narrow local scan is spread with a
        # round-robin repartition before the CPU-heavy hashing stage
        # (ensure_parallelism — a no-op when the scan has real splits),
        # so exactly that one exchange kind is allowed.
        p = plans("text_winnow")
        assert "hashpartitioning" not in p
        assert "rangepartitioning" not in p
        assert "SinglePartition" not in p

    def test_chunking_is_scan_local(self, plans):
        # Same contract as winnow: explode-only, no keyed shuffle; the
        # r15 parallelism spread's round-robin exchange is allowed.
        p = plans("train_chunks")
        assert "hashpartitioning" not in p
        assert "rangepartitioning" not in p
        assert "SinglePartition" not in p

    def test_mixture_is_pure_filter(self, plans):
        p = plans("train_mixture")
        assert "Exchange" not in p
        assert "Join" not in p

    def test_tfidf_broadcasts_idf(self, plans):
        p = plans("text_tfidf_top5")
        assert "BroadcastHashJoin" in p
        assert "SortMergeJoin" not in p


class TestRound5NewOpShapes:
    def test_overlap_join_is_equi_on_bins(self, plans):
        p = plans("j7_overlap_join")
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p

    def test_heavy_hitters_semi_join_broadcasts_candidates(self, plans):
        # the exact recount must prune via a BROADCAST semi join on the
        # tiny MG candidate set — a shuffled semi would move the full
        # key stream twice
        p = plans("a19_heavy_hitters")
        assert "BroadcastHashJoin" in p and "LeftSemi" in p
        assert "SortMergeJoin" not in p

    def test_spans_no_allpairs(self, plans):
        p = plans("dedup_spans")
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p

    def test_surprisal_single_token_shuffle_family(self, plans):
        # token->tf join is an equi join; the 1-row total is broadcast
        # (BNL on a single-row side is the pinned-acceptable pattern)
        p = plans("text_surprisal")
        assert "CartesianProduct" not in p

    def test_curriculum_offsets_broadcast_back(self, plans):
        p = plans("train_curriculum")
        assert "BroadcastExchange" in p
        assert "CartesianProduct" not in p

    def test_semantic_dedup_no_cartesian_pairgen(self, plans):
        # pair-gen must ride the salted (bucket, salt) equi join; the
        # only nested-loop joins are the tiny centroid broadcasts
        p = plans("dedup_semantic")
        assert "CartesianProduct" not in p


class TestTpchJoinShapes:
    def test_q3_broadcasts_customer_single_fact_shuffle(self, plans):
        p = plans("q3_shipping_priority")
        assert "BroadcastHashJoin" in p
        assert "SortMergeJoin" not in p and "CartesianProduct" not in p
        assert "TakeOrderedAndProject" in p  # top-10 never global-sorts

    def test_q5_six_way_join_all_dims_broadcast(self, plans):
        p = plans("q5_local_supplier_volume")
        assert p.count("BroadcastHashJoin") >= 4
        assert "SortMergeJoin" not in p and "CartesianProduct" not in p

    def test_q4_exists_is_semi_join_with_pushed_filters(self, plans):
        p = plans("q4_order_priority")
        assert "LeftSemi" in p
        assert "SortMergeJoin" not in p and "CartesianProduct" not in p
        # the 'R' probe filter reaches the lineitem scan
        assert "EqualTo(l_returnflag,R)" in p

    def test_q7_nation_pair_all_dims_broadcast(self, plans):
        p = plans("q7_volume_shipping")
        assert p.count("BroadcastHashJoin") >= 4
        assert "SortMergeJoin" not in p and "CartesianProduct" not in p

    def test_q10_top20_never_global_sorts(self, plans):
        p = plans("q10_returned_items")
        assert "TakeOrderedAndProject" in p
        assert "SortMergeJoin" not in p and "CartesianProduct" not in p
        assert "EqualTo(l_returnflag,R)" in p  # pushed to the fact scan

    def test_q13_outer_join_is_preaggregated(self, plans):
        # the rewrite aggregates orders BEFORE joining customer: the
        # outer join must be a broadcast of the aggregate (dim-sized),
        # never a fact-side SMJ
        p = plans("q13_order_distribution")
        assert "BroadcastHashJoin" in p and "LeftOuter" in p
        assert "SortMergeJoin" not in p

    def test_q17_avg_subquery_single_brand_slice(self, plans):
        # both the aggregate and the probe read the brand slice; part
        # prune is pushed, no fact-fact SMJ
        p = plans("q17_small_qty_revenue")
        assert "SortMergeJoin" not in p and "CartesianProduct" not in p
        assert "BroadcastHashJoin" in p

    def test_q18_having_filter_broadcasts_survivors(self, plans):
        p = plans("q18_large_orders")
        assert "TakeOrderedAndProject" in p
        assert "SortMergeJoin" not in p and "CartesianProduct" not in p

    def test_q19_disjunction_prunes_part_build_side(self, plans):
        p = plans("q19_disjunctive_revenue")
        assert "BroadcastHashJoin" in p
        assert "SortMergeJoin" not in p and "CartesianProduct" not in p
        # brand IN-list is pushed into the part scan
        assert "In(p_brand" in p

    def test_q21_rewrite_is_single_fact_aggregate_no_self_join_pair(self, plans):
        # the EXISTS/NOT-EXISTS pair is ONE per-order aggregate + a
        # broadcast of the tiny survivor set — lineitem never SMJs or
        # shuffle-joins against itself
        p = plans("q21_waiting_supplier")
        assert "SortMergeJoin" not in p and "CartesianProduct" not in p
        assert "LeftSemi" in p  # the status='F' orders probe

    def test_q2_correlated_min_is_preaggregate_no_smj(self, plans):
        # the correlated MIN subquery must run as a pre-aggregate whose
        # result BROADCASTS back into the region slice — no fact-side
        # sort-merge, no cartesian
        p = plans("q2_min_cost_supplier")
        assert "SortMergeJoin" not in p and "CartesianProduct" not in p
        assert "BroadcastHashJoin" in p
        assert "TakeOrderedAndProject" in p  # top-100 never global-sorts

    def test_q6_pure_scan_zero_joins_pushed_filters(self, plans):
        # Q6 is the pushdown yardstick: no joins at all, and both range
        # predicates reach the parquet scan
        p = plans("q6_forecast_revenue")
        assert "Join" not in p
        assert "PushedFilters: [IsNotNull(l_shipdate)" in p
        # the full predicate list is truncated in toString; the Filter
        # node shows the band + quantity predicates made it below the agg
        assert ">= 0.03)" in p and "< 24.0)" in p

    def test_q8_share_is_single_pass_conditional_agg(self, plans):
        # numerator and denominator come from ONE joined pass — the
        # fact is never scanned twice, all dims broadcast
        p = plans("q8_market_share")
        assert p.count("BroadcastHashJoin") >= 5
        assert "SortMergeJoin" not in p and "CartesianProduct" not in p

    def test_q9_name_slice_prunes_broadcast_build_side(self, plans):
        p = plans("q9_product_profit")
        assert "SortMergeJoin" not in p and "CartesianProduct" not in p
        assert "StringContains(p_name,widget)" in p  # pushed to part scan

    def test_q11_global_threshold_is_one_row_broadcast(self, plans):
        # the HAVING-vs-global-total compares via decimal multiplication
        # against a 1-row broadcast — no fact-side division, and the
        # only nested-loop join is that single-row stat join
        p = plans("q11_important_stock")
        assert "SortMergeJoin" not in p and "CartesianProduct" not in p

    def test_q12_fact_fact_join_no_broadcast_of_orders(self, plans):
        # orders is fact-sized: the join must be a shuffle hash join on
        # orderkey (AQE may pick broadcast at sf0.001 — assert only the
        # absence of pathological shapes)
        p = plans("q12_shipmode_priority")
        assert "CartesianProduct" not in p

    def test_q15_max_revenue_is_scalar_broadcast(self, plans):
        # the revenue view aggregates once; the max is a 1-row
        # broadcast; supplier broadcasts — no SMJ anywhere
        p = plans("q15_top_supplier")
        assert "SortMergeJoin" not in p

    def test_q16_exclusion_is_broadcast_anti_join(self, plans):
        p = plans("q16_supplier_part_counts")
        assert "LeftAnti" in p
        assert "SortMergeJoin" not in p and "CartesianProduct" not in p

    def test_q20_nested_in_chain_is_semi_joins(self, plans):
        # both IN subqueries become semi joins (part-name prune into
        # lineitem, survivor suppliers into supplier) — the correlated
        # threshold is one aggregate pass computing both quantities
        p = plans("q20_excess_stock_suppliers")
        assert "LeftSemi" in p
        assert "SortMergeJoin" not in p and "CartesianProduct" not in p

    def test_q22_threshold_is_multiplication_not_division(self, plans):
        # the scalar-avg threshold rides a 1-row broadcast and an exact
        # decimal product — no fact-side division, no cartesian blowup
        # beyond the single-row stat join
        p = plans("q22_dormant_customers")
        assert "LeftAnti" in p
        assert "SortMergeJoin" not in p


class TestGlobalWindowGate:
    """The WindowExec gate (verdict-r8 ask #5): every partition-undefined
    window in the registry is enumerated here with WHY it is bounded;
    any new unlisted one fails. A global window funnels all input rows
    through one task (`Exchange SinglePartition`), which is fine over a
    frame whose size is |groups|/|days|/|top-k| — and a cluster-killer
    over anything data-sized. The bench tail's "No Partition Defined
    for Window operation" warnings come exactly from these nodes, so
    with the list pinned, a NEW warning means a NEW plan hazard.
    """

    # query -> exact count of partition-undefined Window nodes in its
    # optimized plan, each justified by the bounded frame it ranks:
    GLOBAL_WINDOW_WHITELIST = {
        # global rank over per-group aggregates: <=|groups| rows
        # (operators/topk.py top_n_by — the Power BI TopN filter shape)
        "f3_top10_by_count": 1,
        "f4_top5_by_measure": 1,
        "f7_cross_filter": 1,
        "j4_topn_semi": 1,
        # trailing RANGE frame over the per-day pre-agg: <=|days| rows
        "w1_rolling_12d": 1,
        # share-of-total + rank over the per-group agg: <=|groups| rows
        "a26_share_of_total": 2,
        # period-over-period lag over per-period aggs: <=|periods| rows
        "w13_period_growth": 1,
        # skew metrics over per-key counts capped by top-k
        # (operators/skew.py): <=k rows
        "dq_skew_report": 1,
        # RRF fusion rank over the two top-k candidate lists
        # (operators/retrieval.py): <=2k rows
        "text_hybrid_rrf": 1,
        # percentile-cell offsets cumsum: <=|cells|+1 (~33) rows
        # (BASELINE.md w8 re-baseline profile)
        "w8_ntile_deciles": 1,
        # curriculum pack ordering over per-bucket boundaries:
        # <=|buckets| rows (operators/training.py curriculum_order)
        "train_curriculum": 1,
        # global-shard offsets cumsum over the per-range-bucket token
        # sums: <= id-span/bucket_width rows, caller-bounded
        # (operators/training.py shard_by_token_budget step 3)
        "train_shard_pack": 1,
        # same offsets-cumsum class, over per-range-bucket item-cost
        # sums (operators/training.py interleave_multimodal_samples)
        "train_interleave": 1,
        # same offsets-cumsum class, over per-range-bucket counts of the
        # shuffle key: <= order_buckets (64) rows
        # (operators/training.py epoch_order step 2)
        "train_epoch_order": 1,
        # LSH/contract entries: the contract summary frame is a
        # handful of booleans/scalars ranked once (tiny by contract)
        "dedup_minhash_lsh": 1,
        "dedup_embed_lsh": 1,
        "dedup_incremental_near": 1,
        "dedup_semantic": 1,
    }

    def test_no_unlisted_global_windows(self, spark):
        from chesscom_etl_tableau_spark.sources.tables import (
            TESTDATA_TABLES,
            load_table,
        )
        from chesscom_etl_tableau_spark.util import global_windows

        for t in TESTDATA_TABLES:
            load_table(spark, SF_DIR, t)  # warm footer-schema cache
        qs = entry_mod.queries()
        sc = spark.sparkContext
        group = "global-window-gate"
        sc.setJobGroup(group, "plan traversal must stay job-free")
        offenders, stale = {}, {}
        try:
            for name in qs:
                if name in entry_mod.EAGER_QUERIES:
                    continue  # eager pipelines compose the same audited ops
                got = len(global_windows(qs[name](spark, SF_DIR)))
                allowed = self.GLOBAL_WINDOW_WHITELIST.get(name, 0)
                if got > allowed:
                    offenders[name] = (got, allowed)
                elif got < allowed:
                    stale[name] = (got, allowed)
        finally:
            sc.setJobGroup(None, None)
        assert not offenders, (
            "NEW partition-undefined window(s) — a data-sized frame here "
            f"dies at scale; justify + whitelist or repartition: {offenders}"
        )
        assert not stale, (
            "whitelist rows exceed the plans — prune the stale entries "
            f"so the gate stays exact: {stale}"
        )
        # the traversal itself must not have run jobs
        assert list(sc.statusTracker().getJobIdsForGroup(group)) == []


class TestRound15Shapes:
    def test_html_extract_is_scan_local(self, plans):
        # Markup extraction is a pure projection chain: no shuffle, no
        # join — it must fuse into the documents scan.
        p = plans("text_html_extract")
        assert "Exchange" not in p
        assert "Join" not in p
