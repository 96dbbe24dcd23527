"""Physical-plan contracts — the scale properties the engine promises.

These tests read `executedPlan` strings (plan construction only — no
job runs) and pin the properties that make the plans survive a 100x
scale-up: filters reach the parquet scan, scans are column-pruned,
windowed aggregations shuffle exactly once, and no query plan contains
an unbounded cartesian product. They exist because regressions here are
silent: every result stays correct while the plan quietly stops
scaling (round 3 example: a timestamp normalization cast inserted
between scan and filter disabled predicate pushdown on every date
filter — caught only by timing drift).
"""

from __future__ import annotations

import re

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    import __spark_entry__ as E

    df = E.queries()[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_date_filter_pushes_to_parquet_scan(spark):
    """pricing_summary's l_shipdate range must reach the scan —
    PushedFilters, not a post-scan Filter over a cast column."""
    plan = _plan(spark, "pricing_summary")
    pushed = re.findall(r"PushedFilters: \[[^\]]*\]", plan)
    assert pushed, plan
    assert any("l_shipdate" in p and "LessThanOrEqual" in p for p in pushed), pushed


def test_scans_are_column_pruned(spark):
    """Window-count queries project 2 columns of the 6-column events
    table; the scan must read only those (ReadSchema pruning)."""
    plan = _plan(spark, "multi_resolution_counts")
    schemas = re.findall(r"ReadSchema: struct<([^>]*)", plan)
    assert schemas, plan
    cols = {c.split(":")[0] for c in schemas[0].split(",") if c}
    assert cols <= {"ts", "event_type"}, cols


def test_windowed_aggregation_shuffles_once(spark):
    """T5/sliding/session: partial agg -> ONE exchange -> final agg.
    A second exchange would double the shuffle volume at scale."""
    for name in (
        "multi_resolution_counts",
        "sliding_window_counts",
        "session_window_counts",
    ):
        plan = _plan(spark, name)
        assert plan.count("Exchange") == 1, (name, plan)


def test_cosine_count_joins_broadcast(spark):
    """J2: the per-item counts table must broadcast onto the pair
    stream — a shuffle join here would re-shuffle the pair table twice."""
    plan = _plan(spark, "itemcf_cosine")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


#: queries whose plan legitimately contains a nested-loop join:
#: brute-force cosine top-k is the documented exact baseline (every
#: query vector scores every corpus vector by design; the scale path is
#: emb_ivf_topk / emb_near_dups, which stay equi-join).
#: doc_rarity / doc_mixture_plan attach a 1-row aggregate scalar via
#: broadcast cross join — a nested-loop whose build side is a single
#: row by construction, i.e. a scalar attach, not an unbounded join.
NESTED_LOOP_OK = {
    "emb_cosine_topk",
    "doc_rarity",
    "doc_mixture_plan",
    # 1-row scalar broadcasts (corpus count / key count attach): the
    # nested loop's build side is a single aggregate row by
    # construction, same rationale as doc_rarity/doc_mixture_plan
    "doc_curriculum_order",
    "event_key_skew",
    # important_part_value: the fraction-of-total threshold is a
    # 1-row total aggregate attached by broadcast (Q11 shape)
    "important_part_value",
    # idle_customer_balance: the avg-positive-balance threshold is a
    # 1-row aggregate attached by broadcast before the anti join
    "idle_customer_balance",
    # top_supplier_revenue: the Q15 max-revenue scalar is a 1-row
    # aggregate attached by broadcast before the integer-exact compare
    "top_supplier_revenue",
    # event_gap_fill: the calendar side explodes from a 1-row min/max
    # aggregate (|buckets| = time-range/duration, volume-independent)
    # and broadcasts onto the distinct-key table — bounded by
    # construction, same rationale as the scalar attaches above
    "event_gap_fill",
}


def test_no_unbounded_cartesian_products(spark):
    """No query plan may contain CartesianProduct; nested-loop joins
    only where the operator is explicitly the brute-force baseline."""
    import __spark_entry__ as E

    offenders = {}
    for name in E.queries():
        plan = _plan(spark, name)
        if "CartesianProduct" in plan:
            offenders[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in plan and name not in NESTED_LOOP_OK:
            offenders[name] = "BroadcastNestedLoopJoin"
    assert not offenders, offenders


def test_itemcf_pair_build_is_joinless_generate(spark):
    """The array-history pair build must stay a groupBy -> stacked
    posexplode -> single aggregation exchange: no join operator of any
    kind in the plan (the old self-join form sorted the pair stream
    twice), and the only exchanges are the two aggregations (history
    groupBy(user), pair groupBy on the canonical pair) plus the
    persisted array read when the cache is warm. Round 8: a THIRD
    Generate appears ABOVE the aggregation — the post-agg explode that
    re-materializes both directed rows from the canonical (lo, hi)
    aggregate after the i<j slice halved the generated pair stream."""
    from flink_project_spark import fixtures as FX
    from flink_project_spark.operators import itemcf as CF

    va = FX.fixture_df(spark, SF_DIR, "valid_actions")
    arrays = CF.user_item_history_arrays(va, max_history=500)
    plan = (
        CF.decay_pairs_from_arrays(arrays)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan, plan
    assert plan.count("Generate") == 3, plan
    # the i<j halving: the pair generate slices the tail, and the
    # direction explode sits above the final aggregate
    assert "slice(items" in plan, plan
    # pair generation contributes exactly two aggregation exchanges on
    # top of whatever the (here unpersisted) history subtree needs
    hist_plan = (
        arrays._jdf.queryExecution().executedPlan().toString()
    )
    extra = plan.count("Exchange") - hist_plan.count("Exchange")
    assert extra == 1, (extra, plan)


def test_decontaminate_joins_are_broadcast(spark):
    """Both benchmark fingerprint joins must broadcast (the corpus side
    streams); a shuffle join here would repartition the full corpus
    twice at 100 TB."""
    plan = _plan(spark, "doc_decontaminate")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_train_split_is_zero_shuffle_projection(spark):
    """The train_split OPERATOR promises a pure projection (hash-bucket
    tagging must not repartition the corpus at 100 TB); the driver query
    adds a per-split summary aggregate on top, which legitimately
    shuffles its tiny (split, counts) rows."""
    from flink_project_spark.llm import curation as CU

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = (
        CU.train_split(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan


def test_media_metadata_stats_prune_binary_payload(spark):
    """media_payload_stats aggregates metadata only — the opaque binary
    column must not be read from the scan (at 100 TB the payload is
    ~all the bytes)."""
    plan = _plan(spark, "media_payload_stats")
    scan = re.search(r"ReadSchema: ([^\n]*)", plan)
    assert scan is not None, plan
    assert "payload" not in scan.group(1), scan.group(1)


def test_partitioned_write_prunes_partitions_on_read(spark, tmp_path):
    """Layout contract for partitioned datasets: a filter on the
    partition column must become a PartitionFilter on the scan (reading
    only the matching directories), not a post-scan row filter. This is
    the on-disk complement of the PushedFilters row-group contract —
    at 100 TB the date partition is what turns a full-corpus scan into
    a single-day scan."""
    from flink_project_spark.sinks.writers import write_parquet
    from pyspark.sql import functions as F

    events = spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "event_date", F.to_date("ts")
    )
    out = str(tmp_path / "events_by_date")
    write_parquet(events, out, partition_by=["event_date"])

    back = spark.read.parquet(out)
    one_day = events.select(F.min(F.to_date("ts"))).first()[0]
    q = back.filter(F.col("event_date") == F.lit(one_day)).select("event_id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_date" in m.group(1), plan
    # pruning is real: the scan's selected partition count is 1 of many
    n_dirs = len(
        [p for p in (tmp_path / "events_by_date").iterdir() if p.name.startswith("event_date=")]
    )
    assert n_dirs > 1
    assert q.count() == events.filter(F.to_date("ts") == F.lit(one_day)).count()


def test_q5_chain_broadcasts_dims_and_pushes_date(spark):
    """regional_supplier_volume: all four dimension joins broadcast
    (region/nation/supplier/customer) and the order-year range reaches
    the orders scan as PushedFilters — the only data-scaled join left
    is orders |><| lineitem."""
    plan = _plan(spark, "regional_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 4, plan
    pushed = re.findall(r"PushedFilters: \[[^\]]*\]", plan)
    assert any("o_orderdate" in p and "GreaterThanOrEqual" in p for p in pushed), pushed
    assert "CartesianProduct" not in plan


def test_q17_semi_prune_before_aggregate(spark):
    """small_quantity_revenue: the brand part filter must prune the
    lineitem scan via a broadcast LEFT SEMI join BEFORE the per-part
    aggregate (aggregate over ~1% of lineitem, not all of it), and the
    join-back of per-part stats must broadcast."""
    plan = _plan(spark, "small_quantity_revenue")
    assert "LeftSemi" in plan, plan
    semi_pos = plan.index("LeftSemi")
    agg_pos = plan.index("HashAggregate")
    # plan strings print top-down (final op first): the semi join must
    # appear BELOW (after) the aggregates that consume it
    assert semi_pos > agg_pos, "semi prune not upstream of the aggregate"
    assert plan.count("BroadcastHashJoin") >= 1


def test_q4_exists_is_semi_join_with_residual(spark):
    """order_priority_check: the correlated EXISTS must plan as ONE
    LEFT SEMI join (no row multiplication) carrying the correlated
    l_shipdate > o_orderdate compare as its residual condition, with
    the quarter range pushed to the orders scan."""
    plan = _plan(spark, "order_priority_check")
    assert "LeftSemi" in plan, plan
    pushed = re.findall(r"PushedFilters: \[[^\n]*", plan)
    assert any("o_orderdate" in p for p in pushed), pushed
    assert "CartesianProduct" not in plan


def test_q6_scan_prunes_columns_and_pushes_filters(spark):
    """forecast_revenue_change: the scan must read ONLY the four
    referenced lineitem columns (ReadSchema pruning) and carry the
    date/discount/quantity predicates as PushedFilters — the whole
    query is scan + one aggregate, zero joins."""
    plan = _plan(spark, "forecast_revenue_change")
    assert "Join" not in plan, plan
    m = re.search(r"ReadSchema: struct<([^>]*)", plan)
    assert m is not None, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert cols <= {
        "l_shipdate", "l_discount", "l_quantity", "l_extendedprice"
    }, cols
    pushed = re.findall(r"PushedFilters: \[[^\n]*", plan)
    assert any("l_discount" in p and "l_quantity" in p for p in pushed), pushed


def test_q10_aggregates_before_customer_join(spark):
    """returned_item_revenue: the per-custkey revenue aggregate must
    run BELOW the customer join (aggregate-then-join — the dimension
    never rides the fact shuffle) and the top-20 must be a
    TakeOrderedAndProject, never a global Sort."""
    plan = _plan(spark, "returned_item_revenue")
    assert "TakeOrderedAndProject" in plan, plan
    cust_join = plan.index("c_custkey#")
    first_agg = plan.index("HashAggregate")
    # top-down plan string: the customer join appears above at least
    # one aggregate only if aggregation happens upstream of it — the
    # FINAL agg must sit below the TakeOrdered but above the join-back
    assert "SortMergeJoin" in plan or "BroadcastHashJoin" in plan
    assert first_agg < cust_join or plan.count("HashAggregate") >= 2, plan


def test_q21_no_lineitem_self_join(spark):
    """waiting_suppliers: the decorrelated plan reads lineitem ONCE —
    both EXISTS tests come from one (order, supplier) aggregate plus a
    per-order window, never a lineitem×lineitem self-join."""
    plan = _plan(spark, "waiting_suppliers")
    assert plan.count("lineitem.parquet") <= 1, plan
    assert "Window" in plan, plan


def test_q22_anti_join_on_filtered_orders(spark):
    """idle_customer_balance: the orders side of the anti join must be
    date-filtered at the scan (PushedFilters on o_orderdate), and the
    threshold attach must be a 1-row broadcast, not a data-scaled
    nested loop."""
    plan = _plan(spark, "idle_customer_balance")
    assert "LeftAnti" in plan, plan
    # NB: long PushedFilters lists are truncated in the plan string
    # (no closing bracket) — match to end-of-line, not to `]`
    pushed = re.findall(r"PushedFilters: \[[^\n]*", plan)
    assert any(
        "GreaterThanOrEqual(o_orderdate" in p for p in pushed
    ), pushed


def test_q2_argmin_broadcasts_min_table_single_lineitem_scan(spark):
    """min_cost_supplier: the correlated MIN decorrelates into an
    argmin join-back where the per-part MIN table attaches as a
    BROADCAST (dimension-sized), the part/supplier lookups broadcast,
    and lineitem is scanned at most twice (offer build; no third scan
    from a re-derived subquery), with no cartesian product."""
    plan = _plan(spark, "min_cost_supplier")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
    assert plan.count("lineitem.parquet") <= 2, plan


def test_q9_one_data_scaled_join(spark):
    """product_profit: part LIKE filter and supplier→nation must ride
    broadcasts; the ONLY shuffle join is lineitem |><| orders (at most
    one SortMergeJoin/ShuffledHashJoin in the plan)."""
    plan = _plan(spark, "product_profit")
    shuffled = plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin")
    assert shuffled <= 1, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan


def test_q11_threshold_is_one_row_broadcast(spark):
    """important_part_value: the fraction-of-total threshold must
    attach as a 1-row broadcast nested loop (the only acceptable
    'cartesian' — one row × per-part table), and lineitem is scanned
    at most twice (per-part build + total re-derivation)."""
    plan = _plan(spark, "important_part_value")
    assert (
        "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    ), plan
    assert plan.count("lineitem.parquet") <= 2, plan


def test_q20_stats_join_back_is_broadcast(spark):
    """excess_supply_suppliers: the per-part stats table joins back by
    broadcast (dimension-sized), the survivor set is distinct-reduced
    BEFORE the supplier-name join, and no lineitem self-join exists
    (single lineitem scan feeds both the offers and stats sides via
    reuse or at most two scans)."""
    plan = _plan(spark, "excess_supply_suppliers")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
    assert plan.count("lineitem.parquet") <= 2, plan


def test_auc_runs_exchange_free_off_partitioned_counts(spark):
    """q_auc's entire compute — cneg window + rank-sum aggregate — must
    run WITHOUT any exchange above the cached per-score counts table:
    auc_perscore persists repartitioned on the window keys
    (scene_id, channel), so EnsureRequirements plans no shuffle. A
    regression here (e.g. dropping the repartition from the builder)
    silently triples the query's stage count. The counts caches must
    be MATERIALIZED first: until then the AQE-cached subtree reports
    unknown partitioning and EnsureRequirements conservatively plans an
    exchange that the real (post-build) plan does not have."""
    import __spark_entry__ as E

    E._auc_counts(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    E._auc_perscore(spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()
    plan = _plan(spark, "auc")
    head = plan.split("InMemoryTableScan", 1)[0]
    assert "Window" in plan, plan
    assert "Exchange" not in head, head


def test_uauc_single_small_exchange_off_partitioned_counts(spark):
    """q_uauc off the (scene_id, user_id)-partitioned counts cache:
    per-user AUC and per-user weight fuse into ONE window + aggregation
    pass (round 8 — the separate weights groupBy and the AUC-vs-weights
    join are gone, so the plan has NO join at all); the ONLY data-moving
    exchange above the cache is the final per-scene mean (one row per
    (scene, user) in flight). Cache materialized first — see the auc
    test."""
    import __spark_entry__ as E

    E._auc_counts(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    plan = _plan(spark, "uauc")
    head = plan.split("InMemoryTableScan", 1)[0]
    non_broadcast = head.count("Exchange") - head.count("BroadcastExchange")
    assert non_broadcast == 1, head
    assert "Join" not in head, head
    assert "BroadcastExchange" not in head, head


def test_simhash_near_dups_has_no_pair_level_shuffle(spark):
    """The combination-banded near-dup join emits each qualifying pair
    exactly once (first-agreeing-band rule) — there is NO distinct()
    over pair rows, so nothing keyed by (doc_a, doc_b) may appear in
    an aggregate or a hash-partitioned exchange. On dup-dense corpora
    the pair set is quadratic; a pair-level shuffle would re-introduce
    the exact bottleneck the rewrite removed."""
    plan = _plan(spark, "doc_simhash_neardups")
    head = plan.split("InMemoryTableScan", 1)[0]
    assert "hashpartitioning(doc_a" not in head, head
    assert "keys=[doc_a" not in head, head


def test_rarity_vocab_is_single_pass_rollup(spark):
    """rarity's vocabulary counts and corpus total come from ONE
    grouping-sets pass (Expand + one aggregation exchange over the tf
    subtree) — not a groupBy plus a separate whole-table sum."""
    from flink_project_spark.llm import text as TX
    from flink_project_spark.llm.contract import _docs

    tf = TX.doc_word_tf(_docs(spark, SF_DIR))
    tf_plan = tf._jdf.queryExecution().executedPlan().toString()
    plan = (
        TX.rarity_vocab(tf)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" in plan, plan
    extra = plan.count("Exchange") - tf_plan.count("Exchange")
    assert extra == 1, (extra, plan)


def test_waiting_suppliers_single_data_scaled_exchange_chain(spark):
    """Round 6: one hash(l_orderkey) exchange serves both the (order,
    supplier) late-flag aggregate and the per-order window — the pair
    aggregate must NOT introduce its own (orderkey, suppkey) exchange.
    Total shuffle exchanges = 2 (the orderkey repartition + the final
    per-supplier aggregate); everything else rides broadcasts."""
    import re

    plan = _plan(spark, "waiting_suppliers")
    # strip expression ids (#123L) so the key-shape assertions compare
    # names, not ids — without this the pair-key guard can never fire
    bare = re.sub(r"#\d+L?", "", plan)
    assert "hashpartitioning(l_orderkey," in bare, bare
    assert "hashpartitioning(l_orderkey, l_suppkey" not in bare, bare
    shuffles = len(re.findall(r"Exchange hashpartitioning", plan))
    assert shuffles == 2, (shuffles, plan)


def test_decay_gated_aggregates_straight_onto_canonical_key(spark):
    """Round 6: the gated pair stream aggregates once, directly on the
    canonical (least, greatest) item key — no intermediate
    (user, item_a, item_b) hash aggregate (the removed per-user
    pre-pass cost a full extra hash pass over every emission and could
    not shrink the canonical shuffle below map-side combine)."""
    plan = _plan(spark, "itemcf_decay_gated")
    head = plan.split("InMemoryTableScan", 1)[0]
    assert "keys=[lo" in head, head
    # no aggregate keyed by the (user, a, b) triple anywhere above the
    # cached array table
    import re

    triple = re.search(r"HashAggregate\(keys=\[user_id[^\]]*item_a", head)
    assert triple is None, head
