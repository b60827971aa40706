"""Plan-shape regression tests (SURVEY §2.3 scale notes).

Value correctness is the oracle suite's job; these tests pin the *physical
plan* properties that decide whether the same query survives a 1000×
scale-up: pushdown, pruning, broadcast choice, shuffle counts.
"""

from __future__ import annotations

from streamsurfer_spark.plans.inspect import (
    broadcast_join_count,
    exchange_count,
    pushed_filters,
    scan_schemas,
)
from streamsurfer_spark.queries import registry
from tests.conftest import SF_DIR

REG = registry()


def test_filter_agg_pushdown_and_pruning(spark):
    """Q-R2: predicates reach the scan; only the 4 needed columns are read."""
    df = REG["qr02_filter_agg"].spark(spark, SF_DIR)
    filters = " ".join(pushed_filters(df))
    assert "l_shipdate" in filters and "l_discount" in filters and "l_quantity" in filters
    (schema,) = scan_schemas(df)
    assert sorted(schema) == [
        "l_discount",
        "l_extendedprice",
        "l_quantity",
        "l_shipdate",
    ]


def test_star_join_broadcasts_dimensions(spark):
    """Q-R4: every dim joins as broadcast; the fact side never shuffles for
    a dimension. (At fixture scale AQE may broadcast more than the dims —
    that's adaptive and fine; zero broadcasts would be the regression.)"""
    df = REG["qr04_multiway_join"].spark(spark, SF_DIR)
    assert broadcast_join_count(df) >= 4
    # shuffles: only the final aggregation + output ordering
    assert exchange_count(df) <= 2


def test_scan_prunes_unused_columns(spark):
    """Q-R3: orders scan must not read o_orderdate/o_orderpriority etc."""
    df = REG["qr03_join_orders_customer"].spark(spark, SF_DIR)
    for schema in scan_schemas(df):
        assert "o_orderpriority" not in schema
        assert "o_orderdate" not in schema


def test_lsh_pipeline_shuffle_budget(spark):
    """Q-L2: signature math is per-row; the whole MinHash-LSH pipeline needs
    only the band self-join + pair aggregation shuffles (≤4 with the final
    sort), independent of document count."""
    df = REG["ql02_minhash_lsh_pairs"].spark(spark, SF_DIR)
    assert exchange_count(df) <= 4


def test_topk_uses_window_group_limit(spark):
    """Q-L3 top-k: Spark's WindowGroupLimit must prune per-partition before
    the shuffle — without it every (probe, corpus) pair crosses the wire."""
    from streamsurfer_spark.plans.inspect import formatted_plan

    df = REG["ql03_cosine_topk"].spark(spark, SF_DIR)
    assert "WindowGroupLimit" in formatted_plan(df)


def test_topk_two_stage_no_single_key_sort(spark):
    """Q-L3 scale shape: the top-k is two windows — stage 1 keyed on
    (probe_id, salt) so no task ever sorts a probe's whole candidate list,
    stage 2 over the ≤ k·n_salts survivors. Both must appear, each with
    its WindowGroupLimit prune; budget = 2 window exchanges + output sort."""
    from streamsurfer_spark.plans.inspect import formatted_plan

    df = REG["ql03_cosine_topk"].spark(spark, SF_DIR)
    plan = formatted_plan(df)
    # tree + details sections each list the nodes once → counts are doubled
    assert plan.count("WindowGroupLimit") >= 4  # 2 windows × partial/final
    assert exchange_count(df) <= 3


def test_ivf_assign_no_nxk_shuffle(spark):
    """ql14: the centroid argmin must be a partial aggregate (the n×k
    candidate expansion collapses map-side to n rows before the wire), the
    probe-routing a bounded groupBy — no window over the raw expansion and
    no sort-merge join anywhere (the routed probe side broadcasts)."""
    from streamsurfer_spark.plans.inspect import formatted_plan

    df = REG["ql14_ivf_topk"].spark(spark, SF_DIR)
    plan = formatted_plan(df)
    assert "SortMergeJoin" not in plan
    # shuffles: routing agg + assign agg + 2 top-k windows + output sort
    assert exchange_count(df) <= 5
    assert broadcast_join_count(df) >= 3


def test_dedup_single_shuffle(spark):
    """Q-L1 exact dedup: one shuffle for the hash groupBy, one for the
    output ordering — anything more is a regression."""
    df = REG["ql01_exact_dedup"].spark(spark, SF_DIR)
    assert exchange_count(df) <= 2


def test_sessionize_rollup_shares_partitioning(spark):
    """qt03: the two session windows share one (user) exchange + sort, and
    the (user, session) rollup reuses that partitioning — budget: window
    exchange + final output ordering only."""
    df = REG["qt03_sessionize"].spark(spark, SF_DIR)
    assert exchange_count(df) <= 2


def test_range_frame_prunes_and_filters_before_window(spark):
    """qr29: the customer sample filter runs BEFORE the window (only sampled
    partitions sort), and the scan reads only the 4 needed columns."""
    df = REG["qr29_range_frame"].spark(spark, SF_DIR)
    (schema,) = scan_schemas(df)
    assert sorted(schema) == ["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan and "Filter" in plan


def test_tfidf_broadcasts_vocabulary(spark):
    """ql22: the idf (vocab) and corpus-size sides join as broadcasts; the
    big (doc, token) tf side never shuffles for them."""
    df = REG["ql22_tfidf_top_terms"].spark(spark, SF_DIR)
    assert broadcast_join_count(df) >= 2


def test_cosine_near_dup_blocked_join(spark):
    """ql21: the pair stage is an equi-join on the block key (plus the
    rounded-sim filter) — no cartesian product anywhere in the plan."""
    from streamsurfer_spark.plans.inspect import formatted_plan

    df = REG["ql21_cosine_near_dup"].spark(spark, SF_DIR)
    assert "Cartesian" not in formatted_plan(df)


def test_ohlc_single_aggregate_no_window(spark):
    """qt05: the whole OHLC bar is one hash aggregate (struct-keyed
    min_by/max_by) — no Window operator, and at most the agg exchange plus
    the output sort."""
    from streamsurfer_spark.plans.inspect import formatted_plan

    df = REG["qt05_ohlc_bars"].spark(spark, SF_DIR)
    plan = formatted_plan(df)
    assert "Window" not in plan
    assert exchange_count(df) <= 2


def test_q3_shape_broadcasts_filtered_dim(spark):
    """qr38: the segment-filtered customer dim joins as a broadcast, and the
    date predicates reach the orders/lineitem scans."""
    df = REG["qr38_shipping_priority"].spark(spark, SF_DIR)
    assert broadcast_join_count(df) >= 1
    filters = " ".join(pushed_filters(df))
    assert "o_orderdate" in filters and "l_shipdate" in filters


def test_scd2_windows_share_one_exchange(spark):
    """qr40: both window passes partition by o_custkey — Catalyst must plan
    ONE shuffle for the dimension key (plus the final output sort)."""
    df = REG["qr40_scd2_intervals"].spark(spark, SF_DIR)
    assert exchange_count(df) <= 2


def test_bigram_counts_broadcast_vocab_joins(spark):
    """ql27: unigram/total-count joins are broadcasts; no sort-merge join of
    the corpus against the vocabulary."""
    df = REG["ql27_bigram_collocations"].spark(spark, SF_DIR)
    assert broadcast_join_count(df) >= 3


def test_q19_shape_pushes_per_side_disjunctions(spark):
    """qr46: the cross-side OR-of-ANDs must still yield pushed per-side
    disjunctions — l_quantity ranges into the lineitem scan, brand/size
    arms into the part scan — and part joins as a broadcast."""
    df = REG["qr46_disjunctive_join"].spark(spark, SF_DIR)
    filters = " ".join(pushed_filters(df))
    assert "l_quantity" in filters and "p_brand" in filters and "p_size" in filters
    assert broadcast_join_count(df) >= 1


def test_q7_shape_single_big_join(spark):
    """qr48: in the 6-table join only lineitem⋈orders may shuffle; every
    dim leg broadcasts (≥3 broadcast joins), keeping exchanges ≤3 (big
    join + agg + output sort)."""
    df = REG["qr48_nation_volume"].spark(spark, SF_DIR)
    assert broadcast_join_count(df) >= 3
    assert exchange_count(df) <= 4


def test_expectations_one_scan_per_check_type(spark):
    """qr50: N row-level constraints compile to ONE aggregate (explode, not
    a union re-planning the scan per leg) — the whole report costs 4 scans
    (row checks, uniqueness, FK probe + FK dim) regardless of how many
    constraints are declared."""
    from streamsurfer_spark.plans.inspect import scan_schemas

    df = REG["qr50_expectations_orders"].spark(spark, SF_DIR)
    assert len(scan_schemas(df)) <= 4
    assert exchange_count(df) <= 4


def test_join_strategy_hints_are_honored(spark):
    """Join-strategy control: hints must switch the physical join — the
    manual override lane when AQE's choice is wrong for a known workload."""
    from streamsurfer_spark.plans.inspect import formatted_plan

    orders = REG["qr03_join_orders_customer"]  # noqa: F841 — registry warm
    from streamsurfer_spark.session import table
    from tests.conftest import SF_DIR

    li = table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    o = table(spark, SF_DIR, "orders").select("o_orderkey")

    merged = li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey)
    assert "SortMergeJoin" in formatted_plan(merged)

    hashed = li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
    assert "ShuffledHashJoin" in formatted_plan(hashed)

    bcast = li.join(o.hint("broadcast"), li.l_orderkey == o.o_orderkey)
    assert "BroadcastHashJoin" in formatted_plan(bcast)


def test_q2_shape_argmin_no_smj(spark):
    """qr59: supplier/nation/region and the size-filtered part side all
    broadcast — the only exchanges are the (part,supplier) partial agg,
    the per-part argmin window, and the output sort. No sort-merge join:
    the fact table never co-shuffles with a dimension."""
    from streamsurfer_spark.plans.inspect import has_sort_merge_join

    df = REG["qr59_min_cost_supplier"].spark(spark, SF_DIR)
    assert not has_sort_merge_join(df)
    assert broadcast_join_count(df) >= 2
    assert exchange_count(df) <= 4


def test_q10_shape_takeordered_topk(spark):
    """qr63: the top-20 runs as TakeOrderedAndProject over the aggregated
    frame (per-partition heaps), never a global sort; one shuffle total."""
    from streamsurfer_spark.plans.inspect import formatted_plan

    df = REG["qr63_returned_items"].spark(spark, SF_DIR)
    assert "TakeOrderedAndProject" in formatted_plan(df)
    assert exchange_count(df) <= 2
    assert broadcast_join_count(df) >= 2


def test_q8_shape_all_dims_broadcast(spark):
    """qr61: five dimension sides broadcast; the fact shuffles only for
    the per-year aggregate (+ output sort)."""
    df = REG["qr61_market_share"].spark(spark, SF_DIR)
    assert broadcast_join_count(df) >= 5
    assert exchange_count(df) <= 2


def test_q21_shape_semi_anti_topk(spark):
    """qr69: the EXISTS/NOT EXISTS run as semi/anti joins (never a
    multi-match blowup), the supplier dim broadcasts, and the top-10 is
    TakeOrderedAndProject."""
    from streamsurfer_spark.plans.inspect import formatted_plan

    df = REG["qr69_waiting_suppliers"].spark(spark, SF_DIR)
    p = formatted_plan(df)
    assert "TakeOrderedAndProject" in p
    assert "LeftSemi" in p and "LeftAnti" in p
    assert broadcast_join_count(df) >= 1


def test_mixture_sample_map_only_corpus_path(spark):
    """ql35: the corpus side joins the per-stratum counts by BROADCAST (no
    corpus shuffle before selection) and the scans read only the columns
    the query needs; the only exchanges are the tiny count aggregate and
    the deterministic output sort."""
    df = REG["ql35_domain_mixture"].spark(spark, SF_DIR)
    assert broadcast_join_count(df) >= 1
    assert exchange_count(df) <= 2
    for schema in scan_schemas(df):
        assert "text" not in schema  # mixture never reads document bodies


def test_rolling_anomaly_single_window_exchange(spark):
    """qt08: count/sum/sumsq share one (user_id, ts, event_id) sort — ONE
    window exchange plus the output sort, nothing else."""
    df = REG["qt08_rolling_anomaly"].spark(spark, SF_DIR)
    assert exchange_count(df) <= 2


def test_twa_rollup_reuses_lead_partitioning(spark):
    """qt09: lead() shuffles on user_id; the (user_id, day) rollup is
    prefix-compatible so partial aggregation collapses before any second
    exchange — budget: window + agg/sort."""
    df = REG["qt09_time_weighted_avg"].spark(spark, SF_DIR)
    assert exchange_count(df) <= 3


def test_kmeans_assign_broadcasts_constant_k(spark):
    """ql38: every Lloyd assignment joins the k-row centroid table as a
    broadcast — no sort-merge join anywhere in the iterative plan."""
    from streamsurfer_spark.plans.inspect import formatted_plan

    df = REG["ql38_kmeans_clusters"].spark(spark, SF_DIR)
    plan = formatted_plan(df)
    assert "SortMergeJoin" not in plan
    assert broadcast_join_count(df) >= 3


def test_surprisal_scans_only_needed_columns(spark):
    """ql36: the documents scan reads only doc_id + text (no lang/source/
    n_chars) — column pruning through the explode."""
    df = REG["ql36_unigram_surprisal"].spark(spark, SF_DIR)
    for schema in scan_schemas(df):
        assert "lang" not in schema and "source" not in schema


def test_aqe_skew_join_splits_planted_hot_key(spark):
    """The 100×-scale skew story has two pinned mitigations: qr37 proves
    manual salting ≡ plain join (the deterministic fix), and this test
    proves the RUNTIME fix — AQE's skew-join split — actually fires on a
    planted hot key (r5 verdict item 5). One key carries ~100k rows while
    the tail is uniform; with broadcast disabled the sort-merge join's hot
    partition exceeds the (test-lowered) skew threshold and AQE must
    re-plan it as a skew join (`isSkewJoin=true` in the executed plan),
    splitting the oversized partition across tasks instead of stalling
    one reducer — exactly what a hot join key does at 100 TB."""
    import pyspark.sql.functions as F

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.adaptive.enabled", "true")
        conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        # lower the trigger so fixture-scale bytes count as "skewed"
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "262144"
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "262144")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        # no broadcast escape hatch: force the sort-merge path AQE must fix
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

        # payload must be INCOMPRESSIBLE and CONSUMED: shuffle blocks are
        # compressed (a constant pad — or 100k copies of the same hot key
        # with every other column pruned — deflates below the skew byte
        # threshold), and column pruning strips anything the aggregate
        # doesn't read, so the agg must touch both payloads
        pad = F.concat(
            F.md5(F.col("id").cast("string")),
            F.md5(F.concat(F.col("id").cast("string"), F.lit("#2"))),
            F.md5(F.concat(F.col("id").cast("string"), F.lit("#3"))),
        )
        left = spark.range(120_000).select(
            F.when(F.col("id") < 100_000, F.lit(0))
            .otherwise(F.col("id") % 20_000 + 1)
            .alias("k"),
            pad.alias("payload"),
        )
        right = spark.range(30_000).select(
            F.col("id").alias("k"), pad.alias("dim")
        )
        joined = left.join(right, "k").agg(
            F.count("*").alias("n"),
            F.max(F.length("payload")).alias("lp"),
            F.max(F.length("dim")).alias("ld"),
        )
        row = joined.collect()[0]
        assert row["n"] == 120_000  # hot key 0 ×100k + uniform tail, all matched

        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        # Spark 4 renders the split as `SortMergeJoin(skew=true)` with a
        # `skewed` AQEShuffleRead on the hot side
        assert "skew=true" in final_plan, final_plan[:2000]
        assert "skewed" in final_plan, final_plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_runtime_bloom_filter_prunes_fact_side(spark):
    """Catalyst's runtime Bloom-filter join pruning: a selective filter on
    the dimension side injects a bloom_filter_agg over the dim keys and a
    might_contain probe on the FACT side's scan path, so fact rows that
    cannot match are dropped before the join shuffle — at 100 TB this is
    the difference between shuffling the whole fact table and shuffling
    the ~selectivity fraction of it. Broadcast is disabled so the join is
    a shuffle join (broadcast joins get the cheaper DPP/broadcast reuse
    instead); the application-side scan threshold is zeroed because the
    fixture fact table is far below the 10 GiB production default."""
    import pyspark.sql.functions as F

    from streamsurfer_spark.session import table

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
        )
    }
    try:
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

        li = table(spark, SF_DIR, "lineitem")
        orders = table(spark, SF_DIR, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .groupBy()
            .agg(F.sum("l_quantity").alias("q"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:2000]
        assert "might_contain" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_gopher_rules_map_only(spark):
    """ql55: the rule gate is pure per-row codegen — the ONLY exchange is
    the deterministic output sort, and the scan reads just (doc_id, text),
    never the metadata columns. This is the shape that makes the filter
    free at 100 TB: it rides the scan, no shuffle, no Python."""
    df = REG["ql55_gopher_rules"].spark(spark, SF_DIR)
    assert exchange_count(df) <= 1
    for schema in scan_schemas(df):
        assert "lang" not in schema and "source" not in schema


def test_char_entropy_bounded_exchanges_and_pruning(spark):
    """ql58: the per-char explode must NEVER cross the wire raw — a
    partial (doc, char) HashAggregate sits between Generate and the
    first Exchange (map-side combine to ≤ |alphabet| rows per doc), the
    scan reads only (doc_id, text), and the whole query is two hash
    exchanges plus the output sort."""
    from streamsurfer_spark.plans.inspect import formatted_plan

    df = REG["ql58_char_entropy"].spark(spark, SF_DIR)
    assert exchange_count(df) <= 3
    (schema,) = scan_schemas(df)
    assert sorted(schema) == ["doc_id", "text"]
    plan = formatted_plan(df)
    import re

    # numbered sections run leaf-to-root: the partial (doc, char) count
    # must sit in an EARLIER section than the first shuffle Exchange
    first_ex = int(re.search(r"\((\d+)\) Exchange\b", plan).group(1))
    partial = min(
        int(m.group(1))
        for m in re.finditer(r"\((\d+)\) HashAggregate", plan)
        if "partial_count" in plan.split(f"({m.group(1)}) HashAggregate")[1][:400]
    )
    assert partial < first_ex


def test_recursive_rollup_is_engine_native(spark):
    """qr73: the transitive closure runs as Spark 4's native recursion
    (UnionLoop / CTERelation in the plan), not a collected driver loop,
    and the rollup on the fixture satisfies the subtree invariants:
    node 0 holds every customer; child subtree counts never exceed the
    parent's."""
    df = REG["qr73_hierarchy_rollup"].spark(spark, SF_DIR)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "UnionLoop" in plan or "CTERelationDef" in plan
    rows = {r.node: r for r in df.collect()}
    from streamsurfer_spark.session import table

    n_cust = table(spark, SF_DIR, "customer").count()
    assert rows[0].n_desc == n_cust
    for node, r in rows.items():
        parent = node // 10
        if node > 0 and parent in rows:
            assert r.n_desc <= rows[parent].n_desc


def test_silhouette_corpus_never_shuffles_before_final_mean(spark):
    """ql62: the centroid frame collapses to a ONE-row broadcast and the
    corpus evaluates every distance per-row via lambdas — the only joins
    are broadcast (a sort-merge join here would mean the corpus is being
    shuffled against its own centroids), scans prune to (vec_id,
    embedding), and the whole plan fits a fixed exchange budget
    (centroid passes + final |labels|-group mean + sort) independent of
    corpus size."""
    from streamsurfer_spark.plans.inspect import formatted_plan

    df = REG["ql62_label_silhouette"].spark(spark, SF_DIR)
    assert "SortMergeJoin" not in formatted_plan(df)
    assert broadcast_join_count(df) >= 1
    assert exchange_count(df) <= 5
    for schema in scan_schemas(df):
        assert set(schema) <= {"vec_id", "embedding", "label"}


def test_rolling_actives_bounded_expand_and_pruning(spark):
    """qt20: the 1/7/28-day distinct-actives fan-out stays map-side (the
    Expand feeds a partial aggregate before any wire crossing) and the
    events scan reads only (ts, user_id) — the 28x row multiplication
    must never be the thing that shuffles raw."""
    df = REG["qt20_rolling_actives"].spark(spark, SF_DIR)
    assert exchange_count(df) <= 5
    for schema in scan_schemas(df):
        assert set(schema) <= {"ts", "user_id"}


def test_rolling_median_single_sort_exchange(spark):
    """qt21: the composed percentile frame is one hash exchange for the
    daily rollup + one RangePartitioning for the window sort + output —
    a second hash exchange would mean the window is re-partitioning what
    the rollup already keyed."""
    df = REG["qt21_rolling_median"].spark(spark, SF_DIR)
    assert exchange_count(df) <= 3
    (schema,) = scan_schemas(df)
    assert sorted(schema) == ["event_type", "ts", "value"]


def test_source_overlap_scans_prune_to_join_columns(spark):
    """ql65: the source-pair containment matrix reads documents several
    times (shingle leg + source leg per side) but every scan must prune
    to exactly its 2 needed columns, and the per-key fan-out join on the
    shingle hash stays a keyed join (no cartesian): at 100 TB the scan
    bytes, not the |sources|^2 output, dominate."""
    from streamsurfer_spark.plans.inspect import formatted_plan

    df = REG["ql65_source_overlap_matrix"].spark(spark, SF_DIR)
    assert "CartesianProduct" not in formatted_plan(df)
    for schema in scan_schemas(df):
        assert set(schema) <= {"doc_id", "text", "source"}
        assert len(schema) <= 2
