"""Round-4 second-wave tests: DSIR importance weights, perplexity tertiles,
BPE merge statistics, SemDeDup composition."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from tests.conftest import SF_DIR


# --- DSIR (ql46) -------------------------------------------------------------


def test_dsir_short_docs_excluded_and_partition_invariant(spark):
    """Documents with <2 tokens have no bigram features and drop out (no
    error, no NULL row); scores are exact BIGINT sums so any repartitioning
    yields bit-identical results."""
    from streamsurfer_spark.operators import text as text_ops

    rows = [
        (1, "the quick brown fox", "en"),
        (2, "solo", "en"),  # 1 token -> no bigrams
        (3, "el zorro marron rapido", "es"),
        (4, "the quick red fox jumps", "en"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = text_ops.dsir_importance(df).orderBy("doc_id")
    got = out.collect()
    assert [r.doc_id for r in got] == [1, 3, 4]
    assert [r.n_bigrams for r in got] == [3, 3, 4]  # tokens - 1

    re = text_ops.dsir_importance(df.repartition(7, "lang")).orderBy("doc_id")
    assert [tuple(r) for r in re.collect()] == [tuple(r) for r in got]


def test_dsir_target_docs_score_higher(spark):
    """Sanity on the sign of the log-ratio: documents written in the target
    domain's vocabulary must out-score documents with disjoint vocabulary
    (their buckets carry positive target mass; foreign buckets only the
    smoothing floor)."""
    from streamsurfer_spark.operators import text as text_ops

    en = [(i, "the cat sat on the mat and the dog ran", "en") for i in range(10)]
    zz = [(100 + i, "zork blim quux flarp nix blim zork quux", "xx") for i in range(10)]
    df = spark.createDataFrame(en + zz, "doc_id long, text string, lang string")
    scores = {
        r.doc_id: r.avg_logratio_nats
        for r in text_ops.dsir_importance(df, target_lang="en").collect()
    }
    assert min(scores[i] for i in range(10)) > max(scores[100 + i] for i in range(10))


def test_dsir_models_single_corpus_pass(spark):
    """Plan shape: the bucket models come from ONE aggregation over the
    (doc, bucket) side — exactly two corpus scans total (model pass + doc
    scoring pass), weight table joined as a broadcast, no sort-merge join."""
    from streamsurfer_spark.plans.inspect import (
        broadcast_join_count,
        formatted_plan,
        scan_schemas,
    )
    from streamsurfer_spark.queries import registry

    df = registry()["ql46_dsir_importance"].spark(spark, SF_DIR)
    assert len(scan_schemas(df)) == 2
    assert broadcast_join_count(df) >= 1
    assert "SortMergeJoin" not in formatted_plan(df)


# --- perplexity tertiles (ql47) ----------------------------------------------


def test_perplexity_bucket_sizes_are_exact_tertiles(spark):
    """Per language: |head| = floor(n/3), |head|+|middle| = floor(2n/3) —
    the deterministic integer-rank cut, independent of value ties."""
    from streamsurfer_spark.queries import registry

    out = registry()["ql47_perplexity_buckets"].spark(spark, SF_DIR).collect()
    by_lang: dict[str, dict[str, int]] = {}
    for r in out:
        by_lang.setdefault(r.lang, {})[r.bucket] = r.n_docs
    assert by_lang
    for _lang, b in by_lang.items():
        n = sum(b.values())
        assert b.get("head", 0) == n // 3
        assert b.get("head", 0) + b.get("middle", 0) == 2 * n // 3


# --- BPE merge statistics (ql48) ---------------------------------------------


def test_bpe_pair_counts_hand_checked(spark):
    """Tiny corpus with 1-char words (contribute nothing) and repeated
    words (weighted by frequency): counts verified by hand."""
    from streamsurfer_spark.operators import text as text_ops

    df = spark.createDataFrame(
        [(1, "ab ab b a abc")], "doc_id long, text string"
    )

    words = (
        df.select(F.explode(text_ops.tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
    )
    pairs = words.withColumn(
        "pair",
        F.explode(
            F.expr(
                "case when length(w) < 2 then cast(array() as array<string>)"
                " else transform(sequence(1, length(w) - 1),"
                " i -> substring(w, i, 2)) end"
            )
        ),
    )
    got = {
        r.pair: r.pair_count
        for r in pairs.groupBy("pair").agg(F.sum("wc").alias("pair_count")).collect()
    }
    # wc: ab=2, abc=1, a=1, b=1 -> pairs: "ab" from ab(w=2) + abc(w=1) = 3; "bc" from abc = 1
    assert got == {"ab": 3, "bc": 1}


def test_bpe_topk_is_heap_not_global_sort(spark):
    """The final top-20 must compile to TakeOrdered (per-partition heap),
    not a global Sort over the pair table."""
    from streamsurfer_spark.plans.inspect import formatted_plan
    from streamsurfer_spark.queries import registry

    plan = formatted_plan(registry()["ql48_bpe_pair_stats"].spark(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


# --- SemDeDup (qp06) ---------------------------------------------------------


def _unit(theta_deg: float, dim: int = 8) -> list[float]:
    t = math.radians(theta_deg)
    return [math.cos(t), math.sin(t)] + [0.0] * (dim - 2)


def test_semdedup_chain_keeps_one_per_component(spark):
    """A-B and B-C similar but A-C not: connected components must still
    collapse the chain to ONE survivor (the min id), not two — the reason
    SemDeDup needs CC rather than greedy pairwise drops."""
    from streamsurfer_spark.operators import graph, similarity

    rows = [
        (1, 0, _unit(0.0)),
        (2, 0, _unit(25.0)),
        (3, 0, _unit(50.0)),
        (10, 1, _unit(200.0)),
    ]
    df = spark.createDataFrame(rows, "vec_id long, cent_id int, embedding array<double>")
    tau = 0.866  # cos(30 deg): adjacent pairs ~0.906 pass, A-C ~0.643 fails
    pairs = similarity.cosine_near_dup_pairs(df, tau, block_col="cent_id")
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert got == {(1, 2), (2, 3)}
    comp = graph.connected_components(pairs, "id_a", "id_b").collect()
    labels = {r.id: r.cluster_id for r in comp}
    assert labels == {1: 1, 2: 1, 3: 1}


# --- plan shapes for the remaining second-wave queries -----------------------


def test_hard_negatives_broadcast_probes_no_smj(spark):
    """ql51: the probe side must broadcast (cross-label pair join is a
    BroadcastNestedLoopJoin over ≤ |probes| rows), never a sort-merge."""
    from streamsurfer_spark.plans.inspect import formatted_plan
    from streamsurfer_spark.queries import registry

    plan = formatted_plan(registry()["ql51_hard_negatives"].spark(spark, SF_DIR))
    assert "SortMergeJoin" not in plan
    assert "Broadcast" in plan


def test_seasonal_profile_broadcasts_profile(spark):
    """qt11: the types x 24 profile joins back as a broadcast — the event
    scan is never shuffled for the flag pass."""
    from streamsurfer_spark.plans.inspect import broadcast_join_count, formatted_plan
    from streamsurfer_spark.queries import registry

    df = registry()["qt11_seasonal_profile"].spark(spark, SF_DIR)
    assert broadcast_join_count(df) >= 1
    assert "SortMergeJoin" not in formatted_plan(df)


def test_snapshot_novelty_single_shingle_pass(spark):
    """ql50 (r13 rework): A-membership is a window MAX over the one
    distinct (shingle, is_a, bsrc) pass — there must be NO anti/equi join
    on the shingle (the old two-branch shape re-scanned documents and
    re-ran the per-token md5 chain once per branch), and only the
    documents scans for the shingle pass + the tiny n_docs rollup."""
    from streamsurfer_spark.plans.inspect import formatted_plan
    from streamsurfer_spark.queries import registry

    plan = formatted_plan(registry()["ql50_snapshot_novelty"].spark(spark, SF_DIR))
    assert "LeftAnti" not in plan
    assert "Window" in plan  # per-shingle membership MAX
    assert plan.count("Scan parquet ") <= 4  # tree+details sections list
    # each scan twice: 2 logical scans (shingle pass + n_docs rollup)


def test_approx_quantile_gate_broadcasts_probes(spark):
    """qr71: the rank audit joins ≤ 3·groups probe rows as a broadcast
    against the lineitem scan."""
    from streamsurfer_spark.plans.inspect import broadcast_join_count
    from streamsurfer_spark.queries import registry

    df = registry()["qr71_approx_quantile_gate"].spark(spark, SF_DIR)
    assert broadcast_join_count(df) >= 1


# --- funnel ordering (qt12) --------------------------------------------------


def test_funnel_requires_strict_event_order(spark):
    """A purchase BEFORE the user's first post-view click must not count
    as stage 3 — order is the whole point of a funnel (a flat groupBy
    min() per type would wrongly admit user 2)."""
    import datetime as dt

    def t(m):
        return dt.datetime(2024, 1, 1, 0, m)

    rows = [
        # user 1: view -> click -> purchase (complete, in order)
        (1, "view", t(0)), (1, "click", t(1)), (1, "purchase", t(2)),
        # user 2: purchase happens BEFORE the click -> stage 2 only
        (2, "view", t(0)), (2, "purchase", t(1)), (2, "click", t(2)),
        # user 3: click before any view -> stage 1 only
        (3, "click", t(0)), (3, "view", t(1)),
        # user 4: no view at all -> not even stage 1
        (4, "click", t(0)), (4, "purchase", t(1)),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")

    s1 = ev.where("event_type = 'view'").groupBy("user_id").agg(F.min("ts").alias("t1"))
    s2 = (
        ev.where("event_type = 'click'")
        .join(s1, "user_id")
        .where("ts > t1")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.min("t1").alias("t1"))
    )
    s3 = (
        ev.where("event_type = 'purchase'")
        .join(s2, "user_id")
        .where("ts > t2")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    assert sorted(r.user_id for r in s1.collect()) == [1, 2, 3]
    assert sorted(r.user_id for r in s2.collect()) == [1, 2]
    assert sorted(r.user_id for r in s3.collect()) == [1]


# --- winsorized stats (qr72) -------------------------------------------------


def test_winsorize_clamps_only_the_tails(spark):
    """Hand-checked 20-value group: exactly one value below p05 and one
    above p95 are clamped; the robust mean moves toward the middle."""
    vals = list(range(1, 20)) + [10_000]  # one extreme outlier
    df = spark.createDataFrame(
        [("A", float(v)) for v in vals], "l_returnflag string, l_extendedprice double"
    )
    li = df.select(
        "l_returnflag",
        F.expr("cast(round(l_extendedprice * 100) as bigint)").alias("cents"),
    )
    cuts = li.groupBy("l_returnflag").agg(
        F.expr(
            "cast(percentile_disc(0.05) WITHIN GROUP (ORDER BY cents) as bigint)"
        ).alias("lo"),
        F.expr(
            "cast(percentile_disc(0.95) WITHIN GROUP (ORDER BY cents) as bigint)"
        ).alias("hi"),
    )
    row = cuts.collect()[0]
    clamped = (
        li.join(F.broadcast(cuts), "l_returnflag")
        .select(F.greatest("lo", F.least("hi", "cents")).alias("w"))
        .agg(F.sum("w"))
        .collect()[0][0]
    )
    # p05 of 20 discrete values = the 1st, p95 = the 19th: outlier 10000
    # clamps to 1900 cents (=19.0)
    assert row.lo == 100 and row.hi == 1900
    assert clamped == sum(v * 100 for v in range(1, 20)) + 1900


# --- multimodal ANN (ql52) ---------------------------------------------------


def test_multimodal_ann_respects_modality_blocks(spark, duck):
    """Every neighbor must share the probe's modality (doc_id % 3 class) —
    the blocking predicate is load-bearing, not cosmetic."""
    from streamsurfer_spark.queries import registry

    out = registry()["ql52_multimodal_ann"].spark(spark, SF_DIR).collect()
    assert out, "no probes at this SF"
    for r in out:
        assert r.probe_id % 3 == r.doc_id % 3
        assert r.probe_id != r.doc_id


# --- plan shapes: vocabulary diagnostics / transition matrix -----------------


def test_vocab_diagnostics_no_window(spark):
    """ql53: the top token comes from max_by inside the rollup — no window
    function (a per-source rank window would re-sort the vocabulary)."""
    from streamsurfer_spark.plans.inspect import formatted_plan
    from streamsurfer_spark.queries import registry

    plan = formatted_plan(registry()["ql53_vocab_diagnostics"].spark(spark, SF_DIR))
    assert "Window" not in plan


def test_transition_matrix_single_user_exchange(spark):
    """qt14: one lag window on user_id plus bounded-keyspace rollups —
    the outgoing-total join must broadcast."""
    from streamsurfer_spark.plans.inspect import broadcast_join_count, formatted_plan
    from streamsurfer_spark.queries import registry

    df = registry()["qt14_transition_matrix"].spark(spark, SF_DIR)
    assert broadcast_join_count(df) >= 1
    assert "SortMergeJoin" not in formatted_plan(df)


# --- CDC tombstones (qs14) ---------------------------------------------------


def test_cdc_tombstone_survives_out_of_order_upsert(spark):
    """The resurrection scenario: batch 1 delivers a DELETE at t=5, batch 2
    delivers an UPSERT at t=3 (older, late-arriving). Retaining the
    tombstone in state must keep the key deleted; applying changes in
    arrival order would wrongly resurrect it."""
    import datetime as dt

    schema = "user_id long, event_id long, op string, cents long, ts timestamp"

    def merge(cur, batch):
        payload = ["event_id", "op", "cents", "ts"]
        return (
            cur.unionByName(batch)
            .groupBy("user_id")
            .agg(
                F.max_by(
                    F.struct(*payload), F.struct(F.col("ts"), F.col("event_id"))
                ).alias("_l")
            )
            .select("user_id", "_l.*")
        )

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    empty = spark.createDataFrame([], schema)
    b1 = spark.createDataFrame([(1, 10, "D", 0, t(5))], schema)
    b2 = spark.createDataFrame([(1, 9, "U", 100, t(3))], schema)
    state = merge(merge(empty, b1), b2)
    survivors = state.where("op <> 'D'").collect()
    assert survivors == []  # still deleted — tombstone won

    # and the upsert wins when it is genuinely NEWER
    b3 = spark.createDataFrame([(1, 11, "U", 200, t(7))], schema)
    survivors = merge(state, b3).where("op <> 'D'").collect()
    assert [(r.user_id, r.cents) for r in survivors] == [(1, 200)]


# --- PageRank (ql49) ---------------------------------------------------------


def test_pagerank_star_graph_hub_dominates_and_mass_conserved(spark):
    """On a 4-leaf star the hub must out-rank every leaf; total rank mass
    stays within integer-truncation loss of n x 1e6 (the conservation
    argument in the operator docstring)."""
    from streamsurfer_spark.operators import graph

    edges = spark.createDataFrame(
        [(1, i) for i in range(2, 6)], "src long, dst long"
    )
    out = {r.id: (r.deg, r.rank_micro) for r in graph.pagerank(edges).collect()}
    assert out[1][0] == 4 and all(out[i][0] == 1 for i in range(2, 6))
    hub = out[1][1]
    leaves = [out[i][1] for i in range(2, 6)]
    assert len(set(leaves)) == 1  # symmetry
    assert hub > leaves[0] * 2
    total = hub + sum(leaves)
    assert 5 * 900_000 < total <= 5 * 1_000_000


# --- foreachBatch exactly-once (qs13) ----------------------------------------


def test_foreachbatch_replay_noop_only_for_idempotent_merge(spark):
    """The qs13 design point: replaying a batch corrupts an append/count
    sink but is a no-op for the latest-wins merge — the property that turns
    at-least-once foreachBatch delivery into exactly-once state."""
    rows = [(1, 10, "a", 100), (1, 11, "b", 200), (2, 12, "c", 300)]
    schema = "user_id long, event_id long, event_type string, cents long"
    batch = spark.createDataFrame(rows, schema)

    def latest_wins(cur, b):
        payload = ["event_id", "event_type", "cents"]
        return (
            cur.unionByName(b)
            .groupBy("user_id")
            .agg(
                F.max_by(F.struct(*payload), F.col("event_id")).alias("_l")
            )
            .select("user_id", "_l.*")
        )

    empty = spark.createDataFrame([], schema)
    once = latest_wins(empty, batch)
    twice = latest_wins(once, batch)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))

    # the naive sink (append + sum) is NOT replay-safe: totals double
    naive_once = batch.groupBy("user_id").agg(F.sum("cents").alias("s"))
    naive_twice = (
        batch.unionByName(batch).groupBy("user_id").agg(F.sum("cents").alias("s"))
    )
    assert sorted(map(tuple, naive_once.collect())) != sorted(
        map(tuple, naive_twice.collect())
    )


def test_semdedup_plan_broadcasts_every_stage(spark):
    """qp06's composed plan: k-means assign + weight joins all broadcast.

    The r9 label→star CC switch legitimately introduced TWO sort-merge
    joins, both in the component machinery: star's edge×per-node-min
    join (two same-size-class relations — broadcasting either would be
    wrong at 100 TB) and the final corpus×labels LeftOuter re-attach
    (the label side is bounded only by the near-dup member count, which
    is unbounded at real scale — the OLD blanket no-SMJ pin was a
    label-CC-era artifact that would force an unsafe broadcast). The
    pair-GENERATION stages must still broadcast: centroids for the
    argmin assign and the tiny weight frames."""
    import re

    from streamsurfer_spark.plans.inspect import broadcast_join_count, formatted_plan
    from streamsurfer_spark.queries import registry

    df = registry()["qp06_semdedup_report"].spark(spark, SF_DIR)
    plan = formatted_plan(df)
    # only the two CC-machinery joins may sort-merge (each node is
    # listed twice in the formatted plan: tree + details sections)
    smj_kinds = set(re.findall(r"SortMergeJoin (\w+)", plan))
    assert smj_kinds <= {"Inner", "LeftOuter"}, smj_kinds
    assert plan.count("SortMergeJoin") <= 4
    assert broadcast_join_count(df) >= 4
