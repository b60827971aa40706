"""Round-8 advice-fix pins.

Each test pins one of the five round-7 ADVICE findings closed in round 8:
NULL-vector cosine messaging, the apply_cdc tombstone-branch NULL guard,
the kmeans_fit cache release handle, the spool stream reader's enforced
quiescence contract, and the per-session memory-sink LRU.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.errors import SparkRuntimeException


def test_cosine_null_vector_fails_with_named_null(spark):
    """size(NULL) is NULL, so the r7 dim guard mis-routed NULL vectors into
    the raise branch with a NULL concat message — the job died with an
    opaque null-message error (r8 advice). A NULL embedding reaching
    checked_dot must fail loudly AND say NULL, not look like a dim
    mismatch. (In the pair pipelines a NULL vector usually never reaches
    the dot: Catalyst infers isNotNull from the null-intolerant norm
    product under the threshold filter and prunes the row at the scan —
    the guard is the backstop for plans without that inference.)"""
    from streamsurfer_spark.operators.similarity import checked_dot

    df = spark.createDataFrame(
        [([1.0, 2.0], None)], "a array<double>, b array<double>"
    )
    with pytest.raises(SparkRuntimeException, match="2 vs NULL"):
        df.select(checked_dot("a", "b").alias("d")).collect()
    # and the dim-mismatch message still names both real widths
    df2 = spark.createDataFrame(
        [([1.0, 2.0], [1.0, 2.0, 3.0])], "a array<double>, b array<double>"
    )
    with pytest.raises(SparkRuntimeException, match="2 vs 3"):
        df2.select(checked_dot("a", "b").alias("d")).collect()


def test_apply_cdc_null_op_raises_from_deletes_alone(spark):
    """The r7 NULL-op guard lived only on the survivors branch; the deletes
    frame filtered op == delete_op, which evaluates NULL for a NULL op —
    a consumer acting on the tombstone frame ALONE still silently lost
    the key (r8 advice). Collecting just the deletes must now raise."""
    from streamsurfer_spark.operators.merge import apply_cdc

    target = spark.createDataFrame([(1, "a")], "k long, v string")
    changes = spark.createDataFrame(
        [(1, "b", None, 5)], "k long, v string, op string, seq long"
    )
    _merged, deletes = apply_cdc(target, changes, "k", "seq")
    with pytest.raises(SparkRuntimeException, match="NULL op"):
        deletes.collect()


def test_kmeans_fit_returns_releasable_cache(spark):
    """kmeans_fit persists the quantized input; 'unpersist via the returned
    frames' lineage' is not a real API, so loops over many fits
    accumulated cache entries forever (r8 advice). The cache handle is
    now returned and releasable."""
    from streamsurfer_spark.operators.clustering import kmeans_fit

    df = spark.createDataFrame(
        [(i, [float(i % 5), float(i % 3)]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    assigned, cents, cached = kmeans_fit(df, k=2, iters=2)
    assert cached.is_cached
    n = assigned.count()
    assert n == 30 and cents.count() <= 2
    cached.unpersist()
    assert not cached.is_cached
    # results still evaluable after release (recompute, not breakage)
    assert assigned.count() == 30


def _write_spool_record(spool: str, fname: str) -> None:
    with open(os.path.join(spool, fname), "w", encoding="utf-8") as f:
        json.dump(
            {
                "Data": json.dumps([{"event": "e"}]),
                "PartitionKey": "pk",
                "StreamName": "s",
            },
            f,
        )


def test_spool_stream_offsets_pin_listing_digest(tmp_path):
    """The spool stream reader pins its listing per instance, but checkpoint
    recovery builds a NEW instance that re-pins from the directory — if
    files were added meanwhile, uuid-hex sorting shifts committed offsets
    onto different files (duplicate/loss). The quiescence contract is now
    ENFORCED: offsets carry a listing digest and a recovered reader whose
    re-pinned listing disagrees fails loudly (r8 advice)."""
    from streamsurfer_spark.sources.kinesis_source import _SpoolStreamReader

    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    # uuid-hex-ish names; the adversarial add sorts BELOW the committed ones
    _write_spool_record(spool, "bbbb.json")
    _write_spool_record(spool, "cccc.json")

    r1 = _SpoolStreamReader({"spool_dir": spool, "batch_files": 1})
    start = r1.initialOffset()
    rows, end = r1.read(start)
    assert len(list(rows)) == 1 and end["next_file"] == 1
    assert "listing" in start and start["listing"] == end["listing"]

    # quiescent recovery: a fresh instance replays the committed range
    r2 = _SpoolStreamReader({"spool_dir": spool, "batch_files": 1})
    assert len(list(r2.readBetweenOffsets(start, end))) == 1

    # non-quiescent recovery: a file added after commit sorts FIRST —
    # without the digest the committed [0,1) slice would silently re-emit
    # the wrong file; with it, recovery fails loudly
    _write_spool_record(spool, "aaaa.json")
    r3 = _SpoolStreamReader({"spool_dir": spool, "batch_files": 1})
    with pytest.raises(ValueError, match="listing changed"):
        r3.readBetweenOffsets(start, end)
    with pytest.raises(ValueError, match="listing changed"):
        r3.read(end)

    # pre-digest checkpoints (no listing key) stay accepted — compat path
    rows, _ = r3.read({"next_file": 0})
    assert len(list(rows)) == 1


def test_scd2_history_collapses_and_versions(spark):
    """Re-observations of the same state must NOT open a version; each
    change carries [valid_from, valid_to) bounds chaining exactly, one
    is_current row per key."""
    from streamsurfer_spark.operators.merge import scd2_history

    rows = [
        # key, t, state
        ("u1", 1, "a"),
        ("u1", 2, "a"),  # no-op: collapses into version 1
        ("u1", 3, "b"),
        ("u1", 4, "a"),  # returning to a prior state IS a change
        ("u2", 1, "x"),
    ]
    df = spark.createDataFrame(rows, "k string, t long, state string")
    hist = {
        (r.k, r.version): r
        for r in scd2_history(df, "k", "t").collect()
    }
    assert len(hist) == 4
    assert hist[("u1", 1)].state == "a" and hist[("u1", 1)].valid_from == 1
    assert hist[("u1", 1)].valid_to == 3  # no-op at t=2 did not close it
    assert hist[("u1", 2)].state == "b" and hist[("u1", 2)].valid_to == 4
    assert hist[("u1", 3)].state == "a" and hist[("u1", 3)].is_current
    assert hist[("u2", 1)].is_current and hist[("u2", 1)].valid_to is None
    currents = [r for r in hist.values() if r.is_current]
    assert len(currents) == 2


def test_scd2_history_null_attribute_states(spark):
    """A NULL attribute state must open the FIRST version (the naive
    prev-is-distinct filter drops a leading NULL state) and consecutive
    NULL states must collapse null-safely."""
    from streamsurfer_spark.operators.merge import scd2_history

    rows = [("u1", 1, None), ("u1", 2, None), ("u1", 3, "a")]
    df = spark.createDataFrame(rows, "k string, t long, state string")
    got = sorted(
        scd2_history(df, "k", "t").collect(), key=lambda r: r.version
    )
    assert len(got) == 2
    assert got[0].state is None and got[0].valid_from == 1
    assert got[0].valid_to == 3
    assert got[1].state == "a" and got[1].is_current


def test_weighted_sample_properties(spark):
    """A-ES weighted sampling: deterministic, exhaustive at k >= n,
    weight-biased, and loud on non-positive weights."""
    from streamsurfer_spark.operators.sampling import weighted_sample

    rows = [(i, 10_000 if i < 100 else 1) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, w long")

    s1 = sorted(r.id for r in weighted_sample(df, "id", "w", 50).collect())
    s2 = sorted(r.id for r in weighted_sample(df, "id", "w", 50).collect())
    assert s1 == s2 and len(s1) == 50
    # 10000:1 weights: the heavy half must dominate the draw
    assert sum(1 for i in s1 if i < 100) >= 45
    # different seed, different draw (overwhelmingly)
    s3 = sorted(
        r.id for r in weighted_sample(df, "id", "w", 50, seed=7).collect()
    )
    assert s1 != s3
    # k >= n returns everything
    assert len(weighted_sample(df, "id", "w", 500).collect()) == 200

    bad = spark.createDataFrame([(1, 0)], "id long, w long")
    with pytest.raises(SparkRuntimeException, match="non-positive"):
        weighted_sample(bad, "id", "w", 1).collect()


def test_embedding_corr_pairs_known_correlations(spark):
    """dim1 == dim0 → corr 1.0; dim2 == -dim0 → corr -1.0; a constant
    dimension has zero variance → NULL corr (scaled_round's non-finite
    guard), and sorts BELOW the varying dims in the top-variance pick."""
    from streamsurfer_spark.operators.similarity import embedding_corr_pairs

    rows = [(i, [float(x), float(x), float(-x), 0.0]) for i, x in enumerate([0.1, 0.5, -0.3, 0.9, -0.7])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r.dim_i, r.dim_j): r.corr for r in embedding_corr_pairs(df, top_dims=4).collect()}
    assert len(got) == 6
    assert got[(0, 1)] == 1.0
    assert got[(0, 2)] == -1.0
    assert got[(1, 2)] == -1.0
    assert got[(0, 3)] is None and got[(1, 3)] is None and got[(2, 3)] is None


def test_run_to_memory_lru_is_keyed_per_session(spark, monkeypatch):
    """The memory-sink LRU was module-global across SparkSessions: an
    eviction from session B dropTempView'd a name owned by session A (a
    no-op in B's catalog) — leaking A's sink while evicting the name
    (r8 advice). The LRU is now keyed by the owning session."""
    from streamsurfer_spark.streaming import ingest

    monkeypatch.setattr(ingest, "MEM_TABLE_CAP", 2)

    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", "1000")
        .option("numPartitions", "1")
        .load()
        .select("value")
    )
    frames = [ingest.run_to_memory(rate, "append") for _ in range(3)]
    owned = ingest._mem_tables[spark]
    # cap enforced within the owning session's list
    assert len(owned) == 2
    # the evicted name is gone from THIS session's catalog; survivors remain
    live = {t.name for t in spark.catalog.listTables()}
    assert set(owned) <= live
    # the two youngest frames still evaluate
    for f in frames[-2:]:
        f.count()


def test_embedding_corr_null_embedding_fails_loudly(spark):
    """A NULL embedding must ABORT embedding_corr_pairs, not bias it: the
    moments pass (posexplode drops NULL arrays) and the pair pass
    (count(*) counts every row) would otherwise disagree on n and skew
    EVERY correlation with no error — and the DuckDB twin shares the
    bias, so the cross-engine gate can never catch this class (r8
    self-review). The guard names the offending id."""
    from streamsurfer_spark.operators.similarity import embedding_corr_pairs

    rows = [(0, [1.0, 2.0]), (1, None), (2, [3.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(SparkRuntimeException, match="NULL embedding at id=1"):
        embedding_corr_pairs(df, top_dims=2).collect()


def test_embedding_corr_sums_use_decimal_buffers(spark):
    """The moment sums must aggregate in DECIMAL(38,0), not BIGINT: with
    a LongType buffer, sum(qd**2) past 2**63 hits ANSI
    ARITHMETIC_OVERFLOW exactly in the large-corpus regime the
    diagnostic targets (r8 self-review). Pin the aggregation buffer
    types in the analyzed plan."""
    from streamsurfer_spark.operators.similarity import embedding_corr_pairs

    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [2.0, 1.0])], "vec_id long, embedding array<double>"
    )
    out = embedding_corr_pairs(df, top_dims=2)
    # the sum must consume decimal(38,0) inputs — the cast sits INSIDE
    # the sum (decimal buffer), never outside (long buffer, cast applied
    # after the overflow already happened). The moments-pass aggregate
    # hides behind the checkpoint RDD, so the analyzed plan shows only
    # the pair-pass sum — the big-values run below exercises both.
    import re

    analyzed = out._jdf.queryExecution().analyzed().toString()
    assert re.search(r"sum\(+cast\(.* as decimal\(38,0\)\)", analyzed)
    assert "cast(sum(" not in analyzed
    # and the job actually runs without overflow on values near the
    # bigint-per-element edge: |qd| = 3e9 → qd^2 = 9e18 > 2^63
    big = spark.createDataFrame(
        [(0, [3.0e6, 1.0]), (1, [-3.0e6, 2.0]), (2, [2.9e6, 3.0])],
        "vec_id long, embedding array<double>",
    )
    got = embedding_corr_pairs(big, top_dims=2).collect()
    assert len(got) == 1 and got[0].n_rows == 3


def test_char_entropy_known_values(spark):
    """Known entropies on tiny docs: uniform alphabet → ln(k), single
    repeated char → 0; empty and NULL text drop out (both engines'
    char-split of '' disagrees, so the operator filters length > 0)."""
    import math

    from streamsurfer_spark.operators.text import char_entropy

    df = spark.createDataFrame(
        [(0, "aaaa"), (1, "ab"), (2, "abcd"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in char_entropy(df).collect()}
    assert set(got) == {0, 1, 2}
    assert got[0].entropy_nats == 0.0 and got[0].distinct_chars == 1
    assert got[1].entropy_nats == round(math.log(2), 4)
    assert got[2].entropy_nats == round(math.log(4), 4)
    assert got[2].n_chars_counted == 4


def test_robust_outliers_known_values(spark):
    """Median/MAD flags: a zero-MAD group flags any deviation at all; a
    spread group flags nothing within k·MAD. All-integer comparisons."""
    from streamsurfer_spark.operators.profile import robust_outliers

    rows = [("a", i, v) for i, v in enumerate([10, 10, 10, 10, 100])] + [
        ("b", 10 + i, v) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7])
    ]
    df = spark.createDataFrame(rows, "src string, rid long, val long")
    out = robust_outliers(df, "val", "src", k=2)
    flagged = {r.rid for r in out.where("is_outlier").collect()}
    assert flagged == {4}
    byrid = {r.rid: r for r in out.collect()}
    assert byrid[4].med == 10 and byrid[4].mad == 0 and byrid[4].abs_dev == 90
    assert byrid[13].med == 4 and byrid[13].mad == 2


def _adversarial_events(spark, tmp_path):
    """An events fixture exercising the payload/NULL classes the envelope
    contract declares legal but the shipped fixtures never contain."""
    import datetime

    ts = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, ts, 10, "click", 1.0, '{"k": 7}'),
        (2, ts, 11, None, 2.0, '{"k": 8}'),          # invalid: NULL type
        (3, ts, 12, "view", 3.0, "{not json"),        # malformed props
        (4, ts, 13, "view", 4.0, '{"k": "x"}'),      # non-integral k
        (5, ts, 14, "buy", 5.0, '{"k": 1.5}'),       # fractional k
        (6, ts, 15, "buy", 6.0, "{}"),                # missing k
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = str(tmp_path / "adv")
    df.coalesce(1).write.parquet(out)
    return out


def _differential(spark, sf_dir, query, sql):
    """driver_sim's rows+schema+values compare, inline."""
    import glob as g

    import duckdb

    con = duckdb.connect()
    pq = g.glob(os.path.join(sf_dir, "*.parquet")) + g.glob(
        os.path.join(sf_dir, "*", "*.parquet")
    )
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet({pq!r})"
    )
    sdf = query(spark, sf_dir)
    s_rows = [tuple(r) for r in sdf.collect()]
    rel = con.sql(sql)
    d_rows = [tuple(r) for r in rel.fetchall()]
    assert sorted(sdf.columns) == sorted(rel.columns)
    s_idx = sorted(range(len(sdf.columns)), key=lambda i: sdf.columns[i])
    d_idx = sorted(range(len(rel.columns)), key=lambda i: rel.columns[i])
    canon = lambda v: "NULL" if v is None else repr(v)  # noqa: E731
    s_canon = sorted(tuple(canon(r[i]) for i in s_idx) for r in s_rows)
    d_canon = sorted(tuple(canon(r[i]) for i in d_idx) for r in d_rows)
    assert s_canon == d_canon, f"{s_canon[:4]} != {d_canon[:4]}"


def test_envelope_twins_agree_on_adversarial_events(spark, tmp_path):
    """qv03/qv05/qv08 diverged from their twins the moment an invalid
    (NULL event_type) row existed: Spark's to_json omits NULL keys while
    DuckDB's || concat nulls the envelope, string_agg silently drops it
    from the batch array, and the NULL sort group lands first vs last
    (r8 area review). Both sides now declare the reference's
    validate-before-serialize precondition — proven by running the REAL
    query and the REAL oracle twin over an adversarial fixture."""
    from streamsurfer_spark.queries.envelope_q import (
        QV03_SQL,
        QV05_SQL,
        QV08_SQL,
        qv03_origin_stamp,
        qv05_envelope_json,
        qv08_batch_wire_format,
    )

    # events is read via session.table(sf_dir, ...) which expects
    # <sf_dir>/events.parquet — write the fixture under that name
    import shutil

    src = _adversarial_events(spark, tmp_path)
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    part = [p for p in os.listdir(src) if p.endswith(".parquet")][0]
    shutil.copy(os.path.join(src, part), os.path.join(sf_dir, "events.parquet"))

    _differential(spark, sf_dir, qv03_origin_stamp, QV03_SQL)
    _differential(spark, sf_dir, qv05_envelope_json, QV05_SQL)
    _differential(spark, sf_dir, qv08_batch_wire_format, QV08_SQL)
    # and the invalid row really is excluded, not silently serialized
    assert qv05_envelope_json(spark, sf_dir).count() == 5


def test_qr52_degrades_on_bad_payloads(spark, tmp_path):
    """qr52's strict parse_json/variant_get ABORTED on payloads qv02/qv06
    declare legal producer output (malformed JSON, non-integral k). The
    try_* forms degrade to NULL identically to the guarded twin — proven
    differentially on the adversarial fixture (r8 area review)."""
    import shutil

    from streamsurfer_spark.queries.relational_q import QR52_SQL, qr52_variant_props

    src = _adversarial_events(spark, tmp_path)
    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir)
    part = [p for p in os.listdir(src) if p.endswith(".parquet")][0]
    shutil.copy(os.path.join(src, part), os.path.join(sf_dir, "events.parquet"))

    _differential(spark, sf_dir, qr52_variant_props, QR52_SQL)


def test_simhash_hamming_pairs_match_brute_force(spark):
    """Pigeonhole completeness: banding may only PRUNE by the cap, never
    miss — on an uncapped corpus the banded candidates + exact check must
    equal the brute-force all-pairs hamming filter. Identical texts pin
    the hamming-0 case."""
    from streamsurfer_spark.operators import dedup

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .limit(60)
    )
    dup = docs.limit(1).selectExpr("doc_id + 100000 AS doc_id", "text")
    corpus = docs.select("doc_id", "text").unionByName(dup)

    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dedup.simhash_hamming_pairs(corpus).collect()
    }

    sigs = dedup.simhash(corpus)
    a = sigs.selectExpr("doc_id AS doc_a", "simhash AS sig_a")
    b = sigs.selectExpr("doc_id AS doc_b", "simhash AS sig_b")
    brute = {
        (r.doc_a, r.doc_b): r.hamming
        for r in a.crossJoin(b)
        .where("doc_a < doc_b")
        .selectExpr(
            "doc_a", "doc_b", "cast(bit_count(sig_a ^ sig_b) as int) AS hamming"
        )
        .where(f"hamming <= {dedup.SIMHAM_K}")
        .collect()
    }
    assert got == brute
    dup_key = min(k for k in got if k[1] >= 100000)
    assert got[dup_key] == 0


def test_intake_gate_composition_invariants(spark, tmp_path):
    """qp09: admission is the conjunction of the three signals —
    per-source bounds hold (inclusion-exclusion), and a length-0
    document is REJECTED via the entropy floor (char_entropy has no row
    for it; the NULL coalesce must not admit it)."""
    import datetime

    from streamsurfer_spark.queries.pipeline_q import qp09_intake_gate

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    empty = spark.createDataFrame(
        [(990001, "", "en", "srcEMPTY", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf_dir = str(tmp_path / "sf")
    import os as _os

    _os.makedirs(sf_dir)
    docs.unionByName(empty).coalesce(1).write.parquet(
        str(tmp_path / "docs")
    )
    import shutil

    part = [
        p for p in _os.listdir(str(tmp_path / "docs")) if p.endswith(".parquet")
    ][0]
    shutil.copy(
        _os.path.join(str(tmp_path / "docs"), part),
        _os.path.join(sf_dir, "documents.parquet"),
    )

    rows = {r.source: r for r in qp09_intake_gate(spark, sf_dir).collect()}
    for r in rows.values():
        assert 0 <= r.n_admitted <= r.n_docs
        # every rejection is explained by at least one flag
        assert r.n_docs - r.n_admitted <= (
            r.n_gopher_fail + r.n_low_entropy + r.n_outliers
        )
    e = rows["srcEMPTY"]
    assert e.n_docs == 1 and e.n_admitted == 0 and e.n_low_entropy == 1


def _docs_fixture(spark, tmp_path, rows):
    """Write a documents.parquet fixture dir and return its sf_dir."""
    import shutil

    sf_dir = str(tmp_path / "sf")
    os.makedirs(sf_dir, exist_ok=True)
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "docs_out")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    part = [p for p in os.listdir(out) if p.endswith(".parquet")][0]
    shutil.copy(os.path.join(out, part), os.path.join(sf_dir, "documents.parquet"))
    return sf_dir


def _doc_differential(spark, sf_dir, query, sql):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{os.path.join(sf_dir, 'documents.parquet')}')"
    )
    sdf = query(spark, sf_dir)
    canon = lambda v: "NULL" if v is None else repr(v)  # noqa: E731
    s_idx = sorted(range(len(sdf.columns)), key=lambda i: sdf.columns[i])
    rel = con.sql(sql)
    d_idx = sorted(range(len(rel.columns)), key=lambda i: rel.columns[i])
    s = sorted(tuple(canon(r[i]) for i in s_idx) for r in [tuple(x) for x in sdf.collect()])
    d = sorted(tuple(canon(r[i]) for i in d_idx) for r in rel.fetchall())
    assert sorted(sdf.columns) == sorted(rel.columns)
    assert s == d, f"{s[:3]} != {d[:3]}"


def test_ql07c_empty_payload_matches(spark, tmp_path):
    """A zero-byte payload made Spark's codegen byte-sum NULL (sequence(0,
    -1) is the DESCENDING [0, -1]) so py_cg_match went NULL while the
    twin said TRUE (r8 area review). Both engines must now report
    checksum 0 and match TRUE — proven by running the real query + twin
    on a fixture containing an empty document."""
    from streamsurfer_spark.queries.llm_q import QL07C_SQL, ql07c_features_parity

    sf_dir = _docs_fixture(
        spark,
        tmp_path,
        [(1, "some text", "en", "s0", 9), (2, "", "en", "s0", 0)],
    )
    _doc_differential(spark, sf_dir, ql07c_features_parity, QL07C_SQL)
    rows = {r.doc_id: r for r in ql07c_features_parity(spark, sf_dir).collect()}
    assert rows[2].feat_checksum == 0 and rows[2].py_cg_match is True


def test_minhash_twin_tracks_bucket_cap(spark, tmp_path):
    """With >LSH_BUCKET_CAP identical documents, Spark keeps only the cap
    smallest ids per (band, key); the shared bands CTE must prune the
    same way or the oracle emits pairs Spark dropped (r8 area review).
    Proven by a 300-identical-doc corpus where the cap binds: C(256,2)
    pairs on both sides, not C(300,2)."""
    from streamsurfer_spark.operators.dedup import LSH_BUCKET_CAP
    from streamsurfer_spark.queries.llm_q import QL02_SQL, ql02_minhash_lsh_pairs

    text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, text, "en", "s0", len(text)) for i in range(300)]
    sf_dir = _docs_fixture(spark, tmp_path, rows)
    _doc_differential(spark, sf_dir, ql02_minhash_lsh_pairs, QL02_SQL)
    n = ql02_minhash_lsh_pairs(spark, sf_dir).count()
    cap = LSH_BUCKET_CAP
    assert n == cap * (cap - 1) // 2


def test_asof_join_ignores_null_time_and_null_key_right_rows(spark):
    """SQL asof semantics: a NULL right_time can never satisfy t >= rt,
    and a NULL key matches nothing under equality-join rules — but the
    union-sort window parked a NULL-time right row at the partition
    HEAD (NULLS FIRST) with a live payload, phantom-matching every left
    row before the first real right row; NULL keys grouped into one
    matchable partition (r8 area review). Left NULL-key rows still
    surface, NULL-padded, like a left join."""
    import datetime

    from streamsurfer_spark.operators.asof import asof_join, asof_nearest

    t = lambda h: datetime.datetime(2024, 1, 1, h)  # noqa: E731
    left = spark.createDataFrame(
        [(1, t(9)), (1, t(11)), (None, t(9))],
        "k long, lt timestamp",
    )
    right = spark.createDataFrame(
        [(1, None, "phantom"), (1, t(10), "real"), (None, t(8), "nullk")],
        "k long, rt timestamp, payload string",
    )
    got = {
        (r.k, r.lt.hour): r.payload
        for r in asof_join(left, right, "k", "lt", "rt", ["payload"]).collect()
    }
    assert got[(1, 9)] is None        # no real right row at-or-before 09
    assert got[(1, 11)] == "real"
    assert got[(None, 9)] is None     # left NULL key surfaces, unmatched

    near = {
        (r.k, r.lt.hour): r.payload
        for r in asof_nearest(
            left, right, "k", "lt", "rt", ["payload"], 24 * 3600
        ).collect()
    }
    assert near[(1, 9)] == "real" and near[(None, 9)] is None
