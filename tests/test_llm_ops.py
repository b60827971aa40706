"""Unit tests for the LLM-pipeline operators (SURVEY §2.3 D).

The oracle-differential suite (test_oracle.py) covers value correctness vs
DuckDB; these tests cover the pieces an oracle can't see: Arrow batch
plumbing (mapInPandas), hash portability constants, and LSH recall on known
duplicates.
"""

from __future__ import annotations

import duckdb

from streamsurfer_spark.functions.hashing import md5_long64_py
from streamsurfer_spark.operators import dedup, multimodal, similarity


def test_md5_long64_portable():
    """Python, DuckDB, and (via oracle suite) Spark agree on the 60-bit hash."""
    assert md5_long64_py("hello") == 419982666956583591
    got = duckdb.sql("SELECT ('0x' || substr(md5('hello'), 1, 15))::BIGINT").fetchone()[0]
    assert got == md5_long64_py("hello")


def test_plane_weights_deterministic():
    w = similarity.plane_weights()
    assert len(w) == similarity.N_PLANES
    assert all(len(row) == similarity.DIM for row in w)
    assert all(-1000 <= x <= 1000 for row in w for x in row)
    # frozen contract: same planes on every run/engine
    assert w == similarity.plane_weights()
    assert w[0][0] == md5_long64_py("plane:0:0") % 2001 - 1000


def test_lsh_finds_identical_docs(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),  # exact dup of 1
        (3, "completely different words entirely here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.lsh_candidate_pairs(df).collect()
    assert [(r.doc_a, r.doc_b, r.n_shared_bands) for r in pairs] == [
        (1, 2, dedup.N_BANDS)
    ]


def test_exact_dedup_groups(spark):
    rows = [(1, "same text"), (2, "same text"), (3, "other text")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    groups = dedup.exact_duplicate_groups(df).collect()
    assert len(groups) == 1
    assert groups[0].n_copies == 2
    assert groups[0].keep_id == 1


def test_multimodal_feature_plumbing(spark):
    rows = [(0, "abc"), (1, "defg"), (2, "h")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    feats = {
        r.doc_id: r
        for r in multimodal.extract_features(multimodal.as_media(df)).collect()
    }
    # checksum proves the payload bytes crossed the Arrow boundary intact
    assert feats[0].feat_checksum == sum(b"abc")
    assert feats[1].feat_checksum == sum(b"defg")
    assert feats[0].modality == "image" and feats[1].modality == "audio"
    assert feats[2].modality == "video"
    assert feats[1].n_bytes == 4 and feats[1].feat_dim == 4


def test_ngram_jaccard_exact_value(spark):
    # doc1: shingles {a b c, b c d}; doc2: shingles {a b c, b c e}
    # intersection 1, union 3 -> J = 0.3333 (below default threshold)
    rows = [(1, "a b c d"), (2, "a b c e")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup.ngram_jaccard_pairs(df, threshold=0.3).collect()
    assert len(out) == 1
    assert out[0].n_inter == 1
    assert abs(out[0].jaccard - 0.3333) < 1e-9
    assert dedup.ngram_jaccard_pairs(df, threshold=0.4).count() == 0


def test_frame_sampling_expansion(spark):
    from streamsurfer_spark.operators import multimodal

    rows = [(2, "0123456789abcdef"), (5, "xyz"), (3, "not video")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    frames = multimodal.sample_frames(multimodal.as_media(df)).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    # only video rows (doc_id % 3 == 2) expand; others never reach Python
    assert set(by_doc) == {2, 5}
    assert [f.frame_idx for f in sorted(by_doc[2], key=lambda r: r.frame_idx)] == [0, 1, 2, 3]
    assert all(f.frame_bytes == 4 for f in by_doc[2])
    # payload shorter than n_frames: truncated expansion, 1-byte steps
    assert len(by_doc[5]) == 3


def test_resize_fixed_byte_budget(spark):
    from streamsurfer_spark.operators import multimodal

    # image rows are doc_id % 3 == 0; shorter/longer than target + empty
    rows = [(0, "ab"), (3, "x" * 5000), (1, "audio row"), (6, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in multimodal.resize_images(
        multimodal.as_media(df), width=4, height=4
    ).collect()}
    # only image rows reach Python
    assert set(out) == {0, 3, 6}
    target = 4 * 4 * 3
    # the training contract: EVERY output row has exactly the byte budget
    # (a zero-length payload tiles a zero byte rather than breaking it)
    assert all(r.n_bytes_out == target for r in out.values())
    assert out[0].n_bytes_in == 2 and out[3].n_bytes_in == 5000
    # tiling is deterministic: "ab" tiled to 48 bytes
    import hashlib
    assert out[0].resized_md5 == hashlib.md5((b"ab" * 24)[:target]).hexdigest()


def test_hll_sketch_error_bound(spark):
    """approx_count_distinct (HLL++) must stay within its configured
    relative error on the fixture — the property the rows-only gate can't
    check."""
    import pyspark.sql.functions as F
    from streamsurfer_spark.session import table
    from tests.conftest import SF_DIR

    orders = table(spark, SF_DIR, "orders")
    exact = orders.select(F.countDistinct("o_custkey")).first()[0]
    approx = orders.select(F.approx_count_distinct("o_custkey", rsd=0.05)).first()[0]
    assert abs(approx - exact) / exact < 0.10  # 2x headroom over rsd


def test_approx_percentile_error_bound(spark):
    """percentile_approx must land within the accuracy-implied rank error of
    the exact percentile (the qr21 exact path is the oracle here)."""
    import pyspark.sql.functions as F
    from streamsurfer_spark.session import table
    from tests.conftest import SF_DIR

    orders = table(spark, SF_DIR, "orders")
    n = orders.count()
    acc = 100  # rank error ≤ n / acc
    for p in (0.5, 0.9):
        exact = orders.select(F.percentile("o_totalprice", F.lit(p))).first()[0]
        approx = orders.select(
            F.percentile_approx("o_totalprice", F.lit(p), F.lit(acc))
        ).first()[0]
        # translate the rank guarantee into a value window: the approx value
        # must sit between the exact values at p ± n/acc ranks
        lo_p = max(0.0, p - 1.0 / acc)
        hi_p = min(1.0, p + 1.0 / acc)
        lo = orders.select(F.percentile("o_totalprice", F.lit(lo_p))).first()[0]
        hi = orders.select(F.percentile("o_totalprice", F.lit(hi_p))).first()[0]
        assert lo <= approx <= hi, (p, lo, approx, hi, n)


def test_audio_chunking_timeline(spark):
    """chunk_audio: segments tile the fake timeline exactly, the trailing
    sub-min segment drops, and only audio rows reach Python."""
    import hashlib

    from streamsurfer_spark.operators import multimodal

    # doc_id % 3 == 1 → audio in the as_media envelope
    df = spark.createDataFrame(
        [(1, "x" * 80), (4, "y" * 33), (0, "img-not-audio")], "doc_id long, text string"
    )
    segs = multimodal.chunk_audio(
        multimodal.as_media(df), segment_ms=2, min_ms=1
    ).collect()
    by_doc = {}
    for r in segs:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {1, 4}  # image row never segmented
    # doc 1: 80 bytes = 5ms → 2+2+1ms chunks at 2ms segments
    d1 = sorted(by_doc[1], key=lambda r: r.seg_idx)
    assert [(r.seg_start_ms, r.seg_ms, r.seg_bytes) for r in d1] == [
        (0, 2, 32), (2, 2, 32), (4, 1, 16),
    ]
    assert d1[0].seg_md5 == hashlib.md5(b"x" * 32).hexdigest()
    # doc 4: 33 bytes = 2ms + 1 trailing byte (<1ms = sub-min) → dropped
    d4 = sorted(by_doc[4], key=lambda r: r.seg_idx)
    assert [(r.seg_start_ms, r.seg_bytes) for r in d4] == [(0, 32)]


def test_ivf_recall_vs_exact(spark):
    """ANN quality gate: ql14's IVF top-3 must recover a healthy fraction of
    the exact cosine top-3 (ql03 is exact over the same probes' space).
    IVF with nprobe=2 trades recall for a ~k_clusters/nprobe-fold candidate
    cut; on the fixture it must stay above 0.5 — a collapse below that
    means the routing (quantize → assign → probe) broke, not the tuning."""
    import pyspark.sql.functions as F
    from streamsurfer_spark.operators import similarity
    from streamsurfer_spark.session import table
    from tests.conftest import SF_DIR

    emb = table(spark, SF_DIR, "embeddings")
    approx = similarity.ivf_topk(emb, k=3, probe_mod=25)
    probes = [r.probe_id for r in approx.select("probe_id").distinct().collect()]

    # exact top-3 per probe by brute-force cosine over the full corpus
    a = emb.select(
        F.col("vec_id").alias("probe_id"),
        F.col("embedding").cast("array<double>").alias("pa"),
    ).where(F.col("probe_id").isin(probes))
    b = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("ca")
    )
    dot = F.expr("aggregate(zip_with(pa, ca, (x, y) -> x * y), 0d, (acc, v) -> acc + v)")
    nrm = "sqrt(aggregate(transform({c}, x -> x * x), 0d, (acc, v) -> acc + v))"
    from pyspark.sql import Window

    sim = dot / (F.expr(nrm.format(c="pa")) * F.expr(nrm.format(c="ca")))
    w = Window.partitionBy("probe_id").orderBy(F.desc("sim"), "vec_id")
    exact = (
        a.crossJoin(b)
        .where(F.col("vec_id") != F.col("probe_id"))
        .withColumn("sim", sim)
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("probe_id", "vec_id")
    )
    exact_sets: dict[int, set] = {}
    for r in exact.collect():
        exact_sets.setdefault(r.probe_id, set()).add(r.vec_id)
    approx_sets: dict[int, set] = {}
    for r in approx.collect():
        approx_sets.setdefault(r.probe_id, set()).add(r.vec_id)

    hits = sum(len(approx_sets.get(p, set()) & s) for p, s in exact_sets.items())
    total = sum(len(s) for s in exact_sets.values())
    recall = hits / total
    assert total > 0
    assert recall >= 0.5, f"IVF recall collapsed: {recall:.3f} ({hits}/{total})"


def test_centroid_budget_constant():
    """The IVF centroid count must grow SUB-LINEARLY with the corpus (the
    r11 1000× probe caught the previous fixed-modulus rule building ~20k
    centroids at 5M vectors — assign work n·k was quadratic and DNF'd):
    pinned in the fixture regime (oracle hashes never move), ~4·√n in the
    middle, capped at IVF_MAX_CENTROIDS (broadcastability at 100 TB)."""
    import math

    from streamsurfer_spark.operators.similarity import (
        IVF_CENTROID_MOD,
        IVF_MAX_CENTROIDS,
        IVF_SQRT_REGIME,
        centroid_modulus,
    )

    # fixture regime: modulus pinned → deterministic oracle-stable sampling
    assert centroid_modulus(10_000) == IVF_CENTROID_MOD
    assert centroid_modulus(IVF_SQRT_REGIME) == IVF_CENTROID_MOD
    # √ regime: count within a constant factor of 4·√n — never linear.
    # The r11 probe's exact corpus: 5M vectors must build ~9k, not 20k.
    assert 5_000_000 // centroid_modulus(5_000_000) < 10_000
    for n in (2 * 10**6, 10**7, 10**8):
        k = n // centroid_modulus(n)
        assert k <= 5 * math.isqrt(n)
        assert k >= 2 * math.isqrt(n) or k >= IVF_MAX_CENTROIDS
    # cap regime: count pinned at the constant budget
    for n in (10**9, 10**12):
        mod = centroid_modulus(n)
        assert n // mod <= IVF_MAX_CENTROIDS
        assert mod >= IVF_CENTROID_MOD
    # continuity at the regime boundary: no cliff in the centroid count
    below = IVF_SQRT_REGIME // centroid_modulus(IVF_SQRT_REGIME)
    above = (IVF_SQRT_REGIME + 1) // centroid_modulus(IVF_SQRT_REGIME + 1)
    assert abs(below - above) < below * 0.05


def test_ivf_assign_vectorized_exact_twin(spark):
    """The Arrow/numpy assign path must be BIT-IDENTICAL to the codegen
    HOF path — same assignments, same distances, same (dist, cent_id)
    tie-break — on a corpus with duplicate vectors (argmin ties), a zero
    vector, and enough centroids to force real multi-centroid argmins.
    The vectorized path only engages above IVF_ASSIGN_VECTORIZE_K in
    production (never at fixture scale), so this twin test is its
    correctness gate."""
    import random

    import pyspark.sql.functions as F

    from streamsurfer_spark.operators.similarity import (
        _ivf_assign_np,
        ivf_assign,
        quantize,
    )

    rnd = random.Random(7)
    rows = []
    for i in range(400):
        vec = [round(rnd.uniform(-2.0, 2.0), 3) for _ in range(8)]
        rows.append((i, vec))
    rows.append((400, rows[3][1]))  # exact duplicate → tie on dist
    rows.append((401, [0.0] * 8))  # zero vector
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = quantize(df).select("vec_id", "qv")
    cents = q.where(F.col("vec_id") % 13 == 0)  # 31 centroids

    # degenerate-vector parity (r11 ADVICE): NULL qv, ragged qv (both
    # directions), and a NULL element — the HOF path assigns all of them
    # to the SMALLEST cent_id with dist NULL (NULL dist propagates
    # through zip_with/aggregate; array_min's struct order puts NULL
    # first), and the np path must match instead of crashing in np.array
    first_qv = [int(x) for x in q.orderBy("vec_id").first().qv]
    degen = spark.createDataFrame(
        [
            (500, None),
            (501, first_qv[:5]),
            (502, first_qv + [7]),
            (503, first_qv[:7] + [None]),
        ],
        "vec_id long, qv array<bigint>",
    )
    q = q.unionByName(degen)

    hof = ivf_assign(q, cents, keep_dist=True).orderBy("vec_id").collect()
    vec = (
        _ivf_assign_np(q, cents, "vec_id", keep_dist=True)
        .orderBy("vec_id")
        .collect()
    )
    assert len(hof) == len(vec) == len(rows) + 4
    # the degenerate contract is "smallest cent_id of the CENTROID SET"
    # — derive it from the cents frame, not from the assignments (r12
    # ADVICE: min over assigned centroids only pinned the semantics
    # because vec_id 0 happened to be its own centroid)
    min_cent = min(r.vec_id for r in cents.select("vec_id").collect())
    for a, b in zip(hof, vec):
        assert (a.vec_id, a.cent_id, a.dist) == (b.vec_id, b.cent_id, b.dist)
        assert (a.qv is None and b.qv is None) or list(a.qv) == list(b.qv)
        if a.vec_id >= 500:  # the degenerate class
            assert a.cent_id == min_cent and a.dist is None


def test_ivf_assign_cap_regime_bound_and_branch(spark):
    """The IVF_MAX_CENTROIDS=65536 cap regime (r11 verdict item 5):
    (a) the broadcast payload at the cap respects the ≤34 MB contract
    the centroid collect/broadcast legality rests on, and the sub-batch
    step keeps the per-batch distance matrix ≤512 MB; (b) the cap-sized
    vectorized branch actually RUNS (k=65536 synthesized JVM-side, tiny
    n) and assigns correctly — the last unprobed branch of
    centroid_modulus. Wall-vs-k linearity at real n is the probe tool's
    job (tools/ivf_cap_probe.py, BASELINE.md row)."""
    import pyspark.sql.functions as F

    from streamsurfer_spark.operators.similarity import (
        DIM,
        IVF_MAX_CENTROIDS,
        ivf_assign,
    )

    # (a) the arithmetic contract, pinned so a constant bump can't
    # silently break broadcastability: 65536 × (8 + 64·8) B ≈ 34.1 MB
    assert IVF_MAX_CENTROIDS * (8 + DIM * 8) <= 34_100_000
    step = max(1, 64_000_000 // IVF_MAX_CENTROIDS)
    assert step * IVF_MAX_CENTROIDS * 8 <= 512 * 1024 * 1024

    # (b) run the branch at the cap: k=65536 centroids, 8 probe rows
    def synth(n, mix):
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.expr(
                f"transform(sequence(1, {DIM}), j -> "
                f"cast(pmod(id * {mix} + j * 40503, 4001) - 2000 as bigint))"
            ).alias("qv"),
        )

    cents = synth(IVF_MAX_CENTROIDS, 1099511628211)
    rows = synth(8, 2654435761)
    got = (
        ivf_assign(
            rows, cents, id_col="vec_id", keep_dist=True,
            n_centroids=IVF_MAX_CENTROIDS,
        )
        .orderBy("vec_id")
        .collect()
    )
    assert len(got) == 8
    assert all(0 <= r.cent_id < IVF_MAX_CENTROIDS for r in got)
    assert all(r.dist is not None and r.dist >= 0 for r in got)
    # differential spot-check: recompute row 3's argmin driver-side in
    # pure numpy from the SAME deterministic synthesis formula (running
    # the interpreted HOF loop at k=65536 would cost ~30 s of suite
    # wall for the same pin; HOF↔np parity itself is the twin test)
    import numpy as np

    j = np.arange(1, DIM + 1, dtype=np.int64)
    qv3 = (3 * 2654435761 + j * 40503) % 4001 - 2000
    cids = np.arange(IVF_MAX_CENTROIDS, dtype=np.int64)
    cqv = (cids[:, None] * 1099511628211 + j[None, :] * 40503) % 4001 - 2000
    d2 = ((cqv - qv3[None, :]) ** 2).sum(1)
    vec = next(r for r in got if r.vec_id == 3)
    assert (vec.cent_id, vec.dist) == (int(d2.argmin()), int(d2.min()))


def test_ivf_assign_f64_exactness_guard_is_dimension_aware():
    """The exactness bound must use the ACTUAL vector width: the old
    element-magnitude assert (|v| < 2²¹) silently relied on d=64 — a
    1024-d corpus at near-2²¹ values voids float64 exactness while
    passing it (r11 ADVICE). And it must be a ValueError, not an assert
    python -O would strip."""
    import pytest

    from streamsurfer_spark.operators.similarity import _check_f64_exact

    _check_f64_exact(64, 2**21 - 1, "vector")  # the historical regime
    with pytest.raises(ValueError, match="float64 exactness"):
        _check_f64_exact(1024, 2**21 - 1, "vector")  # wide → unsound
    _check_f64_exact(1024, 2**19, "vector")  # wide but small values: fine
    with pytest.raises(ValueError, match="dim=64"):
        _check_f64_exact(64, 2**24, "centroid")


def test_lsh_bucket_cap_bounds_pair_blowup(spark):
    """A mega-duplicated document (every copy landing in the same band
    buckets) must NOT explode quadratically: with bucket_cap=c the pair
    count is bounded by c·(c-1)/2 per band, and the survivors are the c
    smallest doc ids (deterministic overflow policy)."""
    from streamsurfer_spark.operators import dedup

    n_copies = 40
    rows = [(i, "the same exact text repeated for every single copy here") for i in range(n_copies)]
    rows += [(1000 + i, f"unique filler document number {i} with its own words entirely") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    cap = 8
    pairs = dedup.lsh_candidate_pairs(df, bucket_cap=cap).collect()
    # pairs inside the duplicated group come only from the capped
    # membership — the cap smallest ids (0..cap-1), ≤ cap·(cap-1)/2 pairs
    # (filler docs may chance-collide in a band; they're not under test)
    dup_pairs = [p for p in pairs if p.doc_a < 1000 and p.doc_b < 1000]
    max_pairs = cap * (cap - 1) // 2
    assert 0 < len(dup_pairs) <= max_pairs
    assert all(p.doc_a < cap and p.doc_b < cap for p in dup_pairs)

    # uncapped (cap above group size) finds the full quadratic set
    full = (
        dedup.lsh_candidate_pairs(df, bucket_cap=256)
        .where("doc_a < 1000 and doc_b < 1000")
        .count()
    )
    assert full == n_copies * (n_copies - 1) // 2


def test_ngram_jaccard_shingle_df_cap(spark):
    """A stopword shingle shared by EVERY document must not create the
    all-pairs join: with the cap below its document frequency, pairs held
    together only by that shingle disappear, while true near-dup pairs
    (sharing many rare shingles) keep their exact Jaccard."""
    from streamsurfer_spark.operators import dedup

    stop = "it is the"  # one shared 3-shingle across all docs
    rows = [(i, f"{stop} document number {i} talks about topic {i} only") for i in range(10)]
    # a true near-dup pair: long shared tail, distinct heads
    tail = "shared body of text that continues identically for many tokens in a row"
    rows += [(100, f"alpha {tail}"), (101, f"beta {tail}")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = dedup.ngram_jaccard_pairs(df, threshold=0.3, max_shingle_docs=5)
    got = {(r.doc_a, r.doc_b): r.jaccard for r in capped.collect()}
    assert (100, 101) in got  # near-dup pair survives the prune
    # no pair among the stopword-only documents
    assert all(a >= 100 for a, _ in got)

    # and the capped Jaccard for the surviving pair is the exact value
    uncapped = dedup.ngram_jaccard_pairs(df, threshold=0.3, max_shingle_docs=10_000)
    exact = {(r.doc_a, r.doc_b): r.jaccard for r in uncapped.collect()}
    assert got[(100, 101)] == exact[(100, 101)]


def test_bm25_requires_terms(spark):
    import pytest

    from streamsurfer_spark.operators import retrieval

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        retrieval.bm25_topk(df, [])


def test_bm25_ranks_exact_match_first(spark):
    """A document saturated with the query terms outranks partial matches;
    zero-match documents are absent from the result."""
    from streamsurfer_spark.operators import retrieval

    rows = [
        (1, "join window hash join window hash"),
        (2, "join filler filler filler filler filler"),
        (3, "nothing relevant here at all ever"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = retrieval.bm25_topk(df, ("join", "window", "hash"), k=10).collect()
    assert [r.doc_id for r in got] == [1, 2]
    assert got[0].score > got[1].score > 0


def test_pack_sequences_greedy_recurrence(spark):
    """Greedy fill: bins break exactly when offset + n would overflow, an
    oversized document gets a bin of its own, and domains are independent."""
    from streamsurfer_spark.operators import packing

    # single domain (one lang, n_shards=1): token counts 100,100,100 with
    # capacity 250 -> bins 1,1,2; a 300-token doc (oversized) -> own bin 3
    rows = [
        (0, "en", "w " * 100),
        (1, "en", "w " * 100),
        (2, "en", "w " * 100),
        (3, "en", "w " * 300),
        (4, "en", "w " * 10),
    ]
    df = spark.createDataFrame(
        [(i, lang, t.strip()) for i, lang, t in rows],
        "doc_id long, lang string, text string",
    )
    got = {
        r.doc_id: (r.bin_id, r.bin_offset)
        for r in packing.pack_sequences(df, capacity=250, n_shards=1).collect()
    }
    assert got == {0: (1, 0), 1: (1, 100), 2: (2, 0), 3: (3, 0), 4: (4, 0)}


def test_duplicate_span_coverage_hand_example(spark):
    """Doc 1 and 2 share exactly one 3-gram ('c d e' at different offsets);
    each doc's covered positions are that shingle's 3-token span."""
    rows = [
        (1, "a b c d e f"),   # 'c d e' at pos 2 -> covers {2,3,4}
        (2, "c d e x y z"),   # 'c d e' at pos 0 -> covers {0,1,2}
        (3, "p q r s t u"),   # shares nothing
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["covered_tokens"], r["dup_coverage"])
        for r in dedup.duplicate_span_coverage(df).collect()
    }
    assert got == {1: (6, 3, 0.5), 2: (6, 3, 0.5)}


def test_duplicate_span_coverage_overlapping_spans(spark):
    """Overlapping duplicated shingles cover the union, not the sum."""
    rows = [
        (1, "a b c d x x"),   # 'a b c' pos0 + 'b c d' pos1 -> union {0,1,2,3}
        (2, "a b c d y y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["covered_tokens"] for r in dedup.duplicate_span_coverage(df).collect()}
    assert got == {1: 4, 2: 4}


def test_unigram_surprisal_ranks_rare_tokens(spark):
    """A doc of corpus-rare tokens scores above a doc of corpus-common ones,
    and every per-doc sum is the exact integer sum of vocab-level costs."""
    import math as m

    from streamsurfer_spark.operators import text as text_ops

    rows = [
        (1, "the the the the"),
        (2, "the the the the"),
        (3, "rare words here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in text_ops.unigram_surprisal(df).collect()}
    assert got[3]["avg_surprisal_nats"] > got[1]["avg_surprisal_nats"]
    # exact contract: cost('the') = round(ln(12/8)*1e6), 4 occurrences
    assert got[1]["surprisal_micro"] == 4 * round(m.log(12 / 8) * 1_000_000)
    assert got[1]["n_tokens"] == 4


def test_kmeans_separates_obvious_clusters(spark):
    """Two tight blobs -> 2 non-empty clusters, SSE is the exact integer sum
    of within-cluster squared distances."""
    from streamsurfer_spark.operators import clustering

    # ids 0,1 seed the two blobs; 64-dim vectors, blob A ~ 0.0, blob B ~ 1.0
    rows = [(i, [0.0 + 0.001 * i] * 64) for i in range(4)] + [
        (i, [1.0 + 0.001 * i] * 64) for i in range(4, 8)
    ]
    # only ids 0 and 1 are < k seeds unless k=2
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    rep = clustering.kmeans_report(df, k=2, iters=2).collect()
    sizes = sorted(r["n_vecs"] for r in rep)
    assert sizes == [4, 4]
    assert all(r["sse"] >= 0 for r in rep)
    # determinism: second run is bit-identical
    rep2 = clustering.kmeans_report(df, k=2, iters=2).collect()
    assert sorted(map(tuple, rep)) == sorted(map(tuple, rep2))


def test_pq_encode_reconstruction_contract(spark):
    """Codebook vectors encode to themselves with SSE 0; other vectors get
    the code of their nearest codeword per subspace."""
    from streamsurfer_spark.operators import clustering

    # 8 codebook vectors far apart; vector 8 sits right next to vector 3
    rows = [(i, [float(i * 10)] * 64) for i in range(8)] + [(8, [30.002] * 64)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r for r in clustering.pq_encode(df).collect()}
    for i in range(8):
        assert got[i]["pq_code"] == ",".join([str(i)] * 8)
        assert got[i]["recon_sse"] == 0
    assert got[8]["pq_code"] == ",".join(["3"] * 8)
    # 30.002*1000 = 30002 vs codeword 30000: (2^2)*64 dims = 256 exact
    assert got[8]["recon_sse"] == 4 * 64


def test_epoch_plan_upsamples_small_domains(spark):
    """sqrt-share budgeting: a tiny domain earns >1 full epoch while the
    dominating domain gets <1; planned tokens never exceed target + one
    document (the hash tail is sub-document granular)."""
    from streamsurfer_spark.operators import sampling

    rows = [(i, "w " * 99 + "w", "big") for i in range(100)] + [
        (1000 + i, "w " * 99 + "w", "small") for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["source"]: r for r in sampling.epoch_plan(df, "source", "doc_id").collect()}
    assert got["small"]["full_epochs"] >= 1
    assert got["big"]["full_epochs"] <= 1
    for r in got.values():
        assert r["planned_tokens"] == r["full_epochs"] * r["n_tokens"] + r["tail_tokens"]
        assert r["target_tokens"] <= (100 + 4) * 100 * 3 // 2


def test_gopher_rules_branches(spark):
    """Each Gopher rule must fail on its own adversarial document while a
    clean one keeps — the fixture only exercises word-count/stopword
    failures (all-alpha lowercase words), so the mean-length, symbol, and
    alpha branches are proven here with constructed inputs."""
    from streamsurfer_spark.operators.text import gopher_quality_rules

    ok = "the quick brown foxes jumped over " * 5 + "of dogs and cats running fast"
    docs = spark.createDataFrame(
        [
            (1, ok),                                        # keeps
            (2, "the " + "supercalifragilistic " * 30),     # mean len > 10
            (3, ("the of " + "# " * 20 + "word " * 10)),    # symbols/words >= 1/10
            (4, "the of " + "123 456 789 " * 10),           # alpha ratio <= 4/5
            (5, "word " * 30),                              # < 2 stopword hits
            (6, "the of word"),                             # word count < 20
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r.asDict() for r in gopher_quality_rules(docs).collect()}
    assert got[1]["keep"]
    assert not got[2]["pass_mean_len"] and not got[2]["keep"]
    assert not got[3]["pass_symbol"] and not got[3]["keep"]
    assert not got[4]["pass_alpha"] and not got[4]["keep"]
    assert not got[5]["pass_stopwords"] and not got[5]["keep"]
    assert not got[6]["pass_word_count"] and not got[6]["keep"]
    # the non-targeted rules hold on each adversarial doc (isolation)
    assert got[5]["pass_word_count"] and got[5]["pass_mean_len"]
    assert got[6]["pass_stopwords"] is True


def test_cosine_dim_mismatch_fails_loudly(spark):
    """zip_with PADS the shorter array with NULLs, so a dimension mismatch
    used to aggregate a NULL dot and silently drop every pair through the
    threshold filter (r7 review). checked_dot must raise naming both
    widths instead."""
    import pytest
    from pyspark.errors import SparkRuntimeException

    from streamsurfer_spark.operators.similarity import cosine_near_dup_pairs

    df = spark.createDataFrame(
        [
            (1, 0, [1.0, 2.0, 3.0]),
            (2, 0, [1.0, 2.0]),  # 2-d vector in a 3-d corpus
        ],
        "vec_id long, label int, embedding array<double>",
    )
    with pytest.raises(SparkRuntimeException, match="dims differ.*3 vs 2"):
        cosine_near_dup_pairs(df, 0.5).collect()


def test_mixture_sample_keeps_null_stratum(spark):
    """A NULL stratum is a real domain (unlabeled docs): groupBy counts it,
    so the join back must be null-safe or the whole stratum silently
    contributes zero sampled rows (r7 review)."""
    import pyspark.sql.functions as F

    from streamsurfer_spark.operators.sampling import temperature_mixture_sample

    rows = [(i, None if i < 40 else "src1", "t") for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = temperature_mixture_sample(df, "source", "doc_id")
    by_stratum = {
        r["source"]: r["cnt"]
        for r in got.groupBy("source").agg(F.count("*").alias("cnt")).collect()
    }
    assert by_stratum.get(None, 0) > 0, "NULL stratum silently dropped"
    assert by_stratum.get("src1", 0) > 0


def test_assign_split_validates_and_rejects_null_ids(spark):
    """Individually invalid percentages must be rejected even when the sum
    validates (negative val_pct silently emptied the val split), and a
    NULL id must raise instead of defaulting to 'test' (r7 review)."""
    import pytest
    from pyspark.errors import SparkRuntimeException

    from streamsurfer_spark.operators.sampling import assign_split

    df = spark.createDataFrame([(1,), (2,)], "doc_id long")
    with pytest.raises(ValueError, match="non-negative"):
        assign_split(df, "doc_id", train_pct=95, val_pct=-5)
    with pytest.raises(ValueError, match="non-negative"):
        assign_split(df, "doc_id", train_pct=-10, val_pct=50)

    nulls = spark.createDataFrame([(1,), (None,)], "doc_id long")
    with pytest.raises(SparkRuntimeException, match="NULL id_col"):
        assign_split(nulls, "doc_id").collect()


def test_lsh_bands_rejects_short_signature(spark):
    """A signature shorter than N_BANDS*ROWS_PER_BAND used to make the
    out-of-range band slices EMPTY — every document got band_key '' and
    collided (r7 review). The band expression must raise instead."""
    import pyspark.sql.functions as F
    import pytest
    from pyspark.errors import SparkRuntimeException

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "g h i j k l")], "doc_id long, text string"
    )
    sig = dedup.minhash_signature(
        df.withColumn("toks", F.split(F.col("text"), " "))
    )
    assert dedup.lsh_bands(sig).count() == 2 * dedup.N_BANDS

    short = sig.withColumn("sig", F.slice("sig", 1, 4))
    with pytest.raises(SparkRuntimeException, match="signature length 4"):
        dedup.lsh_bands(short).collect()


def test_bm25_rejects_duplicate_terms(spark):
    """Repeated query terms silently collapsed to one contribution (and
    duplicate tf_{term} output columns) — reject loudly (r7 review)."""
    import pytest

    from streamsurfer_spark.operators.retrieval import bm25_topk

    df = spark.createDataFrame([(1, "data spark")], "doc_id long, text string")
    with pytest.raises(ValueError, match="distinct"):
        bm25_topk(df, ["data", "data"])


def test_bm25_match_filter_is_round_independent(spark):
    """The top-k filter keeps docs matching >=1 term, NOT score>0 on the
    ROUNDED score: a term present in nearly every doc has idf ~ 0.5/N, so
    genuine matches rounded to 0.0000 were silently dropped (r7 review)."""
    from streamsurfer_spark.operators.retrieval import bm25_topk

    # 3000 docs all containing 'common': idf = ln(1+0.5/3000.5) ~ 1.7e-4,
    # every per-doc score rounds to 0.0000 at 4 decimals
    rows = [(i, "common filler words here") for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = bm25_topk(df, ["common"], k=5).collect()
    assert len(got) == 5, "matching docs were dropped by the rounded filter"
    assert all(r.tf_common == 1 for r in got)


def test_profile_render_number_non_finite_and_width(spark):
    """render_number NULLs non-finite values (the bigint cast aborted the
    whole profile under ANSI) and pads to 19 digits (lpad TRUNCATES past
    the pad width, collapsing distinct 19-digit scaled values) — r7
    review, both verified by execution."""
    import math

    import pyspark.sql.functions as F

    from streamsurfer_spark.operators.profile import profile, render_number

    df = spark.createDataFrame(
        [(1.0,), (math.nan,), (math.inf,), (9.1e16,), (9.1e15,)], "x double"
    )
    got = profile(df, {"x": render_number("x")}).collect()[0]
    assert got.n_rows == 5 and got.n_nulls == 2  # NaN/Inf render NULL
    # 9.1e16*100 and 9.1e15*100 are 19 and 18 digits — distinct renderings
    assert got.n_distinct == 3


def test_pack_sequences_null_text_raises(spark):
    """A NULL text poisons every later offset in its packing domain with
    NaN (r7 review, verified) — fail naming the document."""
    import pytest
    from pyspark.errors import PythonException

    from streamsurfer_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(1, "en", "a b"), (2, "en", None)], "doc_id long, lang string, text string"
    )
    with pytest.raises(PythonException, match="NULL token count for doc_id 2"):
        pack_sequences(docs).collect()


def test_udtf_tokenize_null_matches_posexplode(spark):
    """The UDTF's documented equivalence to posexplode(split(...)) must
    hold on NULL text: zero rows, not a spurious (0, '') row (r7
    review)."""
    from streamsurfer_spark.operators.udx import TokenizeUDTF

    spark.udtf.register("tokenize_udtf", TokenizeUDTF)
    df = spark.createDataFrame([(1, "a b"), (2, None)], "doc_id long, text string")
    df.createOrReplaceTempView("udtf_null_docs")
    got = spark.sql(
        "SELECT d.doc_id, t.pos, t.token FROM udtf_null_docs d,"
        " LATERAL tokenize_udtf(d.text) t"
    ).collect()
    assert {r.doc_id for r in got} == {1}
    assert len(got) == 2


def test_multimodal_null_payload_raises_with_doc_id(spark):
    """bytes(None) died with an opaque TypeError mid-task; the guard names
    the offending document (r7 review)."""
    import pytest
    from pyspark.errors import PythonException

    df = spark.createDataFrame([(3, None)], "doc_id long, text string")
    with pytest.raises(PythonException, match="NULL payload for doc_id 3"):
        multimodal.extract_features(multimodal.as_media(df)).collect()
