"""Hypothesis property tests for the round-3 operators.

Each property drives the Spark operator with small generated inputs and
compares against an independent brute-force Python model — catching edge
semantics (short docs, colliding timestamps, single-event users) that
fixture-based oracle tests can miss. max_examples is kept small because
every example is a real Spark job.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from streamsurfer_spark.operators import dedup, sessions

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),     # user_id
        st.integers(min_value=0, max_value=7200),  # seconds offset
    ),
    min_size=1,
    max_size=25,
)


@given(evs=events_strategy)
@settings(**_SETTINGS)
def test_sessionize_matches_bruteforce(spark, evs):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=off), uid, "click", 1.0, "{}")
        for i, (uid, off) in enumerate(evs)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    got = {
        r["event_id"]: r["session_id"]
        for r in sessions.sessionize(df, gap_seconds=600).collect()
    }
    # brute force: per user, sort by (ts, event_id), new session when gap > 600s
    expected = {}
    by_user: dict[int, list[tuple[dt.datetime, int]]] = {}
    for i, (uid, off) in enumerate(evs):
        by_user.setdefault(uid, []).append((base + dt.timedelta(seconds=off), i))
    for uid, items in by_user.items():
        items.sort()
        sid, prev = 0, None
        for ts, eid in items:
            if prev is None or (ts - prev).total_seconds() > 600:
                sid += 1
            expected[eid] = sid
            prev = ts
    assert got == expected


docs_strategy = st.lists(
    st.lists(
        st.sampled_from("abcd"), min_size=1, max_size=8
    ).map(lambda toks: " ".join(toks)),
    min_size=2,
    max_size=8,
)


@given(texts=docs_strategy)
@settings(**_SETTINGS)
def test_duplicate_span_coverage_matches_bruteforce(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["covered_tokens"])
        for r in dedup.duplicate_span_coverage(df).collect()
    }
    # brute force with the operator's shingle convention: docs shorter than
    # n contribute one truncated shingle (the whole text)
    n = dedup.SHINGLE_N
    shingles: dict[int, list[tuple[int, str]]] = {}
    for d, text in enumerate(texts):
        toks = text.split(" ")
        n_sh = max(len(toks) - (n - 1), 1)
        shingles[d] = [(i, " ".join(toks[i : i + n])) for i in range(n_sh)]
    owners: dict[str, set[int]] = {}
    for d, shs in shingles.items():
        for _, s in shs:
            owners.setdefault(s, set()).add(d)
    expected = {}
    for d, text in enumerate(texts):
        toks = text.split(" ")
        covered: set[int] = set()
        for pos, s in shingles[d]:
            if len(owners[s]) >= 2:
                covered.update(range(pos, min(pos + n, len(toks))))
        if covered:
            expected[d] = (len(toks), len(covered))
    assert got == expected


values_strategy = st.lists(
    st.integers(min_value=1, max_value=50000),  # cents
    min_size=1,
    max_size=40,
)


@given(cents=values_strategy)
@settings(**_SETTINGS)
def test_rolling_anomaly_matches_bruteforce(spark, cents):
    from streamsurfer_spark.queries.timeseries_q import qt08_rolling_anomaly

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i), 1, "click", c / 100.0, "{}")
        for i, c in enumerate(cents)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        got = [r["event_id"] for r in qt08_rolling_anomaly(spark, d).collect()]
    expected = []
    for i, x in enumerate(cents):
        win = cents[max(0, i - 20) : i]
        nw = len(win)
        if nw < 10:
            continue
        s, ss = sum(win), sum(v * v for v in win)
        if (nw * x - s) ** 2 > 9 * (nw * ss - s * s):
            expected.append(i)
    assert got == expected
