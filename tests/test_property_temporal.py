"""Property-based laws for asof_join / scd2_history against pure-Python
oracles on randomized inputs — including NULL payload values (the
payload-tearing regression: per-column carry-forward once stitched
fields from different right rows when the winning row held a NULL)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from transforms_for_apache_kafka_connect_spark.functions import asof_join
from transforms_for_apache_kafka_connect_spark.streaming import scd2_history

KEYS = ["a", "b"]

# right rows: (key, time, px, qty) with nullable payload fields;
# unique (key, time) enforced by dict
right_rows = st.dictionaries(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 50)),
    st.tuples(
        st.one_of(st.none(), st.integers(-5, 5)),
        st.one_of(st.none(), st.integers(-5, 5)),
    ),
    min_size=0, max_size=12,
)
left_rows = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 50)),
    min_size=1, max_size=10,
)


def _oracle_backward(left, right):
    """Per-row scan oracle: the right row with max time <= t, WHOLE row."""
    out = []
    for k, t in left:
        cands = [(rt, v) for (rk, rt), v in right.items() if rk == k and rt <= t]
        if cands:
            rt, (px, qty) = max(cands)
            out.append((k, t, rt, px, qty))
        else:
            out.append((k, t, None, None, None))
    return sorted(out, key=str)


@settings(max_examples=12, deadline=None)
@given(left=left_rows, right=right_rows)
def test_asof_backward_matches_scan_oracle(spark, left, right):
    ldf = spark.createDataFrame(left, "k string, t long")
    rdf = spark.createDataFrame(
        [(k, t, px, qty) for (k, t), (px, qty) in right.items()]
        or [("zz", 0, 0, 0)],  # createDataFrame needs >=1 row; unused key
        "k string, t long, px long, qty long",
    )
    got = sorted(
        ((r.k, r.t, r.matched_t, r.px, r.qty)
         for r in asof_join(ldf, rdf, on=["k"], left_time="t",
                            right_time="t").collect()),
        key=str,
    )
    assert got == _oracle_backward(left, right)


@settings(max_examples=8, deadline=None)
@given(left=left_rows, right=right_rows, tol=st.integers(0, 10))
def test_asof_tolerance_is_whole_row(spark, left, right, tol):
    """Tolerance nulls matched_t AND every payload field together."""
    ldf = spark.createDataFrame(left, "k string, t long")
    rdf = spark.createDataFrame(
        [(k, t, px, qty) for (k, t), (px, qty) in right.items()]
        or [("zz", 0, 0, 0)],
        "k string, t long, px long, qty long",
    )
    rows = asof_join(ldf, rdf, on=["k"], left_time="t", right_time="t",
                     tolerance=tol).collect()
    assert len(rows) == len(left)  # left semantics: no row loss
    oracle = {}
    for k, t, rt, px, qty in _oracle_backward(left, right):
        oracle.setdefault((k, t), []).append(
            (rt, px, qty) if rt is not None and t - rt <= tol
            else (None, None, None)
        )
    for r in rows:
        assert (r.matched_t, r.px, r.qty) in oracle[(r.k, r.t)]


changelog_rows = st.lists(
    st.tuples(
        st.sampled_from(KEYS),
        st.sampled_from(["u", "d"]),
        st.integers(-5, 5),
    ),
    min_size=1, max_size=14,
)


@settings(max_examples=12, deadline=None)
@given(events=changelog_rows)
def test_scd2_laws(spark, events):
    """Interval laws on random changelogs (lsn = list position):
    per key, surviving versions' [valid_from, valid_to) are disjoint,
    ordered, and every boundary is an event position; is_current
    matches LWW liveness."""
    rows = [(k, i, op, float(v)) for i, (k, op, v) in enumerate(events)]
    df = spark.createDataFrame(rows, "k string, lsn long, op string, v double")
    hist = sorted(
        (r.k, r.valid_from, r.valid_to, r.version, r.is_current)
        for r in scd2_history(df, ["k"], "lsn", op_col="op").collect()
    )
    by_key: dict = {}
    for k, vf, vt, ver, cur in hist:
        by_key.setdefault(k, []).append((vf, vt, ver, cur))
    all_lsns = {i for i, _ in enumerate(events)}
    for k, versions in by_key.items():
        versions.sort()
        key_events = [(i, op) for i, (kk, op, _) in enumerate(events) if kk == k]
        for j, (vf, vt, ver, cur) in enumerate(versions):
            assert vf in all_lsns
            assert events[vf][0] == k and events[vf][1] == "u"
            assert cur == (vt is None)
            if vt is not None:
                assert vt > vf and events[vt][0] == k
            if j + 1 < len(versions):
                assert vt is not None and vt <= versions[j + 1][0]
        # liveness: key is current iff its LAST event is an upsert
        last_op = key_events[-1][1]
        n_current = sum(1 for *_x, cur in versions if cur)
        assert n_current == (1 if last_op == "u" else 0)
    # every upsert event produced exactly one version row
    n_upserts = sum(1 for _, op, _ in events if op == "u")
    assert len(hist) == n_upserts


# ----------------------------------------------------- sessionize laws

from transforms_for_apache_kafka_connect_spark.functions import sessionize  # noqa: E402

GAP = 10

sess_events = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 120)),
    min_size=1, max_size=25,
)


def _sessions_oracle(events):
    """Pure-Python gap sessionization: per group, sort by (t, eid);
    break when t - prev_t > GAP."""
    out = {}
    by_g = {}
    for eid, (g, t) in enumerate(events):
        by_g.setdefault(g, []).append((t, eid))
    for g, rows in by_g.items():
        rows.sort()
        idx, start, prev = -1, None, None
        for t, eid in rows:
            if prev is None or t - prev > GAP:
                idx, start = idx + 1, t
            prev = t
            out[eid] = (idx, start)
    return out


@settings(max_examples=25, deadline=None)
@given(sess_events)
def test_sessionize_matches_scan_oracle(spark, events):
    df = spark.createDataFrame(
        [(g, t, i) for i, (g, t) in enumerate(events)],
        "g string, t long, eid long",
    )
    got = {
        r["eid"]: (r["session_index"], r["session_start_ms"])
        for r in sessionize(
            df, group_cols=["g"], time_col="t", gap=GAP,
            order_cols=["eid"],
        ).collect()
    }
    assert got == _sessions_oracle(events)


@settings(max_examples=15, deadline=None)
@given(sess_events)
def test_sessionize_laws(spark, events):
    """Structural laws: labels PARTITION each group's events into
    contiguous time runs — consecutive events inside one session are
    <= GAP apart, the first event of session k+1 is > GAP after the
    last of session k, indexes are dense from 0, and session_start is
    the session's min time."""
    df = spark.createDataFrame(
        [(g, t, i) for i, (g, t) in enumerate(events)],
        "g string, t long, eid long",
    )
    rows = sessionize(
        df, group_cols=["g"], time_col="t", gap=GAP, order_cols=["eid"]
    ).collect()
    by_g = {}
    for r in rows:
        by_g.setdefault(r["g"], []).append(r)
    for g, rs in by_g.items():
        rs.sort(key=lambda r: (r["t"], r["eid"]))
        sess = {}
        for r in rs:
            sess.setdefault(r["session_index"], []).append(r)
        assert sorted(sess) == list(range(len(sess)))
        prev_last = None
        for k in sorted(sess):
            ts = [r["t"] for r in sess[k]]
            assert all(b - a <= GAP for a, b in zip(ts, ts[1:]))
            assert all(r["session_start_ms"] == min(ts) for r in sess[k])
            if prev_last is not None:
                assert ts[0] - prev_last > GAP
            prev_last = ts[-1]
