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
