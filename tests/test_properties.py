"""Property-based tests (hypothesis) for the invariants the reference
only enforces operationally (SURVEY §5): sequence-assignment laws,
null-safe join semantics, and dedup idempotence.

Spark jobs are slow per-example, so examples are capped low and inputs
are generated as plain Python lists first.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rabbit_in_a_blender_spark.operators.dedup import dedup_keep_first
from rabbit_in_a_blender_spark.operators.joins import null_safe_join
from rabbit_in_a_blender_spark.operators.sequence import assign_ids

_SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

keys_strategy = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=6), min_size=1, max_size=40
)


@given(keys=keys_strategy, offset=st.integers(min_value=0, max_value=10**9))
@_SLOW
def test_assign_ids_is_dense_unique_and_order_preserving(spark, keys, offset):
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    out = assign_ids(df, ["k"], offset=offset, out_col="id", mode="scalable")
    rows = sorted((r["k"], r["id"]) for r in out.collect())
    n = len(keys)
    ids = [i for _, i in sorted(rows, key=lambda t: t[1])]
    # dense 1..n + offset, no gaps, no dupes
    assert ids == list(range(offset + 1, offset + n + 1))
    # id order == sort order of the key (ties broken arbitrarily but ids
    # for equal keys must be contiguous): k asc ⇒ id asc across distinct keys
    by_id = [k for k, _ in sorted(rows, key=lambda t: t[1])]
    assert by_id == sorted(by_id)


@given(keys=keys_strategy)
@_SLOW
def test_assign_ids_scalable_matches_strict(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    a = {
        (r["k"], r["id"])
        for r in assign_ids(df, ["k"], out_col="id", mode="scalable").collect()
    }
    b = {
        (r["k"], r["id"])
        for r in assign_ids(df, ["k"], out_col="id", mode="strict").collect()
    }
    # equal keys may permute within their tie range; compare id multisets
    # per key value (the reference's determinism contract is per sort key)
    def grouped(s):
        g = {}
        for k, i in s:
            g.setdefault(k, []).append(i)
        return {k: sorted(v) for k, v in g.items()}

    assert grouped(a) == grouped(b)


@given(
    left=st.lists(
        st.tuples(st.integers(0, 5), st.one_of(st.none(), st.integers(0, 3))),
        max_size=25,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 5), st.one_of(st.none(), st.integers(0, 3))),
        max_size=25,
    ),
)
@_SLOW
def test_null_safe_join_matches_python_semantics(spark, left, right):
    l = spark.createDataFrame(left or [(0, 0)], "k int, v int")
    r = spark.createDataFrame(right or [(0, 0)], "k int, v int")
    joined = null_safe_join(
        l, r.select("k", "v"), ["k", "v"], how="inner", null_safe_keys=["v"]
    )

    def nkey(t):  # None-safe sort key
        return tuple((x is None, 0 if x is None else x) for x in t)

    expect = sorted(
        (
            (lk, lv)
            for (lk, lv) in (left or [(0, 0)])
            for (rk, rv) in (right or [(0, 0)])
            if lk == rk and lv == rv  # None == None is True in Python, like <=>
        ),
        key=nkey,
    )
    assert sorted(((x[0], x[1]) for x in joined.collect()), key=nkey) == expect


@given(rows=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 100)), max_size=30))
@_SLOW
def test_dedup_keep_first_is_idempotent_and_minimal(spark, rows):
    df = spark.createDataFrame(rows or [(0, 0)], "k int, v int")
    once = dedup_keep_first(df, ["k"], order_by=[F.col("v")])
    twice = dedup_keep_first(once, ["k"], order_by=[F.col("v")])
    got_once = sorted((r["k"], r["v"]) for r in once.collect())
    got_twice = sorted((r["k"], r["v"]) for r in twice.collect())
    assert got_once == got_twice
    # exactly one row per key, and it's the minimum by order col
    data = rows or [(0, 0)]
    expect = sorted(
        (k, min(v for kk, v in data if kk == k)) for k in {k for k, _ in data}
    )
    assert got_once == expect


# --- sampling threshold laws (pure Python — no Spark per example) -----

from rabbit_in_a_blender_spark.ext.sampling import fraction_threshold


@given(f=st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_fraction_threshold_is_valid_hex_or_sentinel(f):
    t = fraction_threshold(f)
    if t == "g":
        assert f >= 1.0 or round(f * 16**8) >= 16**8
    else:
        assert len(t) == 8
        int(t, 16)  # parses as hex
        assert t == t.lower()


@given(
    a=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    b=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
@settings(max_examples=200, deadline=None)
def test_fraction_threshold_is_monotone(a, b):
    """a <= b ⇒ threshold(a) <= threshold(b) lexicographically — the law
    behind nested-sample subsets ('g' sorts above every hex digit)."""
    lo, hi = sorted((a, b))
    assert fraction_threshold(lo) <= fraction_threshold(hi)


@given(f=st.floats(min_value=0.0, max_value=0.999999, allow_nan=False))
@settings(max_examples=200, deadline=None)
def test_fraction_threshold_keeps_expected_mass(f):
    """The kept fraction of the hash space equals round(f * 16^8)/16^8
    exactly — thresholds never silently drift from the requested rate."""
    t = fraction_threshold(f)
    kept = int(t, 16) if t != "g" else 16**8
    assert kept == round(f * 16**8)


from rabbit_in_a_blender_spark.ext.budget import token_budget_select  # noqa: E402

tokens_strategy = st.lists(
    st.integers(min_value=1, max_value=500), min_size=1, max_size=40
)


@given(tokens=tokens_strategy, budget=st.integers(min_value=0, max_value=5_000))
@_SLOW
def test_token_budget_scalable_matches_strict(spark, tokens, budget):
    rows = [(i, t) for i, t in enumerate(tokens)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    order = [F.desc("n_tokens"), F.asc("doc_id")]
    a = sorted(
        (r["doc_id"], r["cum_tokens"])
        for r in token_budget_select(df, "n_tokens", budget, order).collect()
    )
    b = sorted(
        (r["doc_id"], r["cum_tokens"])
        for r in token_budget_select(
            df, "n_tokens", budget, order, mode="strict"
        ).collect()
    )
    assert a == b
    # greedy-prefix law: the kept set is exactly the maximal prefix of
    # the (tokens desc, id asc) order whose running total fits
    prefix, run = [], 0
    for i, t in sorted(enumerate(tokens), key=lambda p: (-p[1], p[0])):
        if run + t > budget:
            break
        run += t
        prefix.append(i)
    assert {d for d, _ in a} == set(prefix)
