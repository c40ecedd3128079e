"""Bucketized interval join + TF-IDF keywords + PMI collocations."""

from __future__ import annotations

import datetime as dt
import math

from rabbit_in_a_blender_spark.ext.retrieval import tfidf_top_terms
from rabbit_in_a_blender_spark.ext.text import pmi_collocations
from rabbit_in_a_blender_spark.operators.interval import interval_join


def _ts(h, m=0, s=0):
    return dt.datetime(2024, 1, 1, h, m, s)


def _frames(spark):
    pts = spark.createDataFrame(
        [
            (1, "u1", _ts(10, 30)),
            (2, "u1", _ts(13, 0)),
            (3, "u2", _ts(10, 30)),   # right key, wrong window owner
            (4, "u1", _ts(11, 0)),    # exact right edge
            (5, "u1", _ts(10, 0)),    # exact left edge
        ],
        "pid int, user string, ts timestamp",
    )
    ivs = spark.createDataFrame(
        [
            (100, "u1", _ts(10, 0), _ts(11, 0)),
            (200, "u2", _ts(12, 0), _ts(14, 0)),
        ],
        "wid int, user string, w_start timestamp, w_end timestamp",
    )
    return pts, ivs


def test_interval_join_matches_and_edges(spark):
    pts, ivs = _frames(spark)
    out = {
        (r["pid"], r["wid"])
        for r in interval_join(
            pts, ivs, ["user"], "ts", "w_start", "w_end", bucket_seconds=1800
        ).collect()
    }
    # u1 window [10:00, 11:00] catches pids 1 (inside), 4 and 5 (edges);
    # pid 2 (13:00, u1) matches nothing; pid 3 is u2 but outside u2's window.
    assert out == {(1, 100), (4, 100), (5, 100)}


def test_interval_join_no_duplicate_pairs_across_buckets(spark):
    pts, ivs = _frames(spark)
    # A tiny bucket makes every interval span many buckets; each pair
    # must still appear exactly once (a point lives in ONE bucket).
    rows = interval_join(
        pts, ivs, ["user"], "ts", "w_start", "w_end", bucket_seconds=60
    ).collect()
    pairs = [(r["pid"], r["wid"]) for r in rows]
    assert sorted(pairs) == sorted(set(pairs)) and len(pairs) == 3


def test_interval_join_drops_inverted_intervals(spark):
    pts, _ = _frames(spark)
    bad = spark.createDataFrame(
        [(9, "u1", _ts(11, 0), _ts(10, 0))],
        "wid int, user string, w_start timestamp, w_end timestamp",
    )
    assert (
        interval_join(pts, bad, ["user"], "ts", "w_start", "w_end").count() == 0
    )


def test_tfidf_prefers_rare_terms(spark):
    docs = spark.createDataFrame(
        [
            (1, "shared shared unique1"),
            (2, "shared shared unique2"),
            (3, "shared shared unique3"),
        ],
        "doc_id int, text string",
    )
    out = tfidf_top_terms(docs, "doc_id", "text", k=1).collect()
    assert {(r["doc_id"], r["term"]) for r in out} == {
        (1, "unique1"), (2, "unique2"), (3, "unique3")
    }
    # tf=1, N=3, df=1 -> 1 * ln(4/2)
    assert abs(out[0]["tfidf"] - round(math.log(2.0), 4)) < 1e-9


def test_pmi_exact_value_and_thresholds(spark):
    text = "new york is the city and the new york fans love new york"
    docs = spark.createDataFrame(
        [(i, text) for i in range(3)], "doc_id int, text string"
    )
    out = {
        (r["word1"], r["word2"]): r for r in pmi_collocations(
            docs, "doc_id", "text", min_count=9, min_pmi=0.5
        ).collect()
    }
    # Only 'new york' reaches count 9 (12 bigrams/doc * 3 docs = 36 total;
    # C1(new .)=9, C(. york)=9) -> PMI = ln(9*36/81) = ln 4.
    assert set(out) == {("new", "york")}
    r = out[("new", "york")]
    assert r["pair_count"] == 9
    assert r["pmi"] == round(math.log(4.0), 4)
    # the PMI threshold alone filters too: 'the new' sits at ln 3 ~ 1.0986
    high_bar = {
        (r2["word1"], r2["word2"]) for r2 in pmi_collocations(
            docs, "doc_id", "text", min_count=3, min_pmi=1.2
        ).collect()
    }
    assert ("the", "new") not in high_bar and ("new", "york") in high_bar
