"""Catalog rows for cross-document duplicate-passage detection/removal
(`ext/passages.py`) — the Lee-et-al-2022 exact-substring dedup pass a
training-data pipeline runs after document-level dedup.

Oracles replay the identical k-gram arithmetic in DuckDB (string_split
windows, md5 group, coverage explode, ordered rebuild) — all integer /
string exact, no rounding surface at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..core.io import load_tables
from ..ext.passages import (
    duplicate_passages,
    near_duplicate_passages,
    remove_duplicate_passages,
)
from .catalog import register

_K = 4
_GRAMS_SQL = f"""
      SELECT doc_id, i AS pos,
             md5(array_to_string(w[i+1 : i+{_K}], ' ')) AS gram_hash
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      CROSS JOIN LATERAL unnest(range(greatest(len(w) - {_K} + 1, 0))) t(i)
"""


@register(
    "ext_dup_passages",
    oracle=f"""
    WITH grams AS ({_GRAMS_SQL})
    SELECT gram_hash,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM grams GROUP BY gram_hash HAVING COUNT(*) >= 2
    """,
    doc="Corpus-wide duplicated k-gram inventory (k=4, >=2 occurrences): "
    "the survey a curation run reads before a passage-removal pass.",
)
def ext_dup_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    return duplicate_passages(d, "doc_id", "text", k=_K, min_total=2)


@register(
    "ext_dup_passage_removal",
    oracle=f"""
    WITH grams AS ({_GRAMS_SQL}),
    dup AS (
      SELECT gram_hash FROM grams GROUP BY gram_hash HAVING COUNT(*) >= 2
    ),
    covered AS (
      SELECT DISTINCT g.doc_id, g.pos + o.off AS pos
      FROM grams g
      JOIN dup USING (gram_hash)
      CROSS JOIN LATERAL unnest(range({_K})) o(off)
    ),
    words AS (
      SELECT doc_id, i AS pos, w[i+1] AS word
      FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
      CROSS JOIN LATERAL unnest(range(len(w))) t(i)
    ),
    surviving AS (
      SELECT w.doc_id, w.pos, w.word
      FROM words w ANTI JOIN covered c
        ON w.doc_id = c.doc_id AND w.pos = c.pos
    ),
    rebuilt AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS kept,
             string_agg(word, ' ' ORDER BY pos) AS text_clean
      FROM surviving GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_words,
           CAST(len(string_split(d.text, ' ')) - COALESCE(r.kept, 0)
                AS BIGINT) AS n_removed,
           COALESCE(r.text_clean, '') AS text_clean
    FROM documents d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
    """,
    doc="Exact repeated-substring removal (Lee et al. 2022 semantics via "
    "rolling word 4-grams): every word position covered by a corpus-"
    "duplicated 4-gram is cut, survivors re-join in order; a fully-"
    "boilerplate doc survives as '' so the accounting stays explicit.",
)
def ext_dup_passage_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    return remove_duplicate_passages(d, "doc_id", "text", k=_K, min_total=2)


# near-dup passage params: 16-word windows every 8, 3-gram shingles,
# 8 salted-md5 minhashes in 4 bands of 2, jaccard-verified at 0.35
_W, _S, _NK, _H, _RPB = 16, 8, 3, 8, 2


@register(
    "ext_dup_passages_lsh",
    oracle=f"""
    WITH wdocs AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
    wins AS (
      SELECT doc_id, i AS win_start, w[i+1 : i+{_W}] AS pw
      FROM wdocs CROSS JOIN LATERAL
        unnest(range(0, greatest(len(w) - {_W}, 0) + 1, {_S})) t(i)
    ),
    sh AS (
      SELECT DISTINCT doc_id, win_start,
             array_to_string(pw[j+1 : j+{_NK}], ' ') AS shingle
      FROM wins CROSS JOIN LATERAL
        unnest(range(greatest(len(pw) - {_NK}, 0) + 1)) s(j)
    ),
    hashes AS (
      SELECT doc_id, win_start, j,
             MIN(md5(CAST(j AS VARCHAR) || ':' || shingle)) AS mh
      FROM sh CROSS JOIN (SELECT unnest(range({_H})) AS j) js
      GROUP BY doc_id, win_start, j
    ),
    bands AS (
      SELECT doc_id, win_start, j // {_RPB} AS band_idx,
             md5(string_agg(mh, '|' ORDER BY j)) AS band_hash
      FROM hashes GROUP BY doc_id, win_start, j // {_RPB}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, a.win_start AS win_a,
                      b.doc_id AS id_b, b.win_start AS win_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, win_start, COUNT(*) AS sz FROM sh GROUP BY 1, 2),
    inter AS (
      SELECT c.id_a, c.win_a, c.id_b, c.win_b, COUNT(*) AS iv
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.id_a AND sa.win_start = c.win_a
      JOIN sh sb ON sb.doc_id = c.id_b AND sb.win_start = c.win_b
                AND sb.shingle = sa.shingle
      GROUP BY 1, 2, 3, 4
    )
    SELECT id_a, CAST(win_a AS BIGINT) AS win_a,
           id_b, CAST(win_b AS BIGINT) AS win_b,
           ROUND(iv / (sa.sz + sb.sz - iv), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a AND sa.win_start = win_a
    JOIN sizes sb ON sb.doc_id = id_b AND sb.win_start = win_b
    WHERE ROUND(iv / (sa.sz + sb.sz - iv), 4) >= 0.35
    """,
    doc="Cross-document NEAR-duplicate passage pairs: MinHash+LSH over "
    "16-word sliding windows (3-gram shingles, 8 hashes / 4 bands), "
    "jaccard-verified at 0.35 — catches the one-word edits the exact "
    "k-gram matcher (ext_dup_passages) misses; full deterministic "
    "md5 replay in DuckDB.",
)
def ext_dup_passages_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    return near_duplicate_passages(
        d, "doc_id", "text",
        window=_W, stride=_S, k=_NK, num_hashes=_H, bands=4, threshold=0.35,
    )
