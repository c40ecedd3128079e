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
    remove_near_duplicate_passages,
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


from .passages_helpers import LSH_PAIR_CTES, NK, THRESHOLD, H, S, W  # noqa: E402


@register(
    "ext_dup_passages_lsh",
    oracle=f"WITH {LSH_PAIR_CTES} SELECT * FROM pairsq",
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
        window=W, stride=S, k=NK, num_hashes=H, bands=4, threshold=THRESHOLD,
    )


@register(
    "ext_dup_passage_removal_lsh",
    oracle=f"""
    WITH {LSH_PAIR_CTES},
    covered AS (
      SELECT DISTINCT id_b AS doc_id, win_b + o.off AS pos
      FROM pairsq CROSS JOIN LATERAL unnest(range({W})) o(off)
    ),
    words AS (
      SELECT doc_id, i AS pos, w[i+1] AS word
      FROM wdocs CROSS JOIN LATERAL unnest(range(len(w))) t(i)
    ),
    surviving AS (
      SELECT wo.doc_id, wo.pos, wo.word
      FROM words wo ANTI JOIN covered c
        ON wo.doc_id = c.doc_id AND wo.pos = c.pos
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
    doc="Keep-first near-dup passage removal: every verified near-dup "
    "window occurrence in the higher-id document is cut (lower id is "
    "canonical, like exact dedup's min-id), survivors re-join in "
    "order; same deterministic md5 replay as ext_dup_passages_lsh "
    "extended with the coverage/rebuild CTEs.",
)
def ext_dup_passage_removal_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    return remove_near_duplicate_passages(
        d, "doc_id", "text",
        window=W, stride=S, k=NK, num_hashes=H, bands=4, threshold=THRESHOLD,
    )
