"""Shared DuckDB CTE chain for the MinHash-over-passage-windows rows
(`ext_dup_passages_lsh`, `ext_dup_passage_removal_lsh`): the whole
pipeline is deterministic salted-md5 arithmetic, so both oracles replay
it verbatim and diverge only in their final select."""

from __future__ import annotations

# near-dup passage params: 16-word windows every 8, 3-gram shingles,
# 8 salted-md5 minhashes in 4 bands of 2, jaccard-verified at 0.35
W, S, NK, H, RPB = 16, 8, 3, 8, 2
THRESHOLD = 0.35

LSH_PAIR_CTES = f"""
    wdocs AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
    -- window starts: the stride grid PLUS a clamped final start at
    -- len-window when unaligned, so trailing words are covered
    -- (ADVICE r9 tail gap; list_distinct collapses the aligned case)
    wins AS (
      SELECT doc_id, i AS win_start, w[i+1 : i+{W}] AS pw
      FROM wdocs CROSS JOIN LATERAL
        unnest(list_distinct(list_append(
          range(0, greatest(len(w) - {W}, 0) + 1, {S}),
          greatest(len(w) - {W}, 0)))) t(i)
    ),
    sh AS (
      SELECT DISTINCT doc_id, win_start,
             array_to_string(pw[j+1 : j+{NK}], ' ') AS shingle
      FROM wins CROSS JOIN LATERAL
        unnest(range(greatest(len(pw) - {NK}, 0) + 1)) s(j)
    ),
    hashes AS (
      SELECT doc_id, win_start, j,
             MIN(md5(CAST(j AS VARCHAR) || ':' || shingle)) AS mh
      FROM sh CROSS JOIN (SELECT unnest(range({H})) AS j) js
      GROUP BY doc_id, win_start, j
    ),
    bands AS (
      SELECT doc_id, win_start, j // {RPB} AS band_idx,
             md5(string_agg(mh, '|' ORDER BY j)) AS band_hash
      FROM hashes GROUP BY doc_id, win_start, j // {RPB}
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
    ),
    pairsq AS (
      SELECT id_a, CAST(win_a AS BIGINT) AS win_a,
             id_b, CAST(win_b AS BIGINT) AS win_b,
             ROUND(iv / (sa.sz + sb.sz - iv), 4) AS jaccard
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a AND sa.win_start = win_a
      JOIN sizes sb ON sb.doc_id = id_b AND sb.win_start = win_b
      WHERE ROUND(iv / (sa.sz + sb.sz - iv), 4) >= {THRESHOLD}
    )
"""
