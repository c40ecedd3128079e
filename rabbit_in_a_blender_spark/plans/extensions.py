"""Extension-operator queries (SURVEY §2.N): dedup, similarity search,
text analysis, JSON props — over the documents/embeddings/events tables.

Oracles express the SAME algorithm in DuckDB SQL (md5-based hashing and
explicit arithmetic keep both engines bit-comparable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core.io import load_tables
from ..ext.dedup import (
    exact_dedup_groups,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingle_sets,
)
from ..ext.similarity import cosine_topk_arrow
from ..ext.text import LANG_MARKERS, doc_fingerprint, langid_heuristic, text_stats, token_counts
from .catalog import register

# Shared DuckDB fragment: distinct word-3-gram shingles per document.
_SHINGLES_SQL = """
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(0, greatest(len(string_split(text, ' ')) - 3, 0) + 1),
           i -> array_to_string(string_split(text, ' ')[i+1:i+3], ' ')
         ))) AS shingle
  FROM documents
"""


@register(
    "ext_dedup_exact",
    oracle="""
    SELECT md5(text) AS text_hash,
           CAST(MIN(doc_id) AS BIGINT) AS canonical_id,
           CAST(COUNT(*) AS BIGINT)    AS dup_count
    FROM documents GROUP BY md5(text)
    """,
)
def ext_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    g = exact_dedup_groups(d, "doc_id", "text")
    return g.select(
        "text_hash",
        F.col("canonical_id").cast("long").alias("canonical_id"),
        F.col("dup_count").cast("long").alias("dup_count"),
    )


@register(
    "ext_dedup_ngram_jaccard",
    oracle=f"""
    WITH sh AS ({_SHINGLES_SQL}),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter_size
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           ROUND(inter_size / (sa.sz + sb.sz - inter_size), 4) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE ROUND(inter_size / (sa.sz + sb.sz - inter_size), 4) >= 0.05
    """,
)
def ext_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """exact=True opts into the all-shared-shingle oracle baseline the
    DuckDB side computes; the DEFAULT ngram_jaccard_pairs path derives
    MinHash-LSH candidates first (the composed pipeline is oracle-proven
    by ext_dedup_pipeline)."""
    d = load_tables(spark, sf_dir, "documents")["documents"]
    return ngram_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.05, exact=True)


@register(
    "ext_dedup_minhash_lsh",
    oracle=f"""
    WITH sh AS ({_SHINGLES_SQL}),
    hashes AS (
      SELECT doc_id, j,
             MIN(md5(CAST(j AS VARCHAR) || ':' || shingle)) AS mh
      FROM sh CROSS JOIN (SELECT unnest(range(16)) AS j) js
      GROUP BY doc_id, j
    ),
    bands AS (
      SELECT doc_id, j // 4 AS band_idx,
             md5(string_agg(mh, '|' ORDER BY j)) AS band_hash
      FROM hashes GROUP BY doc_id, j // 4
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a
    JOIN bands b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
               AND a.doc_id < b.doc_id
    """,
    doc="MinHash(16 salted md5 mins) + LSH(4 bands of 4) candidate pairs.",
)
def ext_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    sh = shingle_sets(d, "doc_id", "text", n=3)
    sig = minhash_signatures(sh, "doc_id", num_hashes=16)
    return lsh_candidate_pairs(sig, "doc_id", num_hashes=16, bands=4)


@register(
    "ext_embed_cosine_topk",
    oracle="""
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 10
    ), c AS (
      SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings
    )
    SELECT query_id, neighbor_id,
           ROUND(list_dot_product(cv, qv)
                 / (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(qv, qv))),
                 4) AS cosine
    FROM c CROSS JOIN q
    WHERE neighbor_id <> query_id
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY query_id
      ORDER BY ROUND(list_dot_product(cv, qv)
                 / (sqrt(list_dot_product(cv, cv)) * sqrt(list_dot_product(qv, qv))),
                 4) DESC, neighbor_id
    ) <= 3
    """,
    doc="Brute-force exact cosine top-3 for query vectors vec_id<10 — "
    "the Arrow/BLAS formulation (one normalized matmul per Arrow batch, "
    "per-partition partial top-k): measured 1.7x/5.0x/9.2x faster than "
    "the JVM zip_with fold at 2k/10k/20k vectors and flat as the corpus "
    "grows (tools/scale_curve.py SPARK_GRAFT_SCALE_ONLY=brute); output "
    "pytest-identical to cosine_topk, which stays as the no-Python "
    "reference formulation.",
)
def ext_embed_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    return cosine_topk_arrow(
        e, e.filter(F.col("vec_id") < 10), "vec_id", "embedding", k=3
    )


@register(
    "ext_text_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
           ROUND((length(text) - (len(string_split(text, ' ')) - 1))
                 / len(string_split(text, ' ')), 4) AS avg_word_len,
           ROUND(len(list_filter(string_split(text, ' '), w -> length(w) <= 3))
                 / len(string_split(text, ' ')), 4) AS short_word_ratio
    FROM documents
    """,
)
def ext_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    return text_stats(d, "doc_id", "text")


@register(
    "ext_token_count",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT)            AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_alnum_tokens
    FROM documents
    """,
)
def ext_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    return token_counts(d, "doc_id", "text")


def _langid_oracle() -> str:
    hit_cols = []
    for lang, markers in sorted(LANG_MARKERS.items()):
        lst = ", ".join(f"'{m}'" for m in markers)
        hit_cols.append(
            f"CAST(len(list_filter(string_split(text, ' '), "
            f"w -> list_contains([{lst}], w))) AS BIGINT) AS h_{lang}"
        )
    langs_desc = sorted(LANG_MARKERS, reverse=True)
    mx = "greatest(" + ", ".join(f"h_{lang}" for lang in sorted(LANG_MARKERS)) + ")"
    case = f"CASE WHEN {mx} = 0 THEN 'und' "
    for lang in langs_desc[:-1]:
        case += f"WHEN h_{lang} = {mx} THEN '{lang}' "
    case += f"ELSE '{langs_desc[-1]}' END"
    return f"""
    WITH sc AS (SELECT doc_id, {", ".join(hit_cols)} FROM documents)
    SELECT doc_id, {case} AS predicted_lang, {mx} AS marker_hits FROM sc
    """


@register("ext_langid", oracle=_langid_oracle())
def ext_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    return langid_heuristic(d, "doc_id", "text")


@register(
    "ext_text_normalize",
    oracle="""
    WITH n AS (
      SELECT doc_id, text,
             nfc_normalize(trim(regexp_replace(
               regexp_replace(text, '[\\x00-\\x08\\x0B-\\x1F\\x7F]', '', 'g'),
               '\\s+', ' ', 'g'))) AS text_norm
      FROM documents
    )
    SELECT doc_id, text_norm,
           CAST(length(text) AS BIGINT)      AS n_chars_raw,
           CAST(length(text_norm) AS BIGINT) AS n_chars_norm,
           text_norm <> text                 AS changed
    FROM n
    """,
    doc="Canonical text cleanup (C4/Gopher normalize stage): C0 control "
    "strip + whitespace collapse + trim as JVM regexes, Unicode NFC as "
    "one Arrow-batched pandas_udf (no Spark SQL builtin) — DuckDB's "
    "nfc_normalize implements the identical normal form, so the whole "
    "stage is hash-gated; unicode behavior (combining accents, NBSP, "
    "control bytes) is pinned in tests/test_ext.py.",
)
def ext_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.text import normalize_text

    d = load_tables(spark, sf_dir, "documents")["documents"]
    return normalize_text(d, "doc_id", "text")


def _langid_ngram_oracle(
    top_n: int = 100, max_n: int = 3, max_chars: int = 512
) -> str:
    """Full DuckDB replay of langid_ngram (VERDICT r7 task 7): the
    Cavnar-Trenkle rank profiles embed as literal VALUES, the per-doc
    char-n-gram ranking and the out-of-place distance are pure integer
    arithmetic, so the upgraded classifier hash-matches exactly."""
    from ..ext.text import langid_profiles

    profiles = langid_profiles(top_n=top_n, max_n=max_n)
    rows = []
    for lang in sorted(profiles):
        for g, r in sorted(profiles[lang].items()):
            esc = g.replace("'", "''")
            rows.append(f"('{lang}', '{esc}', {r})")
    gram_parts = [
        f"list_transform(range(1, greatest(length(s) - {n} + 2, 1)), "
        f"i -> substring(s, i, {n}))"
        for n in range(1, max_n + 1)
    ]
    return f"""
    WITH prof(lang, g, lrank) AS (VALUES {", ".join(rows)}),
    langs AS (SELECT DISTINCT lang FROM prof),
    t AS (SELECT doc_id,
                 substring(replace(lower(text), ' ', '_'), 1, {max_chars}) AS s
          FROM documents),
    grams AS (
      SELECT doc_id, unnest({" || ".join(gram_parts)}) AS g FROM t
    ),
    counts AS (SELECT doc_id, g, COUNT(*) AS n FROM grams GROUP BY doc_id, g),
    docprof AS (
      SELECT doc_id, g, drank FROM (
        SELECT doc_id, g,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY n DESC, g) AS drank
        FROM counts
      ) WHERE drank <= {top_n}
    ),
    dists AS (
      SELECT d.doc_id, l.lang,
             SUM(COALESCE(abs(d.drank - p.lrank), {top_n})) AS dist
      FROM docprof d CROSS JOIN langs l
      LEFT JOIN prof p ON p.lang = l.lang AND p.g = d.g
      GROUP BY d.doc_id, l.lang
    ),
    best AS (
      SELECT doc_id, lang, dist FROM (
        SELECT doc_id, lang, dist,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY dist, lang) AS rn
        FROM dists
      ) WHERE rn = 1
    )
    SELECT doc.doc_id,
           COALESCE(b.lang, 'und') AS predicted_lang,
           CAST(COALESCE(b.dist, -1) AS BIGINT) AS oop_distance
    FROM documents doc LEFT JOIN best b ON b.doc_id = doc.doc_id
    """


@register(
    "ext_langid_ngram",
    oracle=_langid_ngram_oracle(),
    doc="Char-n-gram language ID (Cavnar-Trenkle out-of-place distance "
    "against embedded rank profiles) — the accuracy upgrade over the "
    "marker-word heuristic (VERDICT r7 task 7), integer-exact under a "
    "full-replay oracle; the accuracy A/B vs the heuristic is pinned "
    "in tests/test_ext.py.",
)
def ext_langid_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.text import langid_ngram

    d = load_tables(spark, sf_dir, "documents")["documents"]
    return langid_ngram(d, "doc_id", "text")


@register(
    "ext_fingerprint",
    oracle="""
    SELECT doc_id,
           list_aggregate(list_transform(
             range(0, greatest(len(string_split(text, ' ')) - 4, 0) + 1),
             i -> md5(array_to_string(string_split(text, ' ')[i+1:i+4], ' '))
           ), 'min') AS fingerprint
    FROM documents
    """,
)
def ext_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    return doc_fingerprint(d, "doc_id", "text", n=4)


@register(
    "ext_json_props",
    oracle="""
    SELECT event_id,
           CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) AS k_val
    FROM events
    """,
    doc="JSON property extraction from the events.props string column.",
)
def ext_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_tables(spark, sf_dir, "events")["events"]
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
    )


def _simhash_oracle(bits: int = 64) -> str:
    sums, chars = [], []
    for b in range(bits):
        pos = b // 4 + 1
        shift = 3 - b % 4
        sums.append(
            f"SUM(CASE WHEN ((strpos('0123456789abcdef', substr(h, {pos}, 1)) - 1 "
            f">> {shift}) & 1) = 1 THEN 1 ELSE -1 END) AS s{b}"
        )
        chars.append(f"CASE WHEN s{b} > 0 THEN '1' ELSE '0' END")
    return f"""
    WITH toks AS (
      SELECT DISTINCT doc_id,
             unnest(list_distinct(string_split(text, ' '))) AS tok
      FROM documents
    ), th AS (
      SELECT doc_id, substr(md5(tok), 1, {bits // 4}) AS h FROM toks
    ), sums AS (
      SELECT doc_id, {", ".join(sums)} FROM th GROUP BY doc_id
    )
    SELECT doc_id, concat({", ".join(chars)}) AS simhash FROM sums
    """


@register("ext_simhash", oracle=_simhash_oracle())
def ext_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.simhash import simhash

    d = load_tables(spark, sf_dir, "documents")["documents"]
    return simhash(d, "doc_id", "text")


_COS6 = (
    "ROUND(list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) "
    "* sqrt(list_dot_product({b}, {b}))), 6)"
)
_COS4 = (
    "ROUND(list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a})) "
    "* sqrt(list_dot_product({b}, {b}))), 4)"
)


def _ivf_oracle(c: int = 16, nq: int = 10, k: int = 3, nprobe: int = 4) -> str:
    """Full DuckDB replay of ivf_search (VERDICT r7 task 3): the whole
    pipeline is deterministic (seed centroids = vec_id < c, rounded-
    cosine argmax assignment with min-id ties, rounded-cosine probe
    ranking, exact rerank), so the approximate search earns a hash gate
    instead of a recall bound — the same upgrade the k-means rows got."""
    acos = _COS6.format(a="e.v", b="c.cv")
    pcos = _COS6.format(a="q.v", b="c.cv")
    scos = _COS4.format(a="e.v", b="q.v")
    return f"""
    WITH vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cents AS (
      SELECT vec_id AS cid, embedding::DOUBLE[] AS cv
      FROM embeddings WHERE vec_id < {c}
    ),
    assign AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {acos} DESC, c.cid) AS rn
        FROM vecs e, cents c
      ) WHERE rn = 1
    ),
    probes AS (
      SELECT query_id, cid FROM (
        SELECT q.vec_id AS query_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY {pcos} DESC, c.cid) AS rn
        FROM vecs q, cents c WHERE q.vec_id < {nq}
      ) WHERE rn <= {nprobe}
    ),
    scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id, {scos} AS cosine
      FROM probes p
      JOIN assign a ON a.cid = p.cid
      JOIN vecs e ON e.vec_id = a.vec_id
      JOIN vecs q ON q.vec_id = p.query_id
      WHERE a.vec_id <> p.query_id
    )
    SELECT query_id, neighbor_id, cosine FROM (
      SELECT query_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rn
      FROM scored
    ) WHERE rn <= {k}
    """


@register(
    "ext_ivf_topk",
    oracle=_ivf_oracle(),
    doc="IVF-Flat ANN: 16 coarse centroids, nprobe=4, exact rerank — "
    "under a full-replay hash oracle (deterministic seed centroids + "
    "rounded-cosine assignment/probing make the 'approximate' search "
    "exactly reproducible in SQL); recall vs brute force is separately "
    "asserted in tests/test_ivf.py.",
)
def ext_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.ivf import build_ivf_index, ivf_search

    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    centroids = e.filter(F.col("vec_id") < 16)
    index = build_ivf_index(e, centroids)
    queries = e.filter(F.col("vec_id") < 10)
    return ivf_search(index, centroids, queries, k=3, nprobe=4)


def _pq_oracle(
    m: int = 16,
    ksub: int = 32,
    iterations: int = 2,
    nq: int = 10,
    k: int = 3,
    shortlist: int = 32,
    dsub: int = 4,
    grid: int = 6,
    ivf_c: int | None = None,
    nprobe: int = 8,
) -> str:
    """Unrolled DuckDB replay of the PQ / IVFADC search (VERDICT r7
    task 3): with the codebook means on the decimal grid (the k-means
    recipe, now a ``grid`` option of train_pq_codebooks) the whole
    pipeline — L2 normalize, per-subspace Lloyd training, encoding, ADC
    shortlist, exact re-rank, plus IVF cell assignment/probing when
    ``ivf_c`` is set — is engine-reproducible, so the 'approximate'
    searches earn hash gates.  Recall bounds stay in tests/test_pq.py /
    test_ivfpq.py."""
    l2dist = (
        "ROUND(list_sum(list_transform(list_zip(t.sv, b.cv), "
        "p -> (p[1]-p[2])*(p[1]-p[2]))), 9)"
    )
    parts = [
        "vraw AS (SELECT vec_id, embedding::DOUBLE[] AS v0 FROM embeddings)",
        "vecs AS (SELECT vec_id, list_transform(v0, x -> x / "
        "(CASE WHEN sqrt(list_dot_product(v0, v0)) = 0 THEN 1.0 "
        "ELSE sqrt(list_dot_product(v0, v0)) END)) AS v FROM vraw)",
        f"subs AS (SELECT vec_id, s, v[s*{dsub}+1 : s*{dsub}+{dsub}] AS sv "
        f"FROM vecs, (SELECT unnest(range({m})) AS s) ss)",
        f"books0 AS (SELECT s AS sub_idx, "
        f"ROW_NUMBER() OVER (PARTITION BY s ORDER BY vec_id) - 1 AS code, "
        f"sv AS cv FROM subs WHERE vec_id IN "
        f"(SELECT vec_id FROM vecs ORDER BY vec_id LIMIT {ksub}))",
    ]
    for it in range(iterations):
        parts.append(
            f"a{it} AS (SELECT t.vec_id, t.s, t.sv, b.code, "
            f"ROW_NUMBER() OVER (PARTITION BY t.vec_id, t.s "
            f"ORDER BY {l2dist} ASC, b.code) AS rn "
            f"FROM subs t JOIN books{it} b ON b.sub_idx = t.s)"
        )
        parts.append(
            f"m{it} AS (SELECT s AS sub_idx, code, pos, "
            f"ROUND(AVG(val), {grid}) AS mv FROM ("
            f"SELECT s, code, unnest(sv) AS val, "
            f"unnest(range(len(sv))) AS pos FROM a{it} WHERE rn = 1"
            f") GROUP BY s, code, pos)"
        )
        parts.append(
            f"books{it + 1} AS (SELECT sub_idx, code, "
            f"list(mv ORDER BY pos) AS cv FROM m{it} GROUP BY sub_idx, code)"
        )
    bk = f"books{iterations}"
    parts.append(
        f"enc AS (SELECT vec_id, s, code FROM ("
        f"SELECT t.vec_id, t.s, b.code, "
        f"ROW_NUMBER() OVER (PARTITION BY t.vec_id, t.s "
        f"ORDER BY {l2dist} ASC, b.code) AS rn "
        f"FROM subs t JOIN {bk} b ON b.sub_idx = t.s) WHERE rn = 1)"
    )
    parts.append(
        f"qsubs AS (SELECT vec_id AS query_id, s, sv AS qv "
        f"FROM subs WHERE vec_id < {nq})"
    )
    if ivf_c is not None:
        acos = _COS6.format(a="e.v", b="c.cv")
        pcos = _COS6.format(a="q.v", b="c.cv")
        parts.append(
            f"cents AS (SELECT vec_id AS cid, v AS cv FROM vecs "
            f"WHERE vec_id < {ivf_c})"
        )
        parts.append(
            f"cellassign AS (SELECT vec_id, cid FROM ("
            f"SELECT e.vec_id, c.cid, "
            f"ROW_NUMBER() OVER (PARTITION BY e.vec_id "
            f"ORDER BY {acos} DESC, c.cid) AS rn "
            f"FROM vecs e, cents c) WHERE rn = 1)"
        )
        parts.append(
            f"probes AS (SELECT query_id, cid FROM ("
            f"SELECT q.vec_id AS query_id, c.cid, "
            f"ROW_NUMBER() OVER (PARTITION BY q.vec_id "
            f"ORDER BY {pcos} DESC, c.cid) AS rn "
            f"FROM vecs q, cents c WHERE q.vec_id < {nq}) "
            f"WHERE rn <= {nprobe})"
        )
        cand_join = (
            " JOIN cellassign ca ON ca.vec_id = e.vec_id"
            " JOIN probes p ON p.cid = ca.cid AND p.query_id = q.query_id"
        )
    else:
        cand_join = ""
    parts.append(
        f"scores AS (SELECT q.query_id, e.vec_id AS neighbor_id, "
        f"ROUND(SUM(list_dot_product(q.qv, b.cv)), 4) AS score "
        f"FROM enc e JOIN {bk} b ON b.sub_idx = e.s AND b.code = e.code "
        f"JOIN qsubs q ON q.s = e.s{cand_join} "
        f"WHERE e.vec_id <> q.query_id GROUP BY q.query_id, e.vec_id)"
    )
    parts.append(
        f"short AS (SELECT query_id, neighbor_id FROM ("
        f"SELECT query_id, neighbor_id, "
        f"ROW_NUMBER() OVER (PARTITION BY query_id "
        f"ORDER BY score DESC, neighbor_id) AS rn FROM scores) "
        f"WHERE rn <= {shortlist})"
    )
    rcos = _COS4.format(a="x.v", b="y.v")
    parts.append(
        f"rer AS (SELECT s.query_id, s.neighbor_id, {rcos} AS cosine "
        f"FROM short s JOIN vecs x ON x.vec_id = s.neighbor_id "
        f"JOIN vecs y ON y.vec_id = s.query_id)"
    )
    return f"""
    WITH {", ".join(parts)}
    SELECT query_id, neighbor_id, cosine FROM (
      SELECT query_id, neighbor_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine DESC, neighbor_id) AS rn
      FROM rer
    ) WHERE rn <= {k}
    """


@register(
    "ext_pq_topk",
    oracle=_pq_oracle(),
    doc="Product-quantization ANN: m=16 subspaces x ksub=32 codes, "
    "2 grid-rounded Lloyd rounds, ADC shortlist-32 + exact cosine "
    "re-rank (16x vector compression at d=64) — under a full-replay "
    "hash oracle (see _pq_oracle); ADC losslessness and recall stay "
    "asserted in tests/test_pq.py.",
)
def ext_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.pq import (
        l2_normalize,
        pq_encode,
        pq_search_rerank,
        train_pq_codebooks,
    )

    e = l2_normalize(
        load_tables(spark, sf_dir, "embeddings")["embeddings"], "embedding"
    )
    # Pin the trained books: they are consumed by both the encode and
    # the query-LUT sides, and without the pin the 2-round Lloyd
    # training lineage re-executes per consumer (measured ~2.5x on the
    # search at sf0.1, PLANS.md r9).  m x ksub rows — metadata at any
    # scale; released via the track_cache contract.
    books = train_pq_codebooks(e, m=16, ksub=32, iterations=2, grid=6).persist()
    codes = pq_encode(e, books, m=16)
    queries = e.filter(F.col("vec_id") < 10)
    out = pq_search_rerank(codes, books, e, queries, m=16, k=3, shortlist=32)
    from ..core.caching import track_cache

    return track_cache(out, [books])


@register(
    "ext_ivfpq_topk",
    oracle=_pq_oracle(ivf_c=16, nprobe=8),
    doc="IVFADC ANN: 16 coarse cells x (m=16, ksub=32) PQ codes, "
    "nprobe=8 probe-bounded ADC shortlist-32 + exact cosine re-rank — "
    "the composed 100 TB search shape (VERDICT r5 task 1), under a "
    "full-replay hash oracle; probe-boundedness of the ADC scan stays "
    "proven in tests/test_ivfpq.py.",
)
def ext_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.ivfpq import build_ivfpq_index, ivfpq_search
    from ..ext.pq import l2_normalize, train_pq_codebooks

    e = l2_normalize(
        load_tables(spark, sf_dir, "embeddings")["embeddings"], "embedding"
    )
    centroids = e.filter(F.col("vec_id") < 16)
    # books pin: see ext_pq_topk — Lloyd lineage otherwise re-executes
    # for the encode AND the ADC-LUT consumers
    books = train_pq_codebooks(e, m=16, ksub=32, iterations=2, grid=6).persist()
    index = build_ivfpq_index(e, centroids, books, m=16)
    queries = e.filter(F.col("vec_id") < 10)
    out = ivfpq_search(
        index, centroids, books, e, queries, m=16, k=3, nprobe=8, shortlist=32
    )
    from ..core.caching import track_cache

    return track_cache(out, [books])


@register(
    "ext_media_features",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CAST(8 + doc_id % 16 AS DOUBLE) AS width_px,
           CAST(8 + doc_id % 8 AS DOUBLE) AS height_px,
           ROUND(((doc_id * 37) % 256) / 255.0, 6) AS mean_r,
           ROUND(((doc_id * 37) % 256) / 255.0, 6) AS mean_g,
           ROUND(((doc_id * 37) % 256) / 255.0, 6) AS mean_b,
           CAST(0.0 AS DOUBLE) AS gray_std
    FROM documents WHERE doc_id % 8 = 0
    """,
    doc="The REAL image-decode path under the hash gate (the byte-count "
    "row ext_multimodal_features only proves plumbing): synth_media's "
    "solid-color PNGs (doc_id %% 8 = 0; the %% 8 = 4 images are "
    "progressive JPEGs whose decode is lossy-exact only for DC) have "
    "closed-form per-channel means ((id*37)%256 over 255) and zero "
    "gray deviation, so extract_features' actual PNG inflate -> "
    "unfilter -> channel-mean pipeline is checked value-by-value.  "
    "Feature floats re-rounded after the float32 array round-trip so "
    "both engines emit the same 6-dp doubles.",
)
def ext_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.multimodal import extract_features, synth_media

    d = load_tables(spark, sf_dir, "documents")["documents"]
    media = synth_media(d.select("doc_id")).filter(
        (F.col("kind") == "image") & (F.col("media_id") % 8 == 0)
    )
    feats = extract_features(media)

    def fp(i: int):
        return F.round(F.element_at("feature", i).cast("double"), 6)

    return feats.select(
        "media_id",
        fp(1).alias("width_px"),
        fp(2).alias("height_px"),
        fp(3).alias("mean_r"),
        fp(4).alias("mean_g"),
        fp(5).alias("mean_b"),
        fp(6).alias("gray_std"),
    )


@register(
    "ext_dup_window_fraction",
    oracle="""
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(0, greatest(len(string_split(text, ' ')) - 8, 0) + 1),
               i -> md5(array_to_string(string_split(text, ' ')[i+1:i+8], ' '))
             ))) AS h
      FROM documents
    ),
    wdf AS (SELECT h, COUNT(*) AS df FROM sh GROUP BY h)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_windows,
           ROUND(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 4) AS dup_window_fraction
    FROM sh JOIN wdf USING (h)
    GROUP BY doc_id
    """,
    doc="Substring-level duplication signal (the document-granular form "
    "of suffix-substring dedup): share of each doc's distinct 8-word "
    "windows that appear in another document.  Digest-only shuffles.",
)
def ext_dup_window_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.scrub import duplicated_window_fraction

    d = load_tables(spark, sf_dir, "documents")["documents"]
    return duplicated_window_fraction(d, "doc_id", "text", w=8)


@register(
    "ext_line_dedup",
    oracle="""
    WITH lined AS (
      SELECT doc_id,
             list_transform(
               range(0, CAST(ceil(len(string_split(text, ' ')) / 8.0) AS BIGINT)),
               i -> array_to_string(string_split(text, ' ')[i*8+1:i*8+8], ' ')
             ) AS lns
      FROM documents
    ),
    lines AS (
      SELECT doc_id, unnest(lns) AS line,
             unnest(range(0, len(lns))) AS pos
      FROM lined
    ),
    ldf AS (
      SELECT line, COUNT(DISTINCT doc_id) AS df FROM lines GROUP BY line
    )
    SELECT doc_id,
           COALESCE(string_agg(CASE WHEN df <= 2 THEN line END,
                               chr(10) ORDER BY pos), '') AS text,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN df > 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed
    FROM lines JOIN ldf USING (line)
    GROUP BY doc_id
    """,
    doc="CCNet-style corpus-level line dedup: documents reshaped into "
    "8-word pseudo-lines (the fixture corpus is single-line), lines "
    "occurring in >2 distinct docs dropped everywhere, order preserved "
    "in the rebuilt text.  Digest-df shuffle + one groupBy(id) rebuild "
    "with array-domain sort — no window.",
)
def ext_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.scrub import remove_repeated_lines

    d = load_tables(spark, sf_dir, "documents")["documents"]
    ws = F.split(F.col("text"), " ")
    nlines = F.ceil(F.size(ws) / F.lit(8.0)).cast("int")
    lined = d.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.transform(
                F.sequence(F.lit(0), nlines - 1),
                lambda i: F.concat_ws(" ", F.slice(ws, i * 8 + 1, 8)),
            ),
        ).alias("text"),
    )
    return remove_repeated_lines(lined, "doc_id", "text", max_line_df=2)


@register(
    "ext_ivfpq_persisted",
    oracle=_pq_oracle(ivf_c=16, nprobe=8),  # identical to ext_ivfpq_topk:
    # the disk round-trip must be a no-op on results, so the same
    # full-replay oracle gates it (plus the roundtrip-equality pytest in
    # tests/test_ivfpq.py::test_persisted_roundtrip_same_results)
    doc="IVFADC index persistence round-trip (VERDICT r6 polish): build "
    "-> write partitionBy(centroid_id) -> reload -> probe-bounded "
    "search.  The partition layout makes the nprobe cell filter a "
    "parquet partition-pruning predicate (proven by plan assert in "
    "tests/test_ivfpq.py); this row proves the full disk round-trip "
    "end-to-end under the driver, hash-gated by the same oracle as "
    "ext_ivfpq_topk.",
)
def ext_ivfpq_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..ext.ivfpq import build_ivfpq_index, ivfpq_search
    from ..ext.pq import l2_normalize, train_pq_codebooks

    e = l2_normalize(
        load_tables(spark, sf_dir, "embeddings")["embeddings"], "embedding"
    )
    centroids = e.filter(F.col("vec_id") < 16)
    # books pin: see ext_pq_topk — the index write and the search LUTs
    # are separate consumers of the same trained books
    books = train_pq_codebooks(e, m=16, ksub=32, iterations=2, grid=6).persist()
    index = build_ivfpq_index(e, centroids, books, m=16)
    path = tempfile.mkdtemp(prefix="riab_ivfpq_") + "/index"
    index.write.partitionBy("centroid_id").parquet(path)
    reloaded = spark.read.parquet(path)
    queries = e.filter(F.col("vec_id") < 10)
    out = ivfpq_search(
        reloaded, centroids, books, e, queries, m=16, k=3, nprobe=8,
        shortlist=32,
    )
    from ..core.caching import track_cache

    return track_cache(out, [books])


@register(
    "ext_ivfpq_incremental",
    oracle=_pq_oracle(ivf_c=16, nprobe=8),  # identical to ext_ivfpq_topk
    # and ext_ivfpq_persisted: with frozen models, append(build(b1), b2)
    # holds the same code rows as build(b1 ∪ b2), so the search result
    # must hash-match the same full-replay oracle
    doc="Continuous-crawl IVFADC append (VERDICT r10 task 5): build the "
    "partitionBy(centroid_id) index on HALF the corpus, append the "
    "other half encoded against the FROZEN centroids + codebooks "
    "(ext/ivfpq.py::append_ivfpq_index — the same zero-shuffle fused "
    "assignment+encode, O(batch): history is never listed, read, or "
    "rewritten; mode('append') drops new files inside the existing "
    "pruned partition tree), then probe-bounded search over the "
    "appended layout.  Completes the incremental story alongside "
    "incremental dedup / SemDeDup / DSIR; equality with a full rebuild "
    "is pytest-pinned and this row hash-gates the end-to-end result "
    "under the SAME oracle as the full-build rows.",
)
def ext_ivfpq_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..ext.ivfpq import append_ivfpq_index, build_ivfpq_index, ivfpq_search
    from ..ext.pq import l2_normalize, train_pq_codebooks

    e = l2_normalize(
        load_tables(spark, sf_dir, "embeddings")["embeddings"], "embedding"
    )
    centroids = e.filter(F.col("vec_id") < 16)
    books = train_pq_codebooks(e, m=16, ksub=32, iterations=2, grid=6).persist()
    path = tempfile.mkdtemp(prefix="riab_ivfpq_inc_") + "/index"
    b1 = e.filter(F.col("vec_id") % 2 == 0)
    b2 = e.filter(F.col("vec_id") % 2 == 1)
    build_ivfpq_index(b1, centroids, books, m=16).write.partitionBy(
        "centroid_id"
    ).parquet(path)
    append_ivfpq_index(b2, centroids, books, path, m=16)
    reloaded = spark.read.parquet(path)
    queries = e.filter(F.col("vec_id") < 10)
    out = ivfpq_search(
        reloaded, centroids, books, e, queries, m=16, k=3, nprobe=8,
        shortlist=32,
    )
    from ..core.caching import track_cache

    return track_cache(out, [books])


@register(
    "ext_profile_approx",
    oracle="""
    WITH cols AS (
      SELECT 'o_orderkey' AS column_name, COUNT(DISTINCT o_orderkey) AS d FROM orders
      UNION ALL SELECT 'o_custkey', COUNT(DISTINCT o_custkey) FROM orders
      UNION ALL SELECT 'o_orderstatus', COUNT(DISTINCT o_orderstatus) FROM orders
      UNION ALL SELECT 'o_totalprice', COUNT(DISTINCT o_totalprice) FROM orders
      UNION ALL SELECT 'o_orderdate', COUNT(DISTINCT o_orderdate) FROM orders
      UNION ALL SELECT 'o_orderpriority', COUNT(DISTINCT o_orderpriority) FROM orders
    )
    SELECT column_name, CAST(d AS BIGINT) AS exact_distinct,
           TRUE AS hll_within_bound
    FROM cols
    """,
    doc="approx_count_distinct (HLL) profile of the orders table, under "
    "an invariant oracle (VERDICT r7 task 3): HLL estimates can't "
    "hash-match across engines, but |approx - exact| <= 3*rsd*exact "
    "is a checkable error bound — the row emits the exact count plus "
    "the bound flag per column, and the oracle pins the flag TRUE with "
    "DuckDB's own exact counts.  A broken sketch (or a sketch whose "
    "error blows past 3 sigma) flips the hash.",
)
def ext_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.profile import approx_distinct_profile

    o = load_tables(spark, sf_dir, "orders")["orders"]
    rsd = 0.05
    approx = approx_distinct_profile(o, rsd=rsd).select(
        "column_name", "approx_distinct"
    )
    exact = None
    for c in o.columns:
        row = o.agg(
            F.lit(c).alias("column_name"),
            F.count_distinct(F.col(c)).cast("long").alias("exact_distinct"),
        )
        exact = row if exact is None else exact.unionByName(row)
    return approx.join(exact, "column_name").select(
        "column_name",
        "exact_distinct",
        (
            F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
            <= 3 * rsd * F.col("exact_distinct")
        ).alias("hll_within_bound"),
    )


_STOPWORDS_SQL = "['the','a','of','and','to','in','is','it','that','for']"


@register(
    "ext_quality_score",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS nw,
             len(list_filter(string_split(text, ' '),
                 w -> list_contains({_STOPWORDS_SQL}, w)))
               / len(string_split(text, ' ')) AS stop_r,
             len(regexp_extract_all(text, '[.,;:!?]'))
               / greatest(length(text), 1) AS punct_r
      FROM documents
    )
    SELECT doc_id,
           CAST(nw AS BIGINT) AS n_words,
           ROUND(stop_r, 4)  AS stopword_ratio,
           ROUND(punct_r, 4) AS punct_ratio,
           ROUND(least(nw / 64.0, 1.0) * 0.4 + stop_r * 0.4
                 + (1.0 - punct_r) * 0.2, 4) AS quality
    FROM base
    """,
    doc="Composite document-quality heuristic (length/stopword/punct).",
)
def ext_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.text import quality_score

    d = load_tables(spark, sf_dir, "documents")["documents"]
    return quality_score(d, "doc_id", "text")


@register(
    "ext_dedup_embed_cosine",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(b.v, b.v))), 4) AS cosine
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE ROUND(list_dot_product(a.v, b.v)
                / (sqrt(list_dot_product(a.v, a.v))
                   * sqrt(list_dot_product(b.v, b.v))), 4) >= 0.35
    """,
    doc="Exact embedding-cosine near-dup pairs (threshold 0.35).",
)
def ext_dedup_embed_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.similarity import cosine_near_dup_pairs

    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    return cosine_near_dup_pairs(e, "vec_id", "embedding", threshold=0.35)


def _embed_lsh_oracle(
    threshold: float = 0.35, dim: int = 64, planes: int = 12, bands: int = 6
) -> str:
    """Full DuckDB replay of cosine_near_dup_lsh (VERDICT r7 task 3).

    'Probabilistic' was the wrong frame: the hyperplanes come from a
    seeded PRNG, so the banding is pseudorandom but fully deterministic
    — embedding the plane constants as SQL literals (repr round-trips
    float64 exactly) makes every bucket, candidate pair, and verified
    cosine replayable, and the scale path earns a hash gate."""
    from ..ext.similarity import _hyperplanes

    hp = _hyperplanes(dim, planes)
    per_band = planes // bands
    bits = [
        "(CASE WHEN list_dot_product(v, ["
        + ", ".join(repr(w) for w in p)
        + "]) >= 0 THEN '1' ELSE '0' END)"
        for p in hp
    ]
    band_exprs = [
        f"'{i}:' || " + " || ".join(bits[i * per_band : (i + 1) * per_band])
        for i in range(bands)
    ]
    vcos = _COS4.format(a="x.v", b="y.v")
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    buckets AS (
      SELECT vec_id, unnest([{", ".join(band_exprs)}]) AS bucket FROM e
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
      FROM buckets a JOIN buckets b
        ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    )
    SELECT c.id_a, c.id_b, {vcos} AS cosine
    FROM cand c
    JOIN e x ON x.vec_id = c.id_a
    JOIN e y ON y.vec_id = c.id_b
    WHERE {vcos} >= {threshold}
    """


@register(
    "ext_dedup_embed_lsh",
    oracle=_embed_lsh_oracle(),
    doc="Sign-LSH bucketed embedding near-dup (scale path, exact verify) "
    "— under a full-replay hash oracle with the seeded hyperplanes "
    "embedded as literals; recall vs the exact pairs stays asserted in "
    "tests/test_ext.py.",
)
def ext_dedup_embed_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.similarity import cosine_near_dup_lsh

    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    return cosine_near_dup_lsh(e, "vec_id", "embedding", threshold=0.35)


@register(
    "ext_dedup_pipeline",
    oracle=f"""
    WITH sh AS ({_SHINGLES_SQL}),
    hashes AS (
      SELECT doc_id, j,
             MIN(md5(CAST(j AS VARCHAR) || ':' || shingle)) AS mh
      FROM sh CROSS JOIN (SELECT unnest(range(16)) AS j) js
      GROUP BY doc_id, j
    ),
    bands AS (
      SELECT doc_id, j // 4 AS band_idx,
             md5(string_agg(mh, '|' ORDER BY j)) AS band_hash
      FROM hashes GROUP BY doc_id, j // 4
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a
      JOIN bands b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
                 AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter_size
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT i.id_a, i.id_b,
           ROUND(i.inter_size / (sa.sz + sb.sz - i.inter_size), 4) AS jaccard
    FROM inter i
    JOIN cand c ON c.id_a = i.id_a AND c.id_b = i.id_b
    JOIN sizes sa ON sa.doc_id = i.id_a
    JOIN sizes sb ON sb.doc_id = i.id_b
    WHERE ROUND(i.inter_size / (sa.sz + sb.sz - i.inter_size), 4) >= 0.05
    """,
    doc="Full near-dedup pipeline: MinHash-LSH candidates → exact Jaccard verify.",
)
def ext_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_tables(spark, sf_dir, "documents")["documents"]
    # One persisted shingle pass feeds BOTH the MinHash signatures and the
    # Jaccard verify (shingle rows are ~|corpus words| — cache-manager
    # dedupes repeated calls; at 100 TB materialize to a table instead).
    sh = shingle_sets(d, "doc_id", "text", n=3).persist()
    sig = minhash_signatures(sh, "doc_id", num_hashes=16)
    cand = lsh_candidate_pairs(sig, "doc_id", num_hashes=16, bands=4)
    return ngram_jaccard_pairs(
        d, "doc_id", "text", n=3, threshold=0.05, candidates=cand, shingles=sh
    )


@register(
    "ext_multimodal_features",
    oracle="""
    SELECT doc_id AS media_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS kind,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes
    FROM documents
    """,
    doc="Multimodal plumbing through the driver gate: documents.text "
    "encoded to a binary payload, typed media frame, Arrow mapInPandas "
    "feature pass (ext/multimodal.py) — byte counts hash-proven; the "
    "stubbed codec's histogram features are exercised but asserted in "
    "tests/test_multimodal.py (not SQL-expressible).",
)
def ext_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.multimodal import extract_features

    d = load_tables(spark, sf_dir, "documents")["documents"]
    media = d.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            ((F.col("doc_id") % 3) + 1).cast("int"),
        ).alias("kind"),
        F.lit(None).cast("string").alias("mime"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    return extract_features(media).select(
        "media_id", "kind", F.col("n_bytes").cast("long").alias("n_bytes")
    )


@register(
    "ext_media_probe",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS media_id,
           CASE doc_id % 4 WHEN 0 THEN 'image' WHEN 2 THEN 'video'
                ELSE 'audio' END AS kind,
           CASE doc_id % 8 WHEN 0 THEN 'png' WHEN 4 THEN 'jpeg_progressive'
                ELSE CASE doc_id % 4 WHEN 1 THEN 'wav'
                     WHEN 2 THEN 'mp4' ELSE 'mp3' END END AS format,
           CAST(CASE doc_id % 4 WHEN 0 THEN 8 + doc_id % 16
                WHEN 2 THEN 320 ELSE -1 END AS INTEGER) AS width,
           CAST(CASE doc_id % 4 WHEN 0 THEN 8 + doc_id % 8
                WHEN 2 THEN 180 + (doc_id % 4) * 60 ELSE -1 END
                AS INTEGER) AS height,
           CAST(CASE doc_id % 4
                WHEN 1 THEN 100 + (doc_id % 10) * 50
                WHEN 2 THEN 1000 + (doc_id % 20) * 250
                WHEN 3 THEN (417 * (5 + doc_id % 15) * 8000) // 128000
                ELSE -1 END AS BIGINT) AS duration_ms
    FROM documents
    """,
    doc="Media metadata probing end-to-end under the hash gate: "
    "synth_media builds one REAL blob per doc_id (PNG header, "
    "progressive-JPEG SOF2 marker, WAV header, ISO-BMFF mvhd/tkhd "
    "boxes, CBR MP3 frames) with every probe-able field closed-form "
    "in the id; probe_media re-derives format/dimensions/duration by "
    "parsing the actual bytes (box walk, marker walk, frame-header "
    "scan — ext/codecs.py), so the oracle checks real container "
    "parsing, not arithmetic.  -1 sentinels replace NULLs (mixed "
    "NULL/int columns coerce to float in the compare).",
)
def ext_media_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.multimodal import probe_media, synth_media

    d = load_tables(spark, sf_dir, "documents")["documents"]
    probed = probe_media(synth_media(d.select("doc_id")))
    return probed.select(
        "media_id",
        "kind",
        "format",
        F.coalesce(F.col("width"), F.lit(-1)).cast("int").alias("width"),
        F.coalesce(F.col("height"), F.lit(-1)).cast("int").alias("height"),
        F.coalesce(F.col("duration_ms"), F.lit(-1))
        .cast("long")
        .alias("duration_ms"),
    )


# --- round 5: near-dup CLUSTERING (transitive closure) ----------------
@register(
    "ext_dedup_clusters",
    oracle=f"""
    WITH RECURSIVE sh AS ({_SHINGLES_SQL}),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter_size
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
      SELECT id_a, id_b
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE ROUND(inter_size / (sa.sz + sb.sz - inter_size), 4) >= 0.05
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    comp AS (
      SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id
      FROM reach GROUP BY u
    ),
    lab AS (
      SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(cluster_id AS BIGINT) AS cluster_id,
           CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT)
             AS cluster_size,
           CAST(doc_id = cluster_id AS BIGINT) AS is_canonical
    FROM lab
    """,
    doc="Transitive near-dup clusters: Jaccard>=0.05 pairs -> connected "
        "components -> canonical-per-cluster labeling.",
)
def ext_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering (ext/cluster.py): pairwise dedup only flags
    edges; curation needs every document labeled with its transitive
    cluster and one canonical survivor per cluster (A~B, B~C purges C
    even though A and C never matched).  Engine side runs min-label
    propagation + pointer jumping; the DuckDB oracle re-derives the
    same labeling via a recursive-CTE transitive closure.  exact=True
    pairs here so both engines see the identical edge set; the
    LSH-candidate default is the 100 TB path (same downstream CC)."""
    from ..ext.cluster import near_dup_clusters

    d = load_tables(spark, sf_dir, "documents")["documents"]
    return near_dup_clusters(
        d, "doc_id", "text", n=3, threshold=0.05, exact=True
    ).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
        F.col("cluster_size").cast("long").alias("cluster_size"),
        F.col("is_canonical").cast("long").alias("is_canonical"),
    )


@register(
    "ext_dedup_clusters_lsh",
    oracle=f"""
    WITH RECURSIVE sh AS ({_SHINGLES_SQL}),
    hashes AS (
      SELECT doc_id, j,
             MIN(md5(CAST(j AS VARCHAR) || ':' || shingle)) AS mh
      FROM sh CROSS JOIN (SELECT unnest(range(16)) AS j) js
      GROUP BY doc_id, j
    ),
    bands AS (
      SELECT doc_id, j // 4 AS band_idx,
             md5(string_agg(mh, '|' ORDER BY j)) AS band_hash
      FROM hashes GROUP BY doc_id, j // 4
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a
      JOIN bands b ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
                 AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.id_a, c.id_b, COUNT(*) AS inter_size
      FROM cand c
      JOIN sh a ON a.doc_id = c.id_a
      JOIN sh b ON b.doc_id = c.id_b AND b.shingle = a.shingle
      GROUP BY c.id_a, c.id_b
    ),
    pairs AS (
      SELECT id_a, id_b
      FROM inter
      JOIN sizes sa ON sa.doc_id = id_a
      JOIN sizes sb ON sb.doc_id = id_b
      WHERE ROUND(inter_size / (sa.sz + sb.sz - inter_size), 4) >= 0.05
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    comp AS (
      SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id
      FROM reach GROUP BY u
    ),
    lab AS (
      SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(cluster_id AS BIGINT) AS cluster_id,
           CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT)
             AS cluster_size,
           CAST(doc_id = cluster_id AS BIGINT) AS is_canonical
    FROM lab
    """,
    doc="Scale path of ext_dedup_clusters: MinHash-LSH candidate pairs "
        "feed the same connected-components labeling — under a "
        "full-replay hash oracle (VERDICT r7 task 3): the banding is "
        "md5-deterministic, so the oracle re-derives the candidate set, "
        "the candidate-bounded Jaccard filter, and the recursive-CTE "
        "transitive closure; tests/test_cluster.py keeps the labeling "
        "invariants.",
)
def ext_dedup_clusters_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB path: MinHash-LSH candidate pairs (bounded band join, no
    all-shared-shingle blowup) → Jaccard filter → connected components.
    This is what a production curation job runs; the exact twin
    ext_dedup_clusters proves the CC math under the DuckDB oracle."""
    from ..ext.cluster import near_dup_clusters

    d = load_tables(spark, sf_dir, "documents")["documents"]
    return near_dup_clusters(
        d, "doc_id", "text", n=3, threshold=0.05, exact=False
    ).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
        F.col("cluster_size").cast("long").alias("cluster_size"),
        F.col("is_canonical").cast("long").alias("is_canonical"),
    )


@register(
    "ext_embed_clusters",
    oracle="""
    WITH RECURSIVE e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE ROUND(list_dot_product(a.v, b.v)
                  / (sqrt(list_dot_product(a.v, a.v))
                     * sqrt(list_dot_product(b.v, b.v))), 4) >= 0.35
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(u, v) AS (
      SELECT u, v FROM edges
      UNION
      SELECT r.u, e2.v FROM reach r JOIN edges e2 ON r.v = e2.u
    ),
    comp AS (
      SELECT u AS vec_id, LEAST(u, MIN(v)) AS cluster_id
      FROM reach GROUP BY u
    ),
    lab AS (
      SELECT emb.vec_id, COALESCE(c.cluster_id, emb.vec_id) AS cluster_id
      FROM embeddings emb LEFT JOIN comp c ON emb.vec_id = c.vec_id
    )
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           CAST(cluster_id AS BIGINT) AS cluster_id,
           CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT)
             AS cluster_size,
           CAST(vec_id = cluster_id AS BIGINT) AS is_canonical
    FROM lab
    """,
    doc="Embedding-cosine near-dup clusters: cosine>=0.35 pairs -> "
        "connected components -> canonical-per-cluster labeling.",
)
def ext_embed_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space clustering twin of ext_dedup_clusters
    (ext/cluster.py::embed_near_dup_clusters): exact cosine pairs here
    so both engines see the same edge set; production uses the sign-LSH
    candidate default (same downstream CC)."""
    from ..ext.cluster import embed_near_dup_clusters

    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    return embed_near_dup_clusters(
        e, "vec_id", "embedding", threshold=0.35, exact=True
    ).select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
        F.col("cluster_size").cast("long").alias("cluster_size"),
        F.col("is_canonical").cast("long").alias("is_canonical"),
    )


def _pagerank_oracle(damping: float = 0.85, iterations: int = 5) -> str:
    """Unrolled fixed-iteration PageRank as chained CTEs (recursive CTEs
    can't aggregate over their own recursive reference, so each power
    step is spelled out — same trick as the generated BPE replace
    chain).  Must mirror ext/graph.py:pagerank exactly: per-iteration
    ROUND to 8 decimals, dangling mass folded back uniformly."""
    parts = [
        """
    WITH edges AS (
      SELECT DISTINCT 's' || l_suppkey AS src, 'c' || o_custkey AS dst
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
    odeg AS (SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY 1),
    deg AS (
      SELECT node, COALESCE(d, 0) AS out_deg
      FROM nodes LEFT JOIN odeg USING (node)
    ),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg),
    pr0 AS (SELECT node, out_deg, 1.0 / n AS rank FROM deg, nn)
        """.strip()
    ]
    for i in range(iterations):
        prev, cur = f"pr{i}", f"pr{i + 1}"
        parts.append(
            f"""
    dm{i} AS (SELECT COALESCE(SUM(rank), 0.0) AS dm FROM {prev} WHERE out_deg = 0),
    c{i} AS (
      SELECT dst AS node, SUM(p.rank / p.out_deg) AS cin
      FROM edges e JOIN {prev} p ON e.src = p.node
      WHERE p.out_deg > 0 GROUP BY dst
    ),
    {cur} AS (
      SELECT d.node, d.out_deg,
             ROUND((1 - {damping}) / n
                   + {damping} * (COALESCE(cin, 0.0) + dm / n), 8) AS rank
      FROM deg d LEFT JOIN c{i} USING (node), nn, dm{i}
    )
            """.strip()
        )
    final = f"SELECT node, ROUND(rank, 6) AS rank FROM pr{iterations}"
    return ",\n".join(parts) + "\n" + final


@register(
    "ext_pagerank",
    oracle=_pagerank_oracle(),
    doc="Fixed-iteration damped PageRank over the supplier-to-customer "
    "shipment graph (customers are all sinks, so the dangling-mass "
    "redistribution is fully exercised); the oracle unrolls the same "
    "five power steps as chained CTEs.",
)
def ext_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.graph import pagerank

    t = load_tables(spark, sf_dir, "lineitem", "orders")
    edges = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
            F.concat(F.lit("c"), F.col("o_custkey")).alias("dst"),
        )
        .distinct()
    )
    pr = pagerank(edges, "src", "dst", damping=0.85, iterations=5,
                  round_decimals=8)
    return pr.select("node", F.round("rank", 6).alias("rank"))


@register(
    "ext_pca_whiten",
    oracle="""
    SELECT CAST(dim AS BIGINT) AS dim, 0.0 AS mean, 1.0 AS variance
    FROM range(8) t(dim)
    """,
    doc="PCA fit (Arrow-batched partial moment matrices, driver eigh, "
    "sign-conventioned components) + whitening projection of the "
    "embeddings table to 8 dims.  Invariant oracle (VERDICT r7 task 3): "
    "no SQL engine eigendecomposes, but the whitening CONTRACT is a "
    "hashable constant — every projected dimension must have mean 0 and "
    "population variance 1 on the 1e-4 grid.  A broken center, a wrong "
    "eigenvalue scale, or a sample/population variance mixup all flip "
    "the hash; the component numerics themselves are pinned by numpy "
    "cross-checks in tests/test_pca.py.",
)
def ext_pca_whiten(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.pca import fit_pca, transform_pca

    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    model = fit_pca(emb, "embedding", k=8)
    proj = transform_pca(emb, "embedding", model, whiten=True)
    # per-dimension mean/variance of the whitened projection: d rows,
    # each mean 0.0 / variance 1.0 — the verifiable surface of the
    # transform.  `+ 0.0` collapses IEEE -0.0 (round of a tiny negative
    # mean) onto +0.0 so the hash formatting matches the oracle literal.
    pos = proj.select(F.posexplode("projected").alias("dim", "val"))
    return (
        pos.groupBy("dim")
        .agg(
            (F.round(F.avg("val"), 4) + F.lit(0.0)).alias("mean"),
            (F.round(F.var_pop("val"), 4) + F.lit(0.0)).alias("variance"),
        )
        .select(F.col("dim").cast("long").alias("dim"), "mean", "variance")
        .orderBy("dim")
    )


@register(
    "ext_pca_orthonormal",
    oracle="""
    SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
           CASE WHEN i = j THEN 1.0 ELSE 0.0 END AS gram
    FROM range(8) a(i), range(8) b(j)
    """,
    doc="Second PCA invariant (VERDICT r7 task 3): the fitted components "
    "must be orthonormal — their Gram matrix is the identity on the "
    "1e-4 grid.  Computed Spark-side from the same fit the whitening "
    "row uses; a drifting eigh, a broken sign convention, or a "
    "mis-shaped component matrix flips the hash.",
)
def ext_pca_orthonormal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.pca import fit_pca

    emb = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    comps = fit_pca(emb, "embedding", k=8)["components"]
    gram = comps @ comps.T  # (k, k), ~identity
    rows = [
        (int(i), int(j), round(float(gram[i, j]), 4) + 0.0)
        for i in range(gram.shape[0])
        for j in range(gram.shape[1])
    ]
    return spark.createDataFrame(rows, "i long, j long, gram double")


def _kmeans_oracle(iterations: int = 3, c: int = 4, grid: int = 6) -> str:
    """Unrolled DuckDB replay of refine_centroids(grid=6): per step, a
    rounded-cosine nearest-centroid assignment (ties to the smaller
    centroid id — the same comparator build_ivf_index encodes in its
    max-struct) and grid-rounded per-dimension means."""
    cos = (
        "ROUND(list_dot_product(e.v, c.cv) / "
        "(sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))), 6)"
    )
    parts = [
        "vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"cents0 AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv "
        f"FROM embeddings WHERE vec_id < {c})",
    ]
    for s in range(iterations):
        parts.append(
            f"""a{s} AS (
              SELECT e.vec_id, e.v, c.cid,
                     ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                        ORDER BY {cos} DESC, c.cid) AS rn
              FROM vecs e, cents{s} c)"""
        )
        parts.append(
            f"""m{s} AS (
              SELECT cid, pos, ROUND(AVG(val), {grid}) AS mv FROM (
                SELECT cid, unnest(v) AS val,
                       unnest(range(len(v))) AS pos
                FROM a{s} WHERE rn = 1
              ) GROUP BY cid, pos)"""
        )
        parts.append(
            f"cents{s + 1} AS (SELECT cid, list(mv ORDER BY pos) AS cv "
            f"FROM m{s} GROUP BY cid)"
        )
    return f"""
    WITH {", ".join(parts)}
    SELECT cid AS centroid_id, pos AS dim, mv AS value
    FROM (
      SELECT cid, unnest(cv) AS mv, unnest(range(len(cv))) AS pos
      FROM cents{iterations}
    ) t(cid, mv, pos)
    """


@register(
    "ext_kmeans_centroids",
    oracle=_kmeans_oracle(),
    doc="Lloyd k-means (3 iterations, C=4 seeded from vec_id<4) over the "
    "embeddings, with per-step grid rounding (assignment cosine 1e-6, "
    "means 1e-6) so the whole iteration hash-matches an unrolled DuckDB "
    "replay — upgrading the clustering primitive from rows-only+recall "
    "to oracle-proven. Output: (centroid_id, dim, value) of the final "
    "centroids.",
)
def ext_kmeans_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.ivf import refine_centroids

    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    cents = refine_centroids(
        e, e.filter(F.col("vec_id") < 4), iterations=3, grid=6
    )
    return cents.select(
        F.col("vec_id").cast("long").alias("centroid_id"),
        F.posexplode("embedding").alias("dim", "value"),
    )


@register(
    "ext_kmeans_profile",
    oracle=_kmeans_oracle().replace(
        """
    SELECT cid AS centroid_id, pos AS dim, mv AS value
    FROM (
      SELECT cid, unnest(cv) AS mv, unnest(range(len(cv))) AS pos
      FROM cents3
    ) t(cid, mv, pos)
    """,
        """
    SELECT c.cid AS centroid_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           ROUND(AVG(ROUND(list_dot_product(e.v, c.cv)
                 / (sqrt(list_dot_product(e.v, e.v))
                    * sqrt(list_dot_product(c.cv, c.cv))), 6)), 4) AS avg_cosine
    FROM (
      SELECT e.vec_id, e.v, c.cid,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id
               ORDER BY ROUND(list_dot_product(e.v, c.cv)
                 / (sqrt(list_dot_product(e.v, e.v))
                    * sqrt(list_dot_product(c.cv, c.cv))), 6) DESC, c.cid) AS rn
      FROM vecs e, cents3 c) a
    JOIN vecs e ON a.vec_id = e.vec_id
    JOIN cents3 c ON a.cid = c.cid
    WHERE a.rn = 1
    GROUP BY c.cid
    """,
    ),
    doc="Cluster profile after the oracle-proven Lloyd run: member count "
    "and mean (rounded) cosine-to-own-centroid per cluster — the "
    "cohesion readout a curation pipeline tracks per re-clustering.",
)
def ext_kmeans_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.ivf import build_ivf_index, refine_centroids
    from ..ext.similarity import _dot, _norm

    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    cents = refine_centroids(
        e, e.filter(F.col("vec_id") < 4), iterations=3, grid=6
    )
    assigned = build_ivf_index(e, cents).select(
        "centroid_id", F.col("embedding").cast("array<double>").alias("__v")
    )
    cvecs = cents.select(
        F.col("vec_id").cast("long").alias("centroid_id"),
        F.col("embedding").alias("__cv"),
    )
    cos = F.round(
        _dot(F.col("__v"), F.col("__cv"))
        / (_norm(F.col("__v")) * _norm(F.col("__cv"))),
        6,
    )
    return (
        assigned.join(F.broadcast(cvecs), "centroid_id")
        .select("centroid_id", cos.alias("__cos"))
        .groupBy("centroid_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.round(F.avg("__cos"), 4).alias("avg_cosine"),
        )
    )


@register(
    "ext_kmeans_separation",
    oracle=_kmeans_oracle().replace(
        """
    SELECT cid AS centroid_id, pos AS dim, mv AS value
    FROM (
      SELECT cid, unnest(cv) AS mv, unnest(range(len(cv))) AS pos
      FROM cents3
    ) t(cid, mv, pos)
    """,
        """
    , ranked AS (
      SELECT e.vec_id, c.cid,
             ROUND(list_dot_product(e.v, c.cv)
               / (sqrt(list_dot_product(e.v, e.v))
                  * sqrt(list_dot_product(c.cv, c.cv))), 6) AS cos,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id
               ORDER BY ROUND(list_dot_product(e.v, c.cv)
                 / (sqrt(list_dot_product(e.v, e.v))
                    * sqrt(list_dot_product(c.cv, c.cv))), 6) DESC, c.cid) AS rn
      FROM vecs e, cents3 c
    ),
    pivoted AS (
      SELECT vec_id,
             MAX(CASE WHEN rn = 1 THEN cid END) AS own_cid,
             MAX(CASE WHEN rn = 1 THEN cos END) AS c1,
             MAX(CASE WHEN rn = 2 THEN cos END) AS c2
      FROM ranked WHERE rn <= 2 GROUP BY vec_id
    )
    SELECT own_cid AS centroid_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           ROUND(AVG(ROUND((c1 - c2) / (1 - c2), 6)), 4) AS avg_margin,
           ROUND(MIN(ROUND((c1 - c2) / (1 - c2), 6)), 4) AS min_margin
    FROM pivoted WHERE c2 < 1 GROUP BY own_cid
    """,
    ),
    doc="Cluster separation after the oracle-proven Lloyd run: the "
    "centroid-silhouette margin (cos_own - cos_next) / (1 - cos_next) "
    "per vector, averaged and min'd per cluster — how far each member "
    "sits from the decision boundary.  Same broadcast max-struct, "
    "sorted once for the top-2 centroids, no |corpus| x C explosion.",
)
def ext_kmeans_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.ivf import refine_centroids
    from ..ext.similarity import _dot, _norm

    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    cents = refine_centroids(
        e, e.filter(F.col("vec_id") < 4), iterations=3, grid=6
    )
    cents_row = cents.agg(
        F.collect_list(
            F.struct(
                F.col("vec_id").cast("long").alias("cid"),
                F.col("embedding").alias("cv"),
            )
        ).alias("__cents")
    )
    scored = (
        e.select("vec_id", F.col("embedding").cast("array<double>").alias("__v"))
        .crossJoin(F.broadcast(cents_row))
        .withColumn(
            "__ranked",
            F.array_sort(  # ascending by (cos, -cid): last = best, same
                F.transform(  # comparator as the assignment max-struct
                    "__cents",
                    lambda s: F.struct(
                        F.round(
                            _dot(F.col("__v"), s["cv"])
                            / (_norm(F.col("__v")) * _norm(s["cv"])),
                            6,
                        ).alias("cos"),
                        (-s["cid"]).alias("neg_cid"),
                    ),
                )
            ),
        )
        .select(
            (-F.element_at("__ranked", -1)["neg_cid"]).alias("centroid_id"),
            F.element_at("__ranked", -1)["cos"].alias("__c1"),
            F.element_at("__ranked", -2)["cos"].alias("__c2"),
        )
        .where(F.col("__c2") < 1)
        .withColumn(
            "__m",
            F.round((F.col("__c1") - F.col("__c2")) / (F.lit(1.0) - F.col("__c2")), 6),
        )
    )
    return scored.groupBy("centroid_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.round(F.avg("__m"), 4).alias("avg_margin"),
        F.round(F.min("__m"), 4).alias("min_margin"),
    )


def _semdedup_oracle() -> str:
    """Shared replay for ext_semantic_dedup and its Arrow-assignment
    twin: the BLAS path selects identical assignments (rounded-cosine
    grid + min-cid tie-break), so ONE oracle gates both."""
    return _kmeans_oracle().replace(
        """
    SELECT cid AS centroid_id, pos AS dim, mv AS value
    FROM (
      SELECT cid, unnest(cv) AS mv, unnest(range(len(cv))) AS pos
      FROM cents3
    ) t(cid, mv, pos)
    """,
        """
    , assigned AS (
      SELECT vec_id, v, cid FROM (
        SELECT e.vec_id, e.v, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY ROUND(list_dot_product(e.v, c.cv)
                   / (sqrt(list_dot_product(e.v, e.v))
                      * sqrt(list_dot_product(c.cv, c.cv))), 6) DESC,
                 c.cid) AS rn
        FROM vecs e, cents3 c) WHERE rn = 1
    ),
    dups AS (
      SELECT DISTINCT b.vec_id AS dup_id
      FROM assigned a JOIN assigned b
        ON a.cid = b.cid AND a.vec_id < b.vec_id
       AND ROUND(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.35
    )
    SELECT a.vec_id, CAST(a.cid AS BIGINT) AS centroid_id,
           a.vec_id IN (SELECT dup_id FROM dups) AS is_dup
    FROM assigned a
    """,
    )


@register(
    "ext_ivf_assign_auto",
    oracle="""
    WITH c AS (
      SELECT e.vec_id + 1000 * k.r AS cid, e.embedding AS cv
      FROM embeddings e
      CROSS JOIN (SELECT unnest(range(8)) AS r) k
      WHERE e.vec_id % 2 = 0
    ),
    scored AS (
      SELECT e.vec_id, c.cid,
             ROUND(list_dot_product(e.embedding, c.cv)
               / (sqrt(list_dot_product(e.embedding, e.embedding))
                  * sqrt(list_dot_product(c.cv, c.cv))), 6) AS cos
      FROM embeddings e CROSS JOIN c
    )
    SELECT vec_id, CAST(cid AS BIGINT) AS centroid_id
    FROM (
      SELECT vec_id, cid,
             ROW_NUMBER() OVER (
               PARTITION BY vec_id ORDER BY cos DESC, cid
             ) AS rn
      FROM scored
    ) WHERE rn = 1
    """,
    doc="The r12 auto-escalation default under the hash gate (VERDICT "
    "r11 task 1): centroids are the even-id embeddings replicated 8x "
    "under shifted ids, so C = 4N >= 2000 crosses AUTO_COARSE_MIN_C at "
    "EVERY driver sf and method='auto' resolves to the coarse "
    "O(N*sqrt(C)*d) rung — the rung a --semantic-dedup user now gets "
    "at real corpus scale.  n_super=4 with coarse_probe=4 makes the "
    "probe exhaustive, so the assignment is unconditionally identical "
    "to the flat argmax the SQL replays (rounded-cosine desc, min-cid "
    "tie-break — replicas tie at equal cosine and the smallest shifted "
    "id must win); non-exhaustive probe behavior is pinned by "
    "tests/test_ivf.py::test_coarse_* and the r11/r12 scale curves.",
)
def ext_ivf_assign_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.ivf import AUTO_COARSE_MIN_C, build_ivf_index

    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    reps = spark.range(8).select(F.col("id").alias("__r"))
    cents = (
        e.filter(F.col("vec_id") % 2 == 0)
        .crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") + F.col("__r") * 1000).alias("vec_id"),
            "embedding",
        )
    )
    assert AUTO_COARSE_MIN_C <= 2000  # 4N at the driver fixtures
    return build_ivf_index(
        e, cents, method="auto", coarse_probe=4, n_super=4
    ).select("vec_id", "centroid_id")


@register(
    "ext_semantic_dedup",
    oracle=_semdedup_oracle(),
    doc="SemDeDup (Abbas et al. 2023): Lloyd-cluster the embeddings "
    "(the oracle-proven grid-rounded run), then flag every vector with "
    "a smaller-id same-cluster member at rounded cosine >= 0.35 — the "
    "min-id exemplar of each semantic neighborhood survives.  Pairwise "
    "work stays within clusters (C is the scale knob); candidates are "
    "a two-phase (cluster, id) join, vectors fetched per pair.  Runs "
    "the DEFAULT assignment path — since r11 that is the Arrow/BLAS "
    "matmul (VERDICT r10 task 1: the default a user gets must be the "
    "one that survives 100×; the interpreted HOF fold measured 44-71× "
    "slower at C=100/200 and goes quadratic in the paper's C ∝ N "
    "regime) — so this row gates what `semantic_dedup(...)` actually "
    "ships.",
)
def ext_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.ivf import refine_centroids
    from ..ext.semdedup import semantic_dedup

    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    cents = refine_centroids(
        e, e.filter(F.col("vec_id") < 4), iterations=3, grid=6
    )
    return semantic_dedup(e, cents, tau=0.35, grid=6)


@register(
    "ext_semantic_dedup_expr",
    oracle=_semdedup_oracle(),
    doc="SemDeDup with the opt-in pure-SQL-lineage 'expr' assignment "
    "(per-row HOF fold over the broadcast centroid row) — the oracle "
    "twin of the Arrow/BLAS default.  Same oracle as "
    "ext_semantic_dedup: the Arrow path rounds via round_half_up "
    "(bit-exact F.round) and breaks rounded-cosine ties to the smaller "
    "centroid id, so assignments are identical and the unrolled SQL "
    "replay gates BOTH paths — hash-equality here IS the proof that "
    "flipping the default (r11) changed the plan, not the answer.",
)
def ext_semantic_dedup_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.ivf import refine_centroids
    from ..ext.semdedup import semantic_dedup

    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    cents = refine_centroids(
        e, e.filter(F.col("vec_id") < 4), iterations=3, grid=6,
        assign_method="expr",
    )
    return semantic_dedup(e, cents, tau=0.35, grid=6, assign_method="expr")


@register(
    "ext_semantic_dedup_coarse",
    oracle=_semdedup_oracle(),
    doc="SemDeDup with the two-level 'coarse' quantizer assignment "
    "(ext/ivf.py::_build_ivf_index_coarse, VERDICT r10 task 2): k-means "
    "the C centroids into ~sqrt(C) super-cells driver-side, probe the "
    "nearest super-cells per vector, exact rounded-cosine argmax within "
    "— O(N*sqrt(C)*d) instead of O(N*C*d), the missing rung for the "
    "paper's C-proportional-to-N regime (C~50k at 100 TB).  At this "
    "fixture's C=4 the probe is exhaustive, so assignments are "
    "UNCONDITIONALLY identical to the flat paths and the same unrolled "
    "SQL replay gates all three; the large-C behavior (probed-cell "
    "misses bounded like IVF nprobe) is pinned by "
    "tests/test_ivf.py::test_coarse_* and the r11 scale curve.",
)
def ext_semantic_dedup_coarse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.ivf import refine_centroids
    from ..ext.semdedup import semantic_dedup

    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    cents = refine_centroids(
        e, e.filter(F.col("vec_id") < 4), iterations=3, grid=6
    )
    return semantic_dedup(e, cents, tau=0.35, grid=6, assign_method="coarse")


@register(
    "ext_semantic_dedup_probe2",
    oracle=_kmeans_oracle().replace(
        """
    SELECT cid AS centroid_id, pos AS dim, mv AS value
    FROM (
      SELECT cid, unnest(cv) AS mv, unnest(range(len(cv))) AS pos
      FROM cents3
    ) t(cid, mv, pos)
    """,
        """
    , ranked AS (
      SELECT e.vec_id, e.v, c.cid,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id
               ORDER BY ROUND(list_dot_product(e.v, c.cv)
                 / (sqrt(list_dot_product(e.v, e.v))
                    * sqrt(list_dot_product(c.cv, c.cv))), 6) DESC,
               c.cid) AS rn
      FROM vecs e, cents3 c
    ),
    assigned AS (SELECT vec_id, v, cid FROM ranked WHERE rn = 1),
    cand AS (SELECT vec_id, v, cid FROM ranked WHERE rn <= 2),
    dups AS (
      SELECT DISTINCT b.vec_id AS dup_id
      FROM cand a JOIN cand b
        ON a.cid = b.cid AND a.vec_id < b.vec_id
       AND ROUND(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.35
    )
    SELECT a.vec_id, CAST(a.cid AS BIGINT) AS centroid_id,
           a.vec_id IN (SELECT dup_id FROM dups) AS is_dup
    FROM assigned a
    """,
    ),
    doc="SemDeDup with the top-2-centroid candidate phase (VERDICT r9 "
    "task 2): each vector joins the pair phase under BOTH of its two "
    "nearest centroids (ext/ivf.py::assign_top_centroids), closing "
    "most cross-cluster boundary misses — a near-dup pair split by a "
    "cluster boundary is still compared when either member's second "
    "centroid is the other's cluster — at ~2x candidate cost.  The "
    "reported centroid_id stays the nearest; the flagged set is a "
    "superset of probe=1's (pytest containment vs exact all-pairs).",
)
def ext_semantic_dedup_probe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.ivf import refine_centroids
    from ..ext.semdedup import semantic_dedup

    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    cents = refine_centroids(
        e, e.filter(F.col("vec_id") < 4), iterations=3, grid=6
    )
    return semantic_dedup(e, cents, tau=0.35, grid=6, probe=2)


def _inc_semdedup_oracle(tau: float = 0.35) -> str:
    """Two-batch replay of incremental_semantic_dedup: Lloyd trains on
    batch 1 only (frozen centroids), batch 1 bootstraps the exemplar
    index via the intra-batch min-id rule, batch 2 is screened against
    the kept exemplars AND its own smaller-id members."""
    base = _kmeans_oracle().replace(
        "vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        "vecs AS (SELECT vec_id, embedding::DOUBLE[] AS v "
        "FROM embeddings WHERE vec_id < 250)",
    )
    cos_a = (
        "ROUND(list_dot_product(a.v, c.cv) / (sqrt(list_dot_product(a.v, a.v)) "
        "* sqrt(list_dot_product(c.cv, c.cv))), 6)"
    )

    def pair(x: str, y: str) -> str:
        return (
            f"ROUND(list_dot_product({x}.v, {y}.v) / "
            f"(sqrt(list_dot_product({x}.v, {x}.v)) "
            f"* sqrt(list_dot_product({y}.v, {y}.v))), 6)"
        )

    final_old = """
    SELECT cid AS centroid_id, pos AS dim, mv AS value
    FROM (
      SELECT cid, unnest(cv) AS mv, unnest(range(len(cv))) AS pos
      FROM cents3
    ) t(cid, mv, pos)
    """
    final_new = f"""
    , allv AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    asg AS (
      SELECT vec_id, v, cid FROM (
        SELECT a.vec_id, a.v, c.cid,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                 ORDER BY {cos_a} DESC, c.cid) AS rn
        FROM allv a, cents3 c) WHERE rn = 1
    ),
    b1 AS (SELECT * FROM asg WHERE vec_id < 250),
    b2 AS (SELECT * FROM asg WHERE vec_id >= 250),
    dups1 AS (
      SELECT DISTINCT b.vec_id FROM b1 a JOIN b1 b
        ON a.cid = b.cid AND a.vec_id < b.vec_id AND {pair('a', 'b')} >= {tau}
    ),
    kept1 AS (SELECT * FROM b1 WHERE vec_id NOT IN (SELECT vec_id FROM dups1)),
    hits2 AS (
      SELECT DISTINCT n.vec_id FROM b2 n JOIN kept1 x
        ON n.cid = x.cid AND {pair('n', 'x')} >= {tau}
    ),
    intra2 AS (
      SELECT DISTINCT b.vec_id FROM b2 a JOIN b2 b
        ON a.cid = b.cid AND a.vec_id < b.vec_id AND {pair('a', 'b')} >= {tau}
    )
    SELECT vec_id, CAST(cid AS BIGINT) AS centroid_id,
           vec_id IN (SELECT vec_id FROM hits2
                      UNION SELECT vec_id FROM intra2) AS is_dup
    FROM b2
    """
    return base.replace(final_old, final_new)


@register(
    "ext_incremental_semantic_dedup",
    oracle=_inc_semdedup_oracle(),
    doc="Continuous-crawl SemDeDup: Lloyd centroids frozen from batch 1 "
    "(vec_id<250), batch 1 bootstraps the kept-exemplar index, batch 2 "
    "is screened O(delta) against the stored exemplars (cluster-local "
    "probe) plus its own smaller-id members — the semantic mirror of "
    "ext_incremental_dedup's band-index screen.  Full two-batch replay "
    "oracle.",
)
def ext_incremental_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.ivf import refine_centroids
    from ..ext.semdedup import incremental_semantic_dedup

    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    b1 = e.filter(F.col("vec_id") < 250)
    b2 = e.filter(F.col("vec_id") >= 250)
    cents = refine_centroids(
        b1, e.filter(F.col("vec_id") < 4), iterations=3, grid=6
    )
    _flags1, index1 = incremental_semantic_dedup(b1, None, cents, tau=0.35)
    flags2, _index2 = incremental_semantic_dedup(b2, index1, cents, tau=0.35)
    from ..core.caching import track_cache

    return track_cache(
        flags2, list(getattr(index1, "_graft_cached", []))
    )


@register(
    "ext_cluster_top_terms",
    oracle=_kmeans_oracle().replace(
        """
    SELECT cid AS centroid_id, pos AS dim, mv AS value
    FROM (
      SELECT cid, unnest(cv) AS mv, unnest(range(len(cv))) AS pos
      FROM cents3
    ) t(cid, mv, pos)
    """,
        """
    , asg AS (
      SELECT vec_id, cid FROM (
        SELECT e.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY ROUND(list_dot_product(e.v, c.cv)
                   / (sqrt(list_dot_product(e.v, e.v))
                      * sqrt(list_dot_product(c.cv, c.cv))), 6) DESC,
                 c.cid) AS rn
        FROM vecs e, cents3 c) WHERE rn = 1
    ),
    labeled AS (
      SELECT a.cid, d.text FROM asg a JOIN documents d ON d.doc_id = a.vec_id
    ),
    words AS (
      SELECT cid, unnest(string_split(text, ' ')) AS term FROM labeled
    ),
    tf AS (SELECT cid, term, COUNT(*) AS tf FROM words GROUP BY 1, 2),
    dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    nc AS (SELECT COUNT(DISTINCT cid) AS n FROM labeled),
    scored AS (
      SELECT cid, term, ROUND(tf * ln((1 + n) / (1 + df)), 6) AS score
      FROM tf JOIN dfq USING (term) CROSS JOIN nc
    )
    SELECT CAST(cid AS BIGINT) AS centroid_id,
           CAST(rnk AS BIGINT) AS rank, term, score
    FROM (
      SELECT cid, term, score,
             ROW_NUMBER() OVER (PARTITION BY cid
                                ORDER BY score DESC, term) AS rnk
      FROM scored
    ) WHERE rnk <= 5
    """,
    ),
    doc="Cluster labeling: top-5 characteristic terms per embedding "
    "cluster (clusters as pseudo-documents, smoothed cluster-IDF, "
    "integer-exact tf/df) — the readout a curation dashboard shows "
    "next to each cluster before a SemDeDup prune; joins documents to "
    "the oracle-proven Lloyd assignment on vec_id = doc_id.",
)
def ext_cluster_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.ivf import build_ivf_index, refine_centroids
    from ..ext.retrieval import cluster_top_terms

    t = load_tables(spark, sf_dir, "embeddings", "documents")
    e, d = t["embeddings"], t["documents"]
    cents = refine_centroids(
        e, e.filter(F.col("vec_id") < 4), iterations=3, grid=6
    )
    assigned = build_ivf_index(e, cents).select(
        "vec_id", F.col("centroid_id").cast("long").alias("centroid_id")
    )
    labeled = d.join(
        assigned, d["doc_id"] == assigned["vec_id"]
    ).select("centroid_id", "text")
    return cluster_top_terms(labeled, "centroid_id", "text", k=5)


@register(
    "ext_probe_auto_bulk",
    oracle="""
    WITH q AS (
      SELECT CAST(e.vec_id + 10000 * k.r AS BIGINT) AS qid,
             e.embedding AS qv
      FROM embeddings e
      CROSS JOIN (SELECT unnest(range(4)) AS r) k
    ),
    scored AS (
      SELECT q.qid, c.vec_id AS cid,
             ROUND(list_dot_product(q.qv, c.embedding)
               / (sqrt(list_dot_product(q.qv, q.qv))
                  * sqrt(list_dot_product(c.embedding, c.embedding))),
               6) AS cos
      FROM q CROSS JOIN embeddings c
    )
    SELECT qid AS query_id, CAST(cid AS BIGINT) AS centroid_id
    FROM (
      SELECT qid, cid,
             ROW_NUMBER() OVER (
               PARTITION BY qid ORDER BY cos DESC, cid
             ) AS rn
      FROM scored
    ) WHERE rn <= 4
    """,
    doc="The r13 probe-side auto dispatch under the hash gate (VERDICT "
    "r12 task 6): queries are the embeddings replicated 4x under "
    "shifted ids against all N centroids, so |Q|*C = 2000*500 = 1e6 "
    "crosses AUTO_PROBE_MIN_QC at every driver sf and "
    "probe_lists(method='auto') resolves to the Arrow matmul+top-p "
    "rung — the rung a bulk re-scoring batch now gets by default.  "
    "Unlike the assignment escalation this trades NO exactness: both "
    "rungs rank by (rounded-cosine desc, centroid_id asc), so the "
    "probed cells the SQL replays gate the arrow path bit-for-bit.",
)
def ext_probe_auto_bulk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..ext.ivf import AUTO_PROBE_MIN_QC, probe_lists

    e = load_tables(spark, sf_dir, "embeddings")["embeddings"]
    reps = spark.range(4).select(F.col("id").alias("__r"))
    q = e.crossJoin(F.broadcast(reps)).select(
        (F.col("vec_id") + F.col("__r") * 10000).alias("vec_id"),
        "embedding",
    )
    assert AUTO_PROBE_MIN_QC <= 1_000_000  # 4N * N at the driver fixtures
    return probe_lists(e, q, nprobe=4, method="auto").select(
        "query_id", "centroid_id"
    )
