"""Byte-pair-encoding tokenizer: distributed training stats, exact
JVM-side application.

The training-data pipelines this engine serves (SURVEY.md §2.N) need
real subword tokenization — `ext/text.py::token_counts` gives the
whitespace/regex estimate; this module gives an actual trained BPE.

Scale shape (the part that matters at 100 TB):

- **Word-frequency aggregation is the distributed step** —
  ``word_frequencies`` is one explode + groupBy(word) with map-side
  partial aggregation, so the shuffle carries (word, count) rows
  bounded by the vocabulary, not the corpus.
- **Merge training runs on the word-frequency table, not the corpus**
  — the standard formulation (Sennrich et al. 2016, "Neural Machine
  Translation of Rare Words with Subword Units"; same shape as the
  public HuggingFace/fastBPE trainers): vocabulary size grows ~O(n^β)
  (Heaps' law) and is additionally capped by ``max_words``, so the
  driver-side loop is corpus-size-independent.  100 TB of text trains
  from the same few-hundred-thousand-row frequency table as 1 GB.
- **Application is pure JVM, literal replaces only** — each merge
  becomes one non-regex ``replace`` over a DOUBLE-delimited symbol
  string, chained in rank order inside ``transform`` over the word
  array: whole-stage codegen, zero Python and zero regex engines in
  the hot path, embarrassingly parallel.  For merge lists past
  ``EXPR_MERGE_LIMIT`` the same algorithm runs as an Arrow-batched
  mapInPandas fallback (``str.replace`` per merge per batch).

Correctness notes baked into the representation:

- Symbols are double-delimited as ``|s1||s2||...||>|`` (``>`` is the
  end-of-word marker; the pre-tokenizer alphabet ``[a-z0-9]`` can
  never produce ``|`` or ``>``).  A merge (a, b) is the LITERAL
  replace ``|a||b|`` → ``|ab|``: each side of the pattern consumes
  only the pair's own delimiters, so the neighbours' delimiters
  survive and runs like ``a a a a`` merge left-to-right greedily
  (``aa aa``) exactly like the reference algorithm — with a
  single-delimiter scheme the shared separator is consumed and every
  other occurrence is missed.  The doubled boundary also blocks
  symbol-suffix false matches (``|xa||b|`` does not contain
  ``|a||b|``).
- Plain left-to-right non-overlapping substring replace has identical
  semantics in the JVM, Python, and DuckDB — :func:`bpe_tokens_sql`
  emits the exact same chain as ANSI ``replace()`` calls, so the
  tokenizer is DuckDB-oracle-replayable (proven side-by-side in
  tests/test_bpe.py).
- Applying merges strictly in rank order is equivalent to the
  min-rank-first priority loop, because any pair a merge creates
  involves the newly merged symbol and therefore has a higher rank
  than the merge that created it.

No reference-repo counterpart (the OMOP ETL has no tokenizer); this
is extension surface.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: above this many merges the chained-expression tree breaks Spark's
#: column-node conversion (measured: JVM StackOverflowError at 512
#: nested regexp_replace on Spark 4.1; 256 plans in <1s) — the
#: mapInPandas fallback runs the identical algorithm past this point.
EXPR_MERGE_LIMIT = 256

#: The pre-tokenizer scope is deliberately ASCII: ``[a-z0-9]`` means
#: the same thing in Java regex (Spark), Python re (the Arrow
#: fallback), and RE2 (DuckDB), which is what keeps the three
#: implementations and the generated oracle SQL bit-identical.
#: Non-Latin text contributes no tokens — route by
#: `ext/text.py::langid_heuristic` and train per-language merge tables
#: rather than widening this class (unicode word classes diverge
#: between the engines' regex dialects).
_WORD_RE = "[a-z0-9]+"


def _words(text: Column) -> Column:
    """Pre-tokenizer: lowercase, extract ``[a-z0-9]+`` runs."""
    return F.regexp_extract_all(F.lower(text), F.lit(_WORD_RE), 0)


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus → (word, freq), the sufficient statistic for BPE training.

    One shuffle, keyed on word with partial (map-side) aggregation; the
    exchanged rows are vocabulary-bounded.
    """
    return (
        df.select(F.explode(_words(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def train_bpe(
    word_freqs,
    num_merges: int = 200,
    max_words: int = 100_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a word-frequency table.

    ``word_freqs`` is either the DataFrame from :func:`word_frequencies`
    or an iterable of ``(word, freq)``.  The DataFrame path collects at
    most ``max_words`` rows (highest-frequency first — the only
    driver-side materialization, explicitly bounded).  Ties on pair
    count break lexicographically so training is deterministic across
    partitionings and engines.
    """
    if isinstance(word_freqs, DataFrame):
        rows = (
            word_freqs.orderBy(F.desc("freq"), F.asc("word"))
            .limit(max_words)
            .collect()
        )
        pairs_in = [(r["word"], r["freq"]) for r in rows]
    else:
        pairs_in = list(word_freqs)
    vocab: dict[tuple[str, ...], int] = {}
    for word, freq in pairs_in:
        syms = tuple(list(word) + [">"])
        vocab[syms] = vocab.get(syms, 0) + int(freq)
    # incremental pair bookkeeping: a merge only changes the pair
    # multisets of words that CONTAIN it, so track counts and a
    # pair → words index and update just those — O(affected) per merge
    # instead of a full O(vocab) recount (what makes 32k-merge
    # vocabularies feasible driver-side; equality with the naive
    # full-recount loop is property-tested in tests/test_bpe.py)
    counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set] = {}
    for syms, freq in vocab.items():
        for p, k in _pair_multiset(syms).items():
            counts[p] = counts.get(p, 0) + k * freq
            where.setdefault(p, set()).add(syms)
    # lazy-deletion heap for argmax selection: a linear min() scan over
    # the pair dict per merge dominates at 32k-merge scale; stale heap
    # entries (count changed since push) are skipped on pop.  Ordering
    # (-count, pair) reproduces the deterministic tie-break exactly.
    import heapq

    # only pairs with count >= 2 are ever eligible (the merge
    # threshold), so entries below that stay out of the heap — every
    # count change that reaches 2 pushes at that moment, keeping the
    # invariant that an eligible pair always has a live entry
    heap = [(-c, p) for p, c in counts.items() if c >= 2]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best = None
        while heap:
            negc, p = heap[0]
            if counts.get(p) == -negc:
                best = p
                break
            heapq.heappop(heap)
        if best is None or counts[best] < 2:
            break  # nothing left that actually repeats
        merges.append(best)
        a, b = best
        ab = a + b
        for syms in list(where.get(best, ())):
            freq = vocab.pop(syms, None)
            if freq is None:
                continue  # stale index entry from an earlier rewrite
            for p, k in _pair_multiset(syms).items():
                c = counts[p] - k * freq
                if c:
                    counts[p] = c
                    if c >= 2:
                        heapq.heappush(heap, (-c, p))
                else:
                    del counts[p]
                s = where.get(p)
                if s is not None:
                    s.discard(syms)
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_syms = tuple(out)
            vocab[new_syms] = vocab.get(new_syms, 0) + freq
            for p, k in _pair_multiset(new_syms).items():
                c = counts.get(p, 0) + k * freq
                counts[p] = c
                if c >= 2:
                    heapq.heappush(heap, (-c, p))
                where.setdefault(p, set()).add(new_syms)
    return merges


def _pair_multiset(syms: tuple[str, ...]) -> dict[tuple[str, str], int]:
    d: dict[tuple[str, str], int] = {}
    for a, b in zip(syms, syms[1:]):
        d[(a, b)] = d.get((a, b), 0) + 1
    return d


_SYMBOL_RE = re.compile(r"^[a-z0-9>]+$")


def _merge_replacements(merges: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """merges → [(literal_pattern, literal_replacement)] in rank order.

    Symbols are validated against the tokenizer alphabet: anything
    outside ``[a-z0-9>]`` (a hand-edited merges file, say) would break
    the delimiter scheme — and the generated oracle SQL — silently.
    """
    for a, b in merges:
        if not (_SYMBOL_RE.match(a) and _SYMBOL_RE.match(b)):
            raise ValueError(
                f"merge symbols must match [a-z0-9>]+: {(a, b)!r}"
            )
    return [(f"|{a}||{b}|", f"|{a}{b}|") for a, b in merges]


def _word_to_symbols(word: Column) -> Column:
    """'hello' → '|h||e||l||l||o||>|' (double-delimited symbol string)."""
    return F.concat(
        F.lit("|"), F.concat_ws("||", F.split(word, "")), F.lit("||>|")
    )


def _apply_merges_expr(sym: Column, merges: list[tuple[str, str]]) -> Column:
    for pat, rep in _merge_replacements(merges):
        sym = F.replace(sym, F.lit(pat), F.lit(rep))
    return sym


def bpe_tokenize(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "tokens",
) -> DataFrame:
    """Append ``out_col`` (array<string> of BPE tokens, end-of-word
    marker ``>`` attached) and ``n_tokens`` to ``df``.

    Merge count ≤ EXPR_MERGE_LIMIT runs as a pure JVM expression chain;
    larger vocabularies use the Arrow fallback with identical output.

    The merge chain is heavy per-row work either way — a single-file
    corpus scan ran the whole encode as ONE task (profiled 1.8 s serial
    wall of ext_bpe_token_counts at sf0.1) — so the scan gets the §2.5
    gated fan-out (r13 optimization round): file-metadata decision,
    structural no-op once the layout reaches the session parallelism.
    Keyless round-robin because this helper cannot assume an id column.
    """
    from ..core.parallelism import fan_out_for_compute

    df = fan_out_for_compute(df)
    if len(merges) > EXPR_MERGE_LIMIT:
        return _bpe_tokenize_arrow(df, merges, text_col, out_col)
    tokens = F.flatten(
        F.transform(
            _words(F.col(text_col)),
            lambda w: F.filter(
                F.split(_apply_merges_expr(_word_to_symbols(w), merges), r"\|"),
                lambda t: t != "",
            ),
        )
    )
    return df.withColumn(out_col, tokens).withColumn(
        "n_tokens", F.size(F.col(out_col))
    )


def _bpe_tokenize_arrow(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str,
    out_col: str,
) -> DataFrame:
    """Same algorithm for large merge lists: one literal str.replace per
    merge, applied per Arrow batch (still no shuffle, no driver)."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField(out_col, T.ArrayType(T.StringType()), True),
            T.StructField("n_tokens", T.IntegerType(), True),
        ]
    )
    replacements = _merge_replacements(merges)
    word_re = re.compile(_WORD_RE)

    def _tok(text: str | None) -> list[str]:
        if text is None:
            return []
        toks: list[str] = []
        for w in word_re.findall(text.lower()):
            s = "|" + "||".join(list(w)) + "||>|"
            for pat, rep in replacements:
                s = s.replace(pat, rep)
            toks.extend(t for t in s.split("|") if t)
        return toks

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            toks = pdf[text_col].map(_tok)
            pdf = pdf.copy()
            pdf[out_col] = toks
            pdf["n_tokens"] = toks.map(len).astype("int32")
            yield pdf

    return df.mapInPandas(_batches, schema)


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_tokens) per document — the budget/packing input of
    `ext/budget.py` / `ext/packing.py` computed with a real tokenizer
    instead of the whitespace estimate."""
    return bpe_tokenize(df, merges, text_col).select(
        id_col, "n_tokens"
    )


#: base symbol alphabet, id order fixed: 0-25 letters, 26-35 digits,
#: 36 the end-of-word marker
_BASE_VOCAB = [chr(c) for c in range(ord("a"), ord("z") + 1)] + [
    str(d) for d in range(10)
] + [">"]


def bpe_vocab(merges: list[tuple[str, str]]) -> dict[str, int]:
    """Deterministic token → id table: the 37-symbol base alphabet
    first, then each merge's product in rank order.  Every token
    :func:`bpe_tokenize` can emit is covered by construction (a token
    is either a base symbol or the product of an applied merge)."""
    vocab = {s: i for i, s in enumerate(_BASE_VOCAB)}
    for a, b in _validated(merges):
        vocab.setdefault(a + b, len(vocab))
    return vocab


def _validated(merges: list[tuple[str, str]]) -> list[tuple[str, str]]:
    _merge_replacements(merges)  # runs the alphabet validation
    return merges


def bpe_encode_ids(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "token_ids",
) -> DataFrame:
    """Append ``out_col`` (array<int> of vocabulary ids) and
    ``n_tokens`` — the form sequence packing / shard export consumes.

    The vocab rides into the plan as one literal ``map`` expression
    (≤ 37 + len(merges) entries — metadata-sized, no join, no
    broadcast variable), so the lookup stays inside whole-stage
    codegen like the merge chain itself.
    """
    vocab = bpe_vocab(merges)
    entries: list[Column] = []
    for tok, tid in vocab.items():
        entries.append(F.lit(tok))
        entries.append(F.lit(tid))
    vmap = F.create_map(*entries)
    toks = bpe_tokenize(df, merges, text_col, out_col="__tokens")
    return toks.withColumn(
        out_col,
        F.transform(F.col("__tokens"), lambda t: F.element_at(vmap, t)),
    ).drop("__tokens")


def _symbol_chain_sql(merges: list[tuple[str, str]], text_expr: str) -> str:
    """The DuckDB expression for the fully-merged symbol string of a
    document: words double-delimited and ``#``-joined, then the SAME
    literal replace chain :func:`bpe_tokenize` applies (one source of
    truth — ``_merge_replacements``)."""
    # words joined with a '#' boundary the merges can never cross:
    #   '|h||i||>|#|y||o||>|'
    sym = (
        "'|' || array_to_string("
        "list_transform(regexp_extract_all(lower(" + text_expr + "), '[a-z0-9]+'),"
        " w -> array_to_string(string_split(w, ''), '||') || '||>'"
        "), '|#|') || '|'"
    )
    for pat, rep in _merge_replacements(merges):
        sym = f"replace({sym}, '{pat}', '{rep}')"
    return sym


def bpe_token_count_sql(merges: list[tuple[str, str]], text_expr: str = "text") -> str:
    """ANSI-SQL expression computing the SAME per-row BPE token count as
    :func:`bpe_tokenize`'s ``n_tokens`` — the DuckDB-oracle twin.

    One source of truth: the replace chain comes from the identical
    ``_merge_replacements`` list the Spark expression uses; plain
    ``replace()`` has the same left-to-right non-overlap semantics in
    both engines.  Per word, a token carries exactly two ``|``
    delimiters, so ``n_tokens = count('|') / 2`` summed over words —
    expressible without any array lambda, which keeps the generated SQL
    portable.  Generated shape::

        (length(x) - length(replace(x, '|', ''))) / 2

    over ``x = replace(...(replace('|w1||w2|...', '|a||b|', '|ab|'))...)``
    of the document's words joined as one delimited string (words are
    separated by ``#`` — outside the symbol alphabet — so merges can
    never bridge two words).
    """
    sym = _symbol_chain_sql(merges, text_expr)
    return (
        f"CAST(CASE WHEN length(regexp_extract_all(lower({text_expr}), '[a-z0-9]+')) = 0 "
        f"THEN 0 ELSE (length({sym}) - length(replace({sym}, '|', ''))) // 2 END AS INTEGER)"
    )


def bpe_token_ids_sql(
    merges: list[tuple[str, str]], text_expr: str = "text"
) -> str:
    """ANSI-SQL expression for the comma-joined vocabulary ids of a
    document's BPE tokens — the DuckDB twin of :func:`bpe_encode_ids`
    (ids rendered as one string so the hash compare is array-free).

    Splitting the merged symbol string on ``|`` yields the tokens plus
    empty fragments (each token carries its own two delimiters) and the
    ``#`` word boundaries — both filtered out.  The token → id CASE is
    generated from the same :func:`bpe_vocab` table the Spark literal
    map uses.
    """
    sym = _symbol_chain_sql(merges, text_expr)
    case = " ".join(
        f"WHEN '{tok}' THEN {tid}" for tok, tid in bpe_vocab(merges).items()
    )
    toks = (
        f"list_filter(string_split({sym}, '|'), "
        "t -> t <> '' AND t <> '#')"
    )
    return (
        f"array_to_string(list_transform({toks}, "
        f"t -> CAST(CASE t {case} END AS VARCHAR)), ',')"
    )
