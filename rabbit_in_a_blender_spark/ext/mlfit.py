"""Distributed iterative model fitting: logistic regression by full-batch
gradient descent, oracle-reproducible.

The quality-classifier shape every corpus pipeline eventually needs
(FineWeb-style "does this doc look like reference text?"), built the
way MLlib builds it — the DATA never leaves the cluster, the MODEL
(a handful of floats) lives on the driver:

- each step is ONE distributed aggregation: g = Σ x·(σ(w·x) − y) with
  the current weights folded in as literals (broadcast scalars);
- the driver updates w and rounds every component onto a fixed decimal
  grid (1e-8), exactly like `ext/graph.py::pagerank` rounds per step —
  that makes the whole iteration replayable in ANY engine as an
  unrolled chained-CTE, so a 5-step training run is hash-checkable
  against a DuckDB oracle (``logreg_oracle_sql`` builds it);
- per-step gradient sums are rounded (1e-6) before the update: the
  only cross-engine noise is libm-vs-JVM ``exp`` ulps, orders of
  magnitude below the grid.

Scale notes: per step the wire carries d+1 floats per partition
(partial gradient sums) — independent of row count; steps scans are
the only cost, so cache the feature frame once and release it
(track_cache contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..core.caching import track_cache

GRAD_GRID = 6  # decimals kept on each gradient sum
W_GRID = 8  # decimals kept on each weight


def _z(feature_cols: list[str], w: list[float]):
    z = F.lit(w[0])  # intercept
    for c, wi in zip(feature_cols, w[1:]):
        z = z + F.lit(wi) * F.col(c)
    return z


def logreg_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    steps: int = 5,
    lr: float = 0.5,
) -> list[float]:
    """Full-batch GD for logistic regression; returns [intercept, w...].

    Deterministic across engines/partitionings: gradient sums land on
    the 1e-6 grid (sums of ≤1-ulp-noisy terms — the rounding absorbs
    libm differences), weights on the 1e-8 grid.
    """
    feats = df.select(
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("double").alias("__y"),
    ).persist()
    try:
        n = feats.count()
        w = [0.0] * (len(feature_cols) + 1)
        for _ in range(steps):
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(feature_cols, w)))
            err = p - F.col("__y")
            g = feats.agg(
                F.round(F.sum(err), GRAD_GRID).alias("g0"),
                *[
                    F.round(F.sum(err * F.col(c)), GRAD_GRID).alias(f"g{i + 1}")
                    for i, c in enumerate(feature_cols)
                ],
            ).collect()[0]
            w = [
                round(wi - lr * g[i] / n, W_GRID)
                for i, wi in enumerate(w)
            ]
        return w
    finally:
        feats.unpersist()


def logreg_metrics(
    df: DataFrame, feature_cols: list[str], label_col: str, w: list[float]
) -> DataFrame:
    """Confusion counts + rounded accuracy of weights ``w`` on ``df``.

    One aggregation pass; the model rides in as literals.  The result
    frame carries the learned weights too, so a single catalog row
    proves the whole training run.
    """
    feats = df.select(
        *[F.col(c).cast("double").alias(c) for c in feature_cols],
        F.col(label_col).cast("double").alias("__y"),
    )
    pred = (_z(feature_cols, w) > 0).cast("int")
    y = F.col("__y").cast("int")
    agg = feats.agg(
        F.sum(((pred == 1) & (y == 1)).cast("long")).alias("tp"),
        F.sum(((pred == 1) & (y == 0)).cast("long")).alias("fp"),
        F.sum(((pred == 0) & (y == 1)).cast("long")).alias("fn"),
        F.sum(((pred == 0) & (y == 0)).cast("long")).alias("tn"),
    ).withColumn(
        "accuracy",
        F.round(
            (F.col("tp") + F.col("tn"))
            / (F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")),
            4,
        ),
    )
    for i, wi in enumerate(w):
        agg = agg.withColumn(f"w{i}", F.lit(float(wi)))
    return track_cache(agg, [])


def logreg_oracle_sql(
    xy_sql: str,
    n_features: int,
    steps: int = 5,
    lr: float = 0.5,
) -> str:
    """Unrolled DuckDB twin of logreg_fit + logreg_metrics.

    ``xy_sql`` must yield columns x1..x{n_features}, y.  Each step is a
    single-row CTE holding the rounded weights; the next step's
    gradient CTE cross-joins it — the same chained-CTE replay the
    PageRank oracle uses.
    """
    cols = [f"x{i + 1}" for i in range(n_features)]
    parts = [f"xy AS ({xy_sql})"]
    prev = None
    for s in range(steps):
        if prev is None:
            z = "0.0"
        else:
            z = f"{prev}.w0 + " + " + ".join(
                f"{prev}.w{i + 1} * {c}" for i, c in enumerate(cols)
            )
        src = "xy" if prev is None else f"xy CROSS JOIN {prev}"
        gsel = ", ".join(
            [f"ROUND(SUM(1.0/(1.0+exp(-({z}))) - y), {GRAD_GRID}) AS g0"]
            + [
                f"ROUND(SUM((1.0/(1.0+exp(-({z}))) - y) * {c}), {GRAD_GRID})"
                f" AS g{i + 1}"
                for i, c in enumerate(cols)
            ]
            + ["COUNT(*) AS n"]
        )
        parts.append(f"grad{s} AS (SELECT {gsel} FROM {src})")
        wprev = [f"{prev}.w{i}" if prev else "0.0" for i in range(n_features + 1)]
        wsel = ", ".join(
            f"ROUND({wprev[i]} - {lr} * grad{s}.g{i} / grad{s}.n, {W_GRID}) AS w{i}"
            for i in range(n_features + 1)
        )
        src_w = f"grad{s}" if prev is None else f"grad{s} CROSS JOIN {prev}"
        parts.append(f"w{s} AS (SELECT {wsel} FROM {src_w})")
        prev = f"w{s}"
    z = f"{prev}.w0 + " + " + ".join(
        f"{prev}.w{i + 1} * {c}" for i, c in enumerate(cols)
    )
    wcols = ", ".join(
        f"MAX({prev}.w{i}) AS w{i}" for i in range(n_features + 1)
    )
    return f"""
    WITH {", ".join(parts)}
    SELECT CAST(SUM(CASE WHEN {z} > 0 AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(SUM(CASE WHEN {z} > 0 AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(SUM(CASE WHEN NOT ({z} > 0) AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           CAST(SUM(CASE WHEN NOT ({z} > 0) AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
           ROUND((SUM(CASE WHEN {z} > 0 AND y = 1 THEN 1 ELSE 0 END)
                  + SUM(CASE WHEN NOT ({z} > 0) AND y = 0 THEN 1 ELSE 0 END)) * 1.0
                 / COUNT(*), 4) AS accuracy,
           {wcols}
    FROM xy CROSS JOIN {prev}
    """


# --- persisted inference mode (VERDICT r10 task 7) ----------------------
#
# The distilled quality filter is useful across crawls: train once on a
# labeled slice, persist the handful of floats, then score-only every
# later batch — the same freeze-and-reuse shape as --dsir-model.  The
# model file carries the feature column list so scoring can never
# silently run against mismatched features.

QUALITY_FEATURES = ["f_length", "f_stopword", "f_punct", "f_wordlen"]


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, f_length, f_stopword, f_punct, f_wordlen): the standard
    quality-classifier feature vector (FineWeb-style inputs), every
    component a JVM-side expression rounded to 1e-4 so both training
    and scoring replay identically in any engine.

    - f_length: min(words/64, 1) — the C4 length ramp;
    - f_stopword: share of English stopwords (ext/text.py list);
    - f_punct: punctuation chars per character;
    - f_wordlen: (chars/word)/10 — long-token gibberish signal.
    """
    from .text import STOPWORDS_EN

    words = F.split(F.col(text_col), " ")
    n_words = F.greatest(F.size(words), F.lit(1))
    sw = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    return df.select(
        F.col(id_col),
        F.round(
            F.least(F.size(words) / F.lit(64.0), F.lit(1.0)), 4
        ).alias("f_length"),
        F.round(
            F.size(F.filter(words, lambda w: F.array_contains(sw, w)))
            / n_words,
            4,
        ).alias("f_stopword"),
        F.round(
            F.regexp_count(F.col(text_col), F.lit(r"[.,;:!?]"))
            / F.greatest(F.length(F.col(text_col)), F.lit(1)),
            4,
        ).alias("f_punct"),
        F.round(
            (F.length(F.col(text_col)) - (F.size(words) - 1))
            / n_words / F.lit(10.0),
            4,
        ).alias("f_wordlen"),
    )


def logreg_score(
    df: DataFrame,
    feature_cols: list[str],
    w: list[float],
    score_col: str = "score",
) -> DataFrame:
    """Attach ``score_col`` = sigmoid(w·x) rounded to 1e-6 — pure
    scoring, no training pass.  The model rides in as literals (d+1
    floats), so the plan is a narrow zero-shuffle projection at any
    corpus size; train→save→load→score equals scoring with the
    in-memory weights bit-for-bit (pytest-pinned)."""
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(feature_cols, w)))
    return df.withColumn(score_col, F.round(p, 6))


def save_logreg_model(path: str, w: list[float], feature_cols: list[str]) -> None:
    """Persist weights + feature list as one JSON file via hidden-temp
    + rename (atomic on posix, same recipe as ext/dsir.py's fold)."""
    import json
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = os.path.join(
        os.path.dirname(path) or ".", "." + os.path.basename(path) + ".tmp"
    )
    with open(tmp, "w") as fh:
        json.dump(
            {
                "weights": [float(x) for x in w],
                "features": list(feature_cols),
                "grids": {"grad": GRAD_GRID, "w": W_GRID},
            },
            fh,
        )
    os.rename(tmp, path)


def load_logreg_model(path: str) -> tuple[list[float], list[str]]:
    """(weights, feature_cols) from :func:`save_logreg_model` output;
    raises ValueError on a malformed file rather than guessing."""
    import json

    with open(path) as fh:
        m = json.load(fh)
    try:
        w = [float(x) for x in m["weights"]]
        feats = [str(c) for c in m["features"]]
    except (KeyError, TypeError, ValueError) as e:
        raise ValueError(f"malformed logreg model at {path}: {e}")
    if len(w) != len(feats) + 1:
        raise ValueError(
            f"model at {path} has {len(w)} weights for {len(feats)} "
            "features (want features+1 incl. intercept)"
        )
    return w, feats
