"""HALF_UP rounding for numpy paths that must match Spark ``F.round``.

Spark rounds doubles with ``BigDecimal`` ``ROUND_HALF_UP`` semantics
(ties away from zero on the shortest decimal representation), while
``numpy.round`` / ``pandas.Series.round`` are banker's rounding (ties
to even).  Every Arrow/numpy twin of a JVM operator that rounds must
use these helpers so a score landing exactly on a representable ``.5``
tie orders identically under both comparators (ADVICE r7).

Leaf module on purpose: no package-internal imports, so adding it to a
query's closure doesn't flood the staleness derivation.
"""

from __future__ import annotations

import numpy as np


def round_half_up(a: "np.ndarray", digits: int = 0) -> "np.ndarray":
    """Element-wise round-half-away-from-zero, matching Spark ``F.round``.

    ``sign(x) * floor(|x| * 10^d + 0.5) / 10^d`` — the formula Spark's
    HALF_UP reduces to for the magnitudes these pipelines round (scores
    in [-1, 1], averages on a cents grid).
    """
    p = float(10**digits)
    s = np.asarray(a, dtype=np.float64) * p
    return np.sign(s) * np.floor(np.abs(s) + 0.5) / p


def to_cents_half_up(values: "np.ndarray") -> "np.ndarray":
    """HALF_UP integer cents — the exact grid ``F.round(value*100, 0)``
    puts batch operators on (see ext/timeseries.py rolling_zscore)."""
    v = np.asarray(values, dtype=np.float64) * 100.0
    return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype("int64")
