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

from decimal import ROUND_HALF_UP, Decimal

import numpy as np


def round_half_up(a: "np.ndarray", digits: int = 0) -> "np.ndarray":
    """Element-wise round matching Spark ``F.round`` exactly.

    Spark evaluates ``BigDecimal(Double.toString(x)).setScale(d,
    HALF_UP)`` — the tie test happens on the SHORTEST DECIMAL
    REPRESENTATION of x, not on the binary value.  The fast
    ``sign(x) * floor(|x| * 10^d + 0.5) / 10^d`` formula agrees except
    when ``x * 10^d`` sits a few ULPs off an integer-plus-half (e.g.
    0.285 at 2 digits: the float product is 28.499999999999996 so the
    formula floors to 0.28, while Spark sees the repr tie "0.285" and
    rounds HALF_UP to 0.29 — ADVICE r8).  So: vectorized fast path,
    then a ``Decimal(repr(x))`` replay for the near-tie elements only.
    Python ``repr`` is the same shortest-round-trip decimal contract as
    Java ``Double.toString``, so the slow path is bit-exact.
    """
    s = np.asarray(a, dtype=np.float64)
    p = float(10**digits)
    scaled = s * p
    # Allocation-lean evaluation (r13 optimization round, guide §4.2/§5):
    # the naive expression chain materializes ~12 input-sized
    # temporaries; on big matrices (|batch| x C assignment scores) that
    # is GBs of fresh pages per call.  Same float ops in the same order
    # — multiplication is commutative and every np.* below is the same
    # IEEE-754 op the old chain ran — just chained in-place through two
    # scratch buffers, so results are bit-identical.
    babs = np.abs(scaled)
    fast = babs + 0.5
    np.floor(fast, out=fast)
    np.multiply(fast, np.sign(scaled), out=fast)
    np.divide(fast, p, out=fast)
    # Near-tie window: binary-vs-decimal disagreement requires the float
    # product to sit within rounding error of an exact .5 boundary.  The
    # window is ULP-scaled (ADVICE r9): a fixed 1e-6 stops covering the
    # representation error once |scaled| exceeds ~4.5e9 (one double ULP
    # is then > 1e-6), so a shortest-decimal tie could sit outside a
    # fixed window, skip the Decimal replay, and diverge from F.round.
    frac = babs - np.floor(babs)          # frac of |scaled|
    np.subtract(frac, 0.5, out=frac)
    np.abs(frac, out=frac)                # |frac - 0.5|
    np.spacing(babs, out=babs)
    np.multiply(babs, 4.0, out=babs)
    np.maximum(babs, 1e-6, out=babs)      # ULP-scaled tie window
    near_tie = frac < babs
    if near_tie.any():
        q = Decimal(1).scaleb(-digits)
        flat = np.ravel(fast)
        src = np.ravel(s)
        for i in np.flatnonzero(np.ravel(near_tie)):
            flat[i] = float(
                Decimal(repr(float(src[i]))).quantize(q, rounding=ROUND_HALF_UP)
            )
    return fast


def to_cents_half_up(values: "np.ndarray") -> "np.ndarray":
    """HALF_UP integer cents — the exact grid ``F.round(value*100, 0)``
    puts batch operators on (see ext/timeseries.py rolling_zscore)."""
    v = np.asarray(values, dtype=np.float64) * 100.0
    return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype("int64")
