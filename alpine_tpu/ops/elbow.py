"""Kneedle elbow detection (replacement for the `kneed` dependency).

The reference auto-selects `max_iter` by locating the elbow of the
log10 reconstruction-loss curve of a 200-iteration warm-up fit with
``KneeLocator(curve="convex", direction="decreasing",
interp_method="polynomial", polynomial_degree=2)``
(`/root/reference/alpine/main.py:755-770`).  `kneed` is unavailable here, so
this is a self-contained implementation of the Kneedle algorithm
(Satopaa et al., 2011): polynomial smoothing, min-max normalization,
transformation to a concave-increasing curve, and the first
threshold-surviving local maximum of the difference curve.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _normalize(v: np.ndarray) -> np.ndarray:
    vmin, vmax = float(v.min()), float(v.max())
    if vmax == vmin:
        return np.zeros_like(v)
    return (v - vmin) / (vmax - vmin)


def find_elbow(
    y: np.ndarray,
    curve: str = "convex",
    direction: str = "decreasing",
    polynomial_degree: int = 2,
    S: float = 1.0,
) -> Optional[int]:
    """Return the x-index of the knee/elbow of ``y`` (x = 0..len(y)-1),
    or None if no elbow is found (caller falls back to a default, matching
    the reference's warning path at main.py:766-770)."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    if n < 3:
        return None
    x = np.arange(n, dtype=np.float64)

    # polynomial interpolation/smoothing (kneed interp_method="polynomial")
    coeffs = np.polyfit(x, y, polynomial_degree)
    y_s = np.polyval(coeffs, x)

    x_n = _normalize(x)
    y_n = _normalize(y_s)

    # transform to a concave increasing curve
    if curve == "convex" and direction == "decreasing":
        y_t = 1.0 - y_n  # vertical flip; x orientation preserved
        flip_x = False
    elif curve == "concave" and direction == "increasing":
        y_t = y_n
        flip_x = False
    elif curve == "concave" and direction == "decreasing":
        y_t = y_n[::-1]
        flip_x = True
    elif curve == "convex" and direction == "increasing":
        y_t = (1.0 - y_n)[::-1]
        flip_x = True
    else:
        raise ValueError(f"unknown curve/direction: {curve}/{direction}")

    d = y_t - x_n  # difference curve
    # snap float noise to exact zero: on a perfectly straight line d is
    # identically 0 up to rounding, and the minima-zeroed threshold below
    # would otherwise fire on a -1e-16 wiggle and invent a knee where
    # kneed (exact zeros) reports none
    d[np.abs(d) < 1e-12] = 0.0

    # local extrema of the difference curve (>=/<= marks plateau points,
    # like scipy.argrelextrema with greater_equal/less_equal in kneed)
    interior = np.arange(1, n - 1)
    is_max = (d[interior] >= d[interior - 1]) & (d[interior] >= d[interior + 1])
    maxima = interior[is_max]
    is_min = (d[interior] <= d[interior - 1]) & (d[interior] <= d[interior + 1])
    minima = set(interior[is_min].tolist())
    if maxima.size == 0:
        return None

    # kneed's offline (default) traversal, which the reference relies on:
    # walk the curve from the first local max; each local max RESETS the
    # threshold to d_max - S*mean(dx) (so an intervening higher max
    # discards an earlier candidate), each local minimum zeroes it, and the
    # FIRST point dropping below the active threshold declares the last
    # thresholded max the knee.  (The earlier round's any-later-drop check
    # could accept an early max kneed would have discarded.)
    threshold_drop = S * np.mean(np.diff(x_n))
    maxima_set = set(maxima.tolist())
    threshold = 0.0
    threshold_index = int(maxima[0])
    for i in range(int(maxima[0]), n - 1):
        if i in maxima_set:
            threshold = d[i] - threshold_drop
            threshold_index = i
        if i in minima:
            threshold = 0.0
        if d[i + 1] < threshold:
            idx = threshold_index
            return (n - 1 - idx) if flip_x else idx
    # no threshold crossing: kneed's KneeLocator reports no knee, and the
    # reference then warns + uses the default max_iter (main.py:766-770);
    # returning the global interior max here would silently pick a spurious
    # near-end iteration count instead
    return None
