"""Shared driver-side numeric helpers."""

from __future__ import annotations

import math


def round_half_away(v: float, decimals: int) -> float:
    """Half-away-from-zero rounding of a double — the same convention as
    Spark's ``F.round`` and DuckDB's ``round`` (see ``_pairs_above`` in
    similarity.py for the cross-engine precedent); Python's builtin
    ``round`` is banker's and would drift on exact halves. Used wherever
    DRIVER arithmetic must agree with an in-plan/SQL ``round`` (logreg
    weight updates, temperature-mix quota weights)."""
    s = 10.0 ** decimals
    if v >= 0:
        return math.floor(v * s + 0.5) / s
    return -math.floor(-v * s + 0.5) / s
