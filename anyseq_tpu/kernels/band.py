"""Pallas TPU anti-diagonal wavefront kernel (placeholder until implemented).

Will hold the skewed (8,128)-vectorized band kernel; see SURVEY.md §7.
"""
from __future__ import annotations


def available() -> bool:
    return False


def score_pair(qp, sp, m, n, mode, scoring):  # pragma: no cover
    raise NotImplementedError("pallas band kernel not yet implemented")
