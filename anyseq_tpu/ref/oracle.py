"""Pure-numpy O(m*n) oracle for all alignment schemes.

This is the semantic ground truth the whole framework is tested against. It
re-states, in the simplest possible form, the reference recurrence
(/root/reference/src/align.impala:46-90), score extraction
(/root/reference/src/scoring.impala:29-137) and traceback walk
(/root/reference/src/traceback.impala:47-80). It is deliberately slow and
simple; never used on the hot path.

Canonical tie-breaking of this framework (documented deviations from the
reference, whose ties are block-iteration-order artifacts):

- relaxation priority on equal candidate scores: diag (NO_GAP) wins over
  query-gap (GAP_Q) wins over subject-gap (GAP_S) -- identical to the
  reference's strict ``>`` chain (align.impala:49-64).
- local / semiglobal maximum position ties: row-major first occurrence
  (smallest i, then smallest j). Semiglobal scans the last row before the
  last column and includes the boundary cells (i=m-1, j=-1) and
  (i=-1, j=n-1) with their init scores, matching scoring.impala:46-64
  (reduce_max over the vectors' -1 halo entries).
"""
from __future__ import annotations

import numpy as np

from anyseq_tpu.core.types import (
    EMPTY_SYM,
    GAP_SYM,
    NP_SCORE,
    PRED_GAP_Q,
    PRED_GAP_S,
    PRED_NO_GAP,
    PRED_NONE,
    LinearScoring,
    Mode,
    as_u8,
    init_score,
)


def dp_full(query, subject, mode: Mode, scoring: LinearScoring):
    """Full DP. Returns (H, P): score and predecessor matrices of shape
    (m+1, n+1) where index 0 is the -1 boundary row/column."""
    q = as_u8(query)
    s = as_u8(subject)
    m, n = len(q), len(s)
    mode = Mode.parse(mode)

    H = np.zeros((m + 1, n + 1), dtype=NP_SCORE)
    P = np.zeros((m + 1, n + 1), dtype=np.uint8)

    ii = np.arange(-1, m)
    jj = np.arange(-1, n)
    H[:, 0] = init_score(mode, scoring, ii)
    H[0, :] = init_score(mode, scoring, jj)

    # Border predecessors (reference: align.impala:88-90, predecessors.impala:16-17)
    if mode is Mode.GLOBAL:
        P[1:, 0] = PRED_GAP_S
        P[0, 1:] = PRED_GAP_Q
    P[0, 0] = PRED_NONE

    local = mode is Mode.LOCAL
    match, mismatch, gap = scoring.match, scoring.mismatch, scoring.gap

    # Anti-diagonal sweep; all three reads are from completed diagonals.
    for t in range(m + n - 1):
        i_lo = max(0, t - n + 1)
        i_hi = min(t, m - 1)
        if i_lo > i_hi:
            continue
        i = np.arange(i_lo, i_hi + 1)
        j = t - i
        sub = np.where(q[i] == s[j], match, mismatch).astype(NP_SCORE)

        score = H[i, j] + sub  # diag
        pred = np.full(score.shape, PRED_NO_GAP, dtype=np.uint8)

        qgap = H[i + 1, j] + gap  # left: (i, j-1)
        take = qgap > score
        score = np.where(take, qgap, score)
        pred = np.where(take, PRED_GAP_Q, pred)

        sgap = H[i, j + 1] + gap  # up: (i-1, j)
        take = sgap > score
        score = np.where(take, sgap, score)
        pred = np.where(take, PRED_GAP_S, pred)

        if local:
            take = score < 0
            score = np.where(take, 0, score)
            pred = np.where(take, PRED_NONE, pred)

        H[i + 1, j + 1] = score
        P[i + 1, j + 1] = pred

    return H, P


def extract_score(H, mode: Mode, scoring: LinearScoring):
    """Score and end position (i, j) in 0-based cell coordinates.

    Reference: get_{global,semiglobal,local}_scoring_linmem
    (scoring.impala:29-137). Positions may be -1 on the boundary (semiglobal
    empty-overlap edge case, see module docstring).
    """
    mode = Mode.parse(mode)
    m, n = H.shape[0] - 1, H.shape[1] - 1
    if mode is Mode.GLOBAL:
        return int(H[m, n]), (m - 1, n - 1)
    if mode is Mode.SEMIGLOBAL:
        # last row candidates: j = -1 .. n-1 (the -1 halo holds the column
        # init for row m-1); then last column candidates: i = -1 .. m-1.
        row = np.concatenate(
            [[init_score(mode, scoring, m - 1)], H[m, 1:]]
        )
        ri = int(np.argmax(row))
        score = int(row[ri])
        pos = (m - 1, ri - 1)
        col = np.concatenate([[init_score(mode, scoring, n - 1)], H[1:, n]])
        ci = int(np.argmax(col))
        if int(col[ci]) > score:
            score = int(col[ci])
            pos = (ci - 1, n - 1)
        return score, pos
    # local: row-major first occurrence of the max
    flat = int(np.argmax(H[1:, 1:]))
    i, j = divmod(flat, n)
    return int(H[i + 1, j + 1]), (i, j)


def traceback(query, subject, P, end, out_q=None, out_s=None,
              offset_q: int = 0, offset_s: int = 0):
    """Reference traceback walk (src/traceback.impala:47-80).

    Writes the aligned pair of cell (i, j) at out position i + j + 1 (plus
    offsets), gap symbol '_', into byte buffers prefilled with ' '.
    Returns (start_i, start_j) of the alignment (local coordinates).
    """
    q = as_u8(query)
    s = as_u8(subject)
    m, n = len(q), len(s)
    if out_q is None:
        out_q = np.full(m + n, EMPTY_SYM, dtype=np.uint8)
    if out_s is None:
        out_s = np.full(m + n, EMPTY_SYM, dtype=np.uint8)

    i, j = end
    pred = int(P[i + 1, j + 1])
    while pred != PRED_NONE:
        sym_q = GAP_SYM
        sym_s = GAP_SYM
        out_pos = i + j + 1 + offset_q + offset_s
        if pred in (PRED_NO_GAP, PRED_GAP_S):
            sym_q = int(q[i])
            i -= 1
        if pred in (PRED_NO_GAP, PRED_GAP_Q):
            sym_s = int(s[j])
            j -= 1
        out_q[out_pos] = sym_q
        out_s[out_pos] = sym_s
        pred = int(P[i + 1, j + 1])

    return out_q, out_s, (i + 1, j + 1)


def align_score(query, subject, mode, scoring=LinearScoring()) -> int:
    H, _ = dp_full(query, subject, mode, scoring)
    score, _ = extract_score(H, Mode.parse(mode), scoring)
    return score


def align(query, subject, mode, scoring=LinearScoring()):
    """Full oracle alignment. Returns (score, out_q, out_s, start)."""
    mode = Mode.parse(mode)
    H, P = dp_full(query, subject, mode, scoring)
    score, end = extract_score(H, mode, scoring)
    out_q, out_s, start = traceback(query, subject, P, end)
    return score, out_q, out_s, start
