"""Pure-numpy Gotoh affine-gap oracle (3-matrix DP).

Beyond-reference capability: the reference's affine scheme is defined but
dead and non-functional (src/align.impala:153-166, SURVEY.md quirk Q3);
this is the real recurrence. Gap of length k costs gap_open + k*gap_extend.

Matrices (cell coordinates, -1 boundary at index 0):
  E[i][j] = best score ending in a gap-in-query (horizontal run): consumed
            subject up to j, query up to i.
  F[i][j] = best score ending in a gap-in-subject (vertical run).
  H[i][j] = best overall.

Recurrences (priority on ties: diag > E > F, then for E/F: open > extend --
fixed canonical tie-breaking of this framework):

  E[i][j] = max(H[i][j-1] + go + ge, E[i][j-1] + ge)
  F[i][j] = max(H[i-1][j] + go + ge, F[i-1][j] + ge)
  H[i][j] = max(H[i-1][j-1] + sub(i,j), E[i][j], F[i][j] [, 0 local])

Traceback is a 3-state machine; predecessor planes:
  PH in {NONE=0, GAP_Q=1 (E), GAP_S=2 (F), NO_GAP=3 (diag)} -- same codes
     as the linear scheme (align.impala:37-40), where GAP_Q/GAP_S mean
     "enter the E/F state here".
  PE in {0 = opened from H[i][j-1], 1 = extended E[i][j-1]}
  PF likewise for F.
"""
from __future__ import annotations

import numpy as np

from anyseq_tpu.core.types import (
    EMPTY_SYM,
    GAP_SYM,
    PRED_GAP_Q,
    PRED_GAP_S,
    PRED_NO_GAP,
    PRED_NONE,
    AffineScoring,
    Mode,
    as_u8,
)

NEG = np.int64(-(2**40))  # safe -inf: never selected, never overflows


def dp_full_affine(query, subject, mode: Mode, sc: AffineScoring):
    """Returns (H, E, F, PH, PE, PF) with shape (m+1, n+1), boundary at 0."""
    q = as_u8(query)
    s = as_u8(subject)
    m, n = len(q), len(s)
    mode = Mode.parse(mode)
    local = mode is Mode.LOCAL
    go, ge = sc.gap_open, sc.gap_extend

    H = np.zeros((m + 1, n + 1), dtype=np.int64)
    E = np.full((m + 1, n + 1), NEG, dtype=np.int64)
    F = np.full((m + 1, n + 1), NEG, dtype=np.int64)
    PH = np.zeros((m + 1, n + 1), dtype=np.uint8)
    PE = np.zeros((m + 1, n + 1), dtype=np.uint8)
    PF = np.zeros((m + 1, n + 1), dtype=np.uint8)

    if mode is Mode.GLOBAL:
        jj = np.arange(1, n + 1)
        ii = np.arange(1, m + 1)
        H[0, 1:] = go + jj * ge
        H[1:, 0] = go + ii * ge
        E[0, 1:] = go + jj * ge  # boundary rows ARE gap runs
        F[1:, 0] = go + ii * ge
        PH[0, 1:] = PRED_GAP_Q
        PH[1:, 0] = PRED_GAP_S
        PE[0, 2:] = 1
        PF[2:, 0] = 1

    for i in range(m):
        for j in range(n):
            e_open = H[i + 1, j] + go + ge
            e_ext = E[i + 1, j] + ge
            if e_open >= e_ext:
                E[i + 1, j + 1] = e_open
                PE[i + 1, j + 1] = 0
            else:
                E[i + 1, j + 1] = e_ext
                PE[i + 1, j + 1] = 1

            f_open = H[i, j + 1] + go + ge
            f_ext = F[i, j + 1] + ge
            if f_open >= f_ext:
                F[i + 1, j + 1] = f_open
                PF[i + 1, j + 1] = 0
            else:
                F[i + 1, j + 1] = f_ext
                PF[i + 1, j + 1] = 1

            sub = sc.match if q[i] == s[j] else sc.mismatch
            best = H[i, j] + sub
            pred = PRED_NO_GAP
            if E[i + 1, j + 1] > best:
                best = E[i + 1, j + 1]
                pred = PRED_GAP_Q
            if F[i + 1, j + 1] > best:
                best = F[i + 1, j + 1]
                pred = PRED_GAP_S
            if local and best < 0:
                best = 0
                pred = PRED_NONE
            H[i + 1, j + 1] = best
            PH[i + 1, j + 1] = pred

    return H, E, F, PH, PE, PF


def extract_score_affine(H, mode: Mode):
    mode = Mode.parse(mode)
    m, n = H.shape[0] - 1, H.shape[1] - 1
    if mode is Mode.GLOBAL:
        return int(H[m, n]), (m - 1, n - 1)
    if mode is Mode.SEMIGLOBAL:
        row = np.concatenate([[0], H[m, 1:]])
        ri = int(np.argmax(row))
        score = int(row[ri])
        pos = (m - 1, ri - 1)
        col = np.concatenate([[0], H[1:, n]])
        ci = int(np.argmax(col))
        if int(col[ci]) > score:
            score = int(col[ci])
            pos = (ci - 1, n - 1)
        return score, pos
    flat = int(np.argmax(H[1:, 1:]))
    i, j = divmod(flat, n)
    return int(H[i + 1, j + 1]), (i, j)


def traceback_affine(query, subject, PH, PE, PF, end,
                     out_q=None, out_s=None, offset_q=0, offset_s=0):
    """3-state traceback walk. Output convention identical to the linear
    traceback (out_pos = i + j + 1, '_' gaps, ' ' sparse)."""
    q = as_u8(query)
    s = as_u8(subject)
    m, n = len(q), len(s)
    if out_q is None:
        out_q = np.full(m + n, EMPTY_SYM, dtype=np.uint8)
    if out_s is None:
        out_s = np.full(m + n, EMPTY_SYM, dtype=np.uint8)

    i, j = end
    state = "H"
    while True:
        if state == "H":
            pred = int(PH[i + 1, j + 1])
            if pred == PRED_NONE:
                break
            if pred == PRED_NO_GAP:
                out_pos = i + j + 1 + offset_q + offset_s
                out_q[out_pos] = int(q[i])
                out_s[out_pos] = int(s[j])
                i -= 1
                j -= 1
            elif pred == PRED_GAP_Q:
                state = "E"
            else:
                state = "F"
        elif state == "E":
            out_pos = i + j + 1 + offset_q + offset_s
            out_q[out_pos] = GAP_SYM
            out_s[out_pos] = int(s[j])
            opened = int(PE[i + 1, j + 1]) == 0
            j -= 1
            if opened:
                state = "H"
        else:  # F
            out_pos = i + j + 1 + offset_q + offset_s
            out_q[out_pos] = int(q[i])
            out_s[out_pos] = GAP_SYM
            opened = int(PF[i + 1, j + 1]) == 0
            i -= 1
            if opened:
                state = "H"
        if i < 0 and j < 0:
            break

    return out_q, out_s, (i + 1, j + 1)


def align_score_affine(query, subject, mode, sc: AffineScoring) -> int:
    H, *_ = dp_full_affine(query, subject, mode, sc)
    score, _ = extract_score_affine(H, Mode.parse(mode))
    return score


def align_affine(query, subject, mode, sc: AffineScoring):
    mode = Mode.parse(mode)
    H, E, F, PH, PE, PF = dp_full_affine(query, subject, mode, sc)
    score, end = extract_score_affine(H, mode)
    out_q, out_s, start = traceback_affine(query, subject, PH, PE, PF, end)
    return score, out_q, out_s, start
