"""Gotoh affine-gap scoring engine in pure XLA (linear memory).

Same row-sweep architecture as xla_linmem, one extra prefix-scan: the
horizontal gap matrix satisfies

    E[i][j] = max_{k < j} ( T[i][k] + go + (j-k)*ge ),
    T[i][j] = max(diag + sub, F[i][j] [, 0 local]),

because re-opening from an E-derived H value can never beat continuing the
same run (go <= 0). So E is one ``lax.cummax`` over T - j*ge, exactly like
the linear engine's H scan -- the affine upgrade costs one extra vector op
per row, not a sequential loop. F (vertical) depends only on the previous
row. See ref/oracle_affine.py for the semantics oracle.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from anyseq_tpu.core.types import (
    PRED_GAP_Q,
    PRED_GAP_S,
    PRED_NO_GAP,
    PRED_NONE,
    SCORE_MIN,
    AffineScoring,
    Mode,
    Score,
)

NEG = -(2**29)  # safe -inf within int32 under repeated +gap


def _shift1(vec, fill):
    return jnp.concatenate(
        [jnp.reshape(fill, (1,)).astype(Score), vec[:-1]]
    )


def _col_bound(mode, sc, i):
    """H[i][-1] boundary (i may be an array); the corner H[-1][-1] is 0."""
    if mode is Mode.GLOBAL:
        return jnp.where(
            i < 0, 0, sc.gap_open + (i + 1) * sc.gap_extend
        )
    return jnp.zeros_like(i)


def _affine_row(H_prev, F_prev, q_sym, s, col_i, col_im1, jge, mode, sc):
    go, ge = sc.gap_open, sc.gap_extend
    F = jnp.maximum(H_prev + go + ge, F_prev + ge)
    diag = _shift1(H_prev, col_im1)
    sub = jnp.where(q_sym == s, sc.match, sc.mismatch).astype(Score)
    T = jnp.maximum(diag + sub, F)
    if mode is Mode.LOCAL:
        T = jnp.maximum(T, 0)
    cm = jax.lax.cummax(T - jge)
    E = go + jge + jnp.maximum(_shift1(cm, NEG), col_i + ge)
    H = jnp.maximum(T, E)
    return H, E, F, diag, sub


@functools.partial(
    jax.jit, static_argnames=("mode", "sc", "start_gap", "emit_col_e")
)
def score_rows_affine(q, s, m, n, mode: Mode, sc: AffineScoring,
                      start_gap: bool = False, emit_col_e: bool = False):
    """Affine analog of xla_linmem.score_rows; same outputs contract.

    start_gap (GLOBAL only): the alignment enters the rectangle's top
    boundary row already inside a horizontal gap run whose gap_open was
    paid by the caller -- the boundary row init drops its gap_open, and
    the corner + left boundary column become unreachable (the incoming
    run must consume column 0 at the boundary row). Myers-Miller
    crossing-state subproblem, see engine/hirschberg.py.

    emit_col_e: additionally return ``last_col_e`` = E[i][n-1], the
    horizontal-gap-state boundary column the Myers-Miller merge needs.
    """
    N = s.shape[0]
    M = q.shape[0]
    jge = jnp.arange(N, dtype=Score) * sc.gap_extend
    jmask = jnp.arange(N) < n

    if mode is Mode.GLOBAL:
        row0 = _col_bound(mode, sc, jnp.arange(N, dtype=Score))
        if start_gap:
            row0 = row0 - sc.gap_open
    else:
        row0 = jnp.zeros((N,), Score)

    def body(i, carry):
        H_prev, F_prev, last_col, last_col_e, best = carry
        if start_gap and mode is Mode.GLOBAL:
            col_i = jnp.int32(NEG)
            col_im1 = jnp.int32(NEG)
        else:
            col_i = _col_bound(mode, sc, i).astype(Score)
            col_im1 = _col_bound(mode, sc, i - 1).astype(Score)
        H, E, F, _, _ = _affine_row(
            H_prev, F_prev, q[i], s, col_i, col_im1, jge, mode, sc
        )
        last_col = last_col.at[i].set(H[n - 1])
        if emit_col_e:
            last_col_e = last_col_e.at[i].set(E[n - 1])
        masked = jnp.where(jmask, H, SCORE_MIN)
        rmax = jnp.max(masked)
        rarg = jnp.argmax(masked)
        take = rmax > best[0]
        best = jnp.where(
            take,
            jnp.stack([rmax, i.astype(Score), rarg.astype(Score)]),
            best,
        )
        return H, F, last_col, last_col_e, best

    init = (
        row0,
        jnp.full((N,), NEG, Score),
        jnp.full((M,), SCORE_MIN, Score),
        jnp.full((M,), NEG, Score),
        jnp.array([SCORE_MIN, -1, -1], Score),
    )
    H, F, last_col, last_col_e, best = jax.lax.fori_loop(0, m, body, init)
    out = {"last_row": H, "last_col": last_col, "best": best}
    if emit_col_e:
        out["last_col_e"] = last_col_e
    return out


@functools.partial(jax.jit, static_argnames=("mode", "sc"))
def score_rows_affine_with_preds(q, s, m, n, mode: Mode, sc: AffineScoring):
    """Affine scoring emitting packed predecessors: bits 0-1 = PH (codes as
    align.impala:37-40), bit 2 = PE extend, bit 3 = PF extend."""
    N = s.shape[0]
    M = q.shape[0]
    go, ge = sc.gap_open, sc.gap_extend
    jge = jnp.arange(N, dtype=Score) * ge
    jmask = jnp.arange(N) < n

    row0 = _col_bound(
        mode, sc, jnp.arange(N, dtype=Score)
    ) if mode is Mode.GLOBAL else jnp.zeros((N,), Score)

    def body(i, carry):
        H_prev, F_prev, preds, last_col, best = carry
        col_i = _col_bound(mode, sc, i).astype(Score)
        col_im1 = _col_bound(mode, sc, i - 1).astype(Score)
        H, E, F, diag, sub = _affine_row(
            H_prev, F_prev, q[i], s, col_i, col_im1, jge, mode, sc
        )
        # PH with priority diag > E > F, NONE if clamped (local)
        ph = jnp.where(
            H == diag + sub,
            PRED_NO_GAP,
            jnp.where(
                H == E,
                PRED_GAP_Q,
                jnp.where(H == F, PRED_GAP_S, PRED_NONE),
            ),
        )
        h_left = _shift1(H, col_i)
        pe = jnp.where(E == h_left + go + ge, 0, 1)  # 0 = opened
        pf = jnp.where(F == H_prev + go + ge, 0, 1)
        packed = (ph + pe * 4 + pf * 8).astype(jnp.uint8)
        preds = jax.lax.dynamic_update_slice(preds, packed[None, :], (i, 0))
        last_col = last_col.at[i].set(H[n - 1])
        masked = jnp.where(jmask, H, SCORE_MIN)
        rmax = jnp.max(masked)
        rarg = jnp.argmax(masked)
        take = rmax > best[0]
        best = jnp.where(
            take,
            jnp.stack([rmax, i.astype(Score), rarg.astype(Score)]),
            best,
        )
        return H, F, preds, last_col, best

    init = (
        row0,
        jnp.full((N,), NEG, Score),
        jnp.zeros((M, N), jnp.uint8),
        jnp.full((M,), SCORE_MIN, Score),
        jnp.array([SCORE_MIN, -1, -1], Score),
    )
    H, F, preds, last_col, best = jax.lax.fori_loop(0, m, body, init)
    return {
        "last_row": H,
        "last_col": last_col,
        "best": best,
        "preds": preds,
    }
