"""On-device traceback over the kernel's packed predecessor layout.

The full-matrix traceback path traditionally fetches the O(m*n) pred
matrix to the host and walks there (reference: predc.get_matrix_cpu +
traceback_offset, align.impala:202-205). On a tunneled/remote TPU that
fetch dominates end-to-end time (tens of MB per alignment). Instead the
walk runs as a jitted ``lax.while_loop`` directly over the packed array
in HBM: O(m+n) iterations, each one dynamic-sliced int32 word, and only
the O(m+n) gapped strings leave the device.

Packed layout (see kernels/band.py): word for cell (i, j) at flat index
(w * p_pl + t // 16) * W + p with w = j // W, p = j % W, t = i + p; code
bits [2*(t%16), 2*(t%16)+2), codes per align.impala:37-40. Emission
convention matches ref/oracle.traceback (out position i + j + 1, gap
symbol '_').
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from anyseq_tpu.core.types import (
    EMPTY_SYM,
    GAP_SYM,
    PRED_GAP_Q,
    PRED_GAP_S,
    PRED_NO_GAP,
    PRED_NONE,
    Mode,
)
from anyseq_tpu.kernels.band import W


@functools.partial(jax.jit, static_argnames=("mode", "p_pl", "out_len"))
def _walk(packed, q, s, end_i, end_j, mode: Mode, p_pl: int,
          out_len: int):
    flat = packed.reshape(-1)
    is_global = mode is Mode.GLOBAL

    def code_at(i, j):
        w = j // W
        p = jax.lax.rem(j, W)
        t = i + p
        word = jax.lax.dynamic_index_in_dim(
            flat, (w * p_pl + t // 16) * W + p, keepdims=False
        )
        interior = (word >> (2 * jax.lax.rem(t, 16))) & 3
        if is_global:
            # Halo semantics (predecessors.impala:11-34): row -1 walks
            # left (GAP_Q), column -1 walks up (GAP_S), corner stops.
            bdy = jnp.where(
                jnp.logical_and(i < 0, j < 0),
                PRED_NONE,
                jnp.where(i < 0, PRED_GAP_Q, PRED_GAP_S),
            )
        else:
            bdy = jnp.full((), PRED_NONE, jnp.int32)
        return jnp.where(jnp.logical_or(i < 0, j < 0), bdy, interior)

    def cond(st):
        i, j, _, _ = st
        return code_at(i, j) != PRED_NONE

    def body(st):
        i, j, oq, os = st
        code = code_at(i, j)
        pos = i + j + 1
        takes_q = jnp.logical_or(code == PRED_NO_GAP, code == PRED_GAP_S)
        takes_s = jnp.logical_or(code == PRED_NO_GAP, code == PRED_GAP_Q)
        sym_q = jnp.where(
            takes_q, q[jnp.maximum(i, 0)].astype(jnp.uint8), GAP_SYM
        )
        sym_s = jnp.where(
            takes_s, s[jnp.maximum(j, 0)].astype(jnp.uint8), GAP_SYM
        )
        oq = oq.at[pos].set(sym_q)
        os = os.at[pos].set(sym_s)
        return (jnp.where(takes_q, i - 1, i),
                jnp.where(takes_s, j - 1, j), oq, os)

    init = (
        end_i, end_j,
        jnp.full((out_len,), EMPTY_SYM, jnp.uint8),
        jnp.full((out_len,), EMPTY_SYM, jnp.uint8),
    )
    i, j, oq, os = jax.lax.while_loop(cond, body, init)
    return oq, os, i + 1, j + 1


def walk_packed(outs, qp, sp, m, n, end, mode):
    """Walk the packed preds from `band.score_pair(..., emit_preds=True)`
    outputs. Returns (out_q, out_s, (start_i, start_j)) as numpy/ints."""
    mode = Mode.parse(mode)
    out_len = -(-(m + n) // 256) * 256  # bucket to bound compile variants
    oq, os, si, sj = _walk(
        outs["packed_preds"], qp, sp,
        jnp.int32(end[0]), jnp.int32(end[1]),
        mode, int(outs["p_pl"]), out_len,
    )
    return (np.asarray(oq)[: m + n], np.asarray(os)[: m + n],
            (int(si), int(sj)))
