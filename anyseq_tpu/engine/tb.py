"""Traceback walk dispatcher: native C walker when available, numpy oracle
walk otherwise. Semantics defined by ref/oracle.traceback /
ref/oracle_affine.traceback_affine (reference: traceback.impala:47-80)."""
from __future__ import annotations

import numpy as np

from anyseq_tpu.core.types import as_u8
from anyseq_tpu.io import _native
from anyseq_tpu.ref import oracle, oracle_affine


def walk_linear(q, s, P, end, out_q, out_s, off_i=0, off_j=0):
    """Returns (start_i, start_j); writes into out_q/out_s in place."""
    q8 = as_u8(q)
    s8 = as_u8(s)
    res = _native.traceback_linear_native(
        P, q8, s8, end, out_q, out_s, off_i + off_j
    )
    if res is not None:
        return res
    _, _, start = oracle.traceback(q8, s8, P, end, out_q, out_s, off_i, off_j)
    return start


def walk_affine(q, s, PH, PE, PF, end, out_q, out_s, off_i=0, off_j=0):
    q8 = as_u8(q)
    s8 = as_u8(s)
    res = _native.traceback_affine_native(
        PH, PE, PF, q8, s8, end, out_q, out_s, off_i + off_j
    )
    if res is not None:
        return res
    _, _, start = oracle_affine.traceback_affine(
        q8, s8, PH, PE, PF, end, out_q, out_s, off_i, off_j
    )
    return start
