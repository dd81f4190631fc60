"""Checkpointable band-wise scoring for multi-hour genome-scale runs.

The reference has no checkpoint/resume (SURVEY.md §5.4); its linear-memory
boundary vectors are exactly the state needed to restart, so this module
makes them durable: the DP advances one row-band at a time, and after each
band the boundary row, exact last-column fragment, running local best and
band index are persisted (npz). A killed run resumes from the last band.

State layout mirrors the linear-memory matrix of the reference
(scoring.impala:218-259): row vector (width n), column fragment, corner --
all int32, bit-identical restart.
"""
from __future__ import annotations

import functools
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from anyseq_tpu.core.types import (
    SCORE_MIN,
    LinearScoring,
    Mode,
    Score,
    as_u8,
)
from anyseq_tpu.engine import xla_linmem


@functools.partial(jax.jit, static_argnames=("mode", "sc", "H"))
def _score_band(q_band, s, row_in, i0, h, n, best_in, mode: Mode,
                sc: LinearScoring, H: int):
    """Relax rows [i0, i0+h) given the boundary row; returns
    (row_out, col_out (H,), best)."""
    N = s.shape[0]
    jg = jnp.arange(N, dtype=Score) * sc.gap
    jmask = jnp.arange(N) < n

    def init_col(i):
        if mode is Mode.GLOBAL:
            return (i + 1) * sc.gap
        return jnp.zeros_like(i)

    def body(r, carry):
        prev, col_out, best = carry
        active = r < h
        i = i0 + r
        row = xla_linmem._row_update(
            prev, q_band[r], s, init_col(i).astype(Score),
            init_col(i - 1).astype(Score), jg, mode, sc,
        )
        row = jnp.where(active, row, prev)
        col_out = col_out.at[r].set(row[n - 1])
        if mode is Mode.LOCAL:
            masked = jnp.where(jmask, row, SCORE_MIN)
            rmax = jnp.max(masked)
            rarg = jnp.argmax(masked)
            take = jnp.logical_and(active, rmax > best[0])
            best = jnp.where(
                take,
                jnp.stack([rmax, i.astype(Score), rarg.astype(Score)]),
                best,
            )
        return row, col_out, best

    init = (row_in, jnp.full((H,), SCORE_MIN, Score), best_in)
    return jax.lax.fori_loop(0, h, body, init)


class ResumableScorer:
    """Band-wise score-only alignment with durable checkpoints.

    >>> sc = ResumableScorer(q, s, "global", checkpoint_path="run.npz")
    >>> while sc.step():
    ...     pass           # safe to kill anywhere; resume() picks up
    >>> outs = sc.outputs()
    """

    def __init__(self, query, subject, mode="global",
                 scoring=LinearScoring(), band_rows: int = 4096,
                 checkpoint_path: str | None = None):
        self.q8 = as_u8(query)
        self.s8 = as_u8(subject)
        self.m = len(self.q8)
        self.n = len(self.s8)
        if self.m == 0 or self.n == 0:
            raise ValueError("empty sequences are not supported")
        self.mode = Mode.parse(mode)
        self.scoring = scoring
        self.H = band_rows
        self.path = checkpoint_path
        N = (self.n + 255) // 256 * 256
        self.s_pad = jnp.asarray(
            np.concatenate([
                self.s8.astype(np.int32),
                np.full(N - self.n, 255, np.int32),
            ])
        )
        jarr = np.arange(N, dtype=np.int32)
        if self.mode is Mode.GLOBAL:
            row0 = (jarr + 1) * scoring.gap
        else:
            row0 = np.zeros_like(jarr)
        self.row = np.asarray(row0, dtype=np.int32)
        self.last_col = np.full(self.m, SCORE_MIN, np.int32)
        self.best = np.array([SCORE_MIN, -1, -1], np.int32)
        self.band = 0
        self.num_bands = (self.m + self.H - 1) // self.H

    # -- persistence ---------------------------------------------------
    def save(self):
        if not self.path:
            return
        tmp_fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(os.path.abspath(self.path)) or "."
        )
        os.close(tmp_fd)
        np.savez(
            tmp, band=self.band, row=self.row, last_col=self.last_col,
            best=self.best, m=self.m, n=self.n,
            mode=self.mode.value, H=self.H,
        )
        os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp,
                   self.path)

    @classmethod
    def resume(cls, path, query, subject, mode="global",
               scoring=LinearScoring(), band_rows: int = 4096):
        self = cls(query, subject, mode, scoring, band_rows, path)
        if os.path.exists(path):
            ck = np.load(path)
            if (
                int(ck["m"]) != self.m or int(ck["n"]) != self.n
                or str(ck["mode"]) != self.mode.value
                or int(ck["H"]) != band_rows
            ):
                raise ValueError("checkpoint does not match this problem")
            self.band = int(ck["band"])
            self.row = np.asarray(ck["row"])
            self.last_col = np.asarray(ck["last_col"])
            self.best = np.asarray(ck["best"])
        return self

    # -- execution -----------------------------------------------------
    def step(self) -> bool:
        """Process one band; returns False when finished."""
        if self.band >= self.num_bands:
            return False
        i0 = self.band * self.H
        h = min(self.H, self.m - i0)
        q_band = np.zeros(self.H, np.int32)
        q_band[:h] = self.q8[i0: i0 + h]
        row, col, best = _score_band(
            jnp.asarray(q_band), self.s_pad, jnp.asarray(self.row),
            jnp.int32(i0), jnp.int32(h), jnp.int32(self.n),
            jnp.asarray(self.best), self.mode, self.scoring, self.H,
        )
        self.row = np.asarray(row)
        self.last_col[i0: i0 + h] = np.asarray(col)[:h]
        self.best = np.asarray(best)
        self.band += 1
        self.save()
        return self.band < self.num_bands

    def run(self):
        while self.step():
            pass
        return self.outputs()

    def outputs(self):
        if self.band < self.num_bands:
            raise RuntimeError("scoring not finished")
        return {
            "last_row": self.row,
            "last_col": self.last_col,
            "best": self.best,
        }

    def score(self):
        outs = self.outputs()
        return xla_linmem.extract_score_from_outputs(
            outs, self.m, self.n, self.mode, self.scoring
        )
