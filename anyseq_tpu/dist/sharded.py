"""Subject-sharded single-pair wavefront over a device mesh ("sp" mode).

The DP matrix's subject axis is split into K contiguous stripes, one per
device on the "sp" mesh axis. Bands of H query rows flow through the chips
as a software pipeline: at super-step u, chip k relaxes band (u - k) of its
stripe and then sends its right-edge boundary column (H values + the
corner) to chip k+1 with ``jax.lax.ppermute`` -- the ICI analog of the
reference's corner/row/column boundary vectors between blocks
(scoring_cpu.impala:11-33). All chips work concurrently on successive
bands after a K-step fill, exactly like the reference's intra-device block
wavefront (iteration_cpu.impala:23-27) lifted across chips.

Pipeline efficiency: (B bands) / (B + K - 1 super-steps); choose H so that
B >> K.

The per-band, per-stripe relaxation runs through the Pallas boundary-mode
wavefront kernel on TPU (``engine="pallas"``; the same staggered-window
inner loop as the single-chip path, kernels/band.py) and falls back to the
portable row-scan + max-plus prefix-scan formulation elsewhere -- the
communication structure (ppermute of H+1 boundary values per superstep) is
identical for both. This mirrors the reference using the SAME fast inner
loop for every execution shape (iteration_acc.impala:30-83 vs :87-172).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from anyseq_tpu.core.types import (
    SCORE_MIN,
    AffineScoring,
    LinearScoring,
    Mode,
    Score,
)
from anyseq_tpu.engine import xla_linmem
from anyseq_tpu.engine.xla_affine import NEG, _shift1


def _round_up(x, m):
    return (x + m - 1) // m * m


def _band_compute_kernel(q_band, s_loc, row_in, col_in, j0, i0, h_local,
                         n, mode, sc, G, interpret, rowf_in=None,
                         cole_in=None):
    """Same contract as :func:`_band_compute`, computed by the Pallas
    boundary-mode wavefront kernel (kernels/band.py) instead of the XLA
    row-scan. Requires H % 128 == 0 and Nl % (G*1024) == 0.

    Affine (``sc`` AffineScoring): additionally takes the F boundary row
    ``rowf_in`` (Nl,) and the E boundary column ``cole_in`` (H,), and
    returns (row_out, rowf_out, col_out, cole_out, ecol, ecol_e, best).
    """
    from anyseq_tpu.kernels import band

    affine = isinstance(sc, AffineScoring)
    H = q_band.shape[0]
    Nl = s_loc.shape[0]
    num_windows = Nl // band.W
    corner = col_in[0]

    corners = band._band_corners(row_in, corner, num_windows)
    # Kernel-local n: count of valid columns in this stripe (global j < n
    # <=> local j < n - j0). Drives the edge-window ecol selection and the
    # local-mode valid mask.
    n_loc = jnp.clip(n - j0, 0, Nl)

    kw = {}
    if affine:
        kw["rowf2"] = rowf_in.reshape(-1, band.LANES)
        kw["cole2"] = cole_in.reshape(-1, band.LANES)
    outs = band._score_band_padded(
        q_band.reshape(-1, band.LANES),
        s_loc.reshape(-1, band.LANES),
        row_in.reshape(-1, band.LANES),
        col_in[1:].reshape(-1, band.LANES),
        corners, h_local, n_loc, mode, sc,
        emit_col=True, interpret=interpret, G=G, **kw,
    )
    row_out = outs["last_row"][:Nl]
    col_out = jnp.concatenate(
        [jnp.reshape(row_in[Nl - 1], (1,)), outs["col_out"][:H]]
    )
    ecol = outs["last_col"][:H]
    best = outs["best"]
    if mode is Mode.LOCAL:
        # kernel best i is band-local; j is stripe-local.
        valid = best[0] > SCORE_MIN
        best = jnp.where(
            valid,
            jnp.stack([best[0], best[1] + i0, best[2] + j0]),
            jnp.array([SCORE_MIN, -1, -1], Score),
        )
    if affine:
        return (row_out, outs["last_row_f"][:Nl], col_out,
                outs["col_out_e"][:H], ecol, outs["last_col_e"][:H],
                best)
    return row_out, col_out, ecol, best


def _band_compute(q_band, s_loc, row_in, col_in, j0, i0, h_local, n,
                  mode, sc):
    """Relax one band (H rows) of one stripe.

    q_band: (H,) query symbols of the band.
    s_loc: (Nl,) stripe subject symbols.
    row_in: (Nl,) boundary row = cells (i0-1, j) for this stripe.
    col_in: (H+1,) [0] = corner cell(i0-1, j0-1), [r+1] = cell(i0+r, j0-1).
    Returns (row_out, col_out, ecol, best) where row_out = cells
    (i0+h_local-1, j), col_out has the same layout as col_in but for the
    stripe's right edge, ecol[r] = cell(i0+r, n-1) if this stripe owns
    column n-1 (garbage otherwise), best = (score, i, j) running local max.
    """
    H = q_band.shape[0]
    Nl = s_loc.shape[0]
    jg = jnp.arange(Nl, dtype=Score) * sc.gap
    jmask = j0 + jnp.arange(Nl) < n
    e_loc = jnp.clip(n - 1 - j0, 0, Nl - 1)

    def body(r, carry):
        prev, col_out, ecol, best = carry
        active = r < h_local
        row = xla_linmem._row_update(
            prev, q_band[r], s_loc, col_in[r + 1], col_in[r], jg, mode, sc
        )
        row = jnp.where(active, row, prev)
        col_out = col_out.at[r + 1].set(
            jnp.where(active, row[Nl - 1], col_out[r + 1])
        )
        ecol = ecol.at[r].set(row[e_loc])
        if mode is Mode.LOCAL:
            masked = jnp.where(jmask, row, SCORE_MIN)
            rmax = jnp.max(masked)
            rarg = jnp.argmax(masked)
            take = jnp.logical_and(active, rmax > best[0])
            best = jnp.where(
                take,
                jnp.stack([rmax, (i0 + r).astype(Score),
                           (j0 + rarg).astype(Score)]),
                best,
            )
        return row, col_out, ecol, best

    col_out0 = jnp.zeros((H + 1,), Score).at[0].set(row_in[Nl - 1])
    init = (
        row_in,
        col_out0,
        jnp.zeros((H,), Score),
        jnp.array([SCORE_MIN, -1, -1], Score),
    )
    row_out, col_out, ecol, best = jax.lax.fori_loop(0, H, body, init)
    return row_out, col_out, ecol, best


def _band_compute_affine(q_band, s_loc, row_in, rowf_in, col_in, cole_in,
                         j0, i0, h_local, n, mode, sc):
    """Affine (Gotoh) analog of :func:`_band_compute`: the portable XLA
    row-scan over one band of one stripe, with explicit H/F boundary rows
    and H/E boundary columns (the reference's linear-memory boundary
    vectors, scoring.impala:218-259, extended with the Gotoh gap state).

    col_in: (H+1,) H boundary column incl. corner (same layout as the
    linear path); cole_in: (H,) E boundary column E[i0+r][j0-1].
    Returns (row_out, rowf_out, col_out, cole_out, ecol, ecol_e, best).
    """
    go, ge = sc.gap_open, sc.gap_extend
    H = q_band.shape[0]
    Nl = s_loc.shape[0]
    jge = jnp.arange(Nl, dtype=Score) * ge
    jmask = j0 + jnp.arange(Nl) < n
    e_loc = jnp.clip(n - 1 - j0, 0, Nl - 1)

    def body(r, carry):
        (H_prev, F_prev, col_out, cole_out, ecol, ecole, best) = carry
        active = r < h_local
        F = jnp.maximum(H_prev + go + ge, F_prev + ge)
        diag = _shift1(H_prev, col_in[r])
        sub = jnp.where(q_band[r] == s_loc, sc.match,
                        sc.mismatch).astype(Score)
        T = jnp.maximum(diag + sub, F)
        if mode is Mode.LOCAL:
            T = jnp.maximum(T, 0)
        cm = jax.lax.cummax(T - jge)
        # E-run candidates: open after any T[k<j], open from the H
        # boundary column, or continue the E boundary run.
        E = jge + jnp.maximum(
            go + jnp.maximum(_shift1(cm, NEG), col_in[r + 1] + ge),
            cole_in[r] + ge,
        )
        Hrow = jnp.maximum(T, E)
        Hrow = jnp.where(active, Hrow, H_prev)
        F = jnp.where(active, F, F_prev)
        col_out = col_out.at[r + 1].set(
            jnp.where(active, Hrow[Nl - 1], col_out[r + 1])
        )
        cole_out = cole_out.at[r].set(
            jnp.where(active, E[Nl - 1], cole_out[r])
        )
        ecol = ecol.at[r].set(Hrow[e_loc])
        ecole = ecole.at[r].set(E[e_loc])
        if mode is Mode.LOCAL:
            masked = jnp.where(jmask, Hrow, SCORE_MIN)
            rmax = jnp.max(masked)
            rarg = jnp.argmax(masked)
            take = jnp.logical_and(active, rmax > best[0])
            best = jnp.where(
                take,
                jnp.stack([rmax, (i0 + r).astype(Score),
                           (j0 + rarg).astype(Score)]),
                best,
            )
        return Hrow, F, col_out, cole_out, ecol, ecole, best

    col_out0 = jnp.zeros((H + 1,), Score).at[0].set(row_in[Nl - 1])
    init = (
        row_in,
        rowf_in,
        col_out0,
        jnp.full((H,), NEG, Score),
        jnp.zeros((H,), Score),
        jnp.full((H,), NEG, Score),
        jnp.array([SCORE_MIN, -1, -1], Score),
    )
    row_out, rowf_out, col_out, cole_out, ecol, ecole, best = (
        jax.lax.fori_loop(0, H, body, init)
    )
    return row_out, rowf_out, col_out, cole_out, ecol, ecole, best


@functools.partial(
    jax.jit,
    static_argnames=("mode", "sc", "H", "mesh", "axis", "use_kernel",
                     "G", "interpret", "start_gap"),
)
def _sharded_score(q, s_sh, row0_sh, rowf0_sh, m, n, mode: Mode, sc,
                   H: int, mesh: Mesh, axis: str = "sp",
                   use_kernel: bool = False, G: int = 1,
                   interpret: bool = False, start_gap: bool = False):
    """q: (M_pad,) replicated; s_sh/row0_sh (affine: + rowf0_sh): (N_pad,)
    sharded over axis. The superstep ppermute message carries the H
    boundary column (+ corner); affine scoring appends the E boundary
    column (H more values) to the same message and also carries the F
    boundary row between bands -- the full Gotoh state of the reference's
    boundary vectors."""
    affine = isinstance(sc, AffineScoring)
    go, ge = ((sc.gap_open, sc.gap_extend) if affine else (0, 0))
    M_pad = q.shape[0]
    B = M_pad // H
    K = mesh.shape[axis]

    def run(q_full, s_loc, row_loc, rowf_loc):
        k = jax.lax.axis_index(axis)
        Nl = s_loc.shape[0]
        j0 = k * Nl
        S = B + K - 1

        def superstep(carry, u):
            (row_loc, rowf_loc, col_in, ecol_acc, ecole_acc,
             best) = carry
            band = u - k
            active = jnp.logical_and(band >= 0, band < B)
            i0 = jnp.where(active, band, 0) * H
            h_local = jnp.clip(m - i0, 0, H)
            q_band = jax.lax.dynamic_slice(q_full, (i0,), (H,))

            # chip 0's left boundary is the init formula, not a message
            if mode is Mode.GLOBAL and affine:
                if start_gap:
                    # Myers-Miller continuing-run init: unreachable left
                    # column and corner.
                    col_form = jnp.full((H + 1,), NEG, Score)
                else:
                    col_form = go + (
                        i0 + jnp.arange(H + 1, dtype=Score)
                    ) * ge
                    col_form = col_form.at[0].set(
                        jnp.where(i0 == 0, 0, col_form[0])
                    )
                cole_form = jnp.full((H,), NEG, Score)
            elif mode is Mode.GLOBAL:
                col_form = (i0 + jnp.arange(H + 1, dtype=Score)) * sc.gap
                cole_form = None
            else:
                col_form = jnp.zeros((H + 1,), Score)
                cole_form = (jnp.full((H,), NEG, Score)
                             if affine else None)
            if affine:
                col_bnd = jnp.where(k == 0, col_form, col_in[:H + 1])
                cole_bnd = jnp.where(k == 0, cole_form, col_in[H + 1:])
            else:
                col_bnd = jnp.where(k == 0, col_form, col_in)

            if affine and use_kernel:
                (row2, rowf2, col_out, cole_out, ecol, ecole,
                 bbest) = _band_compute_kernel(
                    q_band, s_loc, row_loc, col_bnd, j0, i0, h_local, n,
                    mode, sc, G, interpret, rowf_in=rowf_loc,
                    cole_in=cole_bnd,
                )
            elif affine:
                (row2, rowf2, col_out, cole_out, ecol, ecole,
                 bbest) = _band_compute_affine(
                    q_band, s_loc, row_loc, rowf_loc, col_bnd, cole_bnd,
                    j0, i0, h_local, n, mode, sc,
                )
            elif use_kernel:
                row2, col_out, ecol, bbest = _band_compute_kernel(
                    q_band, s_loc, row_loc, col_bnd, j0, i0, h_local, n,
                    mode, sc, G, interpret,
                )
            else:
                row2, col_out, ecol, bbest = _band_compute(
                    q_band, s_loc, row_loc, col_bnd, j0, i0, h_local, n,
                    mode, sc,
                )
            row_loc = jnp.where(active, row2, row_loc)
            ecol_acc = jnp.where(
                active,
                jax.lax.dynamic_update_slice(ecol_acc, ecol, (i0,)),
                ecol_acc,
            )
            if affine:
                rowf_loc = jnp.where(active, rowf2, rowf_loc)
                ecole_acc = jnp.where(
                    active,
                    jax.lax.dynamic_update_slice(ecole_acc, ecole, (i0,)),
                    ecole_acc,
                )
            if mode is Mode.LOCAL:
                take = jnp.logical_and(active, bbest[0] > best[0])
                best = jnp.where(take, bbest, best)

            if affine:
                col_all = jnp.concatenate([col_out, cole_out])
            else:
                col_all = col_out
            col_msg = jnp.where(active, col_all, col_in)
            col_in_next = jax.lax.ppermute(
                col_msg, axis, [(i, (i + 1) % K) for i in range(K)]
            )
            return (row_loc, rowf_loc, col_in_next, ecol_acc, ecole_acc,
                    best), None

        msg_len = (2 * H + 1) if affine else (H + 1)
        init = (
            row_loc,
            rowf_loc,
            jnp.zeros((msg_len,), Score),
            jnp.zeros((M_pad,), Score),
            (jnp.full((M_pad,), NEG, Score) if affine
             else jnp.zeros((1,), Score)),
            jnp.array([SCORE_MIN, -1, -1], Score),
        )
        (row_loc, rowf_loc, _, ecol_acc, ecole_acc, best), _ = (
            jax.lax.scan(superstep, init, jnp.arange(S))
        )

        # Only the stripe owning column n-1 has a valid ecol; zero others
        # then psum to replicate.
        owns = jnp.logical_and(j0 <= n - 1, n - 1 < j0 + Nl)
        ecol_acc = jnp.where(owns, ecol_acc, 0)
        ecol_all = jax.lax.psum(ecol_acc, axis)
        ecole_all = jax.lax.psum(
            jnp.where(owns, ecole_acc, 0), axis
        ) if affine else ecole_acc

        # local best: lexicographic (score, -i, -j) max across chips.
        if mode is Mode.LOCAL:
            from anyseq_tpu.dist.mesh import lex_best_merge

            best = lex_best_merge(best, axis, K)
        return row_loc, rowf_loc, ecol_all, ecole_all, best

    row_out, rowf_out, ecol, ecole, best = jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(), P(), P()),
        check_vma=False,
    )(q, s_sh, row0_sh, rowf0_sh)

    out = {"last_row": row_out, "last_col": ecol, "best": best}
    if affine:
        out["last_col_e"] = ecole
        out["last_row_f"] = rowf_out
    return out


def score_pair_sharded(query, subject, mode, sc, mesh: Mesh,
                       H: int = 4096, axis: str = "sp",
                       engine: str = "auto", start_gap: bool = False):
    """Distributed score-only alignment of one (large) pair. ``sc`` may
    be LinearScoring or AffineScoring (full Gotoh state in the superstep
    messages; ``start_gap`` is the Myers-Miller continuing-run init for
    distributed affine construction).

    engine: "collective" (ONE persistent kernel per chip per band with
    in-kernel ICI halo exchange, dist/collective.py -- the TPU default
    for linear scoring on a 1-D mesh), "collective-interpret" (same
    under the TPU interpreter -- CPU testing), "pallas" (host-
    orchestrated superstep: boundary-mode wavefront kernel per
    stripe-band, boundary columns via ppermute), "pallas-interpret",
    "xla" (portable row-scan supersteps), or "auto" (collective on
    accelerators where supported, else pallas on accelerators, else
    xla).

    Returns the same outputs dict as xla_linmem.score_rows; combine with
    xla_linmem.extract_score_from_outputs.
    """
    from anyseq_tpu.core.types import as_u8

    mode = Mode.parse(mode)
    q8 = as_u8(query)
    s8 = as_u8(subject)
    m, n = len(q8), len(s8)
    if m == 0 or n == 0:
        raise ValueError("empty sequences are not supported")
    if engine in ("auto", "collective", "collective-interpret"):
        from anyseq_tpu.dist import collective as _coll
        from anyseq_tpu.kernels import band as _band

        run_mesh = mesh
        if not _coll.supports(mesh, axis, sc) and len(mesh.axis_names) > 1:
            # A single pair has nothing for the other axes to do:
            # flatten the whole mesh into one sp ring (every device
            # becomes a stripe of this pair). Batches of pairs keep
            # their 2-D (dp x sp) shape via score_pairs_collective.
            run_mesh = Mesh(
                np.asarray(mesh.devices).reshape(-1), (axis,)
            )
        if _coll.supports(run_mesh, axis, sc) and (
            engine in ("collective", "collective-interpret")
            or _band.available()
        ):
            return _coll.score_pair_collective(
                q8, s8, mode, sc, run_mesh, axis=axis,
                interpret="tpu" if engine == "collective-interpret"
                else False, start_gap=start_gap,
            )
        if engine != "auto":
            raise ValueError(
                "collective engine requires a mesh containing axis "
                f"{axis!r}"
            )
    if engine == "auto":
        from anyseq_tpu.kernels import band as _band

        engine = "pallas" if _band.available() else "xla"
    affine = isinstance(sc, AffineScoring)
    if start_gap and not (affine and mode is Mode.GLOBAL):
        raise ValueError("start_gap is an affine GLOBAL (Myers-Miller) "
                         "subproblem flag")
    use_kernel = engine in ("pallas", "pallas-interpret")
    interpret = engine == "pallas-interpret"
    K = mesh.shape[axis]
    G = 1
    if use_kernel:
        from anyseq_tpu.kernels import band as _band

        if H % 128 != 0:
            raise ValueError("kernel engine needs H % 128 == 0")
        # Pick the cost-effective chain count FIRST, then align the
        # stripe width to whole window groups (padding cost <= G-1
        # windows per stripe; a bad G costs far more than the padding).
        G = _band._pick_g(H, _round_up(max(n, 1), _band.W * K) // K,
                          emit_col=True, affine=affine)
        Nl = _round_up(max(n, 1), _band.W * G * K) // K
    else:
        Nl = _round_up(max(n, 1), 128 * K) // K
    N_pad = Nl * K

    from anyseq_tpu.kernels import band as _bandmod

    M_pad = _round_up(m, H)

    q = jnp.full((M_pad,), _bandmod.PAD_Q,
                 jnp.int32).at[:m].set(q8.astype(np.int32))
    s = jnp.full((N_pad,), _bandmod.PAD_S,
                 jnp.int32).at[:n].set(s8.astype(np.int32))
    jarr = jnp.arange(N_pad, dtype=Score)
    if mode is Mode.GLOBAL and affine:
        row0 = ((jarr + 1) * sc.gap_extend
                + (0 if start_gap else sc.gap_open))
    elif mode is Mode.GLOBAL:
        row0 = (jarr + 1) * sc.gap
    else:
        row0 = jnp.zeros_like(jarr)
    rowf0 = jnp.full((N_pad,), NEG if affine else 0, Score)

    shard = NamedSharding(mesh, P(axis))
    s = jax.device_put(s, shard)
    row0 = jax.device_put(row0, shard)
    rowf0 = jax.device_put(rowf0, shard)

    return _sharded_score(q, s, row0, rowf0, jnp.int32(m), jnp.int32(n),
                          mode, sc, H, mesh, axis, use_kernel=use_kernel,
                          G=G, interpret=interpret, start_gap=start_gap)
