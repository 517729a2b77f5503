"""Pallas-fused stream passes for the mega-row cycle (TPU fast path).

The jnp engine (``ops/fused.py``) expresses the per-cycle stream work
(advect + Brownian move + hop-0 barycentric classify, then post-hop
merge + re-test + inline bounce + state assembly) as column arithmetic
over the ``[n, W]`` mega array.  XLA fragments that into ~15 separate
fusions, each re-reading mega columns from HBM — measured ~4.9 ms of a
18.5 ms cycle at 1M lanes on v5e, where the same work is ~2 full-array
passes (~0.8 ms) if fused by hand.

This module packs each side of the inline-hop row gather into ONE
pallas kernel over the transposed view ``mT = m.T`` (``[W, n]`` — the
mega's native ``{0,1}`` layout, so the transpose is a relabel, not a
copy; lanes ride the 128-wide lane dimension of the VPU):

* kernel A: advect velocity + Brownian kick + tentative move + hop-0
  bary classify + neighbor-code select → head columns, gather index,
  crosser/wall flags.  One read of mT, one write of a [16, n] head.
* (XLA) the full-batch masked row gather ``tab[idx]`` — the measured
  per-index wall; pallas cannot express it (no gather in Mosaic).
* kernel B: merge gathered rows for crossers + bary re-test + the
  inline single bounce + mega re-assembly → mT' and the rare-stage
  pending flags.  One read of mT/rows/head, one write of mT'.

The rare stage (block-compacted tet walk + multi-bounce reflection)
stays in ``fused.py`` — it is gather/scatter-bound, which XLA already
handles at the measured optimum.

Scope: TetVelocity and VertexVelocity (Pk) layouts, ``1 <= inline_hops
<= 8``; escape faces ride the row's baked mask column in BOTH layouts
(TetVelocity pad col 19, Pk col 28 — mesh.set_boundary_escape).
Everything else falls back to the jnp engine; ``stepper.suggest_tuning``
only enables this path on TPU backends inside that envelope.  Arithmetic mirrors ``fused.py``
expression-for-expression; Mosaic may contract mul+add to FMA where XLA
would not, so cross-engine agreement on TPU is to ~1 ulp per op (the
parity-critical path — CPU f64 vs the reference semantics — always uses
the jnp engine; see ``tests/test_golden.py``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused import (
    ACT,
    LAYOUT_PK,
    LAYOUT_TET,
    P0,
    RA,
    ROW,
    TET,
    V0,
    _brownian_noise,
    layout_for,
)

# lanes per grid step, per kernel — sized against the ~16 MB VMEM budget
# with double buffering (in+out blocks x2 + Mosaic stack)
BN_A = 16384        # kernel A: (32+3+16) cols x 16k x 4 B x 2 ≈ 6.7 MB
BN_B = 8192         # kernel B: (32+20+16+32+8) cols x 8k x 4 B x 2 ≈ 7.1 MB
                    # (16k swept: 14.73 vs 14.78 ms — noise; keep 8k)

# head-array rows produced by kernel A
HPX, HPY, HPZ, HVX, HVY, HVZ, HACT, HIDX, HMV, HWALL, HSLOT, HTET = range(12)
HEAD_W = 16         # padded to a sublane multiple

# the packed-carry path requires the lane count to be a multiple of one
# pallas block (the in-kernel unpack produces GROUPED lane order per
# block, and the XLA-side xi/pend permutes must tile the same blocks)
PACK_LANES = BN_B

# auto-engine crossover: below this, the padding to a full block plus the
# in-VMEM grouped transposes outweigh the copy-pair saving (measured:
# 1M/hops=1 packed +4.6%, 100k/hops=4 packed -13%); explicit
# engine_impl='pallas_packed' overrides
PACK_MIN_LANES = 48 * PACK_LANES          # ~393k


def _unpack_grouped(m_ref, W):
    """Packed block [bn4, 4W] -> W mega rows [W, 4*bn4] in GROUPED lane
    order (position q*bn4 + i holds natural in-block lane 4i + q).

    Mosaic cannot split the lane dim of a vector (the naive
    reshape(bn4, 4, W) dies with "unsupported shape cast"), but a 2D
    transpose followed by sublane-major-only reshapes is supported and
    bit-exact (probed on hardware): the reshape splits 4W sublanes into
    (4, W), the (1,0,2) transpose is a vreg-row shuffle, and the final
    merge folds the 4-axis into lane blocks of bn4 (a relabel, since
    bn4 is a multiple of 128)."""
    bn4 = m_ref.shape[0]
    mt = m_ref[:].T                                   # [4W, bn4]
    return mt.reshape(4, W, bn4).transpose(1, 0, 2).reshape(W, 4 * bn4)


def _pack_grouped(mrows):
    """Inverse of :func:`_unpack_grouped`: W grouped lane rows -> the
    packed [bn4, 4W] block."""
    W = len(mrows)
    bn = mrows[0].shape[0]
    bn4 = bn // 4
    mb = jnp.stack(mrows, axis=0)                     # [W, bn]
    return mb.reshape(W, 4, bn4).transpose(1, 0, 2).reshape(4 * W, bn4).T


def to_grouped(x, bn: int = PACK_LANES):
    """XLA-side lane permute matching the kernels' grouped order, applied
    per bn-lane block along the LAST axis (requires n % bn == 0)."""
    s = x.shape[:-1]
    nblk = x.shape[-1] // bn
    return (
        x.reshape(*s, nblk, bn // 4, 4)
        .swapaxes(-1, -2)
        .reshape(*s, nblk * bn)
    )


def from_grouped(x, bn: int = PACK_LANES):
    """Inverse of :func:`to_grouped`."""
    s = x.shape[:-1]
    nblk = x.shape[-1] // bn
    return (
        x.reshape(*s, nblk, 4, bn // 4)
        .swapaxes(-1, -2)
        .reshape(*s, nblk * bn)
    )


def _inkernel_noise(iscal_ref, bn, j: int = 0, off_slot: int = 1):
    """In-kernel Brownian normals (jnp [3, bn]) from the TPU hardware
    PRNG — ``brownian_rng="rbg_kernel"`` (opt-in): removes the XLA-side
    bit generation + Box-Muller stream and (on the packed path) the xi
    lane permute.  Same full-pair Box-Muller construction as
    fused._brownian_noise's "rbg" mode but a DIFFERENT stream (the
    hardware PRNG is not counter-based): runs are reproducible for a
    fixed (key, step, lane span) on the same backend, but never
    bit-comparable with the XLA-noise engines.  Seeded by
    (mix(key, step), global lane offset of the block) so sub-batch
    chunks stay decorrelated; NOT safe under replicated-key particle-DP
    (each shard would repeat the stream) — ParticleEngine downgrades it
    to "rbg" there.

    ``j``/``off_slot``: which SMEM slots hold the step mix and the lane
    offset — the macro kernel packs k per-sub-step mixes ahead of the
    offset (:func:`_noise_iscal_k`) and re-seeds per sub-step, which
    reproduces the per-cycle streams EXACTLY (same (mix, lane) pairs)."""
    pltpu.prng_seed(
        iscal_ref[j], iscal_ref[off_slot] + pl.program_id(0) * jnp.int32(bn)
    )
    bits = pltpu.prng_random_bits((4, bn))          # int32 semantics
    # signed bits * 2^-32 + (0.5 + 2^-33) covers (0, 1) exactly like the
    # XLA path's unsigned formula
    u = bits.astype(jnp.float32) * (1.0 / 4294967296.0) + jnp.float32(
        0.5 + 0.5 / 4294967296.0
    )
    r0 = jnp.sqrt(-2.0 * jnp.log(u[0]))
    r1 = jnp.sqrt(-2.0 * jnp.log(u[1]))
    a0 = (2.0 * jnp.pi) * u[2]
    a1 = (2.0 * jnp.pi) * u[3]
    return jnp.stack([r0 * jnp.cos(a0), r0 * jnp.sin(a0), r1 * jnp.cos(a1)])


def _noise_iscal(rng_key, step, lane_offset):
    """SMEM int32 [mix(key, step), lane_offset] for _inkernel_noise."""
    kk = jnp.asarray(rng_key, jnp.uint32).reshape(-1)[:2]
    mix = (
        kk[0] * jnp.uint32(2654435761)
        + kk[1] * jnp.uint32(40503)
        + jnp.asarray(step, jnp.uint32) * jnp.uint32(2246822519)
    )
    return jax.lax.bitcast_convert_type(
        jnp.stack([mix, jnp.uint32(lane_offset)]), jnp.int32
    )


def _noise_iscal_k(rng_key, step0, lane_offset, k: int):
    """SMEM int32 [mix(key, step0), ..., mix(key, step0+k-1), lane_offset]
    for the macro kernel's per-sub-step re-seeding — slot j is EXACTLY
    :func:`_noise_iscal`'s mix for step0+j, so macro streams match the
    per-cycle streams bit-for-bit."""
    kk = jnp.asarray(rng_key, jnp.uint32).reshape(-1)[:2]
    steps = jnp.asarray(step0, jnp.uint32) + jnp.arange(k, dtype=jnp.uint32)
    mixes = (
        kk[0] * jnp.uint32(2654435761)
        + kk[1] * jnp.uint32(40503)
        + steps * jnp.uint32(2246822519)
    )
    return jax.lax.bitcast_convert_type(
        jnp.concatenate(
            [mixes, jnp.asarray(lane_offset, jnp.uint32).reshape(1)]
        ),
        jnp.int32,
    )


def _use_inkernel_noise(cfg) -> bool:
    return bool(cfg.use_brownian) and (
        getattr(cfg, "brownian_rng", "threefry") == "rbg_kernel"
    )


def _bary_rows(a0, a1, a2, t, px, py, pz):
    """Barycentric components vs a row-sliced tet cache.

    ``a0..a2``: A rows; ``t``: tuple of 9 Tinv rows; association order
    matches ``fused._bary4`` exactly."""
    rx = px - a0
    ry = py - a1
    rz = pz - a2
    wb = t[0] * rx + t[1] * ry + t[2] * rz
    wc = t[3] * rx + t[4] * ry + t[5] * rz
    wd = t[6] * rx + t[7] * ry + t[8] * rz
    wa = 1.0 - wb - wc - wd
    return wa, wb, wc, wd


def _argmin4(wa, wb, wc, wd):
    """First-minimum argmin (strict '<', owl arg_min semantics)."""
    best = wa
    slot = jnp.zeros(wa.shape, jnp.int32)
    for i, w in ((1, wb), (2, wc), (3, wd)):
        upd = w < best
        best = jnp.where(upd, w, best)
        slot = jnp.where(upd, i, slot)
    return slot, best


def _pick4(c0, c1, c2, c3, slot):
    return jnp.where(
        slot == 0, c0,
        jnp.where(slot == 1, c1, jnp.where(slot == 2, c2, c3)),
    )


def _a_compute(scal_ref, mrow, xi_ref, ly=LAYOUT_TET):
    """advect + noise + move + hop-0 classify + neighbor select, on lane
    vectors delivered by ``mrow(r)`` — shared by the transposed-view and
    packed-carry kernel A variants.  ``ly`` selects the interpolation
    layout: LAYOUT_TET reads the cached per-tet velocity (RT0,
    ``particles.cu:317-373``); LAYOUT_PK blends the 4 cached vertex
    velocities barycentrically at the CURRENT position
    (``particles.cu:245-313``), mirroring fused.py's Pk branch
    expression-for-expression (sum() association: ((w0v0+w1v1)+w2v2)+w3v3)."""
    dt = scal_ref[0]
    sigma = scal_ref[1]
    use_adv = scal_ref[2] > 0.5
    use_brown = scal_ref[3] > 0.5

    tetf = mrow(TET)
    act = mrow(ACT) > 0.5
    alive = act & (tetf >= 0.0)
    alf = jnp.where(use_adv, alive.astype(jnp.float32), 0.0)

    RV = ROW + ly.vel
    if ly is LAYOUT_PK:
        t0 = tuple(mrow(RA + 3 + k) for k in range(9))
        w4 = _bary_rows(mrow(RA), mrow(RA + 1), mrow(RA + 2), t0,
                        mrow(P0), mrow(P0 + 1), mrow(P0 + 2))
        ux = w4[0] * mrow(RV) + w4[1] * mrow(RV + 3) \
            + w4[2] * mrow(RV + 6) + w4[3] * mrow(RV + 9)
        uy = w4[0] * mrow(RV + 1) + w4[1] * mrow(RV + 4) \
            + w4[2] * mrow(RV + 7) + w4[3] * mrow(RV + 10)
        uz = w4[0] * mrow(RV + 2) + w4[1] * mrow(RV + 5) \
            + w4[2] * mrow(RV + 8) + w4[3] * mrow(RV + 11)
    else:
        ux = mrow(RV)
        uy = mrow(RV + 1)
        uz = mrow(RV + 2)
    dx = alf * ux * dt
    dy = alf * uy * dt
    dz = alf * uz * dt
    adv_live = use_adv & alive
    vx = jnp.where(adv_live, ux, mrow(V0))
    vy = jnp.where(adv_live, uy, mrow(V0 + 1))
    vz = jnp.where(adv_live, uz, mrow(V0 + 2))

    balf = jnp.where(use_adv, alf, act.astype(jnp.float32))
    bmask = jnp.where(use_brown, balf, 0.0)
    dx = dx + bmask * sigma * xi_ref[0, :]
    dy = dy + bmask * sigma * xi_ref[1, :]
    dz = dz + bmask * sigma * xi_ref[2, :]

    actf = jnp.where(use_adv, alf, mrow(ACT))

    px = mrow(P0) + dx
    py = mrow(P0 + 1) + dy
    pz = mrow(P0 + 2) + dz

    t = tuple(mrow(RA + 3 + k) for k in range(9))
    wa, wb, wc, wd = _bary_rows(mrow(RA), mrow(RA + 1), mrow(RA + 2), t,
                                px, py, pz)
    s0, wmin = _argmin4(wa, wb, wc, wd)
    need = (wmin < 0.0) & (tetf >= 0.0)

    rn = ROW + ly.nbr
    code = _pick4(mrow(rn), mrow(rn + 1), mrow(rn + 2), mrow(rn + 3), s0)
    mv = need & (code >= 0.0)
    wall = need & (code < 0.0)
    idx = jnp.where(mv, code, jnp.maximum(tetf, 0.0))

    out = [None] * HEAD_W
    out[HPX], out[HPY], out[HPZ] = px, py, pz
    out[HVX], out[HVY], out[HVZ] = vx, vy, vz
    out[HACT] = actf
    out[HIDX] = idx
    out[HMV] = mv.astype(jnp.float32)
    out[HWALL] = wall.astype(jnp.float32)
    out[HSLOT] = s0.astype(jnp.float32)
    out[HTET] = tetf
    for r in range(HTET + 1, HEAD_W):
        out[r] = jnp.zeros_like(px)
    return out


def _kernel_a(scal_ref, m_ref, xi_ref, out_ref, *, ly=LAYOUT_TET):
    """advect + noise + move + hop-0 classify + neighbor select."""
    out = _a_compute(scal_ref, lambda r: m_ref[r, :], xi_ref, ly)
    for r in range(HEAD_W):
        out_ref[r, :] = out[r]


def _kernel_a_k(scal_ref, iscal_ref, m_ref, out_ref, *, ly=LAYOUT_TET):
    """:_kernel_a: with hardware-PRNG in-kernel noise (rbg_kernel)."""
    xi = _inkernel_noise(iscal_ref, m_ref.shape[1])
    out = _a_compute(scal_ref, lambda r: m_ref[r, :], xi, ly)
    for r in range(HEAD_W):
        out_ref[r, :] = out[r]


def _kernel_a_packed(scal_ref, m_ref, xi_ref, out_ref, *, ly=LAYOUT_TET):
    """kernel A on a packed [BN/4, 4W] mega block: in-VMEM unpack to
    GROUPED lane order, then the shared compute.  ``xi_ref`` and the head
    output are in the same grouped order (the caller permutes xi with
    :func:`to_grouped`)."""
    mb = _unpack_grouped(m_ref, ly.width)
    out = _a_compute(scal_ref, lambda r: mb[r], xi_ref, ly)
    for r in range(HEAD_W):
        out_ref[r, :] = out[r]


def _kernel_a_packed_k(scal_ref, iscal_ref, m_ref, out_ref, *, ly=LAYOUT_TET):
    """:_kernel_a_packed: with in-kernel noise — iid per lane, so no
    permute is needed at all (the grouped order IS the stream order)."""
    mb = _unpack_grouped(m_ref, ly.width)
    xi = _inkernel_noise(iscal_ref, m_ref.shape[0] * 4)
    out = _a_compute(scal_ref, lambda r: mb[r], xi, ly)
    for r in range(HEAD_W):
        out_ref[r, :] = out[r]


def _b_compute(scal_ref, rows_ref, head_ref, ly=LAYOUT_TET):
    """merge gathered rows + re-test + inline single bounce; returns the
    W mega rows + the pending flag vector (shared by the transposed-view
    and packed-carry kernel B variants).

    No mega input: the masked gather used each lane's OWN tet as the fill
    index, so ``rows_ref`` already holds the correct row cache for every
    lane with tet >= 0 (crossers get the neighbor row, everyone else
    refetches their own — bit-identical bytes).  Only dead lanes (tet<0,
    fill index 0) get tet-0's row, and a dead lane's row cache is
    semantically unused (revival re-packs the mega from the table)."""
    mv = head_ref[HMV, :] > 0.5
    rows = [rows_ref[k, :] for k in range(ly.row_w)]
    return _b_core(scal_ref, rows, head_ref, mv, None, ly)


def _b_compute_c(scal_ref, mb, rg, head_ref):
    """:_b_compute: for the block-compacted hop gather: ``rg`` holds the
    scattered [4x32]-group rows (col 20 = per-slot valid flag: 1 when the
    slot's neighbor row was fetched this cycle, 0 for rank-overflow slots
    and for groups the compaction skipped), ``mb`` the unpacked OLD mega
    rows.  Crossers in gathered groups merge the fresh neighbor row;
    everyone else keeps the mega's cached row (bit-identical to a refetch
    — the table is loop-invariant within run_cycles); crossers the
    capacity (or per-group rank) skipped go pending with their pre-hop
    tet/row, which the rare arena walks to the same endpoint (the walk
    re-derives the hop chain from the position).

    Raw-byte caveat: DEAD lanes (tet < 0) keep their stale cached row
    here, whereas the non-compact path overwrites them with tab[0]'s row
    (fill index 0).  Simulation state is still bit-identical — a dead
    lane's row cache is semantically unused and revival re-packs the mega
    from the table — but parity tests must compare simulation results
    (pos/vel/tet/active), not raw mega bytes."""
    mv = head_ref[HMV, :] > 0.5
    gfl = rg[LAYOUT_TET.row_w] > 0.5
    mv_eff = mv & gfl
    rows = [
        jnp.where(mv_eff, rg[k], mb[ROW + k])
        for k in range(LAYOUT_TET.row_w)
    ]
    return _b_core(scal_ref, rows, head_ref, mv_eff, mv & ~gfl)


def _b_core(scal_ref, rows, head_ref, mv, extra_pend, ly=LAYOUT_TET):
    """Shared kernel-B tail: re-test the selected row at the moved point,
    inline single bounce, mega re-assembly.  ``mv`` = lanes whose row in
    ``rows`` is the (gathered) NEIGHBOR row; ``extra_pend`` = lanes that
    must go to the rare arena regardless (compaction overflow).

    scal = [bounce_on, escape_on]: with escape_on, wall lanes whose exit
    slot's boundary face is absorbing (bit ``slot`` of the row's escape
    mask, col 19 — baked by mesh.set_boundary_escape; the jnp engine
    gathers mesh.bd_escape instead, same booleans) deactivate with
    tet = -(tet+1) instead of reflecting — RTQuery.cu:165-166's
    reflect-everywhere TODO done right, matching fused.py's inline
    bounce semantics bit-for-bit.  The mask column only exists in the
    bary LAYOUT_TET row (the Pk row has no pad col); the envelope keeps
    Pk + escape_faces on the jnp engine."""
    do_bounce = scal_ref[0] > 0.5
    esc_on = scal_ref[1] > 0.5

    wall0 = head_ref[HWALL, :] > 0.5
    px = head_ref[HPX, :]
    py = head_ref[HPY, :]
    pz = head_ref[HPZ, :]
    vx = head_ref[HVX, :]
    vy = head_ref[HVY, :]
    vz = head_ref[HVZ, :]
    actf = head_ref[HACT, :]
    s0 = head_ref[HSLOT, :].astype(jnp.int32)
    tet0 = head_ref[HTET, :]

    cur_tet = jnp.where(mv, head_ref[HIDX, :], tet0)

    # re-test the (possibly new) row at the moved point
    t = tuple(rows[3 + k] for k in range(9))
    wa, wb, wc, wd = _bary_rows(rows[0], rows[1], rows[2], t, px, py, pz)
    s_cur, wmin_h = _argmin4(wa, wb, wc, wd)
    unresolved = mv & (wmin_h < 0.0)

    wall = wall0
    wall_slot = jnp.where(wall0, s0, jnp.zeros_like(s0))

    # inline single bounce (fused.py:566-599) incl. absorbing patches;
    # both layouts carry the baked escape mask at row col row_w-1
    # (TetVelocity pad col 19, Pk col 28 — mesh.set_boundary_escape)
    refl = wall & do_bounce
    escm = rows[ly.row_w - 1].astype(jnp.int32)
    escb = _pick4(
        escm & 1, (escm >> 1) & 1, (escm >> 2) & 1, (escm >> 3) & 1,
        wall_slot,
    ) > 0
    code_w = _pick4(
        rows[ly.nbr], rows[ly.nbr + 1],
        rows[ly.nbr + 2], rows[ly.nbr + 3], wall_slot,
    )
    esc = refl & esc_on & (code_w < 0.0) & escb
    refl = refl & ~esc
    rf = refl.astype(jnp.float32)
    # bary gradient of the exit slot: row (slot-1) of Tinv, -(sum) for 0
    def grad(o):
        g0 = -(rows[3 + o] + rows[6 + o] + rows[9 + o])
        return jnp.where(
            wall_slot == 0, g0,
            jnp.where(
                wall_slot == 1, rows[3 + o],
                jnp.where(wall_slot == 2, rows[6 + o], rows[9 + o]),
            ),
        )

    gx, gy, gz = grad(0), grad(1), grad(2)
    wv = _pick4(wa, wb, wc, wd, wall_slot)
    gg = gx * gx + gy * gy + gz * gz
    inv_g2 = rf / (gg + (1.0 - rf))
    f = 2.0 * wv * inv_g2
    px = px - f * gx
    py = py - f * gy
    pz = pz - f * gz
    fu = 2.0 * (vx * gx + vy * gy + vz * gz) * inv_g2
    vx = vx - fu * gx
    vy = vy - fu * gy
    vz = vz - fu * gz
    wa2, wb2, wc2, wd2 = _bary_rows(rows[0], rows[1], rows[2], t, px, py, pz)
    wmin2 = jnp.minimum(jnp.minimum(wa2, wb2), jnp.minimum(wc2, wd2))
    landed = refl & (wmin2 >= 0.0)
    # NOT jnp.where: Mosaic cannot legalize select on i1 vectors
    wall_out = (do_bounce & refl & ~landed) | (~do_bounce & wall)

    mrows = [None] * ly.width
    mrows[P0], mrows[P0 + 1], mrows[P0 + 2] = px, py, pz
    mrows[V0], mrows[V0 + 1], mrows[V0 + 2] = vx, vy, vz
    mrows[TET] = jnp.where(esc, -(cur_tet + 1.0), cur_tet)
    mrows[ACT] = jnp.where(esc, jnp.zeros_like(actf), actf)
    for k in range(ly.row_w):
        mrows[ROW + k] = rows[k]
    for k in range(ROW + ly.row_w, ly.width):
        mrows[k] = jnp.zeros_like(px)
    pend = unresolved | wall_out
    if extra_pend is not None:
        pend = pend | extra_pend
    return mrows, pend


def _kernel_b(scal_ref, rows_ref, head_ref, out_ref, pend_ref, *,
              ly=LAYOUT_TET):
    mrows, pend = _b_compute(scal_ref, rows_ref, head_ref, ly)
    for k in range(ly.width):
        out_ref[k, :] = mrows[k]
    pend_ref[0, :] = pend.astype(jnp.float32)
    for r in range(1, 8):
        pend_ref[r, :] = jnp.zeros_like(mrows[0])


def _kernel_b_packed(scal_ref, rows_ref, head_ref, out_ref, pend_ref, *,
                     ly=LAYOUT_TET):
    """kernel B writing the packed [BN/4, 4W] mega block (in-VMEM
    grouped pack); ``rows_ref``/``head_ref``/``pend_ref`` are in grouped
    lane order (the caller un-permutes pend with :func:`from_grouped`)."""
    mrows, pend = _b_compute(scal_ref, rows_ref, head_ref, ly)
    out_ref[:] = _pack_grouped(mrows)
    pend_ref[0, :] = pend.astype(jnp.float32)
    for r in range(1, 8):
        pend_ref[r, :] = jnp.zeros_like(mrows[0])


def _kernel_b_packed_c(scal_ref, m_ref, rows4_ref, head_ref, out_ref,
                       pend_ref):
    """:_kernel_b_packed: for the block-compacted hop gather: reads the
    OLD packed mega block (row source for lanes the compaction skipped)
    plus the [bn4, 128] scattered row-group buffer (natural lane 4i+q's
    row at packed row i, cols 32q..32q+19, valid flag at 32q+20)."""
    mb = _unpack_grouped(m_ref, LAYOUT_TET.width)
    rg = _unpack_grouped(rows4_ref, LAYOUT_TET.width)
    mrows, pend = _b_compute_c(scal_ref, mb, rg, head_ref)
    out_ref[:] = _pack_grouped(mrows)
    pend_ref[0, :] = pend.astype(jnp.float32)
    for r in range(1, 8):
        pend_ref[r, :] = jnp.zeros_like(mrows[0])


CB_SRC = 1024       # src-builder kernel: group-rows per grid block


def _kernel_src_c(g0t_ref, g1t_ref, rq_ref, out_ref):
    """Assemble the compacted hop-row scatter source [CB, 4*Wm] from the
    two transposed gathered rows + the bit-packed rank selectors: slot q
    of group row i gets (g1 if its rank select == 1 else g0) at cols
    Wm*q..Wm*q+rw-1 and the valid flag (rank <= 1) at Wm*q+rw.  Replaces
    the XLA-side select fusion + 12-piece concatenate + four 1-col layout
    copies (~1.7 ms/cycle at 1M lanes) with one VPU pass at HBM speed.
    Row width and mega width come from the ref shapes (bary rows 20/32,
    convex rows 24/32)."""
    rw = g0t_ref.shape[0]
    cb = out_ref.shape[0]
    wm = out_ref.shape[1] // 4
    rq = rq_ref[0, :]
    g0 = g0t_ref[:, :]
    g1 = g1t_ref[:, :]
    zpad = jnp.zeros((wm - rw - 1, cb), out_ref.dtype)
    parts = []
    for q in range(4):
        sq = (rq >> (2 * q)) & 3
        rows_q = jnp.where((sq == 1)[None, :], g1, g0)
        flag_q = (sq <= 1).astype(out_ref.dtype)[None, :]
        parts += [rows_q, flag_q, zpad]
    out_ref[:, :] = jnp.concatenate(parts, axis=0).T


def _compact_hop_rows(tab, head, n, frac, idx_row=HIDX, mv_row=HMV,
                      width=None):
    """Rank-2 block-compacted hop-gather staging: returns the [n/4, 4*Wm]
    scattered row-group buffer for :func:`_kernel_b_packed_c` (bary) or
    :func:`_kernel_cb_packed_c` (convex; ``idx_row``/``mv_row`` select
    the head rows holding the gather index and the crossing flag).

    Gathers TWO table rows per crosser-containing 4-lane packed group
    (mean crossers per pending group ~1.2 at headline rates) and
    duplicates them into the crossing slots' Wm-col blocks with rank
    selects; col Wm*q+rw is the per-slot valid flag (0 for rank-overflow
    slots — third+ crossers — and unscattered groups, which kernel B
    routes to the rare arena).  The rank selectors ride the compaction
    sort as one bit-packed payload.  All staging stays rank-2 with a
    dense 128 minor (narrow / rank-3 intermediates tile-pad 4-8x).  A
    4-lane group j holds natural lanes 4j+q at grouped position
    q*(BN_B/4)+i of pallas block b (j = b*(BN_B/4)+i), so the per-slot
    index/flag vectors are strided views of the GROUPED head."""
    rw = tab.shape[1]
    Wm = width if width is not None else LAYOUT_TET.width
    nblk = n // BN_B
    g4 = BN_B // 4
    nb4 = n // 4
    dtype = head.dtype
    hid3 = head[idx_row, :].reshape(nblk, 4, g4)
    mv3 = head[mv_row, :].reshape(nblk, 4, g4)
    hq = [hid3[:, q, :].reshape(nb4).astype(jnp.int32) for q in range(4)]
    mq = [mv3[:, q, :].reshape(nb4) > 0.5 for q in range(4)]
    bpend = mq[0] | mq[1] | mq[2] | mq[3]
    # first/second crossing slot's gather index (fallbacks are
    # always-valid tet ids: non-crossers' hid is their own tet)
    i0 = jnp.where(
        mq[0], hq[0],
        jnp.where(mq[1], hq[1], jnp.where(mq[2], hq[2], hq[3])),
    )
    after0 = jnp.where(mq[1], hq[1], jnp.where(mq[2], hq[2], hq[3]))
    after1 = jnp.where(mq[2], hq[2], hq[3])
    i1 = jnp.where(mq[0], after0, jnp.where(mq[1], after1, hq[3]))
    # per-slot rank selector: 0 -> row0, 1 -> row1, 2 -> overflow
    # (third+ crosser; goes to the rare arena via flag 0)
    sel = []
    rank = jnp.zeros(nb4, jnp.int32)
    for q in range(4):
        sel.append(jnp.where(mq[q], jnp.minimum(rank, 2), 3))
        rank = rank + mq[q].astype(jnp.int32)
    rqpack = sel[0] | (sel[1] << 2) | (sel[2] << 4) | (sel[3] << 6)
    blk_iota = jax.lax.broadcasted_iota(jnp.int32, (nb4, 1), 0)[:, 0]
    keys = jnp.where(bpend, blk_iota, nb4)
    capb = min(max(-(-int(nb4 * frac) // CB_SRC) * CB_SRC, CB_SRC), nb4)
    # ride rqpack on the i0 payload when tet ids fit 23 bits (8.4M tets)
    # — one fewer sort column
    pack_rq = tab.shape[0] < (1 << 23)
    if pack_rq:
        skey, d0, d1 = jax.lax.sort(
            (keys, i0 | (rqpack << 23), i1), num_keys=1
        )
        rqc = (d0[:capb] >> 23) & 0xFF
        i0c = d0[:capb] & ((1 << 23) - 1)
    else:
        skey, d0, d1, drq = jax.lax.sort((keys, i0, i1, rqpack), num_keys=1)
        rqc = drq[:capb]
        i0c = d0[:capb]
    bidx = skey[:capb]
    g0 = jax.lax.optimization_barrier(
        tab[jax.lax.optimization_barrier(i0c)]
    )
    g1 = jax.lax.optimization_barrier(
        tab[jax.lax.optimization_barrier(d1[:capb])]
    )
    src = pl.pallas_call(
        _kernel_src_c,
        out_shape=jax.ShapeDtypeStruct((capb, 4 * Wm), dtype),
        grid=(capb // CB_SRC,),
        in_specs=[
            pl.BlockSpec((rw, CB_SRC), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rw, CB_SRC), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CB_SRC), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CB_SRC, 4 * Wm), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )(g0.T, g1.T, rqc.reshape(1, capb))
    return jnp.zeros((nb4, 4 * Wm), dtype).at[bidx].set(src, mode="drop")


def _interp_ok(mesh, cfg) -> bool:
    """Interp-mode envelope shared by the pallas paths: TetVelocity
    always; VertexVelocity (Pk) when the 29-col row table exists (its
    last column carries the baked escape mask, so Pk + escape_faces is
    inside the envelope too)."""
    from .advect import TET_VELOCITY, VERTEX_VELOCITY

    if cfg.velocity_interp == TET_VELOCITY:
        return True
    if cfg.velocity_interp == VERTEX_VELOCITY:
        return (
            mesh.tet_row_pk is not None
            and mesh.tet_row_pk.shape[1] == LAYOUT_PK.row_w
        )
    return False


def supported(mesh, cfg, n_hops: int) -> bool:
    """Envelope check for the pallas fast path."""
    if getattr(cfg, "engine_impl", "auto") == "jnp":
        return False
    if getattr(cfg, "integrator", "euler") != "euler":
        return False          # rk4 stage walks ride the jnp cached engine
    if not _interp_ok(mesh, cfg) or not (1 <= n_hops <= 8):
        return False
    if mesh.points.dtype != jnp.float32:     # f64 = CPU parity mode
        return False
    try:
        # the tests pin CPU via jax_default_device while the TPU plugin
        # still enumerates its device, so check where work actually lands
        dd = jax.config.jax_default_device
        plat = dd.platform if dd is not None else jax.default_backend()
        return plat not in ("cpu",)
    except Exception:
        return False


def packed_supported(mesh, cfg, n_hops: int) -> bool:
    """Envelope for the packed-carry cycle — the DEFAULT TPU path: the
    mega rides the sub-cycling loop in its row-major packed form, so the
    per-cycle {0,1}<->{1,0} layout copy pair around the rare stage
    (~1.9 ms at 1M lanes) disappears.  Measured 15.56 -> 14.87 ms/cycle
    on the 1M headline (the in-VMEM grouped transposes and the xi/pend
    lane permutes give back ~1.2 ms of the 1.9); bit-identical to the
    jnp engine on hardware, incl. ragged lane counts and hops=4.
    engine_impl='pallas' forces the transposed-view kernels instead."""
    if getattr(cfg, "engine_impl", "auto") not in ("auto", "pallas_packed"):
        return False
    if getattr(cfg, "integrator", "euler") != "euler":
        return False          # rk4 stage walks ride the jnp cached engine
    if not (1 <= n_hops <= 8):
        return False
    if not _interp_ok(mesh, cfg):
        return False
    if mesh.points.dtype != jnp.float32:
        return False
    try:
        dd = jax.config.jax_default_device
        plat = dd.platform if dd is not None else jax.default_backend()
        return plat not in ("cpu",)
    except Exception:
        return False


def pre_rare_cycle_packed(mesh, tab, m_rm, rng_key, step, cfg, dt,
                          noise=None, n_hops: int = 1, lane_offset=0):
    """Packed-carry stream section: kernel A/B read and write the mega as
    its row-major [n/4, 128] bytes (in-VMEM pack/unpack transposes), so
    the XLA rare stage and the cycle carry share ONE layout.  For
    n_hops > 1 the skinny hop chain runs between the packed A and B2.

    The kernels operate in GROUPED lane order per pallas block (see
    :func:`_unpack_grouped`); xi enters and pend leaves through the
    cheap XLA-side :func:`to_grouped`/:func:`from_grouped` permutes, and
    the caller guarantees ``n % PACK_LANES == 0``."""
    n4, W4 = m_rm.shape
    n = n4 * 4
    W = W4 // 4
    ly = layout_for(cfg)
    xi = None
    iscal = None
    if _use_inkernel_noise(cfg):
        iscal = _noise_iscal(rng_key, step, lane_offset)
        xiT = None
    else:
        if cfg.use_brownian:
            xi = noise if noise is not None else _brownian_noise(
                rng_key, step, n, m_rm.dtype, cfg, lane_offset=lane_offset
            )
        xiT = to_grouped(
            xi.T if xi is not None else jnp.zeros((3, n), m_rm.dtype)
        )
    scal = jnp.asarray(
        [
            dt,
            jnp.sqrt(2.0 * cfg.diffusion_coeff * dt).astype(m_rm.dtype),
            1.0 if cfg.use_advection else 0.0,
            1.0 if (cfg.use_brownian and (xi is not None or iscal is not None))
            else 0.0,
        ],
        m_rm.dtype,
    )
    vm = pltpu.VMEM
    scal_b = jnp.asarray(
        [1.0 if (cfg.reflect_wall and getattr(cfg, "inline_bounce", True))
         else 0.0,
         1.0 if getattr(cfg, "escape_faces", False) else 0.0],
        m_rm.dtype,
    )
    if n_hops == 1:
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        if iscal is not None:
            head = pl.pallas_call(
                partial(_kernel_a_packed_k, ly=ly),
                out_shape=jax.ShapeDtypeStruct((HEAD_W, n), m_rm.dtype),
                grid=(pl.cdiv(n, BN_B),),
                in_specs=[
                    smem,
                    smem,
                    pl.BlockSpec(
                        (BN_B // 4, W4), lambda i: (i, 0), memory_space=vm
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (HEAD_W, BN_B), lambda i: (0, i), memory_space=vm
                ),
            )(scal, iscal, m_rm)
        else:
            head = pl.pallas_call(
                partial(_kernel_a_packed, ly=ly),
                out_shape=jax.ShapeDtypeStruct((HEAD_W, n), m_rm.dtype),
                grid=(pl.cdiv(n, BN_B),),
                in_specs=[
                    smem,
                    pl.BlockSpec(
                        (BN_B // 4, W4), lambda i: (i, 0), memory_space=vm
                    ),
                    pl.BlockSpec((3, BN_B), lambda i: (0, i), memory_space=vm),
                ],
                out_specs=pl.BlockSpec(
                    (HEAD_W, BN_B), lambda i: (0, i), memory_space=vm
                ),
            )(scal, m_rm, xiT)
        if getattr(cfg, "hop_compact", 0) == 4 and ly is LAYOUT_TET:
            # block-compacted hop gather: fetch neighbor rows only for
            # 4-lane packed groups containing a crosser (~42% of groups
            # at the headline's 12.8% crossing rate) instead of
            # refetching every lane's row — the full-batch gather is the
            # measured per-INDEX wall (8.0 of 13.1 ms at 1M lanes), and
            # masking indices to a hot fill set gathers 2x SLOWER
            # (round-3 dead end), so issuing fewer indices is the only
            # lever.  Groups the capacity misses — and third/fourth
            # crossers within one group — overflow to the rare arena
            # (same endpoint; never wrong; P(>=3 crossers | pending
            # group) ~2% at the headline's rate).
            # Staging (v3, profile-tuned): gather TWO rows per pending
            # group (mean crossers per pending group is ~1.2) and
            # duplicate them into the crossing slots' columns with
            # rank selects — the gather is per-INDEX cost, so 2 indices
            # beat 4 (v1) and SMALL index gathers are NOT cheaper (v2
            # measured [capb] gathers from 1 MB arrays at the same
            # ~8 ns/idx as 80 MB-table row gathers, and a rows4 loop
            # carry scattered IN PLACE at 1.44 ms vs 1.29 for
            # zeros+scatter — both reverted).  The per-slot rank
            # selectors ride the compaction sort as ONE bit-packed
            # payload.  All staging stays rank-2 with a dense 128 minor:
            # narrow or rank-3 intermediates tile-pad 4-8x and cost
            # ~12 ms/cycle in relayout DUS (measured).  A 4-lane group j
            # holds natural lanes 4j+q at grouped position q*(BN_B/4)+i
            # of pallas block b (j = b*(BN_B/4)+i) — the per-slot index
            # vectors are strided views of the GROUPED head.
            rows4 = _compact_hop_rows(
                tab, head, n,
                float(getattr(cfg, "hop_compact_frac", 0.5)),
            )
            m_rm_new, pendT = pl.pallas_call(
                _kernel_b_packed_c,
                out_shape=(
                    jax.ShapeDtypeStruct((n4, W4), m_rm.dtype),
                    jax.ShapeDtypeStruct((8, n), m_rm.dtype),
                ),
                # the mega is updated IN PLACE (block i is read before
                # block i is written; kernel A's read strictly precedes
                # via the head dependency) — without the alias XLA keeps
                # a second 128 MB loop-carry buffer and copies into it
                # every cycle (copy.390, 0.39 ms at 1M lanes)
                input_output_aliases={1: 0},
                grid=(pl.cdiv(n, BN_B),),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(
                        (BN_B // 4, W4), lambda i: (i, 0), memory_space=vm
                    ),
                    pl.BlockSpec(
                        (BN_B // 4, 4 * LAYOUT_TET.width), lambda i: (i, 0),
                        memory_space=vm,
                    ),
                    pl.BlockSpec(
                        (HEAD_W, BN_B), lambda i: (0, i), memory_space=vm
                    ),
                ],
                out_specs=(
                    pl.BlockSpec(
                        (BN_B // 4, W4), lambda i: (i, 0), memory_space=vm
                    ),
                    pl.BlockSpec((8, BN_B), lambda i: (0, i), memory_space=vm),
                ),
            )(scal_b, m_rm, rows4, head)
            return m_rm_new, from_grouped(pendT[0, :] > 0.5)
        rows_g = jax.lax.optimization_barrier(
            tab[jax.lax.optimization_barrier(head[HIDX, :].astype(jnp.int32))]
        )
        m_rm_new, pendT = pl.pallas_call(
            partial(_kernel_b_packed, ly=ly),
            out_shape=(
                jax.ShapeDtypeStruct((n4, W4), m_rm.dtype),
                jax.ShapeDtypeStruct((8, n), m_rm.dtype),
            ),
            grid=(pl.cdiv(n, BN_B),),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (ly.row_w, BN_B), lambda i: (0, i), memory_space=vm
                ),
                pl.BlockSpec((HEAD_W, BN_B), lambda i: (0, i), memory_space=vm),
            ],
            out_specs=(
                pl.BlockSpec((BN_B // 4, W4), lambda i: (i, 0), memory_space=vm),
                pl.BlockSpec((8, BN_B), lambda i: (0, i), memory_space=vm),
            ),
        )(scal_b, rows_g.T, head)
        return m_rm_new, from_grouped(pendT[0, :] > 0.5)

    # multi-hop: packed A -> (gather -> H) x (k-1) -> gather -> packed B2
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape_a = (
        jax.ShapeDtypeStruct((HEAD_W, n), m_rm.dtype),
        jax.ShapeDtypeStruct((S_W, n), m_rm.dtype),
    )
    out_specs_a = (
        pl.BlockSpec((HEAD_W, BN_B), lambda i: (0, i), memory_space=vm),
        pl.BlockSpec((S_W, BN_B), lambda i: (0, i), memory_space=vm),
    )
    if iscal is not None:
        head, st = pl.pallas_call(
            partial(_kernel_a_mh_packed_k, ly=ly),
            out_shape=out_shape_a,
            grid=(pl.cdiv(n, BN_B),),
            in_specs=[
                smem,
                smem,
                pl.BlockSpec(
                    (BN_B // 4, W4), lambda i: (i, 0), memory_space=vm
                ),
            ],
            out_specs=out_specs_a,
        )(scal, iscal, m_rm)
    else:
        head, st = pl.pallas_call(
            partial(_kernel_a_mh_packed, ly=ly),
            out_shape=out_shape_a,
            grid=(pl.cdiv(n, BN_B),),
            in_specs=[
                smem,
                pl.BlockSpec(
                    (BN_B // 4, W4), lambda i: (i, 0), memory_space=vm
                ),
                pl.BlockSpec((3, BN_B), lambda i: (0, i), memory_space=vm),
            ],
            out_specs=out_specs_a,
        )(scal, m_rm, xiT)
    for _h in range(n_hops - 1):
        rows_g = jax.lax.optimization_barrier(
            tab[jax.lax.optimization_barrier(st[S_IDX, :].astype(jnp.int32))]
        )
        st = pl.pallas_call(
            partial(_kernel_h, ly=ly),
            out_shape=jax.ShapeDtypeStruct((S_W, n), m_rm.dtype),
            grid=(pl.cdiv(n, BN_B),),
            in_specs=[
                pl.BlockSpec((S_W, BN_B), lambda i: (0, i), memory_space=vm),
                pl.BlockSpec(
                    (ly.row_w, BN_B), lambda i: (0, i),
                    memory_space=vm,
                ),
                pl.BlockSpec((HEAD_W, BN_B), lambda i: (0, i), memory_space=vm),
            ],
            out_specs=pl.BlockSpec(
                (S_W, BN_B), lambda i: (0, i), memory_space=vm
            ),
        )(st, rows_g.T, head)
    rows_g = jax.lax.optimization_barrier(
            tab[jax.lax.optimization_barrier(st[S_IDX, :].astype(jnp.int32))]
        )
    m_rm_new, pendT = pl.pallas_call(
        partial(_kernel_b2_packed, ly=ly),
        out_shape=(
            jax.ShapeDtypeStruct((n4, W4), m_rm.dtype),
            jax.ShapeDtypeStruct((8, n), m_rm.dtype),
        ),
        grid=(pl.cdiv(n, BN_B),),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((S_W, BN_B), lambda i: (0, i), memory_space=vm),
            pl.BlockSpec(
                (ly.row_w, BN_B), lambda i: (0, i), memory_space=vm
            ),
            pl.BlockSpec((HEAD_W, BN_B), lambda i: (0, i), memory_space=vm),
        ],
        out_specs=(
            pl.BlockSpec((BN_B // 4, W4), lambda i: (i, 0), memory_space=vm),
            pl.BlockSpec((8, BN_B), lambda i: (0, i), memory_space=vm),
        ),
    )(scal_b, st, rows_g.T, head)
    return m_rm_new, from_grouped(pendT[0, :] > 0.5)


def stream_pre_hop(m, xi, cfg, dt, iscal=None):
    """Kernel A over the transposed mega; returns the [16, n] head.
    ``iscal`` (from :func:`_noise_iscal`) selects the in-kernel-noise
    variant instead of the xi operand."""
    n, W = m.shape
    mT = m.T
    scal = jnp.asarray(
        [
            dt,
            # EXACTLY fused.py's sigma expression (python-f64 product,
            # one rounding): a pre-rounded dt differs in the last ulp
            jnp.sqrt(2.0 * cfg.diffusion_coeff * dt).astype(m.dtype),
            1.0 if cfg.use_advection else 0.0,
            1.0 if (cfg.use_brownian and (xi is not None or iscal is not None))
            else 0.0,
        ],
        m.dtype,
    )
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmA = pltpu.VMEM
    ly = layout_for(cfg)
    if iscal is not None:
        return pl.pallas_call(
            partial(_kernel_a_k, ly=ly),
            out_shape=jax.ShapeDtypeStruct((HEAD_W, n), m.dtype),
            grid=(pl.cdiv(n, BN_A),),
            in_specs=[
                smem,
                smem,
                pl.BlockSpec((W, BN_A), lambda i: (0, i), memory_space=vmA),
            ],
            out_specs=pl.BlockSpec(
                (HEAD_W, BN_A), lambda i: (0, i), memory_space=vmA
            ),
        )(scal, iscal, mT)
    xiT = xi.T if xi is not None else jnp.zeros((3, n), m.dtype)
    head = pl.pallas_call(
        partial(_kernel_a, ly=ly),
        out_shape=jax.ShapeDtypeStruct((HEAD_W, n), m.dtype),
        grid=(pl.cdiv(n, BN_A),),
        in_specs=[
            smem,
            pl.BlockSpec((W, BN_A), lambda i: (0, i), memory_space=vmA),
            pl.BlockSpec((3, BN_A), lambda i: (0, i), memory_space=vmA),
        ],
        out_specs=pl.BlockSpec(
            (HEAD_W, BN_A), lambda i: (0, i), memory_space=vmA
        ),
    )(scal, mT, xiT)
    return head


def stream_post_hop(m, rows_g, head, cfg):
    """Kernel B; returns (m', pending).  Reads only the gathered rows and
    the head — the self-gather made the old-mega merge redundant."""
    n, W = m.shape
    rowsT = rows_g.T
    scal = jnp.asarray(
        [1.0 if (cfg.reflect_wall and getattr(cfg, "inline_bounce", True))
         else 0.0,
         1.0 if getattr(cfg, "escape_faces", False) else 0.0],
        m.dtype,
    )
    ly = layout_for(cfg)
    mT_new, pendT = pl.pallas_call(
        partial(_kernel_b, ly=ly),
        out_shape=(
            jax.ShapeDtypeStruct((W, n), m.dtype),
            jax.ShapeDtypeStruct((8, n), m.dtype),
        ),
        grid=(pl.cdiv(n, BN_B),),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (ly.row_w, BN_B), lambda i: (0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((HEAD_W, BN_B), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((W, BN_B), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, BN_B), lambda i: (0, i), memory_space=pltpu.VMEM),
        ),
    )(scal, rowsT, head)
    return mT_new.T, pendT[0, :] > 0.5


# ---------------------------------------------------------------------------
# multi-hop extension (inline_hops >= 2, e.g. the tutorial-scale regime of
# ~1 cell crossed per sub-step): each further hop is one XLA row gather +
# one kernel H (re-test + next-hop classification); kernel B2 finishes with
# the inline bounce + assembly.  Chain: A -> (gather -> H) x k -> B2.
#
# There is no carried row buffer and no merge: every hop's gather uses each
# lane's own tet as the masked fill index, so rows_g IS the current row
# cache for every lane with tet >= 0 (see kernel B's docstring) — the hop
# state is a skinny flag buffer.
# ---------------------------------------------------------------------------

# hop-state rows (skinny S buffer)
S_TET, S_UNRES, S_WALL, S_WSLOT, S_MV, S_IDX = range(6)
S_W = 8


def _kernel_a_mh(scal_ref, m_ref, xi_ref, out_ref, s_ref, *, ly=LAYOUT_TET):
    """kernel A + the hop-1 state flags for the multi-hop chain."""
    _kernel_a(scal_ref, m_ref, xi_ref, out_ref, ly=ly)
    s_ref[S_TET, :] = m_ref[TET, :]
    s_ref[S_UNRES, :] = out_ref[HMV, :]      # placeholder; H overwrites
    s_ref[S_WALL, :] = out_ref[HWALL, :]
    s_ref[S_WSLOT, :] = out_ref[HSLOT, :]
    s_ref[S_MV, :] = out_ref[HMV, :]
    s_ref[S_IDX, :] = out_ref[HIDX, :]
    for k in range(S_IDX + 1, S_W):
        s_ref[k, :] = jnp.zeros_like(s_ref[0, :])


def _kernel_a_mh_k(scal_ref, iscal_ref, m_ref, out_ref, s_ref, *,
                   ly=LAYOUT_TET):
    """:_kernel_a_mh: with in-kernel noise."""
    _kernel_a_k(scal_ref, iscal_ref, m_ref, out_ref, ly=ly)
    s_ref[S_TET, :] = m_ref[TET, :]
    s_ref[S_UNRES, :] = out_ref[HMV, :]
    s_ref[S_WALL, :] = out_ref[HWALL, :]
    s_ref[S_WSLOT, :] = out_ref[HSLOT, :]
    s_ref[S_MV, :] = out_ref[HMV, :]
    s_ref[S_IDX, :] = out_ref[HIDX, :]
    for k in range(S_IDX + 1, S_W):
        s_ref[k, :] = jnp.zeros_like(s_ref[0, :])


def _kernel_h(s_in_ref, rows_ref, head_ref, s_out_ref, *, ly=LAYOUT_TET):
    """One inline hop: re-test the gathered (= current) rows at the moved
    point, classify the next crossing (fused.py's hop-loop body).  The
    FINAL hop's re-test happens inside kernel B2 (which computes that
    barycentric test anyway for the bounce), so the chain issues exactly
    n_hops gathers like the jnp loop."""
    mv = s_in_ref[S_MV, :] > 0.5
    px = head_ref[HPX, :]
    py = head_ref[HPY, :]
    pz = head_ref[HPZ, :]

    rows = [rows_ref[k, :] for k in range(ly.row_w)]
    cur_tet = jnp.where(mv, s_in_ref[S_IDX, :], s_in_ref[S_TET, :])
    t = tuple(rows[3 + k] for k in range(9))
    wa, wb, wc, wd = _bary_rows(rows[0], rows[1], rows[2], t, px, py, pz)
    s_cur, wmin = _argmin4(wa, wb, wc, wd)
    unresolved = mv & (wmin < 0.0)

    wall = s_in_ref[S_WALL, :] > 0.5
    wall_slot = s_in_ref[S_WSLOT, :].astype(jnp.int32)
    code = _pick4(
        rows[ly.nbr], rows[ly.nbr + 1],
        rows[ly.nbr + 2], rows[ly.nbr + 3], s_cur,
    )
    mv_next = unresolved & (code >= 0.0)
    new_wall = unresolved & (code < 0.0)
    wall_slot = jnp.where(new_wall, s_cur, wall_slot)
    wall = wall | new_wall
    idx = jnp.where(mv_next, code, jnp.maximum(cur_tet, 0.0))
    unresolved = mv_next

    s_out_ref[S_TET, :] = cur_tet
    s_out_ref[S_UNRES, :] = unresolved.astype(jnp.float32)
    s_out_ref[S_WALL, :] = wall.astype(jnp.float32)
    s_out_ref[S_WSLOT, :] = wall_slot.astype(jnp.float32)
    s_out_ref[S_MV, :] = mv_next.astype(jnp.float32)
    s_out_ref[S_IDX, :] = idx
    for k in range(S_IDX + 1, S_W):
        s_out_ref[k, :] = jnp.zeros_like(px)


def _b2_compute(scal_ref, s_ref, rows_ref, head_ref, ly=LAYOUT_TET):
    """Multi-hop finisher core: final re-test + inline single bounce;
    returns (mega rows, pending) — shared by the transposed-view and
    packed-carry B2 writers."""
    do_bounce = scal_ref[0] > 0.5

    px = head_ref[HPX, :]
    py = head_ref[HPY, :]
    pz = head_ref[HPZ, :]
    vx = head_ref[HVX, :]
    vy = head_ref[HVY, :]
    vz = head_ref[HVZ, :]
    actf = head_ref[HACT, :]
    rows = [rows_ref[k, :] for k in range(ly.row_w)]
    mv = s_ref[S_MV, :] > 0.5
    cur_tet = jnp.where(mv, s_ref[S_IDX, :], s_ref[S_TET, :])
    wall = s_ref[S_WALL, :] > 0.5
    wall_slot = s_ref[S_WSLOT, :].astype(jnp.int32)

    # the final hop's re-test (jnp loop's last `unresolved`) — this bary
    # doubles as the bounce's face value below
    t = tuple(rows[3 + k] for k in range(9))
    wa, wb, wc, wd = _bary_rows(rows[0], rows[1], rows[2], t, px, py, pz)
    wmin_h = jnp.minimum(jnp.minimum(wa, wb), jnp.minimum(wc, wd))
    unresolved = mv & (wmin_h < 0.0)

    refl = wall & do_bounce
    esc_on = scal_ref[1] > 0.5
    # both layouts carry the baked escape mask at row col row_w-1
    escm = rows[ly.row_w - 1].astype(jnp.int32)
    escb = _pick4(
        escm & 1, (escm >> 1) & 1, (escm >> 2) & 1, (escm >> 3) & 1,
        wall_slot,
    ) > 0
    code_w = _pick4(
        rows[ly.nbr], rows[ly.nbr + 1],
        rows[ly.nbr + 2], rows[ly.nbr + 3], wall_slot,
    )
    esc = refl & esc_on & (code_w < 0.0) & escb
    refl = refl & ~esc
    rf = refl.astype(jnp.float32)

    def grad(o):
        g0 = -(rows[3 + o] + rows[6 + o] + rows[9 + o])
        return jnp.where(
            wall_slot == 0, g0,
            jnp.where(
                wall_slot == 1, rows[3 + o],
                jnp.where(wall_slot == 2, rows[6 + o], rows[9 + o]),
            ),
        )

    gx, gy, gz = grad(0), grad(1), grad(2)
    wv = _pick4(wa, wb, wc, wd, wall_slot)
    gg = gx * gx + gy * gy + gz * gz
    inv_g2 = rf / (gg + (1.0 - rf))
    f = 2.0 * wv * inv_g2
    px = px - f * gx
    py = py - f * gy
    pz = pz - f * gz
    fu = 2.0 * (vx * gx + vy * gy + vz * gz) * inv_g2
    vx = vx - fu * gx
    vy = vy - fu * gy
    vz = vz - fu * gz
    wa2, wb2, wc2, wd2 = _bary_rows(rows[0], rows[1], rows[2], t, px, py, pz)
    wmin2 = jnp.minimum(jnp.minimum(wa2, wb2), jnp.minimum(wc2, wd2))
    landed = refl & (wmin2 >= 0.0)
    wall_out = (do_bounce & refl & ~landed) | (~do_bounce & wall)

    mrows = [None] * ly.width
    mrows[P0], mrows[P0 + 1], mrows[P0 + 2] = px, py, pz
    mrows[V0], mrows[V0 + 1], mrows[V0 + 2] = vx, vy, vz
    mrows[TET] = jnp.where(esc, -(cur_tet + 1.0), cur_tet)
    mrows[ACT] = jnp.where(esc, jnp.zeros_like(actf), actf)
    for k in range(ly.row_w):
        mrows[ROW + k] = rows[k]
    for k in range(ROW + ly.row_w, ly.width):
        mrows[k] = jnp.zeros_like(px)
    pend = unresolved | wall_out
    return mrows, pend


def _kernel_b2(scal_ref, s_ref, rows_ref, head_ref, out_ref, pend_ref, *,
               ly=LAYOUT_TET):
    mrows, pend = _b2_compute(scal_ref, s_ref, rows_ref, head_ref, ly)
    for k in range(ly.width):
        out_ref[k, :] = mrows[k]
    pend_ref[0, :] = pend.astype(jnp.float32)
    for r in range(1, 8):
        pend_ref[r, :] = jnp.zeros_like(mrows[0])


def _kernel_b2_packed(scal_ref, s_ref, rows_ref, head_ref, out_ref, pend_ref,
                      *, ly=LAYOUT_TET):
    mrows, pend = _b2_compute(scal_ref, s_ref, rows_ref, head_ref, ly)
    out_ref[:] = _pack_grouped(mrows)
    pend_ref[0, :] = pend.astype(jnp.float32)
    for r in range(1, 8):
        pend_ref[r, :] = jnp.zeros_like(mrows[0])


def _mh_flags_packed(out, mb, out_ref, s_ref):
    """Write the head + hop-1 state flags (shared by the packed multihop
    kernel A variants)."""
    for r in range(HEAD_W):
        out_ref[r, :] = out[r]
    s_ref[S_TET, :] = mb[TET]
    s_ref[S_UNRES, :] = out[HMV]
    s_ref[S_WALL, :] = out[HWALL]
    s_ref[S_WSLOT, :] = out[HSLOT]
    s_ref[S_MV, :] = out[HMV]
    s_ref[S_IDX, :] = out[HIDX]
    for k in range(S_IDX + 1, S_W):
        s_ref[k, :] = jnp.zeros_like(out[0])


def _kernel_a_mh_packed(scal_ref, m_ref, xi_ref, out_ref, s_ref, *,
                        ly=LAYOUT_TET):
    """packed-carry kernel A + hop-1 state flags (grouped lane order)."""
    mb = _unpack_grouped(m_ref, ly.width)
    out = _a_compute(scal_ref, lambda r: mb[r], xi_ref, ly)
    _mh_flags_packed(out, mb, out_ref, s_ref)


def _kernel_a_mh_packed_k(scal_ref, iscal_ref, m_ref, out_ref, s_ref, *,
                          ly=LAYOUT_TET):
    """:_kernel_a_mh_packed: with in-kernel noise."""
    mb = _unpack_grouped(m_ref, ly.width)
    xi = _inkernel_noise(iscal_ref, m_ref.shape[0] * 4)
    out = _a_compute(scal_ref, lambda r: mb[r], xi, ly)
    _mh_flags_packed(out, mb, out_ref, s_ref)


def pre_rare_cycle_multihop(mesh, tab, m, rng_key, step, cfg, dt, n_hops,
                            noise=None, lane_offset=0):
    """A -> (gather -> H) x (n_hops-1) -> gather -> B2; n_hops gathers in
    total, like the jnp loop.  Returns (m', pending)."""
    n, W = m.shape
    xi = None
    iscal = None
    if _use_inkernel_noise(cfg):
        iscal = _noise_iscal(rng_key, step, lane_offset)
    elif cfg.use_brownian:
        xi = noise if noise is not None else _brownian_noise(
            rng_key, step, n, m.dtype, cfg, lane_offset=lane_offset
        )
    mT = m.T
    scal = jnp.asarray(
        [
            dt,
            # EXACTLY fused.py's sigma expression (python-f64 product,
            # one rounding): a pre-rounded dt differs in the last ulp
            jnp.sqrt(2.0 * cfg.diffusion_coeff * dt).astype(m.dtype),
            1.0 if cfg.use_advection else 0.0,
            1.0 if (cfg.use_brownian and (xi is not None or iscal is not None))
            else 0.0,
        ],
        m.dtype,
    )
    vm = pltpu.VMEM
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape_a = (
        jax.ShapeDtypeStruct((HEAD_W, n), m.dtype),
        jax.ShapeDtypeStruct((S_W, n), m.dtype),
    )
    out_specs_a = (
        pl.BlockSpec((HEAD_W, BN_B), lambda i: (0, i), memory_space=vm),
        pl.BlockSpec((S_W, BN_B), lambda i: (0, i), memory_space=vm),
    )
    ly = layout_for(cfg)
    if iscal is not None:
        head, s = pl.pallas_call(
            partial(_kernel_a_mh_k, ly=ly),
            out_shape=out_shape_a,
            grid=(pl.cdiv(n, BN_B),),
            in_specs=[
                smem,
                smem,
                pl.BlockSpec((W, BN_B), lambda i: (0, i), memory_space=vm),
            ],
            out_specs=out_specs_a,
        )(scal, iscal, mT)
    else:
        xiT = xi.T if xi is not None else jnp.zeros((3, n), m.dtype)
        head, s = pl.pallas_call(
            partial(_kernel_a_mh, ly=ly),
            out_shape=out_shape_a,
            grid=(pl.cdiv(n, BN_B),),
            in_specs=[
                smem,
                pl.BlockSpec((W, BN_B), lambda i: (0, i), memory_space=vm),
                pl.BlockSpec((3, BN_B), lambda i: (0, i), memory_space=vm),
            ],
            out_specs=out_specs_a,
        )(scal, mT, xiT)
    for _h in range(n_hops - 1):
        rows_g = jax.lax.optimization_barrier(
            tab[jax.lax.optimization_barrier(s[S_IDX, :].astype(jnp.int32))]
        )
        s = pl.pallas_call(
            partial(_kernel_h, ly=ly),
            out_shape=jax.ShapeDtypeStruct((S_W, n), m.dtype),
            grid=(pl.cdiv(n, BN_B),),
            in_specs=[
                pl.BlockSpec((S_W, BN_B), lambda i: (0, i), memory_space=vm),
                pl.BlockSpec(
                    (ly.row_w, BN_B), lambda i: (0, i),
                    memory_space=vm,
                ),
                pl.BlockSpec((HEAD_W, BN_B), lambda i: (0, i), memory_space=vm),
            ],
            out_specs=pl.BlockSpec(
                (S_W, BN_B), lambda i: (0, i), memory_space=vm
            ),
        )(s, rows_g.T, head)
    rows_g = jax.lax.optimization_barrier(
            tab[jax.lax.optimization_barrier(s[S_IDX, :].astype(jnp.int32))]
        )
    scal_b = jnp.asarray(
        [1.0 if (cfg.reflect_wall and getattr(cfg, "inline_bounce", True))
         else 0.0,
         1.0 if getattr(cfg, "escape_faces", False) else 0.0],
        m.dtype,
    )
    mT_new, pendT = pl.pallas_call(
        partial(_kernel_b2, ly=ly),
        out_shape=(
            jax.ShapeDtypeStruct((W, n), m.dtype),
            jax.ShapeDtypeStruct((8, n), m.dtype),
        ),
        grid=(pl.cdiv(n, BN_B),),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((S_W, BN_B), lambda i: (0, i), memory_space=vm),
            pl.BlockSpec(
                (ly.row_w, BN_B), lambda i: (0, i), memory_space=vm
            ),
            pl.BlockSpec((HEAD_W, BN_B), lambda i: (0, i), memory_space=vm),
        ],
        out_specs=(
            pl.BlockSpec((W, BN_B), lambda i: (0, i), memory_space=vm),
            pl.BlockSpec((8, BN_B), lambda i: (0, i), memory_space=vm),
        ),
    )(scal_b, s, rows_g.T, head)
    return mT_new.T, pendT[0, :] > 0.5


def pre_rare_cycle(mesh, tab, m, rng_key, step, cfg, dt, noise=None,
                   lane_offset=0):
    """The pallas replacement for fused.py's stream + inline-hop section:
    returns (m', pending) ready for the (unchanged) XLA rare stage."""
    n = m.shape[0]
    xi = None
    iscal = None
    if _use_inkernel_noise(cfg):
        iscal = _noise_iscal(rng_key, step, lane_offset)
    elif cfg.use_brownian:
        xi = noise if noise is not None else _brownian_noise(
            rng_key, step, n, m.dtype, cfg, lane_offset=lane_offset
        )
    head = stream_pre_hop(m, xi, cfg, dt, iscal=iscal)
    # barrier: keep the index vector a materialized dense array — fusing
    # the {0,1}-layout head-row read into the gather serializes the index
    # stream at large n (measured 3x gather slowdown at 10M lanes)
    idx = jax.lax.optimization_barrier(head[HIDX, :].astype(jnp.int32))
    rows_g = jax.lax.optimization_barrier(tab[idx])   # the per-index wall
    return stream_post_hop(m, rows_g, head, cfg)


# ---------------------------------------------------------------------------
# macro-cycle fusion (cfg.macro_cycles = k > 1): k Lagrangian sub-steps per
# mega round-trip.  The per-cycle engine pays one full-batch row gather
# (~8 ms at 1M lanes — the per-index wall) EVERY sub-step even though only
# ~13% of lanes cross a face; within one tet the TetVelocity field is
# constant, so a lane's trajectory between crossings depends only on its
# cached row and the per-(lane, step) noise stream.  Kernel A_k advances
# every lane until its FIRST face crossing or k completed sub-steps (phase
# carried per lane), so the expensive resolution machinery runs once per
# CROSSING instead of once per sub-step:
#
#   trip 0:  A_k -> full-batch hop gather -> B_k -> rare arena
#   trip t:  A_k (resume resolved lanes) -> rank-2 compacted gather
#            (_compact_hop_rows; pending rates fall geometrically) -> B_k
#            -> rare arena
#
# k trips resolve every lane (each trip completes >= 1 sub-step per
# unfinished lane: the crossing that stopped it is resolved by B or the
# arena the same trip).  Per-lane phase rides pend row 1 between kernels.
# Bit-parity with k per-cycle cycles holds exactly: the same FMA-free
# expressions run per sub-step, noise is re-seeded per sub-step with the
# per-cycle mixes (:func:`_noise_iscal_k`), and resolution reuses the
# per-cycle kernels' code paths verbatim.
# ---------------------------------------------------------------------------

HPH = 12                     # head row: sub-steps fully completed (phase)


def _ak_compute(scal_ref, mrow, ph_in, k: int, xi_fn):
    """Multi-sub-step kernel A core: advance lanes from their phase until
    the first face crossing or phase k.  ``xi_fn(j)`` -> 3 noise rows for
    sub-step j.  Expressions mirror :func:`_a_compute` per sub-step
    exactly (masked with where, never arithmetic, to preserve bits)."""
    dt = scal_ref[0]
    sigma = scal_ref[1]
    use_adv = scal_ref[2] > 0.5
    use_brown = scal_ref[3] > 0.5

    tetf = mrow(TET)
    act = mrow(ACT) > 0.5
    alive = act & (tetf >= 0.0)
    alf = jnp.where(use_adv, alive.astype(jnp.float32), 0.0)
    adv_live = use_adv & alive
    balf = jnp.where(use_adv, alf, act.astype(jnp.float32))
    bmask = jnp.where(use_brown, balf, 0.0)
    actf = jnp.where(use_adv, alf, mrow(ACT))

    ux = mrow(ROW + 12)
    uy = mrow(ROW + 13)
    uz = mrow(ROW + 14)
    px, py, pz = mrow(P0), mrow(P0 + 1), mrow(P0 + 2)
    vx, vy, vz = mrow(V0), mrow(V0 + 1), mrow(V0 + 2)
    a0, a1, a2 = mrow(RA), mrow(RA + 1), mrow(RA + 2)
    t = tuple(mrow(RA + 3 + i) for i in range(9))
    rn = ROW + LAYOUT_TET.nbr
    nbr = tuple(mrow(rn + i) for i in range(4))

    ph = ph_in
    stopped = ph >= float(k)          # already-finished lanes
    mv = jnp.zeros(px.shape, bool)
    wall = jnp.zeros(px.shape, bool)
    slot = jnp.zeros(px.shape, jnp.int32)
    idxf = jnp.maximum(tetf, 0.0)

    for j in range(k):
        xi0, xi1, xi2 = xi_fn(j)
        execm = (~stopped) & (ph == float(j))
        dx = alf * ux * dt + bmask * sigma * xi0
        dy = alf * uy * dt + bmask * sigma * xi1
        dz = alf * uz * dt + bmask * sigma * xi2
        px = jnp.where(execm, px + dx, px)
        py = jnp.where(execm, py + dy, py)
        pz = jnp.where(execm, pz + dz, pz)
        vx = jnp.where(execm & adv_live, ux, vx)
        vy = jnp.where(execm & adv_live, uy, vy)
        vz = jnp.where(execm & adv_live, uz, vz)
        wa, wb, wc, wd = _bary_rows(a0, a1, a2, t, px, py, pz)
        s0, wmin = _argmin4(wa, wb, wc, wd)
        need = execm & (wmin < 0.0) & (tetf >= 0.0)
        code = _pick4(nbr[0], nbr[1], nbr[2], nbr[3], s0)
        new_mv = need & (code >= 0.0)
        mv = mv | new_mv
        wall = wall | (need & (code < 0.0))
        slot = jnp.where(need, s0, slot)
        idxf = jnp.where(new_mv, code, idxf)
        stopped = stopped | need
        ph = jnp.where(execm & ~need, float(j + 1), ph)

    out = [None] * HEAD_W
    out[HPX], out[HPY], out[HPZ] = px, py, pz
    out[HVX], out[HVY], out[HVZ] = vx, vy, vz
    out[HACT] = actf
    out[HIDX] = idxf
    out[HMV] = mv.astype(jnp.float32)
    out[HWALL] = wall.astype(jnp.float32)
    out[HSLOT] = slot.astype(jnp.float32)
    out[HTET] = tetf
    out[HPH] = ph
    for r in range(HPH + 1, HEAD_W):
        out[r] = jnp.zeros_like(px)
    return out


def _kernel_ak_packed_k(scal_ref, iscal_ref, m_ref, ph_ref, out_ref,
                        xi_out_ref):
    """Macro kernel A, packed carry, in-kernel hardware-PRNG noise
    (re-seeded per sub-step from iscal slot j; lane offset in the last
    slot).  Writes the drawn noise planes ([3k, bn]) so later trips read
    them instead of re-drawing (the Box-Muller transcendentals cost
    ~0.5 ms per full sweep at 1M lanes; the planes are a 48 MB
    streaming read)."""
    k = iscal_ref.shape[0] - 1
    mb = _unpack_grouped(m_ref, LAYOUT_TET.width)
    bn = m_ref.shape[0] * 4

    def xi_fn(j):
        xi = _inkernel_noise(iscal_ref, bn, j=j, off_slot=k)
        xi_out_ref[3 * j, :] = xi[0]
        xi_out_ref[3 * j + 1, :] = xi[1]
        xi_out_ref[3 * j + 2, :] = xi[2]
        return xi[0], xi[1], xi[2]

    out = _ak_compute(scal_ref, lambda r: mb[r], ph_ref[1, :], k, xi_fn)
    for r in range(HEAD_W):
        out_ref[r, :] = out[r]


def _kernel_ak_packed(scal_ref, m_ref, ph_ref, xi_ref, out_ref):
    """Macro kernel A, packed carry, XLA-side noise rows ([3k, bn]
    grouped; sub-step j at rows 3j..3j+2)."""
    k = xi_ref.shape[0] // 3
    mb = _unpack_grouped(m_ref, LAYOUT_TET.width)

    def xi_fn(j):
        return xi_ref[3 * j, :], xi_ref[3 * j + 1, :], xi_ref[3 * j + 2, :]

    out = _ak_compute(scal_ref, lambda r: mb[r], ph_ref[1, :], k, xi_fn)
    for r in range(HEAD_W):
        out_ref[r, :] = out[r]


def _phase_rows(head_ref, pend, pend_ref):
    """Shared macro kernel-B tail: pend row 0 + advanced phase row 1."""
    pend_ref[0, :] = pend.astype(jnp.float32)
    stopped = (head_ref[HMV, :] > 0.5) | (head_ref[HWALL, :] > 0.5)
    ph = head_ref[HPH, :]
    pend_ref[1, :] = jnp.where(stopped, ph + 1.0, ph)
    for r in range(2, 8):
        pend_ref[r, :] = jnp.zeros_like(ph)


def _kernel_bk_packed(scal_ref, rows_ref, head_ref, out_ref, pend_ref):
    """Macro kernel B, full-batch rows (trip 0): _b_compute + phase."""
    mrows, pend = _b_compute(scal_ref, rows_ref, head_ref)
    out_ref[:] = _pack_grouped(mrows)
    _phase_rows(head_ref, pend, pend_ref)


def _kernel_bk_packed_c(scal_ref, m_ref, rows4_ref, head_ref, out_ref,
                        pend_ref):
    """Macro kernel B, rank-2 compacted rows (trips >= 1): _b_compute_c +
    phase."""
    mb = _unpack_grouped(m_ref, LAYOUT_TET.width)
    rg = _unpack_grouped(rows4_ref, LAYOUT_TET.width)
    mrows, pend = _b_compute_c(scal_ref, mb, rg, head_ref)
    out_ref[:] = _pack_grouped(mrows)
    _phase_rows(head_ref, pend, pend_ref)


def macro_supported(mesh, cfg, k: int) -> bool:
    """Envelope for the macro-cycle path: the packed envelope plus
    2 <= k <= 8 (phases ride f32 rows; trips are unrolled).  TetVelocity
    only — the macro kernel advances lanes multiple sub-steps from the
    cached row, which relies on the velocity being constant within a tet
    (Pk's vertex blend varies with position)."""
    from .advect import TET_VELOCITY

    if not (2 <= int(k) <= 8):
        return False
    if cfg.velocity_interp != TET_VELOCITY:
        return False
    return packed_supported(mesh, cfg, 1)


def macro_trip(mesh, tab, m_rm, head, cfg, frac):
    """One resolution trip: hop gather (full-batch when ``frac`` is None,
    rank-2 compacted otherwise) + macro kernel B.  Returns
    (m_rm', pend8) — pend8 row 0 = rare-arena pending (grouped), row 1 =
    advanced per-lane phase."""
    n4, W4 = m_rm.shape
    n = n4 * 4
    vm = pltpu.VMEM
    scal_b = jnp.asarray(
        [1.0 if (cfg.reflect_wall and getattr(cfg, "inline_bounce", True))
         else 0.0,
         1.0 if getattr(cfg, "escape_faces", False) else 0.0],
        m_rm.dtype,
    )
    if frac is None:
        rows_g = jax.lax.optimization_barrier(
            tab[jax.lax.optimization_barrier(head[HIDX, :].astype(jnp.int32))]
        )
        return pl.pallas_call(
            _kernel_bk_packed,
            out_shape=(
                jax.ShapeDtypeStruct((n4, W4), m_rm.dtype),
                jax.ShapeDtypeStruct((8, n), m_rm.dtype),
            ),
            grid=(pl.cdiv(n, BN_B),),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(
                    (LAYOUT_TET.row_w, BN_B), lambda i: (0, i),
                    memory_space=vm,
                ),
                pl.BlockSpec((HEAD_W, BN_B), lambda i: (0, i),
                             memory_space=vm),
            ],
            out_specs=(
                pl.BlockSpec((BN_B // 4, W4), lambda i: (i, 0),
                             memory_space=vm),
                pl.BlockSpec((8, BN_B), lambda i: (0, i), memory_space=vm),
            ),
        )(scal_b, rows_g.T, head)
    rows4 = _compact_hop_rows(tab, head, n, frac)
    return pl.pallas_call(
        _kernel_bk_packed_c,
        out_shape=(
            jax.ShapeDtypeStruct((n4, W4), m_rm.dtype),
            jax.ShapeDtypeStruct((8, n), m_rm.dtype),
        ),
        input_output_aliases={1: 0},     # in-place mega (see kernel B)
        grid=(pl.cdiv(n, BN_B),),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((BN_B // 4, W4), lambda i: (i, 0), memory_space=vm),
            pl.BlockSpec(
                (BN_B // 4, 4 * LAYOUT_TET.width), lambda i: (i, 0),
                memory_space=vm,
            ),
            pl.BlockSpec((HEAD_W, BN_B), lambda i: (0, i), memory_space=vm),
        ],
        out_specs=(
            pl.BlockSpec((BN_B // 4, W4), lambda i: (i, 0), memory_space=vm),
            pl.BlockSpec((8, BN_B), lambda i: (0, i), memory_space=vm),
        ),
    )(scal_b, m_rm, rows4, head)


def macro_ak(mesh, m_rm, ph8, cfg, dt, k, iscal=None, xiT=None):
    """Macro kernel A dispatch.  Trip 0 of the in-kernel-noise mode draws
    the noise AND writes the [3k, n] planes; every other invocation reads
    planes (``xiT``).  Returns (head, xiT)."""
    n4, W4 = m_rm.shape
    n = n4 * 4
    vm = pltpu.VMEM
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    scal = jnp.asarray(
        [
            dt,
            jnp.sqrt(2.0 * cfg.diffusion_coeff * dt).astype(m_rm.dtype),
            1.0 if cfg.use_advection else 0.0,
            1.0 if (cfg.use_brownian and (xiT is not None or iscal is not None))
            else 0.0,
        ],
        m_rm.dtype,
    )
    head_spec = pl.BlockSpec((HEAD_W, BN_B), lambda i: (0, i), memory_space=vm)
    head_shape = jax.ShapeDtypeStruct((HEAD_W, n), m_rm.dtype)
    if iscal is not None:
        head, xiT = pl.pallas_call(
            _kernel_ak_packed_k,
            out_shape=(
                head_shape,
                jax.ShapeDtypeStruct((3 * k, n), m_rm.dtype),
            ),
            grid=(pl.cdiv(n, BN_B),),
            in_specs=[
                smem,
                smem,
                pl.BlockSpec((BN_B // 4, W4), lambda i: (i, 0),
                             memory_space=vm),
                pl.BlockSpec((8, BN_B), lambda i: (0, i), memory_space=vm),
            ],
            out_specs=(
                head_spec,
                pl.BlockSpec((3 * k, BN_B), lambda i: (0, i),
                             memory_space=vm),
            ),
        )(scal, iscal, m_rm, ph8)
        return head, xiT
    head = pl.pallas_call(
        _kernel_ak_packed,
        out_shape=head_shape,
        grid=(pl.cdiv(n, BN_B),),
        in_specs=[
            smem,
            pl.BlockSpec((BN_B // 4, W4), lambda i: (i, 0), memory_space=vm),
            pl.BlockSpec((8, BN_B), lambda i: (0, i), memory_space=vm),
            pl.BlockSpec(
                (xiT.shape[0], BN_B), lambda i: (0, i), memory_space=vm
            ),
        ],
        out_specs=head_spec,
    )(scal, m_rm, ph8, xiT)
    return head, xiT


def macro_cycle_packed(mesh, tab, m_rm, rng_key, step0, cfg, dt, k: int,
                       rare_stage, noise=None, lane_offset=0):
    """k sub-steps on the packed carry (see the section comment).

    ``rare_stage(m_rm, pending, cfg) -> m_rm`` is fused._rare_stage_packed
    bound to this chunk's geometry (passed in to avoid a circular
    import); the cfg argument lets trips size the arena independently —
    trip 0 resolves ~1-(1-c)^k of all lanes' first crossing, so its
    pending spike wants a much larger (static-shaped) round buffer than
    the later trips' tails.  ``noise``: optional pre-drawn [3k, n]
    natural-order noise rows (sub-step j at rows 3j..3j+2) for the
    XLA-noise modes."""
    import dataclasses as _dc

    n4, W4 = m_rm.shape
    n = n4 * 4
    iscal = None
    xiT = None
    if _use_inkernel_noise(cfg):
        iscal = _noise_iscal_k(rng_key, step0, lane_offset, k)
    else:
        if cfg.use_brownian:
            if noise is None:
                from .fused import _brownian_noise as _bn

                noise = jnp.concatenate(
                    [
                        _bn(rng_key, step0 + j, n, m_rm.dtype, cfg).T
                        for j in range(k)
                    ],
                    axis=0,
                )
            xiT = to_grouped(noise)
        else:
            xiT = to_grouped(jnp.zeros((3 * k, n), m_rm.dtype))
    # trip-0 gather is full-batch: ~1-(1-c)^k of lanes stop in trip 0, so
    # group compaction saves little there and rank-2 overflow would flood
    # the arena; later trips' pending rates fall geometrically
    frac0 = float(getattr(cfg, "hop_compact_frac", 0.5))
    fracs = [None] + [
        min(max(frac0 / (2 ** (t - 1)), 0.05), 1.0) for t in range(1, k)
    ]
    # arena sizing per trip: trip 0 carries ~k cycles' worth of pend
    wf = float(cfg.walk_capacity_frac)
    wfracs = [min(wf * k, 0.5)] + [wf] * (k - 1)
    ph8 = jnp.zeros((8, n), m_rm.dtype)
    for trip in range(k):
        head, xiT = macro_ak(mesh, m_rm, ph8, cfg, dt, k,
                             iscal=iscal if trip == 0 else None, xiT=xiT)
        m_rm, pend8 = macro_trip(mesh, tab, m_rm, head, cfg, fracs[trip])
        pending = from_grouped(pend8[0, :] > 0.5)
        ph8 = pend8
        m_rm = rare_stage(
            m_rm, pending,
            _dc.replace(cfg, walk_capacity_frac=wfracs[trip]),
        )
    return m_rm


# ---------------------------------------------------------------------------
# ConvexPoly engine streams (ops/fused_convex.py, the reference's default
# build mode) — packed-carry design mirroring the bary engine: the mega
# rides the sub-cycling loop as its row-major [n/4, 128] bytes, kernel CA
# (advect + noise + segment + hop-0 exit test) and a LEAN kernel CB
# (hop-1 exit test in the neighbor + assembly; no old-mega read — the
# masked gather self-fetches every live lane's own row) bracket the one
# cx-row gather.  Arithmetic mirrors fused_convex._cycle_aligned
# expression-for-expression (seg = (p0+d) - p0, march p1 = p0 + dT*seg,
# remaining = p_end - p1) for cross-engine bit-parity on TPU.
# Row layout: cx table [nt, 24] (inward plane normals 0:12, offsets
# 12:16, neighbor codes 16:20, per-tet velocity 20:23).
# ---------------------------------------------------------------------------

CX_ROW_W = 24
CX_W = 32                    # convex mega width (fused_convex.WIDTH)

# convex head rows (kernel CA output; 16 = HEAD_W)
(CP0X, CP0Y, CP0Z, CVX, CVY, CVZ, CACT, CIDX, CINT, CCRS, CDT0, CSLT,
 CDX, CDY, CDZ, CTET) = range(16)


def _cx_exit_test(row, base, px, py, pz, sx, sy, sz, suppress, tol):
    """``traceIntet`` exit classification on row-sliced plane tables
    (convex._exit_face_tables semantics: admitted face of minimal dT,
    scan order, strict '<'; slot -1 = segment ends inside).

    ``row(k)``: lane-vector getter; ``base``: offset of the 4x3 inward
    normals (offsets at base+12); ``suppress``: tuple of 4 bool vectors."""
    best_dt = jnp.full(px.shape, 1.1, px.dtype)
    best_slot = jnp.full(px.shape, -1, jnp.int32)
    for i in range(4):
        n0 = row(base + 3 * i)
        n1 = row(base + 3 * i + 1)
        n2 = row(base + 3 * i + 2)
        d = row(base + 12 + i)
        face_dist = n0 * px + n1 * py + n2 * pz - d
        denom = -(n0 * sx + n1 * sy + n2 * sz)
        dt_ = face_dist / denom
        dt_ = jnp.where(jnp.isinf(dt_), -1.0, dt_)
        ok = (face_dist < tol) & (dt_ > tol) & (dt_ <= 1.0) & ~suppress[i]
        dtm = jnp.where(ok, dt_, 1.1)
        upd = dtm < best_dt
        best_dt = jnp.where(upd, dtm, best_dt)
        best_slot = jnp.where(upd, jnp.int32(i), best_slot)
    return best_dt, best_slot


def _ca_compute(scal_ref, mrow, xi):
    """convex kernel CA: advect + noise + segment + hop-0 exit test +
    neighbor select on lane vectors; returns the 16 head rows.
    Mirrors fused_convex._cycle_aligned's stream section bit-for-bit
    (seg is computed as (p0 + d) - p0, exactly like the jnp engine)."""
    dt = scal_ref[0]
    sigma = scal_ref[1]
    use_adv = scal_ref[2] > 0.5
    use_brown = scal_ref[3] > 0.5
    tol = scal_ref[4]

    tetf = mrow(TET)
    act = mrow(ACT) > 0.5
    alive = act & (tetf >= 0.0)
    alf = jnp.where(use_adv, alive.astype(jnp.float32), 0.0)

    RU = ROW + 20
    ux = mrow(RU)
    uy = mrow(RU + 1)
    uz = mrow(RU + 2)
    dx = alf * ux * dt
    dy = alf * uy * dt
    dz = alf * uz * dt
    adv_live = use_adv & alive
    vx = jnp.where(adv_live, ux, mrow(V0))
    vy = jnp.where(adv_live, uy, mrow(V0 + 1))
    vz = jnp.where(adv_live, uz, mrow(V0 + 2))
    balf = jnp.where(use_adv, alf, act.astype(jnp.float32))
    bmask = jnp.where(use_brown, balf, 0.0)
    dx = dx + bmask * sigma * xi[0, :]
    dy = dy + bmask * sigma * xi[1, :]
    dz = dz + bmask * sigma * xi[2, :]
    actf = jnp.where(use_adv, alf, mrow(ACT))

    p0x, p0y, p0z = mrow(P0), mrow(P0 + 1), mrow(P0 + 2)
    ex = p0x + dx
    ey = p0y + dy
    ez = p0z + dz
    # the jnp engine's seg = p_end - p0 (NOT d itself — ulps differ)
    sx = ex - p0x
    sy = ey - p0y
    sz = ez - p0z

    no_sup = jnp.zeros(p0x.shape, bool)
    dt0, slot0 = _cx_exit_test(
        lambda k: mrow(ROW + k), 0, p0x, p0y, p0z, sx, sy, sz,
        (no_sup, no_sup, no_sup, no_sup), tol,
    )
    # leak guard (mirrors fused_convex._cycle_aligned): a start point
    # outside its cached tet (tolerance dust) rides the rare stage
    fd_max = jnp.full(p0x.shape, -jnp.inf, p0x.dtype)
    for i in range(4):
        fd = (mrow(ROW + 3 * i) * p0x + mrow(ROW + 3 * i + 1) * p0y
              + mrow(ROW + 3 * i + 2) * p0z - mrow(ROW + 12 + i))
        fd_max = jnp.maximum(fd_max, fd)
    outside0 = alive & (fd_max > tol)
    crossing = alive & ((slot0 >= 0) | outside0)
    CX_RB = ROW + 16
    nxt0 = _pick4(
        mrow(CX_RB), mrow(CX_RB + 1), mrow(CX_RB + 2), mrow(CX_RB + 3),
        slot0,
    )
    interior = crossing & (nxt0 >= 0.0) & (slot0 >= 0)
    idx = jnp.where(interior, nxt0, jnp.maximum(tetf, 0.0))

    out = [None] * HEAD_W
    out[CP0X], out[CP0Y], out[CP0Z] = p0x, p0y, p0z
    out[CVX], out[CVY], out[CVZ] = vx, vy, vz
    out[CACT] = actf
    out[CIDX] = idx
    out[CINT] = interior.astype(jnp.float32)
    out[CCRS] = crossing.astype(jnp.float32)
    out[CDT0] = dt0
    out[CSLT] = slot0.astype(jnp.float32)
    out[CDX], out[CDY], out[CDZ] = dx, dy, dz
    out[CTET] = tetf
    return out


def _kernel_ca_packed(scal_ref, m_ref, xi_ref, out_ref):
    mb = _unpack_grouped(m_ref, CX_W)
    out = _ca_compute(scal_ref, lambda r: mb[r], xi_ref)
    for r in range(HEAD_W):
        out_ref[r, :] = out[r]


def _kernel_ca_packed_k(scal_ref, iscal_ref, m_ref, out_ref):
    mb = _unpack_grouped(m_ref, CX_W)
    xi = _inkernel_noise(iscal_ref, m_ref.shape[0] * 4)
    out = _ca_compute(scal_ref, lambda r: mb[r], xi)
    for r in range(HEAD_W):
        out_ref[r, :] = out[r]


def _kernel_cb_packed(scal_ref, rows_ref, head_ref, out_ref, pend_ref,
                      disp_ref):
    """Lean convex kernel CB: hop-1 exit test in the (self-)gathered
    neighbor rows + packed assembly.  No old-mega read — the masked
    gather used each live lane's own tet as the fill index, so rows_ref
    IS the current row cache for every lane with tet >= 0 (dead lanes'
    caches are semantically unused, as in the bary engine)."""
    tol = scal_ref[0]

    interior = head_ref[CINT, :] > 0.5
    crossing = head_ref[CCRS, :] > 0.5
    dt0 = head_ref[CDT0, :]
    dx = head_ref[CDX, :]
    dy = head_ref[CDY, :]
    dz = head_ref[CDZ, :]
    tetf = head_ref[CTET, :]
    p0x = head_ref[CP0X, :]
    p0y = head_ref[CP0Y, :]
    p0z = head_ref[CP0Z, :]
    # bitwise identical to kernel CA's values (same ops, same inputs)
    ex = p0x + dx
    ey = p0y + dy
    ez = p0z + dz
    sx = ex - p0x
    sy = ey - p0y
    sz = ez - p0z

    # march point p1 = p0 + dT*seg; remaining segment = p_end - p1
    p1x = p0x + dt0 * sx
    p1y = p0y + dt0 * sy
    p1z = p0z + dt0 * sz
    rx = ex - p1x
    ry = ey - p1y
    rz = ez - p1z

    rows = [rows_ref[k, :] for k in range(CX_ROW_W)]
    sup = tuple(rows[16 + i] == tetf for i in range(4))
    dt1, slot1 = _cx_exit_test(
        lambda k: rows[k], 0, p1x, p1y, p1z, rx, ry, rz, sup, tol,
    )
    res2 = interior & (slot1 < 0)

    pending = crossing & ~res2
    fin = ~pending

    mrows = [None] * CX_W
    mrows[P0] = jnp.where(fin, ex, p0x)
    mrows[P0 + 1] = jnp.where(fin, ey, p0y)
    mrows[P0 + 2] = jnp.where(fin, ez, p0z)
    mrows[V0] = head_ref[CVX, :]
    mrows[V0 + 1] = head_ref[CVY, :]
    mrows[V0 + 2] = head_ref[CVZ, :]
    mrows[TET] = jnp.where(res2, head_ref[CIDX, :], tetf)
    mrows[ACT] = head_ref[CACT, :]
    for k in range(CX_ROW_W):
        mrows[ROW + k] = rows[k]
    for k in range(ROW + CX_ROW_W, CX_W):
        mrows[k] = jnp.zeros_like(ex)
    out_ref[:] = _pack_grouped(mrows)
    pend_ref[0, :] = pending.astype(jnp.float32)
    for r in range(1, 8):
        pend_ref[r, :] = jnp.zeros_like(ex)
    # disp leaves PACKED [bn4, 16] (lane l at row l//4, col 4*(l%4)+c):
    # materializing an [n,3] array on the XLA side costs ~28 ms/cycle at
    # 1M (T(4,128)-layout transpose emitter; round-1 cost model) — the
    # packed rare stage consumes this form with row-major reshapes only
    disp_ref[:] = _pack_grouped([dx, dy, dz, jnp.zeros_like(dx)])


def _kernel_cb_packed_c(scal_ref, m_ref, rows4_ref, head_ref, out_ref,
                        pend_ref, disp_ref):
    """:_kernel_cb_packed: for the block-compacted hop gather: reads the
    OLD packed mega block (row source for lanes the compaction skipped)
    plus the [bn4, 128] scattered row-group buffer (natural lane 4i+q's
    neighbor row at packed row i, cols 32q..32q+23, valid flag at
    32q+24).  Interior crossers whose group the capacity (or per-group
    rank) skipped stay pending with their pre-hop tet/row — the rare
    tracer marches them to the same endpoint.  Dead-lane raw-byte caveat
    as in :func:`_b_compute_c` (stale cached rows; simulation state is
    bit-identical)."""
    tol = scal_ref[0]

    mb = _unpack_grouped(m_ref, CX_W)
    rg = _unpack_grouped(rows4_ref, CX_W)

    interior = head_ref[CINT, :] > 0.5
    crossing = head_ref[CCRS, :] > 0.5
    dt0 = head_ref[CDT0, :]
    dx = head_ref[CDX, :]
    dy = head_ref[CDY, :]
    dz = head_ref[CDZ, :]
    tetf = head_ref[CTET, :]
    p0x = head_ref[CP0X, :]
    p0y = head_ref[CP0Y, :]
    p0z = head_ref[CP0Z, :]
    ex = p0x + dx
    ey = p0y + dy
    ez = p0z + dz
    sx = ex - p0x
    sy = ey - p0y
    sz = ez - p0z

    p1x = p0x + dt0 * sx
    p1y = p0y + dt0 * sy
    p1z = p0z + dt0 * sz
    rx = ex - p1x
    ry = ey - p1y
    rz = ez - p1z

    gfl = rg[CX_ROW_W] > 0.5
    int_eff = interior & gfl
    rows = [
        jnp.where(int_eff, rg[k], mb[ROW + k]) for k in range(CX_ROW_W)
    ]
    sup = tuple(rows[16 + i] == tetf for i in range(4))
    dt1, slot1 = _cx_exit_test(
        lambda k: rows[k], 0, p1x, p1y, p1z, rx, ry, rz, sup, tol,
    )
    res2 = int_eff & (slot1 < 0)

    pending = crossing & ~res2
    fin = ~pending

    mrows = [None] * CX_W
    mrows[P0] = jnp.where(fin, ex, p0x)
    mrows[P0 + 1] = jnp.where(fin, ey, p0y)
    mrows[P0 + 2] = jnp.where(fin, ez, p0z)
    mrows[V0] = head_ref[CVX, :]
    mrows[V0 + 1] = head_ref[CVY, :]
    mrows[V0 + 2] = head_ref[CVZ, :]
    mrows[TET] = jnp.where(res2, head_ref[CIDX, :], tetf)
    mrows[ACT] = head_ref[CACT, :]
    for k in range(CX_ROW_W):
        mrows[ROW + k] = rows[k]
    for k in range(ROW + CX_ROW_W, CX_W):
        mrows[k] = jnp.zeros_like(ex)
    out_ref[:] = _pack_grouped(mrows)
    pend_ref[0, :] = pending.astype(jnp.float32)
    for r in range(1, 8):
        pend_ref[r, :] = jnp.zeros_like(ex)
    disp_ref[:] = _pack_grouped([dx, dy, dz, jnp.zeros_like(dx)])


def convex_packed_supported(mesh, cfg, n_hops: int) -> bool:
    """Envelope for the packed convex streams: TPU, f32, >=1 inline hop
    (escape faces are fine — wall exits are pending lanes either way).

    UNCHUNKED (cycle_chunks=1) at ~1M lanes this program runs the stream
    gather ~3.5x slower than the jnp convex engine (28 vs 8 ms/cycle —
    total 38 vs 25.5 ms).  HLO-confirmed cause: XLA's memory-space
    assignment places the 96.7 MB gather OUTPUT in S(1) alternate memory
    instead of the 95.8 MB cx TABLE (both cannot fit the ~128 MB VMEM
    budget; the bary program's 80 MB pair fits the table and wins).
    Chunking the cycle into ~500k-1M-lane sub-batches (each riding one
    lax.scan body) restores the table's S(1) placement — measured at 1M:
    k=2 (500k chunks) 18.5 ms vs k=1 38.3; at 2M: k=2 (1M chunks) 36.4.
    Smaller chunks LOSE it again (1M k=3/333k: 39.0, k=4/250k: 40.9 —
    HLO-verified, the table reverts to plain HBM), so the auto policy
    (stepper + suggest_tuning) engages this path only at >=1M lanes with
    chunks = max(2, ceil(n/1M))."""
    if getattr(cfg, "engine_impl", "auto") not in (
        "auto", "pallas", "pallas_packed"
    ):
        return False
    if n_hops < 1:
        return False
    if mesh.points.dtype != jnp.float32:
        return False
    try:
        dd = jax.config.jax_default_device
        plat = dd.platform if dd is not None else jax.default_backend()
        return plat not in ("cpu",)
    except Exception:
        return False


def convex_pre_rare_cycle_packed(mesh, tab, m_rm, rng_key, step, cfg, dt,
                                 noise=None, lane_offset=0):
    """Packed convex stream section: returns (m_rm', disp, pending) for
    the packed convex rare stage.  ``disp`` is rebuilt [n, 3] natural
    from the head rows (the rare tracer marches pos -> pos + disp)."""
    from .convex import TOL

    n4, W4 = m_rm.shape
    n = n4 * 4
    xi = None
    iscal = None
    if _use_inkernel_noise(cfg):
        iscal = _noise_iscal(rng_key, step, lane_offset)
        xiT = None
    else:
        if cfg.use_brownian:
            xi = noise if noise is not None else _brownian_noise(
                rng_key, step, n, m_rm.dtype, cfg, lane_offset=lane_offset
            )
        xiT = to_grouped(
            xi.T if xi is not None else jnp.zeros((3, n), m_rm.dtype)
        )
    scal = jnp.asarray(
        [
            dt,
            # EXACTLY fused_convex's sigma expression (python-f64 product,
            # one rounding)
            jnp.sqrt(2.0 * cfg.diffusion_coeff * dt).astype(m_rm.dtype),
            1.0 if cfg.use_advection else 0.0,
            1.0 if (cfg.use_brownian and (xi is not None or iscal is not None))
            else 0.0,
            TOL,
        ],
        m_rm.dtype,
    )
    vm = pltpu.VMEM
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    if iscal is not None:
        head = pl.pallas_call(
            _kernel_ca_packed_k,
            out_shape=jax.ShapeDtypeStruct((HEAD_W, n), m_rm.dtype),
            grid=(pl.cdiv(n, BN_B),),
            in_specs=[
                smem,
                smem,
                pl.BlockSpec((BN_B // 4, W4), lambda i: (i, 0),
                             memory_space=vm),
            ],
            out_specs=pl.BlockSpec(
                (HEAD_W, BN_B), lambda i: (0, i), memory_space=vm
            ),
        )(scal, iscal, m_rm)
    else:
        head = pl.pallas_call(
            _kernel_ca_packed,
            out_shape=jax.ShapeDtypeStruct((HEAD_W, n), m_rm.dtype),
            grid=(pl.cdiv(n, BN_B),),
            in_specs=[
                smem,
                pl.BlockSpec((BN_B // 4, W4), lambda i: (i, 0),
                             memory_space=vm),
                pl.BlockSpec((3, BN_B), lambda i: (0, i), memory_space=vm),
            ],
            out_specs=pl.BlockSpec(
                (HEAD_W, BN_B), lambda i: (0, i), memory_space=vm
            ),
        )(scal, m_rm, xiT)
    scal_b = jnp.asarray([TOL], m_rm.dtype)
    if getattr(cfg, "hop_compact", 0) == 4:
        # block-compacted hop gather (see pre_rare_cycle_packed): the
        # full-batch cx-row gather is the convex engine's per-INDEX wall
        # AND the trigger of the S(1) placement contest (the 96.7 MB
        # gather output evicts the 95.8 MB table) — two rows per
        # crosser-containing 4-lane group sidestep both
        rows4 = _compact_hop_rows(
            tab, head, n, float(getattr(cfg, "hop_compact_frac", 0.5)),
            idx_row=CIDX, mv_row=CINT, width=CX_W,
        )
        m_rm_new, pendT, disp_pk = pl.pallas_call(
            _kernel_cb_packed_c,
            out_shape=(
                jax.ShapeDtypeStruct((n4, W4), m_rm.dtype),
                jax.ShapeDtypeStruct((8, n), m_rm.dtype),
                jax.ShapeDtypeStruct((n4, 16), m_rm.dtype),
            ),
            input_output_aliases={1: 0},     # in-place mega (kernel B)
            grid=(pl.cdiv(n, BN_B),),
            in_specs=[
                smem,
                pl.BlockSpec((BN_B // 4, W4), lambda i: (i, 0),
                             memory_space=vm),
                pl.BlockSpec((BN_B // 4, 4 * CX_W), lambda i: (i, 0),
                             memory_space=vm),
                pl.BlockSpec((HEAD_W, BN_B), lambda i: (0, i),
                             memory_space=vm),
            ],
            out_specs=(
                pl.BlockSpec((BN_B // 4, W4), lambda i: (i, 0),
                             memory_space=vm),
                pl.BlockSpec((8, BN_B), lambda i: (0, i), memory_space=vm),
                pl.BlockSpec((BN_B // 4, 16), lambda i: (i, 0),
                             memory_space=vm),
            ),
        )(scal_b, m_rm, rows4, head)
        return m_rm_new, disp_pk, from_grouped(pendT[0, :] > 0.5)
    rows_g = jax.lax.optimization_barrier(
        tab[jax.lax.optimization_barrier(head[CIDX, :].astype(jnp.int32))]
    )
    m_rm_new, pendT, disp_pk = pl.pallas_call(
        _kernel_cb_packed,
        out_shape=(
            jax.ShapeDtypeStruct((n4, W4), m_rm.dtype),
            jax.ShapeDtypeStruct((8, n), m_rm.dtype),
            jax.ShapeDtypeStruct((n4, 16), m_rm.dtype),
        ),
        grid=(pl.cdiv(n, BN_B),),
        in_specs=[
            smem,
            pl.BlockSpec((CX_ROW_W, BN_B), lambda i: (0, i), memory_space=vm),
            pl.BlockSpec((HEAD_W, BN_B), lambda i: (0, i), memory_space=vm),
        ],
        out_specs=(
            pl.BlockSpec((BN_B // 4, W4), lambda i: (i, 0), memory_space=vm),
            pl.BlockSpec((8, BN_B), lambda i: (0, i), memory_space=vm),
            pl.BlockSpec((BN_B // 4, 16), lambda i: (i, 0), memory_space=vm),
        ),
    )(scal_b, rows_g.T, head)
    return m_rm_new, disp_pk, from_grouped(pendT[0, :] > 0.5)
