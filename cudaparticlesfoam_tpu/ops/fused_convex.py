"""Row-cached fused sub-step for the ConvexPoly locate mode.

The reference's DEFAULT build (``-DConvexPoly``,
``applications/*/Make/options:1-5``) traces displacement segments through
face planes (``query/ConvexQuery.cu``).  Phase-1 cached engine:

1. **Stream** the mega rows: advect velocity, Brownian, tentative end
   point, and a plane-based ``traceIntet`` EXIT test (``face_dist < tol``,
   ``tol < dT <= 1``, ``ConvexQuery.cu:77-101``) all come from the cached
   row — non-crossers (the common case at sane dt) touch no random memory
   and finish inline.
2. **Rare stage**: lanes whose segment exits their tet are block-compacted
   (the same two-stage 8-lane scheme as :mod:`.fused`) and resolved by the
   PROVEN simple-path sequence — :func:`..ops.convex.trace_segment` +
   :func:`..ops.convex.convex_reflect` (+ the barycentric safety net when
   configured) — inside the small buffer, then scattered back with
   refreshed row caches.  All reference semantics (inlet-face skip,
   -(startTet+1) wall codes, <=5 bounces) come from the tested tracer,
   not a re-implementation.

Mega-row layout (32 cols):
  0:3 pos (segment START inside the cycle; final pos after it) |
  3:6 vel | 6 tet (float int) | 7 active |
  8:32 cached tet_row_cx (inward plane normals 8:20, offsets 20:24,
  neighbor codes 24:28, per-tet velocity 28:31, pad 31)

Requires :func:`~cudaparticlesfoam_tpu.mesh.with_convex_rows` PLUS the
per-tet velocity appended (see :func:`cx_table`); f32 needs < 2^24 tets.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..mesh import TetMesh
from . import convex as convex_ops
from .fused import BLOCK, P0, V0, TET, ACT, ROW, _brownian_noise

WIDTH = 32
ROW_W = 24
RN = ROW                    # inward normals [4x3] at 8:20
RD = ROW + 12               # plane offsets at 20:24
RB = ROW + 16               # neighbor codes at 24:28
RU = ROW + 20               # tet velocity at 28:31


def cx_table(mesh: TetMesh):
    """[nt, 24] engine table: with_convex_rows' planes/offsets/neighbors
    with the per-tet velocity replacing the face-id block (the inline
    stage only needs an exit CLASSIFICATION; the rare stage re-traces with
    the full tables, where face ids live)."""
    if mesh.tet_row_cxe is not None:
        # precomputed mesh field: enters jit as a parameter (building the
        # table as an in-jit intermediate let XLA pick a column-major
        # layout with no parameter placement — 3.5x slower stream gather)
        return mesh.tet_row_cxe
    row = mesh.tet_row_cx
    return jnp.concatenate(
        [
            row[:, 0:16],                       # normals + offsets
            row[:, 16:20],                      # neighbor codes
            mesh.tet_vel.astype(row.dtype),
            jnp.zeros((mesh.n_tets, 1), row.dtype),
        ],
        axis=1,
    )


def pack_state(mesh: TetMesh, tab, pos, vel, tet_id, active):
    n = pos.shape[0]
    dt = pos.dtype
    m = jnp.zeros((n, WIDTH), dtype=dt)
    m = m.at[:, P0 : P0 + 3].set(pos)
    m = m.at[:, V0 : V0 + 3].set(vel)
    m = m.at[:, TET].set(tet_id.astype(dt))
    m = m.at[:, ACT].set(active.astype(dt))
    m = m.at[:, ROW : ROW + ROW_W].set(tab[jnp.maximum(tet_id, 0)])
    return m


def _row_tables(rows):
    """(normals[c,4,3], offsets[c,4], nbr[c,4]) views of [c,24] rows
    (same slicing as convex._tet_tables on tet_row_cx, minus face ids —
    the cached engine substitutes came-from-neighbor suppression)."""
    c = rows.shape[0]
    return (
        rows[:, 0:12].reshape(c, 4, 3),
        rows[:, 12:16],
        rows[:, 16:20].astype(jnp.int32),
    )


# inlet_nbr sentinel that can never equal a neighbor code (codes are
# >= -(n boundary faces) and < n_tets)
_NO_INLET = -(2 ** 30)


def mega_cycle(mesh: TetMesh, tab, m, rng_key, step, cfg, dt,
               lane_offset0=0):
    n = m.shape[0]
    if n % BLOCK:
        pad = BLOCK - n % BLOCK
        mp = jnp.pad(m, ((0, pad), (0, 0)))
        return _cycle_aligned(mesh, tab, mp, rng_key, step, cfg, dt,
                              lane_offset0)[:n]
    return _cycle_aligned(mesh, tab, m, rng_key, step, cfg, dt, lane_offset0)


def _cycle_aligned(mesh: TetMesh, tab, m, rng_key, step, cfg, dt,
                   lane_offset0=0):
    n = m.shape[0]
    nb = n // BLOCK

    tet = m[:, TET].astype(jnp.int32)
    act = m[:, ACT] > 0.5
    alive = (act & (tet >= 0)) if cfg.use_advection else act
    alf = alive.astype(m.dtype)

    ux, uy, uz = m[:, RU], m[:, RU + 1], m[:, RU + 2]
    if cfg.use_advection:
        dx, dy, dz = alf * ux * dt, alf * uy * dt, alf * uz * dt
        vx = jnp.where(alive, ux, m[:, V0])
        vy = jnp.where(alive, uy, m[:, V0 + 1])
        vz = jnp.where(alive, uz, m[:, V0 + 2])
    else:
        dx = dy = dz = jnp.zeros_like(ux)
        vx, vy, vz = m[:, V0], m[:, V0 + 1], m[:, V0 + 2]
    if cfg.use_brownian:
        sigma = jnp.sqrt(2.0 * cfg.diffusion_coeff * dt).astype(m.dtype)
        xi = _brownian_noise(rng_key, step, n, m.dtype, cfg,
                             lane_offset=lane_offset0)
        dx = dx + alf * sigma * xi[:, 0]
        dy = dy + alf * sigma * xi[:, 1]
        dz = dz + alf * sigma * xi[:, 2]
    actf = alf if cfg.use_advection else m[:, ACT]

    ex = m[:, P0] + dx
    ey = m[:, P0 + 1] + dy
    ez = m[:, P0 + 2] + dz
    p0 = m[:, P0 : P0 + 3]
    p_end = jnp.stack([ex, ey, ez], axis=1)
    seg = p_end - p0
    nrm0, dpl0, nbr0 = _row_tables(m[:, ROW : ROW + ROW_W])
    dt0, slot0 = convex_ops._exit_face_tables(
        nrm0, dpl0, nbr0, p0, seg, nbr0 == _NO_INLET
    )
    # leak guard: a lane whose START already sits outside its cached tet
    # (tolerance dust — the reference tracer cannot re-detect a face once
    # the point is a hair beyond it, ConvexQuery.cu:95, and an undetected
    # wall crossing would advect outward forever).  Inside points have
    # face_dist <= 0 for all four inward planes, so one max + compare
    # flags the dust; such lanes ride the rare stage, whose barycentric
    # safety net (cfg.convex_bary_fix) re-locates or reflects/escapes
    # them exactly like the simple engine's full-batch pass.
    # explicit per-component products (same association as the pallas
    # kernel's lane math — einsum's reduction order is not bit-stable)
    fd0 = (
        nrm0[:, :, 0] * p0[:, None, 0]
        + nrm0[:, :, 1] * p0[:, None, 1]
        + nrm0[:, :, 2] * p0[:, None, 2]
        - dpl0
    )
    outside0 = alive & (jnp.max(fd0, axis=-1) > convex_ops.TOL)
    crossing = alive & ((slot0 >= 0) | outside0)

    # --- inline hop-1 (phase 2): the dominant crosser case is a single
    # interior face crossing (``traceIntet`` hop into the neighbor, then
    # the remaining segment ends there).  Resolve it with ONE cx-row
    # gather: march point p1 = p0 + dT*seg, exit-test the remaining
    # segment in the neighbor's cached planes with the inlet face
    # suppressed by its came-from neighbor code (exactly equivalent to
    # the reference's face-id skip — two tets share one face,
    # ConvexQuery.cu:87).  Wall hits and multi-hop lanes keep their
    # ORIGINAL state and ride the exact rare stage.
    res2 = jnp.zeros_like(crossing)
    if max(int(getattr(cfg, "inline_hops", 1)), 0) >= 1:
        lane4 = slot0[:, None] == jnp.arange(4, dtype=jnp.int32)[None, :]
        nxt0 = jnp.sum(jnp.where(lane4, nbr0, 0), axis=1)
        # dust lanes (slot0 < 0) are never "interior": lane4 selects no
        # slot, so nxt0 defaults to 0 — gate on a real exit slot
        interior = crossing & (nxt0 >= 0) & (slot0 >= 0)
        idx = jnp.where(interior, nxt0, jnp.maximum(tet, 0))
        rows_g = tab[idx]                      # ONE [n,24] gather
        p1 = p0 + dt0[:, None] * seg           # march point (trace_segment:127)
        nrm1, dpl1, nbr1 = _row_tables(rows_g)
        dt1, slot1 = convex_ops._exit_face_tables(
            nrm1, dpl1, nbr1, p1, p_end - p1, nbr1 == tet[:, None]
        )
        res2 = interior & (slot1 < 0)          # segment ends in the neighbor

    # inline resolution: final pos = segment end; hop-1 lanes refresh
    # tet/row from the gather.  Unresolved crossers keep their START in
    # the pos columns (the rare trace marches pos -> pos + disp) and the
    # displacement rides a side array (the mega is full).
    pending = crossing & ~res2
    fin = ~pending
    if max(int(getattr(cfg, "inline_hops", 1)), 0) >= 1:
        tet_new = jnp.where(res2, nxt0, tet)
        row_new = jnp.where(res2[:, None], rows_g, m[:, ROW : ROW + ROW_W])
        # vel columns stay the OLD tet's advected velocity — the next
        # cycle's advect reads the refreshed row, matching the reference's
        # tetVel[tetID]-at-advect-time order (particles.cu:361)
    else:
        tet_new = tet
        row_new = m[:, ROW : ROW + ROW_W]
    m = jnp.concatenate(
        [
            jnp.where(fin, ex, m[:, P0])[:, None],
            jnp.where(fin, ey, m[:, P0 + 1])[:, None],
            jnp.where(fin, ez, m[:, P0 + 2])[:, None],
            vx[:, None], vy[:, None], vz[:, None],
            tet_new[:, None].astype(m.dtype), actf[:, None],
            row_new,
        ],
        axis=1,
    )
    disp = jnp.stack([dx, dy, dz], axis=1)
    return _rare_stage(mesh, tab, m, disp, pending, cfg, n, nb)


def _make_run_lanes(mesh: TetMesh, tab, cfg):
    """Arena lane resolver shared by the convex rare-stage variants."""

    def run_lanes(mc, dsub, lanes_act):
        """Resolve compacted lanes with the tested simple-path sequence
        (stepper.cycle's convex branch)."""
        pos = mc[:, P0 : P0 + 3]
        vel = mc[:, V0 : V0 + 3]
        tet_s = mc[:, TET].astype(jnp.int32)
        code, stop_tet, p_cross, hit_face = convex_ops.trace_segment(
            mesh, pos, dsub, tet_s, active=lanes_act, max_tets=cfg.max_hops
        )
        d2 = dsub
        if cfg.reflect_wall:
            pos, d2, vel, code = convex_ops.convex_reflect(
                mesh, pos, d2, vel, code, stop_tet, p_cross, hit_face
            )
            if cfg.convex_bary_fix:
                from . import locate as locate_ops

                p_land = pos + jnp.where(lanes_act[:, None], d2, 0.0)
                tet_chk, _ = locate_ops.walk(mesh, p_land, code)
                zero = jnp.zeros_like(d2)
                d_fix, vel, code = locate_ops.reflect_walls(
                    mesh, p_land, zero, vel, tet_chk,
                    max_bounces=cfg.max_bounces,
                )
                d2 = jnp.where(lanes_act[:, None], d2 + d_fix, d2)
        p_fin = pos + jnp.where(lanes_act[:, None], d2, 0.0)
        rows_new = tab[jnp.maximum(code, 0)]
        upd = lanes_act
        mc = mc.at[:, P0 : P0 + 3].set(
            jnp.where(upd[:, None], p_fin, mc[:, P0 : P0 + 3])
        )
        mc = mc.at[:, V0 : V0 + 3].set(
            jnp.where(upd[:, None], vel, mc[:, V0 : V0 + 3])
        )
        mc = mc.at[:, TET].set(
            jnp.where(upd, code, tet_s).astype(mc.dtype)
        )
        mc = mc.at[:, ROW : ROW + ROW_W].set(
            jnp.where(upd[:, None], rows_new, mc[:, ROW : ROW + ROW_W])
        )
        return mc

    return run_lanes


def _rare_stage(mesh: TetMesh, tab, m, disp, pending, cfg, n, nb):
    """Block-compacted resolution of pending convex lanes via the tested
    simple-path tracer; shared by the jnp and packed stream paths."""
    run_lanes = _make_run_lanes(mesh, tab, cfg)

    # rare stage: identical block scheme to fused._mega_cycle_aligned,
    # with the side displacement array gathered/scattered alongside
    capb = min(max(int(nb * cfg.walk_capacity_frac), 32), nb)
    nl = capb * BLOCK
    cap_l = -(-max(int(nl * getattr(cfg, 'arena_lane_frac', 0.25)), 64) // 8) * 8
    max_rounds = -(-n // cap_l) + -(-nb // capb)

    def rare_cond(carry):
        m, disp, pending, r = carry
        return (r < max_rounds) & jnp.any(pending)

    def rare_round(carry):
        m, disp, pending, r = carry
        m3 = m.reshape(nb, BLOCK, WIDTH)
        d3 = disp.reshape(nb, BLOCK, 3)
        pend2 = pending.reshape(nb, BLOCK)
        bpend = jnp.any(pend2, axis=1)
        nbp = jnp.sum(bpend.astype(jnp.int32))
        # both compaction levels via SORT, not nonzero (whose size= index
        # materialization lowers to a scalar-memory scatter-add; see
        # fused.py's rare stage for the measured numbers)
        blk_iota = lax.broadcasted_iota(jnp.int32, (nb, 1), 0)[:, 0]
        bidx = lax.sort(jnp.where(bpend, blk_iota, nb))[:capb]
        safe_b = jnp.minimum(bidx, nb - 1)
        mb = m3[safe_b].reshape(nl, WIDTH)
        db = d3[safe_b].reshape(nl, 3)
        lane_b = lax.broadcasted_iota(jnp.int32, (capb, BLOCK), 0)
        inrange = lane_b < jnp.minimum(nbp, capb)
        lanes_act = (pend2[safe_b] & inrange).reshape(-1)
        lane_iota = lax.broadcasted_iota(jnp.int32, (nl, 1), 0)[:, 0]
        skey = lax.sort(jnp.where(lanes_act, lane_iota, nl))
        idxl = skey[:cap_l]
        sub = mb[jnp.minimum(idxl, nl - 1)]
        dsub = db[jnp.minimum(idxl, nl - 1)]
        sub = run_lanes(sub, dsub, idxl < nl)
        mb = mb.at[idxl].set(sub, mode="drop")
        # handled = pending lanes at or below the last taken sorted id
        thresh = skey[cap_l - 1]
        handled = lanes_act & (lane_iota <= jnp.minimum(thresh, nl - 1))
        m3 = m3.at[bidx].set(mb.reshape(capb, BLOCK, WIDTH), mode="drop")
        pend2 = pend2.at[bidx].set(
            pend2[safe_b] & ~handled.reshape(capb, BLOCK), mode="drop"
        )
        return m3.reshape(n, WIDTH), disp, pend2.reshape(n), r + 1

    m, _, _, _ = lax.while_loop(
        rare_cond, rare_round,
        (m, disp, pending, jnp.zeros((), jnp.int32)),
    )
    return m


def _rare_stage_packed(mesh, tab, m_rm, disp, pending, cfg, n, nb):
    """:_rare_stage: on the packed [n/4, 128] carry (an 8-lane block is 2
    consecutive packed rows, so all regroupings are row-major reshapes;
    same scheme as fused._rare_stage_packed)."""
    from .fused import BLOCK as _B

    run = _make_run_lanes(mesh, tab, cfg)

    capb = min(max(int(nb * cfg.walk_capacity_frac), 32), nb)
    nl = capb * _B
    cap_l = -(-max(int(nl * getattr(cfg, 'arena_lane_frac', 0.25)), 64) // 8) * 8
    max_rounds = -(-n // cap_l) + -(-nb // capb)

    def rare_cond(carry):
        m_rm, disp, pending, r = carry
        return (r < max_rounds) & jnp.any(pending)

    def rare_round(carry):
        m_rm, disp, pending, r = carry
        m3 = m_rm.reshape(nb, 2, 128)
        # disp is PACKED [n/4, 16] (lane l at row l//4, col 4*(l%4)+c) —
        # 8-lane blocks are 2 consecutive rows, row-major relabel only
        d3 = disp.reshape(nb, 2, 16)
        pend2 = pending.reshape(nb, _B)
        bpend = jnp.any(pend2, axis=1)
        nbp = jnp.sum(bpend.astype(jnp.int32))
        blk_iota = lax.broadcasted_iota(jnp.int32, (nb, 1), 0)[:, 0]
        bidx = lax.sort(jnp.where(bpend, blk_iota, nb))[:capb]
        safe_b = jnp.minimum(bidx, nb - 1)
        mb = m3[safe_b].reshape(nl, WIDTH)
        db = d3[safe_b].reshape(nl, 4)
        lane_b = lax.broadcasted_iota(jnp.int32, (capb, _B), 0)
        inrange = lane_b < jnp.minimum(nbp, capb)
        pendb = pend2[safe_b] & inrange
        lanes_act = pendb.reshape(-1)
        lane_iota = lax.broadcasted_iota(jnp.int32, (nl, 1), 0)[:, 0]
        skey = lax.sort(jnp.where(lanes_act, lane_iota, nl))
        idxl = skey[:cap_l]
        sub = mb[jnp.minimum(idxl, nl - 1)]
        dsub = db[jnp.minimum(idxl, nl - 1)][:, :3]
        sub = run(sub, dsub, idxl < nl)
        mb = mb.at[idxl].set(sub, mode="drop")
        thresh = skey[cap_l - 1]
        handled = lanes_act & (lane_iota <= jnp.minimum(thresh, nl - 1))
        m3 = m3.at[bidx].set(mb.reshape(capb, 2, 128), mode="drop")
        pend2 = pend2.at[bidx].set(
            pendb & ~handled.reshape(capb, _B), mode="drop"
        )
        return m3.reshape(n // 4, 128), disp, pend2.reshape(n), r + 1

    m_rm, _, _, _ = lax.while_loop(
        rare_cond, rare_round,
        (m_rm, disp, pending, jnp.zeros((), jnp.int32)),
    )
    return m_rm


def mega_cycle_packed(mesh: TetMesh, tab, m_rm, rng_key, step, cfg, dt,
                      lane_offset0=0):
    """One convex sub-step on the packed [n/4, 128] carry (pallas fast
    path; caller guarantees the envelope via
    fused_pallas.convex_packed_supported and n % PACK_LANES == 0).

    ``cfg.cycle_chunks > 1`` runs the cycle in sub-batches (one lax.scan
    body over equal chunks, same scheme as fused.mega_cycle_packed).
    Beyond the 10M-scale gather-rate fix, chunking is what restores the
    cx TABLE's S(1) fast-memory placement at >=512k lanes: the full-batch
    [n,24] gather output otherwise wins the ~128 MB VMEM budget contest
    (see fused_pallas.convex_packed_supported).  Bit-identical to
    unchunked: noise is drawn once for the full batch and sliced."""
    from . import fused_pallas

    n = m_rm.shape[0] * 4
    nb = n // BLOCK
    chunks = max(int(getattr(cfg, "cycle_chunks", 1)), 1)
    pk = fused_pallas.PACK_LANES
    per = -(-(n // pk) // chunks) * pk
    if chunks > 1 and per < n and per >= pk:
        inoise = fused_pallas._use_inkernel_noise(cfg)
        noise = (
            _brownian_noise(rng_key, step, n, m_rm.dtype, cfg,
                            lane_offset=lane_offset0)
            if (cfg.use_brownian and not inoise) else None
        )

        def chunk_cycle(m_rm_c, off, noise_c, nl):
            mc, dsp, pend = fused_pallas.convex_pre_rare_cycle_packed(
                mesh, tab, m_rm_c, rng_key, step, cfg, dt,
                noise=noise_c, lane_offset=off,
            )
            return _rare_stage_packed(
                mesh, tab, mc, dsp, pend, cfg, nl, nl // BLOCK
            )

        k_full = n // per
        rem = n - k_full * per
        m_full = m_rm[: k_full * per // 4].reshape(
            k_full, per // 4, m_rm.shape[1]
        )
        offs = jnp.arange(k_full, dtype=jnp.int32) * per + lane_offset0
        if noise is not None:
            nz_full = noise[: k_full * per].reshape(k_full, per, 3)

            def body(_, x):
                mi, oi, ni = x
                return None, chunk_cycle(mi, oi, ni, per)

            _, out = lax.scan(body, None, (m_full, offs, nz_full))
        else:

            def body(_, x):
                mi, oi = x
                return None, chunk_cycle(mi, oi, None, per)

            _, out = lax.scan(body, None, (m_full, offs))
        out = out.reshape(k_full * per // 4, m_rm.shape[1])
        if rem:
            tail = chunk_cycle(
                m_rm[k_full * per // 4 :],
                jnp.int32(k_full * per) + lane_offset0,
                None if noise is None else noise[k_full * per :],
                rem,
            )
            out = jnp.concatenate([out, tail], axis=0)
        return out
    m_rm, disp, pending = fused_pallas.convex_pre_rare_cycle_packed(
        mesh, tab, m_rm, rng_key, step, cfg, dt, lane_offset=lane_offset0
    )
    return _rare_stage_packed(mesh, tab, m_rm, disp, pending, cfg, n, nb)
