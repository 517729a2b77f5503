"""Row-cached fused sub-step — the performance engine.

Measured facts that shape this design (v5e, via the chained-dependency
microbenchmarks in this repo's round-1 notes):

* Random indexing costs are **per index**, not per byte: gathering
  [cap] rows of 20 floats costs the same as gathering 1 float per index
  (~80-120M indices/s).  So: pack as much as possible per row, touch as
  few indices as possible.
* Scatters into ``[n,3]``-shaped arrays are pathological (XLA picks a
  transposed T(4,128) layout; ~20 ms per 250k-row scatter): so the engine
  keeps ALL per-particle data in ONE ``[n,32]`` mega-row array — one
  gather compacts a lane, one scatter writes it back.
* Elementwise streaming over [n,*] is effectively free (XLA flattens it).

The cycle (v2 — round-2 redesign, measured on device profiles):

1. Stream the mega rows: advect velocity, Brownian noise, tentative move,
   and the hop-0 barycentric inside-test all come from the cached tet row
   embedded in the mega row.  Particles that stay in their tet (the common
   case — dt moves a fraction of a cell, ``advect.H:36-37``) touch no
   random memory at all.
2. **Inline hop-1**: the single-face crossing (the dominant crosser case)
   is resolved with ONE full-batch ``tet_row`` gather using masked indices
   (non-crossers re-fetch their own row).  Device measurements show a
   full-batch gather costs the same as one ``jnp.nonzero`` compaction
   (~8.5 ns/index), so compacting before hop 1 can never win.
3. **Rare stage** (multi-hop walkers + wall hits, O(f²) of the batch):
   two-stage *block* compaction — a ``lax.sort`` of iota-where-pending
   over n/8 block flags (8x cheaper than lane-level; nonzero's index
   materialization lowers to a scalar-memory scatter-add and costs ~1 ms
   per cycle at 1M lanes), gather whole 8-lane blocks, run the
   bounded tet-walk (``baryTetSearch`` semantics, ``RTQuery.cu:35-90``)
   and specular reflection (``RTreflection``, ``RTQuery.cu:109-186``)
   inside the small buffer, scatter the blocks back.  The stage loops
   (``lax.while_loop``) until no lane is pending, so buffer overflow costs
   extra rounds instead of a full-batch fallback — and there is no
   ``lax.cond`` over the [n,32] state anywhere (measured: big-operand
   conds cost ms even untaken).

Two interpolation modes share the machinery via a row *layout*:

* TetVelocity (RT0, the reference default ``src/initCuda.H:72``) —
  mega width 32: 0:3 pos | 3:6 vel | 6 tet (float int) | 7 active |
  8:28 cached tet_row (A 8:11, Tinv 11:20, u 20:23, nbr 23:27, pad) | pad.
* VertexVelocity (Pk, ``particles.cu:245-313``) — mega width 40 over the
  29-col ``tet_row_pk`` (A, Tinv, v0..v3 at 20:32, nbr 32:36, escape
  mask 36): velocity
  is the barycentric blend of the 4 cached vertex velocities at the
  particle's CURRENT position, all column math (one extra bary eval per
  cycle vs TetVelocity; still zero random memory for non-crossers).

Requires meshes < 2^24 tets in f32 (neighbor codes are stored as exact
float integers); other configs use the simple engine.
(the rare-stage pending flag lives in a separate [n] array — a mega
column would force a full [n,W] stream per reduce)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax

from ..mesh import TetMesh
from . import locate as locate_ops

MAX_HOPS = locate_ops.MAX_HOPS

# mega-row column offsets (layout-independent prefix)
P0, V0, TET, ACT, ROW = 0, 3, 6, 7, 8
RA, RT = ROW, ROW + 3                               # A, Tinv (both layouts)
BLOCK = 8                                           # rare-stage block width


@dataclasses.dataclass(frozen=True)
class Layout:
    """Row-table geometry for one interpolation mode."""

    row_w: int    # table row width
    width: int    # mega-row width
    vel: int      # row-offset of velocity payload (u or v0..v3)
    nbr: int      # row-offset of the 4 neighbor codes

    @property
    def rn(self):  # mega-offset of neighbor codes
        return ROW + self.nbr


LAYOUT_TET = Layout(row_w=20, width=32, vel=12, nbr=15)
LAYOUT_PK = Layout(row_w=29, width=40, vel=12, nbr=24)


def layout_for(cfg) -> Layout:
    return (
        LAYOUT_PK
        if getattr(cfg, "velocity_interp", "TetVelocity") == "VertexVelocity"
        else LAYOUT_TET
    )


def row_table(mesh: TetMesh, ly: Layout):
    return mesh.tet_row_pk if ly is LAYOUT_PK else mesh.tet_row


def pack_state(mesh: TetMesh, pos, vel, tet_id, active, ly: Layout = LAYOUT_TET):
    """Build the mega-row array (one row-table gather for the cache)."""
    n = pos.shape[0]
    dt = pos.dtype
    m = jnp.zeros((n, ly.width), dtype=dt)
    m = m.at[:, P0 : P0 + 3].set(pos)
    m = m.at[:, V0 : V0 + 3].set(vel)
    m = m.at[:, TET].set(tet_id.astype(dt))
    m = m.at[:, ACT].set(active.astype(dt))
    rows = row_table(mesh, ly)[jnp.maximum(tet_id, 0)]
    m = m.at[:, ROW : ROW + ly.row_w].set(rows)
    return m


def unpack_state(m):
    pos = m[:, P0 : P0 + 3]
    vel = m[:, V0 : V0 + 3]
    tet = m[:, TET].astype(jnp.int32)
    act = m[:, ACT] > 0.5
    return pos, vel, tet, act


def _bary4(m, base, px, py, pz):
    """Barycentric components of point (px,py,pz) in the tet row stored at
    column ``base`` of mega rows ``m`` (column arithmetic only)."""
    rx = px - m[:, base + 0]
    ry = py - m[:, base + 1]
    rz = pz - m[:, base + 2]
    t = base + 3
    wb = m[:, t + 0] * rx + m[:, t + 1] * ry + m[:, t + 2] * rz
    wc = m[:, t + 3] * rx + m[:, t + 4] * ry + m[:, t + 5] * rz
    wd = m[:, t + 6] * rx + m[:, t + 7] * ry + m[:, t + 8] * rz
    wa = 1.0 - wb - wc - wd
    return wa, wb, wc, wd


def _bary4_rows(rows, px, py, pz):
    """Barycentric components against a standalone [n,20] row block
    (A at 0:3, Tinv at 3:12 — same packing as the mega-row cache)."""
    rx = px - rows[:, 0]
    ry = py - rows[:, 1]
    rz = pz - rows[:, 2]
    wb = rows[:, 3] * rx + rows[:, 4] * ry + rows[:, 5] * rz
    wc = rows[:, 6] * rx + rows[:, 7] * ry + rows[:, 8] * rz
    wd = rows[:, 9] * rx + rows[:, 10] * ry + rows[:, 11] * rz
    wa = 1.0 - wb - wc - wd
    return wa, wb, wc, wd


def _brownian_noise(rng_key, step, n, dtype, cfg, lane_offset=0):
    """Per-cycle standard-normal noise [n,3].

    "threefry" (default): counter-based jax.random — bit-identical to the
    simple engine's Brownian kick.  "rbg": the TPU hardware bit generator
    + Box-Muller — statistically equivalent (the reference itself only
    needs curand-quality normals, ``particles.cu:551-599``) and several
    VPU passes cheaper per cycle; keyed by (rng_key, step) so runs stay
    reproducible on the same backend.

    ``lane_offset``: global index of lane 0 — multi-device shards pass
    their shard offset so per-shard rbg streams are decorrelated under a
    replicated key (0 leaves the seed bit-identical to the historical
    single-device stream).  Only the rbg branch uses it; the threefry
    branch is counter-based per (key, step) and is only ever called with
    offset 0 (the DP wrapper routes threefry through GSPMD, where the
    noise is ONE logical sharded array).
    """
    # "rbg_kernel" (in-kernel hardware PRNG, fused_pallas._inkernel_noise)
    # only exists on the pallas paths; everywhere else it degrades to the
    # XLA "rbg" stream (statistically equivalent, different bits)
    if getattr(cfg, "brownian_rng", "threefry") in ("rbg", "rbg_kernel"):
        k4 = jnp.concatenate(
            [
                jnp.asarray(rng_key, jnp.uint32).reshape(-1)[:2],
                jnp.asarray(0x9E3779B9, jnp.uint32).reshape(1)
                ^ jnp.asarray(lane_offset, jnp.uint32).reshape(1),
                jnp.asarray(step, jnp.uint32).reshape(1),
            ]
        )
        # full Box-Muller pairs (cos AND sin of each angle): 3 normals
        # from 4 uniforms instead of the wasteful cos-only 6, saving a
        # third of the bit generation plus one log/sqrt per lane
        _, bits = lax.rng_bit_generator(k4, (n, 4), dtype=jnp.uint32)
        u = bits.astype(dtype) * (1.0 / 4294967296.0) + (0.5 / 4294967296.0)
        r = jnp.sqrt(-2.0 * jnp.log(u[:, :2]))
        a = (2.0 * jnp.pi) * u[:, 2:4]
        return jnp.stack(
            [
                r[:, 0] * jnp.cos(a[:, 0]),
                r[:, 0] * jnp.sin(a[:, 0]),
                r[:, 1] * jnp.cos(a[:, 1]),
            ],
            axis=1,
        )
    key = jax.random.fold_in(rng_key, step)
    return jax.random.normal(key, (n, 3), dtype=dtype)


def _grad_rows(rows, slot):
    """Gradient of barycentric component ``slot`` from a standalone
    [n,20] row block (Tinv at 3:12): row (slot-1) of Tinv, or -(sum of
    rows) for slot 0 (cf. ``_grad_cols``)."""
    def comp(o):
        g0 = -(rows[:, 3 + o] + rows[:, 6 + o] + rows[:, 9 + o])
        return jnp.where(
            slot == 0,
            g0,
            jnp.where(
                slot == 1,
                rows[:, 3 + o],
                jnp.where(slot == 2, rows[:, 6 + o], rows[:, 9 + o]),
            ),
        )

    return comp(0), comp(1), comp(2)


def _pick_rows(rows, off, slot):
    """rows[:, off+slot] for per-lane slot in 0..3 (column arithmetic)."""
    return jnp.where(
        slot == 0,
        rows[:, off],
        jnp.where(
            slot == 1,
            rows[:, off + 1],
            jnp.where(slot == 2, rows[:, off + 2], rows[:, off + 3]),
        ),
    )


def _argmin4(wa, wb, wc, wd):
    """First-minimum argmin (owl arg_min scan semantics: strict '<')."""
    best = wa
    slot = jnp.zeros(wa.shape, jnp.int32)
    for i, w in ((1, wb), (2, wc), (3, wd)):
        upd = w < best
        best = jnp.where(upd, w, best)
        slot = jnp.where(upd, i, slot)
    return slot, best


def _pick4(m, base, slot):
    return jnp.where(
        slot == 0,
        m[:, base],
        jnp.where(
            slot == 1,
            m[:, base + 1],
            jnp.where(slot == 2, m[:, base + 2], m[:, base + 3]),
        ),
    )


def _grad_cols(m, base, slot):
    """Gradient of barycentric component ``slot`` from the Tinv at
    ``base+3``: row (slot-1) of Tinv, or -(sum of rows) for slot 0."""
    t = base + 3

    def comp(o):
        g0 = -(m[:, t + o] + m[:, t + 3 + o] + m[:, t + 6 + o])
        return jnp.where(
            slot == 0,
            g0,
            jnp.where(
                slot == 1,
                m[:, t + o],
                jnp.where(slot == 2, m[:, t + 3 + o], m[:, t + 6 + o]),
            ),
        )

    return comp(0), comp(1), comp(2)


def _set_row(mc, rows, row_w):
    return mc.at[:, ROW : ROW + row_w].set(rows)


def _walk_mega(tab, mc, px, py, pz, act, ly: Layout, max_hops=MAX_HOPS):
    """``baryTetSearch`` on mega lanes toward point (px,py,pz), starting
    from the cached row/tet in ``mc``.  ``tab`` is the mesh's row table for
    this layout.  Returns (mc', code, slot): mc' has the row cache of the
    final non-negative tet; ``code`` is the hosting tet or -(lastTet+1);
    ``slot`` the last-crossed local face."""
    n = px.shape[0]
    rn = ly.rn
    tet0 = mc[:, TET].astype(jnp.int32)
    done0 = (tet0 < 0) | (~act)
    slot0 = jnp.zeros((n,), dtype=jnp.int32)

    def cond(c):
        tet, done, slot, mc, hops = c
        return (hops < max_hops) & jnp.logical_not(jnp.all(done))

    def body(c):
        tet, done, slot, mc, hops = c
        wa, wb, wc_, wd = _bary4(mc, RA, px, py, pz)
        s, wmin = _argmin4(wa, wb, wc_, wd)
        inside = wmin >= 0.0
        stepping = (~done) & (~inside)
        code = _pick4(mc, rn, s).astype(jnp.int32)
        out = stepping & (code < 0)
        tet_next = jnp.where(stepping, jnp.where(out, -(tet + 1), code), tet)
        slot_next = jnp.where(stepping, s, slot)
        moved = stepping & (code >= 0)
        new_rows = tab[jnp.where(moved, code, 0)]
        mc_next = jnp.where(
            moved[:, None],
            _set_row(mc, new_rows, ly.row_w),
            mc,
        )
        done_next = done | inside | out
        return tet_next, done_next, slot_next, mc_next, hops + 1

    # unroll the common case (walks are 1-2 hops at sane dt) and enter the
    # bounded loop only for straggler lanes: each while iteration costs a
    # full-buffer gather, and one deep lane would otherwise make every lane
    # pay for max-hops-in-batch iterations
    c = (tet0, done0, slot0, mc, jnp.zeros((), jnp.int32))
    c = body(c)
    c = body(c)

    def deep(c):
        # second-level compaction: the stragglers are a tiny fraction of
        # the buffer, but the while-loop pays full-buffer gathers per trip;
        # pull them into a small sub-buffer first
        tet, done, slot, mc, hops = c
        cap2 = max(n // 8, 256)
        undone = ~done
        cnt2 = jnp.sum(undone.astype(jnp.int32))

        def sub(c):
            tet, done, slot, mc, hops = c
            # straggler-id compaction via sort (see the rare stage: the
            # nonzero(size=) lowering scatters through scalar memory)
            l_iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
            key2 = jnp.where(undone, l_iota, n)
            if cap2 > n:       # static shapes: pad to the slice length
                key2 = jnp.concatenate(
                    [key2, jnp.full((cap2 - n,), n, jnp.int32)]
                )
            sk2 = lax.sort(key2)[:cap2]
            idx2 = jnp.where(sk2 < n, sk2, 0)
            lane2 = jax.lax.broadcasted_iota(jnp.int32, (cap2, 1), 0)[:, 0]
            valid2 = lane2 < jnp.minimum(cnt2, cap2)
            qx, qy, qz = px[idx2], py[idx2], pz[idx2]

            def body2(c2):
                tet2, done2, slot2, mc2, h2 = c2
                wa, wb, wc_, wd = _bary4(mc2, RA, qx, qy, qz)
                s, wmin = _argmin4(wa, wb, wc_, wd)
                inside = wmin >= 0.0
                stepping = (~done2) & (~inside)
                code = _pick4(mc2, rn, s).astype(jnp.int32)
                out = stepping & (code < 0)
                tet_n = jnp.where(stepping, jnp.where(out, -(tet2 + 1), code), tet2)
                slot_n = jnp.where(stepping, s, slot2)
                moved = stepping & (code >= 0)
                rows = tab[jnp.where(moved, code, 0)]
                mc_n = jnp.where(moved[:, None], _set_row(mc2, rows, ly.row_w), mc2)
                return tet_n, done2 | inside | out, slot_n, mc_n, h2 + 1

            def cond2(c2):
                return (c2[4] < max_hops) & jnp.logical_not(jnp.all(c2[1]))

            c2 = (tet[idx2], ~valid2, slot[idx2], mc[idx2], hops)
            tet2, _, slot2, mc2, _ = lax.while_loop(cond2, body2, c2)
            # merge the sub-buffer back by gather (exclusive cumsum ranks)
            rank = jnp.cumsum(undone.astype(jnp.int32)) - 1
            take = undone & (rank < cap2)
            safe_rank = jnp.clip(rank, 0, cap2 - 1)
            tet = jnp.where(take, tet2[safe_rank], tet)
            slot = jnp.where(take, slot2[safe_rank], slot)
            mc = jnp.where(take[:, None], mc2[safe_rank], mc)
            done = done | take
            return tet, done, slot, mc, hops

        # overflow of the sub-buffer (pathological): full-buffer while
        c = lax.cond(cnt2 > cap2, lambda c: lax.while_loop(cond, body, c), sub, c)
        return c

    c = lax.cond(jnp.any(~c[1]), deep, lambda c: c, c)
    tet, _, slot, mc, _ = c
    return mc, tet, slot


def _reflect_mega(mesh: TetMesh, tab, mc, px, py, pz, code, slot, act,
                  ly: Layout, max_bounces=10, remote=None):
    """``RTreflection`` on mega lanes: mirror across the exit plane of the
    cached exit-tet row, re-walk, repeat (<= max_bounces).  Returns updated
    (mc, px..pz, code) with velocity columns reflected in mc.

    ``remote=(R0, per)``: partitioned-mesh mode (parallel/partition.py) —
    neighbor codes below ``-R0`` encode tets on OTHER shards
    (``-(R0+1+g)`` for global tet g); a bounce whose re-walk exits into
    one PAUSES the lane (settled with the sentinel tet ``-(per+g+1)``,
    position at the mirrored point reached so far) for migration, exactly
    like the walk pause.  ``None`` = single-device behavior, unchanged."""
    rn = ly.rn
    hit = act & (code < 0)
    tet_bd = jnp.where(hit, -(code + 1), code)
    settled = ~hit

    def cond(c):
        px, py, pz, tet, s, mc, settled, b = c
        return (b < max_bounces) & jnp.logical_not(jnp.all(settled))

    def body(c):
        px, py, pz, tet, s, mc, settled, b = c
        refl = ~settled
        code_nbr = _pick4(mc, rn, s).astype(jnp.int32)
        if remote is not None:
            # mid-bounce remote crossing: pause for migration
            R0, per_l = remote
            remw = refl & (code_nbr < -R0)
            tet = jnp.where(remw, -(per_l + (-code_nbr - R0 - 1) + 1), tet)
            settled = settled | remw
            refl = refl & ~remw
        # absorbing (outlet) boundary faces: deactivate instead of reflect
        # (bd face identity comes from the exit tet's neighbor code)
        bd = jnp.clip(-code_nbr - 1, 0, max(mesh.n_bd_faces - 1, 0))
        esc = refl & (code_nbr < 0) & mesh.bd_escape[bd]
        tet = jnp.where(esc, -(tet + 1), tet)
        settled = settled | esc
        refl = refl & ~esc
        gx, gy, gz = _grad_cols(mc, RA, s)
        wa, wb, wc_, wd = _bary4(mc, RA, px, py, pz)
        wv = jnp.where(s == 0, wa, jnp.where(s == 1, wb, jnp.where(s == 2, wc_, wd)))
        inv_g2 = 1.0 / (gx * gx + gy * gy + gz * gz)
        f = 2.0 * wv * inv_g2
        px = jnp.where(refl, px - f * gx, px)
        py = jnp.where(refl, py - f * gy, py)
        pz = jnp.where(refl, pz - f * gz, pz)
        ux, uy, uz = mc[:, V0], mc[:, V0 + 1], mc[:, V0 + 2]
        ug = ux * gx + uy * gy + uz * gz
        fu = 2.0 * ug * inv_g2
        mc = mc.at[:, V0].set(jnp.where(refl, ux - fu * gx, ux))
        mc = mc.at[:, V0 + 1].set(jnp.where(refl, uy - fu * gy, uy))
        mc = mc.at[:, V0 + 2].set(jnp.where(refl, uz - fu * gz, uz))
        # re-walk the reflected point from the exit tet
        mc_w = mc.at[:, TET].set(
            jnp.where(refl, jnp.maximum(tet, 0), mc[:, TET].astype(jnp.int32)).astype(
                mc.dtype
            )
        )
        mc_w, wtet, wslot = _walk_mega(tab, mc_w, px, py, pz, refl, ly)
        in_dom = wtet >= 0
        newly = refl & in_dom
        tet = jnp.where(newly, wtet, jnp.where(refl, -(wtet + 1), tet))
        s = jnp.where(refl & ~in_dom, wslot, s)
        mc = jnp.where(refl[:, None], mc_w, mc)
        settled = settled | newly
        return px, py, pz, tet, s, mc, settled, b + 1

    px, py, pz, tet_bd, _, mc, settled, _ = lax.while_loop(
        cond,
        body,
        (px, py, pz, tet_bd, slot, mc, settled, jnp.zeros((), jnp.int32)),
    )
    return mc, px, py, pz, tet_bd


def mega_cycle(mesh: TetMesh, m, rng_key, step, cfg, dt, lane_offset0=0):
    """One sub-step over the mega-row state (see module docstring).

    ``cfg.cycle_chunks > 1`` processes the batch as that many sub-batches
    within the cycle — at 10M lanes the full-batch hop gather's per-index
    cost roughly doubles (HBM queue pressure), and sub-batching restores
    the 1M-scale rate.  Bit-identical to unchunked: the Brownian noise is
    drawn once for the full batch and sliced.

    ``lane_offset0``: global index of lane 0 (multi-device shards; see
    :func:`_brownian_noise`).
    """
    n = m.shape[0]
    if n % BLOCK:
        pad = BLOCK - n % BLOCK
        mp = jnp.pad(m, ((0, pad), (0, 0)))
        return mega_cycle(mesh, mp, rng_key, step, cfg, dt, lane_offset0)[:n]
    chunks = max(int(getattr(cfg, "cycle_chunks", 1)), 1)
    per = -(-(n // BLOCK) // chunks) * BLOCK
    if chunks <= 1 or per >= n or per < 64 * BLOCK:
        return _mega_cycle_aligned(mesh, m, rng_key, step, cfg, dt,
                                   lane_offset=lane_offset0)
    from . import fused_pallas

    inoise = fused_pallas._use_inkernel_noise(cfg)
    noise = (
        _brownian_noise(rng_key, step, n, m.dtype, cfg,
                        lane_offset=lane_offset0)
        if (cfg.use_brownian and not inoise) else None
    )
    outs = []
    for c in range(chunks):
        lo = c * per
        hi = min(lo + per, n)
        if lo >= hi:
            break
        outs.append(
            _mega_cycle_aligned(
                mesh, m[lo:hi], rng_key, step, cfg, dt,
                noise=None if noise is None else noise[lo:hi],
                lane_offset=lane_offset0 + lo,
            )
        )
    return jnp.concatenate(outs, axis=0)


def _stage_velocity(tab, m, ly: Layout, px, py, pz, alive, cfg):
    """Velocity at an RK stage point (px,py,pz), with the stage tet located
    from the lane's cached row by the exact ``locate.walk`` semantics
    (``baryTetSearch``, RTQuery.cu:35-90) — the cached-engine equivalent of
    ``advect.advect``'s per-stage ``vel_at`` (advect.py): out-of-domain
    stage points fall back to the lane's OWN cached tet.

    Structure: hop-0 classify is column math on the cached row (zero
    random memory for the ~94% of stage points that stay in-cell at sane
    dt); crossers ride a sort-compacted arena through :func:`_walk_mega`.
    Returns (kx, ky, kz) [n] stage-velocity components; values for dead
    lanes are the fallback row's (masked by the caller, same as the
    simple engine)."""
    n = m.shape[0]
    RV = ROW + ly.vel
    tet0 = m[:, TET].astype(jnp.int32)
    live = alive & (tet0 >= 0)

    # hop-0 test + default velocity from the lane's own cached row
    w4 = _bary4(m, RA, px, py, pz)
    if ly is LAYOUT_PK:
        kx = sum(w4[i] * m[:, RV + 3 * i] for i in range(4))
        ky = sum(w4[i] * m[:, RV + 3 * i + 1] for i in range(4))
        kz = sum(w4[i] * m[:, RV + 3 * i + 2] for i in range(4))
    else:
        kx, ky, kz = m[:, RV], m[:, RV + 1], m[:, RV + 2]
    wmin0 = jnp.minimum(jnp.minimum(w4[0], w4[1]), jnp.minimum(w4[2], w4[3]))
    pend0 = live & (wmin0 < 0.0)

    nb = n // BLOCK
    capb = min(max(int(nb * cfg.walk_capacity_frac), 32), nb)
    cap_l = capb * BLOCK
    max_rounds = -(-n // cap_l) + 1
    lane_iota = lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]

    def rcond(c):
        kx, ky, kz, pend, r = c
        return (r < max_rounds) & jnp.any(pend)

    def rbody(c):
        kx, ky, kz, pend, r = c
        skey = lax.sort(jnp.where(pend, lane_iota, n))
        idxl = skey[:cap_l]
        valid = idxl < n
        il = jnp.minimum(idxl, n - 1)
        mc = m[il]
        qx, qy, qz = px[il], py[il], pz[il]
        mc2, code, _ = _walk_mega(tab, mc, qx, qy, qz, valid, ly)
        found = valid & (code >= 0)
        if ly is LAYOUT_PK:
            v4 = _bary4(mc2, RA, qx, qy, qz)
            sx = sum(v4[i] * mc2[:, RV + 3 * i] for i in range(4))
            sy = sum(v4[i] * mc2[:, RV + 3 * i + 1] for i in range(4))
            sz = sum(v4[i] * mc2[:, RV + 3 * i + 2] for i in range(4))
        else:
            sx, sy, sz = mc2[:, RV], mc2[:, RV + 1], mc2[:, RV + 2]
        # out-of-domain stage points keep the default (own-row) velocity
        sx = jnp.where(found, sx, kx[il])
        sy = jnp.where(found, sy, ky[il])
        sz = jnp.where(found, sz, kz[il])
        kx = kx.at[idxl].set(sx, mode="drop")
        ky = ky.at[idxl].set(sy, mode="drop")
        kz = kz.at[idxl].set(sz, mode="drop")
        handled = pend & (lane_iota <= jnp.minimum(skey[cap_l - 1], n - 1))
        return kx, ky, kz, pend & ~handled, r + 1

    kx, ky, kz, _, _ = lax.while_loop(
        rcond, rbody, (kx, ky, kz, pend0, jnp.zeros((), jnp.int32))
    )
    return kx, ky, kz


def _mega_cycle_aligned(mesh: TetMesh, m, rng_key, step, cfg, dt, noise=None,
                        lane_offset=0, run_lanes=None):
    n = m.shape[0]
    nb = n // BLOCK
    ly = layout_for(cfg)
    tab = row_table(mesh, ly)
    W = ly.width
    RV = ROW + ly.vel

    n_hops_cfg = max(int(getattr(cfg, "inline_hops", 1)), 0)
    from . import fused_pallas

    if fused_pallas.supported(mesh, cfg, n_hops_cfg):
        # TPU fast path: the stream passes around the hop gather(s) run as
        # hand-fused pallas kernels (one read/write of the mega each)
        # instead of XLA's ~15 fragmented column fusions; the rare stage
        # below is shared.  See ops/fused_pallas.py.
        if n_hops_cfg == 1:
            m, pending = fused_pallas.pre_rare_cycle(
                mesh, tab, m, rng_key, step, cfg, dt, noise=noise,
                lane_offset=lane_offset,
            )
        else:
            m, pending = fused_pallas.pre_rare_cycle_multihop(
                mesh, tab, m, rng_key, step, cfg, dt, n_hops_cfg, noise=noise,
                lane_offset=lane_offset,
            )
        return _rare_stage(mesh, tab, m, pending, cfg, ly, n, nb, W)

    tet = m[:, TET].astype(jnp.int32)
    act = m[:, ACT] > 0.5
    alive = (act & (tet >= 0)) if cfg.use_advection else act
    alf = alive.astype(m.dtype)

    if ly is LAYOUT_PK:
        # Pk: barycentric blend of the 4 cached vertex velocities at the
        # CURRENT position (particles.cu:245-313) — pure column math
        w4 = _bary4(m, RA, m[:, P0], m[:, P0 + 1], m[:, P0 + 2])
        ux = sum(w4[i] * m[:, RV + 3 * i] for i in range(4))
        uy = sum(w4[i] * m[:, RV + 3 * i + 1] for i in range(4))
        uz = sum(w4[i] * m[:, RV + 3 * i + 2] for i in range(4))
    else:
        ux, uy, uz = m[:, RV], m[:, RV + 1], m[:, RV + 2]
    if cfg.use_advection and getattr(cfg, "integrator", "euler") == "rk4":
        # classical RK4 (advect.py rk4 branch, arithmetic order preserved
        # for bit-parity with the simple engine): each stage velocity is
        # evaluated at a relocated stage point via the cached row + the
        # compacted exact walk (_stage_velocity); out-of-domain stages
        # fall back to the lane's own cell, like vel_at's t_ok fallback
        p0x, p0y, p0z = m[:, P0], m[:, P0 + 1], m[:, P0 + 2]
        half = 0.5 * dt
        k2x, k2y, k2z = _stage_velocity(
            tab, m, ly, p0x + half * ux, p0y + half * uy, p0z + half * uz,
            alive, cfg,
        )
        k3x, k3y, k3z = _stage_velocity(
            tab, m, ly, p0x + half * k2x, p0y + half * k2y, p0z + half * k2z,
            alive, cfg,
        )
        k4x, k4y, k4z = _stage_velocity(
            tab, m, ly, p0x + dt * k3x, p0y + dt * k3y, p0z + dt * k3z,
            alive, cfg,
        )
        ux = (ux + 2.0 * k2x + 2.0 * k3x + k4x) / 6.0
        uy = (uy + 2.0 * k2y + 2.0 * k3y + k4y) / 6.0
        uz = (uz + 2.0 * k2z + 2.0 * k3z + k4z) / 6.0
    if cfg.use_advection:
        dx, dy, dz = alf * ux * dt, alf * uy * dt, alf * uz * dt
        # advected velocity into vel columns (particles.cu:361)
        vx = jnp.where(alive, ux, m[:, V0])
        vy = jnp.where(alive, uy, m[:, V0 + 1])
        vz = jnp.where(alive, uz, m[:, V0 + 2])
    else:
        dx = dy = dz = jnp.zeros_like(ux)
        vx, vy, vz = m[:, V0], m[:, V0 + 1], m[:, V0 + 2]
    if cfg.use_brownian:
        sigma = jnp.sqrt(2.0 * cfg.diffusion_coeff * dt).astype(m.dtype)
        xi = noise if noise is not None else _brownian_noise(
            rng_key, step, n, m.dtype, cfg, lane_offset=lane_offset
        )
        dx = dx + alf * sigma * xi[:, 0]
        dy = dy + alf * sigma * xi[:, 1]
        dz = dz + alf * sigma * xi[:, 2]

    # advect kill (particles.cu:333-338)
    actf = alf if cfg.use_advection else m[:, ACT]

    # optimistic move (dx is zero for dead lanes; the walk only refines
    # tet/row; wall reflection in the rare stage rewrites pos for its lanes)
    px = m[:, P0] + dx
    py = m[:, P0 + 1] + dy
    pz = m[:, P0 + 2] + dz

    wa, wb, wc_, wd = _bary4(m, RA, px, py, pz)
    s0, wmin = _argmin4(wa, wb, wc_, wd)
    need = (wmin < 0.0) & (tet >= 0)

    # --- inline hops (full batch, masked indices): a face crossing into
    # the neighbor is resolved with one [n,20] row gather per hop — a
    # full-batch gather costs the same as one n-sized nonzero, so
    # compacting before these hops can never win.  Non-crossers re-fetch
    # their own row.  inline_hops is tuned to the expected crossings per
    # sub-step (1 at tutorial-coupled CFL, 3-4 at ~1 cell/sub-step). ---
    cur_rows = m[:, ROW : ROW + ly.row_w]
    cur_tet = tet
    unresolved = need      # current row does not contain the target point
    wall = jnp.zeros_like(need)   # hit a boundary code
    wall_slot = jnp.zeros_like(s0)
    s_cur = s0
    bw = (wa, wb, wc_, wd)
    # inline_hops=0 routes ALL crossers through the block-compacted rare
    # stage: at very large batches the full-batch masked gather's
    # per-index cost grows (HBM pressure) past what block compaction
    # costs, flipping the round-1 "never compact before hop 1" rule.
    # NOTE on attempted alternatives (all measured SLOWER, v5e, round 3):
    # gathering rows only for crosser-containing 8-lane blocks (sort-
    # compacted block ids + windowed merge) ran 2.7x slower — XLA wraps
    # the [nb,8,row_w] view of the row columns in layout copies; and
    # index-distribution tricks (constant fill index, cache-sized fill
    # regions) do nothing — the gather is issue-rate-bound per index
    # (~122M idx/s in-engine), not cache- or bandwidth-bound.
    n_hops = max(int(getattr(cfg, "inline_hops", 1)), 0)
    for _ in range(n_hops):
        code = _pick_rows(cur_rows, ly.nbr, s_cur).astype(jnp.int32)
        mv = unresolved & (code >= 0)
        new_wall = unresolved & (code < 0)
        wall_slot = jnp.where(new_wall, s_cur, wall_slot)
        wall = wall | new_wall
        idx = jnp.where(mv, code, jnp.maximum(cur_tet, 0))
        rows_g = tab[idx]                          # ONE [n,row_w] gather per hop
        cur_rows = jnp.where(mv[:, None], rows_g, cur_rows)
        cur_tet = jnp.where(mv, code, cur_tet)
        bw = _bary4_rows(cur_rows, px, py, pz)
        s_cur, wmin_h = _argmin4(*bw)
        unresolved = mv & (wmin_h < 0.0)

    # --- inline single bounce (the dominant wall case): mirror pos and
    # vel across the exit-face plane of the boundary-adjacent tet
    # (``RTreflection`` bounce 1, RTQuery.cu:92-186 — the bary-gradient
    # mirror plane is identical to the face-vertex construction) and
    # re-test in the same tet.  Wall grinding (boundary-layer particles
    # re-hitting every sub-step) otherwise floods the rare stage. ---
    if n_hops and cfg.reflect_wall and getattr(cfg, "inline_bounce", True):
        refl = wall
        esc = jnp.zeros_like(wall)
        if getattr(cfg, "escape_faces", False):
            # absorbing (outlet) patches: deactivate instead of reflecting
            code_w = _pick_rows(cur_rows, ly.nbr, wall_slot).astype(jnp.int32)
            bd = jnp.clip(-code_w - 1, 0, max(mesh.n_bd_faces - 1, 0))
            esc = wall & (code_w < 0) & mesh.bd_escape[bd]
            refl = wall & ~esc
        rf = refl.astype(m.dtype)
        gx, gy, gz = _grad_rows(cur_rows, wall_slot)
        wv = jnp.where(
            wall_slot == 0, bw[0],
            jnp.where(wall_slot == 1, bw[1],
                      jnp.where(wall_slot == 2, bw[2], bw[3])),
        )
        gg = gx * gx + gy * gy + gz * gz
        # rf-masked reciprocal: dead lanes may carry zero gradients and a
        # bare 1/gg would poison the 0-masked products with NaN
        inv_g2 = rf / (gg + (1.0 - rf))
        f = 2.0 * wv * inv_g2
        px = px - f * gx
        py = py - f * gy
        pz = pz - f * gz
        fu = 2.0 * (vx * gx + vy * gy + vz * gz) * inv_g2
        vx = vx - fu * gx
        vy = vy - fu * gy
        vz = vz - fu * gz
        wa2, wb2, wc2, wd2 = _bary4_rows(cur_rows, px, py, pz)
        wmin2 = jnp.minimum(jnp.minimum(wa2, wb2), jnp.minimum(wc2, wd2))
        landed = refl & (wmin2 >= 0.0)
        wall = refl & ~landed
        tet1 = jnp.where(esc, -(cur_tet + 1), cur_tet)
        actf = jnp.where(esc, jnp.zeros_like(actf), actf)
    else:
        tet1 = cur_tet
    rows_new = cur_rows
    # pending: deeper walkers + multi-bounce wall lanes (handled below).
    # Kept as a separate [n] array, NOT a mega column: the rare stage
    # reduces over it twice per cycle, and a column reduce would stream
    # the whole [n,32] array each time.
    pending = unresolved | wall

    # assemble the post-hop mega state in ONE materialization.  Chained
    # .at[:,col].set updates forced XLA to insert defensive whole-array
    # copies (~1.3 ms/cycle at 1M lanes); a concatenate of [n,1] columns
    # materialized in the {0,1} layout and bracketed the loop carry with
    # two full-array layout transposes (copy ops, ~2 ms/cycle at 1M).
    # This additive masked construction fuses into one [n,W] pass and
    # lets XLA emit the carry layout directly.
    ci = lax.broadcasted_iota(jnp.int32, (n, W), 1)
    rows_pad = jnp.pad(
        rows_new, ((0, 0), (ROW, W - ROW - ly.row_w))
    )
    head_cols = (
        px, py, pz, vx, vy, vz, tet1.astype(m.dtype), actf,
    )
    head = jnp.zeros((n, W), m.dtype)
    for k, col in enumerate(head_cols):
        head = head + jnp.where(ci == k, col[:, None], 0.0)
    m = jnp.where(ci < ROW, head, rows_pad)

    return _rare_stage(mesh, tab, m, pending, cfg, ly, n, nb, W,
                       run_lanes=run_lanes)


def _make_run_lanes(mesh: TetMesh, tab, cfg, ly: Layout):
    """Arena lane resolver shared by the rare-stage variants."""

    def run_lanes(mc, lanes_act):
        """walk + reflect lanes toward their pos columns; returns updated
        mega rows with final pos/tet/row/vel."""
        qx, qy, qz = mc[:, P0], mc[:, P0 + 1], mc[:, P0 + 2]
        mc2, code, slot = _walk_mega(tab, mc, qx, qy, qz, lanes_act,
                                     ly, cfg.max_hops)
        if cfg.reflect_wall:
            # skip the whole reflection phase when no lane hit a wall (the
            # common case away from boundaries; operands here are small)
            def do_reflect(args):
                mc2, code, slot = args
                return _reflect_mega(
                    mesh, tab, mc2, qx, qy, qz, code, slot, lanes_act,
                    ly, cfg.max_bounces,
                )

            def no_reflect(args):
                mc2, code, slot = args
                return mc2, qx, qy, qz, code

            mc3, rx, ry, rz, tet_f = lax.cond(
                jnp.any(lanes_act & (code < 0)), do_reflect, no_reflect,
                (mc2, code, slot),
            )
        else:
            mc3, rx, ry, rz, tet_f = mc2, qx, qy, qz, code
        upd = lanes_act
        mc3 = mc3.at[:, P0].set(jnp.where(upd, rx, mc3[:, P0]))
        mc3 = mc3.at[:, P0 + 1].set(jnp.where(upd, ry, mc3[:, P0 + 1]))
        mc3 = mc3.at[:, P0 + 2].set(jnp.where(upd, rz, mc3[:, P0 + 2]))
        mc3 = mc3.at[:, TET].set(
            jnp.where(upd, tet_f, mc3[:, TET].astype(jnp.int32)).astype(mc3.dtype)
        )
        return mc3

    return run_lanes


def _rare_stage(mesh: TetMesh, tab, m, pending, cfg, ly: Layout, n, nb, W,
                run_lanes=None):
    """Two-stage block-compacted resolution of the pending lanes (multi-hop
    walkers + multi-bounce wall hits); shared by the jnp and pallas stream
    paths.  See the module docstring, stage 3.  ``run_lanes`` overrides the
    arena resolver (partitioned shards pass a remote-pausing variant)."""
    if run_lanes is None:
        run_lanes = _make_run_lanes(mesh, tab, cfg, ly)

    # --- rare stage: two-stage BLOCK compaction (nonzero over n/8 block
    # flags is 8x cheaper than lane-level), processed in rounds until no
    # lane is pending.  Overflowing the round buffer costs an extra round,
    # never a full-batch fallback, and no lax.cond ever carries [n,32].
    capb = min(max(int(nb * cfg.walk_capacity_frac), 32), nb)
    nl = capb * BLOCK   # arena lanes
    # exact-stage lane capacity: pending density inside a pending block is
    # typically 1-2 of 8 lanes; leftovers just stay pending for a new round
    cap_l = -(-max(int(nl * getattr(cfg, 'arena_lane_frac', 0.25)), 64) // 8) * 8
    # static bound: every round retires min(cap_l lanes, capb blocks) —
    # generous; the while cond exits as soon as nothing is pending
    max_rounds = -(-n // cap_l) + -(-nb // capb)

    def rare_cond(carry):
        m, pending, r = carry
        return (r < max_rounds) & jnp.any(pending)

    def rare_round(carry):
        m, pending, r = carry
        m3 = m.reshape(nb, BLOCK, W)
        pend2 = pending.reshape(nb, BLOCK)
        bpend = jnp.any(pend2, axis=1)
        nbp = jnp.sum(bpend.astype(jnp.int32))
        # block-id compaction via SORT, not nonzero: XLA lowers the
        # nonzero(size=) index materialization to a scalar-memory
        # scatter-add (~1.1 ms/cycle at nb=125k); lax.sort of
        # iota-where-pending produces the same ascending fill-at-end list
        # with vector ops (same fix as the lane level below)
        blk_iota = lax.broadcasted_iota(jnp.int32, (nb, 1), 0)[:, 0]
        bidx = lax.sort(jnp.where(bpend, blk_iota, nb))[:capb]
        safe_b = jnp.minimum(bidx, nb - 1)
        mb = m3[safe_b].reshape(nl, W)             # [capb,8,W] block gather
        lane_b = lax.broadcasted_iota(jnp.int32, (capb, BLOCK), 0)
        inrange = lane_b < jnp.minimum(nbp, capb)
        pendb = pend2[safe_b] & inrange            # [capb,8] lanes to run
        lanes_act = pendb.reshape(-1)
        # --- exact second-stage compaction via SORT.  jnp.nonzero here
        # lowered to a scalar-memory scatter at ~130 ns/index = 8.25 ms at
        # a 62k arena — the single hottest op of the whole cycle.  A
        # bitonic lax.sort of (iota-where-pending) is vector-friendly, and
        # its ascending/fill-at-end output keeps the write-back scatter on
        # the fast sorted path (arbitrary index order there ran ~530 ns/idx).
        lane_iota = lax.broadcasted_iota(jnp.int32, (nl, 1), 0)[:, 0]
        skey = lax.sort(jnp.where(lanes_act, lane_iota, nl))
        idxl = skey[:cap_l]                        # pending lane ids, fill=nl
        sub = mb[jnp.minimum(idxl, nl - 1)]            # [cap_l,W] lane gather
        sub = run_lanes(sub, idxl < nl)
        mb = mb.at[idxl].set(sub, mode="drop")         # [cap_l,W] lane scatter
        # handled = pending lanes with id <= the last taken id (sorted
        # take ⇒ a pure threshold; no rank cumsum needed)
        thresh = skey[cap_l - 1]
        handled = lanes_act & (lane_iota <= jnp.minimum(thresh, nl - 1))
        m3 = m3.at[bidx].set(
            mb.reshape(capb, BLOCK, W), mode="drop"
        )                                              # [capb,8,W] block scatter
        pend2 = pend2.at[bidx].set(
            pendb & ~handled.reshape(capb, BLOCK), mode="drop"
        )
        return m3.reshape(n, W), pend2.reshape(n), r + 1

    m, _, _ = lax.while_loop(
        rare_cond, rare_round, (m, pending, jnp.zeros((), jnp.int32))
    )
    return m


# ---------------------------------------------------------------------------
# packed-carry variant: the mega rides the cycle as its ROW-MAJOR bytes
# viewed [n/4, 128] (f32 tile-exact — no padding), so the rare stage's block
# gather/scatter run on that form natively and the per-cycle {0,1}<->{1,0}
# layout copy pair (~1.9 ms at 1M lanes) disappears.  The stream kernels
# unpack/pack in VMEM (ops/fused_pallas.py packed kernels); only the
# ARENA-sized reshapes below still convert layouts (~8 MB per round).
# ---------------------------------------------------------------------------


def _rare_stage_packed(mesh: TetMesh, tab, m_rm, pending, cfg, ly: Layout,
                       n, nb, W):
    """:_rare_stage: on the packed [n/4, 128] carry.  An 8-lane block is 2
    consecutive packed rows; block-local lane q lives at packed row q//4,
    column 32*(q%4)+c — so all regroupings are row-major reshapes."""
    run_lanes = _make_run_lanes(mesh, tab, cfg, ly)

    capb = min(max(int(nb * cfg.walk_capacity_frac), 32), nb)
    nl = capb * BLOCK
    cap_l = -(-max(int(nl * getattr(cfg, 'arena_lane_frac', 0.25)), 64) // 8) * 8
    max_rounds = -(-n // cap_l) + -(-nb // capb)

    def rare_cond(carry):
        m_rm, pending, r = carry
        return (r < max_rounds) & jnp.any(pending)

    W4 = 4 * W                               # packed row width (4 lanes/row)

    def rare_round(carry):
        m_rm, pending, r = carry
        m3 = m_rm.reshape(nb, 2, W4)         # 8-lane blocks, packed
        pend2 = pending.reshape(nb, BLOCK)
        bpend = jnp.any(pend2, axis=1)
        nbp = jnp.sum(bpend.astype(jnp.int32))
        blk_iota = lax.broadcasted_iota(jnp.int32, (nb, 1), 0)[:, 0]
        bidx = lax.sort(jnp.where(bpend, blk_iota, nb))[:capb]
        safe_b = jnp.minimum(bidx, nb - 1)
        mb = m3[safe_b].reshape(nl, W)       # arena-sized layout regroup
        lane_b = lax.broadcasted_iota(jnp.int32, (capb, BLOCK), 0)
        inrange = lane_b < jnp.minimum(nbp, capb)
        pendb = pend2[safe_b] & inrange
        lanes_act = pendb.reshape(-1)
        lane_iota = lax.broadcasted_iota(jnp.int32, (nl, 1), 0)[:, 0]
        skey = lax.sort(jnp.where(lanes_act, lane_iota, nl))
        idxl = skey[:cap_l]
        sub = mb[jnp.minimum(idxl, nl - 1)]
        sub = run_lanes(sub, idxl < nl)
        mb = mb.at[idxl].set(sub, mode="drop")
        thresh = skey[cap_l - 1]
        handled = lanes_act & (lane_iota <= jnp.minimum(thresh, nl - 1))
        m3 = m3.at[bidx].set(mb.reshape(capb, 2, W4), mode="drop")
        pend2 = pend2.at[bidx].set(
            pendb & ~handled.reshape(capb, BLOCK), mode="drop"
        )
        return m3.reshape(n // 4, W4), pend2.reshape(n), r + 1

    m_rm, _, _ = lax.while_loop(
        rare_cond, rare_round, (m_rm, pending, jnp.zeros((), jnp.int32))
    )
    return m_rm


def mega_macro_packed(mesh: TetMesh, m_rm, rng_key, step, cfg, dt,
                      lane_offset0=0):
    """``cfg.macro_cycles`` sub-steps on the packed carry as ONE macro
    cycle (fused_pallas.macro_cycle_packed) — bit-identical to that many
    :func:`mega_cycle_packed` calls; caller guarantees the envelope via
    fused_pallas.macro_supported.  Handles ``cycle_chunks`` like
    :func:`mega_cycle_packed` (each chunk runs its k sub-steps before the
    next chunk starts — lanes are independent, so trajectories are
    unchanged by the reordering)."""
    from . import fused_pallas

    k = int(getattr(cfg, "macro_cycles", 1))
    n = m_rm.shape[0] * 4
    ly = LAYOUT_TET
    tab = row_table(mesh, ly)
    chunks = max(int(getattr(cfg, "cycle_chunks", 1)), 1)
    pk = fused_pallas.PACK_LANES
    per = -(-(n // pk) // chunks) * pk

    def run_chunk(m_rm_c, off, nl, noise_c=None):
        def rare(mc, pend, cfg_t):
            return _rare_stage_packed(
                mesh, tab, mc, pend, cfg_t, ly, nl, nl // BLOCK, ly.width
            )

        return fused_pallas.macro_cycle_packed(
            mesh, tab, m_rm_c, rng_key, step, cfg, dt, k, rare,
            noise=noise_c, lane_offset=off,
        )

    if chunks > 1 and per < n and per >= pk:
        inoise = fused_pallas._use_inkernel_noise(cfg)
        noise = None
        if cfg.use_brownian and not inoise:
            noise = jnp.concatenate(
                [
                    _brownian_noise(rng_key, step + j, n, m_rm.dtype, cfg,
                                    lane_offset=lane_offset0).T
                    for j in range(k)
                ],
                axis=0,
            )                                    # [3k, n] natural order
        k_full = n // per
        rem = n - k_full * per
        m_full = m_rm[: k_full * per // 4].reshape(
            k_full, per // 4, m_rm.shape[1]
        )
        offs = jnp.arange(k_full, dtype=jnp.int32) * per + lane_offset0
        if noise is not None:
            nz_full = (
                noise[:, : k_full * per]
                .reshape(3 * k, k_full, per)
                .transpose(1, 0, 2)
            )

            def body(_, x):
                mi, oi, ni = x
                return None, run_chunk(mi, oi, per, ni)

            _, out = lax.scan(body, None, (m_full, offs, nz_full))
        else:

            def body(_, x):
                mi, oi = x
                return None, run_chunk(mi, oi, per)

            _, out = lax.scan(body, None, (m_full, offs))
        out = out.reshape(k_full * per // 4, m_rm.shape[1])
        if rem:
            tail = run_chunk(
                m_rm[k_full * per // 4 :],
                jnp.int32(k_full * per) + lane_offset0,
                rem,
                None if noise is None else noise[:, k_full * per :],
            )
            out = jnp.concatenate([out, tail], axis=0)
        return out
    return run_chunk(m_rm, lane_offset0, n)


def mega_cycle_packed(mesh: TetMesh, m_rm, rng_key, step, cfg, dt,
                      lane_offset0=0):
    """One sub-step on the packed [n/4, 128] carry (pallas fast path;
    caller guarantees the envelope via fused_pallas.packed_supported and
    n % 8 == 0).  ``lane_offset0``: global index of lane 0 (multi-device
    shards pass their shard offset so in-kernel PRNG streams stay
    disjoint; see fused_pallas._inkernel_noise)."""
    from . import fused_pallas

    n = m_rm.shape[0] * 4
    nb = n // BLOCK
    ly = layout_for(cfg)
    tab = row_table(mesh, ly)
    n_hops = max(int(getattr(cfg, "inline_hops", 1)), 1)
    chunks = max(int(getattr(cfg, "cycle_chunks", 1)), 1)
    # chunk boundaries must tile whole pallas blocks (grouped lane order
    # is per-block; see fused_pallas.PACK_LANES)
    pk = fused_pallas.PACK_LANES
    per = -(-(n // pk) // chunks) * pk
    if chunks > 1 and per < n and per >= pk:
        # equal-size chunks ride ONE lax.scan body (unrolled chunk bodies
        # made compile time O(chunks) — 263 s at 16 chunks/10M); a short
        # tail chunk gets its own sized call
        inoise = fused_pallas._use_inkernel_noise(cfg)
        noise = (
            _brownian_noise(rng_key, step, n, m_rm.dtype, cfg,
                            lane_offset=lane_offset0)
            if (cfg.use_brownian and not inoise) else None
        )

        def chunk_cycle(m_rm_c, off, noise_c, nl):
            mc, pend = fused_pallas.pre_rare_cycle_packed(
                mesh, tab, m_rm_c, rng_key, step, cfg, dt,
                noise=noise_c, n_hops=n_hops, lane_offset=off,
            )
            return _rare_stage_packed(
                mesh, tab, mc, pend, cfg, ly, nl, nl // BLOCK, ly.width
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
    m_rm, pending = fused_pallas.pre_rare_cycle_packed(
        mesh, tab, m_rm, rng_key, step, cfg, dt, n_hops=n_hops,
        lane_offset=lane_offset0,
    )
    return _rare_stage_packed(mesh, tab, m_rm, pending, cfg, ly, n, nb,
                              ly.width)
