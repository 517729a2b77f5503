"""The fused particle stepper.

The reference's per-cycle hot loop (``src/advect.H:86-184``) is six
synchronized kernel launches: advect -> brownian -> locate -> reflect ->
move (each with a full ``cudaDeviceSynchronize``).  Here the whole
sub-cycling loop is ONE compiled XLA program: a ``lax.fori_loop`` over
``n_cycles`` of the fused cycle, with zero host round-trips and zero
device syncs inside.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from .mesh import TetMesh
from .state import ParticleState
from .ops import advect as advect_ops
from .ops import locate as locate_ops


@dataclasses.dataclass(frozen=True)
class StepConfig:
    """Static per-run knobs (hashable; changing them recompiles).

    Mirrors the reference's config surface: the ``cudaParticlesDict`` keys
    (``src/initCuda.H:50-57``) plus the hardcoded toggles that should have
    been config (``src/initCuda.H:64-72``), promoted to real options.
    """

    dt: float = 1e-4
    diffusion_coeff: float = 5.7e-6
    use_advection: bool = True            # usingAdvection
    use_brownian: bool = True             # usingBrownianMotion
    reflect_wall: bool = True             # reflectWall
    velocity_interp: str = advect_ops.TET_VELOCITY  # VelocityInterpMethod
    max_hops: int = locate_ops.MAX_HOPS   # RTQuery.cu:42
    max_bounces: int = 10                 # RTQuery.cu:131
    # engine selection: "cached" = row-cache fast path (TetVelocity only),
    # "simple" = straightforward vectorized ops, "auto" picks cached when
    # the interpolation mode allows it.
    engine: str = "auto"
    # rare-stage round buffer: fraction of the n/8 lane-blocks gathered per
    # round (pending lanes after the inline hop — multi-hop walkers + wall
    # hits).  Undersizing costs extra rounds, never correctness.
    walk_capacity_frac: float = 0.125
    # rare-stage exact-lane capacity, as a fraction of the round arena
    # (``walk_capacity_frac * n`` lanes).  Arena op cost scales with this;
    # undersizing costs extra rounds, never correctness.  1/4 retires a
    # fully-pending arena in 4 rounds; the headline regime pends ~1% of
    # lanes so smaller fractions shrink every per-round [cap_l,*] op.
    arena_lane_frac: float = 0.25
    # cell-location algorithm: "bary" = barycentric sign walk (RTX build,
    # query/RTQuery.cu), "convex" = exact segment/face tracing (ConvexPoly
    # build, query/ConvexQuery.cu)
    locate_mode: str = "bary"
    # time integrator: "euler" (reference, particles.cu:297-302) or "rk4"
    # (north-star mode; cached engine on the bary path — stage velocities
    # via fused._stage_velocity — simple engine elsewhere)
    integrator: str = "euler"
    # Brownian noise source (cached engine): "threefry" = counter-based
    # jax.random, bit-identical to the simple engine; "rbg" = TPU hardware
    # bit generator + Box-Muller, statistically equivalent and cheaper;
    # "rbg_kernel" = the same construction from the hardware PRNG INSIDE
    # the pallas stream kernel (fastest; single-device pallas paths only —
    # elsewhere it degrades to "rbg")
    brownian_rng: str = "threefry"
    # full-batch inline walk hops per sub-step before the compacted rare
    # stage takes over: 1 for low-CFL regimes (<~15% of particles cross a
    # tet face per sub-step), 3-4 when particles cross ~a cell per
    # sub-step (e.g. the pitzDaily tutorial's frozen-field replay).
    # See suggest_tuning() for the data-driven choice.
    inline_hops: int = 1
    # resolve the dominant single-bounce wall reflection inline (full
    # batch, column math) before the rare stage; semantics identical to
    # bounce 1 of RTreflection (RTQuery.cu:92-186)
    inline_bounce: bool = True
    # sub-batches per cycle (>=8M-particle runs: the full-batch hop
    # gather's per-index cost grows with outstanding HBM loads; chunking
    # restores the small-batch rate; bit-identical results)
    cycle_chunks: int = 1
    # block-compacted inline-hop gather (packed pallas path, hops=1):
    # gather neighbor rows only for 4-lane packed groups containing a
    # crosser, instead of refetching every lane's row cache.  0 = off
    # (full-batch masked gather), 4 = 4-lane groups.  Crossers in groups
    # beyond the capacity overflow to the rare arena — never wrong, only
    # slower; results are bit-identical either way (the arena walk
    # re-derives the same hop endpoint).
    hop_compact: int = 0
    # gathered-group capacity as a fraction of n/4 (static shape); size
    # it above the expected block-pending rate 1-(1-c)^4 for crossing
    # fraction c (the headline's c=0.128 -> 0.42)
    hop_compact_frac: float = 0.5
    # macro-cycle fusion (packed pallas path): k sub-steps per mega
    # round-trip — non-crossing lanes advance k steps entirely in VMEM
    # and the hop-resolution machinery runs once per CROSSING instead of
    # once per sub-step (fused_pallas.macro_cycle_packed).  1 = off;
    # bit-identical to k per-cycle sub-steps.
    macro_cycles: int = 1
    # set by the case drivers when absorbing (escape) patches exist so the
    # inline bounce checks bd_escape; the rare-stage reflector always does
    escape_faces: bool = False
    # stream implementation for the cached engine's pre-rare-stage work:
    # "auto" uses the hand-fused pallas kernels on TPU backends when the
    # configuration allows (TetVelocity, inline_hops=1, no escape faces),
    # "jnp" forces the XLA column-math path (the parity reference),
    # "pallas" asserts the fast path is used (tests)
    engine_impl: str = "auto"
    # safety net for convex mode: the reference's tracer cannot re-detect a
    # face once a particle sits a hair outside it (tol asymmetry,
    # ConvexQuery.cu:95), so corner-reflection dust can leak out of the
    # domain (their testNStracing replays such cases).  This runs a
    # barycentric re-check + reflect after the convex step; disable for
    # strict reference behavior.
    convex_bary_fix: bool = True

    def __post_init__(self):
        if self.hop_compact not in (0, 4):
            raise ValueError(
                f"hop_compact must be 0 (off) or 4 (4-lane groups), got "
                f"{self.hop_compact!r} — other group widths are not "
                f"implemented (the packed carry holds 4 lanes per row)"
            )
        if not 1 <= self.macro_cycles <= 8:
            raise ValueError(
                f"macro_cycles must be in 1..8 (phases ride f32 head rows"
                f" and trips are unrolled), got {self.macro_cycles!r}"
            )

    def resolved_engine(self) -> str:
        if self.engine == "auto":
            if self.locate_mode == "convex":
                # ConvexPoly cached engine (TetVelocity + Euler, like the
                # reference's default build); needs with_convex_rows(mesh)
                return (
                    "cached"
                    if self.velocity_interp == advect_ops.TET_VELOCITY
                    and self.integrator == "euler"
                    else "simple"
                )
            # euler AND rk4 ride the cached engine on the bary path (rk4
            # stage velocities come from _stage_velocity's cached-row
            # classify + compacted exact walk, fused.py)
            return (
                "cached"
                if self.velocity_interp
                in (advect_ops.TET_VELOCITY, advect_ops.VERTEX_VELOCITY)
                and self.locate_mode == "bary"
                and self.integrator in ("euler", "rk4")
                else "simple"
            )
        return self.engine


def cycle(mesh: TetMesh, state: ParticleState, cfg: StepConfig, dt) -> ParticleState:
    """One Lagrangian sub-step (one iteration of ``advect.H:86-184``)."""
    pos, vel, disp = state.pos, state.vel, state.disp
    tet_id, active = state.tet_id, state.active

    # advect: disp = dt * u(x); kills lanes with negative tet ids
    if cfg.use_advection:
        disp, vel, active = advect_ops.advect(
            mesh, pos, vel, tet_id, active, dt, cfg.velocity_interp,
            integrator=cfg.integrator,
        )

    # brownian: disp += sqrt(2 D dt) N(0,1)
    if cfg.use_brownian:
        key = jax.random.fold_in(state.rng_key, state.step)
        disp = advect_ops.brownian(disp, active, key, dt, cfg.diffusion_coeff)

    if cfg.locate_mode == "convex":
        # ConvexPoly mode: exact segment tracing + its reflector
        from .ops import convex as convex_ops

        tet_id, stop_tet, p_cross, hit_face = convex_ops.trace_segment(
            mesh, pos, disp, tet_id, active=active, max_tets=cfg.max_hops
        )
        if cfg.reflect_wall:
            pos, disp, vel, tet_id = convex_ops.convex_reflect(
                mesh, pos, disp, vel, tet_id, stop_tet, p_cross, hit_face
            )
            if cfg.convex_bary_fix:
                # barycentric consistency pass on the landed position
                p_land = pos + jnp.where(active[:, None], disp, 0.0)
                tet_chk, _ = locate_ops.walk(mesh, p_land, tet_id)
                zero = jnp.zeros_like(disp)
                d_fix, vel, tet_id = locate_ops.reflect_walls(
                    mesh, p_land, zero, vel, tet_chk,
                    max_bounces=cfg.max_bounces,
                )
                disp = jnp.where(active[:, None], disp + d_fix, disp)
    else:
        # locate: walk from previous tet to pos + disp
        tet_id, _ = locate_ops.walk(
            mesh, pos + disp, tet_id, max_hops=cfg.max_hops
        )

        # reflect wall hits (specular, all boundaries — reference TODO
        # semantics)
        if cfg.reflect_wall:
            disp, vel, tet_id = locate_ops.reflect_walls(
                mesh, pos, disp, vel, tet_id, max_bounces=cfg.max_bounces
            )

    # move: pos += disp; disp = 0
    pos, disp = advect_ops.move(pos, disp, active)

    return dataclasses.replace(
        state,
        pos=pos,
        vel=vel,
        disp=disp,
        tet_id=tet_id,
        active=active,
        step=state.step + 1,
    )


def _run_cycles_impl(
    mesh: TetMesh, state: ParticleState, cfg: StepConfig, n_cycles: int, dt,
    lane_offset0=0,
) -> ParticleState:
    dt = jnp.asarray(cfg.dt if dt is None else dt, dtype=state.dtype)

    engine = cfg.resolved_engine()
    if engine == "cached" and cfg.locate_mode == "convex":
        if mesh.tet_row_cx is None:
            # without with_convex_rows(mesh): simple engine
            engine = "simple"
        else:
            from .ops import fused, fused_convex, fused_pallas

            tab = fused_convex.cx_table(mesh)
            m0 = fused_convex.pack_state(
                mesh, tab, state.pos, state.vel, state.tet_id, state.active
            )

            n_hops = max(int(getattr(cfg, "inline_hops", 1)), 0)
            # auto engages the packed convex path only in its measured-good
            # regime: >=1M lanes AND cycle_chunks >= 2 (~500k-1M-lane
            # chunks keep the cx table S(1)-placed; unchunked or <=333k
            # chunks run the stream gather 2x slower — see
            # fused_pallas.convex_packed_supported).  suggest_tuning sets
            # the chunks; explicit engine_impl overrides.
            if fused_pallas.convex_packed_supported(mesh, cfg, n_hops) and (
                getattr(cfg, "engine_impl", "auto")
                in ("pallas", "pallas_packed")
                or (
                    m0.shape[0] >= 1_000_000
                    and max(int(getattr(cfg, "cycle_chunks", 1)), 1) >= 2
                )
            ):
                # packed-carry convex fast path (see the bary twin below);
                # the pad rounds the block count to a chunk multiple so
                # the scan tiles exactly (no ragged tail chunk)
                n0 = m0.shape[0]
                pk = fused_pallas.PACK_LANES
                chunks = max(int(getattr(cfg, "cycle_chunks", 1)), 1)
                blocks = -(-n0 // pk)
                if chunks > 1:
                    blocks = -(-blocks // chunks) * chunks
                pad = blocks * pk - n0
                if pad:
                    m0 = jnp.pad(m0, ((0, pad), (0, 0)))
                m_rm0 = m0.reshape(-1, 4 * fused_convex.WIDTH)

                def body_cp(i, carry):
                    m_rm, step = carry
                    m_rm = fused_convex.mega_cycle_packed(
                        mesh, tab, m_rm, state.rng_key, step, cfg, dt,
                        lane_offset0=lane_offset0,
                    )
                    return m_rm, step + 1

                m_rm, step = lax.fori_loop(
                    0, n_cycles, body_cp, (m_rm0, state.step)
                )
                m = m_rm.reshape(-1, fused_convex.WIDTH)[:n0]
                pos, vel, tet, act = fused.unpack_state(m)
                return dataclasses.replace(
                    state, pos=pos, vel=vel,
                    disp=jnp.zeros_like(state.disp),
                    tet_id=tet, active=act, step=step,
                )

            def body(i, carry):
                m, step = carry
                m = fused_convex.mega_cycle(
                    mesh, tab, m, state.rng_key, step, cfg, dt,
                    lane_offset0=lane_offset0,
                )
                return m, step + 1

            m, step = lax.fori_loop(0, n_cycles, body, (m0, state.step))
            pos, vel, tet, act = fused.unpack_state(m)
            return dataclasses.replace(
                state, pos=pos, vel=vel, disp=jnp.zeros_like(state.disp),
                tet_id=tet, active=act, step=step,
            )
    if engine == "cached":
        from .ops import fused

        ly = fused.layout_for(cfg)
        if fused.row_table(mesh, ly) is None:
            # VertexVelocity without with_pk_rows(mesh): simple engine
            engine = "simple"

    if engine == "cached":
        m0 = fused.pack_state(
            mesh, state.pos, state.vel, state.tet_id, state.active, ly
        )

        from .ops import fused_pallas

        n_hops = max(int(getattr(cfg, "inline_hops", 1)), 0)
        if (
            fused_pallas.packed_supported(mesh, cfg, n_hops)
            and (
                m0.shape[0] >= fused_pallas.PACK_MIN_LANES
                or getattr(cfg, "engine_impl", "auto") == "pallas_packed"
            )
        ):
            # packed-carry fast path: the mega rides the whole sub-cycling
            # loop as its row-major [n/4, 4W] bytes — one pack/unpack per
            # run_cycles call instead of a layout copy pair per cycle.
            # Lane count padded to a full pallas block: the in-kernel
            # grouped unpack scatters a partial block's lanes out of range
            # (fused_pallas.PACK_LANES docs).  Zero-padded lanes are
            # benign: act=0, tet=0 with a zero row never goes pending.
            # Under cycle_chunks > 1 the pad also rounds the BLOCK count
            # up to a chunk multiple, so the scan tiles the mega exactly —
            # a ragged tail otherwise costs a separately-compiled chunk
            # plus full-mega concat copies every cycle (~7.6 ms/cycle at
            # 10M lanes, round-5 profile); the pad's dead-lane compute is
            # <= (chunks-1)/chunks of one block per chunk.
            n0 = m0.shape[0]
            pk = fused_pallas.PACK_LANES
            chunks = max(int(getattr(cfg, "cycle_chunks", 1)), 1)
            blocks = -(-n0 // pk)
            if chunks > 1:
                blocks = -(-blocks // chunks) * chunks
            pad = blocks * pk - n0
            if pad:
                m0 = jnp.pad(m0, ((0, pad), (0, 0)))
            m_rm0 = m0.reshape(-1, 4 * ly.width)

            def body_p(i, carry):
                m_rm, step = carry
                m_rm = fused.mega_cycle_packed(
                    mesh, m_rm, state.rng_key, step, cfg, dt,
                    lane_offset0=lane_offset0,
                )
                return m_rm, step + 1

            k_m = int(getattr(cfg, "macro_cycles", 1))
            if k_m > 1 and fused_pallas.macro_supported(mesh, cfg, k_m):
                # macro-cycle fusion: k sub-steps per mega round-trip;
                # leftover cycles (n_cycles % k) run per-cycle
                n_mac = n_cycles // k_m

                def body_m(i, carry):
                    m_rm, step = carry
                    m_rm = fused.mega_macro_packed(
                        mesh, m_rm, state.rng_key, step, cfg, dt,
                        lane_offset0=lane_offset0,
                    )
                    return m_rm, step + k_m

                m_rm, step = lax.fori_loop(
                    0, n_mac, body_m, (m_rm0, state.step)
                )
                m_rm, step = lax.fori_loop(
                    0, n_cycles - n_mac * k_m, body_p, (m_rm, step)
                )
            else:
                m_rm, step = lax.fori_loop(
                    0, n_cycles, body_p, (m_rm0, state.step)
                )
            m = m_rm.reshape(-1, ly.width)[:n0]
            pos, vel, tet, act = fused.unpack_state(m)
            return dataclasses.replace(
                state, pos=pos, vel=vel, disp=jnp.zeros_like(state.disp),
                tet_id=tet, active=act, step=step,
            )

        def body(i, carry):
            m, step = carry
            m = fused.mega_cycle(mesh, m, state.rng_key, step, cfg, dt,
                                 lane_offset0=lane_offset0)
            return m, step + 1

        m, step = lax.fori_loop(0, n_cycles, body, (m0, state.step))
        pos, vel, tet, act = fused.unpack_state(m)
        return dataclasses.replace(
            state,
            pos=pos,
            vel=vel,
            disp=jnp.zeros_like(state.disp),
            tet_id=tet,
            active=act,
            step=step,
        )

    def body(_, st):
        return cycle(mesh, st, cfg, dt)

    return lax.fori_loop(0, n_cycles, body, state)


@partial(jax.jit, static_argnames=("cfg", "n_cycles"))
def run_cycles(
    mesh: TetMesh, state: ParticleState, cfg: StepConfig, n_cycles: int,
    dt=None, lane_offset0=0,
) -> ParticleState:
    """``n_cycles`` sub-steps as one compiled program.

    ``dt`` defaults to cfg.dt; pass the Eulerian ``cycleDt`` for coupled runs
    (``advect.H:36-37``: nCycles = ceil(deltaT/dt), cycleDt = deltaT/nCycles).

    Engine "cached" (default for TetVelocity) carries the per-particle row
    cache through the loop — one gather builds it, only face-crossers touch
    it after (see :mod:`.ops.fused`).
    """
    return _run_cycles_impl(mesh, state, cfg, n_cycles, dt, lane_offset0)


@partial(jax.jit, static_argnames=("cfg", "n_cycles"), donate_argnums=(1,))
def run_cycles_donated(
    mesh: TetMesh, state: ParticleState, cfg: StepConfig, n_cycles: int,
    dt=None, lane_offset0=0,
) -> ParticleState:
    """:func:`run_cycles` with the input state DONATED: its buffers are
    reused for the outputs, halving the particle-state HBM footprint.  Use
    on hot paths that never touch the old state again (the case drivers,
    bench); tests that re-run from one seed state need :func:`run_cycles`.
    """
    return _run_cycles_impl(mesh, state, cfg, n_cycles, dt, lane_offset0)


@partial(jax.jit, static_argnames=("cfg",))
def step_once(mesh: TetMesh, state: ParticleState, cfg: StepConfig, dt) -> ParticleState:
    """Single sub-step (jitted), for tests and interactive use."""
    return cycle(mesh, state, cfg, jnp.asarray(dt, dtype=state.dtype))


def suggest_tuning(mesh: TetMesh, cfg: StepConfig, dt=None,
                   n_particles: int | None = None) -> StepConfig:
    """Profile-guided static tuning of the cached engine's knobs.

    Estimates the expected tet-face crossings per particle per sub-step
    from the mesh's per-tet velocity magnitude, tet size, and the Brownian
    RMS kick, then picks ``inline_hops`` (full-batch walk hops) and
    ``walk_capacity_frac`` (rare-stage round buffer) to match the regime.
    Cheap (one host-side pass over the tet arrays at setup); exactness is
    never at stake — these knobs trade kernel launches vs buffer sizes.
    """
    import numpy as np

    from . import mesh as meshlib

    dt = float(cfg.dt if dt is None else dt)
    pts = meshlib.host_np(mesh, "points", np.float64)
    tets = meshlib.host_np(mesh, "tets")
    u = meshlib.host_np(mesh, "tet_vel", np.float64)
    if cfg.velocity_interp == advect_ops.VERTEX_VELOCITY or not np.any(u):
        # Pk workloads carry per-vertex velocities; estimate per-tet speed
        # from the vertex average when tet_vel is absent/zero
        vv = meshlib.host_np(mesh, "vert_vel", np.float64)
        if np.any(vv):
            u = vv[tets].mean(axis=1)
    a = pts[tets[:, 0]]
    vol = np.abs(
        np.einsum(
            "ij,ij->i",
            pts[tets[:, 1]] - a,
            np.cross(pts[tets[:, 2]] - a, pts[tets[:, 3]] - a),
        )
        / 6.0
    )
    h = np.cbrt(np.maximum(vol * 6.0, 1e-300))   # tet characteristic length
    speed = np.sqrt((u * u).sum(axis=1))
    if cfg.use_brownian:
        # per-axis RMS Brownian displacement rate over one sub-step
        speed = speed + np.sqrt(2.0 * cfg.diffusion_coeff / max(dt, 1e-300)) * 1.7
    # mean tets crossed per sub-step (the 1.5 accounts for the Kuhn split's
    # internal diagonal faces being crossed more often than cell faces)
    crossings = float(np.mean(np.minimum(speed * dt / np.maximum(h, 1e-300), 50.0)) * 1.5)
    # measured on v5e (tools/profile_cycle.py): at ~2.3 mean crossings the
    # per-cycle cost keeps dropping through ~5-7 inline hops because every
    # rare-stage round costs several kernel launches; at <0.2 crossings a
    # single hop resolves ~95% of crossers
    if crossings < 0.4:
        hops, frac = 1, 1 / 16
    elif crossings < 0.8:
        hops, frac = 2, 1 / 8
    elif crossings < 1.5:
        hops, frac = 4, 1 / 4
    else:
        hops, frac = min(4 + int(crossings + 1.0), 8), 1 / 4
    # inline single-bounce reflection streams several full-batch passes
    # per cycle; it pays off only when wall contact is frequent (e.g. 2-D
    # cases where every cell touches an empty patch and Brownian motion
    # grinds the z-walls).  Estimate the per-cycle wall-hit rate as
    # (boundary-adjacent tet fraction) x (crossing rate) and route rare
    # wall hits through the compacted rare stage instead.
    bd_frac = float(np.mean(np.any(meshlib.host_np(mesh, "tet_nbr") < 0, axis=1)))
    wall_rate = bd_frac * min(crossings, 1.0) * 0.5
    inline_bounce = cfg.reflect_wall and wall_rate > 0.01
    # very large batches: sub-batch the cycle (measured on v5e: the
    # full-batch hop gather's per-index cost grows with index count under
    # HBM load-queue pressure).  The pallas stream engines degrade above
    # ~1M indices (10M sweep: 5M chunks 382, 1.25M 191, 625k 181 ms) —
    # target ~625k-lane chunks there; the jnp engine holds its rate to
    # ~5M (344 -> 197 ms at 10M with 5M chunks).
    from .ops import fused_pallas

    n_p = int(n_particles or 0)
    pallas_tet = (
        getattr(cfg, "locate_mode", "bary") == "bary"
        and fused_pallas.supported(
            mesh, dataclasses.replace(cfg, inline_hops=hops), hops
        )
    )
    pallas_cx = (
        getattr(cfg, "locate_mode", "bary") == "convex"
        and fused_pallas.convex_packed_supported(
            mesh, dataclasses.replace(cfg, inline_hops=hops), hops
        )
    )
    if pallas_cx and n_p >= 1_000_000:
        # packed convex: ~500k-1M-lane chunks keep the cx table S(1)-
        # placed (measured: 1M k=2 18.5 ms vs k=1 38.3; smaller chunks
        # lose the placement again) — see fused_convex.mega_cycle_packed
        chunks = max(2, -(-n_p // 1_000_000))
    else:
        # pallas chunk target re-swept with hop_compact live (10M, hc=4):
        # 625k-lane chunks 61.1M, 500k 63.1, ~417k 64.5, 312k 63.5 —
        # the hc staging shrinks with the chunk, freeing S(1) budget
        target = 420_000 if pallas_tet else 5_000_000
        chunks = 1 if n_p <= 2_000_000 else max(1, round(n_p / target))
    # block-compacted hop gather (packed path, hops=1): gather 2 neighbor
    # rows per crosser-containing 4-lane group instead of refetching every
    # lane — measured 13.22 -> 11.37 ms/cycle on the 1M headline (the
    # full-batch gather is per-INDEX bound).  Third+ crossers per group
    # overflow to the rare arena, so gate on a crossing rate where that
    # overflow stays small (<~1% of lanes below c~0.35).
    # CONVEX too since round 5: the round-4 "S(1) contest" dead end was an
    # artifact of the ragged tail chunk (half the 1M batch ran a separate
    # tail program + full-mega concat copies); with exact chunk tiling,
    # hc=4 on the packed convex engine measured 15.07 -> 13.57-14.02
    # ms/cycle at 1M (66 -> 71-74M steps/s, 49^3 and 55^3 meshes).
    hop_compact = (
        4
        if (
            (pallas_tet or (pallas_cx and n_p >= 1_000_000))
            and hops == 1
            and crossings < 0.35
            and n_p >= fused_pallas.PACK_MIN_LANES
        )
        else 0
    )
    # gathered-group capacity: the measured optimum sits just ABOVE the
    # actual pending-group rate and the cliff below it is steep (1M
    # headline, rate ~0.42: frac 0.45 -> 9.03 ms, 0.42 -> 8.72, but
    # 0.40 -> 12.12 — sub-capacity overflow floods the rare arena every
    # cycle).  Scale the capacity with the ESTIMATED group-pending rate
    # 1-(1-c)^4 at a 2x safety factor (the estimator is only good to
    # ~2x and the cliff is one-sided), capped at the headline's 0.45:
    # at LOW crossing rates the smaller gather is a large win (dt=0.01,
    # c~2.6%: hcf 0.45 -> 8.84 ms, 0.25 -> 7.40, 0.15 -> 6.80 = 147M
    # steps/s), while overshooting costs only the extra capacity.
    if hop_compact:
        grate = 1.0 - (1.0 - min(crossings, 1.0)) ** 4
        hc_frac = min(0.45, max(0.15, 2.0 * grate + 0.02))
    else:
        hc_frac = cfg.hop_compact_frac
    # rare-arena exact-stage capacity: the packed convex stream pends only
    # ~0.6% of lanes (the inline hop-1 resolves ~95% of crossers, measured
    # at the headline config), so a leaner per-round arena wins — every
    # [cap_l,*] op inside the trace loop halves (1M: alf 0.25 -> 18.3 ms,
    # 0.125 -> 15.9).  The same holds for the multihop bary regimes
    # (tutorial scale, hops=4: 2.52 -> 2.29 ms/cycle, 39.8 -> 43.7M; the
    # neighboring fracs 0.0625/0.5 and wf 0.125/0.1875 all measured
    # worse).  The bary hc=4 path wants a leaner arena too, but its
    # pending includes hop-compaction overflow and the undersize cliff
    # is steep (headline sweep: alf 0.25 -> 9.09 ms, 0.21875 -> 8.73,
    # 0.1875 -> 8.50 [x3 reproduced], 0.15625 -> 8.25, 0.125 -> 11.58);
    # auto picks 0.1875 — one comfortable step above the cliff.
    # hc=4 first: its pending includes hop-compaction overflow and the
    # undersize cliff is steep in BOTH locate modes (bary headline sweep
    # above; convex 1M: alf 0.125 -> 15.40 ms, 0.1875 -> 14.02)
    if hop_compact:
        arena_lf = 0.1875
    elif pallas_cx or hops >= 2:
        arena_lf = 0.125
    else:
        arena_lf = cfg.arena_lane_frac
    return dataclasses.replace(
        cfg, inline_hops=hops, walk_capacity_frac=frac,
        inline_bounce=inline_bounce, cycle_chunks=chunks,
        hop_compact=hop_compact, hop_compact_frac=hc_frac,
        arena_lane_frac=arena_lf,
    )


def n_cycles_for(delta_t_euler: float, dt_lagrange: float) -> tuple[int, float]:
    """Sub-cycling split (``advect.H:36-37``)."""
    import math

    n = max(int(math.ceil(delta_t_euler / dt_lagrange)), 1)
    return n, delta_t_euler / n


def diagnostics(state: ParticleState) -> dict:
    """Out-of-domain count + system KE (the reference prints these at
    ``particles.cu:770`` and ``utils.cpp:258``)."""
    return {
        "out_of_domain": advect_ops.count_out_of_domain(state.tet_id),
        "kinetic_energy": advect_ops.kinetic_energy(state.vel),
        "active": jnp.sum(state.active.astype(jnp.int32)),
    }
