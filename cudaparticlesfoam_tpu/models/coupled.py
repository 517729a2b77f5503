"""Coupled / transient particle tracking drivers.

Two modes mirroring ``cudaParticlesPimpleFoam``
(``applications/cudaParticlesPimpleFoam/cudaParticlesPimpleFoam.C:131-192``):

* ``run_replay`` — re-reads recorded ``U`` snapshots from the case's time
  directories and advances particles between them (BASELINE.json config 2:
  "transient uncoupled").  This reproduces the reference's coupled particle
  behavior without re-running the flow solve: each Eulerian interval gets
  ``nCycles = ceil(deltaT/dt)`` sub-steps with the fresh field
  (``src/advect.H:36-83``), and the global ``step`` counter persists across
  intervals exactly like the reference's file numbering.

* ``run_coupled`` — drives the native JAX incompressible flow solver
  (:mod:`.pimple`) and advects particles after every Eulerian step, the
  full equivalent of the reference solver.
"""

from __future__ import annotations

import time

import jax

from ..io import vtu
from ..stepper import n_cycles_for, run_cycles_donated, suggest_tuning
from . import case as caselib


def _advance_interval(case, state, cfg, pcfg, delta_t, step0, out_dir,
                      write_output, log, writer=None, engine=None):
    """One Eulerian interval: sub-cycle with VTU writes on the reference's
    step schedule (``advect.H:86-184``).  Returns (state, next step0).

    With ``engine`` set, sub-steps run on the multi-chip
    :class:`..parallel.auto.ParticleEngine` (DP or spatially partitioned)
    instead of the single-device fused stepper — the scale-out inversion
    of the reference's particles-on-master-GPU-only design
    (``initCuda.H:322``)."""
    n_cycles, cycle_dt = n_cycles_for(delta_t, pcfg.dt)
    log(f"dtE:{delta_t} dtL: {pcfg.dt}")
    log(f"nCycles: {n_cycles} cycleDt: {cycle_dt}")
    if engine is not None:
        engine.update_from_case(case)    # fresh U into the engine's tables
    i = 0
    while i < n_cycles:
        step = step0 + i
        if step % pcfg.save_interval == 0:
            chunk = 1
        else:
            next_write = ((step // pcfg.save_interval) + 1) * pcfg.save_interval
            chunk = min(next_write - step0, n_cycles) - i
        if engine is not None:
            engine.advance(chunk, cycle_dt)
        else:
            state = run_cycles_donated(case.tet_mesh, state, cfg, chunk, cycle_dt)
        prev = step
        i += chunk
        if write_output and prev % pcfg.save_interval == 0:
            if engine is not None:
                state = engine.snapshot()
            if writer is not None:
                writer.write(prev + 1, state, out_dir=out_dir, verbose=True)
            else:
                vtu.write_particles_vtu(
                    prev + 1, state, out_dir=out_dir, verbose=True
                )
    if engine is not None:
        state = engine.snapshot()
    return state, step0 + n_cycles


def _make_engine(case, state, cfg, devices, strategy, log):
    """ParticleEngine when multi-chip execution is requested (None keeps
    the plain single-device fast path)."""
    n_dev = devices if devices is not None else len(jax.devices())
    if strategy == "auto" and n_dev <= 1 and devices is None:
        return None
    from ..parallel.auto import ParticleEngine

    return ParticleEngine(
        case.tet_mesh, state, cfg, devices=n_dev, strategy=strategy, log=log
    )


def run_replay(
    case_dir: str,
    out_dir: str | None = None,
    write_output: bool = True,
    dtype=None,
    log=print,
    devices: int | None = None,
    strategy: str = "auto",
):
    """Advance particles over the case's recorded U snapshots."""
    case = caselib.load_case(case_dir, dtype=dtype, log=log)
    pcfg = case.particles
    out_dir = out_dir or case_dir
    cfg = suggest_tuning(case.tet_mesh, pcfg.step_config(),
                     n_particles=pcfg.num_particles)
    if cfg.locate_mode == "convex":
        from ..mesh import with_convex_rows

        case.tet_mesh = with_convex_rows(case.tet_mesh)

    tdirs = caselib.time_dirs(case_dir)
    # start at the first snapshot; advance between consecutive snapshots
    state = caselib.init_particles(case, log=log)
    engine = _make_engine(case, state, cfg, devices, strategy, log)
    writer = vtu.AsyncVTUWriter()
    if write_output:
        writer.write(0, state, out_dir=out_dir, verbose=True)

    step0 = 0
    wall0 = time.perf_counter()
    n_total = 0
    for (t_prev, _), (t_next, d_next) in zip(tdirs[:-1], tdirs[1:]):
        # an interval replays only if the particle window was already open at
        # its start: before that, advect.H:33 would have been a no-op every
        # Eulerian step, so the particles idle at their seeds.
        if t_prev < pcfg.start_time - 1e-12 or t_next > pcfg.end_time + 1e-12:
            continue
        u = caselib.read_u_snapshot(case_dir, d_next, case.poly.n_cells)
        if u is None:
            continue
        case.update_velocity(u)  # advect.H:44-83
        delta_t = t_next - t_prev
        state, step0 = _advance_interval(
            case, state, cfg, pcfg, delta_t, step0, out_dir, write_output,
            log, writer=writer, engine=engine,
        )
        n_total = step0
    jax.block_until_ready(state.pos)
    writer.close()
    wall = time.perf_counter() - wall0
    if n_total:
        rate = state.n_particles * n_total / max(wall, 1e-12)
        log(
            f"#adv: Simulation RunTime={wall*1e3:.1f} ms "
            f"({rate/1e6:.2f}M particle-steps/s)"
        )
    return case, state, {"cycles": n_total, "wall_s": wall}


def run_coupled(
    case_dir: str,
    out_dir: str | None = None,
    write_output: bool = True,
    dtype=None,
    log=print,
    n_steps: int | None = None,
    flow_devices: int | None = None,
    devices: int | None = None,
    strategy: str = "auto",
):
    """Full coupled run: native PIMPLE flow step + per-step advection.

    ``flow_devices=N`` runs the fluid solve domain-decomposed over an
    N-device mesh (shard_map + ppermute halo exchange — the reference's
    ``mpirun -np 4 ... -parallel`` analog, Allrun-parallel:10-11);
    ``devices``/``strategy`` scale the PARTICLE side (DP or spatial
    partitioning) like the uncoupled driver — together they replace the
    reference's everything-gathered-to-one-GPU layout
    (``initCuda.H:209-322``).
    """
    from . import pimple as pimplelib

    case = caselib.load_case(case_dir, dtype=dtype, log=log)
    pcfg = case.particles
    ctrl = case.control
    out_dir = out_dir or case_dir
    cfg = suggest_tuning(case.tet_mesh, pcfg.step_config(),
                     n_particles=pcfg.num_particles)
    if cfg.locate_mode == "convex":
        from ..mesh import with_convex_rows

        case.tet_mesh = with_convex_rows(case.tet_mesh)

    if flow_devices and flow_devices > 1:
        from ..parallel.flowshard import ShardedFlowSolver

        flow = ShardedFlowSolver(case, flow_devices, log=log)
    else:
        flow = pimplelib.FlowSolver.from_case(case, log=log)
    state = caselib.init_particles(case, log=log)
    engine = _make_engine(case, state, cfg, devices, strategy, log)
    writer = vtu.AsyncVTUWriter()
    if write_output:
        writer.write(0, state, out_dir=out_dir, verbose=True)

    # function objects from controlDict (probes / scalarTransport,
    # TJunction/system/controlDict:53-133)
    from ..io import foamfile
    from . import functions as fo

    fns = foamfile.read(
        __import__("os").path.join(case_dir, "system", "controlDict")
    ).get("functions", {})
    probes = None
    scalar = None
    if isinstance(fns, dict):
        for name, spec in fns.items():
            if not isinstance(spec, dict):
                continue
            if spec.get("type") == "probes" and "probeLocations" in spec:
                probes = fo.Probes(flow.m, spec["probeLocations"], name=str(name))
                log(f"#fo: probes at {len(spec['probeLocations'])} locations")
            if spec.get("type") == "scalarTransport":
                field = str(spec.get("field", "s"))
                su = 0.0
                try:
                    src = spec["fvOptions"]["unitySource"][
                        "scalarSemiImplicitSourceCoeffs"
                    ]["injectionRateSuSp"][field]
                    su = float(src[0])
                except (KeyError, TypeError, IndexError):
                    pass
                scalar = fo.ScalarTransport(
                    case_dir, flow.m, field=field, diffusivity=flow.cfg.nu,
                    source_su=su,
                )
                log(f"#fo: scalarTransport '{field}' (Su={su})")

    t = case.time_value
    step0 = 0
    k = 0
    # runTime.write() schedule (cudaParticlesPimpleFoam.C:189): timeStep
    # counts Eulerian steps; (adjustable)runTime writes every writeInterval
    # seconds, with adjustableRunTime trimming dt to land on write times
    run_time_write = ctrl.write_control in (
        "runTime", "adjustableRunTime", "adjustable", "clockTime",
    )
    next_write_t = t + ctrl.write_interval if run_time_write else None
    while t < ctrl.end_time - 1e-12:
        dt_e = flow.stable_dt(ctrl) if ctrl.adjust_time_step else ctrl.delta_t
        dt_e = min(dt_e, ctrl.end_time - t)
        if ctrl.write_control in ("adjustableRunTime", "adjustable"):
            dt_e = min(dt_e, max(next_write_t - t, 1e-12))
        flow.advance(dt_e)
        if getattr(flow, "dyn", None) is not None:
            # moved mesh: refresh the particle walk tables on device
            # (topology is motion-invariant; geometry columns recompute)
            from .. import mesh as meshlib

            case.tet_mesh = meshlib.refresh_geometry(
                case.tet_mesh, flow.dyn.tet_vertices(flow.m)
            )
            if engine is not None:
                engine.update_from_case(case, geometry=True)
        t += dt_e
        k += 1
        log(f"Time = {t:g}  (deltaT {dt_e:g})")
        if write_output:
            if run_time_write:
                write_now = t >= next_write_t - 1e-9
                if write_now:
                    next_write_t += ctrl.write_interval
            else:
                write_now = ctrl.write_interval >= 1 and (
                    k % int(ctrl.write_interval) == 0
                )
            if write_now:
                from . import simple as simplelib
                from ..io import polymesh as pmio

                tdir = simplelib.write_solution(
                    out_dir, f"{t:g}", flow.m, flow.state,
                    binary=ctrl.write_format == "binary",
                    compress=ctrl.write_compression,
                )
                if getattr(flow, "kes", None) is not None:
                    # closure fields (k + epsilon or omega) in the time dir
                    # so latestTime restarts resume the closure state too
                    import numpy as _np
                    import os as _os

                    bf = {nm: {"type": "calculated"}
                          for nm, *_ in flow.m.patch_slices}
                    if hasattr(flow.kes, "eps"):
                        fields = (("k", flow.kes.k, -2),
                                  ("epsilon", flow.kes.eps, -3))
                    else:
                        # kOmegaSST: omega has dimensions [0 0 -1]
                        fields = (("k", flow.kes.k, -2),
                                  ("omega", flow.kes.omega, None))
                    for fname, vals, tdim in fields:
                        dims = (
                            (0, 0, -1, 0, 0, 0, 0) if tdim is None
                            else (0, 2, tdim, 0, 0, 0, 0)
                        )
                        pmio.write_field(
                            _os.path.join(tdir, fname), fname,
                            _np.asarray(vals),
                            dimensions=dims,
                            boundary_field=bf,
                            binary=ctrl.write_format == "binary",
                            compress=ctrl.write_compression,
                        )
                simplelib.purge_old_times(out_dir, ctrl.purge_write)
        if probes is not None:
            probes.sample(t, {"p": flow.state.p, "U": flow.state.u})
        if scalar is not None:
            scalar.advance(flow.state.flux, dt_e)
        if pcfg.start_time <= t <= pcfg.end_time:
            case.update_velocity(flow.cell_velocity())
            state, step0 = _advance_interval(
                case, state, cfg, pcfg, dt_e, step0, out_dir, write_output,
                log, writer=writer, engine=engine,
            )
        if n_steps is not None and k >= n_steps:
            break
    writer.close()
    if write_output and probes is not None:
        probes.write(out_dir)
    if write_output and scalar is not None:
        scalar.write(out_dir, f"{t:g}")
    return case, state, {"cycles": step0, "time": t}
