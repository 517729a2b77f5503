"""Headline benchmark: particle-steps/sec on one chip.

Workload mirrors the north-star config (BASELINE.md): ~1M-tet mesh
(55^3 hexes x 6 tets, the reference's own box fixture geometry,
``HostTetMesh.h:62-144``), 1M particles, full physics per sub-step
(advect + Brownian + tet-walk relocation + specular wall reflection + move),
float32, no I/O in the timed region.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the ratio against the 100M particle-steps/sec/chip
north-star target (the reference repo publishes no numbers of its own).
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    from cudaparticlesfoam_tpu import (
        StepConfig,
        box_mesh,
        build_grid_locator,
        locate_seeds,
        seed_in_box,
    )
    from cudaparticlesfoam_tpu.state import replace as replace_state
    from cudaparticlesfoam_tpu.parallel import sharding

    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 55
    n_particles = int(float(sys.argv[2])) if len(sys.argv) > 2 else 1_000_000
    n_cycles = int(sys.argv[3]) if len(sys.argv) > 3 else 200

    t0 = time.perf_counter()
    mesh = box_mesh(n_side, n_side, n_side)
    # recirculating field: solid-body rotation + axial drift — particles
    # cross cells continuously without piling up on walls (the box
    # fixture's radial field pins everyone against the boundary, which
    # benchmarks the reflection stress path rather than advection)
    cen = np.asarray(mesh.points, dtype=np.float64)[np.asarray(mesh.tets)].mean(axis=1)
    r = cen[:, :2] - n_side / 2.0
    u = np.zeros_like(cen)
    u[:, 0] = -r[:, 1] * (2.0 / n_side)
    u[:, 1] = r[:, 0] * (2.0 / n_side)
    u[:, 2] = 0.0
    from cudaparticlesfoam_tpu import replace_velocity

    mesh = replace_velocity(mesh, tet_vel=u)
    log(f"mesh: {mesh.n_tets} tets, {mesh.n_points} verts "
        f"({time.perf_counter()-t0:.1f}s build)")
    loc = build_grid_locator(mesh)

    lo = 0.05 * n_side
    hi = 0.95 * n_side
    st = seed_in_box(n_particles, (lo, lo, lo), (hi, hi, hi), method="threefry")
    tet = locate_seeds(mesh, loc, st.pos)
    st = replace_state(st, tet_id=tet)
    log(f"seeded {n_particles} particles, "
        f"{int(np.sum(np.asarray(tet) < 0))} out of domain")

    # dt: speeds ~O(1) on unit cells -> a few percent of a cell per
    # sub-step (the tutorial-scale CFL regime)
    frac = 0.125 if n_particles <= 4_000_000 else 0.0625
    cfg = StepConfig(dt=0.05, diffusion_coeff=1e-3, walk_capacity_frac=frac)

    if len(jax.devices()) > 1:
        dmesh, rmesh, sst = sharding.distribute(mesh, st)
        run = sharding.run_cycles_sharded
    else:
        # single chip: plain jit (the trivial 1-device sharding machinery
        # measured ~20% dispatch overhead)
        from cudaparticlesfoam_tpu import run_cycles

        rmesh, sst = mesh, st
        run = run_cycles

    # warm up THE SAME program shape that is timed (each n_cycles value is
    # its own XLA program; first execution includes its compile)
    t0 = time.perf_counter()
    sst = run(rmesh, sst, cfg, n_cycles)
    jax.block_until_ready(sst.pos)
    log(f"compile+first batch: {time.perf_counter()-t0:.1f}s")

    t0 = time.perf_counter()
    sst = run(rmesh, sst, cfg, n_cycles)
    jax.block_until_ready(sst.pos)
    dt_wall = time.perf_counter() - t0

    steps_per_sec = n_particles * n_cycles / dt_wall
    d = sharding.global_diagnostics(sst)
    log(f"{n_cycles} cycles in {dt_wall:.2f}s; active={int(d['active'])} "
        f"out={int(d['out_of_domain'])}")

    north_star = 100e6  # BASELINE.json: >=100M particle-steps/sec/chip
    print(
        json.dumps(
            {
                "metric": "particle_steps_per_sec_per_chip",
                "value": round(steps_per_sec, 1),
                "unit": "particle-steps/s",
                "vs_baseline": round(steps_per_sec / north_star, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
