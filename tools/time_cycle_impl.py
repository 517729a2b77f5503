"""time_cycle with an engine_impl override: measure auto vs pallas_packed.

Usage: python tools/time_cycle_impl.py [impl] [n_side] [n_particles] [n_cycles]
                                       [cycle_chunks] [key=value ...]

Trailing key=value pairs override any StepConfig field (ints/floats/str
auto-coerced), e.g. ``hop_compact=4 brownian_rng=rbg_kernel``.
"""

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from profile_cycle import build

    from cudaparticlesfoam_tpu import StepConfig, run_cycles
    from cudaparticlesfoam_tpu.stepper import suggest_tuning

    impl = sys.argv[1] if len(sys.argv) > 1 else "pallas_packed"
    n_side = int(sys.argv[2]) if len(sys.argv) > 2 else 55
    n_particles = int(float(sys.argv[3])) if len(sys.argv) > 3 else 1_000_000
    n_cycles = int(sys.argv[4]) if len(sys.argv) > 4 else 200

    mesh, st = build(n_side, n_particles)
    cfg = suggest_tuning(
        mesh, StepConfig(dt=0.05, diffusion_coeff=1e-3, brownian_rng="rbg"),
        0.05, n_particles=n_particles,
    )
    cfg = dataclasses.replace(cfg, engine_impl=impl)
    if len(sys.argv) > 5 and "=" not in sys.argv[5]:
        cfg = dataclasses.replace(cfg, cycle_chunks=int(sys.argv[5]))
    for kv in sys.argv[5:]:
        if "=" not in kv:
            continue
        k, v = kv.split("=", 1)
        cur = getattr(cfg, k)
        if isinstance(cur, bool):
            v = v.lower() in ("1", "true", "yes")
        elif isinstance(cur, int):
            v = int(v)
        elif isinstance(cur, float):
            v = float(v)
        cfg = dataclasses.replace(cfg, **{k: v})
    print(
        f"impl={impl} inline_hops={cfg.inline_hops} "
        f"walk_capacity_frac={cfg.walk_capacity_frac} "
        f"cycle_chunks={cfg.cycle_chunks} hop_compact={cfg.hop_compact} "
        f"rng={cfg.brownian_rng}", file=sys.stderr,
    )
    t0 = time.perf_counter()
    out = run_cycles(mesh, st, cfg, n_cycles)
    jax.block_until_ready(out.pos)
    print(f"compile+first: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = run_cycles(mesh, st, cfg, n_cycles)
        jax.block_until_ready(out.pos)
        best = min(best, time.perf_counter() - t0)
    ms = best / n_cycles * 1e3
    act = int(np.asarray(out.active).sum())
    ood = int((np.asarray(out.tet_id) < 0).sum())
    print(
        f"{ms:.2f} ms/cycle  {n_particles*n_cycles/best/1e6:.1f}M steps/s  "
        f"active={act} out={ood}"
    )


if __name__ == "__main__":
    main()
