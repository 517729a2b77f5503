"""Device-side op-level profile of the fused cycle on the bench workload.

Usage: python tools/profile_cycle.py [n_side] [n_particles] [n_cycles] [frac]

Runs the exact headline-bench workload, captures a jax.profiler trace of
one warmed-up run_cycles call, and prints the top ops by total device time
(TPU pid only — wall-clock through the tunnel is untrustworthy,
PERF_NOTES.md methodology).
"""

import glob
import gzip
import json
import os
import sys
import tempfile
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cached_box_mesh(n_side):
    """Box-mesh construction is ~2-4 min at 55^3; cache the host arrays."""
    import pickle

    import jax

    from cudaparticlesfoam_tpu import box_mesh

    import jax.numpy as jnp

    from cudaparticlesfoam_tpu import mesh as meshlib

    path = f"/tmp/boxmesh_{n_side}_v2.pkl"
    if os.path.exists(path):
        with open(path, "rb") as fh:
            host = pickle.load(fh)
        return meshlib.host_to_device(host)
    mesh = box_mesh(n_side, n_side, n_side)
    host = meshlib._mirror_of(mesh)      # box_mesh builds host-side
    with open(path, "wb") as fh:
        pickle.dump(host, fh)
    return mesh


def build(n_side, n_particles):
    from cudaparticlesfoam_tpu import (
        build_grid_locator,
        locate_seeds,
        replace_velocity,
        seed_in_box,
    )
    from cudaparticlesfoam_tpu.state import replace as replace_state

    mesh = _cached_box_mesh(n_side)
    # confined vortex (same field as bench.py)
    from cudaparticlesfoam_tpu.mesh import host_np

    cen = host_np(mesh, "points", np.float64)[host_np(mesh, "tets")].mean(axis=1)
    r = cen[:, :2] - n_side / 2.0
    r2 = (r * r).sum(axis=1) / (n_side / 2.0) ** 2
    omega = (5.2 / n_side) * np.maximum(1.0 - r2, 0.0)
    u = np.zeros_like(cen)
    u[:, 0] = -r[:, 1] * omega
    u[:, 1] = r[:, 0] * omega
    mesh = replace_velocity(mesh, tet_vel=u)
    loc = build_grid_locator(mesh)
    lo, hi = 0.05 * n_side, 0.95 * n_side
    st = seed_in_box(n_particles, (lo,) * 3, (hi,) * 3, method="threefry")
    tet = locate_seeds(mesh, loc, st.pos)
    return mesh, replace_state(st, tet_id=tet)


def parse_trace(tdir):
    files = glob.glob(f"{tdir}/plugins/profile/*/*.trace.json.gz")
    if not files:
        print("no trace file found", file=sys.stderr)
        return
    ev = json.loads(gzip.open(sorted(files)[-1]).read())["traceEvents"]
    # find TPU device pid(s)
    tpu_pids = set()
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            nm = e.get("args", {}).get("name", "")
            if "TPU" in nm and "XLA" not in nm:
                tpu_pids.add(e["pid"])
    # complete events nest: compute SELF time (duration minus children) per
    # op name, per thread, via a stack sweep
    lanes = defaultdict(list)
    meta = {}
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            lanes[(e["pid"], e.get("tid"))].append(e)
            a = e.get("args", {})
            ln = a.get("long_name") or a.get("source") or ""
            if ln and e.get("name") not in meta:
                meta[e.get("name")] = ln
    by_op = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for evs in lanes.values():
        evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []  # [end_ts, name, dur, child_accum]
        for e in evs:
            ts, dur = e["ts"], e.get("dur", 0.0)
            name = e.get("name", "?")
            while stack and stack[-1][0] <= ts:
                _, nm, d, child = stack.pop()
                by_op[nm] += d - child
            if stack:
                stack[-1][3] += dur
            else:
                total += dur
            stack.append([ts + dur, name, dur, 0.0])
            cnt[name] += 1
        while stack:
            _, nm, d, child = stack.pop()
            by_op[nm] += d - child
    print(f"\ndevice total (top-level): {total/1e3:.1f} ms; self-time by op:")
    for name, us in sorted(by_op.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {us/1e3:9.2f} ms  x{cnt[name]:<5d} {name[:110]}")
        ln = meta.get(name, "")
        if ln:
            print(f"               {ln[:200]}")


def main():
    import jax

    from cudaparticlesfoam_tpu import StepConfig, run_cycles

    n_side = int(sys.argv[1]) if len(sys.argv) > 1 else 55
    n_particles = int(float(sys.argv[2])) if len(sys.argv) > 2 else 1_000_000
    n_cycles = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    frac = float(sys.argv[4]) if len(sys.argv) > 4 else 0.125
    rng = sys.argv[5] if len(sys.argv) > 5 else "threefry"
    dt = float(sys.argv[6]) if len(sys.argv) > 6 else 0.05

    t0 = time.perf_counter()
    mesh, st = build(n_side, n_particles)
    print(f"build {time.perf_counter()-t0:.1f}s; {mesh.n_tets} tets", file=sys.stderr)
    cfg = StepConfig(dt=dt, diffusion_coeff=1e-3, walk_capacity_frac=frac,
                     brownian_rng=rng)
    if len(sys.argv) > 7:
        import dataclasses

        if sys.argv[7] == "auto":
            from cudaparticlesfoam_tpu.stepper import suggest_tuning
            cfg = suggest_tuning(mesh, cfg, dt, n_particles=n_particles)
        elif "=" not in sys.argv[7]:
            cfg = dataclasses.replace(cfg, inline_hops=int(sys.argv[7]))
        for kv in sys.argv[7:]:
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
    if cfg.locate_mode == "convex" and mesh.tet_row_cx is None:
        from cudaparticlesfoam_tpu.mesh import with_convex_rows

        mesh = with_convex_rows(mesh)
    print("cfg:", cfg.inline_hops, "hops, frac", cfg.walk_capacity_frac,
          file=sys.stderr)

    t0 = time.perf_counter()
    st2 = run_cycles(mesh, st, cfg, n_cycles)
    jax.block_until_ready(st2.pos)
    print(f"compile+run {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    tdir = tempfile.mkdtemp(prefix="jxtrace_")
    jax.profiler.start_trace(tdir)
    t0 = time.perf_counter()
    st2 = run_cycles(mesh, st2, cfg, n_cycles)
    jax.block_until_ready(st2.pos)
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    print(f"timed run: {wall*1e3:.0f} ms wall for {n_cycles} cycles "
          f"({n_particles*n_cycles/wall/1e6:.1f}M steps/s)", file=sys.stderr)
    parse_trace(tdir)


if __name__ == "__main__":
    main()
