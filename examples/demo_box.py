"""Self-contained demo: particles swirling in the synthetic box fixture.

Run:  python examples/demo_box.py
Writes particle_*.vtu frames into ./demo_out (open in ParaView).
"""

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from cudaparticlesfoam_tpu import (
    StepConfig, box_mesh, build_grid_locator, locate_seeds, replace_velocity,
    run_cycles, seed_in_box, diagnostics,
)
from cudaparticlesfoam_tpu.state import replace as rs
from cudaparticlesfoam_tpu.io import vtu

n_side = 12
mesh = box_mesh(n_side, n_side, n_side)
# swirl field
cen = np.asarray(mesh.points, dtype=np.float64)[np.asarray(mesh.tets)].mean(axis=1)
r = cen[:, :2] - n_side / 2
u = np.zeros_like(cen)
u[:, 0], u[:, 1] = -r[:, 1] * 0.4, r[:, 0] * 0.4
u[:, 2] = 0.2 * np.sin(np.pi * cen[:, 2] / n_side)
mesh = replace_velocity(mesh, tet_vel=u)

loc = build_grid_locator(mesh)
state = seed_in_box(20000, (2, 2, 2), (10, 10, 10))
state = rs(state, tet_id=locate_seeds(mesh, loc, state.pos))

cfg = StepConfig(dt=0.05, diffusion_coeff=2e-3)
os.makedirs("demo_out", exist_ok=True)
for frame in range(40):
    state = run_cycles(mesh, state, cfg, 10)
    vtu.write_particles_vtu(frame, state, out_dir="demo_out")
    d = diagnostics(state)
    print(f"frame {frame}: active={int(d['active'])} KE={float(d['kinetic_energy']):.1f}")
print("wrote demo_out/particle_00*.vtu")
