"""Auxiliary subsystems: checkpoint/resume, analytic duct oracle,
absorbing-boundary patches, dt estimation, diagnostics."""

import numpy as np
import jax.numpy as jnp
import pytest

from cudaparticlesfoam_tpu import (
    StepConfig,
    box_mesh,
    build_grid_locator,
    locate_seeds,
    replace_velocity,
    run_cycles,
    seed_in_box,
)
from cudaparticlesfoam_tpu.mesh import set_boundary_escape
from cudaparticlesfoam_tpu.state import replace as rs, save_particle_file, seed_from_file
from cudaparticlesfoam_tpu.io import checkpoint
from cudaparticlesfoam_tpu.models import duct
from cudaparticlesfoam_tpu.ops.advect import eval_timestep


@pytest.fixture(scope="module")
def box():
    return box_mesh(4, 4, 4)


@pytest.fixture(scope="module")
def grid(box):
    return build_grid_locator(box)


def seeded(box, grid, n=64, seed=0):
    st = seed_in_box(n, (0.5,) * 3, (3.5,) * 3, rng_seed=seed, method="threefry")
    return rs(st, tet_id=locate_seeds(box, grid, st.pos))


# -------------------------------------------------------------- checkpoint

def test_checkpoint_roundtrip_and_resume(tmp_path, box, grid):
    st = seeded(box, grid)
    cfg = StepConfig(dt=0.01, diffusion_coeff=1e-4)
    mid = run_cycles(box, st, cfg, 5)
    path = checkpoint.save(str(tmp_path / "ck.npz"), mid, meta={"t": 1.5})
    back, meta = checkpoint.load(path)
    assert meta["t"] == 1.5
    np.testing.assert_array_equal(np.asarray(back.pos), np.asarray(mid.pos))
    np.testing.assert_array_equal(np.asarray(back.rng_key), np.asarray(mid.rng_key))
    assert int(back.step) == 5
    # resuming reproduces the uninterrupted run exactly (rng keyed by step)
    full = run_cycles(box, st, cfg, 10)
    resumed = run_cycles(box, back, cfg, 5)
    np.testing.assert_allclose(
        np.asarray(resumed.pos), np.asarray(full.pos), atol=1e-14
    )


def test_particle_file_roundtrip(tmp_path, box, grid):
    st = seeded(box, grid, n=16)
    p = str(tmp_path / "seeds.dat")
    save_particle_file(p, st)
    back = seed_from_file(p)
    np.testing.assert_allclose(np.asarray(back.pos), np.asarray(st.pos), rtol=1e-15)
    # the tetID column is honored (particles.cu:150-156 assigns directly):
    # restart is bit-identical, no re-locate needed
    np.testing.assert_array_equal(np.asarray(back.tet_id), np.asarray(st.tet_id))


def test_orbax_checkpoint(tmp_path, box, grid):
    st = seeded(box, grid, n=16)
    path = checkpoint.save_orbax(str(tmp_path / "ckpt"), st)
    back = checkpoint.load_orbax(path)
    np.testing.assert_array_equal(np.asarray(back.pos), np.asarray(st.pos))


# -------------------------------------------------------------- duct oracle

def test_duct_profile_properties():
    # no-slip walls at y=0, y=h and x=+-h/2; max at the centerline
    h = duct.DEFAULT_H
    assert float(duct.duct_velocity(0.0, 0.0)) == pytest.approx(0.0, abs=1e-10)
    assert float(duct.duct_velocity(h / 2, h / 2)) == pytest.approx(0.0, abs=1e-6)
    vc = float(duct.duct_velocity(0.0, h / 2))
    assert vc > 0
    assert vc > float(duct.duct_velocity(0.3 * h, h / 2))


def test_tube_advect_exact_trajectory():
    # velocity depends only on (x, y); motion is purely axial, so the exact
    # trajectory is z(t) = z0 + v_z(x0,y0) * t
    pos = jnp.asarray([[0.01, 0.05, 0.0], [0.0, 0.02, 1.0]])
    v0 = np.asarray(duct.duct_velocity(pos[:, 0], pos[:, 1]))
    out, vel = duct.tube_advect(pos, dt=1e-3, n_steps=100)
    out = np.asarray(out)
    np.testing.assert_allclose(out[:, 2], np.asarray(pos)[:, 2] + v0 * 0.1, rtol=1e-10)
    np.testing.assert_allclose(out[:, :2], np.asarray(pos)[:, :2], atol=0)


# -------------------------------------------------------------- escape BCs

def test_escape_patches(box, grid):
    # outward field; mark ALL boundary faces absorbing -> everyone dies at
    # the wall instead of bouncing forever
    pts = np.asarray(box.points, dtype=np.float64)
    cen = pts[np.asarray(box.tets)].mean(axis=1)
    outward = cen - 2.0
    outward /= np.linalg.norm(outward, axis=1, keepdims=True) + 1e-12
    m = replace_velocity(box, tet_vel=outward * 2.0)
    m = set_boundary_escape(m, [0])  # all bd faces have patch tag 0
    st = seeded(m, grid)
    for engine in ("simple", "cached"):
        cfg = StepConfig(dt=0.05, use_brownian=False, engine=engine)
        out = run_cycles(m, st, cfg, 100)
        act = np.asarray(out.active)
        assert not act.any(), engine
        # particles froze once absorbed (pos within a step of the domain)
        pos = np.asarray(out.pos)
        assert (pos > -0.2).all() and (pos < 4.2).all()


def test_escape_subset_of_patches(box, grid):
    # escape only where the patch tag matches; tag 0 faces still reflect if
    # we mark a non-existent tag
    m = set_boundary_escape(box, [99])
    assert not np.asarray(m.bd_escape).any()
    m2 = set_boundary_escape(box, [0])
    assert np.asarray(m2.bd_escape).all()


# -------------------------------------------------------------- dt estimate

def test_eval_timestep(box):
    m = replace_velocity(box, tet_vel=np.tile([2.0, 0.0, 0.0], (box.n_tets, 1)))
    dt_min, dt_max = eval_timestep(m, diffusion_coeff=0.0)
    # unit cells split into tets; velocity constraint dt <= 0.5 h / |u|
    assert 0.0 < float(dt_min) <= 0.5 * 1.0 / 2.0 + 1e-9
    assert float(dt_max) >= float(dt_min)


def test_injection_slot_reuse(box, grid):
    from cudaparticlesfoam_tpu.mesh import set_boundary_escape
    from cudaparticlesfoam_tpu.state import inject
    from cudaparticlesfoam_tpu import run_cycles

    # absorbing walls + outward flow: particles die; injection refills
    pts = np.asarray(box.points, dtype=np.float64)
    cen = pts[np.asarray(box.tets)].mean(axis=1)
    outward = cen - 2.0
    outward /= np.linalg.norm(outward, axis=1, keepdims=True) + 1e-12
    m = replace_velocity(box, tet_vel=outward * 2.0)
    m = set_boundary_escape(m, [0])
    st = seeded(m, grid, n=128)
    cfg = StepConfig(dt=0.05, use_brownian=False)
    out = run_cycles(m, st, cfg, 100)
    n_dead = int((~np.asarray(out.active)).sum())
    assert n_dead == 128  # all absorbed
    out2, n_inj = inject(out, m, grid, (1.5,) * 3, (2.5,) * 3, 50)
    assert n_inj == 50
    assert int(np.asarray(out2.active).sum()) == 50
    tet = np.asarray(out2.tet_id)[np.asarray(out2.active)]
    assert (tet >= 0).all()
    # injected particles advect normally
    out3 = run_cycles(m, out2, cfg, 5)
    assert int(np.asarray(out3.active).sum()) == 50


def test_inject_device_matches_host(box, grid):
    """The jit-friendly device-side injection (state.inject_device) is
    bit-identical to the host path when the dead-slot count covers the
    burst and the grid resolves every seed."""
    import jax

    from cudaparticlesfoam_tpu.mesh import set_boundary_escape
    from cudaparticlesfoam_tpu.state import inject, inject_device
    from cudaparticlesfoam_tpu import run_cycles

    pts = np.asarray(box.points, dtype=np.float64)
    cen = pts[np.asarray(box.tets)].mean(axis=1)
    outward = cen - 2.0
    outward /= np.linalg.norm(outward, axis=1, keepdims=True) + 1e-12
    m = replace_velocity(box, tet_vel=outward * 2.0)
    m = set_boundary_escape(m, [0])
    st = seeded(m, grid, n=128)
    cfg = StepConfig(dt=0.05, use_brownian=False)
    out = run_cycles(m, st, cfg, 60)
    assert int((~np.asarray(out.active)).sum()) >= 50
    a, n_inj = inject(out, m, grid, (1.5,) * 3, (2.5,) * 3, 40)
    b = jax.jit(
        lambda s: inject_device(s, m, grid, (1.5,) * 3, (2.5,) * 3, 40)
    )(out)
    assert n_inj == 40
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
    np.testing.assert_array_equal(np.asarray(a.tet_id), np.asarray(b.tet_id))
    np.testing.assert_array_equal(np.asarray(a.active), np.asarray(b.active))
    np.testing.assert_array_equal(np.asarray(a.vel), np.asarray(b.vel))
    # burst larger than the dead pool: extra draws are dropped, alive
    # lanes untouched
    c = inject_device(out, m, grid, (1.5,) * 3, (2.5,) * 3, 128)
    assert int(np.asarray(c.active).sum()) <= 128
    alive0 = np.asarray(out.active)
    np.testing.assert_array_equal(
        np.asarray(c.pos)[alive0], np.asarray(out.pos)[alive0]
    )


def test_escape_patches_convex_mode(box, grid):
    """Absorbing patches must work in ConvexPoly locate mode too: the
    convex reflector (ops/convex.convex_reflect) deactivates on escape
    faces instead of specularly reflecting, matching the bary path."""
    from cudaparticlesfoam_tpu.mesh import with_convex_rows

    pts = np.asarray(box.points, dtype=np.float64)
    cen = pts[np.asarray(box.tets)].mean(axis=1)
    outward = cen - 2.0
    outward /= np.linalg.norm(outward, axis=1, keepdims=True) + 1e-12
    m = replace_velocity(box, tet_vel=outward * 2.0)
    m = with_convex_rows(m)
    m = set_boundary_escape(m, [0])      # every boundary face absorbs
    st = seeded(m, grid)
    for engine in ("simple", "cached"):
        cfg = StepConfig(dt=0.05, use_brownian=False, engine=engine,
                         locate_mode="convex")
        out = run_cycles(m, st, cfg, 100)
        act = np.asarray(out.active)
        assert not act.any(), engine
        assert (np.asarray(out.tet_id) < 0).all(), engine
        # absorbed at (or within a couple of dust-recovery steps of) the
        # wall — tolerance-dust lanes park <=2 sub-steps outside before
        # the barycentric safety net deactivates them
        pos = np.asarray(out.pos)
        assert (pos > -0.45).all() and (pos < 4.45).all()
    # and with NO escape faces the same field keeps everyone alive
    m2 = with_convex_rows(replace_velocity(box, tet_vel=outward * 2.0))
    out2 = run_cycles(
        m2, seeded(m2, grid),
        StepConfig(dt=0.05, use_brownian=False, locate_mode="convex"), 100,
    )
    assert np.asarray(out2.active).all()
