"""Square-duct analytic oracle (reference particles.cu:451-519): the
exact Navier-Stokes solution as an end-to-end trajectory-error check for
the production particle engine."""

import math

import numpy as np
import jax.numpy as jnp

from cudaparticlesfoam_tpu.ops import duct


def test_profile_properties():
    """No-slip at all four walls, maximum at the centre, positive flow for
    a negative pressure gradient, symmetry in x."""
    h = duct.TUBE_H
    y = np.linspace(0.0, h, 41)
    x0 = np.zeros_like(y)
    vz_wall_l = duct.square_duct_velocity(np.full_like(y, -h / 2), y)
    vz_wall_r = duct.square_duct_velocity(np.full_like(y, h / 2), y)
    assert np.abs(vz_wall_l).max() < 1e-9
    assert np.abs(vz_wall_r).max() < 1e-9
    vz_b = duct.square_duct_velocity(x0, np.zeros_like(y))
    assert np.abs(vz_b).max() < 1e-9
    centre = duct.square_duct_velocity(np.array([0.0]), np.array([h / 2]))[0]
    assert centre > 0.0
    prof = duct.square_duct_velocity(x0, y)
    assert prof.max() == centre
    # x symmetry
    xs = np.linspace(-h / 2, h / 2, 21)
    v = duct.square_duct_velocity(xs, np.full_like(xs, h / 2))
    np.testing.assert_allclose(v, v[::-1], atol=1e-12)


def test_flow_rate_matches_reference_config():
    """Integrating the profile over the cross-section reproduces the flow
    rate the reference documents for its hardcoded config
    (Q = 0.000536 cm^3/s, particles.cu:505)."""
    h = duct.TUBE_H
    n = 400
    x = (np.arange(n) + 0.5) / n * h - h / 2
    y = (np.arange(n) + 0.5) / n * h
    X, Y = np.meshgrid(x, y)
    vz = duct.square_duct_velocity(X, Y)
    q = vz.mean() * h * h
    np.testing.assert_allclose(q, duct.TUBE_Q, rtol=2e-3)


def test_tube_advect_semantics():
    """particleTubeAdvect: straight-line z motion at the local analytic
    speed; dead lanes (tet < 0) freeze and deactivate."""
    pos = jnp.asarray([[0.0, duct.TUBE_H / 2, 0.0],
                       [0.02, 0.03, 1.0],
                       [0.0, duct.TUBE_H / 2, 2.0]])
    vel = jnp.zeros((3, 3))
    tet = jnp.asarray([0, 5, -1])
    act = jnp.asarray([True, True, True])
    dt = 0.5
    p1, v1, a1 = duct.tube_advect(pos, vel, tet, act, dt)
    vz0 = float(duct.square_duct_velocity(np.array([0.0]),
                                          np.array([duct.TUBE_H / 2]))[0])
    np.testing.assert_allclose(np.asarray(p1)[0], [0.0, duct.TUBE_H / 2,
                                                   dt * vz0], rtol=1e-6)
    assert not bool(a1[2])
    np.testing.assert_allclose(np.asarray(p1)[2], [0.0, duct.TUBE_H / 2, 2.0])
    # x, y never change
    np.testing.assert_allclose(np.asarray(p1)[:2, :2], np.asarray(pos)[:2, :2])


def test_engine_trajectory_error_vs_analytic():
    """End-to-end oracle: sample the analytic profile onto a duct tet mesh
    (Pk vertex velocities), advect with the PRODUCTION engine, and compare
    against the exact trajectory.  Since vz is z-invariant and the motion
    is pure z, the exact displacement after k steps is k*dt*vz(x0, y0);
    the engine's deviation is pure P1-interpolation error, which for the
    smooth profile on an N^2 cross-section is O(1/N^2)."""
    import dataclasses

    from cudaparticlesfoam_tpu import StepConfig, box_mesh, run_cycles
    from cudaparticlesfoam_tpu import state as statelib
    from cudaparticlesfoam_tpu.mesh import replace_velocity, with_pk_rows
    from cudaparticlesfoam_tpu.ops import locate as locate_ops

    h = duct.TUBE_H
    N, NZ = 16, 4
    mesh = box_mesh(N, N, NZ)
    # map the box [0,N]x[0,N]x[0,NZ] onto the duct cross-section x h length
    pts = np.asarray(mesh.points, dtype=np.float64).copy()
    pts[:, 0] = pts[:, 0] / N * h - h / 2
    pts[:, 1] = pts[:, 1] / N * h
    pts[:, 2] = pts[:, 2] / NZ * 0.5
    from cudaparticlesfoam_tpu.mesh import from_arrays

    vz_pts = duct.square_duct_velocity(pts[:, 0], pts[:, 1])
    vert_vel = np.stack([np.zeros_like(vz_pts), np.zeros_like(vz_pts),
                         vz_pts], axis=1)
    mesh = from_arrays(pts, np.asarray(mesh.tets), vert_vel=vert_vel)
    mesh = with_pk_rows(mesh)

    rng = np.random.default_rng(11)
    n = 4000
    pos0 = np.stack([
        rng.uniform(-0.4 * h, 0.4 * h, n),
        rng.uniform(0.1 * h, 0.9 * h, n),
        rng.uniform(0.05, 0.1, n),
    ], axis=1)
    st = statelib.make_state(jnp.asarray(pos0))
    loc = locate_ops.build_grid_locator(mesh)
    st = dataclasses.replace(
        st, tet_id=locate_ops.locate_seeds(mesh, loc, st.pos)
    )
    assert int(jnp.sum(st.tet_id < 0)) == 0

    vmax = float(duct.square_duct_velocity(np.array([0.0]),
                                           np.array([h / 2]))[0])
    dt = 0.01 / vmax        # ~0.01 cm per step at the centreline
    k = 25
    dz_exact = k * dt * duct.square_duct_velocity(pos0[:, 0], pos0[:, 1])
    for integ in ("euler", "rk4"):
        # rk4 resolves to the cached engine too (round 5, fused.py
        # _stage_velocity); vz is z-invariant so the stage blends agree
        # with euler up to interp error — the oracle bounds BOTH
        cfg = StepConfig(dt=dt, use_brownian=False,
                         velocity_interp="VertexVelocity", integrator=integ)
        assert cfg.resolved_engine() == "cached"
        out = run_cycles(mesh, st, cfg, k)
        assert int(jnp.sum(out.tet_id < 0)) == 0

        dz = np.asarray(out.pos)[:, 2] - pos0[:, 2]
        # interpolation tolerance: P1 on a 16x16 cross-section of a smooth
        # profile -> relative L_inf of a few percent near walls, much
        # better in the bulk
        rel = np.abs(dz - dz_exact) / (k * dt * vmax)
        assert rel.max() < 0.02        # measured 0.0142 (wall-adjacent)
        assert np.median(rel) < 0.006  # measured 0.0043
        # x, y untouched by the pure-z field
        np.testing.assert_allclose(np.asarray(out.pos)[:, :2], pos0[:, :2],
                                   atol=1e-7)
