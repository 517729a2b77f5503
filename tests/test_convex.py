"""ConvexPoly locate mode (query/ConvexQuery.cu semantics) vs the
barycentric walk: both algorithms must produce identical trajectories."""

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
from cudaparticlesfoam_tpu.ops import convex
from cudaparticlesfoam_tpu.state import replace as rs


@pytest.fixture(scope="module")
def setup():
    mesh = box_mesh(6, 6, 6)
    loc = build_grid_locator(mesh)
    pts = np.asarray(mesh.points, dtype=np.float64)
    cen = pts[np.asarray(mesh.tets)].mean(axis=1)
    outward = cen - 3.0
    outward /= np.linalg.norm(outward, axis=1, keepdims=True) + 1e-12
    mesh = replace_velocity(mesh, tet_vel=outward * 1.5)
    st = seed_in_box(256, (0.5,) * 3, (5.5,) * 3, method="threefry")
    st = rs(st, tet_id=locate_seeds(mesh, loc, st.pos))
    return mesh, st


def test_trace_segment_basic(setup):
    mesh, st = setup
    # zero displacement: stays put, same tet
    code, stop_tet, p_cross, hit_face = convex.trace_segment(
        mesh, st.pos, jnp.zeros_like(st.pos), st.tet_id
    )
    np.testing.assert_array_equal(np.asarray(code), np.asarray(st.tet_id))
    # long displacement out of the domain: wall code -(startTet+1)
    disp = jnp.tile(jnp.asarray([[100.0, 0.0, 0.0]]), (st.n_particles, 1))
    code, stop_tet, p_cross, hit_face = convex.trace_segment(mesh, st.pos, disp, st.tet_id)
    code = np.asarray(code)
    assert (code < 0).all()
    np.testing.assert_array_equal(-code - 1, np.asarray(st.tet_id))
    # hit points on the x=6 wall
    np.testing.assert_allclose(np.asarray(p_cross)[:, 0], 6.0, atol=1e-9)


def test_convex_matches_bary(setup):
    mesh, st = setup
    a = run_cycles(
        mesh, st,
        StepConfig(dt=0.08, use_brownian=False, locate_mode="bary", engine="simple"),
        100,
    )
    b = run_cycles(
        mesh, st, StepConfig(dt=0.08, use_brownian=False, locate_mode="convex"), 100
    )
    np.testing.assert_array_equal(np.asarray(a.tet_id), np.asarray(b.tet_id))
    np.testing.assert_allclose(np.asarray(a.pos), np.asarray(b.pos), atol=1e-12)
    assert np.asarray(b.active).all()


def test_convex_with_brownian_containment(setup):
    mesh, st = setup
    out = run_cycles(
        mesh, st,
        StepConfig(dt=0.08, diffusion_coeff=1e-3, locate_mode="convex"),
        100,
    )
    pos = np.asarray(out.pos)
    # the convex tracer tolerates sub-cell transient excursions at corner
    # reflections (the reference shares this: its testNStracing replays
    # exactly such historical failure cases, ConvexQuery.cu:498-569);
    # particles must stay assigned and within a small dust tolerance
    assert (pos >= -1e-3).all() and (pos <= 6.0 + 1e-3).all()
    assert (np.asarray(out.tet_id) >= 0).all()
    assert np.asarray(out.active).all()


def test_packed_rows_identical(setup):
    """with_convex_rows collapses the tracer's per-hop gathers into one;
    results must be bit-identical to the unpacked tables."""
    from cudaparticlesfoam_tpu.mesh import with_convex_rows

    mesh, st = setup
    cfg = StepConfig(dt=0.08, use_brownian=False, locate_mode="convex",
                     engine="simple")
    a = run_cycles(mesh, st, cfg, 60)
    b = run_cycles(with_convex_rows(mesh), st, cfg, 60)
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))
    np.testing.assert_array_equal(np.asarray(a.tet_id), np.asarray(b.tet_id))
    np.testing.assert_array_equal(np.asarray(a.vel), np.asarray(b.vel))


def test_cached_convex_matches_simple(setup):
    """Phase-1 cached ConvexPoly engine (inline exit classification +
    block-compacted simple-path resolution) reproduces the simple engine
    exactly: pure advection with wall reflection, and with Brownian."""
    from cudaparticlesfoam_tpu.mesh import with_convex_rows

    mesh, st = setup
    mesh_cx = with_convex_rows(mesh)
    for kw in (dict(use_brownian=False), dict(diffusion_coeff=1e-3)):
        a = run_cycles(
            mesh_cx, st,
            StepConfig(engine="simple", locate_mode="convex", dt=0.08, **kw),
            60,
        )
        b = run_cycles(
            mesh_cx, st,
            StepConfig(engine="cached", locate_mode="convex", dt=0.08, **kw),
            60,
        )
        np.testing.assert_allclose(
            np.asarray(a.pos), np.asarray(b.pos), atol=1e-9
        )
        np.testing.assert_array_equal(
            np.asarray(a.tet_id), np.asarray(b.tet_id)
        )
        np.testing.assert_array_equal(
            np.asarray(a.active), np.asarray(b.active)
        )
        np.testing.assert_allclose(
            np.asarray(a.vel), np.asarray(b.vel), atol=1e-9
        )


def test_cached_convex_without_rows_falls_back(setup):
    """auto engine on convex mode without with_convex_rows: simple path."""
    mesh, st = setup
    cfg = StepConfig(locate_mode="convex", dt=0.08, use_brownian=False)
    assert cfg.resolved_engine() == "cached"
    a = run_cycles(mesh, st, cfg, 20)          # falls back silently
    b = run_cycles(
        mesh, st,
        StepConfig(engine="simple", locate_mode="convex", dt=0.08,
                   use_brownian=False),
        20,
    )
    np.testing.assert_array_equal(np.asarray(a.pos), np.asarray(b.pos))


def test_packed_convex_logic_matches_jnp_interpret():
    """Interpret-mode check of the packed convex cycle (grouped in-VMEM
    pack/unpack + lean kernel CB + packed rare stage) against the jitted
    jnp cached engine — discrete state exact, floats to fusion ulps (the
    on-TPU test below is the strong bit-parity check)."""
    import dataclasses as dc

    import jax
    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    from cudaparticlesfoam_tpu import StepConfig, box_mesh
    from cudaparticlesfoam_tpu.mesh import with_convex_rows
    from cudaparticlesfoam_tpu.ops import fused_convex
    from cudaparticlesfoam_tpu.ops import locate as locate_ops

    if jax.config.read("jax_enable_x64"):
        jax.config.update("jax_enable_x64", False)
        try:
            return test_packed_convex_logic_matches_jnp_interpret()
        finally:
            jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp

    mesh = with_convex_rows(box_mesh(8, 8, 8))
    tab = fused_convex.cx_table(mesh)
    n = 8192
    rng = np.random.default_rng(5)
    pos = jnp.asarray(rng.uniform(0.5, 7.5, (n, 3)), jnp.float32)
    loc = locate_ops.build_grid_locator(mesh)
    tet = locate_ops.locate_seeds(mesh, loc, pos)
    m0 = fused_convex.pack_state(
        mesh, tab, pos, jnp.zeros((n, 3), jnp.float32), tet,
        jnp.ones(n, bool))
    key = jax.random.PRNGKey(1)
    cfg = StepConfig(dt=0.4, diffusion_coeff=3e-3, locate_mode="convex",
                     walk_capacity_frac=0.25, brownian_rng="rbg")
    mj = np.asarray(jax.jit(
        lambda m: fused_convex.mega_cycle(mesh, tab, m, key, 3, cfg, 0.4))(m0))
    with pltpu.force_tpu_interpret_mode():
        m_rm = fused_convex.mega_cycle_packed(
            mesh, tab, m0.reshape(-1, 4 * fused_convex.WIDTH), key, 3,
            cfg, 0.4)
    mp = np.asarray(m_rm).reshape(-1, fused_convex.WIDTH)
    np.testing.assert_array_equal(mj[:, 6], mp[:, 6])
    np.testing.assert_array_equal(mj[:, 7], mp[:, 7])
    np.testing.assert_allclose(mj[:, :6], mp[:, :6], atol=2e-6)

    # chunked packed cycle (cycle_chunks=2, scan body) must be
    # bit-identical to the unchunked packed cycle: two PACK_LANES blocks
    m0w = jnp.concatenate([m0, m0], axis=0)
    with pltpu.force_tpu_interpret_mode():
        m_u = fused_convex.mega_cycle_packed(
            mesh, tab, m0w.reshape(-1, 4 * fused_convex.WIDTH), key, 3,
            cfg, 0.4)
        m_c = fused_convex.mega_cycle_packed(
            mesh, tab, m0w.reshape(-1, 4 * fused_convex.WIDTH), key, 3,
            dc.replace(cfg, cycle_chunks=2), 0.4)
    np.testing.assert_array_equal(np.asarray(m_u), np.asarray(m_c))


def test_packed_convex_bit_parity_on_tpu():
    """On-TPU: the packed convex path must reproduce the jnp cached
    convex engine bit-for-bit (aligned + ragged lane counts)."""
    import dataclasses as dc

    import jax
    import numpy as np
    import pytest

    dd = jax.config.jax_default_device
    plat = dd.platform if dd is not None else jax.default_backend()
    if plat == "cpu":
        pytest.skip("pallas kernels need a TPU backend")

    import jax.numpy as jnp

    from cudaparticlesfoam_tpu import StepConfig, box_mesh, run_cycles
    from cudaparticlesfoam_tpu.mesh import with_convex_rows
    from cudaparticlesfoam_tpu.ops import locate as locate_ops
    from cudaparticlesfoam_tpu import state as statelib

    mesh = with_convex_rows(box_mesh(10, 10, 10))
    for n, dt in ((4 * 8192, 0.15), (60_000, 0.5)):
        rng = np.random.default_rng(9)
        pos = jnp.asarray(rng.uniform(0.6, 9.4, (n, 3)), mesh.dtype)
        st = statelib.make_state(pos)
        loc = locate_ops.build_grid_locator(mesh)
        st = dc.replace(st, tet_id=locate_ops.locate_seeds(mesh, loc, st.pos))
        cfg = StepConfig(dt=dt, diffusion_coeff=2e-3, locate_mode="convex",
                         walk_capacity_frac=0.25, brownian_rng="rbg")
        out_j = run_cycles(mesh, st, dc.replace(cfg, engine_impl="jnp"), 10)
        variants = [
            dc.replace(cfg, engine_impl="pallas_packed", cycle_chunks=1),
            dc.replace(cfg, engine_impl="pallas_packed", cycle_chunks=2),
            # block-compacted hop gather (round-5 default at >=1M lanes):
            # normal capacity + a tiny one forcing overflow into the rare
            # arena — bit-identical either way
            dc.replace(cfg, engine_impl="pallas_packed", cycle_chunks=2,
                       hop_compact=4, hop_compact_frac=0.6),
            dc.replace(cfg, engine_impl="pallas_packed", cycle_chunks=2,
                       hop_compact=4, hop_compact_frac=0.02),
        ]
        for vcfg in variants:
            out_p = run_cycles(mesh, st, vcfg, 10)
            np.testing.assert_array_equal(
                np.asarray(out_j.pos), np.asarray(out_p.pos))
            np.testing.assert_array_equal(
                np.asarray(out_j.vel), np.asarray(out_p.vel))
            np.testing.assert_array_equal(
                np.asarray(out_j.tet_id), np.asarray(out_p.tet_id))
