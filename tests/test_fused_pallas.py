"""Pallas fast-path tests.

The hand-fused TPU stream kernels (``ops/fused_pallas.py``) must be
bit-identical to the jnp engine they replace.  The full comparison can
only execute on a TPU backend (Mosaic kernels do not run on CPU), so it
is skip-gated; CI still covers the envelope logic and the jnp fallback.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cudaparticlesfoam_tpu import StepConfig, box_mesh, run_cycles
from cudaparticlesfoam_tpu.ops import fused, fused_pallas
from cudaparticlesfoam_tpu import state as statelib


def _on_tpu() -> bool:
    dd = jax.config.jax_default_device
    plat = dd.platform if dd is not None else jax.default_backend()
    return plat not in ("cpu",)


def test_supported_envelope():
    mesh = box_mesh(3, 3, 3)
    cfg = StepConfig(dt=0.01)
    # CPU test session: never supported (default device pinned to cpu)
    assert not fused_pallas.supported(mesh, dataclasses.replace(cfg), 1) or _on_tpu()
    # explicit jnp always wins
    assert not fused_pallas.supported(
        mesh, dataclasses.replace(cfg, engine_impl="jnp"), 1
    )
    # outside the envelope: hops > 8, Pk (escape faces are INSIDE the
    # envelope since round 4 — the inline bounce reads the per-tet escape
    # mask baked into tet_row col 19)
    assert not fused_pallas.supported(mesh, cfg, 9)
    assert not fused_pallas.supported(
        mesh, dataclasses.replace(cfg, velocity_interp="VertexVelocity"), 1
    )


def test_jnp_fallback_runs_everywhere():
    """engine_impl='auto' on CPU must silently take the jnp path."""
    mesh = box_mesh(4, 4, 4)
    n = 512
    rng = np.random.default_rng(7)
    pos = jnp.asarray(rng.uniform(0.5, 3.5, (n, 3)), mesh.dtype)
    st = statelib.make_state(pos)
    from cudaparticlesfoam_tpu.ops import locate as locate_ops

    loc = locate_ops.build_grid_locator(mesh)
    st = dataclasses.replace(
        st, tet_id=locate_ops.locate_seeds(mesh, loc, st.pos)
    )
    cfg = StepConfig(dt=0.02, diffusion_coeff=1e-4, inline_hops=1)
    out = run_cycles(mesh, st, cfg, 5)
    assert int(jnp.sum(out.tet_id < 0)) == 0


def test_multihop_logic_matches_jnp_interpret():
    """Interpret-mode check of the multi-hop pallas chain (A -> gather/H
    x k -> B2) against the jitted jnp engine: the discrete state (tet ids,
    active, rare-stage pending routing) must match EXACTLY; float columns
    agree to fusion-dependent ulps on CPU (the on-TPU bit-parity test
    below is the strong check)."""
    import dataclasses as dc
    from functools import partial

    from jax.experimental.pallas import tpu as pltpu

    from cudaparticlesfoam_tpu.ops import fused, fused_pallas
    from cudaparticlesfoam_tpu.ops import locate as locate_ops

    # production pallas semantics are f32-only; the test harness enables
    # x64 globally, which would promote the kernels' python-float literals
    if jax.config.read("jax_enable_x64"):
        jax.config.update("jax_enable_x64", False)
        try:
            return test_multihop_logic_matches_jnp_interpret()
        finally:
            jax.config.update("jax_enable_x64", True)

    mesh = box_mesh(8, 8, 8)
    tab = mesh.tet_row
    n = 30_008
    rng = np.random.default_rng(5)
    pos = jnp.asarray(rng.uniform(0.5, 7.5, (n, 3)), jnp.float32)
    loc = locate_ops.build_grid_locator(mesh)
    tet = locate_ops.locate_seeds(mesh, loc, pos)
    m0 = fused.pack_state(mesh, pos, jnp.zeros((n, 3), jnp.float32), tet,
                          jnp.ones(n, bool))
    key = jax.random.PRNGKey(1)

    @partial(jax.jit, static_argnames=("cfg",))
    def cyc(m, cfg):
        return fused.mega_cycle(mesh, m, key, 3, cfg, 0.9)

    for hops in (2, 4):
        cfg = StepConfig(dt=0.9, diffusion_coeff=5e-3, inline_hops=hops,
                         walk_capacity_frac=0.25, brownian_rng="rbg")
        mj = np.asarray(cyc(m0, dc.replace(cfg, engine_impl="jnp")))
        with pltpu.force_tpu_interpret_mode():
            mp, pend = fused_pallas.pre_rare_cycle_multihop(
                mesh, tab, m0, key, 3, cfg, 0.9, hops
            )
            mp = fused._rare_stage(mesh, tab, mp, pend, cfg,
                                   fused.LAYOUT_TET, n, n // 8, 32)
        mp = np.asarray(mp)
        np.testing.assert_array_equal(mj[:, 6], mp[:, 6])   # tet ids
        np.testing.assert_array_equal(mj[:, 7], mp[:, 7])   # active
        np.testing.assert_allclose(mj[:, :6], mp[:, :6], atol=2e-6)


@pytest.mark.skipif(not _on_tpu(), reason="pallas kernels need a TPU backend")
def test_pallas_multihop_bit_parity_with_jnp():
    """On-TPU: the multi-hop chain must reproduce the jnp engine
    bit-for-bit over 10 cycles (tutorial-scale regime, hops=4)."""
    import dataclasses as dc

    from cudaparticlesfoam_tpu.ops import locate as locate_ops

    mesh = box_mesh(10, 10, 10)
    n = 60_000
    rng = np.random.default_rng(9)
    pos = jnp.asarray(rng.uniform(0.6, 9.4, (n, 3)), mesh.dtype)
    st = statelib.make_state(pos)
    loc = locate_ops.build_grid_locator(mesh)
    st = dataclasses.replace(
        st, tet_id=locate_ops.locate_seeds(mesh, loc, st.pos)
    )
    cfg = StepConfig(dt=0.6, diffusion_coeff=2e-3, inline_hops=4,
                     walk_capacity_frac=0.25, brownian_rng="rbg")
    out_j = run_cycles(mesh, st, dc.replace(cfg, engine_impl="jnp"), 10)
    out_p = run_cycles(mesh, st, dc.replace(cfg, engine_impl="pallas"), 10)
    np.testing.assert_array_equal(np.asarray(out_j.pos), np.asarray(out_p.pos))
    np.testing.assert_array_equal(
        np.asarray(out_j.tet_id), np.asarray(out_p.tet_id)
    )


def test_packed_logic_matches_jnp_interpret():
    """Interpret-mode check of the packed-carry cycle (grouped in-VMEM
    pack/unpack + packed rare stage) against the jitted jnp engine —
    discrete state exact, floats to fusion ulps (the on-TPU test below
    is the strong bit-parity check)."""
    import dataclasses as dc
    from jax.experimental.pallas import tpu as pltpu

    from cudaparticlesfoam_tpu.ops import locate as locate_ops

    if jax.config.read("jax_enable_x64"):
        jax.config.update("jax_enable_x64", False)
        try:
            return test_packed_logic_matches_jnp_interpret()
        finally:
            jax.config.update("jax_enable_x64", True)

    mesh = box_mesh(8, 8, 8)
    n = fused_pallas.PACK_LANES          # one full pallas block
    rng = np.random.default_rng(5)
    pos = jnp.asarray(rng.uniform(0.5, 7.5, (n, 3)), jnp.float32)
    loc = locate_ops.build_grid_locator(mesh)
    tet = locate_ops.locate_seeds(mesh, loc, pos)
    m0 = fused.pack_state(mesh, pos, jnp.zeros((n, 3), jnp.float32), tet,
                          jnp.ones(n, bool))
    key = jax.random.PRNGKey(1)

    for hops, dt in ((1, 0.15), (4, 0.9)):
        cfg = StepConfig(dt=dt, diffusion_coeff=5e-3, inline_hops=hops,
                         walk_capacity_frac=0.25, brownian_rng="rbg")
        mj = np.asarray(jax.jit(
            lambda m, c=dc.replace(cfg, engine_impl="jnp"), d=dt:
            fused.mega_cycle(mesh, m, key, 3, c, d)
        )(m0))
        with pltpu.force_tpu_interpret_mode():
            m_rm = fused.mega_cycle_packed(
                mesh, m0.reshape(-1, 4 * fused.LAYOUT_TET.width), key, 3,
                dc.replace(cfg, engine_impl="pallas_packed"), dt)
        mp = np.asarray(m_rm).reshape(-1, fused.LAYOUT_TET.width)
        np.testing.assert_array_equal(mj[:, 6], mp[:, 6])   # tet ids
        np.testing.assert_array_equal(mj[:, 7], mp[:, 7])   # active
        np.testing.assert_allclose(mj[:, :6], mp[:, :6], atol=2e-6)


def test_rbg_kernel_interpret_and_fallback():
    """brownian_rng='rbg_kernel': in-kernel hardware-PRNG noise.  On the
    jnp path it degrades to the XLA 'rbg' stream (CPU-safe); in interpret
    mode the packed cycle runs and keeps particles in-domain."""
    import dataclasses as dc
    from jax.experimental.pallas import tpu as pltpu

    from cudaparticlesfoam_tpu.ops import locate as locate_ops

    if jax.config.read("jax_enable_x64"):
        jax.config.update("jax_enable_x64", False)
        try:
            return test_rbg_kernel_interpret_and_fallback()
        finally:
            jax.config.update("jax_enable_x64", True)

    mesh = box_mesh(6, 6, 6)
    n = fused_pallas.PACK_LANES
    rng = np.random.default_rng(3)
    pos = jnp.asarray(rng.uniform(0.5, 5.5, (n, 3)), jnp.float32)
    loc = locate_ops.build_grid_locator(mesh)
    tet = locate_ops.locate_seeds(mesh, loc, pos)
    m0 = fused.pack_state(mesh, pos, jnp.zeros((n, 3), jnp.float32), tet,
                          jnp.ones(n, bool))
    key = jax.random.PRNGKey(1)
    cfg = StepConfig(dt=0.05, diffusion_coeff=1e-3, inline_hops=1,
                     brownian_rng="rbg_kernel")
    # jnp fallback == the XLA rbg stream
    mj_k = np.asarray(jax.jit(
        lambda m: fused.mega_cycle(
            mesh, m, key, 3, dc.replace(cfg, engine_impl="jnp"), 0.05))(m0))
    mj_r = np.asarray(jax.jit(
        lambda m: fused.mega_cycle(
            mesh, m, key, 3,
            dc.replace(cfg, engine_impl="jnp", brownian_rng="rbg"), 0.05))(m0))
    np.testing.assert_array_equal(mj_k, mj_r)
    # interpret-mode packed cycle runs and stays sane
    with pltpu.force_tpu_interpret_mode():
        m_rm = fused.mega_cycle_packed(
            mesh, m0.reshape(-1, 4 * fused.LAYOUT_TET.width), key, 3,
            dc.replace(cfg, engine_impl="pallas_packed"), 0.05)
    mp = np.asarray(m_rm).reshape(-1, fused.LAYOUT_TET.width)
    assert (mp[:, 6] >= 0).all()
    assert (mp[:, 7] > 0.5).all()


@pytest.mark.skipif(not _on_tpu(), reason="pallas kernels need a TPU backend")
def test_rbg_kernel_stats_on_tpu():
    """On-TPU: rbg_kernel noise is deterministic and statistically a
    standard Brownian kick (variance 2 D dt per axis per cycle)."""
    import dataclasses as dc

    from cudaparticlesfoam_tpu.ops import locate as locate_ops

    mesh = box_mesh(20, 20, 20)
    n = 8 * 8192
    rng = np.random.default_rng(11)
    pos = jnp.asarray(rng.uniform(8.0, 12.0, (n, 3)), jnp.float32)
    st = statelib.make_state(pos)
    loc = locate_ops.build_grid_locator(mesh)
    st = dataclasses.replace(
        st, tet_id=locate_ops.locate_seeds(mesh, loc, st.pos))
    D, dt, ncyc = 1e-3, 0.5, 20
    cfg = StepConfig(dt=dt, diffusion_coeff=D, use_advection=False,
                     brownian_rng="rbg_kernel", engine_impl="pallas_packed")
    out = run_cycles(mesh, st, cfg, ncyc)
    d = np.asarray(out.pos) - np.asarray(pos)
    want = 2 * D * dt * ncyc
    np.testing.assert_allclose(d.var(axis=0), want, rtol=0.06)
    assert (np.abs(d.mean(axis=0)) < 4e-3).all()
    out2 = run_cycles(mesh, st, cfg, ncyc)
    np.testing.assert_array_equal(np.asarray(out.pos), np.asarray(out2.pos))


@pytest.mark.skipif(not _on_tpu(), reason="pallas kernels need a TPU backend")
def test_packed_bit_parity_with_jnp():
    """On-TPU: the packed-carry default path must reproduce the jnp
    engine bit-for-bit — aligned and ragged (padded) lane counts, hop-1
    and multi-hop."""
    import dataclasses as dc

    from cudaparticlesfoam_tpu.ops import locate as locate_ops

    mesh = box_mesh(10, 10, 10)
    for n, hops, dt in ((4 * 8192, 1, 0.15), (60_000, 4, 0.6)):
        rng = np.random.default_rng(9)
        pos = jnp.asarray(rng.uniform(0.6, 9.4, (n, 3)), mesh.dtype)
        st = statelib.make_state(pos)
        loc = locate_ops.build_grid_locator(mesh)
        st = dataclasses.replace(
            st, tet_id=locate_ops.locate_seeds(mesh, loc, st.pos)
        )
        cfg = StepConfig(dt=dt, diffusion_coeff=2e-3, inline_hops=hops,
                         walk_capacity_frac=0.25, brownian_rng="rbg")
        out_j = run_cycles(mesh, st, dc.replace(cfg, engine_impl="jnp"), 10)
        out_p = run_cycles(
            mesh, st, dc.replace(cfg, engine_impl="pallas_packed"), 10)
        np.testing.assert_array_equal(np.asarray(out_j.pos), np.asarray(out_p.pos))
        np.testing.assert_array_equal(np.asarray(out_j.vel), np.asarray(out_p.vel))
        np.testing.assert_array_equal(
            np.asarray(out_j.tet_id), np.asarray(out_p.tet_id))


@pytest.mark.skipif(not _on_tpu(), reason="pallas kernels need a TPU backend")
def test_hop_compact_bit_parity_on_tpu():
    """On-TPU: the block-compacted hop gather (hop_compact=4) must
    reproduce the default full-batch path's SIMULATION state bit-for-bit
    over several cycles — at a generous group capacity and at a starved
    one (hop_compact_frac=0.02) that forces crossers to overflow into the
    rare arena.  Raw mega bytes are NOT compared: dead lanes keep stale
    row-cache bytes on the compact path (see _b_compute_c)."""
    import dataclasses as dc

    from cudaparticlesfoam_tpu.ops import locate as locate_ops

    mesh = box_mesh(10, 10, 10)
    n = 8 * 8192
    rng = np.random.default_rng(17)
    pos = jnp.asarray(rng.uniform(0.6, 9.4, (n, 3)), mesh.dtype)
    st = statelib.make_state(pos)
    loc = locate_ops.build_grid_locator(mesh)
    st = dataclasses.replace(
        st, tet_id=locate_ops.locate_seeds(mesh, loc, st.pos)
    )
    # dt large enough that a healthy fraction of lanes cross per cycle
    cfg = StepConfig(dt=0.15, diffusion_coeff=2e-3, inline_hops=1,
                     walk_capacity_frac=0.25, brownian_rng="rbg",
                     engine_impl="pallas_packed")
    out_0 = run_cycles(mesh, st, cfg, 8)
    for frac in (0.5, 0.02):
        out_c = run_cycles(
            mesh, st,
            dc.replace(cfg, hop_compact=4, hop_compact_frac=frac), 8)
        np.testing.assert_array_equal(
            np.asarray(out_0.pos), np.asarray(out_c.pos))
        np.testing.assert_array_equal(
            np.asarray(out_0.vel), np.asarray(out_c.vel))
        np.testing.assert_array_equal(
            np.asarray(out_0.tet_id), np.asarray(out_c.tet_id))
        np.testing.assert_array_equal(
            np.asarray(out_0.active), np.asarray(out_c.active))


def test_hop_compact_value_validated():
    """StepConfig rejects hop_compact values other than 0 and 4 (any other
    int silently behaved as off before)."""
    with pytest.raises(ValueError):
        StepConfig(hop_compact=1)
    with pytest.raises(ValueError):
        StepConfig(hop_compact=8)
    StepConfig(hop_compact=4)  # ok


@pytest.mark.skipif(not _on_tpu(), reason="pallas kernels need a TPU backend")
def test_pallas_bit_parity_with_jnp():
    """10 cycles, same seed state: the pallas stream path must reproduce
    the jnp engine bit-for-bit (positions, velocities, tet ids) —
    including a ragged lane count that exercises partial pallas blocks."""
    mesh = box_mesh(6, 6, 6)
    for n in (100_000, 30_008):          # aligned-ish and ragged
        rng = np.random.default_rng(3)
        pos = jnp.asarray(rng.uniform(0.4, 5.6, (n, 3)), mesh.dtype)
        st = statelib.make_state(pos)
        from cudaparticlesfoam_tpu.ops import locate as locate_ops

        loc = locate_ops.build_grid_locator(mesh)
        st = dataclasses.replace(
            st, tet_id=locate_ops.locate_seeds(mesh, loc, st.pos)
        )
        cfg = StepConfig(dt=0.05, diffusion_coeff=1e-3, inline_hops=1,
                         brownian_rng="rbg")
        out_j = run_cycles(mesh, st, dataclasses.replace(cfg, engine_impl="jnp"), 10)
        out_p = run_cycles(mesh, st, dataclasses.replace(cfg, engine_impl="pallas"), 10)
        np.testing.assert_array_equal(np.asarray(out_j.pos), np.asarray(out_p.pos))
        np.testing.assert_array_equal(np.asarray(out_j.vel), np.asarray(out_p.vel))
        np.testing.assert_array_equal(
            np.asarray(out_j.tet_id), np.asarray(out_p.tet_id)
        )


def test_macro_cycles_validated_and_enveloped():
    """StepConfig bounds macro_cycles to 1..8; macro_supported requires
    the packed envelope."""
    with pytest.raises(ValueError):
        StepConfig(macro_cycles=0)
    with pytest.raises(ValueError):
        StepConfig(macro_cycles=9)
    mesh = box_mesh(3, 3, 3)
    assert not fused_pallas.macro_supported(mesh, StepConfig(), 1)
    # CPU session: packed envelope is off, so macro is too
    assert not fused_pallas.macro_supported(mesh, StepConfig(), 4)


def test_macro_cycles_logic_matches_percycle_interpret():
    """Interpret-mode check of macro-cycle fusion (k sub-steps per mega
    round-trip): k macro'd sub-steps must match k per-cycle packed
    sub-steps — discrete state exact, floats to fusion ulps (the on-TPU
    test below is the strong bit-parity check)."""
    import dataclasses as dc
    from jax.experimental.pallas import tpu as pltpu

    from cudaparticlesfoam_tpu.ops import locate as locate_ops

    if jax.config.read("jax_enable_x64"):
        jax.config.update("jax_enable_x64", False)
        try:
            return test_macro_cycles_logic_matches_percycle_interpret()
        finally:
            jax.config.update("jax_enable_x64", True)

    mesh = box_mesh(8, 8, 8)
    n = fused_pallas.PACK_LANES
    rng = np.random.default_rng(11)
    pos = jnp.asarray(rng.uniform(0.5, 7.5, (n, 3)), jnp.float32)
    loc = locate_ops.build_grid_locator(mesh)
    tet = locate_ops.locate_seeds(mesh, loc, pos)
    m0 = fused.pack_state(mesh, pos, jnp.zeros((n, 3), jnp.float32), tet,
                          jnp.ones(n, bool))
    key = jax.random.PRNGKey(7)
    k = 2
    cfg = StepConfig(dt=0.15, diffusion_coeff=5e-3, inline_hops=1,
                     walk_capacity_frac=0.25, brownian_rng="rbg",
                     engine_impl="pallas_packed")
    m_rm0 = m0.reshape(-1, 4 * fused.LAYOUT_TET.width)
    with pltpu.force_tpu_interpret_mode():
        m_pc = m_rm0
        for j in range(k):
            m_pc = fused.mega_cycle_packed(mesh, m_pc, key, 3 + j, cfg, 0.15)
        m_mc = fused.mega_macro_packed(
            mesh, m_rm0, key, 3, dc.replace(cfg, macro_cycles=k), 0.15
        )
    a = np.asarray(m_pc).reshape(-1, fused.LAYOUT_TET.width)
    b = np.asarray(m_mc).reshape(-1, fused.LAYOUT_TET.width)
    np.testing.assert_array_equal(a[:, 6], b[:, 6])   # tet ids
    np.testing.assert_array_equal(a[:, 7], b[:, 7])   # active
    np.testing.assert_allclose(a[:, :6], b[:, :6], atol=2e-6)


@pytest.mark.skipif(not _on_tpu(), reason="pallas kernels need a TPU backend")
def test_macro_cycles_bit_parity_on_tpu():
    """On-TPU: macro_cycles=k must reproduce the per-cycle packed path
    bit-for-bit over several cycles, under both the XLA 'rbg' noise and
    the in-kernel 'rbg_kernel' stream, including a ragged n_cycles (the
    leftover cycles run per-cycle)."""
    import dataclasses as dc

    from cudaparticlesfoam_tpu.ops import locate as locate_ops

    mesh = box_mesh(10, 10, 10)
    n = 8 * 8192
    rng = np.random.default_rng(23)
    pos = jnp.asarray(rng.uniform(0.6, 9.4, (n, 3)), mesh.dtype)
    st = statelib.make_state(pos)
    loc = locate_ops.build_grid_locator(mesh)
    st = dataclasses.replace(
        st, tet_id=locate_ops.locate_seeds(mesh, loc, st.pos)
    )
    for rng_mode in ("rbg", "rbg_kernel"):
        cfg = StepConfig(dt=0.15, diffusion_coeff=2e-3, inline_hops=1,
                         walk_capacity_frac=0.25, brownian_rng=rng_mode,
                         engine_impl="pallas_packed")
        out_0 = run_cycles(mesh, st, cfg, 7)
        for k in (2, 4):
            out_m = run_cycles(mesh, st, dc.replace(cfg, macro_cycles=k), 7)
            np.testing.assert_array_equal(
                np.asarray(out_0.pos), np.asarray(out_m.pos))
            np.testing.assert_array_equal(
                np.asarray(out_0.vel), np.asarray(out_m.vel))
            np.testing.assert_array_equal(
                np.asarray(out_0.tet_id), np.asarray(out_m.tet_id))
            np.testing.assert_array_equal(
                np.asarray(out_0.active), np.asarray(out_m.active))


def _escape_fixture(n=None):
    """Box with +x outlet marked absorbing + a uniform +x wind."""
    import dataclasses as dc

    from cudaparticlesfoam_tpu import replace_velocity
    from cudaparticlesfoam_tpu.mesh import set_boundary_escape
    from cudaparticlesfoam_tpu.ops import locate as locate_ops

    mesh = box_mesh(8, 8, 8)
    # tag +x boundary faces as patch 1, others 0, then mark patch 1
    # absorbing.  bd_patch is derivable from the face centroids.
    pts = np.asarray(mesh.points)
    ctr = pts[np.asarray(mesh.bd_tris)].mean(axis=1)
    patch = np.where(ctr[:, 0] > 7.999, 1, 0).astype(np.int32)
    mesh = dc.replace(mesh, bd_patch=jnp.asarray(patch))
    mesh = set_boundary_escape(mesh, [1])
    cen = pts[np.asarray(mesh.tets)].mean(axis=1)
    u = np.zeros_like(cen)
    u[:, 0] = 1.5
    mesh = replace_velocity(mesh, tet_vel=u)
    n = n or fused_pallas.PACK_LANES
    rng = np.random.default_rng(31)
    pos = jnp.asarray(rng.uniform(0.5, 7.5, (n, 3)), jnp.float32)
    st = statelib.make_state(pos)
    loc = locate_ops.build_grid_locator(mesh)
    st = dataclasses.replace(
        st, tet_id=locate_ops.locate_seeds(mesh, loc, st.pos)
    )
    return mesh, st


def test_escape_mask_baked_into_rows():
    """set_boundary_escape writes the per-tet 4-bit escape mask into
    tet_row col 19, consistent with a bd_escape gather."""
    mesh, _ = _escape_fixture(n=8)
    nbr = np.asarray(mesh.tet_nbr)
    esc = np.asarray(mesh.bd_escape)
    bd = np.clip(-nbr - 1, 0, mesh.n_bd_faces - 1)
    want = ((nbr < 0) & esc[bd]).astype(np.int64) @ np.array([1, 2, 4, 8])
    got = np.asarray(mesh.tet_row[:, 19]).astype(np.int64)
    np.testing.assert_array_equal(want, got)
    assert want.max() > 0   # the fixture really has absorbing faces


def test_escape_faces_logic_matches_jnp_interpret():
    """Interpret-mode: the packed pallas cycle with escape faces must
    match the jnp engine — escaped lanes deactivate with tet=-(t+1)
    instead of reflecting (discrete state exact, floats to fusion
    ulps)."""
    import dataclasses as dc
    from jax.experimental.pallas import tpu as pltpu

    if jax.config.read("jax_enable_x64"):
        jax.config.update("jax_enable_x64", False)
        try:
            return test_escape_faces_logic_matches_jnp_interpret()
        finally:
            jax.config.update("jax_enable_x64", True)

    mesh, st = _escape_fixture()
    m0 = fused.pack_state(mesh, st.pos, jnp.zeros_like(st.pos), st.tet_id,
                          st.active)
    key = jax.random.PRNGKey(3)
    cfg = StepConfig(dt=0.3, diffusion_coeff=2e-3, inline_hops=1,
                     walk_capacity_frac=0.25, brownian_rng="rbg",
                     escape_faces=True, engine_impl="pallas_packed")
    m = m0
    for j in range(6):
        m = jax.jit(
            lambda mm, j=j: fused.mega_cycle(
                mesh, mm, key, 3 + j, dc.replace(cfg, engine_impl="jnp"),
                0.3,
            )
        )(m)
    m_rm = m0.reshape(-1, 4 * fused.LAYOUT_TET.width)
    with pltpu.force_tpu_interpret_mode():
        for j in range(6):
            m_rm = fused.mega_cycle_packed(mesh, m_rm, key, 3 + j, cfg, 0.3)
    a = np.asarray(m)
    b = np.asarray(m_rm).reshape(-1, fused.LAYOUT_TET.width)
    assert (a[:, 7] < 0.5).sum() > 0        # some lanes escaped
    np.testing.assert_array_equal(a[:, 6], b[:, 6])   # tet ids
    np.testing.assert_array_equal(a[:, 7], b[:, 7])   # active
    live = a[:, 7] > 0.5
    np.testing.assert_allclose(a[live][:, :6], b[live][:, :6], atol=2e-6)


@pytest.mark.skipif(not _on_tpu(), reason="pallas kernels need a TPU backend")
def test_escape_faces_bit_parity_on_tpu():
    """On-TPU: escape faces through run_cycles — pallas packed (with and
    without hop_compact) vs the jnp engine, bit-for-bit on simulation
    state."""
    import dataclasses as dc

    mesh, st = _escape_fixture(n=8 * 8192)
    cfg = StepConfig(dt=0.3, diffusion_coeff=2e-3, inline_hops=1,
                     walk_capacity_frac=0.25, brownian_rng="rbg",
                     escape_faces=True)
    out_j = run_cycles(mesh, st, dc.replace(cfg, engine_impl="jnp"), 8)
    assert (~np.asarray(out_j.active)).sum() > 0
    for impl_cfg in (
        dc.replace(cfg, engine_impl="pallas_packed"),
        dc.replace(cfg, engine_impl="pallas_packed", hop_compact=4),
    ):
        out_p = run_cycles(mesh, st, impl_cfg, 8)
        np.testing.assert_array_equal(
            np.asarray(out_j.tet_id), np.asarray(out_p.tet_id))
        np.testing.assert_array_equal(
            np.asarray(out_j.active), np.asarray(out_p.active))
        np.testing.assert_array_equal(
            np.asarray(out_j.pos), np.asarray(out_p.pos))
        np.testing.assert_array_equal(
            np.asarray(out_j.vel), np.asarray(out_p.vel))


def _pk_fixture(n=None, nside=8):
    """Box with its native per-vertex radial velocity + pk rows."""
    from cudaparticlesfoam_tpu.mesh import with_pk_rows
    from cudaparticlesfoam_tpu.ops import locate as locate_ops

    mesh = with_pk_rows(box_mesh(nside, nside, nside))
    n = n or fused_pallas.PACK_LANES
    rng = np.random.default_rng(17)
    pos = jnp.asarray(
        rng.uniform(0.5, nside - 0.5, (n, 3)), jnp.float32
    )
    st = statelib.make_state(pos)
    loc = locate_ops.build_grid_locator(mesh)
    return mesh, dataclasses.replace(
        st, tet_id=locate_ops.locate_seeds(mesh, loc, st.pos)
    )


def test_pk_pallas_envelope():
    """VertexVelocity joins the pallas envelope when the 29-col pk rows
    exist — including escape faces (the baked mask rides pk col 28);
    missing rows ride jnp."""
    import dataclasses as dc
    from cudaparticlesfoam_tpu.mesh import with_pk_rows

    mesh0 = box_mesh(4, 4, 4)
    mesh = with_pk_rows(mesh0)
    assert mesh.tet_row_pk.shape[1] == fused.LAYOUT_PK.row_w == 29
    cfg = StepConfig(dt=0.05, velocity_interp="VertexVelocity")
    on_tpu = _on_tpu()
    assert fused_pallas.supported(mesh, cfg, 1) == on_tpu
    assert fused_pallas.packed_supported(mesh, cfg, 4) == on_tpu
    # no pk rows -> excluded
    assert not fused_pallas.supported(mesh0, cfg, 1)
    # Pk + escape faces -> INSIDE the envelope (round-5: mask col 28)
    assert fused_pallas.supported(
        mesh, dc.replace(cfg, escape_faces=True), 1
    ) == on_tpu
    # macro fusion stays TetVelocity-only
    assert not fused_pallas.macro_supported(mesh, dc.replace(cfg), 4)


def test_pk_escape_mask_baked_both_orders():
    """set_boundary_escape bakes the same 4-bit mask into tet_row col 19
    and tet_row_pk col 28, regardless of whether with_pk_rows ran before
    or after it."""
    from cudaparticlesfoam_tpu.mesh import set_boundary_escape, with_pk_rows

    mesh0 = box_mesh(3, 3, 3)
    # order 1: pk rows first, then escape
    m1 = set_boundary_escape(with_pk_rows(mesh0), [0])
    # order 2: escape first, then pk rows (mask inherited from tet_row)
    m2 = with_pk_rows(set_boundary_escape(mesh0, [0]))
    a1 = np.asarray(m1.tet_row_pk[:, 28])
    a2 = np.asarray(m2.tet_row_pk[:, 28])
    np.testing.assert_array_equal(a1, np.asarray(m1.tet_row[:, 19]))
    np.testing.assert_array_equal(a1, a2)
    assert a1.max() > 0          # the box has boundary tets on patch 0


def test_pk_packed_logic_matches_jnp_interpret():
    """Interpret-mode: the packed pallas cycle in VertexVelocity mode must
    match the jnp Pk engine (discrete state exact, floats to fusion
    ulps), hops=1 and hops=3."""
    import dataclasses as dc
    from jax.experimental.pallas import tpu as pltpu

    if jax.config.read("jax_enable_x64"):
        jax.config.update("jax_enable_x64", False)
        try:
            return test_pk_packed_logic_matches_jnp_interpret()
        finally:
            jax.config.update("jax_enable_x64", True)

    mesh, st = _pk_fixture()
    ly = fused.LAYOUT_PK
    m0 = fused.pack_state(mesh, st.pos, jnp.zeros_like(st.pos), st.tet_id,
                          st.active, ly)
    key = jax.random.PRNGKey(7)
    for hops in (1, 3):
        cfg = StepConfig(dt=0.4, diffusion_coeff=2e-3, inline_hops=hops,
                         walk_capacity_frac=0.25, brownian_rng="rbg",
                         velocity_interp="VertexVelocity")
        m = m0
        for j in range(4):
            m = jax.jit(
                lambda mm, j=j: fused.mega_cycle(
                    mesh, mm, key, 5 + j,
                    dc.replace(cfg, engine_impl="jnp"), 0.4,
                )
            )(m)
        m_rm = m0.reshape(-1, 4 * ly.width)
        with pltpu.force_tpu_interpret_mode():
            for j in range(4):
                m_rm = fused.mega_cycle_packed(
                    mesh, m_rm,
                    key, 5 + j, dc.replace(cfg, engine_impl="pallas_packed"),
                    0.4,
                )
        a = np.asarray(m)
        b = np.asarray(m_rm).reshape(-1, ly.width)
        assert (np.asarray(st.pos) != a[:, :3]).any()   # field moved them
        np.testing.assert_array_equal(a[:, 6], b[:, 6])   # tet ids
        np.testing.assert_array_equal(a[:, 7], b[:, 7])   # active
        np.testing.assert_allclose(a[:, :6], b[:, :6], atol=2e-6)


def _pk_escape_fixture(n=None, nside=8):
    """Pk rows + absorbing +x patch: the native radial vertex velocity
    drives lanes into every wall; only +x hits escape."""
    import dataclasses as dc

    from cudaparticlesfoam_tpu.mesh import set_boundary_escape, with_pk_rows
    from cudaparticlesfoam_tpu.ops import locate as locate_ops

    mesh = box_mesh(nside, nside, nside)
    pts = np.asarray(mesh.points)
    ctr = pts[np.asarray(mesh.bd_tris)].mean(axis=1)
    patch = np.where(ctr[:, 0] > nside - 1e-3, 1, 0).astype(np.int32)
    mesh = dc.replace(mesh, bd_patch=jnp.asarray(patch))
    mesh = with_pk_rows(set_boundary_escape(mesh, [1]))
    n = n or fused_pallas.PACK_LANES
    rng = np.random.default_rng(47)
    pos = jnp.asarray(rng.uniform(0.5, nside - 0.5, (n, 3)), jnp.float32)
    st = statelib.make_state(pos)
    loc = locate_ops.build_grid_locator(mesh)
    return mesh, dataclasses.replace(
        st, tet_id=locate_ops.locate_seeds(mesh, loc, st.pos)
    )


def test_pk_escape_logic_matches_jnp_interpret():
    """Interpret-mode: the packed pallas cycle in VertexVelocity mode WITH
    escape faces must match the jnp engine — the baked mask rides pk row
    col 28 (round-5; previously Pk + escape was jnp-only)."""
    import dataclasses as dc
    from jax.experimental.pallas import tpu as pltpu

    if jax.config.read("jax_enable_x64"):
        jax.config.update("jax_enable_x64", False)
        try:
            return test_pk_escape_logic_matches_jnp_interpret()
        finally:
            jax.config.update("jax_enable_x64", True)

    mesh, st = _pk_escape_fixture()
    ly = fused.LAYOUT_PK
    m0 = fused.pack_state(mesh, st.pos, jnp.zeros_like(st.pos), st.tet_id,
                          st.active, ly)
    key = jax.random.PRNGKey(9)
    cfg = StepConfig(dt=0.35, diffusion_coeff=2e-3, inline_hops=1,
                     walk_capacity_frac=0.25, brownian_rng="rbg",
                     velocity_interp="VertexVelocity", escape_faces=True,
                     engine_impl="pallas_packed")
    m = m0
    for j in range(6):
        m = jax.jit(
            lambda mm, j=j: fused.mega_cycle(
                mesh, mm, key, 3 + j, dc.replace(cfg, engine_impl="jnp"),
                0.35,
            )
        )(m)
    m_rm = m0.reshape(-1, 4 * ly.width)
    with pltpu.force_tpu_interpret_mode():
        for j in range(6):
            m_rm = fused.mega_cycle_packed(mesh, m_rm, key, 3 + j, cfg, 0.35)
    a = np.asarray(m)
    b = np.asarray(m_rm).reshape(-1, ly.width)
    assert (a[:, 7] < 0.5).sum() > 0        # some lanes escaped through +x
    np.testing.assert_array_equal(a[:, 6], b[:, 6])   # tet ids
    np.testing.assert_array_equal(a[:, 7], b[:, 7])   # active
    live = a[:, 7] > 0.5
    np.testing.assert_allclose(a[live][:, :6], b[live][:, :6], atol=2e-6)


@pytest.mark.skipif(not _on_tpu(), reason="pallas kernels need a TPU backend")
def test_pk_escape_bit_parity_on_tpu():
    """On-TPU: Pk + escape faces through run_cycles — packed and
    transposed-view pallas vs the jnp engine, bit-for-bit; hops 1 and 4."""
    import dataclasses as dc

    mesh, st = _pk_escape_fixture(n=8 * 8192)
    for hops in (1, 4):
        cfg = StepConfig(dt=0.35, diffusion_coeff=2e-3, inline_hops=hops,
                         walk_capacity_frac=0.25, brownian_rng="rbg",
                         velocity_interp="VertexVelocity", escape_faces=True)
        out_j = run_cycles(mesh, st, dc.replace(cfg, engine_impl="jnp"), 8)
        assert (~np.asarray(out_j.active)).sum() > 0
        for impl in ("pallas_packed", "pallas"):
            out_p = run_cycles(mesh, st, dc.replace(cfg, engine_impl=impl), 8)
            np.testing.assert_array_equal(
                np.asarray(out_j.tet_id), np.asarray(out_p.tet_id))
            np.testing.assert_array_equal(
                np.asarray(out_j.active), np.asarray(out_p.active))
            np.testing.assert_array_equal(
                np.asarray(out_j.pos), np.asarray(out_p.pos))
            np.testing.assert_array_equal(
                np.asarray(out_j.vel), np.asarray(out_p.vel))


@pytest.mark.skipif(not _on_tpu(), reason="pallas kernels need a TPU backend")
def test_pk_bit_parity_on_tpu():
    """On-TPU: VertexVelocity through run_cycles — packed and
    transposed-view pallas vs the jnp engine, bit-for-bit."""
    import dataclasses as dc

    mesh, st = _pk_fixture(n=8 * 8192)
    for hops in (1, 4):
        cfg = StepConfig(dt=0.4, diffusion_coeff=2e-3, inline_hops=hops,
                         walk_capacity_frac=0.25, brownian_rng="rbg",
                         velocity_interp="VertexVelocity")
        out_j = run_cycles(mesh, st, dc.replace(cfg, engine_impl="jnp"), 6)
        for impl in ("pallas_packed", "pallas"):
            out_p = run_cycles(mesh, st, dc.replace(cfg, engine_impl=impl), 6)
            np.testing.assert_array_equal(
                np.asarray(out_j.tet_id), np.asarray(out_p.tet_id))
            np.testing.assert_array_equal(
                np.asarray(out_j.active), np.asarray(out_p.active))
            np.testing.assert_array_equal(
                np.asarray(out_j.pos), np.asarray(out_p.pos))
            np.testing.assert_array_equal(
                np.asarray(out_j.vel), np.asarray(out_p.vel))
