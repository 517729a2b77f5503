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
    # outside the envelope: multi-hop, Pk, escape faces
    assert not fused_pallas.supported(mesh, cfg, 4)
    assert not fused_pallas.supported(
        mesh, dataclasses.replace(cfg, velocity_interp="VertexVelocity"), 1
    )
    assert not fused_pallas.supported(
        mesh, dataclasses.replace(cfg, escape_faces=True), 1
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
