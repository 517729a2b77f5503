"""Second-order convection (deferred correction), inletOutlet backflow
switching, and non-orthogonal correction machinery."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from cudaparticlesfoam_tpu.io import blockmesh
from cudaparticlesfoam_tpu.models import fv

TUT = os.path.join(os.path.dirname(__file__), "..", "tutorials", "incompressible")


@pytest.fixture(scope="module")
def box():
    import textwrap, tempfile

    d = tempfile.mkdtemp()
    path = os.path.join(d, "blockMeshDict")
    open(path, "w").write(textwrap.dedent("""
        FoamFile { version 2.0; format ascii; class dictionary; object blockMeshDict; }
        convertToMeters 1;
        vertices ( (0 0 0) (10 0 0) (10 1 0) (0 1 0)
                   (0 0 1) (10 0 1) (10 1 1) (0 1 1) );
        blocks ( hex (0 1 2 3 4 5 6 7) (20 4 4) simpleGrading (1 1 1) );
        boundary (
          inlet  { type patch; faces ((0 4 7 3)); }
          outlet { type patch; faces ((1 2 6 5)); }
          walls  { type wall;  faces ((0 1 5 4) (3 7 6 2) (0 3 2 1) (4 5 6 7)); }
        );
    """))
    pm = blockmesh.generate(path)
    return fv.fv_mesh(pm, dtype=jnp.float64)


def _uniform_flux(m, u=(1.0, 0.0, 0.0)):
    bc = fv.make_bcs(m, {}, 3)
    uf = np.tile(u, (m.n_cells, 1))
    return fv.flux_of(m, jnp.asarray(uf), bc)


def test_correction_zero_on_uniform_field(box):
    m = box
    flux = _uniform_flux(m)
    bc = fv.make_bcs(m, {}, 1)
    phi = jnp.ones(m.n_cells, jnp.float64) * 3.7
    for scheme in ("upwind", "linear", "linearUpwind", "limitedLinear"):
        c = fv.convection_correction(m, flux, phi, bc, scheme)
        assert float(jnp.abs(c).max()) < 1e-12, scheme


def test_second_order_on_linear_field(box):
    """For phi = x with uniform flux, upwind div has O(h) error; the
    deferred linear/linearUpwind corrections must cancel it exactly in
    the interior (linear fields are reproduced by 2nd-order schemes)."""
    m = box
    flux = _uniform_flux(m)
    phi = np.asarray(m.cc)[:, 0]
    bc = fv.make_bcs(m, {"inlet": ("fixedValue", 0.0)}, 1)
    phj = jnp.asarray(phi)

    def interior_div(corr_scheme):
        n_int = m.n_internal
        f_i = np.asarray(flux)[:n_int]
        up = np.where(f_i >= 0, np.asarray(m.owner[:n_int]), np.asarray(m.neighbour))
        conv = np.zeros(m.n_cells)
        np.add.at(conv, np.asarray(m.owner[:n_int]), f_i * phi[up])
        np.add.at(conv, np.asarray(m.neighbour), -f_i * phi[up])
        corr = np.asarray(
            fv.convection_correction(m, flux, phj, bc, corr_scheme)
        )[:, 0]
        return conv - corr   # conv source moves to rhs with + sign; net op

    # interior cells (away from both x-boundaries)
    cc = np.asarray(m.cc)
    interior = (cc[:, 0] > 1.0) & (cc[:, 0] < 9.0)
    vol = np.asarray(m.vol)
    # exact div(u phi) = d(x)/dx = 1 per unit volume
    for scheme in ("linear", "linearUpwind", "limitedLinear"):
        d = interior_div(scheme) / vol
        err = np.abs(d[interior] - 1.0).max()
        assert err < 1e-10, (scheme, err)
        # the per-face correction itself is active (phi_f differs from the
        # upwind value by h/2 on a linear profile); it cancels in the
        # interior sums above only because signs/orientation are right
        corr = np.asarray(fv.convection_correction(m, flux, phj, bc, scheme))
        assert np.abs(corr).max() > 1e-6, scheme


def test_limited_linear_bounded(box):
    """limitedLinear on a step profile must stay between upwind and
    linear (limiter in [0,1]) — no new extrema in the correction."""
    m = box
    flux = _uniform_flux(m)
    cc = np.asarray(m.cc)
    phi = jnp.asarray((cc[:, 0] > 5.0).astype(np.float64))
    bc = fv.make_bcs(m, {}, 1)
    c_lim = np.asarray(fv.convection_correction(m, flux, phi, bc, "limitedLinear"))
    c_lin = np.asarray(fv.convection_correction(m, flux, phi, bc, "linear"))
    assert np.abs(c_lim).max() <= np.abs(c_lin).max() + 1e-12
    assert np.isfinite(c_lim).all()


def test_effective_bcs_backflow_switch(box):
    m = box
    n_bd = m.n_faces - m.n_internal
    bc = fv.make_bcs(
        m, {"outlet": ("inletOutlet", [0.5, 0.0, 0.0])}, 3
    )
    assert bool(jnp.any(bc.io_mask))
    # outflow everywhere: zeroGradient (a=1)
    eff = fv.effective_bcs(bc, jnp.ones(n_bd))
    io = np.asarray(bc.io_mask)
    assert np.allclose(np.asarray(eff.a)[io], 1.0)
    # backflow: fixedValue(inletValue)
    eff = fv.effective_bcs(bc, -jnp.ones(n_bd))
    assert np.allclose(np.asarray(eff.a)[io], 0.0)
    assert np.allclose(np.asarray(eff.b)[io, 0], 0.5)


def test_nonortho_vanishes_on_hex(box):
    """The hex box is orthogonal: the correction vector k and the
    explicit corrector flux must be ~zero."""
    m = box
    assert float(jnp.abs(m.nonortho).max()) < 1e-10
    bc = fv.make_bcs(m, {}, 1)
    p = jnp.asarray(np.random.default_rng(0).normal(size=m.n_cells))
    corr = fv.nonortho_flux(m, jnp.ones(m.n_faces), p, bc)
    assert float(jnp.abs(corr).max()) < 1e-8


def test_read_numerics_tutorials():
    from cudaparticlesfoam_tpu.models.simple import read_numerics

    pitz = read_numerics(os.path.join(TUT, "cudaParticlesUncoupledFoam", "pitzDaily"))
    assert pitz["div_scheme"] == "linearUpwind"
    tj = read_numerics(os.path.join(TUT, "cudaParticlesPimpleFoam", "TJunction"))
    assert tj["div_scheme"] == "limitedLinear"
    assert tj["n_correctors"] == 2 and tj["n_outer"] == 1
