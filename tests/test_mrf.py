"""MRF zones (UEqn.H:3-8, pEqn.H:20) and CorrectPhi (correctPhi.H)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from cudaparticlesfoam_tpu.io import blockmesh, foamfile, polymesh
from cudaparticlesfoam_tpu.models import fv, mrf, pimple

BOX_BMD = """
FoamFile { version 2.0; format ascii; class dictionary; object blockMeshDict; }
scale 1;
vertices (
 (-0.5 -0.5 0) (0.5 -0.5 0) (0.5 0.5 0) (-0.5 0.5 0)
 (-0.5 -0.5 0.1) (0.5 -0.5 0.1) (0.5 0.5 0.1) (-0.5 0.5 0.1)
);
blocks ( hex (0 1 2 3 4 5 6 7) (10 10 2) simpleGrading (1 1 1) );
edges ();
boundary (
 walls { type wall; faces ((0 4 7 3) (1 2 6 5) (0 1 5 4) (3 7 6 2)); }
 frontAndBack { type patch; faces ((0 3 2 1) (4 5 6 7)); }
);
"""


@pytest.fixture(scope="module")
def boxcase(tmp_path_factory):
    case = tmp_path_factory.mktemp("mrfbox")
    for d in ("system", "constant", "0"):
        (case / d).mkdir()
    (case / "system" / "blockMeshDict").write_text(BOX_BMD)
    pm = blockmesh.generate(str(case / "system" / "blockMeshDict"))
    m = fv.fv_mesh(pm)
    return str(case), pm, m


def write_mrf_props(case, zone="rotor", omega=10.0, nonrot=()):
    txt = (
        "FoamFile { version 2.0; format ascii; class dictionary; "
        "object MRFProperties; }\n"
        "zone1\n{\n"
        f"    cellZone {zone};\n    active yes;\n"
        f"    nonRotatingPatches ({' '.join(nonrot)});\n"
        "    origin (0 0 0);\n    axis (0 0 1);\n"
        f"    omega constant {omega};\n}}\n"
    )
    with open(os.path.join(case, "constant", "MRFProperties"), "w") as fh:
        fh.write(txt)


def write_cell_zones(case, pm, name, cells):
    mesh_dir = os.path.join(case, "constant", "polyMesh")
    os.makedirs(mesh_dir, exist_ok=True)
    with open(os.path.join(mesh_dir, "cellZones"), "w") as fh:
        fh.write("FoamFile { version 2.0; format ascii; class regIOobject; "
                 "object cellZones; }\n1\n(\n")
        fh.write(f"{name}\n{{\n    type cellZone;\ncellLabels      "
                 f"List<label>\n{len(cells)}\n(\n")
        fh.write("\n".join(str(c) for c in cells))
        fh.write("\n)\n;\n}\n)\n")


def test_cell_zones_reader(boxcase):
    case, pm, m = boxcase
    cells = [0, 3, 7, 42]
    write_cell_zones(case, pm, "rotor", cells)
    zones = polymesh.read_cell_zones(os.path.join(case, "constant", "polyMesh"))
    np.testing.assert_array_equal(zones["rotor"], cells)


def test_mrf_from_case_masks(boxcase):
    case, pm, m = boxcase
    cells = list(range(pm.n_cells // 2))            # half the domain
    write_cell_zones(case, pm, "rotor", cells)
    write_mrf_props(case, omega=10.0)
    z = mrf.from_case(case, m, pm)
    assert z is not None
    om = np.asarray(z.cell_omega)
    in_zone = np.zeros(pm.n_cells, bool)
    in_zone[cells] = True
    np.testing.assert_allclose(om[in_zone, 2], 10.0)
    np.testing.assert_allclose(om[~in_zone], 0.0)
    # rotational internal faces: both cells in zone
    own = np.asarray(m.owner)
    nei = np.asarray(m.neighbour)
    n_int = m.n_internal
    fom = np.asarray(z.face_omega)
    both = in_zone[own[:n_int]] & in_zone[nei]
    np.testing.assert_allclose(fom[:n_int][both, 2], 10.0)
    np.testing.assert_allclose(fom[:n_int][~both], 0.0)
    # boundary faces of zone cells rotate unless excluded
    bd_in = in_zone[own[n_int:]]
    np.testing.assert_allclose(fom[n_int:][bd_in, 2], 10.0)
    np.testing.assert_allclose(fom[n_int:][~bd_in], 0.0)


def test_mrf_nonrotating_patches(boxcase):
    case, pm, m = boxcase
    write_cell_zones(case, pm, "rotor", list(range(pm.n_cells)))
    write_mrf_props(case, omega=5.0, nonrot=("frontAndBack",))
    z = mrf.from_case(case, m, pm)
    fom = np.asarray(z.face_omega)[m.n_internal:]
    for name, _, start, cnt in m.patch_slices:
        sl = slice(start, start + cnt)
        if name == "frontAndBack":
            np.testing.assert_allclose(fom[sl], 0.0)
        else:
            np.testing.assert_allclose(fom[sl, 2], 5.0)


def test_coriolis_source_analytic(boxcase):
    case, pm, m = boxcase
    write_cell_zones(case, pm, "rotor", list(range(pm.n_cells)))
    write_mrf_props(case, omega=2.0)
    z = mrf.from_case(case, m, pm)
    u = jnp.tile(jnp.asarray([1.0, 0.0, 0.0], m.sf.dtype), (m.n_cells, 1))
    src = np.asarray(mrf.coriolis_source(z, m, u))
    # Omega x u = (0,0,2) x (1,0,0) = (0,2,0); source = -that * V
    np.testing.assert_allclose(src[:, 1], -2.0 * np.asarray(m.vol), rtol=1e-6)
    np.testing.assert_allclose(src[:, [0, 2]], 0.0, atol=1e-12)


def test_make_relative_cancels_solid_rotation(boxcase):
    """flux of the rigid-rotation velocity (a linear field, exactly
    represented by linear face interpolation) equals the frame flux, so
    makeRelative zeroes it on rotational faces."""
    case, pm, m = boxcase
    write_cell_zones(case, pm, "rotor", list(range(pm.n_cells)))
    write_mrf_props(case, omega=3.0)
    z = mrf.from_case(case, m, pm)
    omega = np.array([0.0, 0.0, 3.0])
    cc = np.asarray(m.cc)
    u_rot = np.cross(np.tile(omega, (m.n_cells, 1)), cc)
    u_bcs = fv.make_bcs(m, {}, 3)   # zeroGradient everywhere
    flux = fv.flux_of(m, jnp.asarray(u_rot, m.sf.dtype), u_bcs)
    rel = np.asarray(mrf.make_relative(z, m, flux))
    n_int = m.n_internal
    scale = float(np.abs(np.asarray(flux[:n_int])).max())
    assert np.abs(rel[:n_int]).max() < 1e-5 * max(scale, 1e-12)


def test_correct_boundary_velocity(boxcase):
    case, pm, m = boxcase
    write_cell_zones(case, pm, "rotor", list(range(pm.n_cells)))
    write_mrf_props(case, omega=4.0)
    z = mrf.from_case(case, m, pm)
    spec = {name: ("noSlip", None) for name, *_ in m.patch_slices}
    u_bcs = fv.make_bcs(m, spec, 3)
    fixed = mrf.correct_boundary_velocity(z, m, u_bcs)
    n_int = m.n_internal
    cf = np.asarray(m.cf)[n_int:]
    expect = np.cross(np.tile([0, 0, 4.0], (len(cf), 1)), cf)
    np.testing.assert_allclose(np.asarray(fixed.b), expect, atol=1e-6)


def test_correct_flux_makes_divergence_free(boxcase):
    case, pm, m = boxcase
    # a deliberately non-solenoidal field: u = (x, y, 0) has div = 2
    cc = np.asarray(m.cc)
    u = np.zeros((m.n_cells, 3))
    u[:, 0] = cc[:, 0]
    u[:, 1] = cc[:, 1]
    u_bcs = fv.make_bcs(m, {}, 3)
    flux = fv.flux_of(m, jnp.asarray(u, m.sf.dtype), u_bcs)
    div0 = float(jnp.abs(fv.surface_sum(m, flux)).max())
    # like a real case, p is fixed on an outlet patch: pcorr=0 faces there
    # absorb the net imbalance (all-zeroGradient pcorr would be singular)
    p_bcs = fv.make_bcs(m, {"frontAndBack": ("fixedValue", 0.0)}, 1)
    fixed, res = pimple.correct_flux(m, flux, p_bcs, pin=False)
    div1 = float(jnp.abs(fv.surface_sum(m, fixed)).max())
    assert div0 > 1e-4                 # it really was non-conservative
    assert div1 < 1e-7 * max(div0, 1.0) or div1 < 1e-9


def test_pimple_step_with_mrf_bounded(boxcase):
    """Closed box spun by an MRF zone: a few steps stay finite and the
    rotating-wall BC drives a swirl with the right sign."""
    case, pm, m = boxcase
    write_cell_zones(case, pm, "rotor", list(range(pm.n_cells)))
    write_mrf_props(case, omega=2.0, nonrot=("frontAndBack",))
    z = mrf.from_case(case, m, pm)
    spec = {"walls": ("noSlip", None), "frontAndBack": ("zeroGradient", None)}
    u_bcs = fv.make_bcs(m, spec, 3)
    p_bcs = fv.make_bcs(m, {}, 1)
    st = pimple.FlowState(
        u=jnp.zeros((m.n_cells, 3), m.sf.dtype),
        p=jnp.zeros(m.n_cells, m.sf.dtype),
        flux=jnp.zeros(m.n_faces, m.sf.dtype),
    )
    cfg = pimple.PimpleConfig(nu=0.05, pin_pressure=True, n_correctors=2)
    for _ in range(3):
        st, res = pimple.pimple_step(m, st, u_bcs, p_bcs, cfg, 0.01, mrf=z)
    u = np.asarray(st.u)
    assert np.isfinite(u).all()
    # the spun walls entrain the fluid: angular momentum about z > 0
    cc = np.asarray(m.cc)
    lz = (cc[:, 0] * u[:, 1] - cc[:, 1] * u[:, 0]).sum()
    assert lz > 0.0


def make_mrf_case(tmp_path):
    """Minimal spun-box coupled case with MRFProperties + cellZones."""
    case = tmp_path / "mrfcase"
    for d in ("system", "constant", "0"):
        (case / d).mkdir(parents=True)
    (case / "system" / "blockMeshDict").write_text(BOX_BMD)
    (case / "system" / "controlDict").write_text(
        "FoamFile { object controlDict; }\napplication cudaParticlesPimpleFoam;\n"
        "startFrom startTime;\nstartTime 0;\nendTime 1;\ndeltaT 0.01;\n"
        "writeControl timeStep;\nwriteInterval 1000;\n"
    )
    (case / "system" / "cudaParticlesDict").write_text(
        "FoamFile { object cudaParticlesDict; }\n"
        "seedingBox (-0.2 -0.2 0.02) (0.2 0.2 0.08);\nnumParticles 100;\n"
        "startTime 0;\nendTime 10;\ndt 0.005;\ndiffusionCoeff 1e-6;\n"
        "saveInterval 10;\n"
    )
    (case / "system" / "fvSolution").write_text(
        "FoamFile { object fvSolution; }\n"
        "PIMPLE { nOuterCorrectors 1; nCorrectors 2; }\n"
    )
    (case / "constant" / "transportProperties").write_text(
        "FoamFile { object transportProperties; }\nnu [0 2 -1 0 0 0 0] 0.01;\n"
    )
    (case / "0" / "U").write_text(
        "FoamFile { class volVectorField; object U; }\n"
        "dimensions [0 1 -1 0 0 0 0];\ninternalField uniform (0 0 0);\n"
        "boundaryField { walls { type noSlip; } "
        "frontAndBack { type zeroGradient; } }\n"
    )
    (case / "0" / "p").write_text(
        "FoamFile { class volScalarField; object p; }\n"
        "dimensions [0 2 -2 0 0 0 0];\ninternalField uniform 0;\n"
        "boundaryField { walls { type zeroGradient; } "
        "frontAndBack { type zeroGradient; } }\n"
    )
    pm = blockmesh.generate(str(case / "system" / "blockMeshDict"))
    polymesh.write_polymesh(pm, str(case / "constant" / "polyMesh"))
    write_cell_zones(str(case), pm, "rotor", list(range(pm.n_cells)))
    write_mrf_props(str(case), omega=3.0, nonrot=("frontAndBack",))
    return str(case)


def test_coupled_driver_with_mrf(tmp_path):
    """run_coupled on a case with constant/MRFProperties: the solver loads
    the zones (cudaParticlesPimpleFoam.C:151 path), the spun walls entrain
    the fluid, particles stay located."""
    from cudaparticlesfoam_tpu.models import coupled

    case_dir = make_mrf_case(tmp_path)
    out = str(tmp_path / "out")
    os.makedirs(out)
    logs = []
    case, state, stats = coupled.run_coupled(
        case_dir, out_dir=out, n_steps=4,
        log=lambda *a: logs.append(" ".join(map(str, a))),
    )
    assert any("MRF zones active" in ln for ln in logs)
    u = np.asarray(state.vel)
    pos = np.asarray(state.pos)
    assert np.isfinite(pos).all() and np.isfinite(u).all()
    assert np.asarray(state.active).all()
    assert (np.asarray(state.tet_id) >= 0).all()
