"""Moving-mesh branch (cudaParticlesPimpleFoam.C:144-170): solid-body
motion functions, device-side walk-table refresh, ALE mesh flux, and the
coupled driver on an oscillating box."""

import math
import os

import numpy as np
import jax.numpy as jnp
import pytest

from cudaparticlesfoam_tpu.io import blockmesh, polymesh
from cudaparticlesfoam_tpu.models import dynamicmesh as dyn, fv

BOX_BMD = """
FoamFile { version 2.0; format ascii; class dictionary; object blockMeshDict; }
scale 1;
vertices (
 (0 0 0) (1 0 0) (1 1 0) (0 1 0)
 (0 0 0.2) (1 0 0.2) (1 1 0.2) (0 1 0.2)
);
blocks ( hex (0 1 2 3 4 5 6 7) (8 8 2) simpleGrading (1 1 1) );
edges ();
boundary (
 walls { type wall; faces ((0 4 7 3) (1 2 6 5) (0 1 5 4) (3 7 6 2)
                           (0 3 2 1) (4 5 6 7)); }
);
"""


def test_motion_functions():
    p = np.array([[1.0, 0.0, 0.0]])
    lin = dyn.SolidBodyMotion(kind="linearMotion", velocity=(2.0, 0.0, 0.0))
    np.testing.assert_allclose(lin.transform(p, 1.5), [[4.0, 0.0, 0.0]])
    rot = dyn.SolidBodyMotion(kind="rotatingMotion", omega=math.pi / 2)
    np.testing.assert_allclose(
        rot.transform(p, 1.0), [[0.0, 1.0, 0.0]], atol=1e-12
    )
    osc = dyn.SolidBodyMotion(
        kind="oscillatingLinearMotion", amplitude=(0.0, 0.5, 0.0), omega=math.pi
    )
    np.testing.assert_allclose(
        osc.transform(p, 0.5), [[1.0, 0.5, 0.0]], atol=1e-12
    )
    np.testing.assert_allclose(osc.transform(p, 1.0), p, atol=1e-12)


def test_read_dynamic_mesh(tmp_path):
    (tmp_path / "constant").mkdir()
    (tmp_path / "constant" / "dynamicMeshDict").write_text(
        "FoamFile { version 2.0; format ascii; class dictionary; "
        "object dynamicMeshDict; }\n"
        "dynamicFvMesh solidBodyMotionFvMesh;\n"
        "solidBodyMotionFunction oscillatingLinearMotion;\n"
        "oscillatingLinearMotionCoeffs { amplitude (0 0.1 0); omega 3.14; }\n"
    )
    m = dyn.read_dynamic_mesh(str(tmp_path))
    assert m.kind == "oscillatingLinearMotion"
    assert m.amplitude == (0.0, 0.1, 0.0)
    assert m.omega == pytest.approx(3.14)


def test_read_static_returns_none(tmp_path):
    assert dyn.read_dynamic_mesh(str(tmp_path)) is None
    (tmp_path / "constant").mkdir()
    (tmp_path / "constant" / "dynamicMeshDict").write_text(
        "FoamFile { object dynamicMeshDict; }\ndynamicFvMesh staticFvMesh;\n"
    )
    assert dyn.read_dynamic_mesh(str(tmp_path)) is None


def test_refresh_geometry_matches_rebuild():
    from cudaparticlesfoam_tpu import box_mesh
    from cudaparticlesfoam_tpu.mesh import from_arrays, refresh_geometry

    mesh = box_mesh(3, 3, 3)
    rot = dyn._rodrigues(np.array([0.0, 0.0, 1.0]), 0.3)
    pts_new = np.asarray(mesh.points, dtype=np.float64) @ rot.T + np.array(
        [0.5, -0.2, 0.1]
    )
    moved = refresh_geometry(mesh, pts_new)
    rebuilt = from_arrays(pts_new, np.asarray(mesh.tets),
                          tet_vel=np.asarray(mesh.tet_vel))
    np.testing.assert_allclose(
        np.asarray(moved.tet_a), np.asarray(rebuilt.tet_a), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(moved.tet_tinv), np.asarray(rebuilt.tet_tinv), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(moved.tet_row), np.asarray(rebuilt.tet_row), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(moved.tet_face_d), np.asarray(rebuilt.tet_face_d), atol=1e-6
    )
    # topology untouched
    np.testing.assert_array_equal(
        np.asarray(moved.tet_nbr), np.asarray(mesh.tet_nbr)
    )


def test_mesh_phi_rigid_translation(tmp_path):
    (tmp_path / "system").mkdir()
    (tmp_path / "system" / "blockMeshDict").write_text(BOX_BMD)
    pm = blockmesh.generate(str(tmp_path / "system" / "blockMeshDict"))
    motion = dyn.SolidBodyMotion(kind="linearMotion", velocity=(0.7, 0.0, 0.0))
    dm = dyn.DynamicMesh(motion, pm, dtype=jnp.float64)
    m_new, mesh_phi, bd_vel = dm.update(t_new=0.1, dt=0.1)
    # translation: meshPhi = v . Sf exactly, wall velocity = v
    expect = np.asarray(m_new.sf)[:, 0] * 0.7
    np.testing.assert_allclose(np.asarray(mesh_phi), expect, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(bd_vel), np.tile([0.7, 0.0, 0.0], (len(bd_vel), 1)),
        atol=1e-9,
    )
    # swept flux sums to zero per cell (space conservation, rigid motion)
    div = np.asarray(fv.surface_sum(m_new, mesh_phi))
    assert np.abs(div).max() < 1e-9


def make_oscillating_case(tmp_path, n_particles=200):
    case = tmp_path / "oscbox"
    for d in ("system", "constant", "0"):
        (case / d).mkdir(parents=True)
    (case / "system" / "blockMeshDict").write_text(BOX_BMD)
    (case / "system" / "controlDict").write_text(
        "FoamFile { object controlDict; }\n"
        "application cudaParticlesPimpleFoam;\nstartFrom startTime;\n"
        "startTime 0;\nendTime 1;\ndeltaT 0.02;\nwriteControl timeStep;\n"
        "writeInterval 1000;\n"
    )
    (case / "system" / "cudaParticlesDict").write_text(
        "FoamFile { object cudaParticlesDict; }\n"
        f"seedingBox (0.3 0.3 0.05) (0.7 0.7 0.15);\nnumParticles {n_particles};\n"
        "startTime 0;\nendTime 10;\ndt 0.01;\ndiffusionCoeff 1e-6;\n"
        "saveInterval 10;\n"
    )
    (case / "system" / "fvSchemes").write_text(
        "FoamFile { object fvSchemes; }\n"
        "divSchemes { default none; \"div.*\" Gauss upwind; }\n"
    )
    (case / "system" / "fvSolution").write_text(
        "FoamFile { object fvSolution; }\n"
        "PIMPLE { nOuterCorrectors 1; nCorrectors 2; "
        "nNonOrthogonalCorrectors 0; }\n"
    )
    (case / "constant" / "transportProperties").write_text(
        "FoamFile { object transportProperties; }\n"
        "nu [0 2 -1 0 0 0 0] 0.01;\n"
    )
    (case / "constant" / "dynamicMeshDict").write_text(
        "FoamFile { object dynamicMeshDict; }\n"
        "dynamicFvMesh solidBodyMotionFvMesh;\n"
        "solidBodyMotionFunction oscillatingLinearMotion;\n"
        "oscillatingLinearMotionCoeffs { amplitude (0.2 0 0); omega 6.283; }\n"
    )
    (case / "0" / "U").write_text(
        "FoamFile { class volVectorField; object U; }\n"
        "dimensions [0 1 -1 0 0 0 0];\ninternalField uniform (0 0 0);\n"
        "boundaryField { walls { type movingWallVelocity; "
        "value uniform (0 0 0); } }\n"
    )
    (case / "0" / "p").write_text(
        "FoamFile { class volScalarField; object p; }\n"
        "dimensions [0 2 -2 0 0 0 0];\ninternalField uniform 0;\n"
        "boundaryField { walls { type zeroGradient; } }\n"
    )
    pm = blockmesh.generate(str(case / "system" / "blockMeshDict"))
    polymesh.write_polymesh(pm, str(case / "constant" / "polyMesh"))
    return str(case)


def test_coupled_oscillating_box(tmp_path):
    """Full coupled run on a rigidly oscillating closed box: the moving
    walls entrain the fluid, the particle walk tables track the moving
    geometry, and everything stays bounded and in-domain."""
    from cudaparticlesfoam_tpu.models import coupled

    case_dir = make_oscillating_case(tmp_path)
    out = str(tmp_path / "out")
    os.makedirs(out)
    logs = []
    case, state, stats = coupled.run_coupled(
        case_dir, out_dir=out, n_steps=5,
        log=lambda *a: logs.append(" ".join(map(str, a))),
    )
    assert any("dynamic mesh: oscillatingLinearMotion" in ln for ln in logs)
    u = np.asarray(state.pos)
    assert np.isfinite(u).all()
    act = np.asarray(state.active)
    tet = np.asarray(state.tet_id)
    assert act.all() and (tet >= 0).all()
    # the particle mesh really moved with the motion function
    t = stats["time"]
    expect_shift = 0.2 * math.sin(6.283 * t)
    lo = float(np.asarray(case.tet_mesh.bounds_lo)[0])
    assert lo == pytest.approx(expect_shift, abs=5e-3)
    # fluid got entrained: some nonzero velocity appeared
    assert float(jnp.abs(jnp.asarray(state.vel)).max()) > 1e-4


TWO_ZONE_BMD = """
FoamFile { version 2.0; format ascii; class dictionary; object blockMeshDict; }
scale 1;
vertices (
 (0 0 0) (1 0 0) (1 1 0) (0 1 0)
 (0 0 0.2) (1 0 0.2) (1 1 0.2) (0 1 0.2)
 (2 0 0) (2 1 0) (2 0 0.2) (2 1 0.2)
);
blocks (
 hex (0 1 2 3 4 5 6 7) rotor (6 6 2) simpleGrading (1 1 1)
 hex (1 8 9 2 5 10 11 6) (6 6 2) simpleGrading (1 1 1)
);
edges ();
boundary (
 walls { type wall; faces ((0 4 7 3) (8 9 11 10) (0 1 5 4) (1 8 10 5)
                           (3 7 6 2) (2 6 11 9)
                           (0 3 2 1) (4 5 6 7) (1 2 9 8) (5 10 11 6)); }
);
"""


def test_blockmesh_cell_zones():
    pm = blockmesh.generate(TWO_ZONE_BMD)
    assert pm.cell_zones is not None and "rotor" in pm.cell_zones
    assert len(pm.cell_zones["rotor"]) == 6 * 6 * 2
    # zone cells are the left block (x < 1)
    from cudaparticlesfoam_tpu.io.polymesh import cell_centres_volumes

    ctrs, _ = cell_centres_volumes(pm)
    assert (ctrs[pm.cell_zones["rotor"], 0] < 1.0).all()


def test_cell_zones_roundtrip(tmp_path):
    pm = blockmesh.generate(TWO_ZONE_BMD)
    d = str(tmp_path / "polyMesh")
    polymesh.write_polymesh(pm, d)
    back = polymesh.read_polymesh(d)
    assert set(back.cell_zones) == {"rotor"}
    np.testing.assert_array_equal(back.cell_zones["rotor"],
                                  pm.cell_zones["rotor"])


def test_read_multi_solid_body(tmp_path):
    (tmp_path / "constant").mkdir()
    (tmp_path / "constant" / "dynamicMeshDict").write_text(
        "FoamFile { version 2.0; format ascii; class dictionary; "
        "object dynamicMeshDict; }\n"
        "dynamicFvMesh multiSolidBodyMotionFvMesh;\n"
        "multiSolidBodyMotionFvMeshCoeffs\n{\n"
        " rotor { solidBodyMotionFunction oscillatingLinearMotion;\n"
        "   oscillatingLinearMotionCoeffs { amplitude (0.08 0 0); omega 6.28; } }\n"
        "}\n"
    )
    m = dyn.read_dynamic_mesh(str(tmp_path))
    assert isinstance(m, dyn.MultiSolidBodyMotion)
    assert m.zones[0][0] == "rotor"
    assert m.zones[0][1].kind == "oscillatingLinearMotion"


def test_multi_zone_motion_deforms_interface():
    """Left (rotor) zone oscillates in x, right zone static: zone cells
    translate rigidly, interface cells deform, every volume stays
    positive, and meshPhi satisfies the GCL (div(meshPhi) = dV/dt)."""
    pm = blockmesh.generate(TWO_ZONE_BMD)
    motion = dyn.MultiSolidBodyMotion(zones=(
        ("rotor", dyn.SolidBodyMotion(
            kind="oscillatingLinearMotion", amplitude=(0.08, 0.0, 0.0),
            omega=2.0 * np.pi)),
    ))
    dm = dyn.DynamicMesh(motion, pm, dtype=jnp.float64)
    from cudaparticlesfoam_tpu.io.polymesh import cell_centres_volumes

    _, vols0 = cell_centres_volumes(
        polymesh.PolyMesh(dm.points0, pm.face_verts, pm.face_offsets,
                          pm.owner, pm.neighbour, pm.patches)
    )
    dt = 0.01
    m_new, mesh_phi, _ = dm.update(t_new=0.15, dt=dt)
    ctrs, vols1 = cell_centres_volumes(pm)
    assert (vols1 > 0).all()
    # rotor-zone points moved by the oscillation amplitude at t=0.15
    dxp = 0.08 * np.sin(2.0 * np.pi * 0.15)
    rotor_cells = pm.cell_zones["rotor"]
    inner = ctrs[rotor_cells]
    assert (np.abs(inner[:, 0]) < 2.0).all()
    # cells well inside the rotor zone kept their volume (rigid motion);
    # the interface column (last x-row of the zone) changed volume
    changed = np.abs(vols1 - vols0) / vols0
    assert changed.max() > 0.05           # interface cells deform
    assert np.median(changed[rotor_cells]) < 1e-9   # bulk rigid
    # GCL: sum of meshPhi over each cell's faces ~ (V1 - V0(t-dt))/dt
    pm_prev = polymesh.PolyMesh(dm._points_at(0.15 - dt), pm.face_verts,
                                pm.face_offsets, pm.owner, pm.neighbour,
                                pm.patches)
    _, vols_prev = cell_centres_volumes(pm_prev)
    div = np.zeros(pm.n_cells)
    np.add.at(div, pm.owner, np.asarray(mesh_phi))
    np.add.at(div, pm.neighbour, -np.asarray(mesh_phi)[: pm.n_internal_faces])
    dvdt = (vols1 - vols_prev) / dt
    np.testing.assert_allclose(div, dvdt, atol=2e-4 * vols0.max() / dt * dt)


def test_coupled_flow_on_multi_zone_mesh(tmp_path):
    """The PIMPLE solver advances on the deforming two-zone mesh without
    NaNs, without spurious ALE currents (u=0 is exact for interior-zone
    deformation in a rigid closed box), and with bounded continuity."""
    case = tmp_path
    (case / "system").mkdir()
    (case / "constant").mkdir()
    (case / "0").mkdir()
    (case / "system" / "blockMeshDict").write_text(TWO_ZONE_BMD)
    (case / "system" / "controlDict").write_text(
        "FoamFile { version 2.0; format ascii; class dictionary; object controlDict; }\n"
        "application pimpleFoam; startFrom startTime; startTime 0; endTime 1;\n"
        "deltaT 0.005; writeControl timeStep; writeInterval 1000;\n"
    )
    (case / "system" / "fvSolution").write_text(
        "FoamFile { version 2.0; format ascii; class dictionary; object fvSolution; }\n"
        "PIMPLE { nOuterCorrectors 1; nCorrectors 2; nNonOrthogonalCorrectors 0; }\n"
    )
    (case / "system" / "fvSchemes").write_text(
        "FoamFile { version 2.0; format ascii; class dictionary; object fvSchemes; }\n"
        "divSchemes { default none; \"div\\(phi,U\\)\" Gauss upwind; }\n"
    )
    (case / "constant" / "transportProperties").write_text(
        "FoamFile { version 2.0; format ascii; class dictionary; object transportProperties; }\n"
        "nu [0 2 -1 0 0 0 0] 0.01;\n"
    )
    (case / "constant" / "dynamicMeshDict").write_text(
        "FoamFile { version 2.0; format ascii; class dictionary; object dynamicMeshDict; }\n"
        "dynamicFvMesh multiSolidBodyMotionFvMesh;\n"
        "multiSolidBodyMotionFvMeshCoeffs\n{\n"
        " rotor { solidBodyMotionFunction oscillatingLinearMotion;\n"
        "   oscillatingLinearMotionCoeffs { amplitude (0.05 0 0); omega 6.2832; } }\n"
        "}\n"
    )
    (case / "0" / "U").write_text(
        "FoamFile { version 2.0; format ascii; class volVectorField; object U; }\n"
        "dimensions [0 1 -1 0 0 0 0];\ninternalField uniform (0 0 0);\n"
        "boundaryField { walls { type noSlip; } }\n"
    )
    (case / "0" / "p").write_text(
        "FoamFile { version 2.0; format ascii; class volScalarField; object p; }\n"
        "dimensions [0 2 -2 0 0 0 0];\ninternalField uniform 0;\n"
        "boundaryField { walls { type zeroGradient; } }\n"
    )
    pm = blockmesh.generate(str(case / "system" / "blockMeshDict"))
    polymesh.write_polymesh(pm, str(case / "constant" / "polyMesh"))

    from cudaparticlesfoam_tpu.models import case as caselib
    from cudaparticlesfoam_tpu.models.pimple import FlowSolver

    class _FakeCase:
        case_dir = str(case)
        poly = pm
        time_value = 0.0

    flow = FlowSolver.from_case(_FakeCase(), log=lambda *a: None)
    assert flow.dyn is not None and flow.dyn._zone_pts is not None
    for _ in range(3):
        res = flow.advance(0.005)
    u = np.asarray(flow.state.u)
    assert np.isfinite(u).all()
    # interior-zone deformation inside rigid walls leaves the PHYSICAL
    # domain unchanged: u = 0 is the exact solution, and any velocity the
    # scheme produces is a spurious ALE current -- require it negligible
    # (the midpoint meshPhi satisfies the GCL to discretization accuracy)
    assert np.abs(u).max() < 1e-4
    assert res["continuity"] < 1e-3


# ---------------------------------------------------------------------------
# Laplacian motion solvers (deforming mesh)
# ---------------------------------------------------------------------------

CHANNEL_BMD = """
FoamFile { version 2.0; format ascii; class dictionary; object blockMeshDict; }
scale 1;
vertices (
 (0 0 0) (2 0 0) (2 1 0) (0 1 0)
 (0 0 0.2) (2 0 0.2) (2 1 0.2) (0 1 0.2)
);
blocks ( hex (0 1 2 3 4 5 6 7) (12 6 2) simpleGrading (1 1 1) );
edges ();
boundary (
 movingWall { type wall; faces ((0 4 7 3)); }
 farWall    { type wall; faces ((1 2 6 5)); }
 sides      { type wall; faces ((0 1 5 4) (3 7 6 2) (0 3 2 1) (4 5 6 7)); }
);
"""


def make_motion_solver_case(tmp_path, solver="velocityLaplacian",
                            diffusivity="uniform;"):
    case = tmp_path / "lapcase"
    for d in ("system", "constant", "0"):
        (case / d).mkdir(parents=True)
    (case / "system" / "blockMeshDict").write_text(CHANNEL_BMD)
    (case / "constant" / "dynamicMeshDict").write_text(
        "FoamFile { object dynamicMeshDict; }\n"
        "dynamicFvMesh dynamicMotionSolverFvMesh;\n"
        "motionSolverLibs (\"libfvMotionSolvers.so\");\n"
        f"motionSolver {solver};\n"
        f"diffusivity {diffusivity}\n"
    )
    field = ("pointDisplacement" if solver == "displacementLaplacian"
             else "pointMotionU")
    if solver == "displacementLaplacian":
        mv_bc = ("movingWall { type oscillatingDisplacement; "
                 "amplitude (0.2 0 0); omega 6.2832; "
                 "value uniform (0 0 0); }")
    else:
        mv_bc = "movingWall { type fixedValue; value uniform (0.5 0 0); }"
    (case / "0" / field).write_text(
        f"FoamFile {{ class pointVectorField; object {field}; }}\n"
        "dimensions [0 1 -1 0 0 0 0];\ninternalField uniform (0 0 0);\n"
        "boundaryField {\n"
        f" {mv_bc}\n"
        " farWall { type fixedValue; value uniform (0 0 0); }\n"
        " sides { type slip; }\n"
        "}\n"
    )
    pm = blockmesh.generate(str(case / "system" / "blockMeshDict"))
    polymesh.write_polymesh(pm, str(case / "constant" / "polyMesh"))
    return str(case), pm


def test_parse_motion_solver(tmp_path):
    case_dir, _ = make_motion_solver_case(
        tmp_path, diffusivity="inverseDistance (movingWall);"
    )
    from cudaparticlesfoam_tpu.models import motionsolver as ms

    m = dyn.read_dynamic_mesh(case_dir)
    assert isinstance(m, ms.MotionSolverMotion)
    assert m.kind == "velocityLaplacian"
    assert m.diffusivity == ("inverseDistance", ("movingWall",))
    bcs = dict(m.bcs)
    assert bcs["movingWall"].btype == "fixedValue"
    assert bcs["movingWall"].value == (0.5, 0.0, 0.0)
    assert bcs["farWall"].btype == "fixedValue"
    assert bcs["sides"].btype == "zeroGradient"


def test_velocity_laplacian_motion(tmp_path):
    """velocityLaplacian: moving wall advances at the prescribed velocity,
    far wall stays, interior deforms smoothly and monotonically, volumes
    stay positive, and meshPhi satisfies the GCL."""
    case_dir, pm = make_motion_solver_case(tmp_path)
    motion = dyn.read_dynamic_mesh(case_dir)
    dm = dyn.DynamicMesh(motion, pm, dtype=jnp.float64)
    from cudaparticlesfoam_tpu.io.polymesh import cell_centres_volumes

    _, vols_prev = cell_centres_volumes(
        polymesh.PolyMesh(dm.points0, pm.face_verts, pm.face_offsets,
                          pm.owner, pm.neighbour, pm.patches)
    )
    dt = 0.05
    for istep, t in enumerate((dt, 2 * dt, 3 * dt)):
        m_new, mesh_phi, _ = dm.update(t_new=t, dt=dt)
        _, vols = cell_centres_volumes(pm)
        assert (vols > 0).all()
        # GCL: per-cell swept flux sum == dV/dt (midpoint rule is exact
        # for the per-step linear point motion here)
        div = np.zeros(pm.n_cells)
        np.add.at(div, pm.owner, np.asarray(mesh_phi))
        np.add.at(div, pm.neighbour,
                  -np.asarray(mesh_phi)[: pm.n_internal_faces])
        np.testing.assert_allclose(div, (vols - vols_prev) / dt,
                                   atol=1e-10)
        vols_prev = vols
    pts = pm.points
    # the moving-wall plane (x=0 initially) moved by ~ v*t (0.5 * 0.15)
    mv = pts[np.isclose(dm.points0[:, 0], 0.0)]
    np.testing.assert_allclose(mv[:, 0], 0.075, atol=1e-6)
    # far wall pinned
    fw = pts[np.isclose(dm.points0[:, 0], 2.0)]
    np.testing.assert_allclose(fw[:, 0], 2.0, atol=1e-12)
    # interior deformation is monotone in x (no crossings): x columns of
    # the structured mesh keep their order
    xs0 = np.unique(np.round(dm.points0[:, 0], 9))
    xs_now = [float(np.mean(pts[np.isclose(dm.points0[:, 0], x0), 0]))
              for x0 in xs0]
    assert all(a < b for a, b in zip(xs_now, xs_now[1:]))
    # and y/z were untouched by the x-only motion
    np.testing.assert_allclose(pts[:, 1:], dm.points0[:, 1:], atol=1e-8)


def test_displacement_laplacian_motion(tmp_path):
    """displacementLaplacian with an oscillatingDisplacement wall: points
    track amplitude*sin(omega*t) ABSOLUTELY (total displacement from the
    t=0 configuration, not accumulated velocity)."""
    case_dir, pm = make_motion_solver_case(
        tmp_path, solver="displacementLaplacian"
    )
    motion = dyn.read_dynamic_mesh(case_dir)
    assert motion.kind == "displacementLaplacian"
    dm = dyn.DynamicMesh(motion, pm, dtype=jnp.float64)
    import math as _m

    dt = 0.025
    for t in (dt, 2 * dt, 3 * dt, 4 * dt):
        dm.update(t_new=t, dt=dt)
        mv = pm.points[np.isclose(dm.points0[:, 0], 0.0)]
        np.testing.assert_allclose(
            mv[:, 0], 0.2 * _m.sin(6.2832 * t), atol=1e-6
        )
    from cudaparticlesfoam_tpu.io.polymesh import cell_centres_volumes

    _, vols = cell_centres_volumes(pm)
    assert (vols > 0).all()


def test_coupled_flow_on_laplacian_mesh(tmp_path):
    """PIMPLE advances on the velocityLaplacian-deforming channel: the
    moving wall drives the fluid (movingWallVelocity) and the solve stays
    finite with bounded continuity."""
    case_dir, pm = make_motion_solver_case(tmp_path)
    case = tmp_path / "lapcase"
    (case / "system" / "controlDict").write_text(
        "FoamFile { object controlDict; }\n"
        "application pimpleFoam; startFrom startTime; startTime 0; endTime 1;\n"
        "deltaT 0.01; writeControl timeStep; writeInterval 1000;\n"
    )
    (case / "system" / "fvSolution").write_text(
        "FoamFile { object fvSolution; }\n"
        "PIMPLE { nOuterCorrectors 1; nCorrectors 2; "
        "nNonOrthogonalCorrectors 0; }\n"
    )
    (case / "system" / "fvSchemes").write_text(
        "FoamFile { object fvSchemes; }\n"
        "divSchemes { default none; \"div.*\" Gauss upwind; }\n"
    )
    (case / "constant" / "transportProperties").write_text(
        "FoamFile { object transportProperties; }\n"
        "nu [0 2 -1 0 0 0 0] 0.01;\n"
    )
    # the far end is OPEN (outlet): a piston advancing into a closed
    # incompressible box has no solution — displaced volume must leave
    (case / "0" / "U").write_text(
        "FoamFile { class volVectorField; object U; }\n"
        "dimensions [0 1 -1 0 0 0 0];\ninternalField uniform (0 0 0);\n"
        "boundaryField { movingWall { type movingWallVelocity; "
        "value uniform (0 0 0); }\n"
        " farWall { type zeroGradient; } sides { type noSlip; } }\n"
    )
    (case / "0" / "p").write_text(
        "FoamFile { class volScalarField; object p; }\n"
        "dimensions [0 2 -2 0 0 0 0];\ninternalField uniform 0;\n"
        "boundaryField { movingWall { type zeroGradient; } "
        "farWall { type fixedValue; value uniform 0; } "
        "sides { type zeroGradient; } }\n"
    )
    from cudaparticlesfoam_tpu.models.pimple import FlowSolver

    class _FakeCase:
        case_dir = str(case)
        poly = pm
        time_value = 0.0

    logs = []
    flow = FlowSolver.from_case(_FakeCase(), log=lambda *a: logs.append(
        " ".join(map(str, a))))
    assert flow.dyn is not None and flow.dyn._lap is not None
    assert any("velocityLaplacian" in ln for ln in logs)
    for _ in range(3):
        res = flow.advance(0.01)
    u = np.asarray(flow.state.u)
    assert np.isfinite(u).all()
    # the compressed fluid must move away from the advancing wall
    assert float(np.abs(u[:, 0]).max()) > 1e-3
    assert res["continuity"] < 1e-2


def test_amg_active_under_motion(tmp_path):
    """The AMG preconditioner is no longer dropped on moving meshes: the
    hierarchy is topological and the Galerkin coarse ops rebuild per
    solve, so p_solver='amg' must stay active and converge."""
    case_dir, pm = make_motion_solver_case(tmp_path)
    case = tmp_path / "lapcase"
    (case / "system" / "controlDict").write_text(
        "FoamFile { object controlDict; }\n"
        "application pimpleFoam; startFrom startTime; startTime 0; endTime 1;\n"
        "deltaT 0.01; writeControl timeStep; writeInterval 1000;\n"
    )
    (case / "system" / "fvSolution").write_text(
        "FoamFile { object fvSolution; }\n"
        "solvers { p { solver GAMG; tolerance 1e-7; } }\n"
        "PIMPLE { nOuterCorrectors 1; nCorrectors 2; "
        "nNonOrthogonalCorrectors 0; }\n"
    )
    (case / "system" / "fvSchemes").write_text(
        "FoamFile { object fvSchemes; }\n"
        "divSchemes { default none; \"div.*\" Gauss upwind; }\n"
    )
    (case / "constant" / "transportProperties").write_text(
        "FoamFile { object transportProperties; }\n"
        "nu [0 2 -1 0 0 0 0] 0.01;\n"
    )
    (case / "0" / "U").write_text(
        "FoamFile { class volVectorField; object U; }\n"
        "dimensions [0 1 -1 0 0 0 0];\ninternalField uniform (0 0 0);\n"
        "boundaryField { movingWall { type movingWallVelocity; "
        "value uniform (0 0 0); }\n"
        " farWall { type zeroGradient; } sides { type noSlip; } }\n"
    )
    (case / "0" / "p").write_text(
        "FoamFile { class volScalarField; object p; }\n"
        "dimensions [0 2 -2 0 0 0 0];\ninternalField uniform 0;\n"
        "boundaryField { movingWall { type zeroGradient; } "
        "farWall { type fixedValue; value uniform 0; } "
        "sides { type zeroGradient; } }\n"
    )
    from cudaparticlesfoam_tpu.models.pimple import FlowSolver

    class _FakeCase:
        case_dir = str(case)
        poly = pm
        time_value = 0.0

    flow = FlowSolver.from_case(_FakeCase(), log=lambda *a: None)
    assert flow.dyn is not None
    assert flow.amg is not None and flow.cfg.p_solver == "amg"
    for _ in range(3):
        res = flow.advance(0.01)
    assert np.isfinite(np.asarray(flow.state.u)).all()
    assert res["continuity"] < 1e-2
