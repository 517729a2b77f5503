"""Mesh construction tests: face tables, adjacency, boundary extraction,
box fixture parity with HostTetMesh::createBoxMesh / getBoundaryMesh."""

import numpy as np
import pytest

from cudaparticlesfoam_tpu import mesh as meshlib


def unit_tet_mesh():
    points = np.array(
        [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    )
    tets = np.array([[0, 1, 2, 3]])
    return meshlib.from_arrays(points, tets)


def two_tet_mesh():
    # two tets sharing face (0,1,2)
    points = np.array(
        [
            [0.0, 0.0, 0.0],
            [1.0, 0.0, 0.0],
            [0.0, 1.0, 0.0],
            [0.0, 0.0, 1.0],
            [0.3, 0.3, -1.0],
        ]
    )
    tets = np.array([[0, 1, 2, 3], [0, 2, 1, 4]])
    return meshlib.from_arrays(points, tets)


def test_single_tet_counts():
    m = unit_tet_mesh()
    assert m.n_tets == 1
    assert m.n_faces == 4
    assert m.n_bd_faces == 4
    # every neighbor is a boundary code
    assert (np.asarray(m.tet_nbr) < 0).all()


def test_two_tet_adjacency():
    m = two_tet_mesh()
    assert m.n_tets == 2
    assert m.n_faces == 7
    assert m.n_bd_faces == 6
    nbr = np.asarray(m.tet_nbr)
    # exactly one interior face each, pointing at the other tet
    assert (nbr[0] == 1).sum() == 1
    assert (nbr[1] == 0).sum() == 1
    # shared face is opposite vertex D in tet 0 (slot 3: face 0,2,1)
    assert nbr[0, 3] == 1


def test_front_back_consistency():
    m = two_tet_mesh()
    front = np.asarray(m.face_front)
    back = np.asarray(m.face_back)
    faces = np.asarray(m.faces)
    # each face has at least one real tet side; shared face has both
    for f in range(m.n_faces):
        sides = [s for s in (front[f], back[f]) if s >= 0]
        assert len(sides) in (1, 2)
    # interior face: both sides real and different
    interior = [(f, front[f], back[f]) for f in range(m.n_faces)
                if front[f] >= 0 and back[f] >= 0]
    assert len(interior) == 1
    _, fr, bk = interior[0]
    assert {fr, bk} == {0, 1}


def test_winding_canonicalization():
    # negative-volume input tet gets fixed; tables identical to positive one
    points = np.array(
        [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    )
    m_neg = meshlib.from_arrays(points, np.array([[1, 0, 2, 3]]))
    a, b, c, d = (points[np.asarray(m_neg.tets)[0][i]] for i in range(4))
    vol = np.dot(d - a, np.cross(b - a, c - a))
    assert vol > 0


def test_outward_normals_unit_tet():
    m = unit_tet_mesh()
    n = np.asarray(m.tet_face_n)[0]   # [4,3]
    d = np.asarray(m.tet_face_d)[0]
    centroid = np.array([0.25, 0.25, 0.25]) / 1.0
    # centroid strictly inside: n.c - d < 0 for all outward planes
    assert ((n @ centroid) - d < 0).all()
    # slot i is opposite vertex i: vertex i on negative side, others on plane
    verts = np.asarray(m.points)[np.asarray(m.tets)[0]]
    for slot in range(4):
        dist = verts @ n[slot] - d[slot]
        assert dist[slot] < -1e-12
        others = np.delete(dist, slot)
        np.testing.assert_allclose(others, 0.0, atol=1e-12)


def test_box_mesh_reference_layout():
    m = meshlib.box_mesh(2, 2, 2)
    # 8 hexes * 6 tets, 27 verts (HostTetMesh.h:62-144)
    assert m.n_tets == 48
    assert m.n_points == 27
    pts = np.asarray(m.points)
    # vertex ordering: x fastest, then y, then z
    np.testing.assert_allclose(pts[0], [0, 0, 0])
    np.testing.assert_allclose(pts[1], [1, 0, 0])
    np.testing.assert_allclose(pts[3], [0, 1, 0])
    np.testing.assert_allclose(pts[9], [0, 0, 1])
    # center vertex has velocity (1,0,0)
    vv = np.asarray(m.vert_vel)
    cidx = 13  # (1,1,1) in a 3^3 grid
    np.testing.assert_allclose(pts[cidx], [1, 1, 1])
    np.testing.assert_allclose(vv[cidx], [1, 0, 0])
    # corner velocity is normalized radial
    np.testing.assert_allclose(vv[0], -np.ones(3) / np.sqrt(3), atol=1e-12)
    # all tets positive volume
    a, b, c, d = (pts[np.asarray(m.tets)[:, i]] for i in range(4))
    vols = np.einsum("ij,ij->i", d - a, np.cross(b - a, c - a))
    assert (vols > 0).all()
    # total volume = box volume
    assert vols.sum() / 6.0 == pytest.approx(8.0)
    # boundary of a box: 2 tris per square face * 6 faces * (2*2) = 48
    assert m.n_bd_faces == 48


def test_box_mesh_boundary_tris_outward():
    m = meshlib.box_mesh(1, 1, 1)
    pts = np.asarray(m.points)
    tris = np.asarray(m.bd_tris)
    centroid = pts.mean(axis=0)
    for t in tris:
        a, b, c = pts[t[0]], pts[t[1]], pts[t[2]]
        n = np.cross(b - a, c - a)
        assert np.dot(n, a - centroid) > 0  # outward


def test_replace_velocity():
    m = meshlib.box_mesh(1, 1, 1)
    new_tv = np.ones((m.n_tets, 3))
    m2 = meshlib.replace_velocity(m, tet_vel=new_tv)
    np.testing.assert_allclose(np.asarray(m2.tet_vel), 1.0)
    # untouched fields shared
    assert m2.points is m.points


def test_read_dataset_ascii(tmp_path):
    # the reference's ASCII vert/cell/solution format (HostTetMesh.h:146-262)
    vert = tmp_path / "vert.dat"
    cell = tmp_path / "cell.dat"
    solc = tmp_path / "solc.dat"
    vert.write_text(
        "NumTetVerts = 4\nx y z\n0 0 0\n1 0 0\n0 1 0\n0 0 1\n"
    )
    # negative-volume winding on purpose: reader must fix it
    cell.write_text("NumTetCells = 1\nid1 id2 id3 id4\n1 0 2 3\n")
    solc.write_text("p u v w\n-0.5 1.0 2.0 3.0\n")
    m = meshlib.read_dataset(str(vert), str(cell), solc_fname=str(solc))
    assert m.n_tets == 1 and m.n_points == 4
    np.testing.assert_allclose(np.asarray(m.tet_vel)[0], [1.0, 2.0, 3.0])
    pts = np.asarray(m.points)
    t = np.asarray(m.tets)[0]
    a, b, c, d = pts[t[0]], pts[t[1]], pts[t[2]], pts[t[3]]
    assert np.dot(d - a, np.cross(b - a, c - a)) > 0


def test_dataset_pk_pipeline(tmp_path):
    """The reference's dataset path end-to-end: readDataSet with a
    PER-VERTEX solution (HostTetMesh.h:146-262) -> pk row table ->
    VertexVelocity advection on the cached engine.  A linear velocity
    field u = (x, 0, 0) is reproduced exactly by P1 interpolation, so a
    particle's dx/dt = x and one Euler step moves it by x*dt."""
    import jax.numpy as jnp

    from cudaparticlesfoam_tpu import StepConfig, run_cycles, make_state
    from cudaparticlesfoam_tpu.ops import locate as locate_ops

    # two unit cubes side by side, 6 tets each, via the box fixture
    box = meshlib.box_mesh(2, 1, 1)
    pts = np.asarray(box.points)
    tets = np.asarray(box.tets)
    vert = tmp_path / "vert.dat"
    cell = tmp_path / "cell.dat"
    solv = tmp_path / "solv.dat"
    vert.write_text(
        f"NumTetVerts = {len(pts)}\nx y z\n"
        + "\n".join(" ".join(f"{v:.17g}" for v in p) for p in pts)
        + "\n"
    )
    cell.write_text(
        f"NumTetCells = {len(tets)}\nid1 id2 id3 id4\n"
        + "\n".join(" ".join(map(str, t)) for t in tets)
        + "\n"
    )
    solv.write_text(
        "p u v w\n"
        + "\n".join(f"0 {p[0]:.17g} 0 0" for p in pts)
        + "\n"
    )
    m = meshlib.read_dataset(str(vert), str(cell), solv_fname=str(solv))
    m = meshlib.with_pk_rows(m)
    loc = locate_ops.build_grid_locator(m)
    pos0 = np.array([[0.25, 0.5, 0.5], [1.5, 0.3, 0.7], [0.9, 0.9, 0.1]])
    st = make_state(pos0)
    st = __import__("dataclasses").replace(
        st, tet_id=jnp.asarray(locate_ops.locate_seeds(m, loc, st.pos))
    )
    dt = 0.05
    cfg = StepConfig(dt=dt, use_brownian=False,
                     velocity_interp="VertexVelocity")
    assert cfg.resolved_engine() == "cached"
    out = run_cycles(m, st, cfg, 1)
    np.testing.assert_allclose(
        np.asarray(out.pos)[:, 0], pos0[:, 0] * (1 + dt), rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(out.pos)[:, 1:], pos0[:, 1:],
                               atol=1e-7)


def test_native_base_points_match_numpy_up_to_ties():
    """The OpenMP C++ base-point builder (csrc/meshbuild.cpp) must agree
    with the numpy reference implementation everywhere the quality argmax
    is decisive; disagreements are allowed ONLY on exact ties (regular
    cells, where both picks are equivalent decompositions).  Face centres
    and areas must be bit-identical."""
    import pytest

    from cudaparticlesfoam_tpu.io import blockmesh, polymesh
    import cudaparticlesfoam_tpu.io.native as native

    if native._build_and_load_meshbuild() is None:
        pytest.skip("no native toolchain")
    import os as _os

    bmd = _os.path.join(
        _os.path.dirname(__file__), "..", "tutorials", "incompressible",
        "cudaParticlesUncoupledFoam", "pitzDaily", "system", "blockMeshDict",
    )
    pm = blockmesh.generate(bmd)
    fc_nat = polymesh.face_centres_areas(pm)

    orig_fba = native.face_base_points
    orig_fca = native.face_centres_areas
    native.face_base_points = lambda *a, **k: None
    native.face_centres_areas = lambda *a, **k: None
    try:
        fc_py = polymesh.face_centres_areas(pm)
        cc, _ = polymesh.cell_centres_volumes(pm, *fc_py)
        base_py = polymesh.face_base_points(pm, cc)
    finally:
        native.face_base_points = orig_fba
        native.face_centres_areas = orig_fca
    np.testing.assert_array_equal(fc_nat[0], fc_py[0])
    np.testing.assert_array_equal(fc_nat[1], fc_py[1])

    base_nat = polymesh.face_base_points(pm, cc)

    mism = np.nonzero(base_nat != base_py)[0]
    if len(mism) == 0:
        return
    # every disagreement must be an exact tie: min fan quality of the two
    # picks within FP noise of each other
    pts = pm.points

    def min_quality(f, c):
        o, k = pm.face_offsets[f], pm.face_offsets[f + 1] - pm.face_offsets[f]
        fv = pm.face_verts[o : o + k]
        apexes = [cc[pm.owner[f]]]
        if f < pm.n_internal_faces:
            apexes.append(cc[pm.neighbour[f]])
        q = np.inf
        b = pts[fv[c]]
        for i in range(1, k - 1):
            pa, pb = pts[fv[(c + i) % k]], pts[fv[(c + i + 1) % k]]
            for j, apex in enumerate(apexes):
                t = (pa, pb) if j == 0 else (pb, pa)
                q = min(q, float(
                    polymesh._tet_quality(
                        apex[None], b[None], t[0][None], t[1][None]
                    )[0]
                ))
        return q

    for f in mism[:: max(len(mism) // 50, 1)]:   # sample up to ~50 faces
        qn = min_quality(int(f), int(base_nat[f]))
        qp = min_quality(int(f), int(base_py[f]))
        assert abs(qn - qp) <= 1e-9 * max(abs(qn), abs(qp)), (
            f, qn, qp, "non-tie disagreement between builders"
        )


def test_native_tet_tables_bit_exact():
    """The OpenMP C++ canonicalize + face-table + walk-table builder
    (csrc/meshbuild.cpp) must be BIT-exact against the numpy reference
    implementation on a graded real mesh — unlike the base-point search
    there is no tie-breaking freedom here."""
    import pytest

    import cudaparticlesfoam_tpu.io.native as native
    from cudaparticlesfoam_tpu import mesh as meshlib
    from cudaparticlesfoam_tpu.io import blockmesh, polymesh

    if native._build_and_load_meshbuild() is None:
        pytest.skip("no native toolchain")
    import os as _os

    bmd = _os.path.join(
        _os.path.dirname(__file__), "..", "tutorials", "incompressible",
        "cudaParticlesUncoupledFoam", "pitzDaily", "system", "blockMeshDict",
    )
    pm = blockmesh.generate(bmd)
    fc = polymesh.face_centres_areas(pm)
    cc, _ = polymesh.cell_centres_volumes(pm, *fc)
    tets, _, _ = polymesh.tet_decompose(pm, cc)
    pts = np.concatenate([pm.points, cc])

    nat = native.build_tet_tables(pts, tets)
    assert nat is not None
    t2 = meshlib._canonicalize_winding(
        np.asarray(pts, np.float64), np.asarray(tets, np.int64)
    )
    ft = meshlib.build_face_tables(t2)
    wt = meshlib._build_walk_table(
        np.asarray(pts, np.float64), t2, ft[1], ft[2], ft[3], ft[4]
    )
    for name, ref, got in zip(
        ("tets", "faces", "tet_faces", "face_front", "face_back",
         "bd_face_ids", "bd_tet", "bd_slot", "a", "tinv", "nbr", "n", "dpl"),
        [t2, *ft, *wt],
        nat,
    ):
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got), name)


def test_inv3_jnp_matches_host_adjugate():
    """The device 3x3 inverse (refresh_geometry's _inv3_jnp) is the same
    adjugate formula as the host builder's _inv3 — jnp.linalg.inv is NOT
    usable there (its padded batched LU is a ~2000x HLO temp at 5M
    tets).  Pin parity against the host twin and against the LAPACK
    answer."""
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    m = rng.normal(size=(257, 3, 3))
    # keep conditioning sane: push diagonals away from singularity
    m += 3.0 * np.eye(3)
    host = meshlib._inv3(m)
    dev = np.asarray(meshlib._inv3_jnp(jnp.asarray(m)))
    np.testing.assert_allclose(dev, host, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(dev, np.linalg.inv(m), rtol=1e-9, atol=1e-10)


def test_box_points_tets_is_box_mesh():
    """box_mesh == from_arrays(box_points_tets(...)) — the factoring that
    lets bench.py jitter points BEFORE the (single) host table build."""
    pts, tets, vv = meshlib.box_points_tets(3, 2, 4)
    tv = vv[tets].mean(axis=1)
    a = meshlib.box_mesh(3, 2, 4)
    b = meshlib.from_arrays(pts, tets, tet_vel=tv, vert_vel=vv)
    np.testing.assert_array_equal(np.asarray(a.tets), np.asarray(b.tets))
    np.testing.assert_array_equal(np.asarray(a.points), np.asarray(b.points))
    np.testing.assert_array_equal(np.asarray(a.tet_row), np.asarray(b.tet_row))
    np.testing.assert_array_equal(
        np.asarray(a.tet_nbr), np.asarray(b.tet_nbr)
    )
