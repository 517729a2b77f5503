"""Function objects: probes, scalar transport, flow streamlines."""

import numpy as np
import jax.numpy as jnp
import pytest

from cudaparticlesfoam_tpu.io import blockmesh
from cudaparticlesfoam_tpu.models import functions as fo, fv, simple
from tests.test_flow import channel  # fixture


def test_probes(channel, tmp_path):
    case, pm = channel
    m = fv.fv_mesh(pm)
    pr = fo.Probes(m, [[0.5, 0.05, 0.005], [1.5, 0.02, 0.005]])
    p = np.arange(m.n_cells, dtype=np.float64)
    u = np.tile([1.0, 2.0, 3.0], (m.n_cells, 1))
    pr.sample(0.1, {"p": p, "U": u})
    pr.sample(0.2, {"p": p + 1, "U": u})
    out = pr.write(str(tmp_path))
    txt = open(f"{out}/p").read()
    assert "Probe 0" in txt and "0.1" in txt and "0.2" in txt
    txt_u = open(f"{out}/U").read()
    assert "(1 2 3)" in txt_u


def test_scalar_transport_unity_source(channel):
    # pure source (no flux): ds/dt = 1 -> s = t
    case, pm = channel
    m = fv.fv_mesh(pm)
    st = fo.ScalarTransport.__new__(fo.ScalarTransport)
    st.m = m
    st.field = "s"
    st.diffusivity = 0.0
    st.source_su = 1.0
    st.bcs = fv.make_bcs(m, {}, 1)
    st.s = jnp.zeros(m.n_cells, m.sf.dtype)
    flux = jnp.zeros(m.n_faces, m.sf.dtype)
    for _ in range(10):
        st.advance(flux, 0.1)
    np.testing.assert_allclose(np.asarray(st.s), 1.0, rtol=1e-4)


def test_scalar_transport_advection(channel):
    # uniform flux advects a front downstream, stays bounded [0, 1]
    case, pm = channel
    m, fst, u_bcs, *_ = simple.load_flow_case(case, pm=pm)
    st = fo.ScalarTransport.__new__(fo.ScalarTransport)
    st.m = m
    st.field = "s"
    st.diffusivity = 1e-6
    st.source_su = 0.0
    st.bcs = fv.make_bcs(m, {"inlet": ("fixedValue", 1.0)}, 1)
    st.s = jnp.zeros(m.n_cells, m.sf.dtype)
    for _ in range(100):
        st.advance(fst.flux, 0.02)        # inflow u=1, domain length 2
    s = np.asarray(st.s)
    cc = np.asarray(m.cc)
    assert s[cc[:, 0] < 0.5].mean() > 0.6      # front has passed x=0.5 (t=2)
    assert (s > -1e-3).all() and (s < 1.0 + 1e-3).all()


def test_streamlines(channel):
    from cudaparticlesfoam_tpu.io import polymesh as pmx
    from cudaparticlesfoam_tpu.ops import locate as locate_ops

    case, pm = channel
    u = np.tile([1.0, 0.0, 0.0], (pm.n_cells, 1))
    tet_mesh, _ = pmx.mesh_from_polymesh(pm, u_cells=u)
    loc = locate_ops.build_grid_locator(tet_mesh)
    seeds = [[0.1, 0.05, 0.005], [0.1, 0.03, 0.005]]
    lines = fo.trace_streamlines(tet_mesh, loc, seeds, step_length=0.01,
                                 n_steps=100)
    assert len(lines) == 2
    # straight +x lines
    line = np.asarray(lines[0])
    assert line[-1][0] > line[0][0] + 0.5
    np.testing.assert_allclose(line[:, 1], 0.05, atol=1e-5)


def test_streamline_function_object_from_controldict(tmp_path):
    """simple.run honors the controlDict streamLine function object
    (pitzDaily/system/controlDict:46-74): tracks.vtk appears under
    postProcessing/<name>/<time>/."""
    import os
    import shutil

    from cudaparticlesfoam_tpu.io import blockmesh, foamfile, polymesh
    from cudaparticlesfoam_tpu.models import simple as sm

    src = os.path.join(
        os.path.dirname(__file__), "..", "tutorials", "incompressible",
        "cudaParticlesUncoupledFoam", "pitzDaily",
    )
    case = str(tmp_path / "pitz")
    shutil.copytree(src, case)
    pm = blockmesh.generate(os.path.join(case, "system", "blockMeshDict"))
    polymesh.write_polymesh(pm, os.path.join(case, "constant", "polyMesh"))
    m, st, _ = sm.solve_steady(case, pm=pm, n_iters=40, log=lambda *a: None)
    import numpy as np

    sm.run_streamline_functions(case, "282", np.asarray(st.u), pm=pm,
                                log=lambda *a: None)
    out = os.path.join(case, "postProcessing", "streamlines", "282",
                       "tracks.vtk")
    assert os.path.exists(out)
    txt = open(out).read()
    assert "POLYDATA" in txt or "LINES" in txt.upper()
