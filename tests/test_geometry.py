"""Unit tests for ops/geometry.py against hand values and reference
semantics (DeviceTetMesh.cuh:82-211)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cudaparticlesfoam_tpu.ops import geometry as g

A = jnp.array([0.0, 0.0, 0.0])
B = jnp.array([1.0, 0.0, 0.0])
C = jnp.array([0.0, 1.0, 0.0])
D = jnp.array([0.0, 0.0, 1.0])


def test_det4_unit_tet():
    assert float(g.det4(A, B, C, D)) == pytest.approx(1.0)
    # swapping two verts flips sign
    assert float(g.det4(B, A, C, D)) == pytest.approx(-1.0)


def test_tet_volume():
    assert float(g.tet_volume(A, B, C, D)) == pytest.approx(1.0 / 6.0)


def test_bary_vertices():
    for i, v in enumerate([A, B, C, D]):
        w = np.asarray(g.tet_bary_coords(v, A, B, C, D))
        expect = np.zeros(4)
        expect[i] = 1.0
        np.testing.assert_allclose(w, expect, atol=1e-14)


def test_bary_centroid_and_outside():
    cen = (A + B + C + D) / 4.0
    w = np.asarray(g.tet_bary_coords(cen, A, B, C, D))
    np.testing.assert_allclose(w, 0.25, atol=1e-14)
    # point beyond face opposite A (x+y+z=1 plane) -> wA negative
    p = jnp.array([0.5, 0.5, 0.5])
    w = np.asarray(g.tet_bary_coords(p, A, B, C, D))
    assert w[0] < 0 and (w[1:] > 0).all()
    assert w.sum() == pytest.approx(1.0)


def test_bary_from_tinv_matches_determinant_form():
    rng = np.random.default_rng(0)
    for _ in range(20):
        verts = rng.normal(size=(4, 3))
        a, b, c, d = (jnp.asarray(v) for v in verts)
        if abs(float(g.det4(a, b, c, d))) < 1e-3:
            continue
        p = jnp.asarray(rng.normal(size=3))
        w_ref = np.asarray(g.tet_bary_coords(p, a, b, c, d))
        tinv = g.invert3x3(g.tet_edge_matrix(a, b, c, d))
        w_fast = np.asarray(g.bary_from_tinv(p, a, tinv))
        np.testing.assert_allclose(w_fast, w_ref, atol=1e-9)


def test_invert3x3():
    rng = np.random.default_rng(1)
    m = jnp.asarray(rng.normal(size=(5, 3, 3)))
    inv = np.asarray(g.invert3x3(m))
    np.testing.assert_allclose(
        np.einsum("bij,bjk->bik", inv, np.asarray(m)),
        np.broadcast_to(np.eye(3), (5, 3, 3)),
        atol=1e-12,
    )


def test_tri_normal_orientation():
    n = np.asarray(g.tri_normal(A, B, C))
    np.testing.assert_allclose(n, [0, 0, 1], atol=1e-15)
    n = np.asarray(g.tri_normal(A, C, B))
    np.testing.assert_allclose(n, [0, 0, -1], atol=1e-15)


def test_tri_bary():
    w = np.asarray(g.tri_bary_coords((A + B + C) / 3.0, A, B, C))
    np.testing.assert_allclose(w, 1 / 3, atol=1e-14)


def test_reflect_point_plane():
    # reflect across z=1 plane: n=(0,0,1), d=1
    n = jnp.array([0.0, 0.0, 1.0])
    p = jnp.array([0.3, 0.4, 1.5])
    out = np.asarray(g.reflect_point(p, n, 1.0))
    np.testing.assert_allclose(out, [0.3, 0.4, 0.5], atol=1e-15)
    # sign-insensitive in n (RTQuery.cu:105 comment)
    out2 = np.asarray(g.reflect_point(p, -n, -1.0))
    np.testing.assert_allclose(out2, out, atol=1e-15)


def test_reflect_vector():
    n = jnp.array([0.0, 0.0, 1.0])
    v = jnp.array([1.0, 2.0, -3.0])
    out = np.asarray(g.reflect_vector(v, n))
    np.testing.assert_allclose(out, [1.0, 2.0, 3.0], atol=1e-15)
