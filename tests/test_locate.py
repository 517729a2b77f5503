"""Tet-walk locator and wall-reflection tests (reference semantics:
query/RTQuery.cu baryTetSearch / RTreflection)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cudaparticlesfoam_tpu import mesh as meshlib
from cudaparticlesfoam_tpu.ops import locate


@pytest.fixture(scope="module")
def box():
    return meshlib.box_mesh(4, 4, 4)


@pytest.fixture(scope="module")
def grid(box):
    return locate.build_grid_locator(box)


def tet_containing(m, p):
    """Reference oracle: exhaustive bary test."""
    pts = np.asarray(m.points, dtype=np.float64)
    tets = np.asarray(m.tets)
    a, b, c, d = (pts[tets[:, i]] for i in range(4))
    def det(x, y, z, w):
        return np.einsum("ij,ij->i", w - x, np.cross(y - x, z - x))
    den = det(a, b, c, d)
    p = np.asarray(p, dtype=np.float64)
    wa = det(np.broadcast_to(p, a.shape), b, c, d) / den
    wb = det(a, np.broadcast_to(p, a.shape), c, d) / den
    wc = det(a, b, np.broadcast_to(p, a.shape), d) / den
    wd = 1 - wa - wb - wc
    inside = (wa >= 0) & (wb >= 0) & (wc >= 0) & (wd >= 0)
    ids = np.nonzero(inside)[0]
    return ids


def test_walk_from_anywhere(box):
    rng = np.random.default_rng(42)
    pts = rng.uniform(0.05, 3.95, size=(64, 3))
    start = jnp.zeros(64, dtype=jnp.int32)  # always start from tet 0
    tet, _ = locate.walk(box, jnp.asarray(pts), start)
    tet = np.asarray(tet)
    assert (tet >= 0).all()
    for i, p in enumerate(pts):
        assert tet[i] in tet_containing(box, p)


def test_walk_out_of_domain_code(box):
    # point outside the box: returns -(lastTet+1)
    p = jnp.asarray([[10.0, 2.0, 2.0]])
    tet, slot = locate.walk(box, p, jnp.zeros(1, dtype=jnp.int32))
    assert int(tet[0]) < 0
    last = -int(tet[0]) - 1
    assert 0 <= last < box.n_tets
    assert 0 <= int(slot[0]) < 4
    # the recorded exit face must be a boundary face of that tet
    nbr = np.asarray(box.tet_nbr)
    assert nbr[last, int(slot[0])] < 0


def test_walk_negative_input_passthrough(box):
    p = jnp.asarray([[1.0, 1.0, 1.0]])
    tet, _ = locate.walk(box, p, jnp.asarray([-7], dtype=jnp.int32))
    assert int(tet[0]) == -7


def test_first_locate_grid(box, grid):
    rng = np.random.default_rng(3)
    pts = rng.uniform(0.0, 4.0, size=(128, 3))
    tet = locate.locate_seeds(box, grid, jnp.asarray(pts))
    tet = np.asarray(tet)
    assert (tet >= 0).all()
    for i, p in enumerate(pts):
        assert tet[i] in tet_containing(box, p)


def test_locate_seeds_outside(box, grid):
    pts = jnp.asarray([[5.5, 1.0, 1.0], [2.0, 2.0, 2.0]])
    tet = np.asarray(locate.locate_seeds(box, grid, pts))
    assert tet[0] == -1
    assert tet[1] >= 0


def test_reflect_simple_bounce(box):
    # particle near the x=4 wall moving +x: displacement pushes it out;
    # specular reflection should bring it back inside with vx flipped.
    pos = jnp.asarray([[3.9, 2.1, 2.1]])
    disp = jnp.asarray([[0.3, 0.0, 0.0]])
    vel = jnp.asarray([[1.0, 0.0, 0.0]])
    tet0 = locate.locate_seeds(box, locate.build_grid_locator(box), pos)
    # relocate end point -> wall hit code
    tet, _ = locate.walk(box, pos + disp, tet0)
    assert int(tet[0]) < 0
    new_disp, new_vel, new_tet = locate.reflect_walls(box, pos, disp, vel, tet)
    assert int(new_tet[0]) >= 0
    end = np.asarray(pos + new_disp)[0]
    np.testing.assert_allclose(end, [3.8, 2.1, 2.1], atol=1e-12)
    np.testing.assert_allclose(np.asarray(new_vel)[0], [-1.0, 0.0, 0.0], atol=1e-12)


def test_reflect_corner_double_bounce(box):
    # aim out through a corner: needs two reflections
    pos = jnp.asarray([[3.9, 3.9, 2.0]])
    disp = jnp.asarray([[0.3, 0.3, 0.0]])
    vel = jnp.asarray([[1.0, 1.0, 0.0]])
    tet0 = locate.locate_seeds(box, locate.build_grid_locator(box), pos)
    tet, _ = locate.walk(box, pos + disp, tet0)
    assert int(tet[0]) < 0
    new_disp, new_vel, new_tet = locate.reflect_walls(box, pos, disp, vel, tet)
    assert int(new_tet[0]) >= 0
    end = np.asarray(pos + new_disp)[0]
    np.testing.assert_allclose(end, [3.8, 3.8, 2.0], atol=1e-12)
    np.testing.assert_allclose(np.asarray(new_vel)[0], [-1.0, -1.0, 0.0], atol=1e-12)


def test_reflect_passthrough_for_interior(box):
    pos = jnp.asarray([[2.0, 2.0, 2.0]])
    disp = jnp.asarray([[0.1, 0.0, 0.0]])
    vel = jnp.asarray([[1.0, 0.0, 0.0]])
    tet = jnp.asarray([5], dtype=jnp.int32)
    nd, nv, nt = locate.reflect_walls(box, pos, disp, vel, tet)
    np.testing.assert_array_equal(np.asarray(nd), np.asarray(disp))
    np.testing.assert_array_equal(np.asarray(nv), np.asarray(vel))
    assert int(nt[0]) == 5
