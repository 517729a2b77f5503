"""Dynamic (moving) mesh: solid-body motion + ALE fluxes.

The moving-mesh branch of the coupled solver
(``cudaParticlesPimpleFoam.C:144-170``: ``mesh.controlledUpdate()``,
``correctPhi``, ``fvc::makeRelative``) for rigid solid-body motion of the
whole domain — the OpenFOAM ``solidBodyMotionFvMesh`` /
``dynamicMotionSolverFvMesh + solidBody`` configurations with the standard
``solidBodyMotionFunction``s (linearMotion, rotatingMotion,
oscillatingLinearMotion, oscillatingRotatingMotion).

TPU-first split of the work:
* point motion + FV metric rebuild: host numpy once per Eulerian step
  (topology never changes; at tutorial scale this is milliseconds);
* the particle walk tables refresh ON DEVICE
  (:func:`~cudaparticlesfoam_tpu.mesh.refresh_geometry`) since tet
  topology and neighbor codes are motion-invariant;
* mesh flux (``meshPhi``) from midpoint face sweep:
  ``((Cf_new - Cf_old)/dt) . (Sf_new + Sf_old)/2`` — exact for rigid
  translation, second-order for rotation; convective fluxes are made
  relative (``fvc::makeRelative(phi, U)``).
"""

from __future__ import annotations

import dataclasses
import math
import os

import numpy as np
import jax.numpy as jnp

from ..io import foamfile
from . import fv


@dataclasses.dataclass(frozen=True)
class SolidBodyMotion:
    """One solidBodyMotionFunction: rigid transform of the initial points."""

    kind: str                  # linearMotion | rotatingMotion | oscillating*
    origin: tuple = (0.0, 0.0, 0.0)
    axis: tuple = (0.0, 0.0, 1.0)
    omega: float = 0.0         # rad/s (rotatingMotion / oscillating* angular)
    velocity: tuple = (0.0, 0.0, 0.0)   # linearMotion
    amplitude: tuple = (0.0, 0.0, 0.0)  # oscillatingLinearMotion (m) or
    #                                     oscillatingRotatingMotion (degrees)

    def transform(self, points0: np.ndarray, t: float) -> np.ndarray:
        """Points at time t from the t=0 configuration."""
        p = np.asarray(points0, dtype=np.float64)
        if self.kind == "linearMotion":
            return p + np.asarray(self.velocity) * t
        if self.kind == "oscillatingLinearMotion":
            return p + np.asarray(self.amplitude) * math.sin(self.omega * t)
        if self.kind in ("rotatingMotion", "oscillatingRotatingMotion"):
            if self.kind == "rotatingMotion":
                theta = self.omega * t
                ax = np.asarray(self.axis, dtype=np.float64)
                ax = ax / max(np.linalg.norm(ax), 1e-300)
                rot = _rodrigues(ax, theta)
            else:
                # amplitude is a degrees VECTOR (axis-angle per component)
                ang = np.deg2rad(np.asarray(self.amplitude)) * math.sin(
                    self.omega * t
                )
                mag = np.linalg.norm(ang)
                ax = ang / mag if mag > 0 else np.array([0.0, 0.0, 1.0])
                rot = _rodrigues(ax, mag)
            o = np.asarray(self.origin, dtype=np.float64)
            return (p - o) @ rot.T + o
        raise ValueError(f"unsupported solidBodyMotionFunction {self.kind!r}")


def _rodrigues(axis: np.ndarray, theta: float) -> np.ndarray:
    k = np.asarray(axis, dtype=np.float64)
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + math.sin(theta) * K + (1 - math.cos(theta)) * (K @ K)


def _fn1_value(v):
    """Function1 scalar: `constant X` tokens or a bare number."""
    if isinstance(v, list):
        nums = [x for x in v if isinstance(x, (int, float))]
        return float(nums[0]) if nums else 0.0
    return float(v)


def _vec(v, default=(0.0, 0.0, 0.0)):
    if isinstance(v, list) and len(v) == 3:
        return tuple(float(x) for x in v)
    return default


def read_dynamic_mesh(case_dir: str) -> "SolidBodyMotion | None":
    """Parse constant/dynamicMeshDict; None for static/absent meshes."""
    path = os.path.join(case_dir, "constant", "dynamicMeshDict")
    if not os.path.exists(path):
        return None
    d = foamfile.read(path)
    d.pop("FoamFile", None)
    fvmesh = str(d.get("dynamicFvMesh", "staticFvMesh"))
    if fvmesh == "staticFvMesh":
        return None
    fn = d.get("solidBodyMotionFunction")
    coeffs = {}
    if fn is None and ("motionSolverLibs" in d or "motionSolver" in d):
        # dynamicMotionSolverFvMesh form: solver solidBody; + nested coeffs
        fn = d.get("solidBody", {}).get("solidBodyMotionFunction")
        coeffs = d.get("solidBody", {})
    fn = str(fn) if fn is not None else None
    if fn is None:
        raise ValueError(
            f"dynamicMeshDict: unsupported configuration {fvmesh!r} "
            "(only solid-body motion functions are implemented)"
        )
    coeffs = d.get(f"{fn}Coeffs", coeffs.get(f"{fn}Coeffs", {}))
    return SolidBodyMotion(
        kind=fn,
        origin=_vec(coeffs.get("origin")),
        axis=_vec(coeffs.get("axis"), (0.0, 0.0, 1.0)),
        omega=_fn1_value(coeffs.get("omega", 0.0)),
        velocity=_vec(coeffs.get("velocity")),
        amplitude=_vec(coeffs.get("amplitude")),
    )


class DynamicMesh:
    """Per-step mesh motion driver (``mesh.controlledUpdate()``)."""

    def __init__(self, motion: SolidBodyMotion, pm, dtype=jnp.float32):
        self.motion = motion
        self.pm = pm
        self.points0 = np.asarray(pm.points, dtype=np.float64).copy()
        self.dtype = dtype
        self._cf_old = None

    def update(self, t_new: float, dt: float):
        """Move points to t_new; returns (FvMesh, meshPhi[nf], bd_vel[nbd,3]).

        meshPhi is the swept face flux (midpoint rule); bd_vel the rigid
        velocity of boundary face centres (movingWallVelocity values).
        """
        pts = self.motion.transform(self.points0, t_new)
        self.pm.points = pts
        m_new = fv.fv_mesh(self.pm, dtype=self.dtype)
        cf_new = np.asarray(m_new.cf, dtype=np.float64)
        if self._cf_old is None:
            # first step: derive old face centres by transforming backwards
            pts_old = self.motion.transform(self.points0, t_new - dt)
            pm_pts = self.pm.points
            self.pm.points = pts_old
            m_old = fv.fv_mesh(self.pm, dtype=self.dtype)
            self.pm.points = pm_pts
            cf_old = np.asarray(m_old.cf, dtype=np.float64)
            sf_old = np.asarray(m_old.sf, dtype=np.float64)
        else:
            cf_old, sf_old = self._cf_old
        sf_new = np.asarray(m_new.sf, dtype=np.float64)
        v_face = (cf_new - cf_old) / dt
        mesh_phi = np.einsum("ij,ij->i", v_face, 0.5 * (sf_new + sf_old))
        self._cf_old = (cf_new, sf_new)
        n_int = m_new.n_internal
        bd_vel = v_face[n_int:]
        return (
            m_new,
            jnp.asarray(mesh_phi, m_new.sf.dtype),
            jnp.asarray(bd_vel, m_new.sf.dtype),
        )

    def tet_vertices(self, m_new) -> np.ndarray:
        """Full tet vertex array [mesh points; cell centres] for the
        particle mesh refresh (vertex layout of ``initCuda.H:112-124``)."""
        return np.concatenate(
            [np.asarray(self.pm.points), np.asarray(m_new.cc)], axis=0
        )


def update_moving_wall_bcs(m, u_bcs: fv.BoundaryCoeffs, bd_vel,
                           moving_patches: tuple) -> fv.BoundaryCoeffs:
    """Set movingWallVelocity patches to the instantaneous wall velocity."""
    if not moving_patches:
        return u_bcs
    b = u_bcs.b
    for name, _, start, cnt in m.patch_slices:
        if name in moving_patches:
            b = b.at[start : start + cnt].set(bd_vel[start : start + cnt])
    return dataclasses.replace(u_bcs, b=b)
