"""Standard k-epsilon turbulence closure.

The reference's coupled tutorial runs kEpsilon RAS
(``TJunction/constant/turbulenceProperties:21-27``) inside OpenFOAM's
turbulence framework; this module provides the equivalent closure for the
native flow solvers: two upwind/diffusion transport equations with
linearized sinks, eddy viscosity ``nut = Cmu k^2 / eps``, and high-Re wall
treatment (fixed wall-cell epsilon from the log law, zero-gradient k —
the essence of epsilonWallFunction/kqRWallFunction).

Coefficients: Cmu=0.09, C1=1.44, C2=1.92, sigma_k=1.0, sigma_eps=1.3
(standard Launder-Sharma constants, as OpenFOAM's kEpsilon).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..io import polymesh
from ..utils.pytree import pytree_dataclass
from . import fv

CMU = 0.09
C1 = 1.44
C2 = 1.92
SIGMA_K = 1.0
SIGMA_EPS = 1.3
KAPPA = 0.41
SMALL = 1e-10


@pytree_dataclass
class KEpsilonState:
    k: jnp.ndarray      # [nc]
    eps: jnp.ndarray    # [nc]
    nut: jnp.ndarray    # [nc]


@pytree_dataclass
class WallInfo:
    wall_cell: jnp.ndarray    # [nw] wall-adjacent cell ids
    y_wall: jnp.ndarray       # [nw] wall distance of those cells
    wall_bd_face: jnp.ndarray  # [nw] boundary-face index (bd numbering)


def wall_info(m: fv.FvMesh) -> WallInfo:
    """Wall-adjacent cells + their distance to the wall face."""
    cells = []
    ys = []
    bfaces = []
    n_int = m.n_internal
    cf = np.asarray(m.cf)
    sf = np.asarray(m.sf)
    mag = np.asarray(m.mag_sf)
    cc = np.asarray(m.cc)
    own = np.asarray(m.owner)
    for name, ptype, start, cnt in m.patch_slices:
        if ptype != "wall":
            continue
        f = np.arange(start, start + cnt) + n_int
        c = own[f]
        nhat = sf[f] / np.maximum(mag[f], 1e-300)[:, None]
        y = np.abs(np.einsum("ij,ij->i", cf[f] - cc[c], nhat))
        cells.append(c)
        ys.append(y)
        bfaces.append(f - n_int)
    if not cells:
        return WallInfo(
            wall_cell=jnp.zeros(0, jnp.int32), y_wall=jnp.zeros(0, m.sf.dtype),
            wall_bd_face=jnp.zeros(0, jnp.int32),
        )
    return WallInfo(
        wall_cell=jnp.asarray(np.concatenate(cells), jnp.int32),
        y_wall=jnp.asarray(np.concatenate(ys), m.sf.dtype),
        wall_bd_face=jnp.asarray(np.concatenate(bfaces), jnp.int32),
    )


E_WALL = 9.8          # log-law constant (OpenFOAM nutkWallFunction)
YPLUS_LAM = 11.53     # laminar/log-law crossover for kappa=0.41, E=9.8


@partial(jax.jit, static_argnames=())
def wall_nut_bd(m: fv.FvMesh, wi: WallInfo, nut, k, nu):
    """Boundary-face eddy viscosity with the nutkWallFunction on walls:
    yPlus = Cmu^1/4 sqrt(k) y / nu; nut_w = nu (yPlus kappa / ln(E yPlus)
    - 1) in the log layer, 0 in the viscous sublayer.  Non-wall faces keep
    the owner-cell nut (the plain extrapolation the solvers used before)."""
    out = nut[m.owner[m.n_internal :]]
    kw = jnp.maximum(k[wi.wall_cell], SMALL)
    yplus = CMU ** 0.25 * jnp.sqrt(kw) * wi.y_wall / nu
    nut_w = jnp.where(
        yplus > YPLUS_LAM,
        nu * (yplus * KAPPA / jnp.log(jnp.maximum(E_WALL * yplus, 1.0 + SMALL)) - 1.0),
        0.0,
    )
    return out.at[wi.wall_bd_face].set(jnp.maximum(nut_w, 0.0))


def init_from_case(case_dir: str, m: fv.FvMesh, dtype=None, time_dir="0"):
    """Read k and epsilon internal fields from ``time_dir`` (restart) with
    a 0/ fallback; BC specs always from 0/ (written fields tag their
    boundaries "calculated")."""
    dtype = dtype or m.sf.dtype
    nc = m.n_cells

    def _field(name):
        p = os.path.join(case_dir, str(time_dir), name)
        if os.path.exists(p) or os.path.exists(p + ".gz"):
            return p
        return os.path.join(case_dir, "0", name)

    def _exists(p):
        return os.path.exists(p) or os.path.exists(p + ".gz")

    k_path = _field("k")
    e_path = _field("epsilon")
    k_bc_path = os.path.join(case_dir, "0", "k")
    e_bc_path = os.path.join(case_dir, "0", "epsilon")
    k0 = polymesh.read_field(k_path, n_cells=nc) if _exists(k_path) else np.full(nc, 1e-3)
    e0 = polymesh.read_field(e_path, n_cells=nc) if _exists(e_path) else np.full(nc, 1e-3)
    k_spec = polymesh.read_field_bcs(k_bc_path) if os.path.exists(k_bc_path) else {}
    e_spec = polymesh.read_field_bcs(e_bc_path) if os.path.exists(e_bc_path) else {}

    def to_bcs(spec):
        # wall functions behave as zeroGradient for the transported value;
        # turbulent inlet generators reduce to fixedValue at their init value
        mapped = {}
        for name, (t, v) in spec.items():
            if "WallFunction" in t:
                mapped[name] = ("zeroGradient", 0.0)
            elif t in (
                "turbulentIntensityKineticEnergyInlet",
                "turbulentMixingLengthDissipationRateInlet",
                "turbulentMixingLengthFrequencyInlet",
            ):
                mapped[name] = ("fixedValue", v if v is not None else 1e-3)
            else:
                mapped[name] = (t, v if v is not None else 0.0)
        return fv.make_bcs(m, mapped, 1)

    k = jnp.asarray(np.asarray(k0).reshape(-1), dtype)
    eps = jnp.asarray(np.asarray(e0).reshape(-1), dtype)
    nut = jnp.clip(CMU * k * k / jnp.maximum(eps, SMALL), 0.0, None)
    return (
        KEpsilonState(k=k, eps=eps, nut=nut),
        to_bcs(k_spec),
        to_bcs(e_spec),
        wall_info(m),
    )


def production(m: fv.FvMesh, u, u_bcs, nut):
    """P_k = nut * 2 Sij Sij from the Gauss velocity gradient."""
    grads = []
    zero_bc = fv.BoundaryCoeffs(
        a=u_bcs.a, b=jnp.zeros((u_bcs.b.shape[0], 1), u_bcs.b.dtype)
    )
    for comp in range(3):
        bc_c = fv.BoundaryCoeffs(a=u_bcs.a, b=u_bcs.b[:, comp : comp + 1])
        grads.append(fv.gradient(m, u[:, comp], bc_c))
    g = jnp.stack(grads, axis=1)                  # [nc, comp_i, d/dx_j]
    s = 0.5 * (g + jnp.swapaxes(g, 1, 2))
    s2 = 2.0 * jnp.sum(s * s, axis=(1, 2))
    return nut * s2


@partial(jax.jit, static_argnames=("n_sweeps",))
def k_epsilon_step(
    m: fv.FvMesh,
    st: KEpsilonState,
    u, u_bcs, flux,
    k_bcs, e_bcs,
    wi: WallInfo,
    nu: float,
    dt=None,
    n_sweeps: int = 6,
    relax: float = 0.7,
):
    """One k-epsilon update (steady: under-relaxed; transient: pass dt)."""
    k = jnp.maximum(st.k, SMALL)
    eps = jnp.maximum(st.eps, SMALL)
    nut = st.nut
    pk = production(m, u, u_bcs, nut)

    ddt = None if dt is None else m.vol / jnp.asarray(dt, m.sf.dtype)

    # epsilon equation
    gamma_e = nu + jnp.concatenate(
        [fv.face_interp(m, nut), nut[m.owner[m.n_internal :]]]
    ) / SIGMA_EPS
    Ae = fv.assemble_transport(
        m, flux, gamma_e, e_bcs, 1,
        ddt_coeff=ddt, phi_old=eps[:, None] if dt is not None else None,
    )
    # sinks/sources: + C1 pk eps/k  - C2 eps^2/k (implicit in eps)
    diag_e = Ae.diag + C2 * (eps / k) * m.vol
    src_e = Ae.source[:, 0] + C1 * pk * (eps / k) * m.vol
    # wall cells: fix eps by the log law
    ew = CMU ** 0.75 * jnp.maximum(k[wi.wall_cell], SMALL) ** 1.5 / (
        KAPPA * jnp.maximum(wi.y_wall, SMALL)
    )
    big = jnp.asarray(1e30, m.sf.dtype)
    diag_e = diag_e.at[wi.wall_cell].add(big)
    src_e = src_e.at[wi.wall_cell].add(big * ew)
    if dt is None:
        src_e = src_e + ((1.0 - relax) / relax) * diag_e * eps
        diag_e = diag_e / relax
    Ae2 = dataclasses.replace(Ae, diag=diag_e)
    eps_new = fv.jacobi_solve(m, Ae2, src_e[:, None], eps[:, None], sweeps=n_sweeps)[:, 0]
    eps_new = jnp.maximum(eps_new, SMALL)

    # k equation
    gamma_k = nu + jnp.concatenate(
        [fv.face_interp(m, nut), nut[m.owner[m.n_internal :]]]
    ) / SIGMA_K
    Ak = fv.assemble_transport(
        m, flux, gamma_k, k_bcs, 1,
        ddt_coeff=ddt, phi_old=k[:, None] if dt is not None else None,
    )
    diag_k = Ak.diag + (eps_new / k) * m.vol          # implicit sink eps = (eps/k)k
    src_k = Ak.source[:, 0] + pk * m.vol
    if dt is None:
        src_k = src_k + ((1.0 - relax) / relax) * diag_k * k
        diag_k = diag_k / relax
    Ak2 = dataclasses.replace(Ak, diag=diag_k)
    k_new = fv.jacobi_solve(m, Ak2, src_k[:, None], k[:, None], sweeps=n_sweeps)[:, 0]
    k_new = jnp.maximum(k_new, SMALL)

    nut_new = jnp.clip(CMU * k_new * k_new / jnp.maximum(eps_new, SMALL), 0.0, 1e5)
    return KEpsilonState(k=k_new, eps=eps_new, nut=nut_new)
