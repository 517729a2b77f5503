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


def strain_rate_sq(m: fv.FvMesh, u, u_bcs):
    """S2 = 2 Sij Sij from the Gauss velocity gradient."""
    grads = []
    for comp in range(3):
        bc_c = fv.BoundaryCoeffs(a=u_bcs.a, b=u_bcs.b[:, comp : comp + 1])
        grads.append(fv.gradient(m, u[:, comp], bc_c))
    g = jnp.stack(grads, axis=1)                  # [nc, comp_i, d/dx_j]
    s = 0.5 * (g + jnp.swapaxes(g, 1, 2))
    return 2.0 * jnp.sum(s * s, axis=(1, 2))


def production(m: fv.FvMesh, u, u_bcs, nut):
    """P_k = nut * 2 Sij Sij from the Gauss velocity gradient."""
    return nut * strain_rate_sq(m, u, u_bcs)


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


# ---------------------------------------------------------------------------
# k-omega SST (Menter 2003, OpenFOAM kOmegaSST constants)
#
# The reference constructs any OpenFOAM incompressible RAS model through the
# turbulence framework (applications/cudaParticlesPimpleFoam/
# createFields.H:53-61); kEpsilon (above) and kOmegaSST are the two models
# the native solvers implement — anything else is a hard error
# (models/simple.py turbulence_model).
# ---------------------------------------------------------------------------

A1_SST = 0.31
B1_SST = 1.0
C1_SST = 10.0
BETA_STAR = 0.09
ALPHA_K1, ALPHA_K2 = 0.85, 1.0
ALPHA_W1, ALPHA_W2 = 0.5, 0.856
BETA1, BETA2 = 0.075, 0.0828
GAMMA1, GAMMA2 = 5.0 / 9.0, 0.44


@pytree_dataclass
class KOmegaSSTState:
    k: jnp.ndarray       # [nc]
    omega: jnp.ndarray   # [nc]
    nut: jnp.ndarray     # [nc]
    y: jnp.ndarray       # [nc] wall distance (static per mesh; carried in
    #                      the state so the step signature matches kEpsilon)


def wall_distance(m: fv.FvMesh) -> np.ndarray:
    """Per-cell distance to the nearest wall face centre (host-side,
    chunked brute force — the SST blending functions need y everywhere,
    not just in wall-adjacent cells).  OpenFOAM's meshWave gives the same
    quantity; brute force over face centres is adequate at tutorial
    scale and runs once per mesh."""
    n_int = m.n_internal
    cf = np.asarray(m.cf)
    cc = np.asarray(m.cc)
    wall_f = []
    for name, ptype, start, cnt in m.patch_slices:
        if ptype == "wall":
            wall_f.append(np.arange(start, start + cnt) + n_int)
    if not wall_f:
        return np.full(m.n_cells, 1e10)
    wf = cf[np.concatenate(wall_f)]
    if len(wf) == 0:
        return np.full(m.n_cells, 1e10)
    try:  # k-d tree when scipy is present (248k cells x 49k wall faces
        #   at reference TJunction scale is ~1.2e10 brute-force pairs)
        from scipy.spatial import cKDTree

        return cKDTree(wf).query(cc, workers=-1)[0]
    except ImportError:
        pass
    y = np.empty(m.n_cells)
    step = max(1, 2**22 // max(len(wf), 1))
    for c0 in range(0, m.n_cells, step):
        d = cc[c0 : c0 + step, None, :] - wf[None, :, :]
        y[c0 : c0 + step] = np.sqrt((d * d).sum(axis=2).min(axis=1))
    return y


def init_from_case_sst(case_dir: str, m: fv.FvMesh, dtype=None, time_dir="0"):
    """Read k and omega fields (restart-aware, 0/ fallback); omega falls
    back to eps/(Cmu k) when only epsilon exists, else 1."""
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
    w_path = _field("omega")
    k0 = polymesh.read_field(k_path, n_cells=nc) if _exists(k_path) else np.full(nc, 1e-3)
    if _exists(w_path):
        w0 = polymesh.read_field(w_path, n_cells=nc)
    else:
        e_path = _field("epsilon")
        if _exists(e_path):
            e0 = polymesh.read_field(e_path, n_cells=nc)
            w0 = np.asarray(e0).reshape(-1) / np.maximum(
                CMU * np.asarray(k0).reshape(-1), SMALL
            )
        else:
            w0 = np.full(nc, 1.0)
    k_bc_path = os.path.join(case_dir, "0", "k")
    w_bc_path = os.path.join(case_dir, "0", "omega")
    k_spec = polymesh.read_field_bcs(k_bc_path) if os.path.exists(k_bc_path) else {}
    w_spec = polymesh.read_field_bcs(w_bc_path) if os.path.exists(w_bc_path) else {}

    def to_bcs(spec):
        mapped = {}
        for name, entry in spec.items():
            t, v = entry[0], entry[1]
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
    w = jnp.maximum(jnp.asarray(np.asarray(w0).reshape(-1), dtype), SMALL)
    nut = jnp.clip(k / w, 0.0, 1e5)
    return (
        KOmegaSSTState(k=k, omega=w, nut=nut,
                       y=jnp.asarray(wall_distance(m), dtype)),
        to_bcs(k_spec),
        to_bcs(w_spec),
        wall_info(m),
    )


@partial(jax.jit, static_argnames=("n_sweeps",))
def k_omega_sst_step(
    m: fv.FvMesh,
    st: KOmegaSSTState,
    u, u_bcs, flux,
    k_bcs, w_bcs,
    wi: WallInfo,
    nu: float,
    dt=None,
    n_sweeps: int = 6,
    relax: float = 0.7,
):
    """One k-omega SST update (steady: under-relaxed; transient: pass dt).

    Menter 2003 blending: F1/F2 from wall distance, cross-diffusion in the
    omega equation, strain-rate-limited eddy viscosity
    nut = a1 k / max(a1 omega, b1 F2 |S|), production limiter
    min(Pk, c1 betaStar k omega).  Wall treatment: omega pinned in
    wall-adjacent cells to sqrt(omega_vis^2 + omega_log^2)
    (omegaWallFunction's blended value), k zeroGradient, nut via
    nutkWallFunction (wall_nut_bd)."""
    k = jnp.maximum(st.k, SMALL)
    w = jnp.maximum(st.omega, SMALL)
    y = jnp.maximum(st.y, 1e-10)
    y2 = y * y

    s2 = strain_rate_sq(m, u, u_bcs)
    gk = fv.gradient(m, k, k_bcs)
    gw = fv.gradient(m, w, w_bcs)
    cd_kw = 2.0 * ALPHA_W2 * jnp.sum(gk * gw, axis=1) / w
    cd_kw_plus = jnp.maximum(cd_kw, 1e-10)
    sqk = jnp.sqrt(k)
    arg1 = jnp.minimum(
        jnp.minimum(
            jnp.maximum(sqk / (BETA_STAR * w * y), 500.0 * nu / (y2 * w)),
            4.0 * ALPHA_W2 * k / (cd_kw_plus * y2),
        ),
        10.0,
    )
    f1 = jnp.tanh(arg1 ** 4)
    arg2 = jnp.minimum(
        jnp.maximum(2.0 * sqk / (BETA_STAR * w * y), 500.0 * nu / (y2 * w)), 100.0
    )
    f2 = jnp.tanh(arg2 * arg2)

    nut = A1_SST * k / jnp.maximum(A1_SST * w, B1_SST * f2 * jnp.sqrt(s2))
    pk_raw = nut * s2
    pk = jnp.minimum(pk_raw, C1_SST * BETA_STAR * k * w)

    blend = lambda c1_, c2_: f1 * c1_ + (1.0 - f1) * c2_
    alpha_k = blend(ALPHA_K1, ALPHA_K2)
    alpha_w = blend(ALPHA_W1, ALPHA_W2)
    beta = blend(BETA1, BETA2)
    gamma = blend(GAMMA1, GAMMA2)

    ddt = None if dt is None else m.vol / jnp.asarray(dt, m.sf.dtype)
    own_b = m.owner[m.n_internal :]

    # omega equation
    dw_c = alpha_w * nut
    gamma_w = nu + jnp.concatenate([fv.face_interp(m, dw_c), dw_c[own_b]])
    Aw = fv.assemble_transport(
        m, flux, gamma_w, w_bcs, 1,
        ddt_coeff=ddt, phi_old=w[:, None] if dt is not None else None,
    )
    diag_w = Aw.diag + beta * w * m.vol             # implicit -beta w^2
    src_w = Aw.source[:, 0] + (
        gamma * s2 + (1.0 - f1) * cd_kw
    ) * m.vol
    # wall cells: omegaWallFunction blended value, pinned by big diagonal
    yw = jnp.maximum(wi.y_wall, 1e-10)
    kw_ = jnp.maximum(k[wi.wall_cell], SMALL)
    w_vis = 6.0 * nu / (BETA1 * yw * yw)
    w_log = jnp.sqrt(kw_) / (CMU ** 0.25 * KAPPA * yw)
    w_wall = jnp.sqrt(w_vis * w_vis + w_log * w_log)
    big = jnp.asarray(1e30, m.sf.dtype)
    diag_w = diag_w.at[wi.wall_cell].add(big)
    src_w = src_w.at[wi.wall_cell].add(big * w_wall)
    if dt is None:
        src_w = src_w + ((1.0 - relax) / relax) * diag_w * w
        diag_w = diag_w / relax
    Aw2 = dataclasses.replace(Aw, diag=diag_w)
    w_new = fv.jacobi_solve(m, Aw2, src_w[:, None], w[:, None], sweeps=n_sweeps)[:, 0]
    w_new = jnp.maximum(w_new, SMALL)

    # k equation
    dk_c = alpha_k * nut
    gamma_k = nu + jnp.concatenate([fv.face_interp(m, dk_c), dk_c[own_b]])
    Ak = fv.assemble_transport(
        m, flux, gamma_k, k_bcs, 1,
        ddt_coeff=ddt, phi_old=k[:, None] if dt is not None else None,
    )
    diag_k = Ak.diag + BETA_STAR * w_new * m.vol    # implicit sink
    src_k = Ak.source[:, 0] + pk * m.vol
    if dt is None:
        src_k = src_k + ((1.0 - relax) / relax) * diag_k * k
        diag_k = diag_k / relax
    Ak2 = dataclasses.replace(Ak, diag=diag_k)
    k_new = fv.jacobi_solve(m, Ak2, src_k[:, None], k[:, None], sweeps=n_sweeps)[:, 0]
    k_new = jnp.maximum(k_new, SMALL)

    nut_new = jnp.clip(
        A1_SST * k_new / jnp.maximum(A1_SST * w_new, B1_SST * f2 * jnp.sqrt(s2)),
        0.0, 1e5,
    )
    return KOmegaSSTState(k=k_new, omega=w_new, nut=nut_new, y=st.y)


# ---------------------------------------------------------------------------
# model-generic surface used by the solvers
# ---------------------------------------------------------------------------

MODELS = ("kEpsilon", "kOmegaSST")


def init_model(model: str, case_dir: str, m: fv.FvMesh, dtype=None, time_dir="0"):
    """(state, bcs_a, bcs_b, wall_info) for a supported RAS model."""
    if model == "kEpsilon":
        return init_from_case(case_dir, m, dtype=dtype, time_dir=time_dir)
    if model == "kOmegaSST":
        return init_from_case_sst(case_dir, m, dtype=dtype, time_dir=time_dir)
    raise ValueError(f"unsupported turbulence model {model!r}")


def model_step(model: str, m, st, u, u_bcs, flux, bcs_a, bcs_b, wi, nu, dt=None):
    """One closure update; bcs_a/bcs_b are (k, epsilon) or (k, omega)."""
    if model == "kEpsilon":
        return k_epsilon_step(m, st, u, u_bcs, flux, bcs_a, bcs_b, wi, nu, dt=dt)
    if model == "kOmegaSST":
        return k_omega_sst_step(m, st, u, u_bcs, flux, bcs_a, bcs_b, wi, nu, dt=dt)
    raise ValueError(f"unsupported turbulence model {model!r}")
