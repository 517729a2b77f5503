"""Transient incompressible PIMPLE/PISO solver.

The flow half of ``cudaParticlesPimpleFoam``
(``applications/cudaParticlesPimpleFoam/cudaParticlesPimpleFoam.C:131-192``):
per time step, an implicit-Euler momentum predictor (``UEqn.H:5-24``)
followed by PISO pressure correctors (``pEqn.H:42-57``) with Rhie-Chow
fluxes, optional outer PIMPLE loops, and maxCo-driven adaptive time
stepping (``TJunction/system/controlDict:47-51``).  Laminar closure (an
eddy-viscosity field can be passed per step).

The whole time step is one jitted program; the driver
(:func:`..models.coupled.run_coupled`) interleaves it with particle
advection exactly like the reference's solver loop.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from . import fv
from .simple import FlowState, _pressure_matrix, load_flow_case


@dataclasses.dataclass(frozen=True)
class PimpleConfig:
    nu: float = 1e-5
    n_outer: int = 1          # PIMPLE outer correctors (1 = PISO)
    n_correctors: int = 2     # pressure correctors per outer loop
    n_jacobi: int = 8
    p_tol: float = 1e-6
    p_max_iter: int = 400
    pin_pressure: bool = False
    div_scheme: str = "upwind"   # fvSchemes div(phi,U), deferred correction
    n_nonortho: int = 0          # fvSolution nNonOrthogonalCorrectors
    p_solver: str = "cg"         # "amg" (GAMG stand-in) or "cg"


@partial(jax.jit, static_argnames=("cfg",))
def pimple_step(m: fv.FvMesh, st: FlowState, u_bcs, p_bcs, cfg: PimpleConfig,
                dt, nut=None, amg=None, nut_bd=None, mrf=None, fvo=None):
    """One Eulerian time step: returns (state, residual diagnostics).

    ``mrf`` (a :class:`.mrf.MRFZones`) adds the rotating-frame terms the
    reference solver threads through (``UEqn.H:3-8``, ``pEqn.H:20``):
    rotating-wall boundary velocity, explicit Coriolis source, and the
    relative convective flux.  U stays absolute throughout.

    ``fvo`` (a :class:`.fvoptions.FvOptions`) adds the momentum-equation
    fvOptions the reference applies (``UEqn.H:11,17,23``, ``pEqn.H:66``):
    explicit sources into the predictor RHS, implicit Sp into the
    diagonal, and the meanVelocityForce feedback after the predictor and
    the corrector.  Its updated ``grad_p`` state is returned in the
    residual dict as ``"fvo_grad_p"``.
    """
    from . import fvoptions as fvo_mod
    from . import mrf as mrf_mod

    dt = jnp.asarray(dt, m.sf.dtype)
    ddt = m.vol / dt
    u_old = st.u
    if mrf is not None:
        # MRF.correctBoundaryVelocity(U): rotating walls move with the frame
        u_bcs = mrf_mod.correct_boundary_velocity(mrf, m, u_bcs)

    if nut is None:
        nu_f = cfg.nu
    else:
        nut_b = nut[m.owner[m.n_internal :]] if nut_bd is None else nut_bd
        nu_f = cfg.nu + jnp.concatenate([fv.face_interp(m, nut), nut_b])

    def outer(carry, _):
        st, fvo, _ = carry
        # inletOutlet backflow switching against the current flux
        u_bcs_e = fv.effective_bcs(u_bcs, st.flux[m.n_internal :])
        A = fv.assemble_transport(
            m, st.flux, nu_f, u_bcs_e, 3, ddt_coeff=ddt, phi_old=u_old
        )
        if fvo is not None:
            # fvOptions.constrain(UEqn): implicit Sp onto the diagonal
            # BEFORE rAU is taken; folds the pending mvf increment into
            # gradP0 (UEqn.H:17)
            A, fvo = fvo_mod.constrain(fvo, m, A)
        grad_p = fv.gradient(m, st.p, p_bcs)
        b = A.source - grad_p * m.vol[:, None]
        b = b + fv.convection_correction(m, st.flux, st.u, u_bcs_e,
                                         cfg.div_scheme)
        if mrf is not None:
            # MRF.DDt(U) moved to the RHS: -(Omega x U) V over zone cells
            b = b + mrf_mod.coriolis_source(mrf, m, st.u)
        if fvo is not None:
            # fvOptions(U): explicit sources into the RHS (UEqn.H:11)
            b = fvo_mod.add_sup(fvo, m, b)
        u_star = fv.jacobi_solve(m, A, b, st.u, sweeps=cfg.n_jacobi)
        u_res = jnp.linalg.norm(b - fv.matvec(m, A, u_star)) / (
            jnp.linalg.norm(b) + 1e-300
        )

        rau = m.vol / A.diag
        if fvo is not None:
            # fvOptions.correct(U) after the momentum predictor (UEqn.H:23)
            u_star, fvo = fvo_mod.correct(fvo, m, u_star, rau)
        rau_f = jnp.concatenate(
            [fv.face_interp(m, rau), rau[m.owner[m.n_internal :]]]
        )
        Ap, _ = _pressure_matrix(m, rau_f, p_bcs, cfg.pin_pressure)

        p = st.p
        flux = st.flux
        u_corr = u_star
        p_res = jnp.zeros((), m.sf.dtype)
        for _c in range(cfg.n_correctors):
            hbya = (b + grad_p * m.vol[:, None] - (
                fv.matvec(m, A, u_corr) - A.diag[:, None] * u_corr
            )) / A.diag[:, None]
            phi_hbya = fv.flux_of(m, hbya, u_bcs_e)
            if mrf is not None:
                # MRF.makeRelative(phiHbyA) (pEqn.H:20)
                phi_hbya = mrf_mod.make_relative(mrf, m, phi_hbya)
            rhs = Ap.source[:, 0] - fv.surface_sum(m, phi_hbya)
            corr = jnp.zeros(m.n_internal, m.sf.dtype)
            for _no in range(cfg.n_nonortho + 1):
                if cfg.p_solver == "amg":
                    p, p_res, _ = fv.amg_cg_solve(
                        m, amg, Ap, rhs + fv.surface_sum_internal(m, corr), p,
                        tol=cfg.p_tol, max_iter=cfg.p_max_iter,
                    )
                else:
                    p, p_res, _ = fv.cg_solve(
                        m, Ap, rhs + fv.surface_sum_internal(m, corr), p,
                        tol=cfg.p_tol, max_iter=cfg.p_max_iter,
                    )
                if _no < cfg.n_nonortho:
                    corr = fv.nonortho_flux(m, rau_f, p, p_bcs)
            n_int = m.n_internal
            dp = p[m.neighbour] - p[m.owner[:n_int]]
            flux_i = phi_hbya[:n_int] - rau_f[:n_int] * m.delta * dp - corr
            dp_b = (p_bcs.a - 1.0) * p[m.owner[n_int:]] + p_bcs.b[:, 0]
            flux_b = phi_hbya[n_int:] - rau_f[n_int:] * m.bd_delta * dp_b
            flux = jnp.concatenate([flux_i, flux_b])
            grad_pn = fv.gradient(m, p, p_bcs)
            u_corr = hbya - rau[:, None] * grad_pn
            if fvo is not None:
                # fvOptions.correct(U) per pressure corrector (pEqn.H:66)
                u_corr, fvo = fvo_mod.correct(fvo, m, u_corr, rau)

        new_st = FlowState(u=u_corr, p=p, flux=flux)
        return (new_st, fvo, {"u_res": u_res, "p_res": p_res}), None

    (st, fvo, res), _ = jax.lax.scan(
        outer,
        (st, fvo, {"u_res": jnp.zeros((), m.sf.dtype),
                   "p_res": jnp.zeros((), m.sf.dtype)}),
        None, length=cfg.n_outer,
    )
    cont = jnp.sum(jnp.abs(fv.surface_sum(m, st.flux)))
    res = dict(res, continuity=cont)
    if fvo is not None:
        res["fvo_grad_p"] = fvo.grad_p
        res["fvo_dgrad"] = fvo.dgrad
    return st, res


@partial(jax.jit, static_argnames=("pin", "max_iter"))
def correct_flux(m: fv.FvMesh, flux, p_bcs, pin: bool = False,
                 tol: float = 1e-8, max_iter: int = 500):
    """``CorrectPhi(U, phi, p, rAUf=1, zero, pimple)``
    (``correctPhi.H:1-11``): project the face flux onto a divergence-free
    field by solving ``laplacian(1, pcorr) == div(phi)`` with homogeneous
    pressure-like BCs and subtracting the corrective flux.  Used after a
    restart (flux rebuilt from U is not conservative) and after mesh
    changes (``cudaParticlesPimpleFoam.C:153-163``)."""
    import dataclasses as _dc

    # pcorr BCs: fixed 0 where p is fixed, zeroGradient elsewhere
    bc0 = _dc.replace(
        p_bcs, b=jnp.zeros_like(p_bcs.b), io_mask=None, io_value=None
    )
    Ap, _ = _pressure_matrix(m, jnp.ones_like(flux), bc0, pin)
    rhs = -fv.surface_sum(m, flux)
    pc = jnp.zeros(m.n_cells, flux.dtype)
    pc, res, iters = fv.cg_solve(m, Ap, rhs, pc, tol=tol, max_iter=max_iter)
    # same flux update as the pressure corrector (pEqn.H:55: phi -= pEqn.flux)
    n_int = m.n_internal
    dp = pc[m.neighbour] - pc[m.owner[:n_int]]
    flux_i = flux[:n_int] - m.delta * dp
    dp_b = (bc0.a - 1.0).reshape(-1) * pc[m.owner[n_int:]]
    flux_b = flux[n_int:] - m.bd_delta * dp_b
    return jnp.concatenate([flux_i, flux_b]), res


@jax.jit
def courant_number(m: fv.FvMesh, flux, dt):
    """Max Courant number (OpenFOAM CourantNo.H): 0.5 dt sum|phi| / V."""
    sums = jnp.zeros(m.n_cells, flux.dtype)
    sums = sums.at[m.owner].add(jnp.abs(flux))
    sums = sums.at[m.neighbour].add(jnp.abs(flux[: m.n_internal]))
    return 0.5 * dt * jnp.max(sums / m.vol)


class FlowSolver:
    """Stateful wrapper used by the coupled driver."""

    def __init__(self, m, state, u_bcs, p_bcs, cfg: PimpleConfig, log=print):
        self.m = m
        self.state = state
        self.u_bcs = u_bcs
        self.p_bcs = p_bcs
        self.cfg = cfg
        self.log = log

    @classmethod
    def from_case(cls, case, log=print, **cfg_kw):
        from .simple import turbulence_model

        from .simple import read_numerics

        m, st, u_bcs, p_bcs, nu, pin, p_tables = load_flow_case(
            case.case_dir, pm=case.poly, dtype=jnp.float32,
            time_dir=getattr(case, "time_dir", "0"),
        )
        num = read_numerics(case.case_dir)
        cfg_kw.setdefault("div_scheme", num["div_scheme"])
        cfg_kw.setdefault("n_nonortho", num["n_nonortho"])
        cfg_kw.setdefault("n_correctors", num["n_correctors"])
        cfg_kw.setdefault("n_outer", num["n_outer"])
        cfg_kw.setdefault("p_solver", "amg")
        cfg = PimpleConfig(nu=nu, pin_pressure=pin, **cfg_kw)
        solver = cls(m, st, u_bcs, p_bcs, cfg, log=log)
        solver.amg = fv.build_amg(m) if cfg.p_solver == "amg" else None
        solver.p_tables = p_tables
        solver.time = case.time_value
        # MRF zones (constant/MRFProperties; cudaParticlesPimpleFoam.C:151)
        from . import mrf as mrf_mod

        solver.mrf = mrf_mod.from_case(case.case_dir, m, case.poly)
        # momentum fvOptions (constant/ or system/fvOptions; UEqn.H:11-23)
        from . import fvoptions as fvo_mod

        solver.fvo = fvo_mod.from_case(case.case_dir, m, case.poly)
        if solver.fvo is not None:
            kinds = []
            if solver.fvo.has_mvf:
                kinds.append("meanVelocityForce")
            if bool((np.abs(np.asarray(solver.fvo.su)).sum() > 0)
                    or (np.abs(np.asarray(solver.fvo.sp)).sum() > 0)):
                kinds.append("semiImplicitSource")
            log(f"#flow: momentum fvOptions active ({', '.join(kinds)})")
        if solver.mrf is not None:
            st2 = solver.state
            solver.state = dataclasses.replace(
                st2, flux=mrf_mod.make_relative(solver.mrf, m, st2.flux)
            )
            log("#flow: MRF zones active")
        # restart flux: prefer the written phi (exact conservative flux);
        # else project the U-rebuilt flux (CorrectPhi, correctPhi.H)
        if case.time_value > 0.0:
            from ..io import polymesh as _pmio

            phi = _pmio.read_surface_field(
                os.path.join(
                    case.case_dir, getattr(case, "time_dir", "0"), "phi"
                ),
                case.poly.patches,
            )
            if phi is not None and len(phi) == m.n_faces:
                solver.state = dataclasses.replace(
                    solver.state, flux=jnp.asarray(phi, m.sf.dtype)
                )
                log("#flow: restart flux from written phi")
            else:
                flux_c, res_c = correct_flux(
                    m, solver.state.flux, p_bcs, pin=pin
                )
                solver.state = dataclasses.replace(solver.state, flux=flux_c)
                log(f"#flow: correctPhi residual={float(res_c):.3e}")
        # dynamic mesh (constant/dynamicMeshDict; mesh.controlledUpdate(),
        # cudaParticlesPimpleFoam.C:147)
        from . import dynamicmesh as dyn_mod

        solver.dyn = None
        motion = dyn_mod.read_dynamic_mesh(case.case_dir)
        if motion is not None:
            from ..io import polymesh

            solver.dyn = dyn_mod.DynamicMesh(motion, case.poly, dtype=m.sf.dtype)
            u0 = os.path.join(case.case_dir, "0", "U")
            bcs0 = polymesh.read_field_bcs(u0) if os.path.exists(u0) else {}
            solver.moving_patches = tuple(
                k for k, e in bcs0.items() if e[0] == "movingWallVelocity"
            )
            # the AMG aggregation is TOPOLOGICAL (face-graph pairing seeded
            # by the initial-geometry weights); the Galerkin coarse
            # operators are rebuilt from the current pressure matrix at
            # every solve (fv.amg_coarse_ops), so the hierarchy stays valid
            # under mesh motion — preconditioning quality degrades only as
            # far as the deformation skews the initial pairing.
            log(f"#flow: dynamic mesh: {motion.kind} "
                f"(moving walls: {solver.moving_patches})")
        solver.kes = solver.k_bcs = solver.e_bcs = solver.wi = None
        solver.turb_model = turbulence_model(case.case_dir)
        if solver.turb_model != "laminar":
            from . import turbulence as turb

            solver.kes, solver.k_bcs, solver.e_bcs, solver.wi = turb.init_model(
                solver.turb_model, case.case_dir, m,
                time_dir=getattr(case, "time_dir", "0"),
            )
            log(f"#flow: {solver.turb_model} closure active")
        log(f"#flow: PIMPLE solver on {m.n_cells} cells, nu={nu}")
        return solver

    def _apply_p_tables(self, t: float):
        """Interpolate time tables (uniformTotalPressure p0 ramps) into the
        pressure BC offsets for the current time."""
        import dataclasses as _dc

        tables = getattr(self, "p_tables", None)
        if not tables:
            return
        b = self.p_bcs.b
        names = {p[0]: p for p in self.m.patch_slices}
        for patch, tab in tables.items():
            if patch not in names:
                continue
            ts = np.array([x[0] for x in tab])
            vs = np.array([x[1] for x in tab])
            val = float(np.interp(t, ts, vs))
            _, _, start, cnt = names[patch]
            b = b.at[start : start + cnt, 0].set(val)
        self.p_bcs = _dc.replace(self.p_bcs, b=b)

    def advance(self, dt_e: float):
        self.time = getattr(self, "time", 0.0) + dt_e
        self._apply_p_tables(self.time)
        if getattr(self, "dyn", None) is not None:
            # mesh.controlledUpdate() + correctPhi + makeRelative
            # (cudaParticlesPimpleFoam.C:144-166)
            from . import dynamicmesh as dyn_mod

            self.m, mesh_phi, bd_vel = self.dyn.update(self.time, dt_e)
            self.u_bcs = dyn_mod.update_moving_wall_bcs(
                self.m, self.u_bcs, bd_vel, getattr(self, "moving_patches", ())
            )
            # absolute flux from the mapped U on the new metrics, projected
            # to conservative, then made relative to the mesh motion
            phi_abs = fv.flux_of(
                self.m, self.state.u,
                fv.effective_bcs(self.u_bcs, self.state.flux[self.m.n_internal:]),
            )
            phi_abs, _ = correct_flux(
                self.m, phi_abs, self.p_bcs, pin=self.cfg.pin_pressure
            )
            self.state = dataclasses.replace(
                self.state, flux=phi_abs - mesh_phi
            )
        nut = None if getattr(self, "kes", None) is None else self.kes.nut
        nut_bd = None
        if nut is not None:
            from . import turbulence as turb

            nut_bd = turb.wall_nut_bd(
                self.m, self.wi, self.kes.nut, self.kes.k, self.cfg.nu
            )
        self.state, res = pimple_step(
            self.m, self.state, self.u_bcs, self.p_bcs, self.cfg, dt_e, nut=nut,
            amg=getattr(self, "amg", None), nut_bd=nut_bd,
            mrf=getattr(self, "mrf", None), fvo=getattr(self, "fvo", None),
        )
        if "fvo_grad_p" in res:
            self.fvo = dataclasses.replace(
                self.fvo, grad_p=res.pop("fvo_grad_p"),
                dgrad=res.pop("fvo_dgrad"),
            )
        if getattr(self, "kes", None) is not None:
            from . import turbulence as turb

            self.kes = turb.model_step(
                getattr(self, "turb_model", "kEpsilon"),
                self.m, self.kes, self.state.u, self.u_bcs, self.state.flux,
                self.k_bcs, self.e_bcs, self.wi, self.cfg.nu, dt=dt_e,
            )
        self.log(
            f"#flow: U residual={float(res['u_res']):.3e} "
            f"p residual={float(res['p_res']):.3e} "
            f"continuity={float(res['continuity']):.3e}"
        )
        return res

    def stable_dt(self, ctrl, dt_current=None):
        """maxCo-scaled time step (setDeltaT semantics)."""
        dt0 = dt_current or ctrl.delta_t
        co = float(courant_number(self.m, self.state.flux, dt0))
        if co <= 0.0:
            return dt0
        scale = min(ctrl.max_co / max(co, 1e-12), 1.2)
        return min(dt0 * scale, ctrl.delta_t * 100)

    def cell_velocity(self) -> np.ndarray:
        return np.asarray(self.state.u)

    def write(self, case_dir: str, time_name: str):
        from .simple import write_solution

        return write_solution(case_dir, time_name, self.m, self.state)
