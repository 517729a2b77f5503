"""Convex face-crossing locator and reflector — the "ConvexPoly" mode.

The reference ships two interchangeable cell-location algorithms selected
at build time (``RTX`` env -> ``-DConvexPoly``,
``applications/*/Make/options:1-5``): the barycentric sign-walk
(:mod:`.locate`, ``query/RTQuery.cu``) and this one — exact segment/face-
plane intersection tracing (``query/ConvexQuery.cu``).  Here both are
runtime options (``StepConfig.locate_mode``).

Semantics mirrored from the reference:
* ``trace_segment`` == ``traceIntet`` + ``particleLocator``
  (``ConvexQuery.cu:32-216``): march the displacement segment
  P -> P+disp through tets; in each tet the exit face satisfies
  ``face_dist < tol``, ``tol < dT <= 1`` with minimal ``dT`` (tol=1e-13),
  the inlet face being skipped; <= 50 tets; at a boundary the march stops
  at the hit point and the lane is tagged ``-(startTet+1)`` (the reference
  tags with the *starting* tet, ``ConvexQuery.cu:212``).
* ``convex_reflect`` == ``convexReflector``/``reflectInTet``
  (``ConvexQuery.cu:239-436``): mirror the remaining segment and velocity
  across the hit face, re-trace, <= 5 bounces; afterwards the particle
  sits at the last hit point with ``disp`` = remaining mirrored segment
  (so the move lands it at the reflected end point,
  ``ConvexQuery.cu:414-435``).

Uses the per-tet outward face planes (``tet_face_n``/``tet_face_d``) and
global face ids (``tet_faces``) for inlet-face suppression.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from ..mesh import TetMesh

TOL = 1e-13      # ConvexQuery.cu:42
MAX_TETS = 50    # ConvexQuery.cu:169
MAX_BOUNCES = 5  # ConvexQuery.cu:353


def _tet_tables(mesh: TetMesh, safe):
    """(normals[c,4,3], offsets[c,4], nbr[c,4], fids[c,4]) for tets
    ``safe`` — ONE row gather when the packed table is attached
    (:func:`~cudaparticlesfoam_tpu.mesh.with_convex_rows`), else four."""
    if mesh.tet_row_cx is not None:
        row = mesh.tet_row_cx[safe]
        c = safe.shape[0]
        return (
            row[:, 0:12].reshape(c, 4, 3),
            row[:, 12:16],
            row[:, 16:20].astype(jnp.int32),
            row[:, 20:24].astype(jnp.int32),
        )
    return (
        mesh.tet_face_n[safe],
        mesh.tet_face_d[safe],
        mesh.tet_nbr[safe],
        mesh.tet_faces[safe],
    )


def _exit_face_tables(n, d, nbr, p0, seg, suppress):
    """Core of one ``traceIntet`` on explicit per-lane tables:
    (dT, slot) of the admitted exit face with minimal dT (scan order,
    strict '<'), slot=-1 when the segment ends inside.  ``suppress`` is
    the [c,4] bool mask of faces excluded from admission (the inlet-face
    skip — by face id in :func:`_exit_face`, by came-from neighbor code in
    the cached engine; equivalent because two tets share exactly one
    face)."""
    c = p0.shape[0]
    tol = jnp.asarray(TOL, p0.dtype)
    # the reference evaluates dot(A-P0, n) with n oriented INWARD of the
    # current tet (sorted-face parity, ConvexQuery.cu:77-79): inside points
    # give face_dist <= 0, so the `face_dist < tol` test admits real exits
    face_dist = jnp.sum(n * p0[:, None, :], axis=-1) - d     # dot(A-P0, n_in)
    denom = -jnp.sum(n * seg[:, None, :], axis=-1)
    dt_ = face_dist / denom
    dt_ = jnp.where(jnp.isinf(dt_), -1.0, dt_)               # parallel segment
    ok = (
        (face_dist < tol)
        & (dt_ > tol)
        & (dt_ <= 1.0)
        & ~suppress
    )
    dt_masked = jnp.where(ok, dt_, 1.1)
    best_dt = jnp.full(c, 1.1, p0.dtype)
    best_slot = jnp.full(c, -1, jnp.int32)
    for i in range(4):                                        # scan order, '<'
        upd = dt_masked[:, i] < best_dt
        best_dt = jnp.where(upd, dt_masked[:, i], best_dt)
        best_slot = jnp.where(upd, jnp.int32(i), best_slot)
    return best_dt, best_slot


def _exit_face(mesh: TetMesh, p0, seg, tet, inlet_face):
    """One ``traceIntet``: (dT, slot, next_code, face_id) for the segment
    p0 -> p0+seg leaving ``tet``; slot=-1 when the segment ends inside."""
    c = p0.shape[0]
    safe = jnp.maximum(tet, 0)
    n, d, nbr, fids = _tet_tables(mesh, safe)
    best_dt, best_slot = _exit_face_tables(
        n, d, nbr, p0, seg, fids == inlet_face[:, None]
    )
    hit = best_slot >= 0
    slot_safe = jnp.maximum(best_slot, 0)
    lane = jnp.arange(c)
    nxt = nbr[lane, slot_safe]
    face_id = fids[lane, slot_safe]
    return (
        best_dt,
        best_slot,
        jnp.where(hit, nxt, tet),
        jnp.where(hit, face_id, jnp.int32(-2)),
    )


def trace_segment(mesh: TetMesh, pos, disp, tet_id, active=None,
                  max_tets: int = MAX_TETS):
    """Vectorized ``particleLocator``.

    Returns (code, stop_tet, p_cross): ``code`` = final hosting tet, or
    ``-(startTet+1)`` on a wall hit (reference quirk); ``stop_tet`` = the
    tet the march actually stopped in (what the reflector needs);
    ``p_cross`` = the march point (wall-hit point for wall lanes)."""
    n = pos.shape[0]
    p_end = pos + disp
    act = jnp.ones(n, bool) if active is None else active
    live0 = act & (tet_id >= 0)
    start_tet = tet_id

    def cond(c):
        p0, tet, inlet, done, hit_wall, i = c
        return (i < max_tets) & jnp.logical_not(jnp.all(done))

    def body(c):
        p0, tet, inlet, done, hit_wall, i = c
        seg = p_end - p0
        dt_, slot, nxt, fid = _exit_face(mesh, p0, seg, tet, inlet)
        crossing = (~done) & (slot >= 0)
        inside = (~done) & (slot < 0)
        p0 = jnp.where(crossing[:, None], p0 + dt_[:, None] * seg, p0)
        wall = crossing & (nxt < 0)
        tet = jnp.where(crossing & ~wall, nxt, tet)
        inlet = jnp.where(crossing, fid, inlet)
        done = done | inside | wall
        hit_wall = hit_wall | wall
        return p0, tet, inlet, done, hit_wall, i + 1

    inlet0 = jnp.full((n,), -2, jnp.int32)
    p0, stop_tet, last_face, done, hit_wall, _ = lax.while_loop(
        cond,
        body,
        (pos, jnp.maximum(tet_id, 0), inlet0, ~live0, jnp.zeros(n, bool),
         jnp.zeros((), jnp.int32)),
    )
    code = jnp.where(hit_wall, -(start_tet + 1), stop_tet)
    code = jnp.where(live0, code, tet_id)
    return code, stop_tet, p0, last_face


def _hit_face_plane(mesh: TetMesh, stop_tet, p_cross, last_face):
    """Outward plane (n, d) of the face that terminated the trace: matched
    by the crossed face id carried through the trace (the reference's
    reflectInTet re-identifies it by its dT==tol signature,
    ``ConvexQuery.cu:286``; carrying the id is exact at corners)."""
    safe = jnp.maximum(stop_tet, 0)
    nrm, dpl, nbr, fids = _tet_tables(mesh, safe)
    match = fids == last_face[:, None]
    # fallback: nearest boundary plane when no id match (shouldn't happen)
    dist = jnp.abs(dpl - jnp.sum(nrm * p_cross[:, None, :], axis=-1))
    is_bd = nbr < 0
    score = jnp.where(match, -1.0, jnp.where(is_bd, dist, jnp.inf))
    slot = jnp.argmin(score, axis=-1).astype(jnp.int32)
    lane = jnp.arange(stop_tet.shape[0])
    return nrm[lane, slot], dpl[lane, slot]


def _escapes_at(mesh: TetMesh, tet, p_at, fid, lanes):
    """True for ``lanes`` whose hit face (matched like
    :func:`_hit_face_plane`) is an absorbing boundary face
    (``mesh.bd_escape``)."""
    if mesh.bd_escape.size == 0:
        return jnp.zeros_like(lanes)
    safe = jnp.maximum(tet, 0)
    nrm, dpl, nbr, fids = _tet_tables(mesh, safe)
    match = fids == fid[:, None]
    dist = jnp.abs(dpl - jnp.sum(nrm * p_at[:, None, :], axis=-1))
    is_bd = nbr < 0
    score = jnp.where(match, -1.0, jnp.where(is_bd, dist, jnp.inf))
    slot = jnp.argmin(score, axis=-1).astype(jnp.int32)
    lane = jnp.arange(tet.shape[0])
    code = nbr[lane, slot]
    bd = jnp.clip(-code - 1, 0, max(mesh.n_bd_faces - 1, 0))
    return lanes & (code < 0) & mesh.bd_escape[bd]


def convex_reflect(mesh: TetMesh, pos, disp, vel, tet_id, stop_tet, p_cross,
                   hit_face, max_bounces: int = MAX_BOUNCES):
    """Vectorized ``convexReflector`` for wall-hit lanes (tet_id < 0).

    Absorbing (escape) boundary faces deactivate instead of reflecting —
    the same data-driven fix for the reference's reflect-everywhere TODO
    the bary reflector applies (``RTQuery.cu:165-166``): the lane keeps
    its negative wall code, parks at the hit point, and sheds its
    remaining displacement.

    Returns (pos, disp, vel, tet_id)."""
    hit = tet_id < 0
    p_end = pos + disp
    u = vel
    p_hit = jnp.where(hit[:, None], p_cross, pos)
    p_start = p_hit
    tet_c = jnp.where(hit, stop_tet, jnp.maximum(tet_id, 0))
    esc = _escapes_at(mesh, tet_c, p_cross, hit_face, hit)
    settled = ~hit | esc

    def mirror(p_end, u, tet, p_at, fid, refl):
        nsel, dsel = _hit_face_plane(mesh, tet, p_at, fid)
        pe = p_end - 2.0 * (jnp.sum(p_end * nsel, -1) - dsel)[:, None] * nsel
        un = u - 2.0 * jnp.sum(u * nsel, -1)[:, None] * nsel
        return (
            jnp.where(refl[:, None], pe, p_end),
            jnp.where(refl[:, None], un, u),
        )

    # first bounce: mirror across the face found by the main trace
    p_end, u = mirror(p_end, u, tet_c, p_cross, hit_face, ~settled)

    def cond(c):
        p_start, p_end, p_hit, u, tet, settled, esc, b = c
        return (b < max_bounces) & jnp.logical_not(jnp.all(settled))

    def body(c):
        p_start, p_end, p_hit, u, tet, settled, esc, b = c
        refl = ~settled
        code, s_tet, p_cr, l_face = trace_segment(
            mesh, p_start, p_end - p_start, jnp.maximum(tet, 0), active=refl
        )
        landed = refl & (code >= 0)
        tet = jnp.where(landed, code, jnp.where(refl, s_tet, tet))
        settled = settled | landed
        refl = refl & ~landed
        # still hitting a wall: absorb on escape faces, else mirror again
        new_esc = _escapes_at(mesh, jnp.where(refl, s_tet, tet), p_cr,
                              l_face, refl)
        esc = esc | new_esc
        settled = settled | new_esc
        p_hit = jnp.where(refl[:, None], p_cr, p_hit)
        refl = refl & ~new_esc
        p_start = jnp.where(refl[:, None], p_cr, p_start)
        p_end, u = mirror(p_end, u, tet, p_cr, l_face, refl)
        return p_start, p_end, p_hit, u, tet, settled, esc, b + 1

    p_start, p_end, p_hit, u, tet_c, settled, esc, _ = lax.while_loop(
        cond, body,
        (p_start, p_end, p_hit, u, tet_c, settled, esc,
         jnp.zeros((), jnp.int32)),
    )
    new_pos = jnp.where(hit[:, None], p_hit, pos)
    new_disp = jnp.where(esc[:, None], 0.0,
                         jnp.where(hit[:, None], p_end - p_hit, disp))
    new_vel = jnp.where(hit[:, None], u, vel)
    new_tet = jnp.where(esc, tet_id, jnp.where(hit, tet_c, tet_id))
    return new_pos, new_disp, new_vel, new_tet
