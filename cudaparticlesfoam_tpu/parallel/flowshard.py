"""Domain-decomposed (sharded) incompressible flow solve.

The TPU-native answer to the reference's MPI fluid decomposition
(``decomposePar`` with the ``simple``/``hierarchical`` method +
``mpirun -np 4 cudaParticlesPimpleFoam -parallel``,
``tutorials/.../TJunction/Allrun-parallel:10-11``,
``TJunction/system/decomposeParDict:17-24``): cells are split into
coordinate-rank blocks over a (gx, gy, gz) device grid (1-D slabs by
default, the dict's ``n`` coefficient when present), each device owns
one block plus a one-cell ghost layer, and the PIMPLE step runs under
``shard_map`` with

* ``lax.ppermute`` halo exchange — one directed round per decomposed-
  axis direction — refreshing ghost-cell values before any operator
  that reads neighbour cells (the collectives ride ICI), and
* ``lax.psum`` for the global reductions (CG dot products, residuals,
  continuity).

Unlike the reference — which gathers every rank's mesh and field to the
master and runs the GPU work there (``src/initCuda.H:209-322``) — no
device ever holds the global problem.

Construction reuses the single-device FV layer: each shard is a padded
local :class:`..models.fv.FvMesh` whose cross-partition faces point at
ghost-cell slots appended after the owned cells, so all face operators
(interpolation, surface sums, matrix assembly, matvec) run unchanged;
only the ghost refresh and the masked/psum'd reductions are new.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
def shard_map(f, **kw):
    """jax.shard_map across API generations (check_rep was renamed)."""
    kw.pop("check_rep", None)
    try:
        from jax import shard_map as _sm
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as _sm
        kw["check_rep"] = False
    return _sm(f, **kw)
from jax.sharding import Mesh, PartitionSpec as P

from ..models import fv
from ..models.simple import FlowState
from ..utils.pytree import pytree_dataclass


@pytree_dataclass(meta_fields=("n_dev", "axis", "n_loc", "fv_meta",
                               "halo_perms"))
class ShardedFlowMesh:
    """Stacked per-device FV meshes + halo exchange plan.

    All array fields lead with the device axis [D, ...]; meta carries the
    (static) common local sizes.  ``fv_meta`` holds the FvMesh static
    fields (n_cells incl. ghosts, n_faces, n_internal, patch_slices).
    """

    # stacked FvMesh arrays (see fv.FvMesh) — n_cells axis includes ghosts
    owner: jnp.ndarray
    neighbour: jnp.ndarray
    sf: jnp.ndarray
    mag_sf: jnp.ndarray
    cf: jnp.ndarray
    cc: jnp.ndarray
    vol: jnp.ndarray
    w: jnp.ndarray
    delta: jnp.ndarray
    bd_delta: jnp.ndarray
    nonortho: jnp.ndarray
    # halo plan: R directed exchange rounds over the device grid (2 per
    # decomposed axis: +1 / -1, non-wrapping).  ``send[d, r]`` lists the
    # local cell ids device d contributes to round r; ghost slot layout is
    # [owned | recv_round0 | recv_round1 | ... | dummy] and round r's
    # ppermute pairs are the static ``halo_perms[r]``.
    send: jnp.ndarray         # [D, R, H]
    cell_mask: jnp.ndarray    # [D, C_ext] True on owned (non-ghost, non-pad)
    glob_cell: jnp.ndarray    # [D, C_ext] global cell id (or -1)
    fglob: jnp.ndarray        # [D, nf] signed global face id+1 (0 = pad;
    #                           negative = local orientation flipped)
    n_dev: int
    axis: str
    n_loc: int                # owned cells per device (padded count)
    fv_meta: tuple            # (n_cells_ext, n_faces, n_internal, patch_slices)
    halo_perms: tuple         # per-round ((src, dst), ...) ppermute pairs

    def local_fv(self, sl=slice(None)):
        """View device-local arrays (inside shard_map: leading axis 1)."""
        n_cells, n_faces, n_internal, patch_slices = self.fv_meta
        return fv.FvMesh(
            owner=self.owner[0], neighbour=self.neighbour[0], sf=self.sf[0],
            mag_sf=self.mag_sf[0], cf=self.cf[0], cc=self.cc[0],
            vol=self.vol[0], w=self.w[0], delta=self.delta[0],
            bd_delta=self.bd_delta[0], nonortho=self.nonortho[0],
            n_cells=n_cells, n_faces=n_faces, n_internal=n_internal,
            patch_slices=patch_slices,
        )


def rcb_map(cc, n_dev: int) -> np.ndarray:
    """Recursive coordinate bisection: split the cell set along its
    longest-extent axis into proportionally sized halves until ``n_dev``
    parts (any device count, not just powers of two).  The general-mesh
    decomposition for unstructured cases where axis-aligned block grids
    produce badly balanced or non-convex parts."""
    cc = np.asarray(cc, np.float64)
    dev = np.zeros(len(cc), np.int64)

    def rec(idx, k, base):
        if k == 1:
            dev[idx] = base
            return
        ka = k // 2
        ext = cc[idx].max(axis=0) - cc[idx].min(axis=0)
        ax = int(np.argmax(ext))
        order = idx[np.argsort(cc[idx, ax], kind="stable")]
        cut = int(round(len(idx) * ka / k))
        rec(order[:cut], ka, base)
        rec(order[cut:], k - ka, base + ka)

    rec(np.arange(len(cc), dtype=np.int64), n_dev, 0)
    return dev


def decompose(pm, n_dev: int, dtype=jnp.float32, direction: int = 0,
              grid=None, cell_map=None):
    """Decompose a PolyMesh into a ShardedFlowMesh + per-device BC
    stacking helpers.  Returns (smesh, perm) where ``perm[d, i]`` is the
    global cell id of device d's owned cell i (-1 padding).

    ``grid=(gx, gy, gz)`` (prod = n_dev) selects a multi-axis block
    decomposition — the decomposeParDict ``simple``/``hierarchical``
    method (order xyz): coordinate-rank splits along x, then y within
    each x-block, then z.  ``grid="rcb"`` uses recursive coordinate
    bisection (:func:`rcb_map`); ``grid="graph"`` uses multilevel graph
    bisection (:mod:`.graphpart`, the scotch/metis-parity path);
    ``cell_map`` accepts ANY explicit
    [n_cells] cell->device assignment (the ``decomposePar`` manual-method
    analog).  Default is 1-D slabs along ``direction``.

    Halo exchange is fully general: one directed ppermute round per
    DEVICE-ID DELTA observed across cross faces (a slab/grid map yields
    the classic +-stride rounds; an arbitrary map yields however many
    distinct neighbor offsets it creates — more rounds, never an
    error)."""
    from ..io.polymesh import face_centres_areas

    gm = fv.fv_mesh(pm, dtype=dtype)
    nc = pm.n_cells
    n_int = pm.n_internal_faces
    cc = np.asarray(gm.cc, np.float64)
    own = np.asarray(gm.owner)
    nei = np.asarray(gm.neighbour)

    if cell_map is not None:
        dev_of = np.asarray(cell_map, np.int64)
        if dev_of.shape != (nc,):
            raise ValueError(
                f"cell_map shape {dev_of.shape} != ({nc},)"
            )
        if dev_of.min() < 0 or dev_of.max() >= n_dev:
            raise ValueError(
                f"cell_map device ids outside [0, {n_dev})"
            )
    elif isinstance(grid, str):
        if grid == "rcb":
            dev_of = rcb_map(cc, n_dev)
        elif grid == "graph":
            # multilevel graph bisection (scotch/metis parity); the
            # refined geometric candidate makes its edge-cut dominate RCB
            from . import graphpart

            dev_of = graphpart.graph_map(
                nc, own[:n_int], nei, n_dev, coords=cc
            )
        else:
            raise ValueError(f"unknown decomposition method {grid!r}")
    else:
        if grid is None:
            grid = [1, 1, 1]
            grid[direction] = n_dev
        grid = tuple(int(g) for g in grid)
        gx, gy, gz = grid
        if gx * gy * gz != n_dev:
            raise ValueError(f"decomposition grid {grid} != {n_dev} devices")

        # hierarchical coordinate-rank assignment (equal cell counts per
        # block, the decomposeParDict `simple`/`hierarchical` xyz order)
        def _split(idx, axis_c, k):
            order = idx[np.argsort(cc[idx, axis_c], kind="stable")]
            bounds = np.linspace(0, len(idx), k + 1).astype(np.int64)
            return [order[bounds[i] : bounds[i + 1]] for i in range(k)]

        dev_of = np.empty(nc, np.int64)
        for ix, sx in enumerate(_split(np.arange(nc), 0, gx)):
            for iy, sy in enumerate(_split(sx, 1, gy)):
                for iz, sz in enumerate(_split(sy, 2, gz)):
                    dev_of[sz] = (ix * gy + iy) * gz + iz

    # exchange rounds: one directed ppermute per distinct device-id delta
    # across cross faces (generic — no adjacency requirement on the map)
    do, dn = dev_of[own[:n_int]], dev_of[nei]
    cross = do != dn
    deltas = sorted(
        {int(v) for v in np.unique(dn[cross] - do[cross])}
        | {int(v) for v in np.unique(do[cross] - dn[cross])}
    )
    dirs = [d for d in deltas if d != 0]
    n_rounds = max(len(dirs), 1)

    # local numbering per device
    loc_id = np.empty(nc, np.int64)
    n_owned = np.zeros(n_dev, np.int64)
    for d in range(n_dev):
        cells = np.where(dev_of == d)[0]
        loc_id[cells] = np.arange(len(cells))
        n_owned[d] = len(cells)
    n_loc = int(n_owned.max())

    # send lists per device per round: cells with a cross face whose other
    # cell sits delta_r device-ids away
    send = [[[] for _ in range(n_rounds)] for _ in range(n_dev)]
    for f in np.where(cross)[0]:
        a, b = own[f], nei[f]
        da, db = dev_of[a], dev_of[b]
        for r, st in enumerate(dirs):
            if db - da == st:
                send[da][r].append(a)
                # the reverse round exists for every delta (deltas come in
                # +/- pairs), so b's contribution lands there
            if da - db == st:
                send[db][r].append(b)
    send = [[np.unique(np.array(s, np.int64)) if len(s) else
             np.array([], np.int64) for s in dev_rounds]
            for dev_rounds in send]
    n_halo = max([len(s) for dev_rounds in send for s in dev_rounds] + [1])
    # ghost layout per device: [owned | recv_round0..R-1 (n_halo each) | dummy]
    c_ext = n_loc + n_rounds * n_halo + 1
    dummy = c_ext - 1

    # per-round ppermute pairs (static) — round r: every device with a
    # nonempty send list ships to d + delta_r; receivers fill ghost
    # block r (a fixed delta keeps sources and destinations distinct, so
    # each round is a valid partial permutation)
    halo_perms = tuple(
        tuple(
            (d, d + st) for d in range(n_dev)
            if 0 <= d + st < n_dev and len(send[d][r])
        )
        for r, st in enumerate(dirs)
    ) or ((),)

    # ghost slot lookup: device d, global cell g on a neighbor -> slot.
    # Round r's ghosts on device d come from sender d - delta_r.
    ghost_slot = [dict() for _ in range(n_dev)]
    for r, st in enumerate(dirs):
        g0 = n_loc + r * n_halo
        for d in range(n_dev):
            sender = d - st
            if not (0 <= sender < n_dev):
                continue
            for i, g in enumerate(send[sender][r]):
                ghost_slot[d][g] = g0 + i

    f_ctr, f_area = face_centres_areas(pm)
    mag_g = np.asarray(gm.mag_sf)
    w_g = np.asarray(gm.w)
    delta_g = np.asarray(gm.delta)
    nonor_g = np.asarray(gm.nonortho)
    vol_g = np.asarray(gm.vol)
    bd_delta_g = np.asarray(gm.bd_delta)

    # per-device face lists: internal-local + cross (as internal with ghost
    # neighbour) then boundary
    dev_faces = []     # (own_l, nei_l, sf, mag, w, delta, nonortho, cf, fg) per dev
    dev_bd = []        # (own_l, sf, mag, bd_delta, bglob, cf) per dev
    for d in range(n_dev):
        oi, ni_, sfl, magl, wl, dl, kl, cfl = [], [], [], [], [], [], [], []
        fgl = []
        for f in range(n_int):
            a, b = own[f], nei[f]
            da, db = dev_of[a], dev_of[b]
            if da == d and db == d:
                oi.append(loc_id[a]); ni_.append(loc_id[b])
                sfl.append(f_area[f]); magl.append(mag_g[f])
                wl.append(w_g[f]); dl.append(delta_g[f]); kl.append(nonor_g[f])
                cfl.append(f_ctr[f]); fgl.append(f + 1)
            elif da == d or db == d:
                # keep owner-side orientation per device: local cell is
                # "owner", remote ghost is "neighbour"; flip geometry if the
                # local cell was the global neighbour
                if da == d:
                    oi.append(loc_id[a]); ni_.append(ghost_slot[d][b])
                    sfl.append(f_area[f]); wl.append(w_g[f])
                    fgl.append(f + 1)
                else:
                    oi.append(loc_id[b]); ni_.append(ghost_slot[d][a])
                    sfl.append(-f_area[f]); wl.append(1.0 - w_g[f])
                    fgl.append(-(f + 1))
                magl.append(mag_g[f]); dl.append(delta_g[f])
                kl.append(nonor_g[f] if da == d else -nonor_g[f])
                cfl.append(f_ctr[f])
        bo, bsf, bmag, bdl, bgl, bcf = [], [], [], [], [], []
        for bf in range(n_int, pm.n_faces):
            a = own[bf]
            if dev_of[a] != d:
                continue
            bo.append(loc_id[a]); bsf.append(f_area[bf]); bmag.append(mag_g[bf])
            bdl.append(bd_delta_g[bf - n_int]); bgl.append(bf - n_int)
            bcf.append(f_ctr[bf])
        dev_faces.append((np.array(oi, np.int64), np.array(ni_, np.int64),
                          np.array(sfl), np.array(magl), np.array(wl),
                          np.array(dl), np.array(kl).reshape(-1, 3),
                          np.array(cfl).reshape(-1, 3),
                          np.array(fgl, np.int64)))
        dev_bd.append((np.array(bo, np.int64), np.array(bsf).reshape(-1, 3),
                       np.array(bmag), np.array(bdl),
                       np.array(bgl, np.int64), np.array(bcf).reshape(-1, 3)))

    nf_int = max(len(t[0]) for t in dev_faces)
    nf_bd = max(max(len(t[0]) for t in dev_bd), 1)

    def padded(arr, n, fill=0.0, dt=None):
        arr = np.asarray(arr, dt if dt else None)
        shape = (n,) + arr.shape[1:]
        out = np.full(shape, fill, arr.dtype if arr.size else np.float64)
        out[: len(arr)] = arr
        return out

    owner_s, neigh_s, sf_s, mag_s, w_s, delta_s, k_s = [], [], [], [], [], [], []
    bdelta_s, vol_s, cc_s, cf_s = [], [], [], []
    send_s, mask_s, glob_s, bglob_s, fglob_s = [], [], [], [], []
    for d in range(n_dev):
        oi, ni_, sfl, magl, wl, dl, kl, cfl, fgl = dev_faces[d]
        bo, bsf, bmag, bdl, bgl, bcf = dev_bd[d]
        # padded faces: zero geometry, both cells -> dummy (no contribution:
        # sf=0, delta=0, flux on them stays 0)
        owner_s.append(np.concatenate([
            padded(oi, nf_int, dummy, np.int64),
            padded(bo, nf_bd, dummy, np.int64),
        ]))
        neigh_s.append(padded(ni_, nf_int, dummy, np.int64))
        sf_s.append(np.concatenate([
            padded(sfl.reshape(-1, 3), nf_int), padded(bsf, nf_bd)]))
        mag_s.append(np.concatenate([padded(magl, nf_int), padded(bmag, nf_bd)]))
        w_s.append(padded(wl, nf_int, 0.5))
        delta_s.append(padded(dl, nf_int))
        k_s.append(padded(kl, nf_int))
        bdelta_s.append(padded(bdl, nf_bd))
        cells_d = np.where(dev_of == d)[0][np.argsort(loc_id[dev_of == d])]
        volv = np.ones(c_ext)
        volv[: len(cells_d)] = vol_g[cells_d]
        vol_s.append(volv)
        # cell centres incl. GHOST slots (static geometry; linearUpwind's
        # d_up and limitedLinear's d read remote upwind centres)
        ccv = np.zeros((c_ext, 3))
        ccv[: len(cells_d)] = cc[cells_d]
        for r, st in enumerate(dirs):
            if 0 <= d - st < n_dev:
                sl = send[d - st][r]
                ccv[n_loc + r * n_halo : n_loc + r * n_halo + len(sl)] = cc[sl]
        cc_s.append(ccv)
        cf_s.append(np.concatenate([
            padded(cfl, nf_int), padded(bcf, nf_bd)]))
        send_s.append(np.stack([
            padded(loc_id[s] if len(s) else np.array([0], np.int64),
                   n_halo, 0, np.int64)
            for s in send[d]
        ]))
        maskv = np.zeros(c_ext, bool)
        maskv[: n_owned[d]] = True
        mask_s.append(maskv)
        gl = np.full(c_ext, -1, np.int64)
        gl[: len(cells_d)] = cells_d
        glob_s.append(gl)
        bglob_s.append(padded(bgl, nf_bd, -1, np.int64))
        fglob_s.append(np.concatenate([
            padded(fgl, nf_int, 0, np.int64),
            padded(np.asarray(bgl, np.int64) + n_int + 1, nf_bd, 0, np.int64),
        ]))

    as_f = lambda xs: jnp.asarray(np.stack(xs), dtype)
    as_i = lambda xs: jnp.asarray(np.stack(xs), jnp.int32)
    smesh = ShardedFlowMesh(
        owner=as_i(owner_s), neighbour=as_i(neigh_s), sf=as_f(sf_s),
        mag_sf=as_f(mag_s), cf=as_f(cf_s), cc=as_f(cc_s), vol=as_f(vol_s),
        w=as_f(w_s), delta=as_f(delta_s), bd_delta=as_f(bdelta_s),
        nonortho=as_f(k_s),
        send=as_i(send_s),
        cell_mask=jnp.asarray(np.stack(mask_s)),
        glob_cell=as_i(glob_s),
        fglob=as_i(fglob_s),
        n_dev=n_dev, axis="f", n_loc=n_loc,
        fv_meta=(c_ext, nf_int + nf_bd, nf_int, ()),
        halo_perms=halo_perms,
    )
    return smesh, jnp.asarray(np.stack(bglob_s), jnp.int32)


def shard_bcs(bc: fv.BoundaryCoeffs, bglob, dtype=None):
    """Stack per-device BoundaryCoeffs by the device boundary-face lists
    (padded faces get a=1, b=0: zeroGradient into the dummy cell).

    ``slip_mask`` (slip/symmetry vector BCs: tangential projection in
    fv.boundary_value, a per-face LOCAL operation using the device's own
    boundary normals) is always emitted — all-False when the case has no
    slip patches — so the shard_map BC specs stay shape-static."""
    a = np.asarray(bc.a)
    b = np.asarray(bc.b)
    io = np.asarray(bc.io_mask) if bc.io_mask is not None else None
    iov = np.asarray(bc.io_value) if bc.io_value is not None else None
    sm = np.asarray(bc.slip_mask) if bc.slip_mask is not None else None
    bg = np.asarray(bglob)
    D, B = bg.shape
    a_s = np.ones((D, B), a.dtype)
    b_s = np.zeros((D, B, b.shape[1]), b.dtype)
    io_s = np.zeros((D, B), bool)
    iov_s = np.zeros((D, B, b.shape[1]), b.dtype)
    sm_s = np.zeros((D, B), bool)
    valid = bg >= 0
    a_s[valid] = a[bg[valid]]
    b_s[valid] = b[bg[valid]]
    if io is not None:
        io_s[valid] = io[bg[valid]]
        iov_s[valid] = iov[bg[valid]]
    if sm is not None:
        sm_s[valid] = sm[bg[valid]]
    return fv.BoundaryCoeffs(
        a=jnp.asarray(a_s), b=jnp.asarray(b_s),
        io_mask=jnp.asarray(io_s), io_value=jnp.asarray(iov_s),
        slip_mask=jnp.asarray(sm_s),
    )


def scatter_cells(smesh: ShardedFlowMesh, x_global, fill=0.0):
    """Global per-cell array -> stacked per-device extended arrays."""
    gl = np.asarray(smesh.glob_cell)
    xg = np.asarray(x_global)
    out = np.full(gl.shape + xg.shape[1:], fill, xg.dtype)
    valid = gl >= 0
    out[valid] = xg[gl[valid]]
    return jnp.asarray(out)


def scatter_faces(smesh: ShardedFlowMesh, x_global):
    """Global per-face array -> stacked per-device face arrays via the
    signed global-face map (flipped cross faces negate; padded slots 0)."""
    fg = np.asarray(smesh.fglob)
    x = np.asarray(x_global)
    out = np.zeros(fg.shape + x.shape[1:], x.dtype)
    pos = fg > 0
    neg = fg < 0
    out[pos] = x[fg[pos] - 1]
    out[neg] = -x[-fg[neg] - 1]
    return jnp.asarray(out)


def refresh_sharded_geometry(smesh: ShardedFlowMesh, m_new: fv.FvMesh
                             ) -> ShardedFlowMesh:
    """Re-scatter the per-device FV geometry from a MOVED global mesh
    (same topology — the sharded ``mesh.controlledUpdate()``,
    ``cudaParticlesPimpleFoam.C:144-170``).  The decomposition (cell/face
    assignment, halo rounds, shapes) is pinned, so every compiled sharded
    step survives; only array CONTENTS change."""
    fg = np.asarray(smesh.fglob)
    nf_int_l = smesh.fv_meta[2]
    n_int_g = int(np.asarray(m_new.neighbour).shape[0])
    sf_g = np.asarray(m_new.sf, np.float64)
    mag_g = np.asarray(m_new.mag_sf, np.float64)
    cf_g = np.asarray(m_new.cf, np.float64)
    w_g = np.asarray(m_new.w, np.float64)
    delta_g = np.asarray(m_new.delta, np.float64)
    nonor_g = np.asarray(m_new.nonortho, np.float64)
    bd_delta_g = np.asarray(m_new.bd_delta, np.float64)
    vol_g = np.asarray(m_new.vol, np.float64)
    cc_g = np.asarray(m_new.cc, np.float64)

    D, NF = fg.shape
    gid = np.abs(fg) - 1
    valid = fg != 0
    sign = np.sign(fg).astype(np.float64)
    sf = np.zeros((D, NF, 3))
    sf[valid] = sign[valid, None] * sf_g[np.clip(gid[valid], 0, None)]
    mag = np.zeros((D, NF))
    mag[valid] = mag_g[gid[valid]]
    cfv = np.zeros((D, NF, 3))
    cfv[valid] = cf_g[gid[valid]]

    fgi = fg[:, :nf_int_l]
    vi = fgi != 0
    gii = np.abs(fgi) - 1
    w = np.full((D, nf_int_l), 0.5)
    w[vi] = np.where(fgi[vi] > 0, w_g[gii[vi]], 1.0 - w_g[gii[vi]])
    delta = np.zeros((D, nf_int_l))
    delta[vi] = delta_g[gii[vi]]
    nonor = np.zeros((D, nf_int_l, 3))
    nonor[vi] = (np.sign(fgi[vi]).astype(np.float64)[:, None]
                 * nonor_g[gii[vi]])

    fgb = fg[:, nf_int_l:]
    vb = fgb != 0
    bd_delta = np.zeros((D, NF - nf_int_l))
    bd_delta[vb] = bd_delta_g[np.abs(fgb[vb]) - 1 - n_int_g]

    gl = np.asarray(smesh.glob_cell)
    vol = np.ones(gl.shape)
    vol[gl >= 0] = vol_g[gl[gl >= 0]]
    cc = np.zeros(gl.shape + (3,))
    cc[gl >= 0] = cc_g[gl[gl >= 0]]
    # ghost cell centres: round r on device dst come from sender src per
    # the static halo pairs; send lists hold SENDER-local cell ids
    send = np.asarray(smesh.send)
    n_halo = send.shape[2]
    n_loc = smesh.n_loc
    for r, pairs in enumerate(smesh.halo_perms):
        for src, dst in pairs:
            gsend = gl[src, send[src, r]]
            cc[dst, n_loc + r * n_halo : n_loc + (r + 1) * n_halo] = (
                cc_g[np.clip(gsend, 0, None)]
            )

    dt = smesh.sf.dtype
    return dataclasses.replace(
        smesh,
        sf=jnp.asarray(sf, dt), mag_sf=jnp.asarray(mag, dt),
        cf=jnp.asarray(cfv, dt), cc=jnp.asarray(cc, dt),
        vol=jnp.asarray(vol, dt), w=jnp.asarray(w, dt),
        delta=jnp.asarray(delta, dt), bd_delta=jnp.asarray(bd_delta, dt),
        nonortho=jnp.asarray(nonor, dt),
    )


def gather_cells(smesh: ShardedFlowMesh, x_stacked):
    """Stacked per-device extended arrays -> global per-cell array."""
    gl = np.asarray(smesh.glob_cell)
    xs = np.asarray(x_stacked)
    nc = int(gl.max()) + 1
    out = np.zeros((nc,) + xs.shape[2:], xs.dtype)
    valid = gl >= 0
    out[gl[valid]] = xs[valid]
    return out


# ----------------------------------------------------------------- kernels


def make_halo_refresh(smesh: ShardedFlowMesh, axis: str):
    """ppermute halo exchange over the decomposition's directed rounds:
    fill each ghost block from the corresponding neighbor's send list.
    Returns refresh(m_s, x) for use INSIDE shard_map (m_s device-local)."""
    n_loc = smesh.n_loc
    n_halo = smesh.send.shape[2]
    perms = smesh.halo_perms

    def refresh(m_s, x):
        snd = m_s.send[0]
        for r, perm in enumerate(perms):
            g0 = n_loc + r * n_halo
            x = x.at[g0 : g0 + n_halo].set(
                lax.ppermute(x[snd[r]], axis, list(perm))
            )
        return x

    return refresh


def make_flux_init(smesh: ShardedFlowMesh, device_mesh: Mesh):
    """Jitted initial face flux from a sharded velocity field (the
    sharded analog of ``fv.flux_of`` at case load)."""
    axis = device_mesh.axis_names[0]
    refresh = make_halo_refresh(smesh, axis)

    def local(m_s, u, u_bcs):
        lm = m_s.local_fv()
        u = u[0]
        u_bcs = jax.tree.map(lambda x: x[0], u_bcs)
        u = refresh(m_s, u)
        return fv.flux_of(lm, u, u_bcs)[None]

    specs = _mesh_specs(smesh, axis)
    bc_spec = fv.BoundaryCoeffs(a=P(axis), b=P(axis),
                                io_mask=P(axis), io_value=P(axis),
                                slip_mask=P(axis))
    return jax.jit(shard_map(
        local, mesh=device_mesh,
        in_specs=(specs, P(axis), bc_spec), out_specs=P(axis),
        check_rep=False,
    ))


def make_sharded_correct_flux(smesh: ShardedFlowMesh, device_mesh: Mesh,
                              pin: bool = False, tol: float = 1e-8,
                              max_iter: int = 500):
    """``CorrectPhi`` on the decomposed mesh (``correctPhi.H:1-11``):
    project the stacked face flux divergence-free by solving
    ``laplacian(1, pcorr) == div(phi)`` with a psum-global CG — the
    sharded analog of models.pimple.correct_flux, used after restarts
    and mesh changes (``cudaParticlesPimpleFoam.C:153-163``)."""
    axis = device_mesh.axis_names[0]
    refresh = make_halo_refresh(smesh, axis)
    from ..models.simple import _pressure_matrix

    def local(m_s, flux, p_bcs):
        lm = m_s.local_fv()
        flux = flux[0]
        p_bcs = jax.tree.map(lambda x: x[0], p_bcs)
        mask = m_s.cell_mask[0]
        n_int = lm.n_internal

        def hx(x):
            return refresh(m_s, x)

        def psum_dot(a, b):
            return lax.psum(jnp.sum(jnp.where(mask, a * b, 0.0)), axis)

        safe_diag = lambda d: jnp.where(mask, d, 1.0)
        # pcorr BCs: fixed 0 where p is fixed, zeroGradient elsewhere
        bc0 = dataclasses.replace(p_bcs, b=jnp.zeros_like(p_bcs.b))
        Ap, _ = _pressure_matrix(lm, jnp.ones_like(flux), bc0, False)
        if pin:
            did = lax.axis_index(axis)
            Ap = dataclasses.replace(
                Ap, diag=Ap.diag.at[0].add(jnp.where(did == 0, 1.0, 0.0))
            )
        rhs = jnp.where(mask, -fv.surface_sum(lm, flux), 0.0)
        inv_d = 1.0 / safe_diag(Ap.diag)

        def mv(x):
            y = fv.matvec(lm, Ap, hx(x))
            return jnp.where(mask, y, 0.0)

        x0 = jnp.zeros_like(rhs)
        r0 = rhs - mv(x0)
        z0 = inv_d * r0
        rz0 = psum_dot(r0, z0)
        nb = jnp.sqrt(psum_dot(rhs, rhs)) + 1e-300

        def cond(st):
            x, r, pp, rz, it = st
            return (jnp.sqrt(psum_dot(r, r)) / nb > tol) & (it < max_iter)

        def body(st):
            x, r, pp, rz, it = st
            ap = mv(pp)
            alpha = rz / (psum_dot(pp, ap) + 1e-300)
            x = x + alpha * pp
            r = r - alpha * ap
            z = inv_d * r
            rzn = psum_dot(r, z)
            beta = rzn / (rz + 1e-300)
            return x, r, z + beta * pp, rzn, it + 1

        pc, r, _, _, _ = lax.while_loop(cond, body, (x0, r0, z0, rz0, 0))
        res = jnp.sqrt(psum_dot(r, r)) / nb
        pch = hx(pc)
        dp = pch[lm.neighbour] - pch[lm.owner[:n_int]]
        flux_i = flux[:n_int] - lm.delta * dp
        dp_b = (bc0.a - 1.0) * pch[lm.owner[n_int:]]
        flux_b = flux[n_int:] - lm.bd_delta * dp_b
        return jnp.concatenate([flux_i, flux_b])[None], res[None]

    specs = _mesh_specs(smesh, axis)
    bc_spec = fv.BoundaryCoeffs(a=P(axis), b=P(axis),
                                io_mask=P(axis), io_value=P(axis),
                                slip_mask=P(axis))
    return jax.jit(shard_map(
        local, mesh=device_mesh,
        in_specs=(specs, P(axis), bc_spec), out_specs=(P(axis), P(axis)),
        check_rep=False,
    ))


def _mesh_specs(smesh: ShardedFlowMesh, axis: str):
    return ShardedFlowMesh(
        **{k: P(axis) for k in (
            "owner", "neighbour", "sf", "mag_sf", "cf", "cc", "vol", "w",
            "delta", "bd_delta", "nonortho", "send",
            "cell_mask", "glob_cell", "fglob")},
        n_dev=smesh.n_dev, axis="f", n_loc=smesh.n_loc, fv_meta=smesh.fv_meta,
        halo_perms=smesh.halo_perms,
    )


def shard_mrf(smesh: ShardedFlowMesh, mrf, m: fv.FvMesh):
    """Per-device MRF zone data from global :class:`..models.mrf.MRFZones`:
    stacked cell omega [D, C_ext, 3] (zero on ghosts/pads — Coriolis is an
    owned-cell source) and the static per-device frame face flux [D, nf]
    ``(Omega x (Cf - origin)) . Sf`` in LOCAL face orientation (flipped
    cross faces carry the negated global value, matching the local sf)."""
    from ..models import mrf as mrf_mod

    om_s = scatter_cells(smesh, np.asarray(mrf.cell_omega))
    ff_g = np.asarray(mrf_mod.frame_flux(mrf, m))
    fg = np.asarray(smesh.fglob)
    ff_s = np.zeros(fg.shape, ff_g.dtype)
    valid = fg != 0
    ff_s[valid] = np.sign(fg[valid]) * ff_g[np.abs(fg[valid]) - 1]
    return om_s, jnp.asarray(ff_s, smesh.sf.dtype)


def make_sharded_pimple(smesh: ShardedFlowMesh, cfg, device_mesh: Mesh,
                        with_turb: bool = False, lamg: "LocalAmg | None" = None,
                        with_mrf: bool = False, with_fvo: bool = False,
                        fvo_mvf: bool = False):
    """Build the shard_map'ed PIMPLE step over ``device_mesh``.

    Returns step(u_ext, p_ext, flux, u_bcs_s, p_bcs_s, dt[, lamg][,
    mrf_omega, mrf_flux][, nut, k, wall_cell, y_wall, wall_bd]) operating
    on stacked arrays; ghost slots refreshed internally via ppermute.
    With ``with_turb`` the momentum diffusivity is nu + nut (faces
    interpolated from the halo-refreshed cell field, wall boundary faces
    corrected by the nutkWallFunction).  With ``with_mrf`` the rotating
    frame terms mirror the single-device step (``pimple.py:59-105``):
    the explicit Coriolis source over zone cells and the relative
    convective flux via the precomputed frame face flux from
    :func:`shard_mrf`; rotating-wall boundary velocity is applied to the
    GLOBAL u BCs before sharding (omega is time-constant).
    """
    n_dev = smesh.n_dev
    n_loc = smesh.n_loc
    axis = device_mesh.axis_names[0]
    c_ext, n_faces, n_int, _ = smesh.fv_meta
    refresh = make_halo_refresh(smesh, axis)

    def psum_dot(mask, a, b):
        return lax.psum(jnp.sum(jnp.where(mask, a * b, 0.0)), axis)

    use_amg = lamg is not None

    def local_step(m_s, u, p, flux, u_bcs, p_bcs, dt, *extra):
        # strip the leading device axis shard_map leaves on the pytrees
        lm = m_s.local_fv()
        mask = m_s.cell_mask[0]
        maskf = mask.astype(u.dtype)
        u_bcs = jax.tree.map(lambda x: x[0], u_bcs)
        p_bcs = jax.tree.map(lambda x: x[0], p_bcs)
        u, p, flux = u[0], p[0], flux[0]
        lamg_l = None
        turb_args = extra
        if use_amg:
            lamg_l = jax.tree.map(lambda x: x[0], extra[0])
            turb_args = extra[1:]
        mrf_om = mrf_ff = None
        if with_mrf:
            mrf_om, mrf_ff = turb_args[0][0], turb_args[1][0]
            turb_args = turb_args[2:]
        fvo_su = fvo_sp = fvo_mask = fvo_par = None
        if with_fvo:
            # momentum fvOptions (models.fvoptions; UEqn.H:11,17,23,
            # pEqn.H:66): sharded su/sp/zone-mask cell fields + the
            # replicated meanVelocityForce parameters
            # [dirx, diry, dirz, magUbar, relax, grad_p0, dgrad]
            fvo_su, fvo_sp, fvo_mask = (
                turb_args[0][0], turb_args[1][0], turb_args[2][0]
            )
            fvo_par = turb_args[3]
            turb_args = turb_args[4:]

        def hx(x):
            return refresh(m_s, x)

        safe_diag = lambda d: jnp.where(mask, d, 1.0)

        if with_turb:
            nut, k_t, wall_cell, y_wall, wall_bd = (x[0] for x in turb_args)
            nut_h = hx(nut)
            nu_f = cfg.nu + jnp.concatenate([
                fv.face_interp(lm, nut_h),
                _wall_nut_bd_local(lm, nut_h, k_t, wall_cell, y_wall,
                                   wall_bd, cfg.nu, n_int),
            ])
        else:
            nu_f = cfg.nu

        def jacobi(A, b, x0, sweeps):
            inv_d = 1.0 / safe_diag(A.diag)
            x = x0
            for _ in range(sweeps):
                x = hx(x)
                r = b - fv.matvec(lm, A, x)
                x = x + inv_d[:, None] * r
                x = jnp.where(mask[:, None], x, 0.0)
            return x

        def cg(A, b, x0, tol, max_iter):
            inv_d = 1.0 / safe_diag(A.diag)
            b = jnp.where(mask, b, 0.0)
            if use_amg:
                off_loc = A.upper * lamg_l.off_mask

                def Minv(r):
                    z = _local_vcycle(
                        lamg_l, lm, safe_diag(A.diag), off_loc,
                        jnp.where(mask, r, 0.0),
                    )
                    return jnp.where(mask, z, 0.0)
            else:
                def Minv(r):
                    return inv_d * r

            def mv(x):
                y = fv.matvec(lm, A, hx(x))
                return jnp.where(mask, y, 0.0)

            r0 = b - mv(x0)
            z0 = Minv(r0)
            rz0 = psum_dot(mask, r0, z0)
            nb = jnp.sqrt(psum_dot(mask, b, b)) + 1e-300

            def cond(st):
                x, r, pp, rz, it = st
                return (jnp.sqrt(psum_dot(mask, r, r)) / nb > tol) & (it < max_iter)

            def body(st):
                x, r, pp, rz, it = st
                ap = mv(pp)
                alpha = rz / (psum_dot(mask, pp, ap) + 1e-300)
                x = x + alpha * pp
                r = r - alpha * ap
                z = Minv(r)
                rzn = psum_dot(mask, r, z)
                beta = rzn / (rz + 1e-300)
                return x, r, z + beta * pp, rzn, it + 1

            x, r, _, _, it = lax.while_loop(cond, body, (x0, r0, z0, rz0, 0))
            return x, jnp.sqrt(psum_dot(mask, r, r)) / nb, it

        ddt = m_s.vol[0] / jnp.asarray(dt, u.dtype)
        ddt = jnp.where(mask, ddt, 0.0)
        u_old = u

        # meanVelocityForce state: accumulated gradP0 + pending increment
        # (models.fvoptions semantics: correct OVERWRITES the pending
        # increment; constrain folds it once per momentum assembly)
        g_mvf = fvo_par[5] if with_fvo else None
        dg_mvf = fvo_par[6] if with_fvo else None

        def mvf_correct(uu, rau):
            # fvOptions.correct(U): the meanVelocityForce feedback step
            # (models.fvoptions.correct, psum-global zone averages; halo
            # slots carry zero mask weight)
            w = maskf * fvo_mask * m_s.vol[0]
            d = fvo_par[:3]
            vz = lax.psum(jnp.sum(w), axis) + 1e-300
            ubar_star = lax.psum(jnp.sum(w * (uu @ d)), axis) / vz
            rau_ave = lax.psum(jnp.sum(w * rau), axis) / vz
            dgrad = fvo_par[4] * (fvo_par[3] - ubar_star) / rau_ave
            uu = uu + (maskf * fvo_mask * rau * dgrad)[:, None] * d[None, :]
            return uu, dgrad

        u_res = jnp.zeros((), u.dtype)
        for _outer in range(cfg.n_outer):
            u_bcs_e = fv.effective_bcs(u_bcs, flux[n_int:])
            uh = hx(u)
            A = fv.assemble_transport(
                lm, flux, nu_f, u_bcs_e, 3, ddt_coeff=ddt, phi_old=u_old
            )
            if with_fvo:
                # fvOptions.constrain(UEqn): implicit Sp onto the diagonal
                # + fold the pending mvf increment into gradP0
                A = dataclasses.replace(
                    A, diag=A.diag - jnp.where(mask, fvo_sp, 0.0) * m_s.vol[0]
                )
                if fvo_mvf:
                    g_mvf = g_mvf + dg_mvf
                    dg_mvf = jnp.zeros_like(dg_mvf)
            ph = hx(p)
            grad_p = fv.gradient(lm, ph, p_bcs)
            b = A.source - grad_p * m_s.vol[0][:, None]
            if cfg.div_scheme not in ("upwind", "", None):
                # per-component velocity gradient, halo-refreshed so remote
                # upwind cells carry correct values at partition boundaries
                pf_i = fv.face_interp(lm, uh)
                pf_b = fv.boundary_value(lm, u_bcs_e, uh)
                pf = jnp.concatenate([pf_i, pf_b])
                gu = fv.surface_sum(
                    lm, pf[:, :, None] * lm.sf[:, None, :]
                ) / m_s.vol[0][:, None, None]
                gu = hx(gu)
                b = b + fv.convection_correction(
                    lm, flux, uh, u_bcs_e, cfg.div_scheme, grad=gu
                )
            if with_mrf:
                # MRF.DDt(U) moved to the RHS: -(Omega x U) V over zone
                # cells (pimple.py:80-82; omega is zero outside zones)
                b = b - jnp.cross(mrf_om, u) * m_s.vol[0][:, None]
            if with_fvo:
                # fvOptions(U): explicit Su + the meanVelocityForce's
                # current driving gradient into the RHS
                src = fvo_su
                if fvo_mvf:
                    src = src + (
                        fvo_mask * (g_mvf + dg_mvf)
                    )[:, None] * fvo_par[:3]
                b = b + src * m_s.vol[0][:, None]
            b = jnp.where(mask[:, None], b, 0.0)
            u_star = jacobi(A, b, u, cfg.n_jacobi)
            # final momentum residual |b - A u*| / |b| (psum-global; the
            # single-device step's u_res, pimple.py)
            r_u = jnp.where(
                mask[:, None], b - fv.matvec(lm, A, hx(u_star)), 0.0
            )
            u_res = jnp.sqrt(lax.psum(jnp.sum(r_u * r_u), axis)) / (
                jnp.sqrt(lax.psum(jnp.sum(jnp.where(mask[:, None], b, 0.0) ** 2),
                                  axis)) + 1e-300
            )

            rau = m_s.vol[0] / safe_diag(A.diag)
            if fvo_mvf:
                # fvOptions.correct(U) after the momentum predictor
                u_star, dg_mvf = mvf_correct(u_star, rau)
            rauh = hx(rau)
            rau_f = jnp.concatenate(
                [fv.face_interp(lm, rauh), rauh[lm.owner[n_int:]]]
            )
            from ..models.simple import _pressure_matrix

            Ap, _ = _pressure_matrix(lm, rau_f, p_bcs, False)
            if cfg.pin_pressure:
                # pin the global cell 0 (device 0's first owned cell)
                did = lax.axis_index(axis)
                Ap = dataclasses.replace(
                    Ap, diag=Ap.diag.at[0].add(jnp.where(did == 0, 1.0, 0.0))
                )

            u_corr = u_star
            p_res = jnp.zeros((), u.dtype)
            p_iters = jnp.zeros((), jnp.int32)
            for _c in range(cfg.n_correctors):
                uch = hx(u_corr)
                hbya = (b + grad_p * m_s.vol[0][:, None] - (
                    fv.matvec(lm, A, uch) - A.diag[:, None] * u_corr
                )) / safe_diag(A.diag)[:, None]
                hbyah = hx(hbya)
                phi_hbya = fv.flux_of(lm, hbyah, u_bcs_e)
                if with_mrf:
                    # MRF.makeRelative(phiHbyA) (pEqn.H:20, pimple.py:103-105)
                    phi_hbya = phi_hbya - mrf_ff
                rhs0 = Ap.source[:, 0] - fv.surface_sum(lm, phi_hbya)
                # explicit non-orthogonal correctors (pEqn.H:42-57):
                # re-solve with the k . grad(p) correction flux rebuilt
                # from each fresh p (halo-refreshed gradient)
                corr = jnp.zeros((lm.n_internal,), u.dtype)
                for _no in range(getattr(cfg, "n_nonortho", 0) + 1):
                    rhs = jnp.where(
                        mask, rhs0 + fv.surface_sum_internal(lm, corr), 0.0
                    )
                    p, p_res, it_ = cg(Ap, rhs, p, cfg.p_tol, cfg.p_max_iter)
                    p_iters = p_iters + it_
                    if _no < getattr(cfg, "n_nonortho", 0):
                        ph = hx(p)
                        gp = hx(fv.gradient(lm, ph, p_bcs))
                        wgt = lm.w[:, None]
                        gpf = (
                            wgt * gp[lm.owner[: lm.n_internal]]
                            + (1.0 - wgt) * gp[lm.neighbour]
                        )
                        corr = rau_f[: lm.n_internal] * jnp.sum(
                            lm.nonortho * gpf, axis=-1
                        )
                ph = hx(p)
                dp = ph[lm.neighbour] - ph[lm.owner[:n_int]]
                flux_i = phi_hbya[:n_int] - rau_f[:n_int] * lm.delta * dp - corr
                dp_b = (p_bcs.a - 1.0) * ph[lm.owner[n_int:]] + p_bcs.b[:, 0]
                flux_b = phi_hbya[n_int:] - rau_f[n_int:] * lm.bd_delta * dp_b
                flux = jnp.concatenate([flux_i, flux_b])
                grad_pn = fv.gradient(lm, ph, p_bcs)
                u_corr = hbya - rau[:, None] * grad_pn
                u_corr = jnp.where(mask[:, None], u_corr, 0.0)
                if fvo_mvf:
                    # fvOptions.correct(U) per pressure corrector
                    # (pEqn.H:66)
                    u_corr, dg_mvf = mvf_correct(u_corr, rau)
            u = u_corr

        cont = lax.psum(
            jnp.sum(jnp.abs(jnp.where(mask, fv.surface_sum(lm, flux), 0.0))),
            axis,
        )
        out_diag = {"u_res": u_res[None], "p_res": p_res[None],
                    "p_iters": p_iters[None], "continuity": cont[None]}
        if with_fvo:
            out_diag["fvo_grad_p"] = (
                g_mvf if fvo_mvf else fvo_par[5]
            )[None]
            out_diag["fvo_dgrad"] = (
                dg_mvf if fvo_mvf else fvo_par[6]
            )[None]
        return (u[None], p[None], flux[None], out_diag)

    specs = _mesh_specs(smesh, axis)
    bc_spec = fv.BoundaryCoeffs(a=P(axis), b=P(axis),
                                io_mask=P(axis), io_value=P(axis),
                                slip_mask=P(axis))

    n_turb = 5 if with_turb else 0
    n_mrf = 2 if with_mrf else 0
    amg_specs = (_local_amg_specs(lamg, axis),) if use_amg else ()
    # fvOptions args: sharded su/sp/mvf_mask + replicated parameter vector
    fvo_specs = (P(axis), P(axis), P(axis), P()) if with_fvo else ()
    diag_spec = {"u_res": P(axis), "p_res": P(axis), "p_iters": P(axis),
                 "continuity": P(axis)}
    if with_fvo:
        diag_spec["fvo_grad_p"] = P(axis)
        diag_spec["fvo_dgrad"] = P(axis)
    step = shard_map(
        local_step,
        mesh=device_mesh,
        in_specs=(specs, P(axis), P(axis), P(axis), bc_spec, bc_spec, P())
        + amg_specs + (P(axis),) * n_mrf + fvo_specs + (P(axis),) * n_turb,
        out_specs=(P(axis), P(axis), P(axis), diag_spec),
        check_rep=False,
    )
    return jax.jit(step)


def _wall_nut_bd_local(lm, nut_h, k, wall_cell, y_wall, wall_bd, nu, n_int):
    """Per-shard nutkWallFunction boundary-face eddy viscosity
    (models.turbulence.wall_nut_bd on the local bd faces; padded entries
    point at the dummy cell / slot 0 and are masked by y_wall < 0)."""
    from ..models import turbulence as turb

    out = nut_h[lm.owner[n_int:]]
    valid = y_wall > 0.0
    wc = jnp.maximum(wall_cell, 0)
    kw = jnp.maximum(k[wc], turb.SMALL)
    yplus = turb.CMU ** 0.25 * jnp.sqrt(kw) * jnp.maximum(y_wall, 0.0) / nu
    nut_w = jnp.where(
        yplus > turb.YPLUS_LAM,
        nu * (yplus * turb.KAPPA
              / jnp.log(jnp.maximum(turb.E_WALL * yplus, 1.0 + turb.SMALL))
              - 1.0),
        0.0,
    )
    wb = jnp.where(valid, wall_bd, out.shape[0])   # invalid -> dropped
    return out.at[wb].set(jnp.maximum(nut_w, 0.0), mode="drop")


@pytree_dataclass(meta_fields=("sizes", "n_levels"))
class LocalAmg:
    """Per-shard additive-Schwarz AMG hierarchy (stacked + padded).

    Each shard preconditions its own slab with a local V-cycle built by
    the same pairwise aggregation as the single-device GAMG stand-in
    (``fv.build_amg``); cross-shard couplings are excluded from the
    preconditioner (zero-overlap additive Schwarz), while the CG itself
    stays globally exact through its psum'd dot products.  Padded to
    common static per-level sizes so the V-cycle runs under shard_map.
    """

    aggs: tuple       # per level: [D, NCf_l] int32, pads -> NC_l (dropped)
    owners: tuple     # per level: [D, NF_l] int32 coarse-face owner (pads 0)
    neighs: tuple     # per level: [D, NF_l] int32
    f2cf: tuple       # per level: [D, NFf_l] int32 fine-face -> coarse (-1 intra)
    off_mask: jnp.ndarray   # [D, n_int] 1.0 on owned-owned faces else 0.0
    sizes: tuple      # per level: (NC_l, NF_l) padded static sizes
    n_levels: int


def build_local_amg(smesh: ShardedFlowMesh, min_coarse: int = 100,
                    max_levels: int = 16) -> LocalAmg:
    """Host-side per-shard hierarchies over the owned-cell subgraph."""
    D = smesh.n_dev
    n_loc = smesh.n_loc
    c_ext, _, n_int, _ = smesh.fv_meta
    own_all = np.asarray(smesh.owner)[:, :n_int]
    nei_all = np.asarray(smesh.neighbour)
    delta_all = np.asarray(smesh.delta, np.float64)

    shards = []
    for d in range(D):
        own, nei, w = own_all[d], nei_all[d], delta_all[d]
        owned = (own < n_loc) & (nei < n_loc) & (w > 0)
        sel0 = np.nonzero(owned)[0]
        levels = []
        cur_own, cur_nei, cur_w = own[owned], nei[owned], w[owned]
        nc = n_loc
        while nc > min_coarse and len(levels) < max_levels and len(cur_own):
            matched, nc_c, own_c, nei_c, w_c, f2cf = fv._amg_pair_level(
                cur_own, cur_nei, cur_w, nc
            )
            levels.append((matched, nc_c, own_c, nei_c, f2cf))
            cur_own, cur_nei, cur_w, nc = own_c, nei_c, w_c, nc_c
        shards.append((sel0, levels))

    L = max((len(lv) for _, lv in shards), default=0)
    # extend shorter hierarchies with further pair levels (identity-safe)
    for d in range(D):
        sel0, levels = shards[d]
        own, nei, w = own_all[d], nei_all[d], delta_all[d]
        owned = (own < n_loc) & (nei < n_loc) & (w > 0)
        if levels:
            _, nc, cur_own, cur_nei, _ = levels[-1]
            cur_w = np.ones(len(cur_own))
        else:
            cur_own, cur_nei, cur_w, nc = own[owned], nei[owned], np.ones(
                int(owned.sum())), n_loc
        while len(levels) < L:
            matched, nc_c, own_c, nei_c, w_c, f2cf = fv._amg_pair_level(
                cur_own, cur_nei, cur_w, nc
            )
            levels.append((matched, nc_c, own_c, nei_c, f2cf))
            cur_own, cur_nei, cur_w, nc = own_c, nei_c, w_c, nc_c

    # padded stacking
    aggs_s, owners_s, neighs_s, f2cf_s, sizes = [], [], [], [], []
    for l in range(L):
        nc_max = max(sh[1][l][1] for sh in shards)
        nf_max = max(max(len(sh[1][l][2]), 1) for sh in shards)
        nff_prev = n_int if l == 0 else sizes[l - 1][1]
        ncf_prev = c_ext if l == 0 else sizes[l - 1][0]
        A = np.full((D, ncf_prev), nc_max, np.int64)      # pad -> dropped
        O = np.zeros((D, nf_max), np.int64)
        N = np.zeros((D, nf_max), np.int64)
        F = np.full((D, nff_prev), -1, np.int64)
        for d, (sel0, levels) in enumerate(shards):
            matched, nc_c, own_c, nei_c, f2cf = levels[l]
            if l == 0:
                A[d, : len(matched)] = matched
                A[d, n_loc:c_ext] = nc_max                 # ghosts dropped
                F[d, sel0] = f2cf
            else:
                A[d, : len(matched)] = matched
                F[d, : len(f2cf)] = f2cf
            O[d, : len(own_c)] = own_c
            N[d, : len(nei_c)] = nei_c
        aggs_s.append(jnp.asarray(A, jnp.int32))
        owners_s.append(jnp.asarray(O, jnp.int32))
        neighs_s.append(jnp.asarray(N, jnp.int32))
        f2cf_s.append(jnp.asarray(F, jnp.int32))
        sizes.append((nc_max, nf_max))

    off_mask = ((own_all < n_loc) & (nei_all < n_loc)
                & (delta_all > 0)).astype(np.float32)
    return LocalAmg(
        aggs=tuple(aggs_s), owners=tuple(owners_s), neighs=tuple(neighs_s),
        f2cf=tuple(f2cf_s), off_mask=jnp.asarray(off_mask),
        sizes=tuple(sizes), n_levels=L,
    )


def _local_amg_specs(lamg: LocalAmg, axis: str):
    L = lamg.n_levels
    return LocalAmg(
        aggs=(P(axis),) * L, owners=(P(axis),) * L, neighs=(P(axis),) * L,
        f2cf=(P(axis),) * L, off_mask=P(axis),
        sizes=lamg.sizes, n_levels=L,
    )


def _local_vcycle(lamg: LocalAmg, lm, diag0, off0, r0, omega=0.65):
    """One V(1,1) cycle of the per-shard hierarchy (device-local arrays;
    lamg fields already [0]-indexed by the caller).  Mirrors
    ``fv.amg_vcycle`` with drop-guarded padded scatters."""
    L = lamg.n_levels
    n_int = lm.n_internal

    # per-level Galerkin coarse ops from the local (masked) operator
    levels = []
    diag, off = diag0, off0
    own = lm.owner[:n_int]
    for l in range(L):
        aggs, f2cf = lamg.aggs[l], lamg.f2cf[l]
        ncl, n_cf = lamg.sizes[l]
        intra = f2cf < 0
        diag_c = jnp.zeros(ncl, diag.dtype).at[aggs].add(diag, mode="drop")
        diag_c = diag_c.at[
            jnp.where(intra, aggs[own], ncl)
        ].add(2.0 * jnp.where(intra, off, 0.0), mode="drop")
        off_c = jnp.zeros(n_cf, off.dtype).at[
            jnp.where(intra, n_cf, f2cf)
        ].add(jnp.where(intra, 0.0, off), mode="drop")
        diag_c = jnp.where(diag_c == 0.0, 1.0, diag_c)     # pad slots
        levels.append((diag_c, off_c))
        diag, off, own = diag_c, off_c, lamg.owners[l]

    def matvec_l(li, x):
        if li == 0:
            d_, o_, ow, ne = diag0, off0, lm.owner[:n_int], lm.neighbour
        else:
            d_, o_ = levels[li - 1]
            ow, ne = lamg.owners[li - 1], lamg.neighs[li - 1]
        out = d_ * x
        out = out.at[ow].add(o_ * x[jnp.clip(ne, 0, x.shape[0] - 1)],
                             mode="drop")
        out = out.at[ne].add(o_ * x[jnp.clip(ow, 0, x.shape[0] - 1)],
                             mode="drop")
        return out

    def descend(li, r):
        d_ = diag0 if li == 0 else levels[li - 1][0]
        x = omega * r / d_
        if li == L:
            for _ in range(12):
                x = x + omega * (r - matvec_l(li, x)) / d_
            return x
        r1 = r - matvec_l(li, x)
        ncl = lamg.sizes[li][0]
        rc = jnp.zeros(ncl, r.dtype).at[lamg.aggs[li]].add(r1, mode="drop")
        xc = descend(li + 1, rc)
        x = x + xc[jnp.clip(lamg.aggs[li], 0, ncl - 1)] * (
            lamg.aggs[li] < ncl
        ).astype(r.dtype)
        x = x + omega * (r - matvec_l(li, x)) / d_
        return x

    return descend(0, r0)


def make_sharded_keps(smesh: ShardedFlowMesh, device_mesh: Mesh,
                      nu: float, n_sweeps: int = 6):
    """Shard_map'ed transient k-epsilon update mirroring
    ``models.turbulence.k_epsilon_step`` (dt mode): production from the
    halo-refreshed velocity gradient, eddy-diffusivity faces from the
    halo-refreshed nut, implicit sinks, log-law wall pins on the local
    wall cells, Jacobi sweeps with per-sweep halo refresh."""
    from ..models import turbulence as turb

    n_dev = smesh.n_dev
    n_loc = smesh.n_loc
    axis = device_mesh.axis_names[0]
    _refresh = make_halo_refresh(smesh, axis)

    def local(m_s, k, eps, nut, u, flux, u_bcs, k_bcs, e_bcs,
              wall_cell, y_wall, dt):
        lm = m_s.local_fv()
        mask = m_s.cell_mask[0]
        n_int = lm.n_internal
        u_bcs = jax.tree.map(lambda x: x[0], u_bcs)
        k_bcs = jax.tree.map(lambda x: x[0], k_bcs)
        e_bcs = jax.tree.map(lambda x: x[0], e_bcs)
        k, eps, nut, u, flux = k[0], eps[0], nut[0], u[0], flux[0]
        wall_cell, y_wall = wall_cell[0], y_wall[0]

        def hx(x):
            return _refresh(m_s, x)

        k = jnp.maximum(k, turb.SMALL)
        eps = jnp.maximum(eps, turb.SMALL)
        uh = hx(u)
        grads = []
        for comp in range(3):
            bc_c = fv.BoundaryCoeffs(a=u_bcs.a, b=u_bcs.b[:, comp : comp + 1])
            grads.append(fv.gradient(lm, uh[:, comp], bc_c))
        g = jnp.stack(grads, axis=1)
        s = 0.5 * (g + jnp.swapaxes(g, 1, 2))
        pk = nut * 2.0 * jnp.sum(s * s, axis=(1, 2))

        ddt = jnp.where(mask, m_s.vol[0] / jnp.asarray(dt, k.dtype), 0.0)
        safe_diag = lambda d: jnp.where(mask, d, 1.0)

        def jacobi1(A, b, x0):
            inv_d = 1.0 / safe_diag(A.diag)
            x = x0
            for _ in range(n_sweeps):
                xh = hx(x)
                r = b - (A.diag * x + jnp.zeros_like(x)
                         .at[lm.owner[:n_int]].add(A.upper * xh[lm.neighbour])
                         .at[lm.neighbour].add(A.lower * xh[lm.owner[:n_int]]))
                x = jnp.where(mask, x + inv_d * r, 0.0)
            return x

        nut_h = hx(nut)
        big = jnp.asarray(1e30, k.dtype)
        valid_w = y_wall > 0.0
        wc = jnp.where(valid_w, wall_cell, lm.n_cells - 1)   # dummy slot

        # epsilon equation
        gamma_e = nu + jnp.concatenate(
            [fv.face_interp(lm, nut_h), nut_h[lm.owner[n_int:]]]
        ) / turb.SIGMA_EPS
        Ae = fv.assemble_transport(
            lm, flux, gamma_e, e_bcs, 1, ddt_coeff=ddt, phi_old=eps[:, None]
        )
        diag_e = Ae.diag + turb.C2 * (eps / k) * m_s.vol[0]
        src_e = Ae.source[:, 0] + turb.C1 * pk * (eps / k) * m_s.vol[0]
        ew = turb.CMU ** 0.75 * jnp.maximum(
            k[jnp.maximum(wall_cell, 0)], turb.SMALL
        ) ** 1.5 / (turb.KAPPA * jnp.maximum(y_wall, turb.SMALL))
        diag_e = diag_e.at[wc].add(jnp.where(valid_w, big, 0.0), mode="drop")
        src_e = src_e.at[wc].add(jnp.where(valid_w, big * ew, 0.0), mode="drop")
        eps_new = jacobi1(
            dataclasses.replace(Ae, diag=diag_e), jnp.where(mask, src_e, 0.0),
            eps * mask.astype(k.dtype),
        )
        eps_new = jnp.where(mask, jnp.maximum(eps_new, turb.SMALL), 0.0)

        # k equation
        gamma_k = nu + jnp.concatenate(
            [fv.face_interp(lm, nut_h), nut_h[lm.owner[n_int:]]]
        ) / turb.SIGMA_K
        Ak = fv.assemble_transport(
            lm, flux, gamma_k, k_bcs, 1, ddt_coeff=ddt, phi_old=k[:, None]
        )
        diag_k = Ak.diag + (eps_new / jnp.maximum(k, turb.SMALL)) * m_s.vol[0]
        src_k = Ak.source[:, 0] + pk * m_s.vol[0]
        k_new = jacobi1(
            dataclasses.replace(Ak, diag=diag_k), jnp.where(mask, src_k, 0.0),
            k * mask.astype(k.dtype),
        )
        k_new = jnp.where(mask, jnp.maximum(k_new, turb.SMALL), 0.0)

        nut_new = jnp.where(
            mask,
            jnp.clip(turb.CMU * k_new * k_new
                     / jnp.maximum(eps_new, turb.SMALL), 0.0, 1e5),
            0.0,
        )
        return k_new[None], eps_new[None], nut_new[None]

    specs = _mesh_specs(smesh, axis)
    bc_spec = fv.BoundaryCoeffs(a=P(axis), b=P(axis),
                                io_mask=P(axis), io_value=P(axis),
                                slip_mask=P(axis))
    return jax.jit(shard_map(
        local, mesh=device_mesh,
        in_specs=(specs,) + (P(axis),) * 5 + (bc_spec,) * 3
        + (P(axis), P(axis), P()),
        out_specs=(P(axis), P(axis), P(axis)),
        check_rep=False,
    ))


def make_sharded_sst(smesh: ShardedFlowMesh, device_mesh: Mesh,
                     nu: float, n_sweeps: int = 6):
    """Shard_map'ed transient k-omega SST update mirroring
    ``models.turbulence.k_omega_sst_step`` (dt mode): Menter 2003
    blending from the sharded wall-distance field, cross-diffusion from
    halo-refreshed k/omega gradients, strain-rate-limited eddy
    viscosity, omegaWallFunction pins on the local wall cells, Jacobi
    sweeps with per-sweep halo refresh (same solver structure as
    ``make_sharded_keps``)."""
    from ..models import turbulence as turb

    axis = device_mesh.axis_names[0]
    _refresh = make_halo_refresh(smesh, axis)

    def local(m_s, k, w, nut, y, u, flux, u_bcs, k_bcs, w_bcs,
              wall_cell, y_wall, dt):
        lm = m_s.local_fv()
        mask = m_s.cell_mask[0]
        n_int = lm.n_internal
        u_bcs = jax.tree.map(lambda x: x[0], u_bcs)
        k_bcs = jax.tree.map(lambda x: x[0], k_bcs)
        w_bcs = jax.tree.map(lambda x: x[0], w_bcs)
        k, w, nut, y, u, flux = k[0], w[0], nut[0], y[0], u[0], flux[0]
        wall_cell, y_wall = wall_cell[0], y_wall[0]
        vol = m_s.vol[0]

        def hx(x):
            return _refresh(m_s, x)

        k = jnp.maximum(k, turb.SMALL)
        w = jnp.maximum(w, turb.SMALL)
        y_c = jnp.maximum(y, 1e-10)
        y2 = y_c * y_c

        # strain rate from the halo-refreshed velocity gradient
        uh = hx(u)
        grads = []
        for comp in range(3):
            bc_c = fv.BoundaryCoeffs(a=u_bcs.a, b=u_bcs.b[:, comp : comp + 1])
            grads.append(fv.gradient(lm, uh[:, comp], bc_c))
        g = jnp.stack(grads, axis=1)
        s = 0.5 * (g + jnp.swapaxes(g, 1, 2))
        s2 = 2.0 * jnp.sum(s * s, axis=(1, 2))

        # cross-diffusion + blending functions (pointwise given halo'd grads)
        gk = fv.gradient(lm, hx(k), k_bcs)
        gw = fv.gradient(lm, hx(w), w_bcs)
        cd_kw = 2.0 * turb.ALPHA_W2 * jnp.sum(gk * gw, axis=1) / w
        cd_kw_plus = jnp.maximum(cd_kw, 1e-10)
        sqk = jnp.sqrt(k)
        arg1 = jnp.minimum(
            jnp.minimum(
                jnp.maximum(sqk / (turb.BETA_STAR * w * y_c),
                            500.0 * nu / (y2 * w)),
                4.0 * turb.ALPHA_W2 * k / (cd_kw_plus * y2),
            ),
            10.0,
        )
        f1 = jnp.tanh(arg1 ** 4)
        arg2 = jnp.minimum(
            jnp.maximum(2.0 * sqk / (turb.BETA_STAR * w * y_c),
                        500.0 * nu / (y2 * w)), 100.0
        )
        f2 = jnp.tanh(arg2 * arg2)

        nut_l = turb.A1_SST * k / jnp.maximum(
            turb.A1_SST * w, turb.B1_SST * f2 * jnp.sqrt(s2)
        )
        pk = jnp.minimum(nut_l * s2, turb.C1_SST * turb.BETA_STAR * k * w)

        blend = lambda c1_, c2_: f1 * c1_ + (1.0 - f1) * c2_
        alpha_k = blend(turb.ALPHA_K1, turb.ALPHA_K2)
        alpha_w = blend(turb.ALPHA_W1, turb.ALPHA_W2)
        beta = blend(turb.BETA1, turb.BETA2)
        gamma = blend(turb.GAMMA1, turb.GAMMA2)

        ddt = jnp.where(mask, vol / jnp.asarray(dt, k.dtype), 0.0)
        safe_diag = lambda d: jnp.where(mask, d, 1.0)

        def jacobi1(A, b, x0):
            inv_d = 1.0 / safe_diag(A.diag)
            x = x0
            for _ in range(n_sweeps):
                xh = hx(x)
                r = b - (A.diag * x + jnp.zeros_like(x)
                         .at[lm.owner[:n_int]].add(A.upper * xh[lm.neighbour])
                         .at[lm.neighbour].add(A.lower * xh[lm.owner[:n_int]]))
                x = jnp.where(mask, x + inv_d * r, 0.0)
            return x

        big = jnp.asarray(1e30, k.dtype)
        valid_w = y_wall > 0.0
        wc = jnp.where(valid_w, wall_cell, lm.n_cells - 1)   # dummy slot

        def gamma_faces(coef):
            ch = hx(coef)
            return nu + jnp.concatenate(
                [fv.face_interp(lm, ch), ch[lm.owner[n_int:]]]
            )

        # omega equation
        Aw = fv.assemble_transport(
            lm, flux, gamma_faces(alpha_w * nut_l), w_bcs, 1,
            ddt_coeff=ddt, phi_old=w[:, None],
        )
        diag_w = Aw.diag + beta * w * vol            # implicit -beta w^2
        src_w = Aw.source[:, 0] + (gamma * s2 + (1.0 - f1) * cd_kw) * vol
        # wall cells: omegaWallFunction blended value, pinned by big diag
        yw = jnp.maximum(y_wall, 1e-10)
        kw_ = jnp.maximum(k[jnp.maximum(wall_cell, 0)], turb.SMALL)
        w_vis = 6.0 * nu / (turb.BETA1 * yw * yw)
        w_log = jnp.sqrt(kw_) / (turb.CMU ** 0.25 * turb.KAPPA * yw)
        w_wall = jnp.sqrt(w_vis * w_vis + w_log * w_log)
        diag_w = diag_w.at[wc].add(jnp.where(valid_w, big, 0.0), mode="drop")
        src_w = src_w.at[wc].add(
            jnp.where(valid_w, big * w_wall, 0.0), mode="drop"
        )
        w_new = jacobi1(
            dataclasses.replace(Aw, diag=diag_w), jnp.where(mask, src_w, 0.0),
            w * mask.astype(k.dtype),
        )
        w_new = jnp.where(mask, jnp.maximum(w_new, turb.SMALL), 0.0)

        # k equation
        Ak = fv.assemble_transport(
            lm, flux, gamma_faces(alpha_k * nut_l), k_bcs, 1,
            ddt_coeff=ddt, phi_old=k[:, None],
        )
        diag_k = Ak.diag + turb.BETA_STAR * jnp.maximum(w_new, turb.SMALL) * vol
        src_k = Ak.source[:, 0] + pk * vol
        k_new = jacobi1(
            dataclasses.replace(Ak, diag=diag_k), jnp.where(mask, src_k, 0.0),
            k * mask.astype(k.dtype),
        )
        k_new = jnp.where(mask, jnp.maximum(k_new, turb.SMALL), 0.0)

        nut_new = jnp.where(
            mask,
            jnp.clip(
                turb.A1_SST * k_new / jnp.maximum(
                    turb.A1_SST * jnp.maximum(w_new, turb.SMALL),
                    turb.B1_SST * f2 * jnp.sqrt(s2),
                ),
                0.0, 1e5,
            ),
            0.0,
        )
        return k_new[None], w_new[None], nut_new[None]

    specs = _mesh_specs(smesh, axis)
    bc_spec = fv.BoundaryCoeffs(a=P(axis), b=P(axis),
                                io_mask=P(axis), io_value=P(axis),
                                slip_mask=P(axis))
    return jax.jit(shard_map(
        local, mesh=device_mesh,
        in_specs=(specs,) + (P(axis),) * 6 + (bc_spec,) * 3
        + (P(axis), P(axis), P()),
        out_specs=(P(axis), P(axis), P(axis)),
        check_rep=False,
    ))


def make_courant(smesh: ShardedFlowMesh, device_mesh: Mesh):
    """Sharded max Courant number (CourantNo.H): pmax over devices."""
    axis = device_mesh.axis_names[0]

    def local(m_s, flux, dt):
        lm = m_s.local_fv()
        mask = m_s.cell_mask[0]
        flux = flux[0]
        sums = jnp.zeros(lm.n_cells, flux.dtype)
        sums = sums.at[lm.owner].add(jnp.abs(flux))
        sums = sums.at[lm.neighbour].add(jnp.abs(flux[: lm.n_internal]))
        co = 0.5 * dt * jnp.max(jnp.where(mask, sums / m_s.vol[0], 0.0))
        return lax.pmax(co, axis)[None]

    return jax.jit(shard_map(
        local, mesh=device_mesh,
        in_specs=(_mesh_specs(smesh, axis), P(axis), P()),
        out_specs=P(axis), check_rep=False,
    ))


def read_decompose_par(case_dir, n_dev: int, log=print):
    """Decomposition grid from ``system/decomposeParDict`` (the
    ``simple``/``hierarchical`` method's ``n (nx ny nz)`` coefficient,
    ``TJunction/system/decomposeParDict:17-24``).  Returns None (1-D
    default) when the dict is absent, the method is unsupported, or the
    subdomain/device counts disagree."""
    import os

    from ..io import foamfile

    path = os.path.join(case_dir, "system", "decomposeParDict")
    if not os.path.exists(path):
        return None
    try:
        d = foamfile.read(path)
    except Exception:
        return None
    method = str(d.get("method", "")).strip()
    coeffs = d.get("coeffs") or d.get(f"{method}Coeffs") or {}
    n = coeffs.get("n") if isinstance(coeffs, dict) else None
    nsub = d.get("numberOfSubdomains")
    if method == "rcb":
        log("#flow: decomposition by recursive coordinate bisection")
        return "rcb"
    if method in ("scotch", "metis", "kahip"):
        # multilevel graph bisection over the cell-adjacency graph
        # (parallel/graphpart.py) — the same scheme those libraries
        # implement; the generic per-delta halo exchange handles its
        # irregular neighborhoods
        log(f"#flow: decomposeParDict method {method!r}: multilevel "
            "graph bisection")
        return "graph"
    if method not in ("simple", "hierarchical") or n is None:
        if method:
            log(f"#flow: decomposeParDict method {method!r} not supported "
                "on-device; using 1-D slabs")
        return None
    grid = tuple(int(v) for v in n)
    if len(grid) != 3 or grid[0] * grid[1] * grid[2] != n_dev:
        log(f"#flow: decomposeParDict n {grid} != {n_dev} devices; "
            "using 1-D slabs")
        return None
    if nsub is not None and int(nsub) != n_dev:
        log(f"#flow: numberOfSubdomains {nsub} != {n_dev} devices; "
            "using 1-D slabs")
        return None
    log(f"#flow: decomposition grid {grid} (decomposeParDict {method})")
    return grid


class ShardedFlowSolver:
    """Drop-in FlowSolver running the PIMPLE step domain-decomposed over
    the device mesh — the product path behind ``coupled --flow-devices N``
    (the reference's ``Allrun-parallel`` analog).  Supports the laminar,
    kEpsilon (the reference's parallel tutorial closure,
    ``TJunction/constant/turbulenceProperties:21-27``) and kOmegaSST
    closures, MRF zones, and solid-body/Laplacian dynamic meshes (the
    motion solver runs host-side, per-shard geometry re-scatters in
    place, correctPhi runs as a psum-global CG)."""

    def __init__(self, case, n_dev: int, log=print, **cfg_kw):
        from ..models.pimple import PimpleConfig
        from ..models.simple import load_flow_case, read_numerics, turbulence_model
        from . import sharding as shardlib

        m, st, u_bcs, p_bcs, nu, pin, p_tables = load_flow_case(
            case.case_dir, pm=case.poly, dtype=jnp.float32
        )
        num = read_numerics(case.case_dir)
        cfg_kw.setdefault("div_scheme", num["div_scheme"])
        cfg_kw.setdefault("n_correctors", num["n_correctors"])
        cfg_kw.setdefault("n_nonortho", num["n_nonortho"])
        cfg_kw.setdefault("n_outer", num["n_outer"])
        cfg_kw.setdefault("p_solver", "amg")
        self.cfg = PimpleConfig(nu=nu, pin_pressure=pin, **cfg_kw)
        self.m = m
        grid = read_decompose_par(case.case_dir, n_dev, log=log)
        self.smesh, bglob = decompose(
            case.poly, n_dev, dtype=jnp.float32, grid=grid
        )
        self.dmesh = shardlib.make_device_mesh(n_dev, axis="f")
        self.bglob = bglob
        self.p_bcs = p_bcs
        self.p_tables = p_tables
        self.time = 0.0

        # MRF zones (constant/MRFProperties): rotating-wall boundary
        # velocity folded into the GLOBAL u BCs here (omega is constant);
        # the Coriolis/relative-flux terms run inside the sharded step
        from ..models import mrf as mrf_mod

        self.mrf = mrf_mod.from_case(case.case_dir, m, case.poly)
        if self.mrf is not None:
            u_bcs = mrf_mod.correct_boundary_velocity(self.mrf, m, u_bcs)
            self.mrf_omega_s, self.mrf_flux_s = shard_mrf(
                self.smesh, self.mrf, m
            )
        self.u_bcs = u_bcs

        # momentum fvOptions (constant/ or system/fvOptions): su/sp/zone
        # mask scattered per shard, meanVelocityForce parameters + gradP
        # state replicated (models.fvoptions; UEqn.H:11-23, pEqn.H:66)
        from ..models import fvoptions as fvo_mod

        self.fvo = fvo_mod.from_case(case.case_dir, m, case.poly)
        if self.fvo is not None:
            self.fvo_su_s = scatter_cells(self.smesh, np.asarray(self.fvo.su))
            self.fvo_sp_s = scatter_cells(self.smesh, np.asarray(self.fvo.sp))
            self.fvo_mask_s = scatter_cells(
                self.smesh, np.asarray(self.fvo.mvf_mask)
            )
            log("#flow: sharded momentum fvOptions active"
                + (" (meanVelocityForce)" if self.fvo.has_mvf else ""))

        self.u_bcs_s = shard_bcs(u_bcs, bglob)
        self.p_bcs_s = shard_bcs(p_bcs, bglob)
        self.u_s = scatter_cells(self.smesh, np.asarray(st.u))
        self.p_s = scatter_cells(self.smesh, np.asarray(st.p))
        self.flux_s = make_flux_init(self.smesh, self.dmesh)(
            self.smesh, self.u_s, self.u_bcs_s
        )
        if self.mrf is not None:
            # convective flux stored RELATIVE to the frame (pimple.py:215-217)
            self.flux_s = self.flux_s - self.mrf_flux_s

        # dynamic mesh (constant/dynamicMeshDict): the sharded analog of
        # mesh.controlledUpdate() — the motion solver runs host-side (as
        # single-device), per-shard geometry re-scatters in place
        # (refresh_sharded_geometry; shapes pinned, compiled steps
        # survive), and the flux is rebuilt + projected divergence-free
        # by the psum-global CorrectPhi, then made relative to meshPhi
        import os as _os

        from ..models import dynamicmesh as dyn_mod

        self.dyn = None
        self.moving_patches = ()
        motion = dyn_mod.read_dynamic_mesh(case.case_dir)
        if motion is not None:
            from ..io import polymesh as polymesh_io

            self.dyn = dyn_mod.DynamicMesh(motion, case.poly, dtype=jnp.float32)
            u0 = _os.path.join(case.case_dir, "0", "U")
            bcs0 = (polymesh_io.read_field_bcs(u0)
                    if _os.path.exists(u0) else {})
            self.moving_patches = tuple(
                k for k, e in bcs0.items() if e[0] == "movingWallVelocity"
            )
            self._flux_init = make_flux_init(self.smesh, self.dmesh)
            self._correct_flux = make_sharded_correct_flux(
                self.smesh, self.dmesh, pin=self.cfg.pin_pressure
            )
            log(f"#flow: sharded dynamic mesh: {motion.kind} "
                f"(moving walls: {self.moving_patches})")

        self.turb_model = turbulence_model(case.case_dir)
        self._turb_on = False
        if self.turb_model == "kEpsilon":
            self._init_keps(case, m, u_bcs, bglob, nu, log)
        elif self.turb_model == "kOmegaSST":
            self._init_sst(case, m, u_bcs, bglob, nu, log)
        elif self.turb_model != "laminar":
            raise NotImplementedError(
                f"turbulence model {self.turb_model!r} is not supported by "
                "the sharded flow solver; run the flow single-device"
            )
        # additive-Schwarz AMG preconditioner for the pressure CG (the
        # sharded stand-in for the single-device GAMG, keeping iteration
        # counts roughly mesh-size independent)
        self.lamg = (
            build_local_amg(self.smesh) if self.cfg.p_solver == "amg" else None
        )
        self._step = make_sharded_pimple(
            self.smesh, self.cfg, self.dmesh, with_turb=self._turb_on,
            lamg=self.lamg, with_mrf=self.mrf is not None,
            with_fvo=self.fvo is not None,
            fvo_mvf=self.fvo is not None and self.fvo.has_mvf,
        )
        self._courant = make_courant(self.smesh, self.dmesh)
        self.log = log
        log(f"#flow: sharded PIMPLE on {n_dev} devices, "
            f"{case.poly.n_cells} cells ({self.smesh.n_loc}/shard), nu={nu}"
            + (f", {self.turb_model} closure" if self._turb_on else ""))

    def _wall_arrays(self, m, wi, bglob):
        """Per-device wall arrays (local bd slot, local owner cell, wall
        distance) from the global wall_info; returns the wall-face count."""
        n_bd_g = m.n_faces - m.n_internal
        y_of = np.full(n_bd_g, -1.0)
        y_of[np.asarray(wi.wall_bd_face)] = np.asarray(wi.y_wall)
        bg = np.asarray(bglob)
        nf_int_l = self.smesh.fv_meta[2]
        own_l = np.asarray(self.smesh.owner)[:, nf_int_l:]
        D, B = bg.shape
        wc = np.full((D, B), -1, np.int64)
        yw = np.full((D, B), -1.0)
        wb = np.full((D, B), -1, np.int64)
        for d in range(D):
            sel = (bg[d] >= 0) & (y_of[np.clip(bg[d], 0, n_bd_g - 1)] > 0.0)
            wc[d, sel] = own_l[d, sel]
            yw[d, sel] = y_of[bg[d, sel]]
            wb[d, sel] = np.nonzero(sel)[0]
        self.wall_cell_s = jnp.asarray(wc, jnp.int32)
        self.y_wall_s = jnp.asarray(yw, jnp.float32)
        self.wall_bd_s = jnp.asarray(wb, jnp.int32)
        return int((yw > 0).sum())

    def _init_keps(self, case, m, u_bcs, bglob, nu, log):
        """Scatter k/eps/nut + build per-device wall arrays from the
        global wall_info."""
        from ..models import turbulence as turb

        kes, k_bcs, e_bcs, wi = turb.init_from_case(case.case_dir, m)
        self.k_s = scatter_cells(self.smesh, np.asarray(kes.k))
        self.e_s = scatter_cells(self.smesh, np.asarray(kes.eps))
        self.nut_s = scatter_cells(self.smesh, np.asarray(kes.nut))
        self.k_bcs_s = shard_bcs(k_bcs, bglob)
        self.e_bcs_s = shard_bcs(e_bcs, bglob)
        n_wall = self._wall_arrays(m, wi, bglob)
        self._keps = make_sharded_keps(self.smesh, self.dmesh, nu)
        self._turb_on = True
        log(f"#flow: sharded kEpsilon ({n_wall} wall faces)")

    def _init_sst(self, case, m, u_bcs, bglob, nu, log):
        """Scatter k/omega/nut + the static wall-distance field and build
        the per-device wall arrays (same layout as kEpsilon; the PIMPLE
        step's nutkWallFunction plumbing is shared)."""
        from ..models import turbulence as turb

        sst, k_bcs, w_bcs, wi = turb.init_from_case_sst(case.case_dir, m)
        self.k_s = scatter_cells(self.smesh, np.asarray(sst.k))
        self.w_s = scatter_cells(self.smesh, np.asarray(sst.omega))
        self.nut_s = scatter_cells(self.smesh, np.asarray(sst.nut))
        self.y_s = scatter_cells(self.smesh, np.asarray(sst.y))
        self.k_bcs_s = shard_bcs(k_bcs, bglob)
        self.w_bcs_s = shard_bcs(w_bcs, bglob)
        n_wall = self._wall_arrays(m, wi, bglob)
        self._sst = make_sharded_sst(self.smesh, self.dmesh, nu)
        self._turb_on = True
        log(f"#flow: sharded kOmegaSST ({n_wall} wall faces)")

    def _apply_p_tables(self, t: float):
        """Time-varying pressure-BC tables (uniformTotalPressure p0 ramps,
        same semantics as FlowSolver._apply_p_tables) interpolated into the
        GLOBAL p BCs and re-sharded."""
        if not self.p_tables:
            return
        import dataclasses as _dc

        b = self.p_bcs.b
        names = {pz[0]: pz for pz in self.m.patch_slices}
        for patch, tab in self.p_tables.items():
            if patch not in names:
                continue
            ts = np.array([x[0] for x in tab])
            vs = np.array([x[1] for x in tab])
            val = float(np.interp(t, ts, vs))
            _, _, start, cnt = names[patch]
            b = b.at[start : start + cnt, 0].set(val)
        pb = _dc.replace(self.p_bcs, b=b)
        self.p_bcs_s = shard_bcs(pb, self.bglob)

    def advance(self, dt_e: float):
        self.time += dt_e
        self._apply_p_tables(self.time)
        if getattr(self, "dyn", None) is not None:
            # sharded mesh.controlledUpdate() + correctPhi + makeRelative
            # (cudaParticlesPimpleFoam.C:144-166, mirroring the
            # single-device FlowSolver.advance): host-side motion solve,
            # in-place per-shard geometry re-scatter, flux rebuilt on the
            # new metrics, projected conservative by the psum CG, then
            # made relative to the swept mesh flux.  The local-AMG
            # preconditioner keeps its initial-geometry hierarchy (same
            # contract as single-device: pairing is topological, only
            # preconditioning quality drifts with deformation).
            from ..models import dynamicmesh as dyn_mod

            m_new, mesh_phi, bd_vel = self.dyn.update(self.time, dt_e)
            self.m = m_new
            self.u_bcs = dyn_mod.update_moving_wall_bcs(
                m_new, self.u_bcs, bd_vel, self.moving_patches
            )
            self.u_bcs_s = shard_bcs(self.u_bcs, self.bglob)
            self.smesh = refresh_sharded_geometry(self.smesh, m_new)
            nf_int_l = self.smesh.fv_meta[2]
            # effective_bcs on the STACKED [D, B] coefficients (the fv
            # helper assumes per-device [B] shapes)
            inflow = self.u_bcs_s.io_mask & (
                self.flux_s[:, nf_int_l:] < 0.0
            )
            u_bcs_e_s = dataclasses.replace(
                self.u_bcs_s,
                a=jnp.where(inflow, 0.0, self.u_bcs_s.a),
                b=jnp.where(inflow[..., None], self.u_bcs_s.io_value,
                            self.u_bcs_s.b),
            )
            phi_abs = self._flux_init(self.smesh, self.u_s, u_bcs_e_s)
            phi_abs, res_c = self._correct_flux(
                self.smesh, phi_abs, self.p_bcs_s
            )
            self.log(
                f"#flow: sharded correctPhi residual="
                f"{float(np.asarray(res_c)[0]):.3e}"
            )
            self.flux_s = phi_abs - scatter_faces(self.smesh, mesh_phi)
        args = (
            self.smesh, self.u_s, self.p_s, self.flux_s,
            self.u_bcs_s, self.p_bcs_s, dt_e,
        )
        if self.lamg is not None:
            args = args + (self.lamg,)
        if self.mrf is not None:
            args = args + (self.mrf_omega_s, self.mrf_flux_s)
        if self.fvo is not None:
            par = jnp.concatenate([
                self.fvo.mvf_dir,
                jnp.stack([self.fvo.mvf_mag, self.fvo.mvf_relax,
                           self.fvo.grad_p, self.fvo.dgrad]),
            ])
            args = args + (self.fvo_su_s, self.fvo_sp_s, self.fvo_mask_s, par)
        if self._turb_on:
            args = args + (
                self.nut_s, self.k_s, self.wall_cell_s, self.y_wall_s,
                self.wall_bd_s,
            )
        self.u_s, self.p_s, self.flux_s, diag = self._step(*args)
        if self.fvo is not None and "fvo_grad_p" in diag:
            self.fvo = dataclasses.replace(
                self.fvo,
                grad_p=jnp.asarray(np.asarray(diag["fvo_grad_p"])[0]),
                dgrad=jnp.asarray(np.asarray(diag["fvo_dgrad"])[0]),
            )
        if self._turb_on:
            if self.turb_model == "kOmegaSST":
                self.k_s, self.w_s, self.nut_s = self._sst(
                    self.smesh, self.k_s, self.w_s, self.nut_s, self.y_s,
                    self.u_s, self.flux_s, self.u_bcs_s, self.k_bcs_s,
                    self.w_bcs_s, self.wall_cell_s, self.y_wall_s, dt_e,
                )
            else:
                self.k_s, self.e_s, self.nut_s = self._keps(
                    self.smesh, self.k_s, self.e_s, self.nut_s, self.u_s,
                    self.flux_s, self.u_bcs_s, self.k_bcs_s, self.e_bcs_s,
                    self.wall_cell_s, self.y_wall_s, dt_e,
                )
        res = {
            "u_res": float(np.asarray(diag["u_res"])[0]),
            "p_res": float(np.asarray(diag["p_res"])[0]),
            "p_iters": int(np.asarray(diag["p_iters"])[0]),
            "continuity": float(np.asarray(diag["continuity"])[0]),
        }
        self.log(
            f"#flow: U residual={res['u_res']:.3e} "
            f"p residual={res['p_res']:.3e} "
            f"continuity={res['continuity']:.3e} (sharded)"
        )
        return res

    @property
    def kes(self):
        """Gathered closure state (None when laminar) — the coupled
        driver writes .k/.eps (or .k/.omega) restart fields from this."""
        if not self._turb_on:
            return None
        if self.turb_model == "kOmegaSST":
            from ..models.turbulence import KOmegaSSTState

            return KOmegaSSTState(
                k=jnp.asarray(gather_cells(self.smesh, self.k_s)),
                omega=jnp.asarray(gather_cells(self.smesh, self.w_s)),
                nut=jnp.asarray(gather_cells(self.smesh, self.nut_s)),
                y=jnp.asarray(gather_cells(self.smesh, self.y_s)),
            )
        from ..models.turbulence import KEpsilonState

        return KEpsilonState(
            k=jnp.asarray(gather_cells(self.smesh, self.k_s)),
            eps=jnp.asarray(gather_cells(self.smesh, self.e_s)),
            nut=jnp.asarray(gather_cells(self.smesh, self.nut_s)),
        )

    def stable_dt(self, ctrl, dt_current=None):
        dt0 = dt_current or ctrl.delta_t
        co = float(np.asarray(self._courant(self.smesh, self.flux_s, dt0))[0])
        if co <= 0.0:
            return dt0
        scale = min(ctrl.max_co / max(co, 1e-12), 1.2)
        return min(dt0 * scale, ctrl.delta_t * 100)

    @property
    def state(self):
        from ..models.simple import FlowState

        u = jnp.asarray(gather_cells(self.smesh, self.u_s))
        # global face flux gathered from the shard-local CORRECTED fluxes
        # via the signed global-face map (the previous linear
        # reconstruction from u was not conservative)
        fg = np.asarray(self.smesh.fglob)
        fl = np.asarray(self.flux_s)
        nf_g = self.m.n_faces
        flux_g = np.zeros(nf_g, fl.dtype)
        valid = fg != 0
        gids = np.abs(fg[valid]) - 1
        flux_g[gids] = np.where(fg[valid] > 0, fl[valid], -fl[valid])
        return FlowState(
            u=u,
            p=jnp.asarray(gather_cells(self.smesh, self.p_s)),
            flux=jnp.asarray(flux_g),
        )

    def cell_velocity(self) -> np.ndarray:
        return gather_cells(self.smesh, self.u_s)
