"""Particle checkpoint / restore.

The reference never checkpoints particle state (SURVEY.md §5): VTU output
is write-only, and the particle-file reader (``particles.cu:127-160``) has
no in-loop writer.  Here checkpoint/resume is first-class:

* :func:`save` / :func:`load` — full ``ParticleState`` pytree + run
  metadata as a single ``.npz`` (portable, no framework dependency).
* :func:`save_orbax` / :func:`load_orbax` — orbax-checkpoint backend for
  async / multi-host use.
* the ascii seed-file format round-trips via
  :func:`cudaparticlesfoam_tpu.state.save_particle_file` /
  :func:`~cudaparticlesfoam_tpu.state.seed_from_file` (reference format).
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax.numpy as jnp

from ..state import ParticleState


def save(path: str, state: ParticleState, meta: dict | None = None) -> str:
    """Write state (+ JSON-serializable metadata) to an .npz file."""
    arrays = {
        "pos": np.asarray(state.pos),
        "vel": np.asarray(state.vel),
        "disp": np.asarray(state.disp),
        "tet_id": np.asarray(state.tet_id),
        "active": np.asarray(state.active),
        "rng_key": np.asarray(state.rng_key),
        "step": np.asarray(state.step),
    }
    arrays["_meta"] = np.frombuffer(
        json.dumps(meta or {}).encode(), dtype=np.uint8
    )
    d = os.path.dirname(path)
    if d:
        os.makedirs(d, exist_ok=True)
    np.savez_compressed(path, **arrays)
    return path


def load(path: str) -> tuple[ParticleState, dict]:
    z = np.load(path)
    meta = json.loads(bytes(z["_meta"]).decode()) if "_meta" in z else {}
    state = ParticleState(
        pos=jnp.asarray(z["pos"]),
        vel=jnp.asarray(z["vel"]),
        disp=jnp.asarray(z["disp"]),
        tet_id=jnp.asarray(z["tet_id"]),
        active=jnp.asarray(z["active"]),
        rng_key=jnp.asarray(z["rng_key"]),
        step=jnp.asarray(z["step"]),
        n_particles=int(z["pos"].shape[0]),
    )
    return state, meta


def save_orbax(ckpt_dir: str, state: ParticleState, step: int | None = None):
    """Orbax backend (async-capable, multi-host-aware)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    path = os.path.join(
        os.path.abspath(ckpt_dir),
        f"step_{int(step if step is not None else state.step)}",
    )
    ckptr.save(path, {
        "pos": state.pos, "vel": state.vel, "disp": state.disp,
        "tet_id": state.tet_id, "active": state.active,
        "rng_key": state.rng_key, "step": state.step,
    }, force=True)
    return path


def load_orbax(path: str) -> ParticleState:
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    # restore as host numpy (device/topology-independent; the caller's jit
    # placement re-shards on first use)
    keys = ["pos", "vel", "disp", "tet_id", "active", "rng_key", "step"]
    restore_args = {k: ocp.RestoreArgs(restore_type=np.ndarray) for k in keys}
    t = ckptr.restore(os.path.abspath(path), restore_args=restore_args)
    return ParticleState(
        pos=jnp.asarray(t["pos"]),
        vel=jnp.asarray(t["vel"]),
        disp=jnp.asarray(t["disp"]),
        tet_id=jnp.asarray(t["tet_id"]),
        active=jnp.asarray(t["active"]),
        rng_key=jnp.asarray(t["rng_key"]),
        step=jnp.asarray(t["step"]),
        n_particles=int(np.asarray(t["pos"]).shape[0]),
    )
