"""Analytic square-duct laminar flow — the validation oracle.

Re-implements the reference's closed-form Poiseuille profile for a square
duct (``SquareDuct_analyticalVel``/``cudaTubeAdvect``,
``cuda/particles.cu:451-519``; series solution per PhysRevE.71.057301):
axial velocity

    v_z(x, y) = -dp/(L mu) * 4 h^2 / pi^3 *
                sum_{n odd} 1/n^3 [1 - cosh(n pi x/h)/cosh(n pi/2)]
                            sin(n pi y/h)

with 20 series terms like the reference.  Used as an exact end-to-end
trajectory oracle: advecting a particle in this field has a closed-form
solution (straight line at constant speed), so integration error is
directly measurable.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

# reference driver constants (particles.cu:501-505)
DEFAULT_L = 30.0           # cm
DEFAULT_H = 0.1            # cm
DEFAULT_MU = 0.001072      # Pa s
DEFAULT_DP = -4.904871302657455  # Pa


def duct_velocity(x, y, h=DEFAULT_H, L=DEFAULT_L, dp=DEFAULT_DP, mu=DEFAULT_MU,
                  n_terms: int = 20):
    """Axial velocity v_z(x, y); broadcasts over array inputs."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    vz = jnp.zeros(jnp.broadcast_shapes(x.shape, y.shape), dtype=x.dtype)
    for i in range(n_terms):
        n = 2.0 * i + 1.0
        vz = vz + (
            1.0
            / (n * n * n)
            * (1.0 - jnp.cosh(n * math.pi * x / h) / math.cosh(n * math.pi / 2.0))
            * jnp.sin(n * math.pi * y / h)
        )
    return -dp / L / mu * 4.0 * h * h / math.pi**3 * vz


@partial(jax.jit, static_argnames=("n_steps",))
def tube_advect(pos, dt, n_steps: int = 1, h=DEFAULT_H, L=DEFAULT_L,
                dp=DEFAULT_DP, mu=DEFAULT_MU):
    """Euler-advect particles through the analytic duct field
    (``cudaTubeAdvect``): v = (0, 0, v_z(x, y)), pos += dt*v per step.
    Returns (pos, vel)."""

    def body(_, carry):
        p, _ = carry
        vz = duct_velocity(p[:, 0], p[:, 1], h, L, dp, mu)
        v = jnp.stack([jnp.zeros_like(vz), jnp.zeros_like(vz), vz], axis=-1)
        return p + dt * v, v

    vz0 = duct_velocity(pos[:, 0], pos[:, 1], h, L, dp, mu)
    v0 = jnp.stack([jnp.zeros_like(vz0), jnp.zeros_like(vz0), vz0], axis=-1)
    return jax.lax.fori_loop(0, n_steps, body, (pos, v0))
