"""Orthonormal tetrad construction (reference radiation_geometry.cpp:597-658).

Batched: e_0 = u; e_3 along the projection of k orthogonal to u; e_2 along
the projection of `up` (usually b) orthogonal to e_0 and e_3; e_1 completes
a right-handed frame via the Levi-Civita contraction, assuming |det g| = 1
(true in Cartesian Kerr-Schild / Minkowski).

tetrad[..., a, mu] are contravariant components e_a^mu.
"""

from __future__ import annotations

import jax.numpy as jnp


def tetrad_cks(ucon, ucov, kcon, kcov, up_con, gcov, gcon):
    """Build the (B, 4, 4) tetrad; all args batched (B, ...)."""
    omega = -jnp.einsum("...m,...m->...", kcov, ucon)
    k_up = jnp.einsum("...m,...m->...", kcov, up_con) / omega
    u_up = jnp.einsum("...m,...m->...", ucov, up_con) / omega

    e0 = ucon
    e3 = kcon / omega[..., None] - ucon
    e2 = up_con - k_up[..., None] * e3 + u_up[..., None] * kcon
    norm = jnp.sqrt(jnp.einsum("...mn,...m,...n->...", gcov, e2, e2))
    e2 = e2 / norm[..., None]

    # e_1 covariant via generalized cross product of e_0, e_2, e_3
    # (radiation_geometry.cpp:638-652)
    def lc_term(a, b, c):
        return (e0[..., a] * (e2[..., b] * e3[..., c] - e2[..., c] * e3[..., b]))

    e1_cov = jnp.stack([
        lc_term(1, 3, 2) + lc_term(2, 1, 3) + lc_term(3, 2, 1),
        lc_term(0, 2, 3) + lc_term(2, 3, 0) + lc_term(3, 0, 2),
        lc_term(0, 3, 1) + lc_term(1, 0, 3) + lc_term(3, 1, 0),
        lc_term(0, 1, 2) + lc_term(1, 2, 0) + lc_term(2, 0, 1),
    ], axis=-1)
    e1 = jnp.einsum("...mn,...n->...m", gcon, e1_cov)
    return jnp.stack([e0, e1, e2, e3], axis=-2)
