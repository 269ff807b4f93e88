"""CKS Christoffel connection, batched (reference radiation_geometry.cpp:274-410).

Built from the Kerr-Schild covariant derivative dg_{munu}/dx^i =
df_i l_mu l_nu + f (dl_i,mu l_nu + l_mu dl_i,nu) with covariant
l = (1, l1, l2, l3), dl_,0 = 0 and no time dependence.
"""

from __future__ import annotations

import jax.numpy as jnp

from blacklight_tpu.ops import geometry


def dgcov_cks(x, spin, mass=1.0, flat=False):
    """Spatial derivatives of the covariant metric: (..., 4[d], 4, 4)
    with d = (t, x, y, z); the time slot is zero."""
    if flat:
        return jnp.zeros(x.shape[:-1] + (4, 4, 4), dtype=x.dtype)
    r, f, (l1, l2, l3), df, (dl1, dl2, dl3) = geometry.ks_derivatives(x, spin, mass)
    one = jnp.ones_like(l1)
    zero = jnp.zeros_like(l1)
    l_cov = jnp.stack([one, l1, l2, l3], axis=-1)                 # (..., 4)
    df_v = jnp.stack([zero, df[0], df[1], df[2]], axis=-1)        # (..., 4) incl t
    # dl[..., d, mu]: derivative of covariant l_mu along direction d (t,x,y,z)
    dl = jnp.stack([
        jnp.stack([zero, zero, zero, zero], axis=-1),
        jnp.stack([zero, dl1[0], dl2[0], dl3[0]], axis=-1),
        jnp.stack([zero, dl1[1], dl2[1], dl3[1]], axis=-1),
        jnp.stack([zero, dl1[2], dl2[2], dl3[2]], axis=-1),
    ], axis=-2)                                                   # (..., 4, 4)
    ll = l_cov[..., :, None] * l_cov[..., None, :]
    term_f = df_v[..., :, None, None] * ll[..., None, :, :]
    term_l = f[..., None, None, None] * (
        dl[..., :, :, None] * l_cov[..., None, None, :]
        + l_cov[..., None, :, None] * dl[..., :, None, :])
    return term_f + term_l


def connection_cks(x, spin, mass=1.0, flat=False):
    """Christoffel symbols Gamma^mu_{alpha beta}: (..., 4, 4, 4)."""
    dg = dgcov_cks(x, spin, mass, flat=flat)
    g_con = geometry.gcon(x, spin, mass, flat=flat)
    # Gamma^mu_ab = 1/2 g^{mu d} (dg[a, d, b] + dg[b, d, a] - dg[d, a, b])
    term = (jnp.einsum("...adb->...dab", dg) + jnp.einsum("...bda->...dab", dg)
            - dg)
    return 0.5 * jnp.einsum("...md,...dab->...mab", g_con, term)
