"""Synchrotron emission/absorption/rotation coefficients from sampled GRMHD.

Batched re-derivation of the reference coefficient engine
(src/radiation_integrator/simulation_coefficients.cpp:51-722), following
2021 ApJ 921 17 (M). This module covers the thermal population (emissivity
M 28,30; Kirchhoff absorptivity M 31; Faraday rotativities M 33-37); the
power-law and kappa populations are in powerlaw.py / kappa_dist.py and add
into the same outputs.

Scalarized geometry throughout: the fluid 4-velocity/field construction uses
the sparse SKS metric (ops/sks.py) and the pitch angle falls out of
invariants - for null k in the fluid frame |k_tet|^2 = (k.u)^2 and
b_tet^2 = b.b, so cos(theta_B) = (k.b) / (|k.u| sqrt(b.b)) with no tetrad
construction at all (the full tetrad is only needed for polarized transport).

Float32 discipline: emissivities carry the unit factor e^2/(c nu0^2) in log
form (log_j_scale) so device values stay O(1); absorptivities are true CGS
invariants (alpha_nu * nu, O(1e-12..1) magnitudes).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax.numpy as jnp

from blacklight_tpu.constants import NUM_CELL_VALUES, CellValues, Math, Physics, PlasmaModel
from blacklight_tpu.ops import geometry, sks

THETA_E_ZERO = 0.01  # reference radiation_integrator.hpp:190


@dataclasses.dataclass(frozen=True)
class PlasmaParams:
    """Plasma model parameters (reference input_reader.hpp:163-178)."""

    mu: float
    ne_ni: float
    model: PlasmaModel
    use_p: bool = True
    gamma: float = 5.0 / 3.0
    gamma_i: float = 5.0 / 3.0
    gamma_e: float = 4.0 / 3.0
    rat_low: float = 1.0
    rat_high: float = 1.0
    power_frac: float = 0.0
    power_p: float = 0.0
    gamma_min: float = 0.0
    gamma_max: float = 0.0
    kappa_frac: float = 0.0
    kappa: float = 0.0
    w: float = 0.0

    @property
    def thermal_frac(self):
        return 1.0 - (self.power_frac + self.kappa_frac)


@dataclasses.dataclass(frozen=True)
class CutParams:
    """Value cuts (negative = disabled; reference input_reader.hpp:181-194)."""

    rho_min: float = -1.0
    rho_max: float = -1.0
    n_e_min: float = -1.0
    n_e_max: float = -1.0
    p_gas_min: float = -1.0
    p_gas_max: float = -1.0
    theta_e_min: float = -1.0
    theta_e_max: float = -1.0
    b_min: float = -1.0
    b_max: float = -1.0
    sigma_min: float = -1.0
    sigma_max: float = -1.0
    beta_inverse_min: float = -1.0
    beta_inverse_max: float = -1.0


def fluid_state(pos, samples, spin, plasma: PlasmaParams, rho_unit: float):
    """Construct the CGS fluid state and CKS 4-vectors at sample points.

    Mirrors simulation_coefficients.cpp:287-358 (units, u^mu/b^mu in SKS,
    electron temperature) plus the Jacobian transform to CKS (:397-431),
    assuming the simulation is in SKS coordinates.

    Returns dict with n_e_cgs, bb_cgs, sigma, beta_inv, theta_e, kb_tt_e_cgs,
    rho_cgs, pgas_cgs, ucon (B,4) CKS, bcon (B,4) CKS, and b_sq.
    """
    x, y, z = pos[..., 1], pos[..., 2], pos[..., 3]
    rho = samples["rho"]
    pgas = samples["pgas"]
    uu1, uu2, uu3 = samples["uu1"], samples["uu2"], samples["uu3"]
    bb1, bb2, bb3 = samples["bb1"], samples["bb2"], samples["bb3"]

    d_unit = rho_unit
    e_unit = d_unit * Physics.c ** 2
    b_unit = math.sqrt(4.0 * Math.pi * e_unit)

    rho_cgs = rho * d_unit
    pgas_cgs = pgas * e_unit
    n_cgs = rho_cgs / (plasma.mu * Physics.m_p)
    n_e_cgs = n_cgs / (1.0 + 1.0 / plasma.ne_ni)

    m = sks.sks_metric(x, y, z, spin)
    ut, ur, uth, uph = sks.normal_frame_velocity(m, uu1, uu2, uu3)
    ucov_t, ucov_r, ucov_th, ucov_ph = sks.lower_sks(m, ut, ur, uth, uph)

    # b^mu from cell-frame field (simulation_coefficients.cpp:315-328)
    bt = ucov_r * bb1 + ucov_th * bb2 + ucov_ph * bb3
    br = (bb1 + bt * ur) / ut
    bth = (bb2 + bt * uth) / ut
    bph = (bb3 + bt * uph) / ut
    bcov_t, bcov_r, bcov_th, bcov_ph = sks.lower_sks(m, bt, br, bth, bph)
    b_sq = bcov_t * bt + bcov_r * br + bcov_th * bth + bcov_ph * bph
    bb_cgs = jnp.sqrt(jnp.maximum(b_sq, 0.0)) * b_unit
    sigma = b_sq / rho
    beta_inv = b_sq / (2.0 * pgas)

    # Electron temperature (simulation_coefficients.cpp:330-358)
    if plasma.model == PlasmaModel.ti_te_beta:
        tti_tte = (plasma.rat_high + plasma.rat_low * beta_inv ** 2) \
            / (1.0 + beta_inv ** 2)
        kb_tt_tot_cgs = plasma.mu * Physics.m_p * pgas_cgs / rho_cgs
        if plasma.use_p:
            kb_tt_e_cgs = (1.0 + plasma.ne_ni) / (tti_tte + plasma.ne_ni) \
                * kb_tt_tot_cgs
        else:
            kb_tt_e_cgs = (1.0 + plasma.ne_ni) * kb_tt_tot_cgs / (plasma.gamma - 1.0)
            kb_tt_e_cgs = kb_tt_e_cgs / (tti_tte / (plasma.gamma_i - 1.0)
                                         + plasma.ne_ni / (plasma.gamma_e - 1.0))
        theta_e = kb_tt_e_cgs / (Physics.m_e * Physics.c ** 2)
    else:  # code_kappa (E2 13)
        kappa = samples["kappa"]
        mu_e = plasma.mu * (1.0 + 1.0 / plasma.ne_ni)
        rho_e = rho * Physics.m_e / (mu_e * Physics.m_p)
        rho_kappa_e_cbrt = jnp.cbrt(rho_e * kappa)
        theta_e = 0.2 * (jnp.sqrt(1.0 + 25.0 * rho_kappa_e_cbrt ** 2) - 1.0)
        kb_tt_e_cgs = theta_e * Physics.m_e * Physics.c ** 2

    # Transform u, b to CKS (Jacobian, radiation_geometry.cpp:94-126)
    ux, uy, uz = sks.sks_to_cks_vector(ur, uth, uph, x, y, z, spin)
    bx, by, bz = sks.sks_to_cks_vector(br, bth, bph, x, y, z, spin)
    ucon = jnp.stack([ut, ux, uy, uz], axis=-1)
    bcon = jnp.stack([bt, bx, by, bz], axis=-1)

    return dict(rho_cgs=rho_cgs, pgas_cgs=pgas_cgs, n_e_cgs=n_e_cgs,
                bb_cgs=bb_cgs, sigma=sigma, beta_inv=beta_inv,
                theta_e=theta_e, kb_tt_e_cgs=kb_tt_e_cgs,
                ucon=ucon, bcon=bcon, b_sq=b_sq)


def value_cuts(state, cuts: CutParams):
    """Per-sample keep mask from cell-value cuts
    (simulation_coefficients.cpp:361-375)."""
    keep = jnp.ones_like(state["sigma"], dtype=bool)
    pairs = [
        ("rho_cgs", cuts.rho_min, cuts.rho_max),
        ("n_e_cgs", cuts.n_e_min, cuts.n_e_max),
        ("pgas_cgs", cuts.p_gas_min, cuts.p_gas_max),
        ("theta_e", cuts.theta_e_min, cuts.theta_e_max),
        ("bb_cgs", cuts.b_min, cuts.b_max),
        ("sigma", cuts.sigma_min, cuts.sigma_max),
        ("beta_inv", cuts.beta_inverse_min, cuts.beta_inverse_max),
    ]
    for name, lo, hi in pairs:
        if lo >= 0.0:
            keep &= ~(state[name] < lo)
        if hi >= 0.0:
            keep &= ~(state[name] > hi)
    return keep


def cell_values(state):
    """(B, NUM_CELL_VALUES) diagnostic values
    (simulation_coefficients.cpp:377-387)."""
    return jnp.stack([
        state["rho_cgs"], state["n_e_cgs"], state["pgas_cgs"],
        state["theta_e"], state["bb_cgs"], state["sigma"], state["beta_inv"],
    ], axis=-1)


def pitch_angle(pos, kcov, state, spin, flat=False):
    """Fluid-frame angle between wavevector and magnetic field via
    invariants (equivalent to the tetrad construction at
    simulation_coefficients.cpp:397-455 for null k):
      cos(theta_B) = (k.b) / (|k.u| sqrt(b.b)).

    Returns (sin_theta_b, cos_theta_b, sin2_theta_b, u_dot_k).
    """
    ucon, bcon = state["ucon"], state["bcon"]
    u_dot_k = jnp.einsum("...i,...i->...", ucon, kcov)
    b_dot_k = jnp.einsum("...i,...i->...", bcon, kcov)
    b_sq = state["b_sq"]
    denom = u_dot_k * u_dot_k * jnp.maximum(b_sq, 1e-300)
    cos2 = jnp.minimum(b_dot_k * b_dot_k / denom, 1.0)
    sin2 = 1.0 - cos2
    sin_theta_b = jnp.sqrt(sin2)
    cos_theta_b = jnp.sqrt(cos2) * jnp.where(b_dot_k >= 0.0, 1.0, -1.0)
    return sin_theta_b, cos_theta_b, sin2, u_dot_k


def _bessel_k(order: int, x):
    """Modified Bessel K_0/K_1/K_2, valid for x = 1/theta_e with
    theta_e >= 0.01 (so x <= 100). jax provides no cyl_bessel_k; use the
    standard Abramowitz-Stegun 9.8 polynomial(small x)/asymptotic(large x)
    forms for K0/K1 (abs error < 2e-7) and the recurrence
    K2 = K0 + 2 K1 / x."""
    small = x <= 2.0
    xs = jnp.where(small, jnp.maximum(x, 1e-30), 2.0)
    xl = jnp.where(small, 2.0, x)
    t = xs * xs / 4.0
    # I0, I1 for the small-x K formulas (A&S 9.8.1, 9.8.3)
    ti = (xs / 3.75) ** 2
    i0 = (1.0 + 3.5156229 * ti + 3.0899424 * ti**2 + 1.2067492 * ti**3
          + 0.2659732 * ti**4 + 0.0360768 * ti**5 + 0.0045813 * ti**6)
    i1 = xs * (0.5 + 0.87890594 * ti + 0.51498869 * ti**2 + 0.15084934 * ti**3
               + 0.02658733 * ti**4 + 0.00301532 * ti**5 + 0.00032411 * ti**6)
    lnx2 = jnp.log(xs / 2.0)
    k0_small = (-lnx2 * i0 - 0.57721566 + 0.42278420 * t + 0.23069756 * t**2
                + 0.03488590 * t**3 + 0.00262698 * t**4 + 0.00010750 * t**5
                + 0.00000740 * t**6)
    k1_small = (lnx2 * i1 + 1.0 / xs
                * (1.0 + 0.15443144 * t - 0.67278579 * t**2 - 0.18156897 * t**3
                   - 0.01919402 * t**4 - 0.00110404 * t**5 - 0.00004686 * t**6))
    u = 2.0 / xl
    pref = jnp.exp(-xl) / jnp.sqrt(xl)
    k0_large = pref * (1.25331414 - 0.07832358 * u + 0.02189568 * u**2
                       - 0.01062446 * u**3 + 0.00587872 * u**4
                       - 0.00251540 * u**5 + 0.00053208 * u**6)
    k1_large = pref * (1.25331414 + 0.23498619 * u - 0.03655620 * u**2
                       + 0.01504268 * u**3 - 0.00780353 * u**4
                       + 0.00325614 * u**5 - 0.00068245 * u**6)
    k0 = jnp.where(small, k0_small, k0_large)
    k1 = jnp.where(small, k1_small, k1_large)
    if order == 0:
        return k0
    if order == 1:
        return k1
    return k0 + 2.0 * k1 / x


def log_j_scale(nu0: float):
    """log of the emissivity unit factor e^2/(c nu0^2) pulled out of j."""
    return 2.0 * math.log(Physics.e) - math.log(Physics.c) - 2.0 * math.log(nu0)


def thermal_coefficients(nu_cgs, nu0: float, state, sin_theta_b, cos_theta_b,
                         sin2_theta_b, plasma: PlasmaParams, polarized: bool):
    """Thermal synchrotron coefficients at fluid-frame frequencies nu_cgs (B,F).

    Returns dict with scaled invariant emissivities j_i[, j_q, j_v] (divide by
    exp(log_j_scale(nu0)) for CGS) and true invariant absorptivities
    alpha_i[, alpha_q, alpha_v] and rotativities rho_q, rho_v.

    Emissivity: M 28,30 (simulation_coefficients.cpp:469-496); absorptivity
    via Kirchhoff (M 31, :498-524 with the 1/alpha^2 overflow trap);
    rotativities M 33-37 (:526-556 with the theta_e -> 0 trap).
    """
    out = {}
    theta_e = state["theta_e"][..., None]
    kb_tt_e = state["kb_tt_e_cgs"][..., None]
    n_e = state["n_e_cgs"][..., None]
    sin_b = sin_theta_b[..., None]
    cos_b = cos_theta_b[..., None]
    sin2_b = sin2_theta_b[..., None]
    frac = plasma.thermal_frac

    nu_2 = nu_cgs * nu_cgs
    nu_c = Physics.e * state["bb_cgs"][..., None] \
        / (2.0 * Math.pi * Physics.m_e * Physics.c)
    nu_s = 2.0 / 9.0 * nu_c * theta_e ** 2 * sin_b
    nu_s = jnp.maximum(nu_s, 1e-300)

    xx = nu_cgs / nu_s
    xx_1_3 = jnp.cbrt(xx)
    xx_1_2 = jnp.sqrt(xx)
    xx_1_6 = jnp.sqrt(xx_1_3)
    # coefficient in units of e^2 nu0^2 / c: frac * n_e * nu_c * (nu0/nu)^2 * exp
    coefficient = frac * n_e * nu_c * (nu0 / nu_cgs) ** 2 * jnp.exp(-xx_1_3)
    var_a = Math.sqrt2 * Math.pi / 27.0 * sin_b
    var_b = 2.0 ** (11.0 / 12.0)
    var_c = xx_1_2 + var_b * xx_1_6
    j_i = coefficient * var_a * var_c * var_c
    out["j_i"] = j_i
    if polarized:
        var_d = (7.0 * theta_e ** 0.96 + 35.0) / (10.0 * theta_e ** 0.96 + 75.0) \
            * var_b
        var_e = xx_1_2 + var_d * xx_1_6
        var_f = cos_b / theta_e
        var_g = (Math.pi / 3.0 + Math.pi / 3.0 * xx_1_3 + 2.0 / 300.0 * xx_1_2
                 + 2.0 / 19.0 * Math.pi * xx_1_3 ** 2)
        out["j_q"] = -coefficient * var_a * var_e * var_e
        out["j_v"] = coefficient * var_f * var_g

    # Kirchhoff absorption: alpha_inv = j_cgs/B_nu * nu. With j carrying the
    # e^2/(c nu0^2) scale, alpha_inv = j_scaled * expm1(h nu/kT) * K where
    # K = e^2 c nu / (2 h nu0^2) - computed in log space for float32.
    hnu_kt = Physics.h * nu_cgs / kb_tt_e
    log_k = (2.0 * math.log(Physics.e) + math.log(Physics.c)
             - math.log(2.0 * Physics.h) - 2.0 * math.log(nu0))
    kirchhoff = jnp.expm1(hnu_kt) * math.exp(log_k)
    alpha_i = j_i * kirchhoff
    # Overflow trap (simulation_coefficients.cpp:512-523)
    bad = jnp.isinf(1.0 / (alpha_i * alpha_i))
    out["alpha_i"] = jnp.where(bad, 0.0, alpha_i)
    if polarized:
        out["alpha_q"] = jnp.where(bad, 0.0, out["j_q"] * kirchhoff)
        out["alpha_v"] = jnp.where(bad, 0.0, out["j_v"] * kirchhoff)

        # Faraday rotativities (M 33-37)
        coefficient_q = -frac * n_e * Physics.e ** 2 * nu_c ** 2 * sin2_b \
            / (Physics.m_e * Physics.c * nu_2)
        coefficient_v = frac * 2.0 * n_e * Physics.e ** 2 * nu_c * cos_b \
            / (Physics.m_e * Physics.c * nu_cgs)
        inv_theta = 1.0 / jnp.maximum(theta_e, THETA_E_ZERO)
        kk_0 = _bessel_k(0, inv_theta)
        kk_1 = _bessel_k(1, inv_theta)
        kk_2 = _bessel_k(2, inv_theta)
        xx_neg_1_2 = 1.0 / jnp.sqrt(xx)
        var_a2 = 2.011 * jnp.exp(-19.78 * xx ** (-0.5175))
        var_b2 = jnp.cos(39.89 * xx_neg_1_2) * jnp.exp(-70.16 * xx ** (-0.6))
        var_c2 = 0.011 * jnp.exp(-1.69 * xx_neg_1_2)
        var_d2 = 0.003135 * xx ** (4.0 / 3.0)
        var_e2 = 0.5 * (1.0 + jnp.tanh(10.0 * jnp.log(0.6648 * xx_neg_1_2)))
        f_0 = var_a2 - var_b2 - var_c2
        f_m = f_0 + (var_c2 - var_d2) * var_e2
        delta_jj_5 = 0.4379 * jnp.log(1.0 + 1.3414 * xx ** (-0.7515))
        factor_q = f_m * (kk_1 / kk_2 + 6.0 * theta_e)
        factor_v = (kk_0 - delta_jj_5) / kk_2
        factor_v = jnp.where((factor_v < 0.0) | (factor_v > 1.0), 1.0, factor_v)
        cold = theta_e < THETA_E_ZERO
        out["rho_q"] = coefficient_q * jnp.where(cold, 0.0, factor_q)
        out["rho_v"] = coefficient_v * jnp.where(cold, 1.0, factor_v)
    return out
