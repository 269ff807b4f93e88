"""Pallas TPU kernel: fused geodesics + GRMHD sampling + thermal polarized
(full-Stokes IQUV) radiative transfer.

The polarized transfer must process samples far-end -> camera while the
geodesic integrates camera -> far-end (the coupling operators do not
commute along the ray, polarized.cpp:51-973). The XLA streaming path
(transfer/polarized.py) sqrt-checkpoints the geodesic sweep and replays
windows in reverse segment order; this kernel runs the SAME two-sweep
structure entirely in VMEM:

  sweep A (forward): integrate rk4/rk2 windows with early exit, storing
    each window's boundary carry (8 floats + packed masks per ray) in a
    VMEM scratch table - nothing else is materialized;
  sweep B (reverse): for each stored window, vote the angular grid brick
    and DMA its angular-line slab (the machinery shared with
    ops/pallas_simulation.py), re-integrate the window's W steps
    (registers only), then run the full polarized update per sample in
    reverse order: transport matrices from the rank-1 Kerr-Schild
    closed forms (ops/connection.transport_matrix_c), fluid tetrad
    (ops/tetrad.tetrad_rows_c), thermal polarized synchrotron
    coefficients (in-kernel float32 port of models/synchrotron.
    thermal_coefficients), and the matter coupling
    (transfer/polarized_coupling.couple_matter_c with Mosaic-safe
    transcendental substitutes).

The coherency tensor is carried as 10 real-symmetric + 6
imaginary-antisymmetric flat components per frequency (transfer/
polarized.py _SYM/_ANT); the kernel outputs the FINAL transported
components and the host applies the camera-frame Stokes extraction
(transfer/polarized.camera_stokes) - one cheap vectorized pass.

Rays whose angular anchor leaves the window brick latch a per-ray
overflow flag exactly like the unpolarized kernel; the host re-renders
those rays on the exact XLA streaming path.

MEASURED OUTCOME (v5e, round 5): this kernel is ~28% SLOWER than the XLA
streaming path under the identical 1024^2 tile protocol (36.0k vs 50.0k
rays/s, 512 steps, 5.2% fallback included). The only variant Mosaic could
compile in reasonable time (window 4, (8,8) brick - the window-8 (12,12)
build ran >49 min without completing) re-integrates every window in sweep
B and pays brick DMAs every 4 steps, which the streaming XLA path's plain
gathers beat. The pipeline therefore routes polarized renders to the XLA
path unless kernel="force" (pipeline_simulation.py); the kernel is kept
for A/B (scripts/bench_polarized.py) and as the starting point for a
future wider-window build on hardware with a local (cacheable) compiler.

Scope: single-block SKS grids, simulation_interp=true clamped-to-block,
ti_te_beta thermal plasma, polarized image_light only (no aux planes),
rk4/rk2 integrators, float32.

Reference anchors: polarized transfer src/radiation_integrator/
polarized.cpp:51-973; coefficients simulation_coefficients.cpp:287-556
(thermal M 28-37); sampling simulation_sampling.cpp:352-516, 821-859;
geodesics geodesics.cpp:418-795.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blacklight_tpu.constants import Math, Physics
from blacklight_tpu.models.synchrotron import _bessel_k012_scaled
from blacklight_tpu.ops import geodesic as geo
from blacklight_tpu.ops.connection import transport_matrix_c
from blacklight_tpu.ops.geometry import (geodesic_rhs_c, ks_derivatives_c,
                                         renormalize_factor_c)
from blacklight_tpu.ops.pallas_formula import _expm1, _radius_c
from blacklight_tpu.ops.pallas_simulation import (
    LANES, THETA_E_ZERO, KernelGrid, SimKernelParams,
    _cks_to_sks_c, _fluid_state_c, _gather_corners, _geometric_keep_c,
    _locate_axis, _value_keep_c, _window_setup_impl, prepare_kernel_grid,
    sim_kernel_params)
from blacklight_tpu.ops.tetrad import tetrad_rows_c
from blacklight_tpu.transfer.polarized import (_ANT, _SYM, _n_from_stokes,
                                               _stokes_from_n, _transport_c)
from blacklight_tpu.transfer.polarized_coupling import couple_matter_c

# Polarized per-step work is ~10x the unpolarized kernel's, so op-issue
# amortization matters less and VMEM pressure (boundary-carry table + brick
# slabs + the 32+16F transfer carries) matters more: default to 8-row
# (1024-ray) blocks.
#
# The window/brick defaults also differ from the unpolarized kernel's
# (8/(12,12)): the round-5 ablation showed loop-carry traffic is NOT the
# per-step bottleneck (doubling the window left the skeleton unchanged),
# so the only cost of a short window is brick-DMA amortization - while
# the compile-time cost of the unrolled two-sweep body is severe (the
# remote Mosaic build of the window-8 (12,12) variant, whose gather loop
# alone emits bk*bj=144 predicated groups per sample, ran >49 min without
# completing). window=4 with an (8,8) brick keeps the emitted body near
# the unpolarized kernel's size.
ROWS_P = 8
WINDOW_P = 4
BRICK_P = (8, 8)
MARGIN_P = (3, 3)


def _sincos_quadrant(x, q_off):
    """Quadrant-reduced float32 sin (q_off=0) / cos (q_off=1), Mosaic-safe
    (~4e-7 abs): reduce to r in [-pi/4, pi/4] with a Cephes-style 3-term
    split of pi/2 (each head exactly representable, full float32 precision
    for |x| up to ~1e4 - arguments here are O(rho dl), O(40) at most),
    then pick the Cephes sinf/cosf minimax polynomial by quadrant."""
    j = jnp.floor(x * (2.0 / math.pi) + 0.5)
    r = ((x - j * 1.5703125) - j * 4.837512969970703125e-4) \
        - j * 7.549789948768648e-8
    q = (j.astype(jnp.int32) + q_off) & 3
    z = r * r
    sp = r * (1.0 + z * (-1.6666654611e-1 + z * (8.3321608736e-3
                                                 + z * -1.9515295891e-4)))
    cp = 1.0 + z * (-0.5 + z * (4.166664568298827e-2
                                + z * (-1.388731625493765e-3
                                       + z * 2.443315711809948e-5)))
    return jnp.where(q == 0, sp,
                     jnp.where(q == 1, cp,
                               jnp.where(q == 2, -sp, -cp)))


def _sin_c(x):
    return _sincos_quadrant(x, 0)


def _cos_c(x):
    # cos(x) = sin(x + pi/2) via the QUADRANT offset (adding pi/2 to the
    # float32 argument itself would cost ~|x| ulps of phase)
    return _sincos_quadrant(x, 1)


def _sinh_c(x):
    """sinh (Mosaic has no sinh primitive); callers clamp |x| <= ~80.
    Below |x| = 1: sinh = em1 (em1 + 2) / (2 (em1 + 1)) - fully accurate
    where the naive 0.5 (e^x - e^-x) cancels to roundoff. Above: the
    naive form (no cancellation there; the expm1 form's em1^2 would
    overflow float32 past x ~ 44)."""
    ax = jnp.abs(x)
    small = ax < 1.0
    em1 = _expm1(jnp.where(small, ax, 0.0))
    mag_s = 0.5 * em1 * (em1 + 2.0) / (em1 + 1.0)
    e = jnp.exp(jnp.where(small, 1.0, ax))
    mag_l = 0.5 * (e - 1.0 / e)
    mag = jnp.where(small, mag_s, mag_l)
    return jnp.where(x < 0.0, -mag, mag)


def _cosh_c(x):
    e = jnp.exp(x)
    return 0.5 * (e + 1.0 / e)


# Mosaic-safe primitive set for couple_matter_c (values within float32
# roundoff of the jnp defaults; parity gated statistically like the rest of
# the kernel).
_PALLAS_PM = {"sin": _sin_c, "cos": _cos_c, "sinh": _sinh_c,
              "cosh": _cosh_c, "expm1": _expm1}


def _log1p_c(z):
    """log1p: series below 1e-2 (exact where float32 1+z rounds to 1)."""
    small = z < 1e-2
    zs = jnp.where(small, z, 0.0)
    series = zs * (1.0 + zs * (-0.5 + zs * (1.0 / 3.0 - 0.25 * zs)))
    return jnp.where(small, series, jnp.log(1.0 + jnp.where(small, 1.0, z)))


def _pitch_angle_full_c(st, k0, k1, k2, k3):
    """models/synchrotron.pitch_angle float32 branch, componentwise,
    returning (sin_b, cos_b signed, sin2_b, u_dot_k)."""
    ut, ux, uy, uz = st["u"]
    bt, bx, by, bz = st["b"]
    u_dot_k = ut * k0 + ux * k1 + uy * k2 + uz * k3
    b_dot_k = bt * k0 + bx * k1 + by * k2 + bz * k3
    b_sq = st["b_sq"]
    denom = u_dot_k * u_dot_k * jnp.maximum(b_sq, 1e-16)
    cos2 = jnp.minimum(b_dot_k * b_dot_k / denom, 1.0)
    sin2 = 1.0 - cos2
    cut = 1e-24
    sin_b = jnp.where(sin2 > cut,
                      jnp.sqrt(jnp.where(sin2 > cut, sin2, 1.0)), 0.0)
    cos_b = jnp.where(cos2 > cut,
                      jnp.sqrt(jnp.where(cos2 > cut, cos2, 1.0)), 0.0)
    cos_b = cos_b * jnp.where(b_dot_k >= 0.0, 1.0, -1.0)
    return sin_b, cos_b, sin2, u_dot_k


def _thermal_polarized_c(nu_cgs, nu0, st, sin_b, cos_b, sin2_b,
                         sp: SimKernelParams):
    """models/synchrotron.thermal_coefficients float32 branch (polarized),
    componentwise at one frequency, with Mosaic-safe transcendentals
    (cbrt/pow via exp-log, tanh via the closed u^20 form, log1p series).

    Returns (j_i, j_q, j_v, alpha_i, alpha_q, alpha_v, rho_q, rho_v, neg)
    with j's scaled by e^2/(c nu0^2) (models/synchrotron.log_j_scale) and
    alphas/rhos unscaled, exactly like the XLA coeff_fn.
    """
    theta_e = st["theta_e"]
    kb_tt_e = st["kb_tt_e"]
    n_e = st["n_e"]
    frac = sp.thermal_frac

    nu_c = (Physics.e / (2.0 * Math.pi * Physics.m_e * Physics.c)) \
        * st["bb_cgs"]
    nu_s = (2.0 / 9.0) * nu_c * theta_e * theta_e * sin_b
    nu_s = jnp.maximum(nu_s, 1e-12)
    xx = jnp.minimum(nu_cgs / nu_s, 1e20)
    neg = nu_cgs < 0.0
    lx = jnp.log(jnp.maximum(xx, 1e-38))
    xx_1_3 = jnp.exp(lx * (1.0 / 3.0))
    xx_1_2 = jnp.sqrt(jnp.maximum(xx, 1e-38))
    xx_1_6 = jnp.sqrt(xx_1_3)
    coefficient = frac * n_e * nu_c * (nu0 / nu_cgs) ** 2 \
        * jnp.exp(-xx_1_3)
    var_a = Math.sqrt2 * Math.pi / 27.0 * sin_b
    var_b = 2.0 ** (11.0 / 12.0)
    var_c = xx_1_2 + var_b * xx_1_6
    j_i = coefficient * var_a * var_c * var_c

    # j_q / j_v (M 29-30): theta_e floored, pow via exp-log
    theta_f = jnp.maximum(theta_e, 1e-15)
    lth = jnp.log(theta_f)
    th_096 = jnp.exp(0.96 * lth)
    var_d = (7.0 * th_096 + 35.0) / (10.0 * th_096 + 75.0) * var_b
    var_e = xx_1_2 + var_d * xx_1_6
    var_f = cos_b / theta_f
    var_g = (Math.pi / 3.0 + Math.pi / 3.0 * xx_1_3
             + 2.0 / 300.0 * xx_1_2
             + 2.0 / 19.0 * Math.pi * xx_1_3 * xx_1_3)
    j_q = -coefficient * var_a * var_e * var_e
    j_v = coefficient * var_f * var_g

    # Kirchhoff absorption (M 31, float32 caps as in the XLA branch)
    hnu_kt = jnp.minimum(
        Physics.h * nu_cgs / jnp.maximum(kb_tt_e, 1e-18), 87.0)
    log_k = (2.0 * math.log(Physics.e) + math.log(Physics.c)
             - math.log(2.0 * Physics.h) - 2.0 * math.log(nu0))
    kirchhoff = _expm1(hnu_kt) * math.exp(log_k)
    alpha_i = j_i * kirchhoff
    trap = jnp.isinf(1.0 / (alpha_i * alpha_i))
    alpha_i = jnp.where(trap, 0.0, alpha_i)
    alpha_q = jnp.where(trap, 0.0, j_q * kirchhoff)
    alpha_v = jnp.where(trap, 0.0, j_v * kirchhoff)

    # Faraday rotativities (M 33-37, float32 branch with e^x-scaled Bessel
    # ratios; pow via exp-log, tanh(10 ln u) = (u^20-1)/(u^20+1))
    nu_2 = nu_cgs * nu_cgs
    coefficient_q = -frac * n_e * Physics.e ** 2 * nu_c * nu_c * sin2_b \
        / (Physics.m_e * Physics.c * nu_2)
    coefficient_v = frac * 2.0 * n_e * Physics.e ** 2 * nu_c * cos_b \
        / (Physics.m_e * Physics.c * nu_cgs)
    xx_neg_1_2 = 1.0 / xx_1_2
    var_a2 = 2.011 * jnp.exp(-19.78 * jnp.exp(-0.5175 * lx))
    var_b2 = _cos_c(39.89 * xx_neg_1_2) * jnp.exp(-70.16 * jnp.exp(-0.6 * lx))
    var_c2 = 0.011 * jnp.exp(-1.69 * xx_neg_1_2)
    var_d2 = 0.003135 * jnp.exp((4.0 / 3.0) * lx)
    # 0.5 (1 + tanh(10 ln(0.6648 xx^-1/2))) = u^20/(1 + u^20)
    lu20 = jnp.clip(20.0 * (math.log(0.6648) - 0.5 * lx), -60.0, 60.0)
    u20 = jnp.exp(lu20)
    var_e2 = u20 / (1.0 + u20)
    f_0 = var_a2 - var_b2 - var_c2
    f_m = f_0 + (var_c2 - var_d2) * var_e2

    inv_theta = jnp.maximum(1.0 / theta_f, 1e-15)
    kk_0s, kk_1s, kk_2s = _bessel_k012_scaled(inv_theta)
    delta_jj_5 = 0.4379 * _log1p_c(1.3414 * jnp.exp(-0.7515 * lx))
    factor_q = f_m * (kk_1s / kk_2s + 6.0 * theta_e)
    log_de = jnp.log(jnp.maximum(delta_jj_5, 1e-30)) + inv_theta
    log_k0s = jnp.log(kk_0s)
    ok_v = log_de <= log_k0s
    de = jnp.exp(jnp.minimum(log_de, log_k0s))
    factor_v = jnp.where(ok_v, (kk_0s - de) / kk_2s, 1.0)
    cold = theta_e < THETA_E_ZERO
    rho_q = coefficient_q * jnp.where(cold, 0.0, factor_q)
    rho_v = coefficient_v * jnp.where(cold, 1.0, factor_v)
    return j_i, j_q, j_v, alpha_i, alpha_q, alpha_v, rho_q, rho_v, neg


# ---------------------------------------------------------------------------
# Kernel factory


def _make_kernel(params: geo.GeodesicParams, sp: SimKernelParams, kg_meta,
                 nus, mass_msun, camera_x, log_j_scale, integrator="rk4",
                 window=WINDOW_P, brick=BRICK_P, margin=MARGIN_P,
                 interpret=False, rows=ROWS_P, rotation_split=False):
    """Build the two-sweep polarized kernel closure."""
    if integrator not in ("rk4", "rk2"):
        raise ValueError("polarized kernel supports rk4/rk2 only")
    n_i, n_j, n_k, n_i_pad, nvar, ind, bounds = kg_meta
    spin, mass, flat = params.bh_a, params.bh_m, params.ray_flat
    x_unit = Physics.gg_msun * mass_msun / (Physics.c * Physics.c)
    nus = tuple(float(v) for v in nus)
    nf = len(nus)
    nu0 = nus[0]
    max_steps = params.ray_max_steps
    cam = tuple(float(v) for v in np.asarray(camera_x))
    _d = cam[1] * cam[1] + cam[2] * cam[2] + cam[3] * cam[3] - spin * spin
    r_cam = float(np.float32(math.sqrt(
        0.5 * (_d + math.hypot(_d, 2.0 * spin * cam[3])))))
    bk, bj = brick
    mk, mj = margin
    n_chunks = n_i_pad // 128
    n_windows = -(-max_steps // window)
    r_lo, r_hi, th_lo, th_hi, ph_lo, ph_hi = bounds
    shape = (rows, LANES)
    names = ["rho", "pgas", "uu1", "uu2", "uu3", "bb1", "bb2", "bb3"]
    var_of = {nm: int(ind[nm]) for nm in names}
    n_sym = len(_SYM)
    n_ant = len(_ANT)

    def rhs(x0, x1, x2, x3, p0, p1, p2, p3):
        return geodesic_rhs_c(x1, x2, x3, p0, p1, p2, p3, spin, mass,
                              flat=flat, with_distance=False)

    def kernel(x0r, x1r, x2r, x3r, p0r, p1r, p2r, p3r, momr,
               x1f_r, x1v_r, x2f_r, x2v_r, x3f_r, x3v_r, tab_hbm,
               *out_and_scratch):
        nn_outs = out_and_scratch[:16 * nf]
        flag_out, nsamp_out, ovf_out, bad_out = \
            out_and_scratch[16 * nf:16 * nf + 4]
        brick_scr, acc_scr, carry_f, carry_i, sem = \
            out_and_scratch[16 * nf + 4:]

        x0, x1, x2, x3 = x0r[:], x1r[:], x2r[:], x3r[:]
        p0 = p0r[:]
        p1, p2, p3 = p1r[:], p2r[:], p3r[:]
        mom = momr[:]
        f32 = x0.dtype
        zero = jnp.zeros(shape, f32)
        i_false = jnp.zeros(shape, jnp.int32)

        alive0 = (x1 != 1.0e3).astype(jnp.int32)
        r0 = _radius_c(x1, x2, x3, spin)

        def off_grid_of(r, th, ph):
            return ((r < r_lo) | (r > r_hi) | (th < th_lo) | (th > th_hi)
                    | (ph < ph_lo) | (ph > ph_hi))

        # ------------------------------------------------------------------
        # Shared single-step integrator (ops/geodesic._make_rk_body
        # semantics, identical to the unpolarized kernel's rk_step minus
        # sampling). Returns (new_state, sample) where sample =
        # (pos4, kcov3 renormalized midpoint momentum, r_mid, h, valid).
        def rk_step(s, n_abs):
            sx0, sx1, sx2, sx3 = s["x0"], s["x1"], s["x2"], s["x3"]
            sp1, sp2, sp3 = s["p1"], s["p2"], s["p3"]
            live = n_abs < max_steps
            s_alive = (s["alive"] > 0) & live
            s_trunc = s["trunc"] > 0
            s_flag = s["flag"] > 0
            r = s["r"]
            h = jnp.where(s_alive,
                          -params.ray_step * (r - params.r_horizon), 0.0)

            comps = (sx0, sx1, sx2, sx3, sp1, sp2, sp3)

            def at(base, k, w):
                return [base[ci] + (w * h) * k[ci] for ci in range(7)]

            k1 = rhs(sx0, sx1, sx2, sx3, p0, sp1, sp2, sp3)
            if integrator == "rk4":
                y2 = at(comps, k1, 0.5)
                k2 = rhs(y2[0], y2[1], y2[2], y2[3], p0, y2[4], y2[5], y2[6])
                y3 = at(comps, k2, 0.5)
                k3 = rhs(y3[0], y3[1], y3[2], y3[3], p0, y3[4], y3[5], y3[6])
                y4 = at(comps, k3, 1.0)
                k4 = rhs(y4[0], y4[1], y4[2], y4[3], p0, y4[4], y4[5], y4[6])
                y_end = [comps[ci] + h * (k1[ci] / 6.0 + k2[ci] / 3.0
                                          + k3[ci] / 3.0 + k4[ci] / 6.0)
                         for ci in range(7)]
                y_mid = [0.5 * (comps[ci] + y_end[ci]) for ci in range(7)]
            else:  # rk2 (Heun)
                yf = at(comps, k1, 1.0)
                k2 = rhs(yf[0], yf[1], yf[2], yf[3], p0, yf[4], yf[5], yf[6])
                y_end = [comps[ci] + 0.5 * h * (k1[ci] + k2[ci])
                         for ci in range(7)]
                y_mid = at(comps, k1, 0.5)

            fac = renormalize_factor_c(y_end[1], y_end[2], y_end[3], p0,
                                       y_end[4], y_end[5], y_end[6],
                                       spin, mass, flat=flat)
            e1, e2, e3 = y_end[4] * fac, y_end[5] * fac, y_end[6] * fac
            r_new = _radius_c(y_end[1], y_end[2], y_end[3], spin)
            facm = renormalize_factor_c(y_mid[1], y_mid[2], y_mid[3], p0,
                                        y_mid[4], y_mid[5], y_mid[6],
                                        spin, mass, flat=flat)
            m1, m2, m3 = y_mid[4] * facm, y_mid[5] * facm, y_mid[6] * facm
            r_mid = _radius_c(y_mid[1], y_mid[2], y_mid[3], spin)

            have_prev = s["n_samp"] > 0
            trunc_now = have_prev & (
                ((r_mid > params.camera_r) & (r_mid > s["r_mid_prev"]))
                | (r_mid < params.r_terminate))
            trunc = s_trunc | (s_alive & trunc_now)
            valid = s_alive & ~trunc

            terminate = ((r_new > params.camera_r) & (r_new > r)) \
                | (r_new < params.r_terminate)
            is_last = n_abs == max_steps - 1
            flag = s_flag | (s_alive & ~terminate & is_last)
            alive = (s["alive"] > 0) & ~(s_alive & terminate)

            park = ~alive
            upd = s_alive

            def sel(pv, nv, ov):
                return jnp.where(park, pv, jnp.where(upd, nv, ov))

            new_s = dict(
                x0=sel(0.0, y_end[0], sx0), x1=sel(1.0e3, y_end[1], sx1),
                x2=sel(0.0, y_end[2], sx2), x3=sel(0.0, y_end[3], sx3),
                p1=sel(1.0, e1, sp1), p2=sel(0.0, e2, sp2),
                p3=sel(0.0, e3, sp3),
                r=sel(1.0e3, r_new, r),
                alive=alive.astype(jnp.int32),
                trunc=((live & trunc)
                       | (jnp.logical_not(live) & s_trunc))
                .astype(jnp.int32),
                flag=flag.astype(jnp.int32),
                r_mid_prev=jnp.where(valid, r_mid, s["r_mid_prev"]),
                n_samp=s["n_samp"] + valid.astype(jnp.int32),
            )
            sample = (y_mid[0], y_mid[1], y_mid[2], y_mid[3],
                      m1, m2, m3, r_mid, h, valid)
            return new_s, sample

        # ------------------------------------------------------------------
        # Sweep A: forward integration, storing window-boundary carries.
        def pack_state(s, w):
            fvals = (s["x0"], s["x1"], s["x2"], s["x3"],
                     s["p1"], s["p2"], s["p3"], s["r_mid_prev"])
            for si, v in enumerate(fvals):
                carry_f[w, si] = v
            masks = (s["alive"] + 2 * s["trunc"] + 4 * s["flag"])
            carry_i[w, 0] = masks
            carry_i[w, 1] = s["n_samp"]

        def unpack_state(w):
            f_ = [carry_f[w, si] for si in range(8)]
            masks = carry_i[w, 0]
            n_samp = carry_i[w, 1]
            s = dict(x0=f_[0], x1=f_[1], x2=f_[2], x3=f_[3],
                     p1=f_[4], p2=f_[5], p3=f_[6], r_mid_prev=f_[7],
                     r=_radius_c(f_[1], f_[2], f_[3], spin),
                     alive=masks & 1, trunc=(masks >> 1) & 1,
                     flag=(masks >> 2) & 1, n_samp=n_samp)
            return s

        state0 = dict(
            x0=x0, x1=jnp.where(alive0 > 0, x1, 1.0e3), x2=x2, x3=x3,
            p1=p1, p2=p2, p3=p3, r=r0,
            alive=alive0, trunc=i_false, flag=i_false,
            r_mid_prev=zero, n_samp=jnp.zeros(shape, jnp.int32))

        def cond_a(carry):
            w, s = carry
            return (w < n_windows) & jnp.any(s["alive"] > 0)

        def body_a(carry):
            w, s = carry
            pack_state(s, w)
            base = w * window
            for t in range(window):
                s, _ = rk_step(s, base + t)
            return (w + 1, s)

        w_used, s_final = jax.lax.while_loop(
            cond_a, body_a, (jnp.zeros((), jnp.int32), state0))

        # ------------------------------------------------------------------
        # Sweep B: reverse windows, full polarized update per sample.
        def sample_prims(mx1, mx2, mx3, r_mid, valid, origins):
            """Brick sampling at one replayed sample: locate + predicated
            corner gathers -> (named prims dict, r, th, off_grid, ovf_acc).
            Shares _gather_corners/_locate_axis with the unpolarized
            kernel."""
            k0v, j0v = origins
            sx1 = jnp.where(valid, mx1, cam[1])
            sx2 = jnp.where(valid, mx2, cam[2])
            sx3 = jnp.where(valid, mx3, cam[3])
            r_pre = jnp.where(valid, r_mid, r_cam)
            r, th, ph = _cks_to_sks_c(sx1, sx2, sx3, spin, r_pre)
            off_grid = off_grid_of(r, th, ph)
            use = valid & ~off_grid

            _, im_i, f_i = _locate_axis(r, x1f_r, x1v_r, n_i, shape)
            _, im_j, f_j = _locate_axis(th, x2f_r, x2v_r, n_j, shape)
            _, km, f_k = _locate_axis(ph, x3f_r, x3v_r, n_k, shape)
            im_i = jnp.clip(im_i, 0, n_i - 2)
            im_j = jnp.clip(im_j, 0, n_j - 2)
            km = jnp.clip(km, 0, n_k - 2)
            rel_j = im_j - j0v
            rel_k = km - k0v
            rel_k = rel_k + jnp.where(rel_k < 0, n_k, 0)
            oob = ((rel_j < 0) | (rel_j > bj - 2)
                   | (rel_k < 0) | (rel_k > bk - 2))
            ovf_acc = (use & oob).astype(jnp.int32)
            rel_j = jnp.clip(rel_j, 0, bj - 2)
            rel_k = jnp.clip(rel_k, 0, bk - 2)

            w_i1, w_i0 = f_i, 1.0 - f_i
            w_j1, w_j0 = f_j, 1.0 - f_j
            w_k1, w_k0 = f_k, 1.0 - f_k
            cw0 = {(0, 0): w_k0 * w_j0 * w_i0, (0, 1): w_k0 * w_j1 * w_i0,
                   (1, 0): w_k1 * w_j0 * w_i0, (1, 1): w_k1 * w_j1 * w_i0}
            cw1 = {(0, 0): w_k0 * w_j0 * w_i1, (0, 1): w_k0 * w_j1 * w_i1,
                   (1, 0): w_k1 * w_j0 * w_i1, (1, 1): w_k1 * w_j1 * w_i1}
            named = _gather_corners(
                brick_scr, acc_scr, names, var_of, nvar, bk, bj, n_chunks,
                rows, use, oob, rel_k, rel_j, im_i, im_i + 1, cw0, cw1,
                shape)
            fb = {"rho": sp.fallback_rho, "pgas": sp.fallback_pgas,
                  "uu1": 0.0, "uu2": 0.0, "uu3": 0.0,
                  "bb1": 0.0, "bb2": 0.0, "bb3": 0.0}
            for nm in names:
                named[nm] = jnp.where(off_grid, fb[nm], named[nm])
            return named, r, th, (sx1, sx2, sx3), off_grid, ovf_acc

        def transfer_update(tr, sample, origins):
            """One polarized sample update (transfer/polarized.py body,
            componentwise)."""
            mx0, mx1, mx2, mx3, m1, m2, m3, r_mid, h, valid = sample
            active = valid
            started = tr["started"] > 0
            first = active & ~started
            dl_cur = -h
            kcov = (p0, m1, m2, m3)

            named, r, th, sxyz, off_grid, ovf_acc = sample_prims(
                mx1, mx2, mx3, r_mid, valid, origins)
            sx1, sx2, sx3 = sxyz
            keep_geo = _geometric_keep_c(sx1, sx2, sx3, r, th, sp, cam)
            # The reference's sampler never assigns values at geometrically
            # cut samples, leaving ZEROS that the polarized tetrad still
            # consumes (simulation_sampling.cpp:692-693); mirror the XLA
            # coeff_fn's zeroing.
            named_z = {nm: jnp.where(keep_geo, v, 0.0)
                       for nm, v in named.items()}
            nan_mask = off_grid if sp.fallback_nan \
                else jnp.zeros(shape, bool)

            st = _fluid_state_c(sx1, sx2, sx3, r, spin, named_z, sp)
            keep_val = _value_keep_c(st, sp)
            b_zero = ((named_z["bb1"] == 0.0) & (named_z["bb2"] == 0.0)
                      & (named_z["bb3"] == 0.0))
            keep = keep_geo & ~b_zero
            if keep_val is not None:
                keep = keep & keep_val
            sin_b, cos_b, sin2_b, u_dot_k = _pitch_angle_full_c(
                st, p0, m1, m2, m3)
            coeff_bad0 = nan_mask & keep_geo

            # Transport matrices from the rank-1 closed forms; the averaged
            # first-half matrix expands by bilinearity (transfer/
            # polarized.py body).
            kcon = _kcon_of(sx1, sx2, sx3, kcov)
            kcon_pv = tr["kcon_pv"]
            kcon_old = tuple(
                jnp.where(first, kcon[m], 0.5 * (kcon_pv[m] + kcon[m]))
                for m in range(4))
            derivs_cur = ks_derivatives_c(sx1, sx2, sx3, spin, mass)
            a_cur_k = transport_matrix_c(
                sx1, sx2, sx3, kcon[0], kcon[1], kcon[2], kcon[3],
                spin, mass, flat=flat, derivs=derivs_cur)
            a_cur_kprev = transport_matrix_c(
                sx1, sx2, sx3, kcon_pv[0], kcon_pv[1], kcon_pv[2],
                kcon_pv[3], spin, mass, flat=flat, derivs=derivs_cur)
            pos_pv = tr["pos_pv"]
            a_prev_kold = transport_matrix_c(
                pos_pv[1], pos_pv[2], pos_pv[3], kcon_old[0], kcon_old[1],
                kcon_old[2], kcon_old[3], spin, mass, flat=flat)
            a_half = [[jnp.where(first, a_cur_k[m][bb],
                                 0.5 * a_prev_kold[m][bb]
                                 + 0.25 * a_cur_kprev[m][bb]
                                 + 0.25 * a_cur_k[m][bb])
                       for bb in range(4)] for m in range(4)]

            dl_pv = tr["dl_pv"]
            dl_local2 = 0.25 * (dl_pv + dl_cur)
            dl_local = 0.5 * (jnp.where(first, 0.0, dl_pv) + dl_cur)

            # Fluid tetrad rows (scalarized rank-1 form)
            _, f_ks, l_ks, _, _ = derivs_cur
            ucon = st["u"]
            bcon = st["b"]
            upcon = tuple(
                jnp.where(b_zero, 1.0 if m == 3 else 0.0, bcon[m])
                for m in range(4))
            t1c, t2c, e1_cov, e2_cov = tetrad_rows_c(
                ucon, kcon, kcov, upcon, f_ks, l_ks)

            bad_bits = tr["bad"]
            ovf_new = tr["ovf"] | ovf_acc
            a_prev = tr["a_prev"]
            for fi, nu in enumerate(nus):
                nu_cgs = -u_dot_k * nu * mom
                (j_i, j_q, j_v, al_i, al_q, al_v, rho_q, rho_v,
                 neg) = _thermal_polarized_c(nu_cgs, nu0, st, sin_b, cos_b,
                                             sin2_b, sp)
                coeffs = [j_i, j_q, j_v, al_i, al_q, al_v, rho_q, rho_v]
                coeffs = [jnp.where(keep, c, 0.0) for c in coeffs]
                nfin = jnp.zeros(shape, bool)
                for c in coeffs:
                    nfin = nfin | ~jnp.isfinite(c)
                cbad = coeff_bad0 | nfin | (neg & keep)
                coeffs = [jnp.where(cbad, 0.0, c) for c in coeffs]
                j_i, j_q, j_v, al_i, al_q, al_v, rho_q, rho_v = coeffs
                bad_bits = bad_bits | jnp.where(
                    active & cbad, jnp.int32(1 << fi), 0)

                re_old = tr[f"re{fi}"]
                im_old = tr[f"im{fi}"]
                # Deferred second-half transport of the PREVIOUS sample,
                # then the averaged first half (polarized.cpp:174-192,
                # 815-833)
                nn_sec_re, nn_sec_im = _transport_c(
                    a_prev, re_old, im_old, re_old, im_old, dl_local2)
                nn_half_re, nn_half_im = _transport_c(
                    a_half, nn_sec_re, nn_sec_im, re_old, im_old, dl_local)

                ss_i, ss_q, ss_u, ss_v = _stokes_from_n(
                    e1_cov, e2_cov, nn_half_re, nn_half_im)
                dl_cgs = dl_cur * (x_unit / nu) / mom
                ss_end = couple_matter_c(
                    ss_i, ss_q, ss_u, ss_v, j_i, j_q, j_v,
                    al_i, al_q, al_v, rho_q, rho_v, dl_cgs,
                    rotation_split, pm=_PALLAS_PM)
                nn_post_re, nn_post_im = _n_from_stokes(t1c, t2c, *ss_end)
                tr[f"re{fi}"] = tuple(
                    jnp.where(active, n, o)
                    for n, o in zip(nn_post_re, re_old))
                tr[f"im{fi}"] = tuple(
                    jnp.where(active, n, o)
                    for n, o in zip(nn_post_im, im_old))

            tr["a_prev"] = tuple(
                tuple(jnp.where(active, a_cur_k[m][bb], a_prev[m][bb])
                      for bb in range(4)) for m in range(4))
            tr["kcon_pv"] = tuple(
                jnp.where(active, kcon[m], kcon_pv[m]) for m in range(4))
            tr["pos_pv"] = tuple(
                jnp.where(active, v, o)
                for v, o in zip((mx0, sx1, sx2, sx3), tr["pos_pv"]))
            tr["dl_pv"] = jnp.where(active, dl_cur, dl_pv)
            tr["started"] = tr["started"] | active.astype(jnp.int32)
            tr["bad"] = bad_bits
            tr["ovf"] = ovf_new
            return tr

        def _kcon_of(sx1, sx2, sx3, kcov):
            """g^{munu} k_nu via the rank-1 Kerr-Schild structure
            (transfer/polarized._kcon_scalar, componentwise)."""
            kt, k1_, k2_, k3_ = kcov
            if flat:
                return (-kt, k1_, k2_, k3_)
            a2 = spin * spin
            rr2 = sx1 * sx1 + sx2 * sx2 + sx3 * sx3
            r2 = 0.5 * (rr2 - a2 + jnp.hypot(rr2 - a2, 2.0 * spin * sx3))
            r = jnp.sqrt(r2)
            f = 2.0 * mass * r2 * r / (r2 * r2 + a2 * sx3 * sx3)
            denom = r2 + a2
            l1 = (r * sx1 + spin * sx2) / denom
            l2 = (r * sx2 - spin * sx1) / denom
            l3 = sx3 / r
            lp = -kt + l1 * k1_ + l2 * k2_ + l3 * k3_
            flp = f * lp
            return (-kt + flp, k1_ - flp * l1, k2_ - flp * l2,
                    k3_ - flp * l3)

        zero4 = (zero, zero, zero, zero)
        tr0 = dict(
            started=i_false, bad=i_false, ovf=i_false,
            pos_pv=(x0, x1, x2, x3), dl_pv=zero,
            kcon_pv=zero4,
            a_prev=tuple(tuple(zero for _ in range(4)) for _ in range(4)))
        for fi in range(nf):
            tr0[f"re{fi}"] = tuple(zero for _ in range(n_sym))
            tr0[f"im{fi}"] = tuple(zero for _ in range(n_ant))

        def cond_b(carry):
            w, _ = carry
            return w >= 0

        def body_b(carry):
            w, tr = carry
            s = unpack_state(w)
            candid = (s["alive"] > 0) & (tr["ovf"] == 0)
            origins = _window_setup_impl(
                s["x1"], s["x2"], s["x3"], s["r"], candid, spin,
                x2f_r, x2v_r, x3f_r, x3v_r, n_j, n_k, bk, bj, mk, mj,
                rows, shape, off_grid_of, tab_hbm, brick_scr, sem,
                interpret)
            base = w * window
            samples = []
            for t in range(window):
                s, smp = rk_step(s, base + t)
                samples.append(smp)
            for t in reversed(range(window)):
                tr = transfer_update(tr, samples[t], origins)
            return (w - 1, tr)

        _, tr = jax.lax.while_loop(cond_b, body_b, (w_used - 1, tr0))

        # Final deferred second-half transport at the camera end
        # (polarized.cpp:121-124: the nearest sample's delta_lambda_new is
        # its own step, dl = 0.25 (dl_pv + dl_pv)).
        for fi in range(nf):
            fin_re, fin_im = _transport_c(
                tr["a_prev"], tr[f"re{fi}"], tr[f"im{fi}"],
                tr[f"re{fi}"], tr[f"im{fi}"], 0.5 * tr["dl_pv"])
            for si in range(n_sym):
                nn_outs[fi * 16 + si][:] = fin_re[si]
            for ai in range(n_ant):
                nn_outs[fi * 16 + n_sym + ai][:] = fin_im[ai]
        flag_out[:] = s_final["flag"]
        nsamp_out[:] = s_final["n_samp"]
        ovf_out[:] = tr["ovf"]
        bad_out[:] = tr["bad"]

    return kernel


def render_polarized(positions, directions, momentum_factors, frequencies,
                     params: geo.GeodesicParams, sp: SimKernelParams,
                     kg: KernelGrid, mass_msun: float, camera_x,
                     log_j_scale: float, integrator: str = "rk4",
                     window: int = WINDOW_P, brick=BRICK_P,
                     margin=MARGIN_P,
                     interpret: bool = False, rows: int = ROWS_P,
                     rotation_split: bool = False):
    """Fused Pallas polarized render of a ray bundle.

    Returns (nn_re (B, F, 10), nn_im (B, F, 6), flags (B,) bool,
    n_samples (B,), overflow (B,) bool, bad (B, F) bool). The caller
    applies transfer/polarized.camera_stokes to turn the coherency
    components into camera-frame I/Q/U/V (and NaN-poisons flagged/bad
    pixels). overflow=True rays must be re-rendered on the XLA path.
    """
    scalar_freq = np.ndim(frequencies) == 0
    nus = ([float(frequencies)] if scalar_freq
           else [float(v) for v in np.asarray(frequencies)])
    nf = len(nus)
    b = positions.shape[0]
    block = rows * LANES
    n_pad = (-b) % block
    dtype = jnp.float32

    def prep(a, pad_row):
        a = jnp.asarray(a, dtype)
        if n_pad:
            padding = jnp.broadcast_to(jnp.asarray(pad_row, dtype),
                                       (n_pad,) + a.shape[1:])
            a = jnp.concatenate([a, padding], axis=0)
        return a

    pos = prep(positions, [0.0, 1.0e3, 0.0, 0.0])
    dirs = prep(directions, [-1.0, -1.0, 0.0, 0.0])
    mom = prep(momentum_factors, 1.0)
    n_blocks = (b + n_pad) // block

    cols = [pos[:, 0], pos[:, 1], pos[:, 2], pos[:, 3],
            dirs[:, 0], dirs[:, 1], dirs[:, 2], dirs[:, 3], mom]
    cols = [c.reshape(n_blocks * rows, LANES) for c in cols]

    kg_meta = (kg.n_i, kg.n_j, kg.n_k, kg.n_i_pad, kg.nvar, kg.ind,
               kg.bounds)
    kernel = _make_kernel(params, sp, kg_meta, nus, mass_msun,
                          np.asarray(camera_x, np.float64), log_j_scale,
                          integrator=integrator, window=window, brick=brick,
                          margin=margin, interpret=interpret, rows=rows,
                          rotation_split=rotation_split)

    bk, bj = brick
    n_windows = -(-params.ray_max_steps // window)
    ray_spec = pl.BlockSpec((rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [ray_spec] * 9 + [row_spec] * 6 \
        + [pl.BlockSpec(memory_space=pltpu.ANY)]
    out_shape = (
        [jax.ShapeDtypeStruct((n_blocks * rows, LANES), dtype)] * (16 * nf)
        + [jax.ShapeDtypeStruct((n_blocks * rows, LANES), jnp.int32)] * 4)
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=[ray_spec] * (16 * nf + 4),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((rows, kg.nvar, bk, bj, kg.n_i_pad), jnp.float32),
            pltpu.VMEM((kg.nvar + 2, rows, LANES), jnp.float32),
            pltpu.VMEM((n_windows, 8, rows, LANES), jnp.float32),
            pltpu.VMEM((n_windows, 2, rows, LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((rows,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*cols, kg.x1f, kg.x1v, kg.x2f, kg.x2v, kg.x3f, kg.x3v, kg.table)

    def unblock(o):
        return o.reshape(-1)[:b]

    nn_re = jnp.stack(
        [jnp.stack([unblock(outs[fi * 16 + si]) for si in range(10)],
                   axis=-1) for fi in range(nf)], axis=1)
    nn_im = jnp.stack(
        [jnp.stack([unblock(outs[fi * 16 + 10 + ai]) for ai in range(6)],
                   axis=-1) for fi in range(nf)], axis=1)
    flags = unblock(outs[16 * nf]).astype(bool)
    nsamp = unblock(outs[16 * nf + 1])
    ovf = unblock(outs[16 * nf + 2]).astype(bool)
    bad_bits = unblock(outs[16 * nf + 3])
    bad = jnp.stack([(bad_bits >> fi) & 1 for fi in range(nf)],
                    axis=-1).astype(bool)
    return nn_re, nn_im, flags, nsamp, ovf, bad
