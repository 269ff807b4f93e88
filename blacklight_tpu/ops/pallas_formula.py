"""Pallas TPU kernel: fused Dormand-Prince geodesics + formula-model
unpolarized radiative transfer.

The XLA-scan path (ops/geodesic.py + transfer/unpolarized.py) re-reads and
re-writes the per-ray carry from HBM every step and pays the loop overhead
per iteration across the whole dispatch. This kernel keeps a block of rays
entirely in VMEM for the full integration: grid over ray blocks of
(ROWS, 128) rays, one in-kernel while_loop per block stepping until every
ray in the block is dead (ray lengths correlate with image position, so
spatially ordered blocks exit early), all math componentwise on (ROWS, 128)
tiles on the VPU.

Semantics match the scan path (same DP error control, termination,
truncation, null renormalization, invariant-transfer update, NaN-poisoning
via masks); `render_formula_dp` is verified against integrate_unpolarized
in tests (interpret mode on CPU, compiled on TPU).

Scope: dp/rk4/rk2 integrators, formula model, image_light, one or many
frequencies. Other configurations use the scan path.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blacklight_tpu.constants import Physics
from blacklight_tpu.ops import geodesic as geo
from blacklight_tpu.ops.geometry import (
    geodesic_rhs_c,
    renormalize_factor_c,
)

ROWS = 32            # rays per block = ROWS * 128 (a 64x64 image tile)
LANES = 128
DELTA_TAU_MAX = 100.0


def _expm1(x):
    """expm1 via series for small |x| (Pallas TPU has no expm1 primitive);
    relative error O(x^3/24) < 1e-7 at the 2e-2 switch point."""
    small = jnp.abs(x) < 2e-2
    series = x * (1.0 + x * (0.5 + x * (1.0 / 6.0)))
    return jnp.where(small, series, jnp.exp(jnp.where(small, 0.0, x)) - 1.0)


def _radius_c(x1, x2, x3, spin):
    a2 = spin * spin
    rr2 = x1 * x1 + x2 * x2 + x3 * x3
    r2 = 0.5 * (rr2 - a2 + jnp.hypot(rr2 - a2, 2.0 * spin * x3))
    return jnp.sqrt(r2)


def _formula_coeffs_c(x0, x1, x2, x3, k0, k1, k2, k3, mom, nu, fp, camera_x):
    """Componentwise formula-model invariant j (scaled) and alpha at one
    frequency (models/formula.py semantics; bad -> finite placeholder +
    mask)."""
    keep, bad, n_n0, u_dot_k, _, _ = _formula_geom_c(
        x0, x1, x2, x3, k0, k1, k2, k3, fp, camera_x)
    return _formula_jalpha_c(keep, bad, n_n0, u_dot_k, mom, nu, fp)


def _formula_geom_c(x0, x1, x2, x3, k0, k1, k2, k3, fp, camera_x,
                    r0=None, h=None):
    """Frequency-independent part of the formula coefficients: spatial
    cuts, disk 4-velocity, Gaussian density profile, u.k (models/formula.py
    re-derivation of formula_coefficients.cpp:74-162). r0/h override the
    static fp values with runtime (traced) ones for the differentiable
    kernel. Also returns (r, cos theta) for the density-profile tangent
    weights."""
    bh_a = fp.bh_a
    r = _radius_c(x1, x2, x3, bh_a)

    keep = r <= fp.camera_r
    if fp.cut_omit_near or fp.cut_omit_far:
        dot = x1 * camera_x[1] + x2 * camera_x[2] + x3 * camera_x[3]
        if fp.cut_omit_near:
            keep &= ~(dot > 0.0)
        if fp.cut_omit_far:
            keep &= ~(dot < 0.0)
    if fp.cut_omit_in >= 0.0:
        keep &= ~(r < fp.cut_omit_in)
    if fp.cut_omit_out >= 0.0:
        keep &= ~(r > fp.cut_omit_out)
    if fp.cut_midplane_theta != 0.0:
        th = jnp.arccos(x3 / r)
        off = jnp.abs(th - jnp.pi / 2.0)
        if fp.cut_midplane_theta > 0.0:
            keep &= ~(off > fp.cut_midplane_theta)
        else:
            keep &= ~(off < -fp.cut_midplane_theta)
    if fp.cut_midplane_z != 0.0:
        if fp.cut_midplane_z > 0.0:
            keep &= ~(jnp.abs(x3) > fp.cut_midplane_z)
        else:
            keep &= ~(jnp.abs(x3) < -fp.cut_midplane_z)
    if fp.cut_plane:
        ox, oy, oz = fp.cut_plane_origin
        nx, ny, nz = fp.cut_plane_normal
        keep &= ~((x1 - ox) * nx + (x2 - oy) * ny + (x3 - oz) * nz < 0.0)

    rr = jnp.sqrt(jnp.maximum(r * r - x3 * x3, 1e-30))
    cth = x3 / r
    sth = jnp.sqrt(jnp.maximum(1.0 - cth * cth, 0.0))
    # sin/cos of ph = atan2(x2, x1) - atan(a/r) in closed form (no atan2,
    # which Pallas TPU cannot lower): with rho = sqrt(x1^2 + x2^2) and
    # s = sqrt(r^2 + a^2), cos A = x1/rho, sin A = x2/rho, cos B = r/s,
    # sin B = a/s
    rho_s = jnp.sqrt(jnp.maximum(x1 * x1 + x2 * x2, 1e-30)) \
        * jnp.sqrt(r * r + bh_a * bh_a)
    cph = (x1 * r + x2 * bh_a) / rho_s
    sph = (x2 * r - x1 * bh_a) / rho_s

    delta = r * r - 2.0 * fp.bh_m * r + bh_a * bh_a
    gtt_bl = -(1.0 + 2.0 * fp.bh_m * r * (r * r + bh_a * bh_a)
               / (delta * (r * r + bh_a * bh_a * cth * cth)))
    sigma = r * r + bh_a * bh_a * cth * cth
    gtph_bl = -2.0 * fp.bh_m * bh_a * r / (delta * sigma)
    gphph_bl = (sigma - 2.0 * fp.bh_m * r) / (delta * sigma * sth * sth)

    ll = fp.l0 / (1.0 + rr) * jnp.power(rr, 1.0 + fp.q)
    u_arg = -gtt_bl + 2.0 * gtph_bl * ll - gphph_bl * ll * ll
    bad = ~(u_arg > 0.0)
    u_norm = 1.0 / jnp.sqrt(jnp.where(u_arg > 0.0, u_arg, 1.0))
    u_t_bl = -u_norm
    u_ph_bl = u_norm * ll
    ut_bl = gtt_bl * u_t_bl + gtph_bl * u_ph_bl
    uph_bl = gtph_bl * u_t_bl + gphph_bl * u_ph_bl
    u0 = ut_bl
    u1 = sth * (-r * sph - bh_a * cph) * uph_bl
    u2 = sth * (r * cph - bh_a * sph) * uph_bl
    u3 = jnp.zeros_like(u0)

    r0_v = fp.r0 if r0 is None else r0
    h_v = fp.h if h is None else h
    n_n0 = jnp.exp(-0.5 * (r * r / (r0_v * r0_v)
                           + h_v * h_v * cth * cth))
    u_dot_k = u0 * k0 + u1 * k1 + u2 * k2 + u3 * k3
    return keep, bad, n_n0, u_dot_k, r, cth


def _formula_jalpha_c(keep, bad, n_n0, u_dot_k, mom, nu, fp, cn0=None,
                      with_unit=False):
    """Per-frequency invariant j (scaled) and alpha from the shared
    geometry (formula_coefficients.cpp:164-179). cn0 overrides fp.cn0
    with a runtime (traced) value for the differentiable kernel;
    with_unit additionally returns alpha_unit = d alpha / d cn0 (alpha is
    linear in cn0), keep-masked like alpha."""
    nu_fluid = -u_dot_k * nu * mom
    x_raw = nu_fluid / fp.nup

    ej = -fp.alpha - 2.0
    ea = -fp.beta - fp.alpha
    xs = jnp.where(x_raw > 0.0, x_raw, 1.0)
    xn = jnp.where(x_raw < 0.0, -x_raw, 1.0)
    # pow for possibly-negative base with C++ semantics (_cpp_pow)
    if float(ej).is_integer():
        sj = -1.0 if int(ej) % 2 else 1.0
        pj = jnp.where(x_raw > 0.0, jnp.power(xs, ej),
                       jnp.where(x_raw < 0.0, sj * jnp.power(xn, ej), 0.0))
    else:
        pj = jnp.where(x_raw > 0.0, jnp.power(xs, ej), 0.0)
        bad = bad | (x_raw < 0.0)
    if float(ea).is_integer():
        sa = -1.0 if int(ea) % 2 else 1.0
        pa = jnp.where(x_raw > 0.0, jnp.power(xs, ea),
                       jnp.where(x_raw < 0.0, sa * jnp.power(xn, ea), 0.0))
    else:
        # NaN alpha routes to the j-only branch like alpha = 0
        pa = jnp.where(x_raw > 0.0, jnp.power(xs, ea), 0.0)

    j = n_n0 * pj
    cn0_v = fp.cn0 if cn0 is None else cn0
    alpha_unit = fp.a_param * n_n0 * pa * nu_fluid
    alpha = cn0_v * alpha_unit
    keepf = keep
    out = (jnp.where(keepf, j, 0.0), jnp.where(keepf, alpha, 0.0),
           bad & keepf)
    if with_unit:
        return out + (jnp.where(keepf, alpha_unit, 0.0),)
    return out


_DIFFABLE_PARAMS = ("cn0", "r0", "h")


def _make_kernel(params: geo.GeodesicParams, fp, nus, mass_msun: float,
                 camera_x, log_j_scale: float, integrator: str = "dp",
                 diff_params: tuple = ()):
    """Kernel factory: fused geodesics + RT for `integrator` in
    {"dp", "rk4", "rk2"} at one or more frequencies (nus: tuple of floats). The
    geometry/velocity part of the coefficients is shared across
    frequencies; each frequency adds only its power laws and an (I, tau)
    tile pair to the carry.

    diff_params: subset of _DIFFABLE_PARAMS, in order. The named emission
    parameters become one runtime SMEM vector (first input ref, one value
    per name) and the kernel carries forward-mode tangent accumulators
    (dI/dp, dtau/dp per parameter per frequency), emitting per-ray dI/dp
    outputs after the I outputs (parameter-major). The ray trajectory is
    independent of all plasma parameters, so the tangents ride along at a
    few extra VPU ops per step instead of a reverse pass over the whole
    integration. Tangent weights: alpha is linear in cn0; j and alpha both
    scale with the Gaussian density profile, whose log-derivatives wrt
    r0 / h are r^2/r0^3 and -h cos^2(theta)."""
    spin, mass, flat = params.bh_a, params.bh_m, params.ray_flat
    x_unit = Physics.gg_msun * mass_msun / (Physics.c * Physics.c)
    nus = tuple(float(v) for v in nus)
    nf = len(nus)
    i_scales = [math.exp(log_j_scale + 3.0 * math.log(nu)) for nu in nus]
    max_steps = params.ray_max_steps
    cam = tuple(float(v) for v in np.asarray(camera_x))

    def rhs(x0, x1, x2, x3, p0, p1, p2, p3):
        return geodesic_rhs_c(x1, x2, x3, p0, p1, p2, p3, spin, mass,
                              flat=flat, with_distance=(integrator == "dp"))

    diff_params = tuple(diff_params)
    assert all(p in _DIFFABLE_PARAMS for p in diff_params), diff_params
    nd = len(diff_params)

    def kernel(*refs):
        rt = {}
        if nd:
            pr, refs = refs[0], refs[1:]
            rt = {name: pr[i] for i, name in enumerate(diff_params)}
        cn0 = rt.get("cn0")
        r0 = rt.get("r0")
        h_par = rt.get("h")
        (x0r, x1r, x2r, x3r, p0r, p1r, p2r, p3r, momr) = refs[:9]
        i_outs = refs[9:9 + nf]
        if nd:
            di_outs = refs[9 + nf:9 + (1 + nd) * nf]
            flag_out, nsamp_out = refs[9 + (1 + nd) * nf:]
        else:
            flag_out, nsamp_out = refs[9 + nf:]
        x0, x1, x2, x3 = x0r[:], x1r[:], x2r[:], x3r[:]
        p0, p1, p2, p3 = p0r[:], p1r[:], p2r[:], p3r[:]
        mom = momr[:]
        shape = x0.shape
        f32 = x0.dtype
        zero = jnp.zeros(shape, f32)
        # Mosaic cannot carry i1 vectors through a while_loop: masks ride
        # as int32 0/1 and convert to bool at use
        i_false = jnp.zeros(shape, jnp.int32)

        r_init = _radius_c(x1, x2, x3, spin)

        state0 = dict(
            n=jnp.zeros((), jnp.int32),
            x0=x0, x1=x1, x2=x2, x3=x3, p1=p1, p2=p2, p3=p3,
            h=-params.ray_step * r_init,
            alive=jnp.ones(shape, jnp.int32), trunc=i_false, flag=i_false,
            bad=i_false, r_mid_prev=zero,
            n_samp=jnp.zeros(shape, jnp.int32),
            num_retry=jnp.zeros(shape, jnp.int32), prev_fail=i_false,
        )
        for f_i in range(nf):
            state0[f"I{f_i}"] = zero
            state0[f"tau{f_i}"] = zero
            for p_i in range(nd):
                state0[f"dI{p_i}_{f_i}"] = zero
                state0[f"dtau{p_i}_{f_i}"] = zero

        def transfer_update(s, valid, bad_acc, mx0, mx1, mx2, mx3,
                            mk0, mk1, mk2, mk3, h, out):
            """Shared fused transfer at the (valid-masked) sample for
            every frequency; mutates `out` dict entries I*/tau* and
            returns the accumulated bad mask."""
            sx0 = jnp.where(valid, mx0, cam[0])
            sx1 = jnp.where(valid, mx1, cam[1])
            sx2 = jnp.where(valid, mx2, cam[2])
            sx3 = jnp.where(valid, mx3, cam[3])
            sk0 = jnp.where(valid, mk0, -1.0)
            sk1 = jnp.where(valid, mk1, 1.0)
            sk2 = jnp.where(valid, mk2, 0.0)
            sk3 = jnp.where(valid, mk3, 0.0)
            keep, gbad, n_n0, u_dot_k, r_s, cth_s = _formula_geom_c(
                sx0, sx1, sx2, sx3, sk0, sk1, sk2, sk3, fp, cam,
                r0=r0, h=h_par)
            if nd:
                # Log-derivative of the Gaussian density profile wrt the
                # disk shape parameters; j and alpha both scale with n_n0.
                r0_v = fp.r0 if r0 is None else r0
                h_v = fp.h if h_par is None else h_par
                w_r0 = r_s * r_s / (r0_v * r0_v * r0_v)
                w_h = -h_v * cth_s * cth_s
            for f_i, nu in enumerate(nus):
                j, alpha, cbad, alpha_unit = _formula_jalpha_c(
                    keep, gbad, n_n0, u_dot_k, mom, nu, fp, cn0=cn0,
                    with_unit=True)
                nfin = ~(jnp.isfinite(j) & jnp.isfinite(alpha))
                cbad = cbad | nfin
                j = jnp.where(cbad, 0.0, j)
                alpha = jnp.where(cbad, 0.0, alpha)
                bad_acc = bad_acc | (valid & cbad)

                dl_cgs = jnp.where(valid, -h, 0.0) * (x_unit / nu) / mom
                pos_alpha = alpha > 0.0
                inv_alpha = 1.0 / jnp.where(pos_alpha, alpha, 1.0)
                ss = j / jnp.where(pos_alpha, alpha, 1.0)
                delta_tau = alpha * dl_cgs
                atten = jnp.exp(-s[f"tau{f_i}"])
                thin = delta_tau <= DELTA_TAU_MAX
                em = -_expm1(-delta_tau)
                contrib = jnp.where(
                    pos_alpha,
                    jnp.where(thin, ss * em, ss),
                    j * dl_cgs)
                out[f"I{f_i}"] = s[f"I{f_i}"] \
                    + jnp.where(valid, contrib * atten, 0.0)
                dtau_eff = jnp.where(pos_alpha,
                                     jnp.where(thin, delta_tau, jnp.inf),
                                     0.0)
                out[f"tau{f_i}"] = s[f"tau{f_i}"] \
                    + jnp.where(valid, dtau_eff, 0.0)
                if nd:
                    exp_neg_dt = jnp.exp(-delta_tau)
                for p_i, pname in enumerate(diff_params):
                    # Forward-mode tangent of (j, alpha) wrt parameter
                    # p_i; branch-selected derivatives match what
                    # jax.grad produces through the scan path's
                    # jnp.where ladder exactly.
                    if pname == "cn0":
                        dj = None  # j independent of cn0
                        dalpha = jnp.where(cbad, 0.0, alpha_unit)
                    else:
                        w = w_r0 if pname == "r0" else w_h
                        dj = j * w
                        dalpha = alpha * w
                    ddt = dalpha * dl_cgs
                    dss = (-ss * dalpha if dj is None
                           else (dj - ss * dalpha)) * inv_alpha
                    dcontrib = jnp.where(
                        pos_alpha,
                        jnp.where(thin,
                                  dss * em + ss * exp_neg_dt * ddt,
                                  dss),
                        0.0 if dj is None else dj * dl_cgs)
                    # tau == inf => atten == 0: downstream contributions
                    # and their tangents vanish (guard avoids 0 * inf)
                    datten = jnp.where(atten > 0.0,
                                       -atten * s[f"dtau{p_i}_{f_i}"], 0.0)
                    out[f"dI{p_i}_{f_i}"] = s[f"dI{p_i}_{f_i}"] \
                        + jnp.where(valid,
                                    dcontrib * atten + contrib * datten,
                                    0.0)
                    out[f"dtau{p_i}_{f_i}"] = s[f"dtau{p_i}_{f_i}"] \
                        + jnp.where(valid & pos_alpha & thin, ddt, 0.0)
            return bad_acc

        A = geo._DP_A
        B5, B4, B4M = geo._DP_B5, geo._DP_B4, geo._DP_B4M

        def cond(s):
            return (s["n"] < max_steps) & jnp.any(s["alive"] > 0)

        def body(s):
            x0, x1, x2, x3 = s["x0"], s["x1"], s["x2"], s["x3"]
            p1, p2, p3 = s["p1"], s["p2"], s["p3"]
            s_alive = s["alive"] > 0
            s_trunc = s["trunc"] > 0
            s_flag = s["flag"] > 0
            s_bad = s["bad"] > 0
            s_prev_fail = s["prev_fail"] > 0
            r = _radius_c(x1, x2, x3, spin)

            k = [None] * 7
            k[0] = rhs(x0, x1, x2, x3, p0, p1, p2, p3)
            ds_dlam = jnp.abs(k[0][7]) + 1e-30
            h_cap = params.ray_step * r / ds_dlam
            h = -jnp.minimum(jnp.abs(s["h"]), h_cap)

            comps = (x0, x1, x2, x3, p1, p2, p3)  # p0 conserved

            def add_stage(base, weights, stages, scale):
                # base + scale * sum_q weights[q] * k[q], componentwise over
                # the 7 dynamical components (p0 is conserved; ds unused)
                out = []
                for ci in range(7):
                    acc = None
                    for q in stages:
                        w = float(weights[q])
                        if w == 0.0:
                            continue
                        term = (w * scale) * k[q][ci]
                        acc = term if acc is None else acc + term
                    out.append(base[ci] if acc is None else base[ci] + acc)
                return out

            for i in range(1, 7):
                ysub = add_stage(comps, A[i], range(i), h)
                k[i] = rhs(ysub[0], ysub[1], ysub[2], ysub[3], p0,
                           ysub[4], ysub[5], ysub[6])

            y5 = add_stage(comps, B5, range(7), h)
            y4 = add_stage(comps, B4, range(7), h)
            y4m = add_stage(comps, B4M, range(7), h)

            # Error estimate over the 8 dynamical components (p0 error = 0)
            err = jnp.zeros(shape, f32)
            for ci in range(7):
                ya = jnp.maximum(jnp.abs(comps[ci]), jnp.abs(y5[ci]))
                sc = params.ray_tol_abs + params.ray_tol_rel * ya
                err = jnp.maximum(err, jnp.abs(y5[ci] - y4[ci]) / sc)

            accept = err <= 1.0
            err_safe = jnp.maximum(err, 1e-30)
            fac_ideal = geo._DP_ERR_FACTOR * err_safe ** (-geo._DP_ERR_POWER)
            fac_rej = jnp.maximum(
                jnp.where(jnp.isfinite(err), fac_ideal, geo._DP_MIN_FACTOR),
                geo._DP_MIN_FACTOR)
            fac_acc = jnp.clip(fac_ideal, geo._DP_MIN_FACTOR,
                               geo._DP_MAX_FACTOR)
            fac_acc = jnp.where(err == 0.0, geo._DP_MAX_FACTOR, fac_acc)
            fac_acc = jnp.where(s_prev_fail, jnp.minimum(fac_acc, 1.0),
                                fac_acc)
            h_next = h * jnp.where(accept, fac_acc, fac_rej)

            num_retry = jnp.where(accept, 0, s["num_retry"] + 1)
            retry_exceeded = num_retry > params.ray_max_retries
            flag = s_flag | (s_alive & retry_exceeded)
            dead_from_retry = s_alive & retry_exceeded

            # Accepted endpoint with null renormalization
            fac = renormalize_factor_c(y5[1], y5[2], y5[3], p0,
                                       y5[4], y5[5], y5[6], spin, mass,
                                       flat=flat)
            e1, e2, e3 = y5[4] * fac, y5[5] * fac, y5[6] * fac
            r_new = _radius_c(y5[1], y5[2], y5[3], spin)

            # Stored sample = 4th-order midpoint, renormalized
            facm = renormalize_factor_c(y4m[1], y4m[2], y4m[3], p0,
                                        y4m[4], y4m[5], y4m[6], spin, mass,
                                        flat=flat)
            m1, m2, m3 = y4m[4] * facm, y4m[5] * facm, y4m[6] * facm
            r_mid = _radius_c(y4m[1], y4m[2], y4m[3], spin)

            have_prev = s["n_samp"] > 0
            trunc_now = have_prev & (
                ((r_mid > params.camera_r) & (r_mid > s["r_mid_prev"]))
                | (r_mid < params.r_terminate))
            trunc = s_trunc | (accept & trunc_now)
            valid = s_alive & accept & ~trunc & ~retry_exceeded

            terminate = ((r_new > params.camera_r) & (r_new > r)) \
                | (r_new < params.r_terminate)
            is_last = s["n"] == max_steps - 1
            flag = flag | (s_alive & accept & ~terminate & is_last)
            alive = s_alive & ~(accept & terminate) & ~dead_from_retry

            # --- fused transfer update at the (valid-masked) midpoint ---
            out_tr = {}
            bad = transfer_update(s, valid, s_bad,
                                  y4m[0], y4m[1], y4m[2], y4m[3],
                                  p0, m1, m2, m3, h, out_tr)

            step_taken = s_alive & accept
            park = ~alive
            nx0 = jnp.where(park, 0.0, jnp.where(step_taken, y5[0], x0))
            nx1 = jnp.where(park, 1.0e3, jnp.where(step_taken, y5[1], x1))
            nx2 = jnp.where(park, 0.0, jnp.where(step_taken, y5[2], x2))
            nx3 = jnp.where(park, 0.0, jnp.where(step_taken, y5[3], x3))
            np1 = jnp.where(park, 1.0, jnp.where(step_taken, e1, p1))
            np2 = jnp.where(park, 0.0, jnp.where(step_taken, e2, p2))
            np3 = jnp.where(park, 0.0, jnp.where(step_taken, e3, p3))

            return dict(
                n=s["n"] + 1,
                x0=nx0, x1=nx1, x2=nx2, x3=nx3, p1=np1, p2=np2, p3=np3,
                h=jnp.where(s_alive, h_next, s["h"]),
                alive=alive.astype(jnp.int32), trunc=trunc.astype(jnp.int32),
                flag=flag.astype(jnp.int32), bad=bad.astype(jnp.int32),
                r_mid_prev=jnp.where(valid, r_mid, s["r_mid_prev"]),
                n_samp=s["n_samp"] + valid.astype(jnp.int32),
                num_retry=jnp.where(s_alive, num_retry, s["num_retry"]),
                prev_fail=((s_alive & ~accept)
                           | (~s_alive & s_prev_fail)).astype(jnp.int32),
                **out_tr,
            )

        def body_rk4(s):
            """Fixed-step rk4/rk2 step (reference geodesics.cpp:418-795 /
            ops/geodesic.py _make_rk_body semantics: h = -ray_step *
            (r - r_horizon), midpoint (rk4) or half-step (rk2) sample,
            renormalized momenta)."""
            x0, x1, x2, x3 = s["x0"], s["x1"], s["x2"], s["x3"]
            p1, p2, p3 = s["p1"], s["p2"], s["p3"]
            s_alive = s["alive"] > 0
            s_trunc = s["trunc"] > 0
            s_flag = s["flag"] > 0
            s_bad = s["bad"] > 0
            r = _radius_c(x1, x2, x3, spin)
            h = jnp.where(s_alive,
                          -params.ray_step * (r - params.r_horizon), 0.0)

            comps = (x0, x1, x2, x3, p1, p2, p3)

            def at(base, k, w):
                return [base[ci] + (w * h) * k[ci] for ci in range(7)]

            k1 = rhs(x0, x1, x2, x3, p0, p1, p2, p3)
            if integrator == "rk4":
                y2 = at(comps, k1, 0.5)
                k2 = rhs(y2[0], y2[1], y2[2], y2[3], p0,
                         y2[4], y2[5], y2[6])
                y3 = at(comps, k2, 0.5)
                k3 = rhs(y3[0], y3[1], y3[2], y3[3], p0,
                         y3[4], y3[5], y3[6])
                y4 = at(comps, k3, 1.0)
                k4 = rhs(y4[0], y4[1], y4[2], y4[3], p0,
                         y4[4], y4[5], y4[6])
                y_end = [comps[ci] + h * (k1[ci] / 6.0 + k2[ci] / 3.0
                                          + k3[ci] / 3.0 + k4[ci] / 6.0)
                         for ci in range(7)]
                y_mid = [0.5 * (comps[ci] + y_end[ci]) for ci in range(7)]
            else:  # rk2 (Heun); sample is y + h/2 k1 (geodesics.cpp:626-795)
                yf = at(comps, k1, 1.0)
                k2 = rhs(yf[0], yf[1], yf[2], yf[3], p0,
                         yf[4], yf[5], yf[6])
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
            trunc = s_trunc | trunc_now
            valid = s_alive & ~trunc

            terminate = ((r_new > params.camera_r) & (r_new > r)) \
                | (r_new < params.r_terminate)
            is_last = s["n"] == max_steps - 1
            flag = s_flag | (s_alive & ~terminate & is_last)
            alive = s_alive & ~terminate

            out_tr = {}
            bad = transfer_update(s, valid, s_bad,
                                  y_mid[0], y_mid[1], y_mid[2], y_mid[3],
                                  p0, m1, m2, m3, h, out_tr)

            park = ~alive
            nx0 = jnp.where(park, 0.0, jnp.where(s_alive, y_end[0], x0))
            nx1 = jnp.where(park, 1.0e3, jnp.where(s_alive, y_end[1], x1))
            nx2 = jnp.where(park, 0.0, jnp.where(s_alive, y_end[2], x2))
            nx3 = jnp.where(park, 0.0, jnp.where(s_alive, y_end[3], x3))
            np1 = jnp.where(park, 1.0, jnp.where(s_alive, e1, p1))
            np2 = jnp.where(park, 0.0, jnp.where(s_alive, e2, p2))
            np3 = jnp.where(park, 0.0, jnp.where(s_alive, e3, p3))

            return dict(
                n=s["n"] + 1,
                x0=nx0, x1=nx1, x2=nx2, x3=nx3, p1=np1, p2=np2, p3=np3,
                h=s["h"],
                alive=alive.astype(jnp.int32), trunc=trunc.astype(jnp.int32),
                flag=flag.astype(jnp.int32), bad=bad.astype(jnp.int32),
                r_mid_prev=jnp.where(valid, r_mid, s["r_mid_prev"]),
                n_samp=s["n_samp"] + valid.astype(jnp.int32),
                num_retry=s["num_retry"], prev_fail=s["prev_fail"],
                **out_tr,
            )

        s = jax.lax.while_loop(cond, body if integrator == "dp" else body_rk4,
                               state0)
        poison = s["bad"] > 0
        if params.fallback_nan:
            poison = poison | (s["flag"] > 0)
        for f_i in range(nf):
            i_outs[f_i][:] = jnp.where(poison, jnp.nan,
                                       s[f"I{f_i}"] * i_scales[f_i])
            for p_i in range(nd):
                # Poisoned pixels hold a constant NaN: their derivative is
                # zero, matching jax.grad through the scan path's where.
                di_outs[p_i * nf + f_i][:] = jnp.where(
                    poison, 0.0, s[f"dI{p_i}_{f_i}"] * i_scales[f_i])
        flag_out[:] = s["flag"]
        nsamp_out[:] = s["n_samp"]

    return kernel


def render_formula(positions, directions, momentum_factors, frequencies,
                   params: geo.GeodesicParams, fp, mass_msun: float,
                   camera_x, log_j_scale: float, fallback_nan: bool = True,
                   integrator: str = "dp", interpret: bool = False,
                   cn0=None, diff_values=None):
    """Pallas fused render of a ray bundle.

    Args:
      positions/directions: (B, 4) f32 camera rays (B padded to ROWS*128
        internally); momentum_factors: (B,); frequencies: scalar Hz or a
        sequence of them (true-color multi-frequency).
      fp: FormulaParams (plus geometry/cut fields used by the coefficient
        function). integrator: "dp", "rk4", or "rk2". interpret: run the kernel in
        interpreter mode (CPU testing).
      cn0: shorthand for diff_values={"cn0": cn0}.
      diff_values: optional dict mapping a subset of {"cn0", "r0", "h"}
        to runtime (traced) values overriding the static fp ones;
        switches to the tangent-carrying kernel, which additionally
        returns per-ray dI_nu/dp for each parameter (declaration order),
        each shaped like I_nu.

    Returns (I_nu (B, F) - or (B,) when a scalar frequency was given -,
    flags (B,) bool, n_samples (B,)[, list of dI_dp when diff_values]).
    """
    scalar_freq = np.ndim(frequencies) == 0
    nus = ([float(frequencies)] if scalar_freq
           else [float(v) for v in np.asarray(frequencies)])
    if cn0 is not None:
        assert diff_values is None
        diff_values = {"cn0": cn0}
    diff_params = () if diff_values is None else tuple(
        p for p in _DIFFABLE_PARAMS if p in diff_values)
    if diff_values is not None:
        assert len(diff_params) == len(diff_values), diff_values
    nd = len(diff_params)
    b = positions.shape[0]
    block = ROWS * LANES
    n_pad = (-b) % block
    dtype = jnp.float32

    def prep(a, pad_row):
        a = jnp.asarray(a, dtype)
        if n_pad:
            padding = jnp.broadcast_to(jnp.asarray(pad_row, dtype),
                                       (n_pad,) + a.shape[1:])
            a = jnp.concatenate([a, padding], axis=0)
        return a

    # Padding rays park far outside the camera sphere moving outward:
    # they terminate on the first step and never produce non-finite values
    pos = prep(positions, [0.0, 1.0e3, 0.0, 0.0])
    # backward integration: dx^1/dlambda ~ -p_1, h < 0 => r grows for
    # p_1 < 0 => immediate rising-radius termination
    dirs = prep(directions, [-1.0, -1.0, 0.0, 0.0])
    mom = prep(momentum_factors, 1.0)
    n_blocks = (b + n_pad) // block

    cols = [pos[:, 0], pos[:, 1], pos[:, 2], pos[:, 3],
            dirs[:, 0], dirs[:, 1], dirs[:, 2], dirs[:, 3], mom]
    cols = [c.reshape(n_blocks * ROWS, LANES) for c in cols]

    kernel_params = _KParams(params, fallback_nan)
    kernel = _make_kernel(kernel_params, fp, nus, mass_msun,
                          np.asarray(camera_x, np.float64), log_j_scale,
                          integrator=integrator, diff_params=diff_params)

    nf = len(nus)
    spec = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    n_fouts = (1 + nd) * nf
    in_specs = [spec] * 9
    inputs = cols
    if nd:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
        inputs = [jnp.stack([jnp.asarray(diff_values[p], dtype)
                             for p in diff_params])] + inputs
    out_shape = (
        [jax.ShapeDtypeStruct((n_blocks * ROWS, LANES), dtype)] * n_fouts
        + [jax.ShapeDtypeStruct((n_blocks * ROWS, LANES), jnp.int32)] * 2)
    outs = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=[spec] * (n_fouts + 2),
        out_shape=out_shape,
        interpret=interpret,
    )(*inputs)
    imgs = [o.reshape(-1)[:b] for o in outs[:nf]]
    flags = outs[n_fouts].reshape(-1)[:b].astype(bool)
    nsamp = outs[n_fouts + 1].reshape(-1)[:b]
    i_img = imgs[0] if scalar_freq else jnp.stack(imgs, axis=-1)
    if not nd:
        return i_img, flags, nsamp
    dis = []
    for p_i in range(nd):
        dp = [o.reshape(-1)[:b]
              for o in outs[(1 + p_i) * nf:(2 + p_i) * nf]]
        dis.append(dp[0] if scalar_freq else jnp.stack(dp, axis=-1))
    return i_img, flags, nsamp, dis


def make_formula_fit_renderer(frequencies, params: geo.GeodesicParams, fp,
                              mass_msun: float, camera_x,
                              log_j_scale: float, fallback_nan: bool = True,
                              integrator: str = "dp",
                              interpret: bool = False,
                              fit_params: tuple = ("cn0",)):
    """Differentiable kernel renderer for inverse problems.

    Returns render(theta, positions, directions, momentum_factors) ->
    (I_nu, flags, n_samples), theta a dict over fit_params (subset of
    ("cn0", "r0", "h")), wrapped in jax.custom_vjp: the forward pass is
    the fused Pallas kernel carrying one in-kernel dI/dp tangent per
    parameter (the trajectory is independent of all plasma parameters, so
    each tangent costs a few VPU ops per step instead of a reverse
    sweep), and the backward contracts the saved per-ray dI/dp against
    the incoming cotangent. positions / directions / momentum_factors are
    wrapped in stop_gradient: camera-pose gradients must use the
    XLA-scan path (pipeline.py), which supports full reverse-mode.

    cn0 enters the image twice: linearly through the emission amplitude
    (formula.py formula_log_j_scale - static inside the kernel, so it is
    applied here as an exact cn0/cn0_ref factor outside) and nonlinearly
    through the absorption alpha = cn0 * alpha_unit (the in-kernel
    runtime tangent). log_j_scale must be formula_log_j_scale(fp), i.e.
    consistent with cn0_ref = fp.cn0 (> 0). r0 and h enter only through
    the Gaussian density profile (in-kernel tangents alone).
    """
    fit_params = tuple(p for p in _DIFFABLE_PARAMS if p in fit_params)
    has_cn0 = "cn0" in fit_params
    cn0_ref = float(fp.cn0)

    def _run(theta, positions, directions, momentum_factors):
        i_raw, flags, nsamp, dis = render_formula(
            positions, directions, momentum_factors, frequencies, params,
            fp, mass_msun, camera_x, log_j_scale,
            fallback_nan=fallback_nan, integrator=integrator,
            interpret=interpret, diff_values=dict(theta))
        scale = theta["cn0"] / cn0_ref if has_cn0 else 1.0
        return i_raw * scale, flags, nsamp, i_raw, dis, scale

    @jax.custom_vjp
    def render(theta, positions, directions, momentum_factors):
        i_img, flags, nsamp, _, _, _ = _run(theta, positions, directions,
                                            momentum_factors)
        return i_img, flags, nsamp

    def fwd(theta, positions, directions, momentum_factors):
        i_img, flags, nsamp, i_raw, dis, scale = _run(
            theta, positions, directions, momentum_factors)
        # Product rule for cn0: I = (cn0/cn0_ref) * I_raw(alpha(cn0));
        # poisoned pixels hold a constant NaN whose derivative is zero.
        nanmask = jnp.isnan(i_raw)
        di_total = {}
        for p, di in zip(fit_params, dis):
            d = scale * di
            if p == "cn0":
                d = d + i_raw / cn0_ref
            di_total[p] = jnp.where(nanmask, 0.0, d)
        return (i_img, flags, nsamp), (di_total, positions, directions,
                                       momentum_factors)

    def bwd(res, cts):
        di_total, positions, directions, momentum_factors = res
        ct_i = cts[0]
        ct_theta = {p: jnp.sum(ct_i * d) for p, d in di_total.items()}
        return (ct_theta, jnp.zeros_like(positions),
                jnp.zeros_like(directions),
                jnp.zeros_like(momentum_factors))

    render.defvjp(fwd, bwd)

    def wrapper(theta, positions, directions, momentum_factors):
        return render(dict(theta), jax.lax.stop_gradient(positions),
                      jax.lax.stop_gradient(directions),
                      jax.lax.stop_gradient(momentum_factors))

    return wrapper


def make_formula_vjp_renderer(frequencies, params: geo.GeodesicParams, fp,
                              mass_msun: float, camera_x,
                              log_j_scale: float, fallback_nan: bool = True,
                              integrator: str = "dp",
                              interpret: bool = False):
    """cn0-only convenience wrapper over make_formula_fit_renderer:
    render(cn0, positions, directions, momentum_factors)."""
    fit = make_formula_fit_renderer(
        frequencies, params, fp, mass_msun, camera_x, log_j_scale,
        fallback_nan=fallback_nan, integrator=integrator,
        interpret=interpret, fit_params=("cn0",))

    def render(cn0, positions, directions, momentum_factors):
        return fit({"cn0": cn0}, positions, directions, momentum_factors)

    return render


def render_formula_dp(positions, directions, momentum_factors, frequency,
                      params: geo.GeodesicParams, fp, mass_msun: float,
                      camera_x, log_j_scale: float, fallback_nan: bool = True,
                      interpret: bool = False):
    """Single-frequency dp wrapper (the original benchmark entry point)."""
    return render_formula(positions, directions, momentum_factors,
                          frequency, params, fp, mass_msun, camera_x,
                          log_j_scale, fallback_nan=fallback_nan,
                          integrator="dp", interpret=interpret)


class _KParams:
    """GeodesicParams view + fallback_nan for the kernel closure."""

    def __init__(self, params: geo.GeodesicParams, fallback_nan: bool):
        for f in params.__dataclass_fields__:
            setattr(self, f, getattr(params, f))
        self.fallback_nan = fallback_nan
