"""Polarized (full-Stokes IQUV) radiative transfer.

Re-derivation of the reference integrator (src/radiation_integrator/
polarized.cpp:51-973): the state is the complex coherency tensor N^{munu}
per (ray, frequency), evolved far-end -> camera with Strang-split parallel
transport around matter coupling in a fluid tetrad frame:

  per sample: transport N by half step (Euler, averaged connection/k)
              -> build fluid tetrad (e_0 = u, e_3 ~ k, e_2 ~ b)
              -> N -> tetrad Stokes (I 14)
              -> matter coupling (polarized_coupling.py)
              -> Stokes -> N (I 13), back to coordinates
              -> transport by second half step
  finally:    camera-frame tetrad per pixel -> Stokes I, Q, U, V; nu^3 scale.

Because the coupling operators do not commute along the ray, this path
materializes the geodesic samples (trace_geodesics + compaction) and scans
the step axis in reverse - unlike the streaming unpolarized path. Pixel
bundles should be chunked by the caller for memory.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from blacklight_tpu.constants import NUM_CELL_VALUES, Physics, RayIntegrator
from blacklight_tpu.ops import connection as connection_mod
from blacklight_tpu.ops import geodesic, geometry
from blacklight_tpu.ops.tetrad import tetrad_cks
from blacklight_tpu.transfer.polarized_coupling import couple_matter
from blacklight_tpu.transfer.unpolarized import DELTA_TAU_MAX, ImageOptions
from blacklight_tpu.utils.errors import BlacklightError


def _kcon_scalar(pos, kcov, spin, mass, flat):
    """g^{munu} k_nu via the Kerr-Schild rank-1 structure."""
    if flat:
        return jnp.concatenate([-kcov[..., :1], kcov[..., 1:]], axis=-1)
    _, f, l_lower = geometry.ks_scalars(pos[..., 1:4], spin, mass)
    l1, l2, l3 = l_lower[..., 0], l_lower[..., 1], l_lower[..., 2]
    lp = -kcov[..., 0] + l1 * kcov[..., 1] + l2 * kcov[..., 2] + l3 * kcov[..., 3]
    flp = f * lp
    return jnp.stack([-kcov[..., 0] + flp,
                      kcov[..., 1] - flp * l1,
                      kcov[..., 2] - flp * l2,
                      kcov[..., 3] - flp * l3], axis=-1)


def integrate_polarized(positions, directions, momentum_factors, frequencies,
                        *, params: geodesic.GeodesicParams,
                        coeff_fn: Callable, opts: ImageOptions,
                        mass_msun: float, camera_x, camera_u_con, camera_u_cov,
                        camera_vert_con_c, log_j_scale=0.0,
                        rotation_split: bool = False, stored=None,
                        stored_prims=None, cell_fn=None):
    """Full-Stokes transfer over a pixel bundle.

    Args:
      coeff_fn: (pos (B,4), kcov (B,4)) -> dict with (B, F) scaled j_i/j_q/j_v
        and unscaled alpha_i/alpha_q/alpha_v, rho_q/rho_v, plus (B, 4) 'ucon',
        'bcon' and (B,) 'b_zero' for the tetrad.
      cell_fn: (pos, kcov) -> (B, NUM_CELL_VALUES) diagnostics (NaN where
        invalid) for the *_ave / tau_int images (polarized.cpp:338-371).

    Returns dict with I_nu/Q_nu/U_nu/V_nu (B, F) plus auxiliary image planes
    and _flags/_n_samples.
    """
    need_cells = opts.lambda_ave or opts.emission_ave or opts.tau_int
    if need_cells and cell_fn is None:
        raise BlacklightError(
            "cell_fn required for lambda_ave/emission_ave/tau_int")

    b = positions.shape[0]
    f = frequencies.shape[0]
    dtype = positions.dtype
    x_unit = Physics.gg_msun * mass_msun / (Physics.c * Physics.c)
    t_unit = x_unit / Physics.c

    if stored is not None:
        samples, flags, n_samples = stored
    else:
        samples, flags, n_samples = geodesic.trace_geodesics(
            positions, directions, params)
        if params.integrator == RayIntegrator.dp:
            # Only dp leaves holes (rejected attempts); rk samples are
            # already prefix-valid and the argsort compaction is ~7x the
            # cost of the trace itself on TPU
            samples = geodesic.compact_samples(samples)
    s_len = samples.len.shape[0]

    # delta_lambda_new: the next (nearer-to-camera) sample's step, or the
    # current one at the camera end (polarized.cpp:121-124 after reversal).
    dl = -samples.len                                     # (S, B), positive
    dl_next = jnp.concatenate([dl[:1], dl[:-1]], axis=0)  # shifted toward camera
    # Previous processed sample (farther from the camera; the scan runs in
    # reverse) as shifted rows: valid samples are contiguous from index 0
    # (rk integrators emit prefix-valid rows; dp rows are compacted), so
    # row n+1 IS the previously processed sample. Recomputing the
    # connection there each step replaces a (B,4,4,4) carry whose HBM
    # round-trip dominated the whole integrator (~8 MB/step at 16k rays).
    pos_prev = jnp.concatenate([samples.pos[1:], samples.pos[-1:]], axis=0)
    dir_prev = jnp.concatenate([samples.dir[1:], samples.dir[-1:]], axis=0)
    dl_prev = jnp.concatenate([dl[1:], dl[-1:]], axis=0)
    valid_prev = jnp.concatenate(
        [samples.valid[1:], jnp.zeros_like(samples.valid[-1:])], axis=0)

    spin, mass, flat = params.bh_a, params.bh_m, params.ray_flat

    # The coherency tensor N is Hermitian and all rotation coefficients
    # (connection contractions, tetrads) are REAL, so N is carried as
    # explicit (re, im) real parts: complex einsums against a real-valued
    # operand cast to complex do twice the arithmetic (the zero imaginary
    # part is multiplied through), and TPUs have no native complex type.
    state = {
        "nn_re": jnp.zeros((b, f, 4, 4), dtype),
        "nn_im": jnp.zeros((b, f, 4, 4), dtype),
        "nn_temp_re": jnp.zeros((b, f, 4, 4), dtype),
        "nn_temp_im": jnp.zeros((b, f, 4, 4), dtype),
        "coeff_bad": jnp.zeros((b, f), dtype=bool),
    }
    if opts.time:
        state["time"] = jnp.zeros(b, dtype)
    if opts.length:
        state["length"] = jnp.zeros(b, dtype)
    if opts.lam:
        state["lambda"] = jnp.zeros((b, f), dtype)
    if opts.emission:
        state["emission"] = jnp.zeros((b, f), dtype)
    if opts.tau:
        state["tau"] = jnp.zeros((b, f), dtype)
    if opts.crossings:
        state["crossings"] = jnp.zeros(b, jnp.int32)
        state["plane_sign"] = jnp.zeros(b, dtype=bool)
    if opts.lambda_ave:
        state["lambda_ave"] = jnp.zeros((b, f, NUM_CELL_VALUES), dtype)
        state["lambda_tot"] = jnp.zeros((b, f), dtype)
    if opts.emission_ave:
        state["emission_ave"] = jnp.zeros((b, f, NUM_CELL_VALUES), dtype)
        state["emission_tot"] = jnp.zeros((b, f), dtype)
    if opts.tau_int:
        state["tau_int"] = jnp.zeros((b, f, NUM_CELL_VALUES), dtype)
    if opts.track_sample_times:
        state["t_min"] = jnp.full(b, jnp.inf, dtype)
        state["t_max"] = jnp.full(b, -jnp.inf, dtype)

    def body(state, xs):
        (pos, kcov, dl_cur, dl_nxt, valid, prims,
         pos_pv, dir_pv, dl_pv, valid_pv) = xs
        coeff_extra = {} if prims is None else {"prims": prims}
        active = valid
        started = valid_pv
        first = active & ~started
        av = active.astype(dtype)

        dl_cgs = dl_cur[:, None] * x_unit / (frequencies[None, :]
                                             * momentum_factors[:, None])

        conn = connection_mod.connection_cks(pos[:, 1:4], spin, mass, flat=flat)
        conn_prev = connection_mod.connection_cks(pos_pv[:, 1:4], spin, mass,
                                                  flat=flat)
        conn_old = jnp.where(first[:, None, None, None], conn,
                             0.5 * (conn_prev + conn))
        kcon = _kcon_scalar(pos, kcov, spin, mass, flat)
        kcon_prev = _kcon_scalar(pos_pv, dir_pv, spin, mass, flat)
        kcon_old = jnp.where(first[:, None], kcon,
                             0.5 * (kcon_prev + kcon))

        # First-half parallel transport (polarized.cpp:174-192):
        # dN^{mn} = -(A^m_b N^{bn} + A^n_b N^{mb}) with real A = k.Gamma,
        # applied to re/im parts independently
        temp_a = jnp.einsum("Ba,Bmab->Bmb", kcon_old, conn_old)
        dl_local = 0.5 * (jnp.where(first, 0.0, dl_pv) + dl_cur)

        def transported(a_mat, base_re, base_im, n_re, n_im, dll):
            d = dll[:, None, None, None]
            out = []
            for base, n in ((base_re, n_re), (base_im, n_im)):
                dn = -(jnp.einsum("Bmb,BFbn->BFmn", a_mat, n)
                       + jnp.einsum("Bnb,BFmb->BFmn", a_mat, n))
                out.append(base + dn * d)
            return out

        nn_half_re, nn_half_im = transported(
            temp_a, state["nn_temp_re"], state["nn_temp_im"],
            state["nn_re"], state["nn_im"], dl_local)

        # Fluid state, coefficients, tetrad
        coeffs = coeff_fn(pos, kcov, **coeff_extra)
        ucon = coeffs["ucon"]
        bcon = coeffs["bcon"]
        b_zero = coeffs["b_zero"]
        if "bad" in coeffs:
            # Samples the reference would NaN carry finite placeholders +
            # a flag; poison those pixels at the end instead of letting
            # NaN primals destroy reverse-mode (see unpolarized.py)
            state["coeff_bad"] = state["coeff_bad"] | (
                active[:, None] & coeffs["bad"])
        g_cov, g_con = geometry.gcov_gcon(pos[:, 1:4], spin, mass, flat=flat)
        ucov = jnp.einsum("Bmn,Bn->Bm", g_cov, ucon)
        zhat = jnp.zeros_like(bcon).at[:, 3].set(1.0)
        upcon = jnp.where(b_zero[:, None], zhat, bcon)
        tet = tetrad_cks(ucon, ucov, kcon, kcov, upcon, g_cov, g_con)

        # N -> tetrad covariant components (polarized.cpp:264-292). Only the
        # (1,2)x(1,2) tetrad block feeds the Stokes vector, so contract just
        # those two tetrad rows (2x4 instead of 4x4)
        e_cov = jnp.einsum("Ban,Bnm->Bam", tet, g_cov)
        e12 = e_cov[:, 1:3, :]
        nt_re = jnp.einsum("Bam,Bbn,BFmn->BFab", e12, e12, nn_half_re)
        nt_im = jnp.einsum("Bam,Bbn,BFmn->BFab", e12, e12, nn_half_im)
        ss_start = jnp.stack([
            0.5 * (nt_re[..., 0, 0] + nt_re[..., 1, 1]),
            0.5 * (nt_re[..., 0, 0] - nt_re[..., 1, 1]),
            0.5 * (nt_re[..., 0, 1] + nt_re[..., 1, 0]),
            0.5 * (nt_im[..., 1, 0] - nt_im[..., 0, 1]),
        ], axis=-1)

        # Auxiliary image planes (same accumulations as unpolarized)
        if opts.time:
            t_cgs = pos[:, 0] * t_unit
            state["time"] = jnp.where(active,
                                      jnp.minimum(state["time"], t_cgs),
                                      state["time"])
        if opts.length:
            q = (jnp.einsum("Bam,Bm->Ba", g_con[:, 1:, :], kcov)
                 - g_con[:, 0, 1:] * (jnp.einsum("Bm,Bm->B", g_con[:, 0, :], kcov)
                                      / g_con[:, 0, 0])[:, None])
            dl2 = jnp.einsum("Bab,Ba,Bb->B", g_cov[:, 1:, 1:], q, q)
            state["length"] = state["length"] + jnp.where(
                active, jnp.sqrt(jnp.maximum(dl2, 0.0)) * dl_cur * x_unit, 0.0)
        if opts.lam:
            state["lambda"] = state["lambda"] + jnp.where(
                active[:, None], dl_cgs, 0.0)
        if opts.emission:
            state["emission"] = state["emission"] + jnp.where(
                active[:, None], coeffs["j_i"] * dl_cgs, 0.0)
        if opts.tau:
            state["tau"] = state["tau"] + jnp.where(
                active[:, None], coeffs["alpha_i"] * dl_cgs, 0.0)
        if opts.crossings:
            sign_new = (camera_x[1] * pos[:, 1] + camera_x[2] * pos[:, 2]
                        + camera_x[3] * pos[:, 3]) > 0.0
            flipped = active & started & (sign_new != state["plane_sign"])
            state["crossings"] = state["crossings"] + flipped.astype(jnp.int32)
            state["plane_sign"] = jnp.where(active, sign_new,
                                            state["plane_sign"])

        if opts.track_sample_times:
            t = pos[:, 0]
            state["t_min"] = jnp.where(active,
                                       jnp.minimum(state["t_min"], t),
                                       state["t_min"])
            state["t_max"] = jnp.where(active,
                                       jnp.maximum(state["t_max"], t),
                                       state["t_max"])

        # Cell-value-weighted images (polarized.cpp:338-371); the scan
        # already runs far -> camera, so the tau_int recurrence applies
        # directly
        if need_cells:
            cells = cell_fn(pos, kcov, **coeff_extra)
            cells_ok = active[:, None] & ~jnp.isnan(cells[:, 0:1])
            cells = jnp.where(jnp.isnan(cells), 0.0, cells)
        if opts.lambda_ave:
            state["lambda_tot"] = state["lambda_tot"] + jnp.where(
                active[:, None], dl_cgs, 0.0)
            upd = jnp.where(cells_ok[:, :, None],
                            cells[:, None, :] * dl_cgs[..., None], 0.0)
            state["lambda_ave"] = state["lambda_ave"] + upd
        if opts.emission_ave:
            w = coeffs["j_i"] * dl_cgs
            state["emission_tot"] = state["emission_tot"] + jnp.where(
                active[:, None], w, 0.0)
            upd = jnp.where(cells_ok[:, :, None],
                            cells[:, None, :] * w[..., None], 0.0)
            state["emission_ave"] = state["emission_ave"] + upd
        if opts.tau_int:
            delta_tau = coeffs["alpha_i"] * dl_cgs
            thin = delta_tau <= DELTA_TAU_MAX
            # exp(-dt)*(old + cells*expm1(dt)) rewritten overflow-free:
            # exp(-dt)*old + cells*(1 - exp(-dt))
            exp_neg = jnp.exp(-delta_tau)
            new_thin = exp_neg[..., None] * state["tau_int"] \
                + cells[:, None, :] * (1.0 - exp_neg)[..., None]
            new_thick = jnp.broadcast_to(cells[:, None, :],
                                         state["tau_int"].shape)
            new = jnp.where(thin[..., None], new_thin, new_thick)
            state["tau_int"] = jnp.where(cells_ok[:, :, None], new,
                                         state["tau_int"])

        # Matter coupling in the tetrad frame
        ss_end = couple_matter(ss_start, coeffs, dl_cgs, rotation_split)

        # Stokes -> N (I 13; polarized.cpp:793-800): the tetrad-frame N is
        # nonzero only in the 2x2 transverse block
        #   re = [[I+Q, U], [U, I-Q]],  im = [[0, -V], [V, 0]]
        # so the return to coordinates (polarized.cpp:802-813) contracts a
        # (B,2,4) tetrad slice against (B,F,2,2)
        s_i, s_q = ss_end[..., 0], ss_end[..., 1]
        s_u, s_v = ss_end[..., 2], ss_end[..., 3]
        zero = jnp.zeros_like(s_i)
        m_re = jnp.stack([jnp.stack([s_i + s_q, s_u], axis=-1),
                          jnp.stack([s_u, s_i - s_q], axis=-1)], axis=-2)
        m_im = jnp.stack([jnp.stack([zero, -s_v], axis=-1),
                          jnp.stack([s_v, zero], axis=-1)], axis=-2)
        t12 = tet[:, 1:3, :]
        nn_post_re = jnp.einsum("Bam,Bbn,BFab->BFmn", t12, t12, m_re)
        nn_post_im = jnp.einsum("Bam,Bbn,BFab->BFmn", t12, t12, m_im)

        # Second-half transport (polarized.cpp:815-833)
        temp_g = jnp.einsum("Ba,Bmab->Bmb", kcon, conn)
        dl_local2 = 0.25 * (dl_cur + dl_nxt)
        nn_new_re, nn_new_im = transported(
            temp_g, nn_post_re, nn_post_im, nn_post_re, nn_post_im, dl_local2)

        act_c = active[:, None, None, None]
        state["nn_re"] = jnp.where(act_c, nn_new_re, state["nn_re"])
        state["nn_im"] = jnp.where(act_c, nn_new_im, state["nn_im"])
        state["nn_temp_re"] = jnp.where(act_c, nn_post_re, state["nn_temp_re"])
        state["nn_temp_im"] = jnp.where(act_c, nn_post_im, state["nn_temp_im"])
        return state, None

    xs = (samples.pos, samples.dir, dl, dl_next, samples.valid, stored_prims,
          pos_prev, dir_prev, dl_prev, valid_prev)
    state, _ = jax.lax.scan(body, state, xs, reverse=True)

    # Camera-frame Stokes extraction (polarized.cpp:846-949)
    g_cov, g_con = geometry.gcov_gcon(positions[:, 1:4], spin, mass, flat=flat)
    kcon = _kcon_scalar(positions, directions, spin, mass, flat)
    up_con = jnp.concatenate([
        (camera_u_con[0] * camera_vert_con_c[0]
         - (camera_u_cov[1] * camera_vert_con_c[1]
            + camera_u_cov[2] * camera_vert_con_c[2]
            + camera_u_cov[3] * camera_vert_con_c[3]) / camera_u_cov[0])[None],
        camera_vert_con_c[1:] + camera_u_con[1:] * camera_vert_con_c[0],
    ])
    up_con = jnp.broadcast_to(up_con, (b, 4))
    u_con_b = jnp.broadcast_to(camera_u_con, (b, 4))
    u_cov_b = jnp.broadcast_to(camera_u_cov, (b, 4))
    tet = tetrad_cks(u_con_b, u_cov_b, kcon, directions, up_con, g_cov, g_con)
    e_cov = jnp.einsum("Ban,Bnm->Bam", tet, g_cov)
    e12 = e_cov[:, 1:3, :]
    nt_re = jnp.einsum("Bam,Bbn,BFmn->BFab", e12, e12, state["nn_re"])
    nt_im = jnp.einsum("Bam,Bbn,BFmn->BFab", e12, e12, state["nn_im"])
    scale = jnp.exp(jnp.asarray(log_j_scale, dtype)
                    + 3.0 * jnp.log(frequencies[None, :].astype(dtype)))
    stokes_i = 0.5 * (nt_re[..., 0, 0] + nt_re[..., 1, 1]) * scale
    stokes_q = 0.5 * (nt_re[..., 0, 0] - nt_re[..., 1, 1]) * scale
    stokes_u = 0.5 * (nt_re[..., 0, 1] + nt_re[..., 1, 0]) * scale
    stokes_v = 0.5 * (nt_im[..., 1, 0] - nt_im[..., 0, 1]) * scale

    nan = jnp.array(jnp.nan, dtype)
    poison = (flags & opts.fallback_nan)[:, None] | state["coeff_bad"]
    out = {
        "_flags": flags, "_n_samples": n_samples,
        "I_nu": jnp.where(poison, nan, stokes_i),
        "Q_nu": jnp.where(poison, nan, stokes_q),
        "U_nu": jnp.where(poison, nan, stokes_u),
        "V_nu": jnp.where(poison, nan, stokes_v),
    }
    if opts.time:
        out["time"] = state["time"]
    if opts.length:
        out["length"] = state["length"]
    if opts.lam:
        out["lambda"] = state["lambda"]
    if opts.emission:
        out["emission"] = jnp.where(
            poison, nan, state["emission"] * jnp.exp(jnp.asarray(log_j_scale, dtype)))
    if opts.tau:
        out["tau"] = jnp.where(poison, nan, state["tau"])
    if opts.lambda_ave:
        ave = state["lambda_ave"] / state["lambda_tot"][..., None]
        out["lambda_ave"] = jnp.where(poison[..., None], 0.0, ave)
    if opts.emission_ave:
        ave = state["emission_ave"] / state["emission_tot"][..., None]
        out["emission_ave"] = jnp.where(poison[..., None], nan, ave)
    if opts.tau_int:
        out["tau_int"] = jnp.where(poison[..., None], nan, state["tau_int"])
    if opts.crossings:
        out["crossings"] = state["crossings"].astype(dtype)
    if opts.track_sample_times:
        out["_t_min"] = state["t_min"]
        out["_t_max"] = state["t_max"]
    return out
