"""Simulation-model pipeline: GRMHD snapshot -> fused ray trace -> image.

Orchestrates the simulation path the reference spreads over
SimulationReader::Read (simulation_reader.cpp:200-861) and the
sampling/coefficient phases of RadiationIntegrator::Integrate
(radiation_integrator.cpp:676-762). Here the snapshot loads once to device
memory (replicated) and the sampler + synchrotron coefficients run inside
the same fused scan as the geodesic integration and RT accumulation.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from blacklight_tpu.constants import (
    ModelType,
    PlasmaModel,
    SimulationFormat,
)
from blacklight_tpu.camera import make_camera
from blacklight_tpu.grid.athena import load_athdf
from blacklight_tpu.grid.sampling import SamplerOptions, sample_grid
from blacklight_tpu.models import synchrotron
from blacklight_tpu.models.cuts import GeometricCuts, geometric_keep
from blacklight_tpu.output import format_filename
from blacklight_tpu.transfer.unpolarized import ImageOptions, integrate_unpolarized
from blacklight_tpu.utils.errors import BlacklightError


# Wavefront sampler shape constants (grid/wavefront.py): rays per dedup
# subtile, geodesic steps per window, and unique-cell table capacity.
# Measured on the production bench workload: a 1024-ray subtile touches
# <= ~800 unique cells per 128-step window, so 1024 slots leave headroom;
# overflow falls back to the exact per-step path.
WAVEFRONT_SUBTILE = 1024
WAVEFRONT_WINDOW = 128
WAVEFRONT_CAPACITY = 1024
# Window-table construction: "brick" (sort-free per-subtile dense bounding
# bricks, single-block grids) or "dedup" (sort + unique-rank, any grid).
# The sort-based dedup measured SLOWER end-to-end than the per-step scan
# on the real chip (21.4k vs 32.9k rays/s at 1024^2) - TPU bitonic sorts
# outweigh the gathers they save; the brick variant replaces the sort with
# min-reductions and one contiguous slab fetch per subtile.
WAVEFRONT_MODE = "brick"
WAVEFRONT_BRICK = (8, 8, 16)  # (BK, BJ, BI) cells

# Fused-kernel phased dispatch (ops/pallas_simulation.render_simulation_
# phased): split the step budget into phases and compact finished /
# overflow-latched rays away between them. A kernel block runs until its
# slowest ray terminates, so the monolithic launch pays sum-of-block-
# maxima of ray step counts (~1.4x the mean on the bench workload,
# scripts/bench_raggedness.py). MEASURED OFF on the remote-tunnel v5e:
# 21.4k rays/s vs 43.5k monolithic at 1024^2/2000 steps - the per-phase
# host round trip (fetch carries, compact, re-upload ~15 arrays/ray over
# the tunnel) plus a higher overflow-fallback fraction (13.4% vs 10.4%;
# re-tiled survivor pools are less brick-coherent than camera tiles)
# outweigh the ~1.3x raggedness saving. Kept for A/B
# (scripts/bench_simulation.py --phased) and for local-host TPUs where
# device<->host bandwidth is PCIe, not an ssh tunnel.
KERNEL_PHASED = False
KERNEL_PHASE_STEPS = 512
KERNEL_PHASE_CHUNK = 65536  # rays per phase launch (pool is padded to it)


def plasma_params_from_config(cfg) -> synchrotron.PlasmaParams:
    model = cfg.require("plasma_model")
    power_frac = cfg.require("plasma_power_frac")
    kappa_frac = cfg.require("plasma_kappa_frac")
    thermal_frac = 1.0 - power_frac - kappa_frac
    if thermal_frac < 0.0 or thermal_frac > 1.0:
        raise BlacklightError("Invalid plasma distribution fractions.")
    use_p = cfg.require("plasma_use_p") if model == PlasmaModel.ti_te_beta else True
    kwargs = {}
    if model == PlasmaModel.ti_te_beta and not use_p:
        kwargs = dict(gamma=cfg.require("plasma_gamma"),
                      gamma_i=cfg.require("plasma_gamma_i"),
                      gamma_e=cfg.require("plasma_gamma_e"))
    if power_frac != 0.0:
        kwargs.update(power_p=cfg.require("plasma_p"),
                      gamma_min=cfg.require("plasma_gamma_min"),
                      gamma_max=cfg.require("plasma_gamma_max"))
    if kappa_frac != 0.0:
        kwargs.update(kappa=cfg.require("plasma_kappa"),
                      w=cfg.require("plasma_w"))
    return synchrotron.PlasmaParams(
        mu=cfg.require("plasma_mu"),
        ne_ni=cfg.require("plasma_ne_ni"),
        model=model,
        use_p=use_p,
        rat_low=cfg.require("plasma_rat_low") if model == PlasmaModel.ti_te_beta else 1.0,
        rat_high=cfg.require("plasma_rat_high") if model == PlasmaModel.ti_te_beta else 1.0,
        power_frac=power_frac,
        kappa_frac=kappa_frac,
        **kwargs)


def cut_params_from_config(cfg) -> synchrotron.CutParams:
    return synchrotron.CutParams(
        rho_min=cfg.require("cut_rho_min"), rho_max=cfg.require("cut_rho_max"),
        n_e_min=cfg.require("cut_n_e_min"), n_e_max=cfg.require("cut_n_e_max"),
        p_gas_min=cfg.require("cut_p_gas_min"), p_gas_max=cfg.require("cut_p_gas_max"),
        theta_e_min=cfg.require("cut_theta_e_min"),
        theta_e_max=cfg.require("cut_theta_e_max"),
        b_min=cfg.require("cut_b_min"), b_max=cfg.require("cut_b_max"),
        sigma_min=cfg.require("cut_sigma_min"), sigma_max=cfg.require("cut_sigma_max"),
        beta_inverse_min=cfg.require("cut_beta_inverse_min"),
        beta_inverse_max=cfg.require("cut_beta_inverse_max"))


def load_grid_file(cfg, path: str, dtype=jnp.float64):
    """Load one snapshot file in the configured format."""
    fmt = cfg.require("simulation_format")
    kappa_name = None
    if cfg.require("plasma_model") == PlasmaModel.code_kappa:
        kappa_name = cfg.require("simulation_kappa_name")
    if fmt == SimulationFormat.athena:
        return load_athdf(path, kappa_name=kappa_name, dtype=dtype)
    if fmt == SimulationFormat.athenak:
        from blacklight_tpu.grid.athenak import load_athenak
        expected = {"a": cfg.require("simulation_a"),
                    "bhmass_msun": cfg.require("simulation_m_msun"),
                    "density_cgs": cfg.require("simulation_rho_cgs"),
                    "mu": cfg.require("plasma_mu")}
        return load_athenak(path, kappa_name=kappa_name, dtype=dtype,
                            plasma_gamma=cfg.plasma_gamma, expected=expected)
    if fmt == SimulationFormat.iharm3d:
        from blacklight_tpu.grid.iharm3d import load_iharm3d
        return load_iharm3d(path, cfg, dtype=dtype)
    from blacklight_tpu.grid.harm3d import load_harm3d
    return load_harm3d(path, cfg, dtype=dtype)


def load_grid(cfg, snapshot: Optional[int] = None, dtype=jnp.float64):
    """Load the snapshot (or slow-light window) for one output run.

    Returns (grid, snapshot_time); snapshot_time is 0 without slow light.
    """
    if cfg.require("simulation_multiple") and bool(cfg.slow_light_on):
        from blacklight_tpu.grid.slowlight import load_slow_window
        return load_slow_window(cfg, snapshot or 0, dtype=dtype)
    path = cfg.require("simulation_file")
    if cfg.require("simulation_multiple") and snapshot is not None:
        # Input files are numbered from simulation_start
        # (simulation_reader.cpp:305-307)
        path = format_filename(path, cfg.require("simulation_start") + snapshot)
    return load_grid_file(cfg, path, dtype=dtype), 0.0


def _sampler_options(cfg, snapshot_time: float = 0.0) -> SamplerOptions:
    return SamplerOptions(
        interp=cfg.require("simulation_interp"),
        block_interp=bool(cfg.simulation_block_interp),
        fallback_nan=cfg.require("fallback_nan"),
        fallback_rho=cfg.fallback_rho or 0.0,
        fallback_pgas=cfg.fallback_pgas or 0.0,
        fallback_kappa=cfg.fallback_kappa or 0.0,
        has_kappa=cfg.require("plasma_model") == PlasmaModel.code_kappa,
        snapshot_time=snapshot_time,
        slow_interp=bool(cfg.slow_interp) if bool(cfg.slow_light_on) else False)


def make_simulation_coeff_fns(cfg, grid, geom, frequencies, momentum_factors,
                              *, polarized: bool = False,
                              snapshot_time: float = 0.0):
    """Build (coeff_fn, cell_fn) closures for the fused transfer scans."""
    from blacklight_tpu.constants import Coordinates

    spin = cfg.require("simulation_a")
    sim_coords = "cks" if cfg.require("simulation_coord") == Coordinates.cks \
        else "sks"
    if grid.coords != sim_coords:
        raise BlacklightError(
            "simulation_coord does not match the loaded grid's coordinates.")
    rho_unit = cfg.require("simulation_rho_cgs")
    plasma = plasma_params_from_config(cfg)
    cuts_val = cut_params_from_config(cfg)
    cuts_geo = GeometricCuts.from_config(cfg)
    sampler_opts = _sampler_options(cfg, snapshot_time)
    nu0 = float(np.asarray(frequencies)[0])
    camera_x = geom.cam_x
    # Population constants are host-side scalars (Bessel/2F1 evaluations of
    # static plasma parameters); this function may be called under jit, so
    # force eager evaluation
    with jax.ensure_compile_time_eval():
        pl_consts = synchrotron.powerlaw_constants(plasma) \
            if plasma.power_frac != 0.0 else None
        kp_consts = synchrotron.kappa_constants(plasma, polarized=polarized) \
            if plasma.kappa_frac != 0.0 else None

    def state_at(pos, prims=None):
        samples = sample_grid(grid, pos, spin, sampler_opts) \
            if prims is None else dict(prims)
        keep_geo = geometric_keep(pos, spin, camera_x, cuts_geo)
        if polarized:
            # The reference's sampler never assigns values at geometrically
            # cut samples, leaving ZEROS that the polarized tetrad still
            # consumes (simulation_sampling.cpp:692-693 'continue' after
            # Zero()); mirror that.
            samples = {k: (jnp.where(keep_geo, v, 0.0)
                           if k not in ("off_grid", "nan_mask") else v)
                       for k, v in samples.items()}
        state = synchrotron.fluid_state(pos, samples, spin, plasma, rho_unit,
                                        coords=sim_coords)
        keep_val = synchrotron.value_cuts(state, cuts_val)
        b_zero = ((samples["bb1"] == 0.0) & (samples["bb2"] == 0.0)
                  & (samples["bb3"] == 0.0))
        nan_mask = samples.get("nan_mask")
        if nan_mask is None:
            nan_mask = jnp.zeros_like(keep_geo)
        return state, keep_geo, keep_val, b_zero, nan_mask

    def coeff_fn(pos, kcov, momentum_factors=momentum_factors, prims=None):
        state, keep_geo, keep_val, b_zero, nan_mask = state_at(pos, prims)
        sin_b, cos_b, sin2_b, u_dot_k = synchrotron.pitch_angle(
            pos, kcov, state, spin)
        nu_cgs = -u_dot_k[..., None] * frequencies[None, :] \
            * momentum_factors[..., None]
        coeffs = synchrotron.all_coefficients(
            nu_cgs, nu0, state, sin_b, cos_b, sin2_b, plasma, polarized,
            pl_consts=pl_consts, kp_consts=kp_consts)
        # Coupling skipped (-> zero coefficients) where cut or B = 0
        # (simulation_coefficients.cpp:257-262, 361-375, 393-394). Samples
        # the reference would NaN (fallback_nan off-grid) carry finite
        # placeholders plus the bad mask: the transfer NaN-poisons those
        # pixels, reproducing the reference's NaN propagation without NaN
        # primals in the differentiable graph.
        keep = (keep_geo & keep_val & ~b_zero)[..., None]
        out = {k: jnp.where(keep, v, 0.0) for k, v in coeffs.items()}
        # Geometric cuts happen BEFORE sampling in the reference
        # (simulation_sampling.cpp:237-295 'continue'), so only uncut
        # off-grid samples would carry its NaN values
        bad = jnp.broadcast_to((nan_mask & keep_geo)[..., None],
                               out["j_i"].shape)
        if polarized:
            out["ucon"] = state["ucon"]
            out["bcon"] = state["bcon"]
            out["b_zero"] = b_zero
            out["bad"] = bad
            return out
        return out["j_i"], out["alpha_i"], bad

    def cell_fn(pos, kcov, prims=None):
        state, keep_geo, keep_val, _, nan_mask = state_at(pos, prims)
        cells = synchrotron.cell_values(state)
        keep = (keep_geo & keep_val & ~nan_mask)[..., None]
        return jnp.where(keep, cells, jnp.nan)

    log_scale = synchrotron.log_j_scale(nu0)
    return coeff_fn, cell_fn, log_scale


def make_simulation_renderer(cfg, snapshot: Optional[int] = None,
                             early_exit: bool = True,
                             wavefront: bool = False,
                             wavefront_batch: bool = True,
                             kernel: bool = True):
    """Build a reusable simulation-model renderer.

    Returns (render_fn, geom, rays, frequencies, mass_msun) where
    render_fn(positions, directions, momentum_factors) renders any pixel
    bundle (root camera or adaptive child blocks) to a NumPy image dict.

    kernel: use the fused Pallas kernel (ops/pallas_simulation.py) on
    eligible configurations (single-block SKS grid, thermal ti_te_beta,
    unpolarized image_light only, rk4/rk2 - dp needs kernel="force" -
    float32, running on a real TPU backend). Rays whose window brick
    overflowed (incoherent
    bundles) are transparently re-rendered on the exact XLA path; kernel
    values agree with the XLA path to ~1e-4 relative (float32
    reassociation + polynomial arccos/arctan2 - see
    tests/test_pallas_simulation.py). Pass kernel=False for bit-level
    XLA-path reproducibility. Forward rendering only; gradient callers
    use integrate_unpolarized directly.

    wavefront: allow the windowed deduplicated sampler (grid/wavefront.py)
    on eligible bundles when the Pallas kernel is off/ineligible. Values
    are bit-identical to the per-step sampler. Default OFF: measured on
    v5e it is SLOWER than the per-step scan (21.4k vs 32.1k rays/s at
    1024^2 - the window dedup/expansion work exceeds the gathers it
    saves); kept for A/B and for architectures where the gather floor
    dominates.

    wavefront_batch: evaluate the synchrotron coefficient chain over the
    whole window in one vmapped batch instead of per step (see
    transfer/unpolarized.integrate_unpolarized).
    """
    from blacklight_tpu import pipeline

    dtype = pipeline.compute_dtype(cfg)
    bh_m, bh_a, mass_msun = pipeline.bh_mass_spin(cfg)
    grid, snapshot_time = load_grid(cfg, snapshot=snapshot, dtype=dtype)
    use_block_interp = (bool(cfg.simulation_block_interp)
                        and cfg.require("simulation_interp"))
    if use_block_interp:
        from blacklight_tpu.grid.amr import with_amr_table
        grid = with_amr_table(grid)
    elif grid.times is None:
        # The packed-corner table is only consumed on the replicated,
        # non-slow-light, clamped-to-block sampling path
        # (grid/sampling.py use_packed); skip its 8x HBM footprint when
        # block interpolation or slow light routes around it.
        from blacklight_tpu.grid.athena import with_packed_corners
        grid = with_packed_corners(grid)
    geom, rays, frequencies = make_camera(cfg, bh_m=bh_m, bh_a=bh_a, dtype=dtype)
    params = pipeline.geodesic_params_from_config(cfg, bh_m, bh_a)
    opts = ImageOptions.from_config(cfg)
    slow = cfg.require("simulation_multiple") and bool(cfg.slow_light_on)
    if slow:
        import dataclasses
        opts = dataclasses.replace(opts, track_sample_times=True)
    polarized = bool(cfg.require("image_polarization")) if cfg.require("image_light") \
        else False
    any_image = (cfg.require("image_light") or opts.time or opts.length
                 or opts.lam or opts.emission or opts.tau or opts.lambda_ave
                 or opts.emission_ave or opts.tau_int or opts.crossings)

    def sample_stored(stored):
        """Sampled primitives at stored geodesic samples ((S, B) per var)
        for the sampling checkpoint."""
        spin = cfg.require("simulation_a")
        sampler_opts = _sampler_options(cfg)
        return jax.lax.map(
            lambda p: sample_grid(grid, p, spin, sampler_opts),
            stored[0].pos)

    # One jit per (stored-kind) variant: momentum factors and stored
    # samples are traced arguments so repeated pixel bundles of one shape
    # share the executable (tile dispatch would otherwise recompile)
    # The grid rides through jit as a pytree ARGUMENT (see
    # grid/athena.py pytree registration): closure capture would embed
    # the snapshot - up to GBs with the packed table - as HLO constants.
    # Wavefront eligibility (host-side, static): unpolarized scan path with
    # the packed-corner table and no slow-light time axis.
    wf_ok = (bool(wavefront) and not polarized and any_image
             and not use_block_interp and grid.times is None
             and grid.prim_packed is not None)

    # Fused Pallas kernel eligibility (ops/pallas_simulation.py scope):
    # unpolarized light-only image, thermal ti_te_beta, trilinear
    # clamped-to-block sampling, rk4/rk2, float32, single-block SKS grid.
    from blacklight_tpu.constants import PlasmaModel, RayIntegrator
    plasma_k = plasma_params_from_config(cfg)
    aux_planes = (opts.time or opts.length or opts.lam or opts.emission
                  or opts.tau or opts.lambda_ave or opts.emission_ave
                  or opts.tau_int or opts.crossings
                  or opts.track_sample_times)
    integ_name = {RayIntegrator.dp: "dp", RayIntegrator.rk4: "rk4",
                  RayIntegrator.rk2: "rk2"}.get(
        cfg.require("ray_integrator"))
    # dp routes to the XLA path unless the kernel is FORCED: its adaptive
    # error controller makes kernel-vs-scan parity statistical rather than
    # per-ray, and its anchor drift latches ~30% of rays into the XLA
    # fallback, leaving the dp kernel measured slightly SLOWER than the
    # XLA dp path (30.6k vs 31.6k rays/s at 1024^2).
    if integ_name == "dp" and kernel != "force":
        integ_name = None
    kernel_render = None
    if (kernel and jax.default_backend() == "tpu"
            and not polarized and cfg.require("image_light")
            and not aux_planes and cfg.require("render_num_images") == 0
            and not slow and not use_block_interp
            and cfg.require("simulation_interp")
            and integ_name is not None and dtype == jnp.float32
            and plasma_k.model == PlasmaModel.ti_te_beta
            and plasma_k.power_frac == 0.0 and plasma_k.kappa_frac == 0.0):
        from blacklight_tpu.ops import pallas_simulation as psim

        kernel_grid = psim.prepare_kernel_grid(grid)
        if kernel_grid is not None:
            from blacklight_tpu.models import synchrotron as _synchro

            sp_k = psim.sim_kernel_params(
                cfg, GeometricCuts.from_config(cfg), plasma_k,
                cut_params_from_config(cfg))
            nu0_k = float(np.asarray(frequencies)[0])
            freqs_np = np.asarray(frequencies)
            cam_np = np.asarray(geom.cam_x)

            # dp's adaptive steps sweep much farther per attempt in the
            # far field, so its anchor drift needs shorter brick windows
            # to keep the overflow-fallback fraction down.
            kernel_window = 4 if integ_name == "dp" else psim.WINDOW
            kernel_jit = jax.jit(lambda p, d, m, kg: psim.render_simulation(
                p, d, m, freqs_np, params, sp_k, kg, mass_msun, cam_np,
                _synchro.log_j_scale(nu0_k), integrator=integ_name,
                window=kernel_window))
            log_js_k = _synchro.log_j_scale(nu0_k)
            # Phased dispatch (render_simulation_phased): a kernel block
            # runs until its SLOWEST ray terminates, so the monolithic
            # launch pays sum-of-block-maxima (~1.4x the mean step count
            # on the bench workload); compacting survivors every
            # KERNEL_PHASE_STEPS bounds that tax to the final phase.
            # carry-io mode supports rk4/rk2 only, and padding to the
            # phase chunk makes small bundles not worth it.
            use_phased = (KERNEL_PHASED and integ_name in ("rk4", "rk2")
                          and params.ray_max_steps > KERNEL_PHASE_STEPS)
            phase_jit = None
            if use_phased:
                phase_jit = jax.jit(
                    lambda p, d, m, c, nb, kg:
                    psim.render_simulation_phase(
                        p, d, m, c, nb, freqs_np, params, sp_k, kg,
                        mass_msun, cam_np, log_js_k,
                        integrator=integ_name, window=kernel_window,
                        phase_steps=KERNEL_PHASE_STEPS))

            def kernel_render(positions, directions, momentum_factors):
                order = psim.spatial_order(positions)
                inv = np.empty_like(order)
                inv[order] = np.arange(len(order))
                if use_phased and len(order) >= KERNEL_PHASE_CHUNK:
                    i_img, flags, nsamp, ovf = psim.render_simulation_phased(
                        np.asarray(positions, np.float32)[order],
                        np.asarray(directions, np.float32)[order],
                        np.asarray(momentum_factors, np.float32)[order],
                        freqs_np, params, sp_k, kernel_grid, mass_msun,
                        cam_np, log_js_k, integrator=integ_name,
                        window=kernel_window,
                        phase_steps=KERNEL_PHASE_STEPS,
                        chunk_rays=KERNEL_PHASE_CHUNK, phase_jit=phase_jit)
                else:
                    i_img, flags, nsamp, ovf = kernel_jit(
                        jnp.asarray(positions, dtype)[order],
                        jnp.asarray(directions, dtype)[order],
                        jnp.asarray(momentum_factors, dtype)[order],
                        kernel_grid)
                ovf = np.asarray(ovf)[inv]
                out = {"I_nu": np.asarray(i_img)[inv],
                       "_flags": np.asarray(flags)[inv],
                       "_n_samples": np.asarray(nsamp)[inv],
                       "_kernel_fallback": ovf}
                if ovf.any():
                    # Rays whose window brick overflowed re-render on the
                    # exact XLA path, padded to power-of-two buckets so
                    # repeated fallbacks share executables. Phased
                    # dispatch drops latched rays at phase boundaries, so
                    # their flags/n_samples also come from the fallback.
                    idx = np.nonzero(ovf)[0]
                    n = len(idx)
                    m = max(256, 1 << (n - 1).bit_length())
                    pad_idx = np.concatenate(
                        [idx, np.repeat(idx[:1], m - n)])
                    sub = fused_for(False, False)(
                        jnp.asarray(positions)[pad_idx],
                        jnp.asarray(directions)[pad_idx],
                        jnp.asarray(momentum_factors)[pad_idx], grid)
                    out["I_nu"][idx] = np.asarray(sub["I_nu"])[:n]
                    out["_flags"][idx] = np.asarray(sub["_flags"])[:n]
                    out["_n_samples"][idx] = \
                        np.asarray(sub["_n_samples"])[:n]
                return out

    # Fused polarized Pallas kernel (ops/pallas_polarized.py scope):
    # full-Stokes light-only image, thermal ti_te_beta, trilinear
    # clamped-to-block sampling, rk4/rk2, float32, single-block SKS grid.
    # OPT-IN ONLY (kernel="force"): measured on v5e it is ~28% slower than
    # the XLA streaming path under the identical tile protocol (36.0k vs
    # 50.0k rays/s at 512 steps) - the window-4/(8,8)-brick variant that
    # Mosaic can compile in reasonable time re-integrates each window in
    # sweep B and pays brick DMAs every 4 steps, which the streaming XLA
    # path's gathers beat. Kept for A/B (scripts/bench_polarized.py).
    if (kernel == "force" and jax.default_backend() == "tpu"
            and polarized and cfg.require("image_light")
            and not aux_planes and cfg.require("render_num_images") == 0
            and not slow and not use_block_interp
            and cfg.require("simulation_interp")
            and integ_name in ("rk4", "rk2") and dtype == jnp.float32
            and plasma_k.model == PlasmaModel.ti_te_beta
            and plasma_k.power_frac == 0.0 and plasma_k.kappa_frac == 0.0):
        from blacklight_tpu.ops import pallas_polarized as ppol
        from blacklight_tpu.ops import pallas_simulation as psim
        from blacklight_tpu.transfer.polarized import camera_stokes

        kernel_grid = psim.prepare_kernel_grid(grid)
        if kernel_grid is not None:
            from blacklight_tpu.models import synchrotron as _synchro

            sp_k = psim.sim_kernel_params(
                cfg, GeometricCuts.from_config(cfg), plasma_k,
                cut_params_from_config(cfg))
            nu0_k = float(np.asarray(frequencies)[0])
            freqs_np = np.asarray(frequencies)
            cam_np = np.asarray(geom.cam_x)
            rot_split = bool(cfg.require("image_rotation_split"))
            log_js = _synchro.log_j_scale(nu0_k)

            def _pol_kernel_call(p, d, m, kg):
                nn_re, nn_im, flags, nsamp, ovf, bad = \
                    ppol.render_polarized(
                        p, d, m, freqs_np, params, sp_k, kg, mass_msun,
                        cam_np, log_js, integrator=integ_name,
                        rotation_split=rot_split)
                si, sq, su, sv = camera_stokes(
                    nn_re, nn_im, p, d, params.bh_a, params.bh_m,
                    params.ray_flat, jnp.asarray(freqs_np, jnp.float32),
                    jnp.asarray(geom.u_con, jnp.float32),
                    jnp.asarray(geom.u_cov, jnp.float32),
                    jnp.asarray(geom.vert_con_c, jnp.float32), log_js)
                nan = jnp.float32(jnp.nan)
                poison = (flags & opts.fallback_nan)[:, None] | bad
                return ({"I_nu": jnp.where(poison, nan, si),
                         "Q_nu": jnp.where(poison, nan, sq),
                         "U_nu": jnp.where(poison, nan, su),
                         "V_nu": jnp.where(poison, nan, sv)},
                        flags, nsamp, ovf)

            pol_kernel_jit = jax.jit(_pol_kernel_call)
            _order_fn = psim.spatial_order

            def kernel_render(positions, directions, momentum_factors):
                order = _order_fn(positions, block=ppol.ROWS_P * psim.LANES)
                inv = np.empty_like(order)
                inv[order] = np.arange(len(order))
                stokes, flags, nsamp, ovf = pol_kernel_jit(
                    jnp.asarray(positions, dtype)[order],
                    jnp.asarray(directions, dtype)[order],
                    jnp.asarray(momentum_factors, dtype)[order],
                    kernel_grid)
                ovf = np.asarray(ovf)[inv]
                out = {k: np.asarray(v)[inv] for k, v in stokes.items()}
                out["_flags"] = np.asarray(flags)[inv]
                out["_n_samples"] = np.asarray(nsamp)[inv]
                out["_kernel_fallback"] = ovf
                if ovf.any():
                    idx = np.nonzero(ovf)[0]
                    n = len(idx)
                    m = max(256, 1 << (n - 1).bit_length())
                    pad_idx = np.concatenate(
                        [idx, np.repeat(idx[:1], m - n)])
                    sub = fused_for(False, False)(
                        jnp.asarray(positions)[pad_idx],
                        jnp.asarray(directions)[pad_idx],
                        jnp.asarray(momentum_factors)[pad_idx], grid)
                    for k in ("I_nu", "Q_nu", "U_nu", "V_nu"):
                        out[k][idx] = np.asarray(sub[k])[:n]
                return out

    del plasma_k

    @functools.lru_cache(maxsize=8)
    def fused_for(has_stored, has_prims, use_wf=False):
        def fused(positions, directions, momentum_factors, stored,
                  stored_prims, grid_arg):
            coeff_fn, cell_fn, log_scale = make_simulation_coeff_fns(
                cfg, grid_arg, geom, frequencies, momentum_factors,
                polarized=polarized, snapshot_time=snapshot_time)
            wf = None
            if use_wf:
                from blacklight_tpu.grid.wavefront import make_wavefront_prep
                n_sub = positions.shape[0] // WAVEFRONT_SUBTILE
                expand = "onehot" if grid_arg.prim_packed.dtype == \
                    jnp.float32 else "gather"
                mode = WAVEFRONT_MODE if grid_arg.prim.shape[1] == 1 \
                    else "dedup"
                prep_fn, prims_fn = make_wavefront_prep(
                    grid_arg, cfg.require("simulation_a"),
                    _sampler_options(cfg, snapshot_time), n_sub,
                    WAVEFRONT_CAPACITY, expand=expand, mode=mode,
                    brick=WAVEFRONT_BRICK)
                wf = (prep_fn, prims_fn, WAVEFRONT_WINDOW)
            image = {}
            if any_image:
                if polarized:
                    from blacklight_tpu.transfer.polarized import (
                        integrate_polarized)
                    need_cells = (opts.lambda_ave or opts.emission_ave
                                  or opts.tau_int)
                    image = integrate_polarized(
                        positions, directions, momentum_factors, frequencies,
                        params=params, coeff_fn=coeff_fn, opts=opts,
                        mass_msun=mass_msun, camera_x=geom.cam_x,
                        camera_u_con=geom.u_con, camera_u_cov=geom.u_cov,
                        camera_vert_con_c=geom.vert_con_c,
                        log_j_scale=log_scale,
                        rotation_split=bool(
                            cfg.require("image_rotation_split")),
                        stored=stored, stored_prims=stored_prims,
                        cell_fn=cell_fn if need_cells else None)
                else:
                    need_cells = (opts.lambda_ave or opts.emission_ave
                                  or opts.tau_int)
                    image = integrate_unpolarized(
                        positions, directions, momentum_factors, frequencies,
                        params=params, coeff_fn=coeff_fn, opts=opts,
                        mass_msun=mass_msun, camera_x=geom.cam_x,
                        cell_fn=cell_fn if need_cells else None,
                        early_exit=early_exit, log_j_scale=log_scale,
                        stored=stored, stored_prims=stored_prims,
                        wavefront=wf, wavefront_batch=wavefront_batch)

            if cfg.require("render_num_images") > 0:
                from blacklight_tpu.transfer.rendering import (
                    integrate_rendering)
                rgb, flags, n_samp = integrate_rendering(
                    positions, directions, params=params, cell_fn=cell_fn,
                    render_images=tuple(cfg.render_images),
                    mass_msun=mass_msun, stored=stored)
                image = dict(image)
                image["rendering"] = rgb
                image.setdefault("_flags", flags)
                image.setdefault("_n_samples", n_samp)
            return image

        if has_stored and has_prims:
            return jax.jit(fused)
        if has_stored:
            return jax.jit(lambda p, d, m, s, g: fused(p, d, m, s, None, g))
        return jax.jit(lambda p, d, m, g: fused(p, d, m, None, None, g))

    def _render_one(positions, directions, momentum_factors,
                    stored, stored_prims):
        if stored_prims is not None:
            return fused_for(True, True)(positions, directions,
                                         momentum_factors, stored,
                                         stored_prims, grid)
        if stored is not None:
            return fused_for(True, False)(positions, directions,
                                          momentum_factors, stored, grid)
        if kernel_render is not None:
            return kernel_render(positions, directions, momentum_factors)
        if wf_ok and positions.shape[0] % WAVEFRONT_SUBTILE == 0:
            image = fused_for(False, False, True)(
                positions, directions, momentum_factors, grid)
            if not np.asarray(image["_wavefront_overflow"]).any():
                image = dict(image)
                del image["_wavefront_overflow"]
                return image
            # Some window's unique-cell count exceeded the table capacity
            # (incoherent bundle); the slot-aliased values are wrong there,
            # so redo this bundle on the exact per-step path.
        return fused_for(False, False)(positions, directions,
                                       momentum_factors, grid)

    def render_fn(positions, directions, momentum_factors,
                  stored=None, stored_prims=None):
        # The polarized integrator streams samples (segmented geodesic
        # replay, transfer/polarized.py) just like the unpolarized scan,
        # so no pixel-axis chunking is needed at any bundle size.
        image = jax.tree.map(np.asarray, _render_one(
            positions, directions, momentum_factors, stored,
            stored_prims))
        if slow and "_t_min" in image:
            _check_time_extrapolation(image, grid, snapshot_time, snapshot)
        return image

    render_fn.sample_stored = sample_stored
    render_fn.geodesic_params = params
    return render_fn, geom, rays, frequencies, mass_msun


def _check_time_extrapolation(image, grid, snapshot_time, snapshot):
    """Reproduce the reference's slow-light extrapolation diagnostics
    (simulation_sampling.cpp:578-616): error when any pixel's samples
    extend beyond the time window by more than the tolerance, warn when
    within it."""
    from blacklight_tpu.grid.slowlight import EXTRAPOLATION_TOLERANCE as TOL

    times = np.asarray(grid.times)
    t_min = np.asarray(image["_t_min"]) + snapshot_time
    t_max = np.asarray(image["_t_max"]) + snapshot_time
    num_pix = t_min.shape[0]
    finite = np.isfinite(t_min)
    src_over = np.where(finite, times[-1] - t_min, 0.0)
    cam_over = np.where(np.isfinite(t_max), t_max - times[0], 0.0)
    n_src_large = int(np.sum(src_over > TOL))
    n_src_small = int(np.sum((src_over > 0.0) & (src_over <= TOL)))
    n_cam_large = int(np.sum(cam_over > TOL))
    n_cam_small = int(np.sum((cam_over > 0.0) & (cam_over <= TOL)))
    sn = 0 if snapshot is None else snapshot
    if n_cam_large:
        raise BlacklightError(
            f"Snapshot {sn} at time {snapshot_time} requires significant "
            f"extrapolation forward in time ({n_cam_large}/{num_pix} pixels, "
            f"by up to {np.max(cam_over):.6g} gravitational times).")
    if n_src_large:
        raise BlacklightError(
            f"Snapshot {sn} at time {snapshot_time} requires significant "
            f"extrapolation backward in time ({n_src_large}/{num_pix} "
            f"pixels, by up to {np.max(src_over):.6g} gravitational times).")
    from blacklight_tpu.utils.errors import blacklight_warning
    if n_cam_small:
        blacklight_warning(
            f"Snapshot {sn} at time {snapshot_time} requires moderate "
            f"extrapolation forward in time ({n_cam_small}/{num_pix} pixels, "
            f"by up to {np.max(cam_over):.6g} gravitational times).")
    if n_src_small:
        blacklight_warning(
            f"Snapshot {sn} at time {snapshot_time} requires moderate "
            f"extrapolation backward in time ({n_src_small}/{num_pix} "
            f"pixels, by up to {np.max(src_over):.6g} gravitational times).")


def render_simulation_image(cfg, snapshot: Optional[int] = None,
                            early_exit: bool = True):
    """Unpolarized (or polarized, if configured) simulation-model image.

    Returns (image_dict, camera_rays, frequencies, mass_msun).
    """
    render_fn, geom, rays, frequencies, mass_msun = make_simulation_renderer(
        cfg, snapshot=snapshot, early_exit=early_exit)
    image = render_fn(rays.positions, rays.directions, rays.momentum_factors)
    return image, rays, frequencies, mass_msun
