"""Timing ablation of the fused simulation kernel (ops/pallas_simulation).

Renders ONE coherent 32x32 tile of a 1024^2 camera through the kernel with
stages disabled via the `ablate` knob (timing-only - ablated stages return
wrong values) to attribute step time:

    python scripts/bench_kernel_ablate.py [--rows 32] [--window 8]
        [--brick 12,12] [--margin 4,4] [--integrator rk4]

Round-4 splits at (12,12)/W8/ROWS=32 on v5e (mid-disk tile, rk4, 2000
steps): full 54.7 ms/block; base (rk4 + transfer + loop; everything
ablated) 29.8 ms; predicated gathers ~18 ms; fluid state, thermal
coefficients, locate and window DMAs each ~0-3 ms (latency-hidden).
"""

import argparse
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=None)
    ap.add_argument("--window", type=int, default=None)
    ap.add_argument("--brick", default=None)
    ap.add_argument("--margin", default=None)
    ap.add_argument("--integrator", default="rk4",
                    choices=["dp", "rk4", "rk2"])
    ap.add_argument("--grid", default="128,64,64")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--tile-row", type=int, default=256)
    ap.add_argument("--tile-col", type=int, default=640)
    ap.add_argument("--no-unroll", action="store_true")
    ap.add_argument("--quick", action="store_true",
                    help="only the full and fully-ablated variants")
    args = ap.parse_args()

    n_r, n_th, n_ph = (int(s) for s in args.grid.split(","))
    mock = f"/tmp/bench_mock_{n_r}x{n_th}x{n_ph}.athdf"
    root = pathlib.Path(__file__).resolve().parents[1]
    if not pathlib.Path(mock).exists():
        subprocess.run(
            [sys.executable, str(root / "scripts/generate_mock_simulation.py"),
             mock, "--n_r", str(n_r), "--n_th", str(n_th),
             "--n_ph", str(n_ph), "--r_min", "1.916", "--r_max", "52.2",
             "--pert_amp", "0.1"], check=True)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from blacklight_tpu import pipeline, read_config
    from blacklight_tpu.camera import make_camera
    from blacklight_tpu.models import synchrotron
    from blacklight_tpu.models.cuts import GeometricCuts
    from blacklight_tpu.ops import pallas_simulation as psim
    from blacklight_tpu.pipeline_simulation import (
        cut_params_from_config, load_grid, plasma_params_from_config)

    cfg = read_config(str(root / "tests/fixtures/golden_sim_rk4_32.input"))
    cfg.simulation_file = mock
    cfg.camera_resolution = 1024
    cfg.ray_max_steps = args.steps
    cfg.precision = "float32"
    from blacklight_tpu.constants import RayIntegrator
    cfg.ray_integrator = getattr(RayIntegrator, args.integrator)
    bh_m, bh_a, mass_msun = pipeline.bh_mass_spin(cfg)
    geom, rays, freqs = make_camera(cfg, bh_m=bh_m, bh_a=bh_a,
                                    dtype=jnp.float32)
    grid, _ = load_grid(cfg, dtype=jnp.float32)
    brick = tuple(int(s) for s in args.brick.split(",")) if args.brick \
        else psim.BRICK
    margin = tuple(int(s) for s in args.margin.split(",")) if args.margin \
        else psim.MARGIN
    kg = psim.prepare_kernel_grid(grid, brick=brick)
    params = pipeline.geodesic_params_from_config(cfg, bh_m, bh_a)
    sp = psim.sim_kernel_params(cfg, GeometricCuts.from_config(cfg),
                                plasma_params_from_config(cfg),
                                cut_params_from_config(cfg))
    nu0 = float(np.asarray(freqs)[0])
    res, tile = 1024, 32
    t = (np.arange(args.tile_row, args.tile_row + tile)[:, None] * res
         + np.arange(args.tile_col, args.tile_col + tile)[None, :])
    patch = (t.reshape(4, 8, 2, 16).transpose(0, 2, 1, 3)).reshape(-1)
    P = np.asarray(rays.positions)[patch]
    D = np.asarray(rays.directions)[patch]
    M = np.asarray(rays.momentum_factors)[patch]

    kwargs = dict(integrator=args.integrator, brick=brick, margin=margin)
    if args.window:
        kwargs["window"] = args.window
    if args.rows:
        kwargs["rows"] = args.rows

    base = ["gather", "coeff", "locate", "window", "fluid"]
    if args.quick:
        groups = ([], base)
    else:
        groups = ([], ["window"], ["gather"], ["fluid"], ["coeff"],
                  ["locate"], base,
                  # fine ablations of the base itself (round 5)
                  base + ["sks"], base + ["rt"], base + ["keep"],
                  base + ["weights"], base + ["mid"], base + ["renorm"],
                  base + ["rhs1"],
                  base + ["sks", "rt", "keep", "weights", "mid", "renorm"])
    for ab in groups:
        fn = jax.jit(lambda p, d, m, k, ab=tuple(ab): psim.render_simulation(
            p, d, m, np.asarray(freqs), params, sp, k, mass_msun,
            np.asarray(geom.cam_x), synchrotron.log_j_scale(nu0),
            ablate=ab, unroll=not args.no_unroll, **kwargs))
        out = fn(P, D, M, kg)
        jax.block_until_ready(out[0])
        # The remote axon service can memoize an execution with inputs
        # identical to the warmup's (round-5 saw a bogus 0.2 ms for a
        # 50 ms kernel): perturb the momentum factors per rep (same
        # executable, different inputs) and take the median of 3.
        times = []
        for rep in range(3):
            m_rep = jnp.asarray(M) * (1.0 + 1e-6 * (rep + 1))
            m_rep.block_until_ready()
            t0 = time.perf_counter()
            out = fn(P, D, m_rep, kg)
            jax.block_until_ready(out[0])
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[1]
        print(f"ablate={ab} run_ms={dt * 1000:.1f} "
              f"nsamp_mean={float(np.asarray(out[2]).mean()):.0f} "
              f"ovf={float(np.asarray(out[3]).mean()):.3f}", flush=True)


if __name__ == "__main__":
    main()
