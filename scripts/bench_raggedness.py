"""Quantify the fused simulation kernel's ragged-exit tax.

A kernel block runs until its SLOWEST ray terminates (the while cond is
any(alive)), so block cost ~ max(n_samples) while useful work ~
mean(n_samples). This script renders the BASELINE.md mock workload
through the kernel, groups rays exactly as the dispatcher does
(ops/pallas_simulation.spatial_order), and reports

    waste = sum_blocks max(nsamp) / sum_blocks mean(nsamp)

per block size - the upper bound a phase-compaction scheme (relaunching
compacted survivors every K steps) could recover.

    python scripts/bench_raggedness.py [--res 1024] [--steps 2000]
"""

import argparse
import pathlib
import subprocess
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--grid", default="128,64,64")
    ap.add_argument("--phase", type=int, default=512,
                    help="phase length for the compaction model")
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

    import numpy as np

    from blacklight_tpu import read_config
    from blacklight_tpu.ops.pallas_simulation import spatial_order
    from blacklight_tpu.pipeline_simulation import make_simulation_renderer

    cfg = read_config(str(root / "tests/fixtures/golden_sim_rk4_32.input"))
    cfg.simulation_file = mock
    cfg.camera_resolution = args.res
    cfg.ray_max_steps = args.steps
    cfg.precision = "float32"
    render_fn, geom, rays, freqs, _ = make_simulation_renderer(cfg)
    img = render_fn(np.asarray(rays.positions), np.asarray(rays.directions),
                    np.asarray(rays.momentum_factors))
    nsamp = np.asarray(img["_n_samples"], np.int64)
    order = spatial_order(np.asarray(rays.positions))
    ns = nsamp[order]
    print(f"res={args.res} steps={args.steps} nsamp mean={ns.mean():.0f} "
          f"p50={np.percentile(ns, 50):.0f} p95={np.percentile(ns, 95):.0f} "
          f"max={ns.max()}")
    for block in (1024, 4096, 8192, 16384):
        nb = len(ns) // block
        b = ns[:nb * block].reshape(nb, block)
        waste = b.max(axis=1).sum() / b.mean(axis=1).sum()
        # Phase-compaction model: every `phase` steps survivors are
        # compacted into fresh full blocks (global pool, same order).
        ph = args.phase
        cost = 0
        rem = np.sort(ns)[::-1].copy()
        while len(rem):
            take = np.minimum(rem, ph)
            nb2 = max(1, len(rem) // block)
            bb = take[:nb2 * block].reshape(nb2, block)
            cost += bb.max(axis=1).sum()
            if len(take) > nb2 * block:
                cost += take[nb2 * block:].max()
            rem = rem[rem > ph] - ph
        waste_c = cost / ns.mean() / (len(ns) / block)
        print(f"block={block:6d}: waste={waste:.3f} "
              f"phased(K={ph})={waste_c:.3f}")


if __name__ == "__main__":
    main()
