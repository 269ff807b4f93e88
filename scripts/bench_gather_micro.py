"""Microbenchmark: random-access strategies for the simulation sampler.

The simulation path is gather-rate-bound (docs/performance.md). This script
measures, on the real chip, whether a Pallas kernel can beat the XLA HBM
gather with the grid table resident in VMEM — the design question for the
fused simulation kernel.

Methodology (axon remote backend): every op runs K times inside one jitted
lax.scan (per-jit-call dispatch is ~0.5-1 ms RPC and block_until_ready
alone under-reports), indices vary per iteration through the carry, and a
scalar reduction is pulled to host.

    python scripts/bench_gather_micro.py [--cpu]
"""

import argparse
import json
import time

import numpy as np

K = 100   # scan iterations per timed call


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interp = args.cpu
    C = 128 * 64 * 64          # mock-grid cell count
    B = 16384
    rng = np.random.default_rng(0)
    results = {}

    def timeit_scan(step_fn, init_carry, reps=3):
        """Time K scan iterations of step_fn; returns seconds/iteration."""

        @jax.jit
        def run(carry):
            def body(c, _):
                return step_fn(c), 0.0
            c, _ = jax.lax.scan(body, carry, None, length=K)
            return jax.tree.map(
                lambda a: jnp.asarray(a, jnp.float32).sum()
                if a.dtype != jnp.int32 else a.astype(jnp.float32).sum(),
                c)
        out = run(init_carry)
        np.asarray(jax.tree.leaves(out)[0])
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(init_carry)
            np.asarray(jax.tree.leaves(out)[0])
            times.append(time.perf_counter() - t0)
        return min(times) / K

    # --- XLA packed column gather (the current sampler op), inside scan ---
    table64 = jnp.asarray(rng.standard_normal((64, C)), jnp.float32)
    idx0 = jnp.asarray(rng.integers(0, C, size=(B,)), jnp.int32)

    def step_xla64(c):
        ix, acc = c
        got = table64[:, ix]                       # (64, B)
        return ((ix + 1000003) % C, acc + got[0] + got[63])

    dt = timeit_scan(step_xla64, (idx0, jnp.zeros((B,), jnp.float32)))
    results["xla_packed64_16k"] = dict(us=dt * 1e6, idx_per_s=B / dt)

    table8 = table64[:8]

    def step_xla8(c):
        ix, acc = c
        got = table8[:, ix]
        return ((ix + 1000003) % C, acc + got[0] + got[7])

    dt = timeit_scan(step_xla8, (idx0, jnp.zeros((B,), jnp.float32)))
    results["xla_packed8_16k"] = dict(us=dt * 1e6, idx_per_s=B / dt)

    # XLA take_along_axis form of the shared-table lane gather
    idx8 = jnp.broadcast_to(idx0[None, :], (8, B))

    def step_xla_taa(c):
        ix, acc = c
        got = jnp.take_along_axis(table8, (ix + acc.astype(jnp.int32)[:1, :1])
                                  % C, axis=1)
        return (ix, acc + got[:1, :B])

    try:
        dt = timeit_scan(step_xla_taa,
                         (idx8, jnp.zeros((1, B), jnp.float32)))
        results["xla_taa8_16k"] = dict(us=dt * 1e6, idx_per_s=B / dt)
    except Exception as exc:
        results["xla_taa8_16k"] = dict(error=str(exc)[:200])

    # --- Pallas: take_along_axis lane gather from a shared VMEM table ----
    # operand (8, C) = 8 variables' flat cell tables, one per sublane;
    # indices (8, B) broadcast per variable; out[v, b] = tab[v, ix[b]].
    def make_taa_kernel(n_sub, n_cells, n_b, t_inner):
        def kern(tab_ref, idx_ref, out_ref):
            tab = tab_ref[:]
            ix0 = idx_ref[:]

            def body(i, acc):
                ix = (ix0 + i * 1000003) % n_cells
                got = jnp.take_along_axis(tab, ix, axis=1)   # (n_sub, n_b)
                return acc + got

            out_ref[:] = jax.lax.fori_loop(
                0, t_inner, body, jnp.zeros((n_sub, n_b), jnp.float32))
        return kern

    T_INNER = 64
    for n_b in (128, 1024, 4096):
        tab = jnp.asarray(rng.standard_normal((8, C)), jnp.float32)
        ixp = jnp.asarray(
            rng.integers(0, C, size=(8, n_b)), jnp.int32)
        try:
            f = pl.pallas_call(
                make_taa_kernel(8, C, n_b, T_INNER),
                out_shape=jax.ShapeDtypeStruct((8, n_b), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                interpret=interp,
                compiler_params=None if interp else pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )
            jf = jax.jit(f)
            out = jf(tab, ixp)
            np.asarray(out)
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(jf(tab, ixp))
                times.append(time.perf_counter() - t0)
            per = min(times) / T_INNER
            results[f"pl_taa8_b{n_b}"] = dict(
                us_per_iter=per * 1e6, idx_per_s=n_b / per)
        except Exception as exc:
            results[f"pl_taa8_b{n_b}"] = dict(
                error=f"{type(exc).__name__}: {exc}"[:250])

    # clustered-index variant (consecutive steps hit nearby cells)
    n_b = 4096
    base = rng.integers(0, C - 64, size=(8, 1))
    ix_clus = jnp.asarray(base + rng.integers(0, 64, size=(8, n_b)),
                          jnp.int32)
    tab = jnp.asarray(rng.standard_normal((8, C)), jnp.float32)
    try:
        f = pl.pallas_call(
            make_taa_kernel(8, C, n_b, T_INNER),
            out_shape=jax.ShapeDtypeStruct((8, n_b), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interp,
            compiler_params=None if interp else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        jf = jax.jit(f)
        np.asarray(jf(tab, ix_clus))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(jf(tab, ix_clus))
            times.append(time.perf_counter() - t0)
        per = min(times) / T_INNER
        results["pl_taa8_clustered"] = dict(
            us_per_iter=per * 1e6, idx_per_s=n_b / per)
    except Exception as exc:
        results["pl_taa8_clustered"] = dict(
            error=f"{type(exc).__name__}: {exc}"[:250])

    # 64-sublane variant: the full packed-corner fetch in one gather
    tab64v = jnp.asarray(rng.standard_normal((64, C)), jnp.float32)
    ix64 = jnp.asarray(rng.integers(0, C, size=(64, 1024)), jnp.int32)
    try:
        f = pl.pallas_call(
            make_taa_kernel(64, C, 1024, T_INNER),
            out_shape=jax.ShapeDtypeStruct((64, 1024), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interp,
            compiler_params=None if interp else pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        jf = jax.jit(f)
        np.asarray(jf(tab64v, ix64))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(jf(tab64v, ix64))
            times.append(time.perf_counter() - t0)
        per = min(times) / T_INNER
        results["pl_taa64_b1024"] = dict(
            us_per_iter=per * 1e6, idx_per_s=1024 / per)
    except Exception as exc:
        results["pl_taa64_b1024"] = dict(
            error=f"{type(exc).__name__}: {exc}"[:250])

    # Pallas while_loop floor (fused multiply-add only)
    idx2 = jnp.asarray(rng.integers(0, C, size=(32, 128)), jnp.int32)

    def k_loop(idx_ref, out_ref):
        x = idx_ref[:].astype(jnp.float32)

        def body(i, acc):
            return acc * 1.000001 + x

        out_ref[:] = jax.lax.fori_loop(0, T_INNER, body,
                                       jnp.zeros((32, 128), jnp.float32))

    try:
        f = pl.pallas_call(
            k_loop,
            out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interp,
        )
        jf = jax.jit(f)
        np.asarray(jf(idx2))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(jf(idx2))
            times.append(time.perf_counter() - t0)
        results["pl_loop_floor"] = dict(
            us_per_iter=min(times) / T_INNER * 1e6)
    except Exception as exc:
        results["pl_loop_floor"] = dict(
            error=f"{type(exc).__name__}: {exc}"[:250])

    for k, v in results.items():
        print(k, json.dumps({kk: (round(vv, 2) if isinstance(vv, float)
                                  else vv) for kk, vv in v.items()}))


if __name__ == "__main__":
    main()
