"""Microbenchmark round 2: (a) XLA gather marginal rate when batching many
steps' indices into one op (two-phase design), (b) Mosaic tpu.dynamic_gather
throughput for same-shape take_along_axis (slab design).

    python scripts/bench_gather_micro2.py [--cpu]
"""

import argparse
import json
import time

import numpy as np

K = 50


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
    C = 128 * 64 * 64
    rng = np.random.default_rng(0)
    results = {}

    def emit(name, **kv):
        results[name] = kv
        print(name, json.dumps({kk: (round(vv, 2) if isinstance(vv, float)
                                     else vv) for kk, vv in kv.items()}),
              flush=True)

    def timeit_scan(step_fn, init_carry, reps=3, k=K):
        @jax.jit
        def run(carry):
            def body(c, _):
                return step_fn(c), 0.0
            c, _ = jax.lax.scan(body, carry, None, length=k)
            return sum(jnp.sum(leaf.astype(jnp.float32))
                       for leaf in jax.tree.leaves(c))
        out = run(init_carry)
        np.asarray(out)
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(run(init_carry))
            times.append(time.perf_counter() - t0)
        return min(times) / k

    # (a) XLA batched gather: N indices per op from (rows, C) table
    for rows in (8, 64):
        table = jnp.asarray(rng.standard_normal((rows, C)), jnp.float32)
        for n_idx in (16384, 1048576):
            idx0 = jnp.asarray(rng.integers(0, C, (n_idx,)), jnp.int32)

            def step(c, table=table, n_idx=n_idx):
                ix, acc = c
                got = table[:, ix]
                return ((ix + 1000003) % C,
                        acc + got[0] + got[-1])

            dt = timeit_scan(step,
                             (idx0, jnp.zeros((n_idx,), jnp.float32)),
                             k=max(4, K // (n_idx // 16384)))
            emit(f"xla_r{rows}_n{n_idx}",
                 us=dt * 1e6, m_idx_per_s=n_idx / dt / 1e6)

    # (b) Mosaic dynamic_gather: same-shape take_along_axis
    T_INNER = 256

    def run_kernel(kern, inputs, out_shape, name, n_gathered):
        try:
            f = pl.pallas_call(
                kern,
                out_shape=out_shape,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                          for _ in inputs],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                interpret=interp,
                compiler_params=None if interp else pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024),
            )
            jf = jax.jit(lambda *a: jnp.sum(f(*a)))
            np.asarray(jf(*inputs))
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(jf(*inputs))
                times.append(time.perf_counter() - t0)
            per = min(times) / T_INNER
            emit(name, us_per_iter=per * 1e6,
                 m_idx_per_s=n_gathered / per / 1e6)
        except Exception as exc:
            emit(name, error=f"{type(exc).__name__}: {exc}"[:200])

    # axis=1 (within-row lane gather), 8 sublanes = 8 variables
    for n in (512, 4096, 32768):
        tab = jnp.asarray(rng.standard_normal((8, n)), jnp.float32)
        ix = jnp.asarray(rng.integers(0, n, (8, n)), jnp.int32)

        def k_ax1(tab_ref, idx_ref, out_ref, n=n):
            tab = tab_ref[:]
            ix0 = idx_ref[:]

            def body(i, acc):
                ixi = (ix0 + i) % n
                return acc + jnp.take_along_axis(tab, ixi, axis=1)

            out_ref[:] = jax.lax.fori_loop(
                0, T_INNER, body, jnp.zeros(tab.shape, jnp.float32))

        run_kernel(k_ax1, (tab, ix),
                   jax.ShapeDtypeStruct((8, n), jnp.float32),
                   f"pl_dg_ax1_n{n}", 8 * n)

    # axis=0 (within-column sublane gather)
    for s in (8, 64, 512):
        tab = jnp.asarray(rng.standard_normal((s, 128)), jnp.float32)
        ix = jnp.asarray(rng.integers(0, s, (s, 128)), jnp.int32)

        def k_ax0(tab_ref, idx_ref, out_ref, s=s):
            tab = tab_ref[:]
            ix0 = idx_ref[:]

            def body(i, acc):
                ixi = (ix0 + i) % s
                return acc + jnp.take_along_axis(tab, ixi, axis=0)

            out_ref[:] = jax.lax.fori_loop(
                0, T_INNER, body, jnp.zeros(tab.shape, jnp.float32))

        run_kernel(k_ax0, (tab, ix),
                   jax.ShapeDtypeStruct((s, 128), jnp.float32),
                   f"pl_dg_ax0_s{s}", s * 128)

if __name__ == "__main__":
    main()
