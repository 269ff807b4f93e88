"""Microbenchmark: Pallas one-hot MXU table lookup (fused sim kernel core).

Phase-C design: per (1024-ray subtile, step), each ray selects its packed
corner column (64 values) from a small VMEM-resident window table
(R in 256..512) via one-hot matmul on the MXU:

    vals(B, 64) = onehot(B, R) @ table(R, 64)

Measures us/step for the one-hot build + matmul (+ optional 2-pass
bf16 hi/lo exactness scheme) with everything VMEM-resident.

    python scripts/bench_onehot_kernel.py [--cpu]
"""

import argparse
import json
import time

import numpy as np

T_INNER = 128
B = 1024


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
    rng = np.random.default_rng(0)

    def bench(name, kern, inputs, out_shape, n_vals):
        try:
            f = pl.pallas_call(
                kern,
                out_shape=out_shape,
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                          for _ in inputs],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                interpret=interp,
                compiler_params=None if interp else pltpu.CompilerParams(
                    vmem_limit_bytes=64 * 1024 * 1024),
            )
            jf = jax.jit(lambda *a: jnp.sum(f(*a)))
            np.asarray(jf(*inputs))
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(jf(*inputs))
                times.append(time.perf_counter() - t0)
            per = min(times) / T_INNER
            print(name, json.dumps(dict(
                us_per_iter=round(per * 1e6, 2),
                m_vals_per_s=round(n_vals / per / 1e6, 1))), flush=True)
        except Exception as exc:
            print(name, json.dumps(dict(
                error=f"{type(exc).__name__}: {exc}"[:300])), flush=True)

    for R in (256, 512):
        tab = jnp.asarray(rng.standard_normal((R, 64)), jnp.float32)
        ids = jnp.asarray(rng.integers(0, R, (B, 1)), jnp.int32)

        # f32 single-pass (Mosaic f32 matmul = multi-pass internally)
        def k_f32(tab_ref, ids_ref, out_ref, R=R):
            tab = tab_ref[:]
            ids0 = ids_ref[:]

            def body(i, acc):
                ids = (ids0 + i) % R
                iota = jax.lax.broadcasted_iota(jnp.int32, (B, R), 1)
                oh = (iota == ids).astype(jnp.float32)
                return acc + jnp.dot(oh, tab,
                                     preferred_element_type=jnp.float32)

            out_ref[:] = jax.lax.fori_loop(
                0, T_INNER, body, jnp.zeros((B, 64), jnp.float32))

        bench(f"onehot_f32_R{R}", k_f32, (tab, ids),
              jax.ShapeDtypeStruct((B, 64), jnp.float32), B * 64)

        # 2-pass bf16 hi/lo (exact to ~1.5e-5 relative)
        hi = tab.astype(jnp.bfloat16)
        lo = (tab - hi.astype(jnp.float32)).astype(jnp.bfloat16)

        def k_2pass(hi_ref, lo_ref, ids_ref, out_ref, R=R):
            h = hi_ref[:]
            l = lo_ref[:]
            ids0 = ids_ref[:]

            def body(i, acc):
                ids = (ids0 + i) % R
                iota = jax.lax.broadcasted_iota(jnp.int32, (B, R), 1)
                oh = (iota == ids).astype(jnp.bfloat16)
                return (acc
                        + jnp.dot(oh, h, preferred_element_type=jnp.float32)
                        + jnp.dot(oh, l, preferred_element_type=jnp.float32))

            out_ref[:] = jax.lax.fori_loop(
                0, T_INNER, body, jnp.zeros((B, 64), jnp.float32))

        bench(f"onehot_2pass_R{R}", k_2pass, (hi, lo, ids),
              jax.ShapeDtypeStruct((B, 64), jnp.float32), B * 64)

    # VPU select-ladder reference point at R=64
    R = 64
    tab = jnp.asarray(rng.standard_normal((R, 64)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, R, (B, 1)), jnp.int32)

    def k_vpu(tab_ref, ids_ref, out_ref):
        tab = tab_ref[:]
        ids0 = ids_ref[:]

        def body(i, acc):
            ids = (ids0 + i) % R
            v = jnp.zeros((B, 64), jnp.float32)
            for r in range(R):
                sel = (ids == r).astype(jnp.float32)      # (B, 1)
                v = v + sel * tab[r, :][None, :]
            return acc + v

        out_ref[:] = jax.lax.fori_loop(
            0, T_INNER, body, jnp.zeros((B, 64), jnp.float32))

    bench("vpu_ladder_R64", k_vpu, (tab, ids),
          jax.ShapeDtypeStruct((B, 64), jnp.float32), B * 64)


if __name__ == "__main__":
    main()
