"""Probe which transcendental primitives Mosaic (Pallas TPU) lowers.

The polarized coupling (transfer/polarized_coupling.py) uses sinh/cosh/
expm1/sin/cos/tanh/log1p/cbrt/pow; the fused kernels must shim whatever
fails to lower. Compiles one tiny kernel per op and reports ok/fail plus
max abs error vs the XLA value on a smoke input.

    python scripts/bench_mosaic_prims.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OPS = {
    "exp": jnp.exp,
    "expm1": jnp.expm1,
    "log": jnp.log,
    "log1p": jnp.log1p,
    "sin": jnp.sin,
    "cos": jnp.cos,
    "tan": jnp.tan,
    "tanh": jnp.tanh,
    "sinh": jnp.sinh,
    "cosh": jnp.cosh,
    "sqrt": jnp.sqrt,
    "cbrt": jnp.cbrt,
    "rsqrt": jax.lax.rsqrt,
    "pow0.96": lambda x: x ** 0.96,
    "pow-0.52": lambda x: (x + 1.0) ** -0.5175,
    "atan": jnp.arctan,
    "atan2": lambda x: jnp.arctan2(x, 1.0 + x),
    "acos": lambda x: jnp.arccos(jnp.clip(x, -1.0, 1.0)),
    "erf": jax.scipy.special.erf,
}


def main():
    x = np.linspace(0.05, 2.5, 8 * 128, dtype=np.float32).reshape(8, 128)
    for name, fn in OPS.items():
        def kernel(x_ref, o_ref, fn=fn):
            o_ref[:] = fn(x_ref[:])

        try:
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            )(x)
            ref = np.asarray(fn(jnp.asarray(x)))
            err = float(np.nanmax(np.abs(np.asarray(out) - ref)
                                  / (np.abs(ref) + 1e-6)))
            print(f"{name:10s} OK   rel_err={err:.2e}", flush=True)
        except Exception as exc:  # noqa: BLE001
            msg = str(exc).split("\n")[0][:100]
            print(f"{name:10s} FAIL {msg}", flush=True)


if __name__ == "__main__":
    main()
