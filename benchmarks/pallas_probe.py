"""Probe: which ops lower through Mosaic on this TPU (arctan2, argmin,
dot_general variants) — run once per toolchain to inform kernel design."""

import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def probe(name, kernel, x):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(x.shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        s = float(jnp.sum(out))
        print(f"{name}: OK (sum={s:.3f})", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"{name}: FAIL ({type(e).__name__}: {str(e)[:120]})",
              file=sys.stderr)


def main():
    x = jnp.linspace(-2, 2, 8 * 256).reshape(8, 256).astype(jnp.float32)

    probe("arctan2", lambda i, o: o.__setitem__(
        slice(None), jnp.arctan2(i[:], 0.5 + 0.0 * i[:])), x)
    probe("argmin_f32", lambda i, o: o.__setitem__(
        slice(None),
        jnp.broadcast_to(
            jnp.argmin(i[:], axis=1)[:, None].astype(jnp.float32), i.shape
        )), x)
    probe("arctan", lambda i, o: o.__setitem__(
        slice(None), jnp.arctan(i[:])), x)
    probe("cumsum_lanes", lambda i, o: o.__setitem__(
        slice(None), jnp.cumsum(i[:], axis=1)), x)


if __name__ == "__main__":
    main()
