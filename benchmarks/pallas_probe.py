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
    probe("arccos", lambda i, o: o.__setitem__(
        slice(None), jnp.arccos(jnp.clip(i[:], -1.0, 1.0))), x)
    probe("cos", lambda i, o: o.__setitem__(
        slice(None), jnp.cos(i[:])), x)

    # Kernel-epilogue building blocks for the transposed sweep outputs:
    # (a) MXU-side hist assembly+transpose: (B, 31) cum dotted with a
    #     constant (31, 34) map on the FIRST axis -> (34, B) planes;
    # (b) jnp.swapaxes relayout of a (128, 128) f32 tile.
    y = jnp.linspace(0, 1, 128 * 128).reshape(128, 128).astype(jnp.float32)

    def dot_t(i, o):
        a = jnp.ones((31, 128), jnp.float32)  # stand-in constant map
        o[:] = jax.lax.dot_general(
            a, i[:, :31], (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) * 0.0 + i[:]

    probe("dot_general_axis0_contract", dot_t, y)
    probe("swapaxes_128", lambda i, o: o.__setitem__(
        slice(None), jnp.swapaxes(i[:], 0, 1)), y)


if __name__ == "__main__":
    main()
