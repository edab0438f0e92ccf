"""Where will traced computation actually run?

``jax.default_backend()`` reports the highest-priority BACKEND, which is
wrong inside a ``jax.default_device(cpu)`` context — the pipeline's
``use_gpu=false`` host mode (pipeline.cpp:43-55 analog) runs on the CPU
device of a TPU-backend process, and dispatching a compiled Pallas kernel
there fails ("Only interpret mode is supported on CPU backend"). Every
engine/precision auto-switch must consult the DEFAULT DEVICE first.
"""

from __future__ import annotations

import jax


def compute_platform() -> str:
    """Platform of the device new computations land on: honors the
    ``jax.default_device`` context/config, falls back to the default
    backend."""
    try:
        dev = jax.config.jax_default_device
    except AttributeError:  # very old jax — no such config
        dev = None
    if dev is not None:
        platform = getattr(dev, "platform", None)
        if platform is not None:
            return platform
    return jax.default_backend()


def on_tpu() -> bool:
    return compute_platform() == "tpu"
