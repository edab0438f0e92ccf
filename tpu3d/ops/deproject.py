"""Pinhole back-projection (depth frame → masked point cloud).

Reference parity: the CPU loop (src/pipeline.cpp:68-84) keeps pixels with
``0 < z <= clipping_max`` and converts BGR→RGB/255 colors; the CUDA kernel
(cuda/pointcloud.cu:11-84) instead hardcodes ``z < 10.0`` and compacts
points with ``atomicAdd`` — non-deterministic order. We follow the CPU
semantics (config-driven clip) and replace compaction with a dense validity
mask: output row r = pixel (r // W, r % W), always, so the op is a pure
reshape-level transform that XLA fuses with the preprocessing — and the
result is bit-deterministic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu3d.types import PointCloud


@jax.jit
def deproject(
    depth_m: jnp.ndarray,
    rgb_bgr: jnp.ndarray | None,
    intrinsics: jnp.ndarray,
    clipping_max: jnp.ndarray,
) -> PointCloud:
    """Back-project an (H, W) float depth map (meters).

    Args:
      depth_m: f32[H, W] depth in meters (0 = invalid).
      rgb_bgr: u8[H, W, 3] BGR image or None.
      intrinsics: f32[3, 3] pinhole K.
      clipping_max: scalar max depth in meters.
    Returns:
      PointCloud with capacity H*W, row-major pixel order, masked validity.
    """
    h, w = depth_m.shape
    fx, fy = intrinsics[0, 0], intrinsics[1, 1]
    cx, cy = intrinsics[0, 2], intrinsics[1, 2]

    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    z = depth_m.astype(jnp.float32)
    x = (u - cx) * z / fx
    y = (v - cy) * z / fy
    pts = jnp.stack([x, y, z], axis=-1).reshape(-1, 3)
    mask = ((z > 0.0) & (z <= jnp.asarray(clipping_max, jnp.float32))).reshape(-1)

    colors = None
    if rgb_bgr is not None:
        colors = (rgb_bgr[..., ::-1].astype(jnp.float32) / 255.0).reshape(-1, 3)

    return PointCloud(points=pts, mask=mask, colors=colors)
