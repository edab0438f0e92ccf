"""tpu3d — TPU-native 3D point-cloud registration & bin-picking framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
C++/CUDA pipeline (stojicnnnn/3DVision, mounted at /root/reference): depth
preprocessing, pinhole deprojection, voxel downsampling, normal estimation,
FPFH features, RANSAC coarse + ICP fine registration, pick-pose computation
and robot sequencing — designed TPU-first (static shapes, masked buffers,
MXU-friendly blockwise ops, Pallas kernels for the hot NN search, multi-chip
sharding via jax.sharding) rather than translated.
"""

import jax as _jax

# Geometry code: matmul-based distances, covariances and normal equations
# need true f32 accumulation. The TPU default (fast bf16 passes) corrupts
# radius/threshold decisions, so the framework pins the default up-front;
# individual hot ops that tolerate lower precision opt back down locally.
_jax.config.update("jax_default_matmul_precision", "highest")

from tpu3d.config import PipelineConfig, RegistrationConfig, load_config
from tpu3d.registration import (
    bucket_capacity,
    prepare_cloud,
    register_pair,
    register_pair_multiscale,
    register_prepared,
)
from tpu3d.types import FPFHFeatures, PointCloud, RegistrationResult

__version__ = "0.1.0"

__all__ = [
    "FPFHFeatures",
    "PipelineConfig",
    "PointCloud",
    "RegistrationConfig",
    "RegistrationResult",
    "bucket_capacity",
    "load_config",
    "prepare_cloud",
    "register_pair",
    "register_pair_multiscale",
    "register_prepared",
    "__version__",
]
