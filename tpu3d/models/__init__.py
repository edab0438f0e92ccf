"""Model/asset handling: PLY I/O, procedural demo assets, reference prep."""

from tpu3d.models.ply import load_ply, save_ply
from tpu3d.models.procedural import (
    generate_box_mask,
    generate_reference_grid,
    generate_scene,
)

__all__ = [
    "generate_box_mask",
    "generate_reference_grid",
    "generate_scene",
    "load_ply",
    "save_ply",
]
