"""Visualization: thread-safe scene store + WebGL HTML / PNG exports."""

from tpu3d.viz.viewer import SceneViewer

__all__ = ["SceneViewer"]
