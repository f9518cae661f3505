"""strolle_tpu — a TPU-native differentiable real-time GI renderer.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
Patryk27/strolle (ReSTIR DI/GI, SVGF denoising, software BVH, Hillaire
atmosphere, path-traced reference mode), designed for TPU: SoA pytrees,
jitted stage functions, Pallas kernels for the traversal/filter hot
paths, and `shard_map` screen-tile parallelism across device meshes.
"""

__version__ = "0.1.0"

from .camera import Camera, make_camera  # noqa: F401
from .scene.types import Scene  # noqa: F401
from .scene.dynamics import SceneEditor  # noqa: F401
from .renderer import CameraSettings, Renderer  # noqa: F401
