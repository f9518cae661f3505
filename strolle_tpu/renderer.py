"""Per-camera render orchestration — the CameraController facade.

Mirrors Engine's camera API (strolle/src/lib.rs:252-294:
create_camera / update_camera / render_camera / delete_camera) and
CameraController's lifecycle (camera_controller.rs:45-87): each camera
owns the temporal state that outlives one frame (reservoirs, denoiser
moments, reference-mode accumulator), and that state is invalidated
when the viewport or mode changes (strolle/src/camera.rs:17-48).

Modes (CameraMode, strolle/src/camera.rs:83-168):
    "image"        - full ReSTIR DI+GI pipeline with SVGF denoise
    "di_diffuse" / "di_specular" / "gi_diffuse" / "gi_specular"
                   - single-channel debug views
    "reference"    - accumulating brute-force path tracer (ground truth)
    "bvh_heatmap"  - traversal-cost visualization
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Any, Hashable

import jax.numpy as jnp

from .camera import Camera
from .models import reference as ref_mod
from .models import restir as restir_mod
from .scene.types import Scene


@dataclass
class CameraSettings:
    """Per-camera render settings (the CameraMode analogue)."""

    mode: str = "image"
    denoise: bool = True
    include_sky: bool = False
    reference_depth: int = 5


@dataclass
class _CameraRec:
    camera: Camera
    settings: CameraSettings
    state: Any = None  # restir RenderState | RefAccumulator | None


class Renderer:
    """Holds per-camera temporal state; renders frames on demand."""

    def __init__(self):
        self._cameras: dict[Hashable, _CameraRec] = {}

    # -- camera CRUD (lib.rs:252-294) ------------------------------------

    def create_camera(
        self,
        handle: Hashable,
        camera: Camera,
        settings: CameraSettings | None = None,
    ):
        self._cameras[handle] = _CameraRec(
            camera=camera, settings=settings or CameraSettings()
        )

    def update_camera(
        self,
        handle: Hashable,
        camera: Camera | None = None,
        settings: CameraSettings | None = None,
    ):
        """Updates camera/settings; temporal state is dropped when the
        viewport or the mode family changes (camera.rs:17-48 —
        is_invalidated_by)."""
        rec = self._cameras[handle]
        invalidate = False
        if camera is not None:
            if (camera.height, camera.width) != (
                rec.camera.height,
                rec.camera.width,
            ):
                invalidate = True
            rec.camera = camera
        if settings is not None:
            if settings.mode != rec.settings.mode or (
                settings.denoise != rec.settings.denoise
            ):
                invalidate = True
            rec.settings = settings
        if invalidate:
            rec.state = None

    def delete_camera(self, handle: Hashable):
        self._cameras.pop(handle, None)

    def has_camera(self, handle: Hashable) -> bool:
        return handle in self._cameras

    # -- rendering (camera_controller.rs:87-174) -------------------------

    def render_camera(
        self, handle: Hashable, scene: Scene, seed, luts=None
    ) -> jnp.ndarray:
        """Renders one frame for the camera; returns the [H, W, 3] image
        for its mode and advances the camera's temporal state."""
        rec = self._cameras[handle]
        mode = rec.settings.mode

        if mode == "bvh_heatmap":
            from .models.heatmap import render_heatmap

            return render_heatmap(scene, rec.camera)

        if mode == "reference":
            if rec.state is None:
                rec.state = ref_mod.init_accumulator(rec.camera)
            image, rec.state = ref_mod.render_reference(
                scene,
                rec.camera,
                rec.state,
                jnp.asarray(seed, jnp.uint32),
                depth=rec.settings.reference_depth,
                include_sky=rec.settings.include_sky,
                luts=luts,
            )
            return image

        if rec.state is None:
            rec.state = restir_mod.init_state(rec.camera)
        config = restir_mod.RenderConfig(
            mode=mode,
            denoise=rec.settings.denoise,
            needs_di=True,
            needs_gi=mode in ("image", "gi_diffuse", "gi_specular"),
            include_sky=rec.settings.include_sky,
        )
        channels, rec.state = restir_mod.render_frame(
            scene,
            rec.camera,
            rec.state,
            jnp.asarray(seed, jnp.uint32),
            config,
            luts=luts,
        )
        if mode == "image":
            return channels["image"]
        key = mode if mode in channels else "image"
        out = channels[key]
        return out if out.ndim == 3 else out[..., None].repeat(3, -1)
