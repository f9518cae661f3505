"""Differentiable rendering: scene-parameter optimization steps.

This is new capability relative to the reference (BASELINE.json north
star): gradients of the rendered image w.r.t. materials, lights, and
vertex positions flow through the path integrator. Discrete choices
(hit ids, light picks, RNG) are naturally detached — gradients follow
the continuous radiance path through the selected decisions.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..camera import Camera
from ..scene.types import Scene
from ..utils.pytree import pytree_dataclass


@pytree_dataclass
class TrainableParams:
    """The differentiable slice of a Scene."""

    base_color: jnp.ndarray  # f32[M, 4]
    emissive: jnp.ndarray  # f32[M, 4]
    light_pos: jnp.ndarray  # f32[L, 3]
    light_color: jnp.ndarray  # f32[L, 3]
    positions: jnp.ndarray  # f32[T, 3, 3] vertex positions


def params_from_scene(scene: Scene) -> TrainableParams:
    # jnp.asarray: scene leaves may be host numpy (scene/build.py), but
    # trainable params need device arrays (.at updates, grads).
    return TrainableParams(
        base_color=jnp.asarray(scene.materials.base_color),
        emissive=jnp.asarray(scene.materials.emissive),
        light_pos=jnp.asarray(scene.lights.pos),
        light_color=jnp.asarray(scene.lights.color),
        positions=jnp.asarray(scene.geometry.positions),
    )


def apply_params(scene: Scene, params: TrainableParams) -> Scene:
    return scene.replace(
        materials=scene.materials.replace(
            base_color=params.base_color, emissive=params.emissive
        ),
        lights=scene.lights.replace(
            pos=params.light_pos, color=params.light_color
        ),
        geometry=scene.geometry.replace(positions=params.positions),
    )


def render_loss(
    params: TrainableParams,
    scene: Scene,
    camera: Camera,
    target: jnp.ndarray,
    seed,
    depth: int = 2,
    mesh=None,
):
    """L2 image loss of a 1-spp render against `target`."""
    s = apply_params(scene, params)
    if mesh is None:
        from .reference import trace_sample

        # use_pallas=False: gradients flow through the jnp trace path
        img = trace_sample(
            s, camera, jnp.asarray(seed, jnp.uint32), depth, False,
            use_pallas=False,
        )
    else:
        from ..parallel.sharding import render_sample_sharded

        img = render_sample_sharded(
            mesh, s, camera, seed, depth, False, use_pallas=False
        )
    diff = img - target
    return jnp.mean(diff * diff)


@partial(jax.jit, static_argnames=("depth",))
def train_step(
    params: TrainableParams,
    scene: Scene,
    camera: Camera,
    target: jnp.ndarray,
    seed,
    lr: float = 0.05,
    depth: int = 2,
):
    """One SGD step on scene parameters (single-device)."""
    loss, grads = jax.value_and_grad(render_loss)(
        params, scene, camera, target, seed, depth
    )
    new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
    return loss, new_params, grads


def restir_render_loss(
    params: TrainableParams,
    scene: Scene,
    camera: Camera,
    state,
    target: jnp.ndarray,
    seed,
    config=None,
    luts=None,
):
    """L2 image loss of ONE realtime ReSTIR+SVGF frame against `target`.

    Differentiable end-to-end (BASELINE.md:22-23): gradients flow
    through DI/GI resolve radiance, the temporal/spatial reservoir
    payload selections (statistics detached by
    restir.reservoir.resampling_weight's custom VJP), and the a-trous
    filter (frozen-weight custom VJP, denoise.svgf._wavelet_core).
    """
    from .restir import RenderConfig, render_frame

    if config is None:
        config = RenderConfig(differentiable=True)
    s = apply_params(scene, params)
    channels, _ = render_frame(s, camera, state, seed, config, luts=luts)
    diff = channels["image"] - target
    return jnp.mean(diff * diff)


def restir_train_step(
    params: TrainableParams,
    scene: Scene,
    camera: Camera,
    state,
    target: jnp.ndarray,
    seed,
    lr: float = 0.05,
    config=None,
    luts=None,
):
    """One SGD step on scene parameters through the realtime pipeline."""
    loss, grads = jax.value_and_grad(restir_render_loss)(
        params, scene, camera, state, target, seed, config, luts
    )
    new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
    return loss, new_params, grads


@partial(jax.jit, static_argnames=("mesh", "depth"))
def train_step_sharded(
    mesh,
    params: TrainableParams,
    scene: Scene,
    camera: Camera,
    target: jnp.ndarray,
    seed,
    lr: float = 0.05,
    depth: int = 2,
):
    """One SGD step with the pixel axis sharded over `mesh`.

    The forward pass uses no collectives (tiles independent, scene
    replicated); the backward pass psums scene-parameter gradients over
    the mesh axis (inserted by shard_map's transpose).
    """
    loss, grads = jax.value_and_grad(render_loss)(
        params, scene, camera, target, seed, depth, mesh
    )
    new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
    return loss, new_params, grads
