"""Ray tracing entry points (closest-hit / any-hit) over the scene.

Two execution strategies:

* **Brute force (chunked)** — `lax.scan` over fixed-size triangle
  chunks with a running closest-hit carry. No acceleration structure,
  fully regular compute: on TPU this is *faster* than traversal for
  small scenes (Cornell-sized) because the VPU stays dense. Memory is
  bounded by the chunk size.
* **BVH traversal** — vectorized stack-based traversal over the
  flattened BVH (strolle_tpu.bvh), mirroring ray.rs:114-266; used when
  the scene is large. A Pallas packet-traversal kernel provides the
  speed-of-light path (ops/pallas/traverse.py).

The dispatcher `trace` picks a strategy from scene size/config.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..scene.types import Scene
from .hit import TriangleHit
from .intersect import ray_triangle

_BRUTE_CHUNK = 128
#: Scenes up to this many triangles use brute force by default.
BRUTE_FORCE_MAX_TRIS = 4096


def _pad_tris(positions: jnp.ndarray, chunk: int):
    t = positions.shape[0]
    pad = (-t) % chunk
    if pad:
        positions = jnp.concatenate(
            [positions, jnp.zeros((pad,) + positions.shape[1:], positions.dtype)]
        )
    return positions, t + pad


def trace_closest_brute(
    scene: Scene, o: jnp.ndarray, d: jnp.ndarray, chunk: int = _BRUTE_CHUNK
) -> TriangleHit:
    """Closest hit over all triangles; o/d are [..., 3]."""
    positions, total = _pad_tris(scene.geometry.positions, chunk)
    n_chunks = total // chunk
    tris = positions.reshape(n_chunks, chunk, 3, 3)
    batch_shape = o.shape[:-1]

    # init derived from o so the carry inherits shard_map varying axes
    zero = o[..., 0] * 0.0
    init = (
        zero + jnp.inf,
        zero.astype(jnp.int32) - 1,
        zero,
        zero,
    )

    ob = o[..., None, :]
    db = d[..., None, :]

    def body(carry, inp):
        chunk_idx, tri_chunk = inp
        bt, btri, bu, bv = carry
        t, u, v, _ = ray_triangle(
            ob, db, tri_chunk[:, 0], tri_chunk[:, 1], tri_chunk[:, 2]
        )  # [..., chunk]
        j = jnp.argmin(t, axis=-1)
        tj = jnp.take_along_axis(t, j[..., None], axis=-1)[..., 0]
        uj = jnp.take_along_axis(u, j[..., None], axis=-1)[..., 0]
        vj = jnp.take_along_axis(v, j[..., None], axis=-1)[..., 0]
        better = tj < bt
        bt = jnp.where(better, tj, bt)
        btri = jnp.where(better, chunk_idx * chunk + j.astype(jnp.int32), btri)
        bu = jnp.where(better, uj, bu)
        bv = jnp.where(better, vj, bv)
        return (bt, btri, bu, bv), None

    (bt, btri, bu, bv), _ = jax.lax.scan(
        body, init, (jnp.arange(n_chunks, dtype=jnp.int32), tris)
    )
    return TriangleHit(t=bt, tri=btri, u=bu, v=bv)


def trace_anyhit_brute(
    scene: Scene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_max: jnp.ndarray,
    chunk: int = _BRUTE_CHUNK,
) -> jnp.ndarray:
    """Occlusion query: True where any triangle lies within t_max
    (shadow-ray semantics of ray.rs:84-112)."""
    positions, total = _pad_tris(scene.geometry.positions, chunk)
    n_chunks = total // chunk
    tris = positions.reshape(n_chunks, chunk, 3, 3)
    batch_shape = o.shape[:-1]

    ob = o[..., None, :]
    db = d[..., None, :]
    tm = t_max[..., None]

    def body(occluded, tri_chunk):
        t, _, _, _ = ray_triangle(
            ob, db, tri_chunk[:, 0], tri_chunk[:, 1], tri_chunk[:, 2]
        )
        return occluded | jnp.any(t < tm, axis=-1), None

    # all-False init derived from o so it inherits shard_map varying axes
    init = o[..., 0] > jnp.inf
    occluded, _ = jax.lax.scan(body, init, tris)
    return occluded


def trace_closest(scene: Scene, o: jnp.ndarray, d: jnp.ndarray) -> TriangleHit:
    """Strategy dispatcher for closest-hit."""
    if scene.bvh is not None and scene.geometry.num_triangles > BRUTE_FORCE_MAX_TRIS:
        from ..bvh.traverse import trace_closest_bvh

        return trace_closest_bvh(scene, o, d)
    return trace_closest_brute(scene, o, d)


def trace_anyhit(
    scene: Scene, o: jnp.ndarray, d: jnp.ndarray, t_max: jnp.ndarray
) -> jnp.ndarray:
    """Strategy dispatcher for occlusion rays."""
    if scene.bvh is not None and scene.geometry.num_triangles > BRUTE_FORCE_MAX_TRIS:
        from ..bvh.traverse import trace_anyhit_bvh

        return trace_anyhit_bvh(scene, o, d, t_max)
    return trace_anyhit_brute(scene, o, d, t_max)
