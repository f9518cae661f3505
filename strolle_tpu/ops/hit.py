"""Hit records and surface attribute evaluation.

SoA analogue of strolle-gpu/src/hit.rs (Hit / TriangleHit) and of the
G-buffer *contents* of gbuffer.rs:19-57 — without the 2xVec4 bit
packing, which exists only to fit texture formats.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..scene.types import Scene
from ..utils.pytree import pytree_dataclass
from . import math as vm
from .texture import sample_material_channel

#: Self-intersection nudge (hit.rs:16-18).
NUDGE_OFFSET = 0.01


@pytree_dataclass
class TriangleHit:
    """Closest-hit result per ray; tri < 0 means miss (t = +inf)."""

    t: jnp.ndarray  # f32[...]
    tri: jnp.ndarray  # i32[...]
    u: jnp.ndarray  # f32[...]
    v: jnp.ndarray  # f32[...]

    @property
    def is_some(self) -> jnp.ndarray:
        return self.tri >= 0


@pytree_dataclass
class Surface:
    """Shading-ready surface attributes at a hit point ("gbuffer entry"
    + hit geometry). On a miss, fields are zero and `is_some` False."""

    point: jnp.ndarray  # f32[..., 3]  (nudged off the surface)
    dir: jnp.ndarray  # f32[..., 3]  incoming ray direction
    normal: jnp.ndarray  # f32[..., 3]
    uv: jnp.ndarray  # f32[..., 2]
    tri: jnp.ndarray  # i32[...]  winning triangle id (-1 on miss)
    material_id: jnp.ndarray  # i32[...]
    base_color: jnp.ndarray  # f32[..., 4]
    emissive: jnp.ndarray  # f32[..., 3]
    metallic: jnp.ndarray  # f32[...]
    roughness: jnp.ndarray  # f32[...]
    reflectance: jnp.ndarray  # f32[...]
    depth: jnp.ndarray  # f32[...]  (hit distance; 0 where miss)
    is_some: jnp.ndarray  # bool[...]


def surface_at(
    scene: Scene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    hit: TriangleHit,
    regularize: bool = False,
) -> Surface:
    """Gathers triangle + material data for closest hits and interpolates
    shading attributes (triangle.rs:96-113, ref_shading.rs hit block).

    ``regularize`` clamps roughness for indirect bounces
    (material.rs:24-27: roughness = max(roughness, 0.5625)).

    All per-triangle attributes come from ONE row-batched take of a
    [T, 25] geometry matrix (a per-field fancy-indexing gather costs
    ~5 ms each at 800x608, ops/gather.py); material fields ride a
    one-hot matmul over the material table, and atlas samples are
    statically skipped for never-textured channels
    (Materials.tex_channels).
    """
    from .gather import gather_rows

    geom = scene.geometry
    mats = scene.materials
    tri = jnp.maximum(hit.tri, 0)

    t_count = geom.num_triangles
    gtable = jnp.concatenate(
        [
            jnp.asarray(geom.positions).reshape(t_count, 9),
            jnp.asarray(geom.normals).reshape(t_count, 9),
            jnp.asarray(geom.uvs).reshape(t_count, 6),
            jnp.asarray(geom.material_id)
            .astype(jnp.float32)
            .reshape(t_count, 1),
        ],
        axis=-1,
    )
    g = jnp.take(gtable, tri.reshape(-1), axis=0, mode="clip").reshape(
        tri.shape + (25,)
    )
    p = g[..., 0:9].reshape(tri.shape + (3, 3))
    n = g[..., 9:18].reshape(tri.shape + (3, 3))
    uvs = g[..., 18:24].reshape(tri.shape + (3, 2))
    mat_id = g[..., 24].astype(jnp.int32)

    u = hit.u[..., None]
    v = hit.v[..., None]
    w = 1.0 - u - v

    # interpolated normal, flipped to face against the ray (sign of det)
    e1 = p[..., 1, :] - p[..., 0, :]
    e2 = p[..., 2, :] - p[..., 0, :]
    det = vm.dot(e1, vm.cross(d, e2))
    normal = vm.normalize(w * n[..., 0, :] + u * n[..., 1, :] + v * n[..., 2, :])
    normal = normal * vm.copysign1(det)[..., None]

    uv = w * uvs[..., 0, :] + u * uvs[..., 1, :] + v * uvs[..., 2, :]

    mtable = jnp.concatenate(
        [
            jnp.asarray(mats.base_color),
            jnp.asarray(mats.base_color_tex),
            jnp.asarray(mats.emissive)[..., :4],
            jnp.asarray(mats.emissive_tex),
            jnp.asarray(mats.roughness)[:, None],
            jnp.asarray(mats.metallic)[:, None],
            jnp.asarray(mats.reflectance)[:, None],
            jnp.asarray(mats.metallic_roughness_tex),
        ],
        axis=-1,
    )
    mrows = gather_rows(mtable, mat_id)
    tex_base, tex_emis, tex_mr = mats.tex_channels

    base_color = sample_material_channel(
        scene, mrows[..., 0:4], mrows[..., 4:8], uv, enabled=tex_base
    )
    emissive = sample_material_channel(
        scene, mrows[..., 8:12], mrows[..., 12:16], uv, enabled=tex_emis
    )[..., :3]

    # metallic-roughness texture (material.rs:44-58): multiplier vector
    # is [1, roughness, metallic, 1]; texel G scales roughness, B scales
    # metallic (glTF layout), .zy() -> (metallic, roughness).
    rough_f = mrows[..., 16]
    metal_f = mrows[..., 17]
    mr_mult = jnp.stack(
        [jnp.ones_like(rough_f), rough_f, metal_f, jnp.ones_like(rough_f)],
        axis=-1,
    )
    mr = sample_material_channel(
        scene, mr_mult, mrows[..., 19:23], uv, enabled=tex_mr
    )
    roughness = mr[..., 1]
    metallic = mr[..., 2]
    if regularize:
        roughness = jnp.maximum(roughness, 0.75 * 0.75)

    some = hit.is_some
    point = o + d * jnp.where(some, hit.t, 0.0)[..., None] + normal * NUDGE_OFFSET

    def z(x):
        return jnp.where(some[..., None] if x.ndim > some.ndim else some, x, 0.0)

    return Surface(
        point=z(point),
        dir=d,
        normal=z(normal),
        uv=z(uv),
        tri=jnp.where(some, hit.tri, -1),
        material_id=jnp.where(some, mat_id, 0),
        base_color=z(base_color),
        emissive=z(emissive),
        metallic=z(metallic),
        roughness=z(roughness),
        reflectance=z(mrows[..., 18]),
        depth=jnp.where(some, hit.t, 0.0),
        is_some=some,
    )
