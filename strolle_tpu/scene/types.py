"""Scene representation: typed SoA arrays instead of packed GPU buffers.

The reference serializes everything into Vec4-packed storage buffers
(triangles as 9 Vec4s, materials as uniform structs, lights with
prev-frame copies — strolle-gpu/src/{triangle,material,light}.rs). On
TPU none of that packing pays; we keep one immutable `Scene` pytree of
plain f32/i32 arrays, replicated across the device mesh, and thread it
through jitted stage functions.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from ..utils.pytree import pytree_dataclass, static

LIGHT_NONE = 0
LIGHT_POINT = 1
LIGHT_SPOT = 2

#: LightId sentinel for "the sky" (light.rs:251-253 uses u32::MAX).
LIGHT_ID_SKY = np.int32(-1)


@pytree_dataclass
class Geometry:
    """World-space triangle soup, SoA over the triangle axis.

    Mirrors the data of strolle-gpu/src/triangle.rs:11-21 (3 vertices x
    [position, normal, uv] (+ tangent from the host mesh type,
    strolle/src/mesh_triangle.rs)) as typed arrays.
    """

    positions: jnp.ndarray  # f32[T, 3, 3]
    normals: jnp.ndarray  # f32[T, 3, 3]
    uvs: jnp.ndarray  # f32[T, 3, 2]
    tangents: jnp.ndarray  # f32[T, 3, 4]
    material_id: jnp.ndarray  # i32[T]

    @property
    def num_triangles(self) -> int:
        return self.positions.shape[0]


@pytree_dataclass
class Materials:
    """SoA materials (strolle-gpu/src/material.rs:10-21). Texture fields
    are atlas rects [x, y, w, h] normalized; all-zero rect = untextured."""

    base_color: jnp.ndarray  # f32[M, 4]
    base_color_tex: jnp.ndarray  # f32[M, 4]
    emissive: jnp.ndarray  # f32[M, 4]
    emissive_tex: jnp.ndarray  # f32[M, 4]
    roughness: jnp.ndarray  # f32[M]  (linear = perceptual^2)
    metallic: jnp.ndarray  # f32[M]
    reflectance: jnp.ndarray  # f32[M]
    ior: jnp.ndarray  # f32[M]
    metallic_roughness_tex: jnp.ndarray  # f32[M, 4]
    normal_map_tex: jnp.ndarray  # f32[M, 4]
    alpha_blend: jnp.ndarray  # i32[M]  (AlphaMode::Blend flag)
    #: Static "any material textures this channel" flags in channel
    #: order (base_color, emissive, metallic_roughness): the trace hot
    #: paths statically skip atlas sampling for never-textured channels
    #: (each skipped channel saves a ~5 ms atlas gather per trace).
    tex_channels: tuple = static(default=(True, True, True))

    @property
    def num_materials(self) -> int:
        return self.base_color.shape[0]


@pytree_dataclass
class Lights:
    """Slot-indexed lights with prev-frame copies (light.rs:13-42).

    Arrays are padded to a fixed capacity; `count` is the live number of
    slots. Slot state implements the kill/remap protocol
    (light.rs:107-141): remap[i] >= 0 -> slot moved there this frame;
    killed[i] != 0 -> slot died this frame.
    """

    pos: jnp.ndarray  # f32[L, 3]
    radius: jnp.ndarray  # f32[L]
    color: jnp.ndarray  # f32[L, 3]
    range: jnp.ndarray  # f32[L]
    kind: jnp.ndarray  # i32[L]
    spot_dir: jnp.ndarray  # f32[L, 3]
    spot_angle: jnp.ndarray  # f32[L]
    # previous-frame copies (for temporal reservoir reuse)
    prev_pos: jnp.ndarray  # f32[L, 3]
    prev_radius: jnp.ndarray  # f32[L]
    prev_color: jnp.ndarray  # f32[L, 3]
    prev_range: jnp.ndarray  # f32[L]
    prev_kind: jnp.ndarray  # i32[L]
    prev_spot_dir: jnp.ndarray  # f32[L, 3]
    prev_spot_angle: jnp.ndarray  # f32[L]
    # slot lifecycle
    remap: jnp.ndarray  # i32[L]  (-1 = untouched, else new slot id)
    killed: jnp.ndarray  # i32[L]
    count: jnp.ndarray  # i32[]   live light count

    @property
    def capacity(self) -> int:
        return self.pos.shape[0]


@pytree_dataclass
class Atlas:
    """One big texture atlas (images.rs: 8192^2 rgba8-srgb in the
    reference; here a linear-space f32 array sized to the scene)."""

    image: jnp.ndarray  # f32[A, A, 4], linear color


@pytree_dataclass
class Motion:
    """Per-instance object motion for velocity vectors.

    The reference stores each instance's previous-frame transform
    (strolle/src/instances.rs `prev_transform`) and the raster VS maps
    world positions back through `prev_xform * curr_xform_inv`
    (prim_raster.rs:25-35). Here that product is prebaked host-side
    into one affine per instance: prev_point = A @ [point, 1].
    """

    instance_id: jnp.ndarray  # i32[T] per-triangle instance slot
    prev_of_curr: jnp.ndarray  # f32[I, 12] row-major 3x4 affine


@pytree_dataclass
class Scene:
    geometry: Geometry
    materials: Materials
    lights: Lights
    atlas: Optional[Atlas]
    # World uniform (world.rs:9-14)
    sun_azimuth: jnp.ndarray  # f32[]
    sun_altitude: jnp.ndarray  # f32[]
    # Flattened BVH (None until built; see strolle_tpu.bvh)
    bvh: Optional["object"] = None
    # Per-instance previous transforms (None = static scene: velocity
    # comes from camera motion alone)
    motion: Optional[Motion] = None
    # Cluster AABB rows [K, 8] for the large-scene kernels (see
    # ops/pallas/cluster_kernels.clusterize_bvh), built ONCE per BVH
    # refresh in scene_with_bvh rather than per trace dispatch
    clusters: Optional[jnp.ndarray] = None
    # Static: any AlphaMode::Blend materials present? Gates the
    # alpha-tested traversal path (ray.rs:212-229) at trace time so
    # fully-opaque scenes pay nothing for it.
    has_alpha: bool = static(default=False)
    # Static scene-shape flags driving kernel specialization (the
    # analogue of shader permutations): flat_normals lets the
    # reference megakernel skip barycentric normal interpolation;
    # has_metal=False drops the whole specular lobe at trace time.
    # Computed by compute_static_flags() from concrete host arrays.
    flat_normals: bool = static(default=False)
    has_metal: bool = static(default=True)


def compute_static_flags(geometry, materials) -> dict:
    """Inspects concrete (host) scene arrays and returns the static
    specialization flags for Scene. Must be called OUTSIDE jit."""
    n = np.asarray(geometry.normals)
    flat = bool(
        np.allclose(n[:, 0], n[:, 1], atol=1e-5)
        and np.allclose(n[:, 0], n[:, 2], atol=1e-5)
        and np.allclose((n[:, 0] ** 2).sum(-1), 1.0, atol=1e-3)
    )
    mids = np.asarray(geometry.material_id)
    metallic = np.asarray(materials.metallic)
    used = np.unique(np.clip(mids, 0, metallic.shape[0] - 1))
    has_metal = bool((metallic[used] > 0.0).any())
    return {"flat_normals": flat, "has_metal": has_metal}


def make_materials(records: list[dict]) -> Materials:
    """Builds Materials from a list of per-material dicts (host side)."""
    n = max(len(records), 1)

    def arr(key, default, width=None):
        out = []
        for r in records:
            v = r.get(key, default)
            out.append(v)
        while len(out) < n:
            out.append(default)
        return np.asarray(out, np.float32)

    zeros4 = [0.0, 0.0, 0.0, 0.0]
    base_tex = arr("base_color_tex", zeros4)
    emis_tex = arr("emissive_tex", zeros4)
    mr_tex = arr("metallic_roughness_tex", zeros4)
    return Materials(
        base_color=arr("base_color", [1.0, 1.0, 1.0, 1.0]),
        base_color_tex=base_tex,
        emissive=arr("emissive", zeros4),
        emissive_tex=emis_tex,
        roughness=arr("roughness", 1.0),
        metallic=arr("metallic", 0.0),
        reflectance=arr("reflectance", 0.5),
        ior=arr("ior", 1.47),
        metallic_roughness_tex=mr_tex,
        normal_map_tex=arr("normal_map_tex", zeros4),
        alpha_blend=np.asarray(
            [int(r.get("alpha_blend", 0)) for r in records]
            + [0] * (n - len(records)),
            jnp.int32,
        ),
        tex_channels=tuple(
            bool(np.any(t != 0.0)) for t in (base_tex, emis_tex, mr_tex)
        ),
    )


def make_lights(records: list[dict], capacity: int | None = None) -> Lights:
    """Builds Lights from per-light dicts, padded to `capacity`."""
    count = len(records)
    cap = capacity or max(count, 1)
    assert cap >= count

    def arr(key, default):
        out = [r.get(key, default) for r in records]
        while len(out) < cap:
            out.append(
                default if not isinstance(default, list) else [0.0] * len(default)
            )
        return np.asarray(out, np.float32)

    kind = [int(r.get("kind", LIGHT_POINT)) for r in records]
    kind += [LIGHT_NONE] * (cap - count)
    lights = Lights(
        pos=arr("pos", [0.0, 0.0, 0.0]),
        radius=arr("radius", 0.1),
        color=arr("color", [1.0, 1.0, 1.0]),
        range=arr("range", np.inf),
        kind=np.asarray(kind, np.int32),
        spot_dir=arr("spot_dir", [0.0, -1.0, 0.0]),
        spot_angle=arr("spot_angle", 0.0),
        prev_pos=arr("pos", [0.0, 0.0, 0.0]),
        prev_radius=arr("radius", 0.1),
        prev_color=arr("color", [1.0, 1.0, 1.0]),
        prev_range=arr("range", np.inf),
        prev_kind=np.asarray(kind, np.int32),
        prev_spot_dir=arr("spot_dir", [0.0, -1.0, 0.0]),
        prev_spot_angle=arr("spot_angle", 0.0),
        remap=np.full((cap,), -1, np.int32),
        killed=np.zeros((cap,), np.int32),
        count=np.asarray(count, np.int32),
    )
    return lights


def commit_lights(lights: Lights) -> Lights:
    """Copy current light data into prev slots and clear lifecycle
    markers (light.rs `commit` + lights.rs flush protocol)."""
    return lights.replace(
        prev_pos=lights.pos,
        prev_radius=lights.radius,
        prev_color=lights.color,
        prev_range=lights.range,
        prev_kind=lights.kind,
        prev_spot_dir=lights.spot_dir,
        prev_spot_angle=lights.spot_angle,
        remap=jnp.full_like(lights.remap, -1),
        killed=jnp.zeros_like(lights.killed),
    )
