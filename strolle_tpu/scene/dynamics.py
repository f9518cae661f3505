"""Host-side dynamic scene management — the Engine facade.

Mirrors Engine<P>'s public API and per-frame tick semantics
(strolle/src/lib.rs:132-395): insert/remove meshes-as-instances,
materials, and lights; the sun as the reserved light slot 0 whose color
is the transmittance LUT evaluated host-side (lights.rs:84-99); the
light slot kill/remap protocol that keeps in-flight reservoirs valid
across removals (lights.rs:101-162); and BVH rebuild on geometry
changes. `tick()` returns the Scene pytree for the next frame.

Triangle capacity grows in buckets so jitted pipelines do not recompile
on every small edit (the analogue of MappedStorageBuffer's grow-only
realloc, buffers/mapped_storage_buffer.rs:28-160).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Hashable

import numpy as np
import jax.numpy as jnp

from ..sky.atmosphere import EXPOSURE, SUN_DISTANCE, luts_for, sun_direction
from .types import (
    LIGHT_NONE,
    LIGHT_POINT,
    Atlas,
    Geometry,
    Lights,
    Scene,
    compute_static_flags,
    make_materials,
)

_SUN_HANDLE = "__sun__"


@dataclass
class _LightRec:
    pos: np.ndarray
    radius: float
    color: np.ndarray
    range: float
    kind: int
    spot_dir: np.ndarray
    spot_angle: float
    prev: dict = field(default_factory=dict)


@dataclass
class _InstanceRec:
    positions: np.ndarray  # [T, 3, 3] world space
    normals: np.ndarray
    uvs: np.ndarray
    material_id: int
    # transform used to bake positions (None = identity) + the one in
    # effect last frame, for object-motion velocity (instances.rs
    # prev_transform feeding prim_raster.rs:25-35)
    transform: np.ndarray | None = None
    prev_transform: np.ndarray | None = None


@dataclass
class _MeshRec:
    positions: np.ndarray  # [T, 3, 3] object space
    normals: np.ndarray
    uvs: np.ndarray


@dataclass
class _MeshInstanceRec:
    """Instance referencing a mesh asset (instances.rs:69-139): resolved
    to world-space triangles at tick; skipped (retried next frame) while
    the mesh or material handle is missing (instances.rs:85-101)."""

    mesh: Hashable
    material: Hashable | int
    transform: np.ndarray | None
    prev_transform: np.ndarray | None = None


def _prev_of_curr_affine(
    prev: np.ndarray | None, curr: np.ndarray | None
) -> np.ndarray:
    """Row-major 3x4 affine mapping current world pos -> previous world
    pos: prev_xform @ inv(curr_xform) (prim_raster.rs:25-35)."""
    ident = np.eye(3, 4, dtype=np.float32)
    if prev is None and curr is None:
        return ident
    p = np.eye(4, dtype=np.float32) if prev is None else np.asarray(prev)
    c = np.eye(4, dtype=np.float32) if curr is None else np.asarray(curr)
    if p.shape == c.shape and np.allclose(p, c):
        return ident
    a = (p @ np.linalg.inv(c)).astype(np.float32)
    return a[:3, :4]


@dataclass
class _ImageRec:
    source: np.ndarray  # [H, W, 4] linear f32, caller-owned
    rect: np.ndarray  # normalized atlas rect [x, y, w, h]
    xy: tuple[int, int]
    dynamic: bool = False


def _bucket(n: int, minimum: int = 256) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


class SceneEditor:
    def __init__(
        self,
        materials: list[dict] | None = None,
        light_capacity: int = 16,
        sun_azimuth: float = 0.0,
        sun_altitude: float = -1.0,
        atlas: np.ndarray | None = None,
        atlas_size: int = 2048,
    ):
        self._materials = materials or [{}]
        self._atlas = atlas
        self._light_capacity = light_capacity
        self.sun_azimuth = sun_azimuth
        self.sun_altitude = sun_altitude

        self._instances: dict[Hashable, _InstanceRec] = {}
        self._geometry_dirty = True
        # transform-only edits take the BVH refit fast path instead of a
        # full rebuild (native bvh_refit; the reference's analogue is the
        # subtree-hash incremental builder, bvh/builder.rs:204-279)
        self._transforms_dirty = False
        self._refit_streak = 0
        #: consecutive refits allowed before a full rebuild restores SAH
        #: quality (refitted boxes only grow; a periodic rebuild re-splits)
        self.max_refit_streak = 15
        #: per-editor counters ("tick.bvh" build vs refit path hits)
        self.stats = {
            "bvh_rebuilds": 0,
            "bvh_refits": 0,
            "bvh_nodes_reused": 0,
        }
        #: incremental-rebuild context (subtree-hash ghost reuse,
        #: builder.rs:204-279); lazily created, None when native is out
        self._bvh_ctx = None
        self._bvh_ctx_tried = False
        self._bvh = None
        self._geometry: Geometry | None = None

        # mesh assets + mesh-referencing instances (Engine::insert_mesh /
        # insert_instance, lib.rs:160-245)
        self._meshes: dict[Hashable, _MeshRec] = {}
        self._mesh_instances: dict[Hashable, _MeshInstanceRec] = {}

        # material handle -> slot index (materials.rs:21-43); slots are
        # stable so MaterialIds baked into instances stay valid
        self._material_index: dict[Hashable, int] = {}
        self._material_free: list[int] = []
        self._materials_dirty = True

        # image handles in the shared texture atlas (images.rs:29-123)
        self._images: dict[Hashable, _ImageRec] = {}
        self._atlas_packer = None
        self._atlas_size = atlas_size
        self._atlas_dirty = atlas is not None

        # light slots: slot 0 reserved for the sun (lights.rs:29-52)
        self._light_slots: list[tuple[Hashable, _LightRec]] = [
            (_SUN_HANDLE, self._make_sun())
        ]
        self._light_index: dict[Hashable, int] = {_SUN_HANDLE: 0}
        self._killed: set[int] = set()
        self._remapped: dict[Hashable, int] = {}  # handle -> OLD slot id
        self.frame = 0

    # -- lights ---------------------------------------------------------

    def _make_sun(self) -> _LightRec:
        sun_dir = np.asarray(
            sun_direction(
                jnp.float32(self.sun_azimuth), jnp.float32(self.sun_altitude)
            )
        )
        if self.sun_altitude > -0.3:
            luts = luts_for(self.sun_altitude)
            from ..sky.atmosphere import sun_color

            color = np.asarray(sun_color(luts, jnp.asarray(sun_dir)[None]))[0]
        else:
            color = np.zeros(3, np.float32)
        return _LightRec(
            pos=(sun_dir * SUN_DISTANCE).astype(np.float32),
            radius=25.0,
            color=color.astype(np.float32),
            range=np.inf,
            kind=LIGHT_POINT,
            spot_dir=np.asarray([0, -1, 0], np.float32),
            spot_angle=0.0,
        )

    def update_sun(self, azimuth: float | None = None, altitude: float | None = None):
        if azimuth is not None:
            self.sun_azimuth = float(azimuth)
        if altitude is not None:
            self.sun_altitude = float(altitude)
        old = self._light_slots[0][1]
        new = self._make_sun()
        new.prev = {
            "pos": old.pos, "radius": old.radius, "color": old.color,
            "range": old.range, "kind": old.kind,
            "spot_dir": old.spot_dir, "spot_angle": old.spot_angle,
        }
        self._light_slots[0] = (_SUN_HANDLE, new)

    def insert_light(self, handle: Hashable, **kw):
        rec = _LightRec(
            pos=np.asarray(kw.get("pos", [0, 0, 0]), np.float32),
            radius=float(kw.get("radius", 0.1)),
            color=np.asarray(kw.get("color", [1, 1, 1]), np.float32),
            range=float(kw.get("range", np.inf)),
            kind=int(kw.get("kind", LIGHT_POINT)),
            spot_dir=np.asarray(kw.get("spot_dir", [0, -1, 0]), np.float32),
            spot_angle=float(kw.get("spot_angle", 0.0)),
        )
        if handle in self._light_index:
            slot = self._light_index[handle]
            old = self._light_slots[slot][1]
            rec.prev = {
                "pos": old.pos, "radius": old.radius, "color": old.color,
                "range": old.range, "kind": old.kind,
                "spot_dir": old.spot_dir, "spot_angle": old.spot_angle,
            }
            self._light_slots[slot] = (handle, rec)
        else:
            slot = len(self._light_slots)
            assert slot < self._light_capacity, "light capacity exceeded"
            self._light_slots.append((handle, rec))
            self._light_index[handle] = slot

    def remove_light(self, handle: Hashable):
        """Compacting removal with kill/remap markers (lights.rs:101-125)."""
        if handle not in self._light_index or handle == _SUN_HANDLE:
            return
        slot = self._light_index.pop(handle)
        self._light_slots.pop(slot)
        self._killed.add(slot)
        for h, s in list(self._light_index.items()):
            if s > slot:
                self._remapped.setdefault(h, s)
                self._light_index[h] = s - 1

    def _build_lights(self) -> Lights:
        cap = self._light_capacity
        n = len(self._light_slots)

        def col(fn, shape, dtype=np.float32):
            out = np.zeros((cap,) + shape, dtype)
            for i, (_, rec) in enumerate(self._light_slots):
                out[i] = fn(rec)
            return out

        def pcol(fn, key, shape, dtype=np.float32):
            out = np.zeros((cap,) + shape, dtype)
            for i, (_, rec) in enumerate(self._light_slots):
                out[i] = rec.prev.get(key, fn(rec))
            return out

        remap = np.full((cap,), -1, np.int32)
        killed = np.zeros((cap,), np.int32)
        for h, old_slot in self._remapped.items():
            if old_slot < cap and h in self._light_index:
                remap[old_slot] = self._light_index[h]
        for s in self._killed:
            if s < cap:
                killed[s] = 1

        kind = np.zeros((cap,), np.int32)
        prev_kind = np.zeros((cap,), np.int32)
        for i, (_, rec) in enumerate(self._light_slots):
            kind[i] = rec.kind
            prev_kind[i] = rec.prev.get("kind", rec.kind)

        return Lights(
            pos=jnp.asarray(col(lambda r: r.pos, (3,))),
            radius=jnp.asarray(col(lambda r: r.radius, ())),
            color=jnp.asarray(col(lambda r: r.color, (3,))),
            range=jnp.asarray(col(lambda r: r.range, ())),
            kind=jnp.asarray(kind),
            spot_dir=jnp.asarray(col(lambda r: r.spot_dir, (3,))),
            spot_angle=jnp.asarray(col(lambda r: r.spot_angle, ())),
            prev_pos=jnp.asarray(pcol(lambda r: r.pos, "pos", (3,))),
            prev_radius=jnp.asarray(pcol(lambda r: r.radius, "radius", ())),
            prev_color=jnp.asarray(pcol(lambda r: r.color, "color", (3,))),
            prev_range=jnp.asarray(pcol(lambda r: r.range, "range", ())),
            prev_kind=jnp.asarray(prev_kind),
            prev_spot_dir=jnp.asarray(pcol(lambda r: r.spot_dir, "spot_dir", (3,))),
            prev_spot_angle=jnp.asarray(
                pcol(lambda r: r.spot_angle, "spot_angle", ())
            ),
            remap=jnp.asarray(remap),
            killed=jnp.asarray(killed),
            count=jnp.asarray(len(self._light_slots), jnp.int32),
        )

    # -- meshes (Engine::insert_mesh/remove_mesh, lib.rs:160-175) --------

    def insert_mesh(
        self,
        handle: Hashable,
        positions: np.ndarray,  # [T, 3, 3] object space
        normals: np.ndarray | None = None,
        uvs: np.ndarray | None = None,
    ):
        positions = np.asarray(positions, np.float32)
        t = positions.shape[0]
        if normals is None:
            e1 = positions[:, 1] - positions[:, 0]
            e2 = positions[:, 2] - positions[:, 0]
            n = np.cross(e1, e2)
            n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
            normals = np.repeat(n[:, None, :], 3, axis=1)
        uvs = (
            np.zeros((t, 3, 2), np.float32)
            if uvs is None
            else np.asarray(uvs, np.float32)
        )
        self._meshes[handle] = _MeshRec(
            positions, np.asarray(normals, np.float32), uvs
        )
        # any instance referencing this mesh resolves (again) next tick
        if any(r.mesh == handle for r in self._mesh_instances.values()):
            self._geometry_dirty = True

    def remove_mesh(self, handle: Hashable):
        if self._meshes.pop(handle, None) is not None and any(
            r.mesh == handle for r in self._mesh_instances.values()
        ):
            self._geometry_dirty = True

    # -- materials (Engine::insert/has/remove_material, lib.rs:178-205) --

    def insert_material(self, handle: Hashable, **props) -> int:
        """Adds/updates a material; returns its stable slot index."""
        if handle in self._material_index:
            slot = self._material_index[handle]
            self._materials[slot] = props
        elif self._material_free:
            slot = self._material_free.pop()
            self._materials[slot] = props
            self._material_index[handle] = slot
        else:
            slot = len(self._materials)
            self._materials.append(props)
            self._material_index[handle] = slot
        self._materials_dirty = True
        return slot

    def has_material(self, handle: Hashable) -> bool:
        return handle in self._material_index

    def remove_material(self, handle: Hashable):
        slot = self._material_index.pop(handle, None)
        if slot is not None:
            self._materials[slot] = {}
            self._material_free.append(slot)
            self._materials_dirty = True

    def _material_slot(self, ref: Hashable | int) -> int | None:
        if isinstance(ref, int):
            return ref
        return self._material_index.get(ref)

    # -- images / texture atlas (images.rs:29-123) -----------------------

    def _packer(self):
        if self._atlas_packer is None:
            from .gltf import _AtlasPacker

            self._atlas_packer = _AtlasPacker(self._atlas_size)
        return self._atlas_packer

    def insert_image(
        self, handle: Hashable, image: np.ndarray, dynamic: bool = False
    ):
        """Packs an [H, W, 4] linear-f32 image into the atlas. A
        ``dynamic`` image is re-copied from the caller's array every
        tick (images.rs:97-103), so in-place edits show up next frame."""
        img = np.asarray(image, np.float32)
        if handle in self._images:
            self.remove_image(handle)
        packer = self._packer()
        try:
            packer.add(handle, img)
        except ValueError:
            # atlas-full is a warn + skip (images.rs:71-79)
            import logging

            logging.getLogger(__name__).warning(
                "atlas full; skipping image %r", handle
            )
            return
        rect = packer.rects[handle]
        x = int(round(rect[0] * self._atlas_size))
        y = int(round(rect[1] * self._atlas_size))
        self._images[handle] = _ImageRec(
            source=image, rect=rect, xy=(x, y), dynamic=dynamic
        )
        self._atlas_dirty = True
        self._materials_dirty = True  # rects may resolve differently

    def remove_image(self, handle: Hashable):
        rec = self._images.pop(handle, None)
        if rec is None:
            return
        packer = self._packer()
        x, y = rec.xy
        h, w = rec.source.shape[:2]
        packer._alloc.dealloc(x, y, w, h)
        packer.image[y : y + h, x : x + w] = 0.0
        packer.rects.pop(handle, None)
        self._atlas_dirty = True
        self._materials_dirty = True

    def mark_image_dynamic(self, handle: Hashable):
        """MarkImageAsDynamic (bevy-strolle/src/event.rs)."""
        if handle in self._images:
            self._images[handle].dynamic = True

    def _resolve_material_textures(self) -> list[dict]:
        """Resolves image handles in material records to atlas rects
        (materials.rs:80-87 re-serializes with rects at refresh)."""
        out = []
        for rec in self._materials:
            rec = dict(rec)
            for img_key, tex_key in [
                ("base_color_image", "base_color_tex"),
                ("emissive_image", "emissive_tex"),
                ("metallic_roughness_image", "metallic_roughness_tex"),
                ("normal_map_image", "normal_map_tex"),
            ]:
                handle = rec.pop(img_key, None)
                if handle is not None and handle in self._images:
                    rec[tex_key] = self._images[handle].rect
            out.append(rec)
        return out

    # -- instances ------------------------------------------------------

    def insert_instance(
        self,
        handle: Hashable,
        positions: np.ndarray | None = None,  # [T, 3, 3] (object space)
        material_id: int = 0,
        normals: np.ndarray | None = None,
        uvs: np.ndarray | None = None,
        transform: np.ndarray | None = None,
        mesh: Hashable | None = None,
        material: Hashable | int | None = None,
    ):
        """Adds/replaces an instance; world transform applied with
        inverse-transpose normals (mesh_triangle.rs:48-87).

        Two forms: a triangle soup (``positions``) baked immediately, or
        a reference to a mesh asset (``mesh=``) resolved at tick — the
        latter keeps Engine semantics: if the mesh or material handle is
        not (yet) present the instance is skipped and retried next frame
        (instances.rs:85-101)."""
        if mesh is not None:
            old = self._mesh_instances.get(handle)
            # a re-inserted instance keeps last frame's transform as its
            # prev (instances.rs:69-139); a brand-new one starts with
            # prev == curr (zero object velocity)
            curr = (
                None if transform is None else np.asarray(transform, np.float32)
            )
            mat_ref = material if material is not None else material_id
            self._mesh_instances[handle] = _MeshInstanceRec(
                mesh=mesh,
                material=mat_ref,
                transform=curr,
                prev_transform=old.transform if old is not None else curr,
            )
            self._instances.pop(handle, None)
            if (
                old is not None
                and old.mesh == mesh
                and old.material == mat_ref
            ):
                # same topology, new transform -> BVH refit fast path
                self._transforms_dirty = True
            else:
                self._geometry_dirty = True
            return
        positions = np.asarray(positions, np.float32)
        t = positions.shape[0]
        if normals is None:
            e1 = positions[:, 1] - positions[:, 0]
            e2 = positions[:, 2] - positions[:, 0]
            n = np.cross(e1, e2)
            n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
            normals = np.repeat(n[:, None, :], 3, axis=1)
        normals = np.asarray(normals, np.float32)
        uvs = (
            np.zeros((t, 3, 2), np.float32)
            if uvs is None
            else np.asarray(uvs, np.float32)
        )
        curr_xf = None
        if transform is not None:
            from .. import native

            curr_xf = np.asarray(transform, np.float32)
            positions, normals = native.transform_triangles(
                positions, normals, curr_xf
            )
        old = self._instances.get(handle)
        self._instances[handle] = _InstanceRec(
            positions,
            normals,
            uvs,
            material_id,
            transform=curr_xf,
            prev_transform=old.transform if old is not None else curr_xf,
        )
        self._geometry_dirty = True

    def remove_instance(self, handle: Hashable):
        a = self._instances.pop(handle, None) is not None
        b = self._mesh_instances.pop(handle, None) is not None
        if a or b:
            self._geometry_dirty = True

    def _build_geometry(self):
        from ..bvh.builder import build_bvh

        parts_p, parts_n, parts_u, parts_m = [], [], [], []
        parts_i = []
        motion_handles: list[tuple[str, Hashable]] = []
        for handle, rec in self._instances.items():
            parts_p.append(rec.positions)
            parts_n.append(rec.normals)
            parts_u.append(rec.uvs)
            parts_m.append(np.full(len(rec.positions), rec.material_id, np.int32))
            parts_i.append(
                np.full(len(rec.positions), len(motion_handles), np.int32)
            )
            motion_handles.append(("soup", handle))
        pending = False
        for handle, rec in self._mesh_instances.items():
            mesh = self._meshes.get(rec.mesh)
            mat = self._material_slot(rec.material)
            if mesh is None or mat is None:
                # retry next frame once the asset arrives
                # (instances.rs:85-101)
                pending = True
                continue
            pos, nrm = mesh.positions, mesh.normals
            if rec.transform is not None:
                from .. import native

                pos, nrm = native.transform_triangles(
                    pos, nrm, rec.transform
                )
            parts_p.append(pos)
            parts_n.append(nrm)
            parts_u.append(mesh.uvs)
            parts_m.append(np.full(len(pos), mat, np.int32))
            parts_i.append(np.full(len(pos), len(motion_handles), np.int32))
            motion_handles.append(("mesh", handle))
        if not parts_p:
            parts_p = [np.zeros((1, 3, 3), np.float32)]
            parts_n = [np.zeros((1, 3, 3), np.float32)]
            parts_u = [np.zeros((1, 3, 2), np.float32)]
            parts_m = [np.zeros(1, np.int32)]
            parts_i = [np.zeros(1, np.int32)]
        pos = np.concatenate(parts_p)
        nrm = np.concatenate(parts_n)
        uv = np.concatenate(parts_u)
        mid = np.concatenate(parts_m)
        iid = np.concatenate(parts_i)

        if not self._bvh_ctx_tried:
            self._bvh_ctx_tried = True
            from .. import native

            if native.available():
                self._bvh_ctx = native.BvhContext()
        arrays, order = build_bvh(pos, ctx=self._bvh_ctx)
        if self._bvh_ctx is not None:
            self.stats["bvh_nodes_reused"] += self._bvh_ctx.last_reused
        pos, nrm, uv, mid = pos[order], nrm[order], uv[order], mid[order]
        iid = iid[order]

        # pad to a capacity bucket with degenerate triangles so jitted
        # pipelines keep their shapes across edits
        cap = _bucket(len(pos))
        pad = cap - len(pos)
        if pad:
            pos = np.concatenate([pos, np.zeros((pad, 3, 3), np.float32)])
            nrm = np.concatenate([nrm, np.zeros((pad, 3, 3), np.float32)])
            uv = np.concatenate([uv, np.zeros((pad, 3, 2), np.float32)])
            mid = np.concatenate([mid, np.zeros(pad, np.int32)])
            # padded (degenerate, never-hit) triangles map to the
            # trailing identity motion slot
            iid = np.concatenate(
                [iid, np.full(pad, len(motion_handles), np.int32)]
            )

        self._motion_handles = motion_handles
        self._instance_ids = iid
        self._geometry = Geometry(
            positions=jnp.asarray(pos),
            normals=jnp.asarray(nrm),
            uvs=jnp.asarray(uv),
            tangents=jnp.zeros((cap, 3, 4), jnp.float32),
            material_id=jnp.asarray(mid),
        )
        # pad node arrays + pin max_depth so the Scene treedef (and
        # therefore every jitted pipeline cache entry) survives edits
        from ..bvh.builder import pad_nodes

        # refit-path state: BVH order + mutable numpy node copies
        self._tri_order = np.asarray(order)
        self._live_tris = int(self._tri_order.shape[0])
        self._geom_cap = cap
        self._node_cap = _bucket(arrays.num_nodes)
        self._bvh_np = (
            np.array(arrays.child_min, np.float32),
            np.array(arrays.child_max, np.float32),
            np.array(arrays.child, np.int32),
            np.array(arrays.child_count, np.int32),
        )
        self._refit_streak = 0
        self.stats["bvh_rebuilds"] += 1

        arrays = pad_nodes(arrays, self._node_cap)
        self._bvh = arrays.replace(max_depth=max(arrays.max_depth, 48))
        self._clusters_np = None  # lazily rebuilt in tick (big scenes)
        self._geometry_dirty = pending

    def _refit_geometry(self):
        """Transform-only update: re-transform triangles, refit node
        AABBs in place (native bvh_refit), keep topology/order. Falls
        back to a full rebuild when native is unavailable or the refit
        streak exceeds max_refit_streak (refitted boxes only grow, so a
        periodic rebuild restores SAH quality)."""
        from .. import native
        from ..bvh.builder import BvhArrays, pad_nodes

        if (
            not native.available()
            or self._refit_streak >= self.max_refit_streak
        ):
            self._build_geometry()
            return

        parts_p, parts_n = [], []
        for rec in self._instances.values():
            parts_p.append(rec.positions)
            parts_n.append(rec.normals)
        for rec in self._mesh_instances.values():
            mesh = self._meshes.get(rec.mesh)
            if mesh is None or self._material_slot(rec.material) is None:
                continue  # was skipped at build time too
            pos, nrm = mesh.positions, mesh.normals
            if rec.transform is not None:
                pos, nrm = native.transform_triangles(pos, nrm, rec.transform)
            parts_p.append(pos)
            parts_n.append(nrm)
        pos = np.concatenate(parts_p) if parts_p else np.zeros(
            (1, 3, 3), np.float32
        )
        nrm = np.concatenate(parts_n) if parts_n else np.zeros(
            (1, 3, 3), np.float32
        )
        if len(pos) != self._live_tris:
            # topology changed after all — full rebuild
            self._build_geometry()
            return
        pos = pos[self._tri_order]
        nrm = nrm[self._tri_order]

        cmin, cmax, child, ccount = self._bvh_np
        native.bvh_refit(pos, cmin, cmax, child, ccount)
        self._refit_streak += 1
        self.stats["bvh_refits"] += 1

        pad = self._geom_cap - len(pos)
        if pad:
            pos = np.concatenate([pos, np.zeros((pad, 3, 3), np.float32)])
            nrm = np.concatenate([nrm, np.zeros((pad, 3, 3), np.float32)])
        self._geometry = self._geometry.replace(
            positions=jnp.asarray(pos), normals=jnp.asarray(nrm)
        )
        arrays = pad_nodes(
            BvhArrays(
                child_min=cmin,
                child_max=cmax,
                child=child,
                child_count=ccount,
                max_depth=self._bvh.max_depth,
            ),
            self._node_cap,
        )
        self._bvh = arrays.replace(max_depth=self._bvh.max_depth)
        self._clusters_np = None

    def _clusters_for_scene(self):
        """Cluster AABB rows for the big-scene kernels, rebuilt only
        when the BVH changed (not per trace dispatch — VERDICT r3)."""
        from ..ops.trace import BRUTE_FORCE_MAX_TRIS

        if self._geometry.positions.shape[0] <= BRUTE_FORCE_MAX_TRIS:
            return None
        if getattr(self, "_clusters_np", None) is None:
            from ..ops.pallas.cluster_kernels import clusterize_bvh

            self._clusters_np = np.asarray(
                clusterize_bvh(
                    self._bvh,
                    self._geometry.positions.shape[0],
                    self._geometry.positions,
                )
            )
        return self._clusters_np

    def _motion_rec(self, kind: str, handle: Hashable):
        return (
            self._instances.get(handle)
            if kind == "soup"
            else self._mesh_instances.get(handle)
        )

    def _build_motion(self):
        """Per-instance prev-of-curr affines + per-triangle slot ids
        (trailing slot = identity, for padded triangles)."""
        from .types import Motion

        n = len(self._motion_handles)
        mats = np.tile(np.eye(3, 4, dtype=np.float32).reshape(12), (n + 1, 1))
        for slot, (kind, handle) in enumerate(self._motion_handles):
            rec = self._motion_rec(kind, handle)
            if rec is not None:
                mats[slot] = _prev_of_curr_affine(
                    rec.prev_transform, rec.transform
                ).reshape(12)
        return Motion(
            instance_id=jnp.asarray(self._instance_ids),
            prev_of_curr=jnp.asarray(mats),
        )

    # -- tick -----------------------------------------------------------

    def tick(self) -> Scene:
        """Per-frame sync (Engine::tick, lib.rs:301-395): rebuild what
        changed, emit the Scene with this frame's kill/remap markers,
        then commit prev copies and clear markers."""
        from ..utils import metrics

        if self._geometry_dirty:
            with metrics.measure("tick.bvh"):
                self._build_geometry()
        elif self._transforms_dirty:
            with metrics.measure("tick.bvh.refit"):
                self._refit_geometry()
        self._transforms_dirty = False
        with metrics.measure("tick.lights"):
            lights = self._build_lights()

        # dynamic images re-copied every frame (images.rs:97-103, own
        # flush); then the atlas array is (re)uploaded only when dirty
        with metrics.measure("tick.images"):
            for rec in self._images.values():
                if rec.dynamic:
                    x, y = rec.xy
                    src = np.asarray(rec.source, np.float32)
                    h, w = src.shape[:2]
                    self._atlas_packer.image[y : y + h, x : x + w] = src
                    self._atlas_dirty = True
            if self._atlas_dirty or not hasattr(self, "_atlas_dev"):
                if self._images:
                    self._atlas_dev = Atlas(jnp.asarray(self._atlas_packer.image))
                elif self._atlas is not None:
                    self._atlas_dev = Atlas(jnp.asarray(self._atlas))
                else:
                    self._atlas_dev = None
                self._atlas_dirty = False

        # materials re-serialized only when dirty (materials.rs:80-87)
        if self._materials_dirty or not hasattr(self, "_materials_dev"):
            with metrics.measure("tick.materials"):
                self._materials_dev = make_materials(
                    self._resolve_material_textures()
                )
            self._materials_dirty = False
        materials = self._materials_dev

        scene = Scene(
            geometry=self._geometry,
            materials=materials,
            lights=lights,
            atlas=self._atlas_dev,
            sun_azimuth=jnp.asarray(self.sun_azimuth, jnp.float32),
            sun_altitude=jnp.asarray(self.sun_altitude, jnp.float32),
            bvh=self._bvh,
            motion=self._build_motion(),
            clusters=self._clusters_for_scene(),
            has_alpha=any(m.get("alpha_blend") for m in self._materials),
            **compute_static_flags(self._geometry, materials),
        )
        from ..utils import metrics

        metrics.scene_stats(scene, self.frame)
        # commit (lights.rs flush: markers visible for exactly one frame)
        self._killed.clear()
        self._remapped.clear()
        for _, rec in self._light_slots:
            rec.prev = {}
        # commit instance prev transforms (instances.rs:69-139)
        for rec in self._instances.values():
            rec.prev_transform = rec.transform
        for rec in self._mesh_instances.values():
            rec.prev_transform = rec.transform
        self.frame += 1
        return scene
