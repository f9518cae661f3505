"""Minimal glTF 2.0 / GLB loader -> Scene arrays.

Replaces the Bevy asset pipeline + bevy-strolle prepare stage
(bevy-strolle/src/stages/prepare.rs:22-231): node-hierarchy transforms
with inverse-transpose normals, pbrMetallicRoughness -> Material
(perceptual roughness squared to linear, strolle/src/material.rs
semantics), and textures packed into one atlas with normalized rects
(strolle/src/images.rs behavior, shelf packing instead of guillotine).

Pure python + numpy + PIL; no external glTF dependency.
"""

from __future__ import annotations

import base64
import io
import json
import struct
from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from .build import MeshBuilder
from .types import (
    Atlas,
    Scene,
    compute_static_flags,
    make_lights,
    make_materials,
)

_COMPONENT_DTYPES = {
    5120: np.int8, 5121: np.uint8, 5122: np.int16,
    5123: np.uint16, 5125: np.uint32, 5126: np.float32,
}
_TYPE_SIZES = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4, "MAT4": 16}


def _load_glb(data: bytes):
    magic, version, _ = struct.unpack("<III", data[:12])
    assert magic == 0x46546C67, "not a GLB file"
    offset = 12
    js = None
    bin_chunk = b""
    while offset < len(data):
        clen, ctype = struct.unpack("<II", data[offset : offset + 8])
        chunk = data[offset + 8 : offset + 8 + clen]
        if ctype == 0x4E4F534A:  # JSON
            js = json.loads(chunk)
        elif ctype == 0x004E4942:  # BIN
            bin_chunk = chunk
        offset += 8 + clen
    return js, bin_chunk


class _Gltf:
    def __init__(self, js, buffers):
        self.js = js
        self.buffers = buffers

    def buffer_view(self, idx):
        bv = self.js["bufferViews"][idx]
        buf = self.buffers[bv.get("buffer", 0)]
        off = bv.get("byteOffset", 0)
        return buf[off : off + bv["byteLength"]], bv.get("byteStride")

    def accessor(self, idx):
        acc = self.js["accessors"][idx]
        data, stride = self.buffer_view(acc["bufferView"])
        dtype = _COMPONENT_DTYPES[acc["componentType"]]
        n_comp = _TYPE_SIZES[acc["type"]]
        count = acc["count"]
        item = np.dtype(dtype).itemsize * n_comp
        off = acc.get("byteOffset", 0)
        if stride and stride != item:
            rows = [
                np.frombuffer(data, dtype, n_comp, off + i * stride)
                for i in range(count)
            ]
            arr = np.stack(rows)
        else:
            arr = np.frombuffer(data, dtype, count * n_comp, off).reshape(
                count, n_comp
            )
        if acc.get("normalized") and dtype in (np.uint8, np.uint16):
            arr = arr.astype(np.float32) / np.iinfo(dtype).max
        return np.array(arr)

    def image_bytes(self, idx):
        img = self.js["images"][idx]
        if "bufferView" in img:
            data, _ = self.buffer_view(img["bufferView"])
            return bytes(data)
        uri = img["uri"]
        if uri.startswith("data:"):
            return base64.b64decode(uri.split(",", 1)[1])
        raise ValueError(f"external image uri not supported: {uri}")


def _node_transform(node) -> np.ndarray:
    if "matrix" in node:
        return np.asarray(node["matrix"], np.float32).reshape(4, 4).T
    m = np.eye(4, dtype=np.float32)
    s = np.asarray(node.get("scale", [1, 1, 1]), np.float32)
    q = np.asarray(node.get("rotation", [0, 0, 0, 1]), np.float32)
    t = np.asarray(node.get("translation", [0, 0, 0]), np.float32)
    x, y, z, w = q
    rot = np.asarray(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ],
        np.float32,
    )
    m[:3, :3] = rot * s[None, :]
    m[:3, 3] = t
    return m


@dataclass
class _AtlasPacker:
    """Guillotine packer over the native allocator (the role
    guillotiere plays for images.rs:29-43); shelf fallback lives inside
    native.AtlasAllocator when the C++ library is unavailable."""

    size: int
    image: np.ndarray = None  # type: ignore
    rects: dict = field(default_factory=dict)

    def __post_init__(self):
        from .. import native

        self.image = np.zeros((self.size, self.size, 4), np.float32)
        self._alloc = native.AtlasAllocator(self.size, self.size)

    def add(self, key, img: np.ndarray):
        h, w = img.shape[:2]
        pos = self._alloc.alloc(w, h)
        if pos is None:
            raise ValueError("atlas full")
        x, y = pos
        self.image[y : y + h, x : x + w] = img
        self.rects[key] = np.asarray(
            [x / self.size, y / self.size, w / self.size, h / self.size],
            np.float32,
        )


def _decode_image(raw: bytes, srgb: bool) -> np.ndarray:
    from PIL import Image

    img = Image.open(io.BytesIO(raw)).convert("RGBA")
    a = np.asarray(img, np.float32) / 255.0
    if srgb:
        a = a.copy()
        a[..., :3] = a[..., :3] ** 2.2
    return a


def load_gltf(
    path: str,
    atlas_size: int = 2048,
    lights: list[dict] | None = None,
    light_capacity: int = 16,
    sun_altitude: float = -1.0,
    sun_azimuth: float = 0.0,
    max_texture_size: int = 512,
) -> Scene:
    """Loads a .glb / .gltf file into a Scene (no BVH; call
    bvh.scene_with_bvh afterwards for large scenes)."""
    with open(path, "rb") as f:
        data = f.read()
    if path.endswith(".glb") or data[:4] == b"glTF":
        js, bin_chunk = _load_glb(data)
        buffers = [bin_chunk]
    else:
        js = json.loads(data)
        buffers = []
        import os

        base = os.path.dirname(path)
        for buf in js.get("buffers", []):
            uri = buf["uri"]
            if uri.startswith("data:"):
                buffers.append(base64.b64decode(uri.split(",", 1)[1]))
            else:
                with open(os.path.join(base, uri), "rb") as f:
                    buffers.append(f.read())
    g = _Gltf(js, buffers)

    # --- materials + textures ----------------------------------------
    packer = _AtlasPacker(atlas_size)
    has_textures = False
    mat_records = []
    for mi, mat in enumerate(js.get("materials", [{}])):
        pbr = mat.get("pbrMetallicRoughness", {})
        rec = {
            "base_color": list(pbr.get("baseColorFactor", [1, 1, 1, 1])),
            "emissive": list(mat.get("emissiveFactor", [0, 0, 0])) + [1.0],
            # perceptual -> linear roughness (material.rs:27-50)
            "roughness": float(pbr.get("roughnessFactor", 1.0)) ** 2,
            "metallic": float(pbr.get("metallicFactor", 1.0)),
            "reflectance": 0.5,
            "alpha_blend": 1 if mat.get("alphaMode") == "BLEND" else 0,
        }
        tex = pbr.get("baseColorTexture")
        if tex is not None:
            t = js["textures"][tex["index"]]
            src = t.get("source")
            if src is not None:
                key = ("img", src)
                if key not in packer.rects:
                    img = _decode_image(g.image_bytes(src), srgb=True)
                    if max(img.shape[:2]) > max_texture_size:
                        from PIL import Image

                        scale = max_texture_size / max(img.shape[:2])
                        nh = max(1, int(img.shape[0] * scale))
                        nw = max(1, int(img.shape[1] * scale))
                        pil = Image.fromarray(
                            (np.clip(img, 0, 1) * 255).astype(np.uint8)
                        ).resize((nw, nh))
                        img = np.asarray(pil, np.float32) / 255.0
                    packer.add(key, img)
                rec["base_color_tex"] = list(map(float, packer.rects[key]))
                has_textures = True
        mat_records.append(rec)
    if not mat_records:
        mat_records = [{}]

    # --- geometry ----------------------------------------------------
    b = MeshBuilder()
    scene_idx = js.get("scene", 0)
    roots = js["scenes"][scene_idx]["nodes"]

    def walk(node_idx, parent):
        node = js["nodes"][node_idx]
        xform = parent @ _node_transform(node)
        if "mesh" in node:
            mesh = js["meshes"][node["mesh"]]
            for prim in mesh["primitives"]:
                attrs = prim["attributes"]
                pos = g.accessor(attrs["POSITION"]).astype(np.float32)
                nrm = (
                    g.accessor(attrs["NORMAL"]).astype(np.float32)
                    if "NORMAL" in attrs
                    else None
                )
                uv = (
                    g.accessor(attrs["TEXCOORD_0"]).astype(np.float32)
                    if "TEXCOORD_0" in attrs
                    else None
                )
                if "indices" in prim:
                    idx = g.accessor(prim["indices"]).reshape(-1, 3)
                else:
                    idx = np.arange(len(pos)).reshape(-1, 3)
                b.add_mesh(
                    pos,
                    idx,
                    material_id=prim.get("material", 0),
                    normals=nrm,
                    uvs=uv,
                    transform=xform,
                )
        for child in node.get("children", []):
            walk(child, xform)

    for r in roots:
        walk(r, np.eye(4, dtype=np.float32))

    atlas = Atlas(image=jnp.asarray(packer.image)) if has_textures else None
    geometry = b.build()
    materials = make_materials(mat_records)
    return Scene(
        geometry=geometry,
        materials=materials,
        lights=make_lights(lights or [], capacity=light_capacity),
        atlas=atlas,
        sun_azimuth=jnp.asarray(sun_azimuth, jnp.float32),
        sun_altitude=jnp.asarray(sun_altitude, jnp.float32),
        bvh=None,
        has_alpha=any(r.get("alpha_blend") for r in mat_records),
        **compute_static_flags(geometry, materials),
    )
