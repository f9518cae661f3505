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

import contextlib
import contextvars
import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..scene.types import Scene
from .hit import TriangleHit
from .intersect import ray_triangle

#: When set (via trace_rows_sharded), the public trace entry points
#: wrap themselves in a shard_map over the leading (pixel-row) axis of
#: the ray arrays — so the fused Pallas kernels run PER SHARD on real
#: multi-chip hardware instead of falling back to GSPMD partitioning
#: (which cannot partition a pallas_call). Scene operands are
#: replicated; under jax.grad the shard_map transpose psums the
#: scene-parameter cotangents over the mesh (SURVEY.md §5.8).
_TRACE_MESH: contextvars.ContextVar = contextvars.ContextVar(
    "strolle_trace_mesh", default=None
)


@contextlib.contextmanager
def trace_rows_sharded(mesh):
    """Trace-time context: while active, trace_surface / trace_closest /
    trace_anyhit run under shard_map over `mesh` with ray rows sharded
    across every mesh axis. Pass mesh=None for a no-op (single-device).

    MUST be active while the enclosing stage program TRACES — callers
    thread the mesh as a static jit argument so each mesh gets its own
    traced program (models/restir.py stage functions)."""
    if mesh is None:
        yield
        return
    token = _TRACE_MESH.set(mesh)
    try:
        yield
    finally:
        _TRACE_MESH.reset(token)


def _row_spec(mesh) -> P:
    # rows shard over ALL mesh axes (host-major for ('host','chip'))
    return P(tuple(mesh.axis_names))


def _shard_over_rows(mesh, fn, scene, *ray_args):
    """Runs fn(scene, *ray_args) under shard_map with ray rows sharded
    and the scene replicated. The trace-mesh context is cleared inside
    the shard body so the nested public entry point runs its real
    single-shard implementation."""
    spec = _row_spec(mesh)

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(),) + (spec,) * len(ray_args),
        out_specs=spec,
        # pallas_call inside shard_map cannot annotate varying mesh
        # axes on its outputs (jax would demand `vma` on every
        # ShapeDtypeStruct); the body is per-shard-pure so the check
        # adds nothing here
        check_vma=False,
    )
    def body(scene_rep, *rays):
        token = _TRACE_MESH.set(None)
        try:
            return fn(scene_rep, *rays)
        finally:
            _TRACE_MESH.reset(token)

    return body(scene, *ray_args)


def _interpret() -> bool:
    """STROLLE_PALLAS_INTERPRET=1 runs every Pallas kernel in interpret
    mode (and reports the Pallas paths as available on CPU) so the
    CPU test mesh exercises the real kernel code inside shard_map."""
    return os.environ.get("STROLLE_PALLAS_INTERPRET", "") == "1"

_BRUTE_CHUNK = 128
#: Scenes up to this many triangles use the dense brute-force kernel.
#: Measured on TPU v5e under the materialized-output protocol
#: (xbench.py r5, 486k rays @800x608, ~25 ms per-call fixed cost
#: common to all strategies): brute costs ~37 ms per 1k triangles
#: (330 ms at 8k!) while the streaming cluster kernel costs ~4 ms per
#: 1k on top of its tile machinery — the stream path wins from ~1k
#: triangles up on both coherent and incoherent rays. (The round-4
#: comment claiming brute won through 16k was measured under the
#: discredited elided-dispatch protocol.)
BRUTE_FORCE_MAX_TRIS = 1024

#: The packet-BVH kernels hold the node + triangle arrays fully
#: VMEM-resident; past this budget the Mosaic stack allocation
#: overflows (~16 MB scoped VMEM on v5e). Bigger scenes fall back to
#: the jnp traversal (HBM-streaming leaf DMA is future work).
_BVH_KERNEL_VMEM_BUDGET = 12 * 2**20


def _bvh_kernel_fits(scene: Scene) -> bool:
    n_nodes = scene.bvh.child.shape[0]
    n_rows = scene.geometry.num_triangles
    return (n_nodes * 16 + n_rows * 28) * 4 <= _BVH_KERNEL_VMEM_BUDGET


#: Large-scene kernel strategy: "stream" (HBM-streaming cluster-culled
#: brute force, the measured winner at every size — see
#: ops/pallas/stream_kernels.py; unbounded by VMEM), "cluster"
#: (VMEM-resident cluster culling), "packet" (shared-stack packet
#: traversal), or "jnp" (XLA while-loop traversal). xbench.py
#: overrides this to compare strategies.
BIG_SCENE_STRATEGY = "stream"


def _cluster_kernel_fits(scene: Scene) -> bool:
    from .pallas.cluster_kernels import num_clusters

    n_rows = scene.geometry.num_triangles
    k = num_clusters(n_rows)
    return (k * 8 + n_rows * 28) * 4 <= _BVH_KERNEL_VMEM_BUDGET


def _cluster_rows(scene: Scene):
    if scene.clusters is not None:
        # prebuilt once per BVH refresh (bvh.build_clusters)
        return jnp.asarray(scene.clusters)
    from .pallas.cluster_kernels import clusterize_bvh

    return clusterize_bvh(
        scene.bvh,
        scene.geometry.num_triangles,
        jnp.asarray(scene.geometry.positions),
    )


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


def _pallas_available() -> bool:
    """Pallas TPU kernels only lower on the TPU backend (or anywhere in
    interpret mode — see _interpret)."""
    return jax.default_backend() == "tpu" or _interpret()


def _packed_tri_rows(scene: Scene):
    from .pallas.trace_kernels import pack_triangles

    rows = pack_triangles(scene.geometry.positions)
    pad = (-rows.shape[0]) % 8
    if pad:
        rows = jnp.concatenate([rows, jnp.zeros((pad, 12), rows.dtype)])
    return rows


def _trace_closest_pallas(scene: Scene, o, d) -> TriangleHit:
    """Pallas kernel + differentiable recompute: the kernel (no VJP)
    finds the winning triangle under stop_gradient; t/u/v are then
    re-evaluated through the selected triangle with plain jnp so
    gradients w.r.t. ray origins/directions/vertices flow."""
    from .pallas.trace_kernels import trace_closest_brute_pallas

    rows = jax.lax.stop_gradient(_packed_tri_rows(scene))
    t, tri, u, v = trace_closest_brute_pallas(
        rows, jax.lax.stop_gradient(o), jax.lax.stop_gradient(d),
        interpret=_interpret(),
    )
    verts = scene.geometry.positions[jnp.maximum(tri, 0)]
    t2, u2, v2, _ = ray_triangle(
        o, d, verts[..., 0, :], verts[..., 1, :], verts[..., 2, :]
    )
    valid = tri >= 0
    return TriangleHit(
        t=jnp.where(valid, t2, jnp.inf),
        tri=tri,
        u=jnp.where(valid, u2, 0.0),
        v=jnp.where(valid, v2, 0.0),
    )


def _trace_anyhit_pallas(scene: Scene, o, d, t_max):
    from .pallas.trace_kernels import trace_anyhit_brute_pallas

    rows = jax.lax.stop_gradient(_packed_tri_rows(scene))
    return trace_anyhit_brute_pallas(
        rows,
        jax.lax.stop_gradient(o),
        jax.lax.stop_gradient(d),
        jax.lax.stop_gradient(jnp.broadcast_to(t_max, o.shape[:-1])),
        interpret=_interpret(),
    )


def _material_table(scene: Scene) -> jnp.ndarray:
    """[M, 24] rows: base_color(4) emissive(3) metallic roughness
    reflectance pad(2) base_color_tex(4) emissive_tex(4)
    metallic_roughness_tex(4) — one one-hot matmul fetches a full
    material."""
    m = scene.materials
    return jnp.concatenate(
        [
            m.base_color,
            m.emissive[..., :3],
            m.metallic[:, None],
            m.roughness[:, None],
            m.reflectance[:, None],
            jnp.zeros((m.num_materials, 2), jnp.float32),
            m.base_color_tex,
            m.emissive_tex,
            m.metallic_roughness_tex,
        ],
        axis=-1,
    )


def trace_surface(
    scene: Scene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    regularize: bool = False,
    use_pallas: bool | None = None,
):
    """Closest hit + shading attributes as a Surface pytree.

    On TPU this runs the fused Pallas surface kernel (attributes
    resolved in-register, materials via one-hot matmul) — the
    XLA-gather-free hot path. Elsewhere (or for the differentiable
    path, use_pallas=False) it falls back to trace_closest +
    surface_at.
    """
    mesh = _TRACE_MESH.get()
    if mesh is not None:
        return _shard_over_rows(
            mesh,
            lambda s, oo, dd: trace_surface(s, oo, dd, regularize, use_pallas),
            scene, o, d,
        )
    from .hit import NUDGE_OFFSET, Surface, surface_at
    from .gather import gather_rows
    from .texture import sample_material_channel

    if use_pallas is None:
        use_pallas = _pallas_available()
    big = scene.geometry.num_triangles > BRUTE_FORCE_MAX_TRIS
    if (
        not use_pallas
        or not _pallas_available()
        or (big and scene.bvh is None)
        or scene.has_alpha  # fused kernel has no alpha re-test; restart path
    ):
        hit = trace_closest(scene, o, d)
        return surface_at(scene, o, d, hit, regularize=regularize)

    from .pallas.trace_kernels import pack_geometry, trace_surface_pallas

    rows = pack_geometry(scene.geometry)
    pad = (-rows.shape[0]) % 8
    if pad:
        rows = jnp.concatenate([rows, jnp.zeros((pad, 28), rows.dtype)])

    if big:
        if BIG_SCENE_STRATEGY == "stream" or (
            BIG_SCENE_STRATEGY == "cluster" and not _cluster_kernel_fits(scene)
        ):
            # find-only streaming kernel; the winner's attributes are
            # resolved by the same gather path the jnp fallback uses
            from .pallas.stream_kernels import stream_trace_surface_pallas

            sout = stream_trace_surface_pallas(
                _cluster_rows(scene), rows, o, d, interpret=_interpret()
            )
            hit = TriangleHit(
                t=jnp.where(sout["hit"], sout["t"], jnp.inf),
                tri=sout["tri"],
                u=sout["u"],
                v=sout["v"],
            )
            return surface_at(scene, o, d, hit, regularize=regularize)
        if BIG_SCENE_STRATEGY == "cluster" and _cluster_kernel_fits(scene):
            from .pallas.cluster_kernels import cluster_trace_surface_pallas

            out = cluster_trace_surface_pallas(
                _cluster_rows(scene), rows, o, d, interpret=_interpret()
            )
        elif _bvh_kernel_fits(scene):
            from .pallas.bvh_kernels import (
                bvh_trace_surface_pallas,
                pack_nodes,
            )

            out = bvh_trace_surface_pallas(
                pack_nodes(scene.bvh), rows, o, d, interpret=_interpret()
            )
        else:
            hit = trace_closest(scene, o, d)
            return surface_at(scene, o, d, hit, regularize=regularize)
        some = out["hit"]
    else:
        out = trace_surface_pallas(rows, o, d, interpret=_interpret())
        some = out["tri"] >= 0

    t = jnp.where(some, out["t"], 0.0)
    normal = out["normal"]
    mat_id = jnp.where(some, out["mat_id"], 0)
    tri_id = jnp.where(some, out["tri"], -1)
    uv = out["uv"]

    tex_base, tex_emis, tex_mr = scene.materials.tex_channels
    mrows = gather_rows(_material_table(scene), mat_id)
    base_color = sample_material_channel(
        scene, mrows[..., 0:4], mrows[..., 12:16], uv, enabled=tex_base
    )
    emissive4 = jnp.concatenate(
        [mrows[..., 4:7], jnp.ones_like(mrows[..., :1])], axis=-1
    )
    emissive = sample_material_channel(
        scene, emissive4, mrows[..., 16:20], uv, enabled=tex_emis
    )[..., :3]
    # metallic-roughness texture (material.rs:44-58): texel G scales
    # roughness, B scales metallic.
    rough_f = mrows[..., 8]
    metal_f = mrows[..., 7]
    mr_mult = jnp.stack(
        [jnp.ones_like(rough_f), rough_f, metal_f, jnp.ones_like(rough_f)],
        axis=-1,
    )
    mr = sample_material_channel(
        scene, mr_mult, mrows[..., 20:24], uv, enabled=tex_mr
    )
    roughness = mr[..., 1]
    metallic = mr[..., 2]
    if regularize:
        roughness = jnp.maximum(roughness, 0.75 * 0.75)

    point = o + d * t[..., None] + normal * NUDGE_OFFSET

    def z(x):
        return jnp.where(some[..., None] if x.ndim > some.ndim else some, x, 0.0)

    return Surface(
        point=z(point),
        dir=d,
        normal=z(normal),
        uv=z(uv),
        tri=tri_id,
        material_id=mat_id,
        base_color=z(base_color),
        emissive=z(emissive),
        metallic=z(metallic),
        roughness=z(roughness),
        reflectance=z(mrows[..., 9]),
        depth=t,
        is_some=some,
    )


def _trace_closest_opaque(scene: Scene, o, d) -> TriangleHit:
    """Closest-hit strategy dispatch, ignoring alpha blending."""
    if scene.bvh is not None and scene.geometry.num_triangles > BRUTE_FORCE_MAX_TRIS:
        if _pallas_available() and BIG_SCENE_STRATEGY == "stream":
            from .pallas.stream_kernels import stream_trace_surface_pallas

            sg = jax.lax.stop_gradient
            sout = stream_trace_surface_pallas(
                _cluster_rows(sg(scene)), _packed_geom_rows(sg(scene)),
                sg(o), sg(d), interpret=_interpret(),
            )
            # recompute t/u/v through the detached winner so gradients
            # w.r.t. rays and vertex positions flow (same detach-and-
            # recompute as the jnp traversal branch below)
            verts = jnp.asarray(scene.geometry.positions)[
                jnp.maximum(sout["tri"], 0)
            ]
            t2, u2, v2, _ = ray_triangle(
                o, d, verts[..., 0, :], verts[..., 1, :], verts[..., 2, :]
            )
            valid = sout["tri"] >= 0
            return TriangleHit(
                t=jnp.where(valid, t2, jnp.inf),
                tri=sout["tri"],
                u=jnp.where(valid, u2, 0.0),
                v=jnp.where(valid, v2, 0.0),
            )
        from ..bvh.traverse import trace_closest_bvh

        # The traversal's while_loop is not reverse-differentiable (and
        # the winner is a discrete decision anyway): find the triangle
        # under stop_gradient, then recompute t/u/v through it so
        # gradients w.r.t. rays and vertex positions flow — the same
        # detach-and-recompute the Pallas path uses.
        sg = jax.lax.stop_gradient
        hit = trace_closest_bvh(sg(scene), sg(o), sg(d))
        verts = jnp.asarray(scene.geometry.positions)[jnp.maximum(hit.tri, 0)]
        t2, u2, v2, _ = ray_triangle(
            o, d, verts[..., 0, :], verts[..., 1, :], verts[..., 2, :]
        )
        valid = hit.tri >= 0
        return TriangleHit(
            t=jnp.where(valid, t2, jnp.inf),
            tri=hit.tri,
            u=jnp.where(valid, u2, 0.0),
            v=jnp.where(valid, v2, 0.0),
        )
    if _pallas_available():
        return _trace_closest_pallas(scene, o, d)
    return trace_closest_brute(scene, o, d)


#: Max transparent layers skipped per ray (the reference keeps walking
#: the BVH indefinitely, ray.rs:212-229; four restarts cover practical
#: foliage/decal stacks).
MAX_ALPHA_RESTARTS = 4
_ALPHA_SKIP_EPS = 1e-3


def _hit_alpha(scene: Scene, hit: TriangleHit) -> jnp.ndarray:
    """Sampled base-color alpha at a hit on an AlphaMode::Blend material;
    1.0 for hits on opaque materials and for misses (ray.rs:212-229).

    One row-batched [T, 7] take (uvs + material id) plus a one-hot
    material fetch — per-field fancy indexing costs ~5 ms per field at
    800x608 (ops/gather.py) and this runs once per alpha restart."""
    from .gather import gather_rows
    from .texture import sample_material_channel

    tri = jnp.maximum(hit.tri, 0)
    geom = scene.geometry
    t_count = geom.num_triangles
    gtable = jnp.concatenate(
        [
            jnp.asarray(geom.uvs).reshape(t_count, 6),
            jnp.asarray(geom.material_id).astype(jnp.float32).reshape(t_count, 1),
        ],
        axis=-1,
    )
    g = jnp.take(gtable, tri.reshape(-1), axis=0, mode="clip").reshape(
        tri.shape + (7,)
    )
    uvs = g[..., 0:6].reshape(tri.shape + (3, 2))
    mat_id = g[..., 6].astype(jnp.int32)

    mtable = jnp.concatenate(
        [
            jnp.asarray(scene.materials.base_color),
            jnp.asarray(scene.materials.base_color_tex),
            jnp.asarray(scene.materials.alpha_blend).astype(jnp.float32)[:, None],
        ],
        axis=-1,
    )
    mrows = gather_rows(mtable, mat_id)
    blend = mrows[..., 8] != 0.0

    u = hit.u[..., None]
    v = hit.v[..., None]
    w = 1.0 - u - v
    uv = w * uvs[..., 0, :] + u * uvs[..., 1, :] + v * uvs[..., 2, :]
    base = sample_material_channel(
        scene, mrows[..., 0:4], mrows[..., 4:8], uv,
        enabled=scene.materials.tex_channels[0],
    )
    return jnp.where(hit.is_some & blend, base[..., 3], 1.0)


def trace_closest(scene: Scene, o: jnp.ndarray, d: jnp.ndarray) -> TriangleHit:
    """Closest OPAQUE hit. When the scene has AlphaMode::Blend materials,
    hits whose sampled base-color alpha < 1 are skipped by restarting the
    ray past them (the TPU-shaped equivalent of the reference's
    mid-traversal alpha re-test, ray.rs:212-229)."""
    mesh = _TRACE_MESH.get()
    if mesh is not None:
        return _shard_over_rows(mesh, trace_closest, scene, o, d)
    if not scene.has_alpha:
        return _trace_closest_opaque(scene, o, d)

    zero = o[..., 0] * 0.0

    def body(_, carry):
        o_cur, t_off, done, bt, btri, bu, bv = carry
        hit = _trace_closest_opaque(scene, o_cur, d)
        alpha = _hit_alpha(scene, hit)
        opaque = hit.is_some & (alpha >= 1.0)
        accept = ~done & opaque
        t_tot = t_off + hit.t
        bt = jnp.where(accept, t_tot, bt)
        btri = jnp.where(accept, hit.tri, btri)
        bu = jnp.where(accept, hit.u, bu)
        bv = jnp.where(accept, hit.v, bv)
        done = done | opaque | ~hit.is_some
        step = jnp.where(hit.is_some, hit.t, 0.0) + _ALPHA_SKIP_EPS
        o_cur = jnp.where(done[..., None], o_cur, o_cur + d * step[..., None])
        t_off = jnp.where(done, t_off, t_off + step)
        return o_cur, t_off, done, bt, btri, bu, bv

    init = (
        o,
        zero,
        zero.astype(bool),
        zero + jnp.inf,
        zero.astype(jnp.int32) - 1,
        zero,
        zero,
    )
    _, _, _, bt, btri, bu, bv = jax.lax.fori_loop(
        0, MAX_ALPHA_RESTARTS, body, init
    )
    return TriangleHit(t=bt, tri=btri, u=bu, v=bv)


def _trace_anyhit_opaque(scene: Scene, o, d, t_max) -> jnp.ndarray:
    big = scene.geometry.num_triangles > BRUTE_FORCE_MAX_TRIS
    if scene.bvh is not None and big:
        if _pallas_available() and (
            BIG_SCENE_STRATEGY == "stream"
            or (
                BIG_SCENE_STRATEGY == "cluster"
                and not _cluster_kernel_fits(scene)
            )
        ):
            from .pallas.stream_kernels import stream_trace_anyhit_pallas

            rows = _packed_geom_rows(scene)
            return stream_trace_anyhit_pallas(
                _cluster_rows(scene),
                rows,
                jax.lax.stop_gradient(o),
                jax.lax.stop_gradient(d),
                jax.lax.stop_gradient(jnp.broadcast_to(t_max, o.shape[:-1])),
                interpret=_interpret(),
            )
        if (
            _pallas_available()
            and BIG_SCENE_STRATEGY == "cluster"
            and _cluster_kernel_fits(scene)
        ):
            from .pallas.cluster_kernels import cluster_trace_anyhit_pallas

            rows = _packed_geom_rows(scene)
            return cluster_trace_anyhit_pallas(
                _cluster_rows(scene),
                rows,
                jax.lax.stop_gradient(o),
                jax.lax.stop_gradient(d),
                jax.lax.stop_gradient(jnp.broadcast_to(t_max, o.shape[:-1])),
                interpret=_interpret(),
            )
        if _pallas_available() and _bvh_kernel_fits(scene):
            from .pallas.bvh_kernels import bvh_trace_anyhit_pallas, pack_nodes

            rows = _packed_geom_rows(scene)
            return bvh_trace_anyhit_pallas(
                pack_nodes(scene.bvh),
                rows,
                jax.lax.stop_gradient(o),
                jax.lax.stop_gradient(d),
                jax.lax.stop_gradient(jnp.broadcast_to(t_max, o.shape[:-1])),
                interpret=_interpret(),
            )
        from ..bvh.traverse import trace_anyhit_bvh

        # boolean occlusion: detach inputs so the traversal's while_loop
        # never sees tangents under differentiation
        sg = jax.lax.stop_gradient
        return trace_anyhit_bvh(
            sg(scene), sg(o), sg(d), sg(jnp.broadcast_to(t_max, o.shape[:-1]))
        )
    if _pallas_available():
        return _trace_anyhit_pallas(scene, o, d, t_max)
    return trace_anyhit_brute(scene, o, d, t_max)


def trace_anyhit(
    scene: Scene, o: jnp.ndarray, d: jnp.ndarray, t_max: jnp.ndarray
) -> jnp.ndarray:
    """Occlusion query counting only opaque geometry: alpha-blend hits
    do not occlude unless their sampled alpha is 1 (ray.rs:84-112 with
    the :212-229 alpha re-test)."""
    mesh = _TRACE_MESH.get()
    if mesh is not None:
        t_max = jnp.broadcast_to(t_max, o.shape[:-1])
        return _shard_over_rows(mesh, trace_anyhit, scene, o, d, t_max)
    if not scene.has_alpha:
        return _trace_anyhit_opaque(scene, o, d, t_max)

    t_max = jnp.broadcast_to(t_max, o.shape[:-1])
    zero = o[..., 0] * 0.0

    def body(_, carry):
        o_cur, t_off, done, occluded = carry
        hit = _trace_closest_opaque(scene, o_cur, d)
        alpha = _hit_alpha(scene, hit)
        t_tot = t_off + hit.t
        in_range = hit.is_some & (t_tot < t_max)
        opaque = in_range & (alpha >= 1.0)
        occluded = occluded | (~done & opaque)
        done = done | opaque | ~in_range
        step = jnp.where(hit.is_some, hit.t, 0.0) + _ALPHA_SKIP_EPS
        o_cur = jnp.where(done[..., None], o_cur, o_cur + d * step[..., None])
        t_off = jnp.where(done, t_off, t_off + step)
        return o_cur, t_off, done, occluded

    init = (o, zero, zero.astype(bool), zero.astype(bool))
    _, _, _, occluded = jax.lax.fori_loop(0, MAX_ALPHA_RESTARTS, body, init)
    return occluded


def _packed_geom_rows(scene: Scene):
    from .pallas.trace_kernels import pack_geometry

    rows = pack_geometry(scene.geometry)
    pad = (-rows.shape[0]) % 8
    if pad:
        rows = jnp.concatenate([rows, jnp.zeros((pad, 28), rows.dtype)])
    return jax.lax.stop_gradient(rows)
