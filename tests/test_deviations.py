"""Pins the documented, deliberate behavioral deviations from the
reference so their magnitude is measured rather than assumed:

1. à-trous jitter applied per-FIELD instead of per-tap
   (denoise/svgf.py _wavelet_impl vs frame_denoising.rs:300-306);
2. edge-stopping sigma ramp SATURATED instead of extrapolated negative
   above var=1 (svgf.py vs frame_denoising.rs:263-266);
3. alpha-tested transparency restart cap MAX_ALPHA_RESTARTS=4
   (ops/trace.py vs the reference's unbounded in-traversal re-test,
   ray.rs:212-229).

If a refactor changes any of these semantics the bounds here fail,
making the drift visible instead of silent.
"""

import numpy as np
import jax.numpy as jnp

from strolle_tpu.denoise import svgf
from strolle_tpu.ops import math as vm


def _field(seed=0, h=64, w=64):
    rs = np.random.RandomState(seed)
    color = jnp.asarray(rs.uniform(0, 1, (h, w, 3)).astype(np.float32))
    var = jnp.asarray(rs.uniform(0, 0.5, (h, w)).astype(np.float32))
    depth = jnp.asarray(
        (2.0 + rs.uniform(0, 0.01, (h, w))).astype(np.float32)
    )
    normal = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (h, w, 3)
    )
    skyf = jnp.zeros((h, w), jnp.float32)
    jy = jnp.asarray(rs.randint(-3, 4, (h, w)).astype(np.int32))
    jx = jnp.asarray(rs.randint(-3, 4, (h, w)).astype(np.int32))
    return color, var, depth, normal, skyf, jy, jx


def test_per_field_jitter_is_mean_preserving_bounded_dither():
    """The reference jitters each tap by the center pixel's blue-noise
    offset (frame_denoising.rs:300-306); the repo jitters the sampled
    fields once per pass instead. Both are zero-mean dithers of the
    same magnitude around the unjittered filter. Pin that: (a) the
    jittered output's mean matches the unjittered filter's mean, and
    (b) the per-pixel dither amplitude stays bounded — so a refactor
    that silently changes the jitter semantics (e.g. double-applies
    offsets) fails here."""
    color, var, depth, normal, skyf, jy, jx = _field()
    stride, strength, radius = 4, 3.0, 1
    sigma_ab = (2.5, 0.5)
    jyc = jnp.clip(jy, -radius, radius).astype(jnp.float32)
    jxc = jnp.clip(jx, -radius, radius).astype(jnp.float32)

    def run(jyf, jxf):
        return np.asarray(
            svgf._wavelet_impl(
                stride, strength, radius, sigma_ab,
                color, color, var, depth, normal, skyf, jyf, jxf,
            )[0]
        )

    plain = run(jnp.zeros_like(jyc), jnp.zeros_like(jxc))
    jittered = run(jyc, jxc)

    assert abs(jittered.mean() - plain.mean()) < 0.01  # mean-preserving
    amp = np.abs(jittered - plain).mean()
    assert 0.0 < amp < 0.12, f"jitter dither amplitude drifted: {amp:.4f}"


def test_sigma_ramp_saturates_above_var_one():
    """frame_denoising.rs:263-266 lerps on raw sqrt(var), going
    NEGATIVE above var=1 (exp overflow for bright sky). The repo
    saturates: sigma == b for all var >= 1, and matches the reference
    formula exactly for var <= 1."""
    a, b = 2.5, 0.5
    for var in (0.0, 0.25, 0.81, 1.0):
        ours = float(
            vm.lerp(
                jnp.float32(a), jnp.float32(b),
                vm.saturate(jnp.sqrt(jnp.float32(var))),
            )
        )
        ref = a + (b - a) * np.sqrt(var)
        np.testing.assert_allclose(ours, ref, rtol=1e-6)
    for var in (4.0, 100.0):
        ours = float(
            vm.lerp(
                jnp.float32(a), jnp.float32(b),
                vm.saturate(jnp.sqrt(jnp.float32(var))),
            )
        )
        assert ours == b  # saturated — never the negative extrapolation
        assert a + (b - a) * np.sqrt(var) < 0  # what the reference does


def test_alpha_restart_cap_pins_layer_limit():
    """MAX_ALPHA_RESTARTS=4 (= 4 trace iterations, so up to THREE
    transparent panes are seen through): through 3 panes the opaque
    wall is found; behind 4 panes the capped restart loop gives up
    (documented deviation from the reference's unbounded in-traversal
    re-test)."""
    from strolle_tpu.ops.trace import MAX_ALPHA_RESTARTS, trace_closest
    from strolle_tpu.scene.types import (
        Geometry, Scene, make_lights, make_materials,
    )

    assert MAX_ALPHA_RESTARTS == 4  # the documented cap

    def quad(z):
        # two triangles spanning [-1,1]^2 at depth z
        return [
            [[-1, -1, z], [1, -1, z], [1, 1, z]],
            [[-1, -1, z], [1, 1, z], [-1, 1, z]],
        ]

    for n_panes, expect_wall in ((3, True), (4, False)):
        tris = []
        mids = []
        for i in range(n_panes):
            tris += quad(-1.0 - i)
            mids += [1, 1]
        tris += quad(-10.0)
        mids += [0, 0]
        verts = np.asarray(tris, np.float32)
        t = verts.shape[0]
        e1 = verts[:, 1] - verts[:, 0]
        e2 = verts[:, 2] - verts[:, 0]
        n = np.cross(e1, e2)
        n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
        geom = Geometry(
            positions=verts,
            normals=np.repeat(n[:, None, :], 3, axis=1),
            uvs=np.zeros((t, 3, 2), np.float32),
            tangents=np.zeros((t, 3, 4), np.float32),
            material_id=np.asarray(mids, np.int32),
        )
        mats = make_materials(
            [
                {"base_color": [1, 1, 1, 1]},  # opaque wall
                {"base_color": [1, 1, 1, 0.0], "alpha_blend": 1},
            ]
        )
        scene = Scene(
            geometry=geom,
            materials=mats,
            lights=make_lights([]),
            atlas=None,
            sun_azimuth=jnp.asarray(0.0, jnp.float32),
            sun_altitude=jnp.asarray(-1.0, jnp.float32),
            bvh=None,
            has_alpha=True,
        )
        assert scene.has_alpha
        o = jnp.asarray([[0.0, 0.0, 5.0]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
        hit = trace_closest(scene, o, d)
        hit_wall = bool(np.asarray(hit.tri >= 0)[0]) and bool(
            np.asarray(hit.t)[0] > 10.0
        )
        assert hit_wall == expect_wall, (
            f"{n_panes} panes: wall hit={hit_wall}, expected {expect_wall}"
        )
