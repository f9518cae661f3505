import numpy as np
import jax.numpy as jnp

from strolle_tpu import camera as cam


def _make():
    return cam.make_camera(
        eye=[0.0, 1.0, 3.0],
        target=[0.0, 1.0, 0.0],
        fov_y=np.pi / 4,
        width=64,
        height=48,
    )


def test_center_ray_points_forward():
    c = _make()
    o, d = cam.pixel_rays(c, jnp.asarray([32, 24]))
    d = np.asarray(d)
    assert np.allclose(d, [0, 0, -1], atol=0.03)
    assert np.asarray(o)[2] < 3.0  # near plane in front of eye


def test_rays_normalized_and_diverge():
    c = _make()
    o, d = cam.primary_rays(c)
    d = np.asarray(d)
    assert d.shape == (48, 64, 3)
    assert np.allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # corner rays differ
    assert not np.allclose(d[0, 0], d[-1, -1])
    # left half points left
    assert d[:, :20, 0].max() < 0


def test_world_to_screen_roundtrip():
    c = _make()
    o, d = cam.primary_rays(c)
    pts = np.asarray(o) + np.asarray(d) * 2.5
    screen = np.asarray(cam.world_to_screen(c, jnp.asarray(pts)))
    ys, xs = np.meshgrid(np.arange(48), np.arange(64), indexing="ij")
    # f32 matrix inverse round-trip costs ~0.1 px at screen edges
    assert np.allclose(screen[..., 0], xs + 0.5, atol=0.15)
    assert np.allclose(screen[..., 1], ys + 0.5, atol=0.15)


def test_contain_mirroring():
    """Camera::contain unit-test cases (camera.rs:146-175)."""
    c = cam.make_camera(
        eye=[0, 0, 1], target=[0, 0, 0], width=1024, height=768
    )
    cases = [
        ((0, 0), (0, 0)),
        ((123, 456), (123, 456)),
        ((1023, 767), (1023, 767)),
        ((1024, 768), (1023, 767)),
        ((1025, 768), (1022, 767)),
        ((1030, 768), (1017, 767)),
        ((1030, 783), (1017, 752)),
        ((-1, -2), (1, 2)),
    ]
    for (x, y), (ex, ey) in cases:
        out = np.asarray(cam.contain(c, jnp.asarray([x, y])))
        assert tuple(out) == (ex, ey), ((x, y), tuple(out), (ex, ey))


def test_cameras_approx_eq():
    c = _make()
    assert bool(cam.cameras_approx_eq(c, c))
    c2 = cam.make_camera(
        eye=[0.0, 1.2, 3.0], target=[0.0, 1.0, 0.0],
        fov_y=np.pi / 4, width=64, height=48,
    )
    assert not bool(cam.cameras_approx_eq(c, c2))
