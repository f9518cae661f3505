"""Viewer + debug UI: render loop, control plane, HTTP endpoints.

The reference validates its frontend visually (egui overlay,
debug.rs); here the same surface is a headless-testable HTTP server.
"""

import json
import urllib.request

import numpy as np
import pytest

from strolle_tpu.bvh import scene_with_bvh
from strolle_tpu.scene.cornell import cornell_box, cornell_camera
from strolle_tpu.viewer import MODES, OrbitCamera, Viewer, tonemap_u8


@pytest.fixture(scope="module")
def viewer():
    scene = scene_with_bvh(cornell_box())
    cam = cornell_camera(64, 64)
    v = Viewer(scene, cam, target=(0.0, 1.0, 0.0))
    yield v
    v.stop_server()


def test_render_one_produces_frame(viewer):
    img = viewer.render_one(seed=0)
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    assert img.max() > 0  # lit scene, not black
    st = viewer.state()
    assert st["frame"] == 1 and st["frame_ms"] > 0


def test_mode_switch_via_control(viewer):
    viewer.push_control({"mode": "albedo", "denoise": False})
    viewer.render_one(seed=1)
    assert viewer.state()["mode"] == "albedo"
    assert viewer.state()["denoise"] is False
    viewer.push_control({"mode": "image", "denoise": True})
    viewer.render_one(seed=2)


def test_orbit_camera_moves_eye(viewer):
    cam0 = viewer.orbit.camera()
    viewer.push_control({"orbit": [0.5, 0.1], "dolly": 1.2})
    viewer.render_one(seed=3)
    cam1 = viewer.orbit.camera()
    assert not np.allclose(np.asarray(cam0.origin), np.asarray(cam1.origin))


def test_orbit_round_trip_preserves_eye():
    cam = cornell_camera(32, 32)
    orb = OrbitCamera.from_camera(cam, target=(0.0, 1.0, 0.0))
    re = orb.camera()
    np.testing.assert_allclose(
        np.asarray(re.origin), np.asarray(cam.origin), atol=1e-5
    )


def test_http_endpoints(viewer):
    port = viewer.start_server(port=0)
    base = f"http://127.0.0.1:{port}"

    page = urllib.request.urlopen(f"{base}/", timeout=5).read()
    assert b"strolle-tpu" in page

    viewer.render_one(seed=4)
    jpg = urllib.request.urlopen(f"{base}/frame.jpg", timeout=5).read()
    assert jpg[:2] == b"\xff\xd8"  # JPEG SOI

    st = json.loads(urllib.request.urlopen(f"{base}/state", timeout=5).read())
    assert st["mode"] in MODES and st["frame"] >= 1

    req = urllib.request.Request(
        f"{base}/control",
        data=json.dumps({"light_scale": 2.0}).encode(),
        method="POST",
    )
    assert urllib.request.urlopen(req, timeout=5).status == 200
    viewer.render_one(seed=5)
    assert viewer.state()["light_scale"] == 2.0


def test_light_scale_brightens(viewer):
    viewer.push_control({"light_scale": 1.0, "mode": "di_diffuse",
                         "denoise": False})
    a = viewer.render_one(seed=6).astype(np.float32).mean()
    viewer.push_control({"light_scale": 3.0})
    b = viewer.render_one(seed=7).astype(np.float32).mean()
    assert b > a


def test_tonemap_handles_depth_channel():
    out = tonemap_u8(np.ones((4, 4), np.float32) * 5.0)
    assert out.shape == (4, 4, 3)


def test_fxaa_smooths_edges_only():
    from strolle_tpu.viewer import fxaa

    img = np.zeros((16, 16, 3), np.uint8)
    img[:, 8:] = 255  # hard vertical edge
    out = fxaa(img)
    assert out.shape == img.shape and out.dtype == np.uint8
    # edge columns got blended toward the neighborhood
    assert out[8, 7].mean() > 0 or out[8, 8].mean() < 255
    # flat interior untouched
    assert (out[:, :4] == 0).all() and (out[:, 12:] == 255).all()


def test_upscale_factor_and_identity():
    from strolle_tpu.viewer import upscale

    img = np.arange(8 * 6 * 3, dtype=np.uint8).reshape(8, 6, 3)
    assert upscale(img, 1.0) is img
    up = upscale(img, 1.5)  # demo.rs:24-25 viewport factor
    assert up.shape == (12, 9, 3)
    assert up.dtype == np.uint8
    # bilinear: corner values preserved
    assert (up[0, 0] == img[0, 0]).all()


def test_viewer_display_chain_controls():
    """fxaa/upscale reachable via the control plane and render_one
    produces the upscaled frame."""
    from strolle_tpu.bvh import scene_with_bvh
    from strolle_tpu.camera import make_camera
    from strolle_tpu.scene.cornell import cornell_box
    from strolle_tpu.viewer import Viewer

    scene = scene_with_bvh(cornell_box())
    cam = make_camera((0, 1, 3.4), (0, 1, 0), width=32, height=24)
    v = Viewer(scene, cam, mode="albedo", target=(0, 1, 0),
               use_fxaa=True, upscale_factor=1.5)
    u8 = v.render_one(seed=1)
    assert u8.shape == (36, 48, 3)
    v.push_control({"fxaa": False, "upscale": 1.0})
    u8 = v.render_one(seed=2)
    assert u8.shape == (24, 32, 3)
