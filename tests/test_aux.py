"""Auxiliary subsystems: heatmap, metrics, checkpoint (SURVEY.md §5)."""

import logging
import time

import numpy as np
import jax.numpy as jnp

from strolle_tpu.bvh import scene_with_bvh
from strolle_tpu.scene.cornell import cornell_box, cornell_camera


def test_heatmap_gradient_stops():
    from strolle_tpu.models.heatmap import heatmap_gradient

    g = np.asarray(heatmap_gradient(jnp.asarray([0.0, 1.0 / 3, 2.0 / 3, 1.0, 2.0])))
    assert np.allclose(g[0], [0, 0, 1], atol=1e-6)  # blue
    assert np.allclose(g[1], [0, 1, 0], atol=1e-5)  # green
    assert np.allclose(g[2], [1, 0, 0], atol=1e-5)  # red
    assert np.allclose(g[3], [0, 0, 0], atol=1e-6)  # black
    assert np.allclose(g[4], [0, 0, 0], atol=1e-6)  # clamped


def test_heatmap_render_and_cost():
    from strolle_tpu.camera import pixel_rays, screen_grid
    from strolle_tpu.models.heatmap import render_heatmap, trace_cost

    scene = scene_with_bvh(cornell_box())
    cam = cornell_camera(32, 32)
    img = np.asarray(render_heatmap(scene, cam))
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()
    assert (img >= 0).all() and (img <= 1).all()

    grid = screen_grid(cam)
    o, d = pixel_rays(cam, grid)
    cost = np.asarray(trace_cost(scene, o, d))
    # every primary ray at least visits the root node
    assert (cost >= 64).all()
    # cost varies across the image (boxes vs bare walls)
    assert cost.std() > 0


def test_measure_and_summary(caplog):
    from strolle_tpu.utils import metrics

    metrics.enable(True, threshold=0.0)
    try:
        with caplog.at_level(logging.DEBUG, logger="strolle_tpu"):
            with metrics.measure("test.stage"):
                time.sleep(0.01)
            t0 = time.perf_counter()
            metrics.metric("test.manual", t0)
        s = metrics.summary()
        assert s["test.stage"]["calls"] >= 1
        assert s["test.stage"]["total_s"] >= 0.01
        assert any("metric(test.stage)" in r.getMessage() for r in caplog.records)
    finally:
        metrics.enable(False)


def test_measure_disabled_is_noop():
    from strolle_tpu.utils import metrics

    metrics.enable(False)
    before = dict(metrics.totals)
    with metrics.measure("noop.stage"):
        pass
    assert "noop.stage" not in metrics.totals or metrics.totals[
        "noop.stage"
    ] == before.get("noop.stage")


def test_checkpoint_roundtrip(tmp_path):
    from strolle_tpu.models.restir import init_state
    from strolle_tpu.utils import checkpoint
    import jax

    cam = cornell_camera(8, 8)
    state = init_state(cam)
    state = state.replace(frame=jnp.asarray(42, jnp.int32))
    ckpt = {"render": state, "step": np.asarray(7)}

    path = tmp_path / "ckpt" / "0"
    checkpoint.save(path, ckpt)
    restored = checkpoint.restore(str(path), ckpt)

    assert int(restored["step"]) == 7
    assert int(restored["render"].frame) == 42
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored["render"])):
        assert np.asarray(a).shape == np.asarray(b).shape

    assert checkpoint.latest_step(tmp_path / "ckpt") == 0


def test_scene_stats():
    from strolle_tpu.utils import metrics

    scene = scene_with_bvh(cornell_box())
    # disabled -> None
    assert metrics.scene_stats(scene) is None
    metrics._STATS = True
    try:
        s = metrics.scene_stats(scene, 3)
        assert s["triangles"] > 0
        assert s["lights"] >= 1
        assert s["bvh_nodes"] > 0
    finally:
        metrics._STATS = False


def test_no_module_level_device_array_constants():
    """Module-level jnp arrays are committed device buffers; a jitted
    program that closure-captures one hangs or permanently degrades
    every subsequent dispatch in the process on the axon TPU runtime
    (measured: a trivial jitted add goes 0.1 -> 25 ms, irreversibly).
    Constants must be numpy; device data must be jit ARGUMENTS."""
    import importlib
    import pkgutil

    import jax

    import strolle_tpu

    offenders = []
    import_failures = []
    for mod_info in pkgutil.walk_packages(
        strolle_tpu.__path__, prefix="strolle_tpu."
    ):
        try:
            mod = importlib.import_module(mod_info.name)
        except Exception as e:  # an unimportable module could hide offenders
            import_failures.append(f"{mod_info.name}: {e!r}")
            continue
        for name, val in vars(mod).items():
            # scan nested containers (tuples/lists/dicts/pytree
            # dataclasses) too, not just direct module attributes
            for path, leaf in jax.tree_util.tree_flatten_with_path(val)[0]:
                if isinstance(leaf, jax.Array):
                    keys = "".join(str(k) for k in path)
                    offenders.append(f"{mod_info.name}.{name}{keys}")
    assert not import_failures, (
        "modules failed to import (cannot be scanned): "
        + ", ".join(import_failures)
    )
    assert not offenders, (
        "module-level device arrays (poison hazard): " + ", ".join(offenders)
    )
