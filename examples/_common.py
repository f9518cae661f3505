"""Shared example plumbing: tonemap, PNG output, CLI.

Counterpart of bevy-strolle/examples/_common.rs (camera-mode key
handling, asset extraction): headless here — render N frames, write
PNGs under out/<name>/, print per-frame timing.  The reference's
camera-mode hotkeys (1-9, _common.rs:70-135) become the --mode flag.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

MODES = [
    "image",
    "di_diffuse",
    "di_specular",
    "gi_diffuse",
    "gi_specular",
    "albedo",
    "depth",
    "reference",
    "bvh_heatmap",
]


def parse_args(name: str, frames: int = 32, width: int = 512, height: int = 512):
    ap = argparse.ArgumentParser(description=f"strolle_tpu example: {name}")
    ap.add_argument("--frames", type=int, default=frames)
    ap.add_argument("--width", type=int, default=width)
    ap.add_argument("--height", type=int, default=height)
    ap.add_argument("--mode", choices=MODES, default="image")
    ap.add_argument("--no-denoise", action="store_true")
    ap.add_argument("--out", default=os.path.join("out", name))
    ap.add_argument("--save-every", type=int, default=8)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    return ap.parse_args()


def force_cpu_if(flag: bool) -> None:
    if flag:
        import jax

        jax.config.update("jax_platforms", "cpu")


def tonemap(img: np.ndarray) -> np.ndarray:
    """Linear HDR -> sRGB-ish u8 (the reference delegates to Bevy's
    tonemapping node; plain gamma keeps examples dependency-free)."""
    a = np.clip(np.asarray(img, np.float32), 0.0, 1.0) ** (1.0 / 2.2)
    return (a * 255.0 + 0.5).astype(np.uint8)


def save_png(path: str, img: np.ndarray) -> None:
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    arr = np.asarray(img)
    if arr.ndim == 2:  # depth-style channel
        mx = float(arr.max()) or 1.0
        arr = np.repeat((arr / mx)[..., None], 3, axis=-1)
    Image.fromarray(tonemap(arr)).save(path)


class FrameTimer:
    def __init__(self) -> None:
        self.times: list[float] = []
        self._t0 = time.perf_counter()

    def lap(self) -> float:
        t = time.perf_counter()
        dt = t - self._t0
        self._t0 = t
        self.times.append(dt)
        return dt

    def report(self, skip_first: int = 1) -> str:
        ts = self.times[skip_first:] or self.times
        ms = 1e3 * sum(ts) / len(ts)
        return f"{ms:.1f} ms/frame ({1e3 / ms:.1f} FPS) over {len(ts)} frames"
