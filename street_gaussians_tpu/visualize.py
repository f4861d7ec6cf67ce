"""Visualization: depth/diff colormaps, image dumps, per-camera videos.

Re-design of the reference visualizers (ref: lib/visualizers/
base_visualizer.py:13-120, street_gaussian_visualizer.py:12-181,
lib/utils/img_utils.py:242-255): numpy/cv2 only (mp4 via cv2.VideoWriter
— the reference uses imageio, absent here).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import cv2
import numpy as np


def visualize_depth(depth: np.ndarray, minmax=None, cmap=cv2.COLORMAP_JET):
    """Depth -> color image (ref: img_utils.py:242-255): 2-98 percentile
    normalization of valid (>0) values."""
    x = np.nan_to_num(depth)
    if minmax is None:
        valid = x[x > 0]
        mi = np.percentile(valid, 2) if valid.size else 0.0
        ma = np.percentile(valid, 98) if valid.size else 1.0
    else:
        mi, ma = minmax
    x = np.clip((x - mi) / (ma - mi + 1e-8), 0, 1)
    x = (255 * x).astype(np.uint8)
    return cv2.applyColorMap(x, cmap)[..., ::-1], (mi, ma)


def visualize_diff(pred: np.ndarray, gt: np.ndarray, cmap=cv2.COLORMAP_TURBO):
    """Squared-error heatmap (ref: base_visualizer.py:42-66)."""
    diff = ((pred - gt) ** 2).sum(axis=-1)
    x = np.clip(diff / max(diff.max(), 1e-8), 0, 1)
    return cv2.applyColorMap((255 * x).astype(np.uint8), cmap)[..., ::-1]


def to_u8(img: np.ndarray) -> np.ndarray:
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def save_image(path: str, img: np.ndarray) -> None:
    cv2.imwrite(path, to_u8(img)[..., ::-1] if img.ndim == 3 else to_u8(img))


def write_video(path: str, frames: List[np.ndarray], fps: int = 24) -> None:
    """uint8 RGB frames -> mp4 (ref: *_visualizer save_video paths)."""
    if not frames:
        return
    h, w = frames[0].shape[:2]
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    for f in frames:
        vw.write(f[..., ::-1])
    vw.release()


class Visualizer:
    """Collects per-frame channels and writes pngs + videos
    (ref: base_visualizer.py:13-120)."""

    def __init__(self, save_dir: str, save_image: bool = True, save_video: bool = True, fps: int = 24):
        self.dir = save_dir
        os.makedirs(save_dir, exist_ok=True)
        self.save_image = save_image
        self.save_video = save_video
        self.fps = fps
        self.channels: Dict[str, List[np.ndarray]] = {}

    def add(self, name: str, image_name: str, img: np.ndarray) -> None:
        u8 = to_u8(img) if img.dtype != np.uint8 else img
        if self.save_image:
            save_image(os.path.join(self.dir, f"{image_name}_{name}.png"), img if img.dtype != np.uint8 else img / 255.0)
        if self.save_video:
            self.channels.setdefault(name, []).append(u8)

    def visualize_result(self, result: Dict, image_name: str, gt: Optional[np.ndarray] = None) -> None:
        rgb = np.asarray(result["rgb"])
        self.add("rgb", image_name, rgb)
        if "depth" in result:
            d, _ = visualize_depth(np.asarray(result["depth"]))
            self.add("depth", image_name, d)
        if gt is not None:
            self.add("gt", image_name, gt)
            self.add("diff", image_name, visualize_diff(rgb, gt))

    def summarize(self) -> None:
        if self.save_video:
            for name, frames in self.channels.items():
                write_video(
                    os.path.join(self.dir, f"{name}.mp4"), frames, self.fps
                )
