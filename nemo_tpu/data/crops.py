"""Image crop utilities: bbox -> square patch crop + ImageNet normalize.

Behavioral reference: hmr/img_utils.py (get_single_image_crop / crop_image)
— the affine crop feeding HMR/VIBE 224x224 inputs. cv2-free: the affine
resample is a numpy bilinear gather (host side), or a jax version for
device-side batch preprocessing.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..body.constants import IMG_NORM_MEAN, IMG_NORM_STD, IMG_RES


def bbox_from_keypoints(kp: np.ndarray, rescale: float = 1.2
                        ) -> np.ndarray:
    """Square bbox [cx, cy, size] around confident keypoints (..., K, 3)."""
    conf = kp[..., 2] > 0
    xs = np.where(conf, kp[..., 0], np.nan)
    ys = np.where(conf, kp[..., 1], np.nan)
    x0, x1 = np.nanmin(xs, -1), np.nanmax(xs, -1)
    y0, y1 = np.nanmin(ys, -1), np.nanmax(ys, -1)
    cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
    size = np.maximum(x1 - x0, y1 - y0) * rescale
    return np.stack([cx, cy, size], -1)


def crop_image(img: np.ndarray, center: Tuple[float, float], size: float,
               out_res: int = IMG_RES) -> np.ndarray:
    """Crop a square patch (bilinear, zero-padded outside) -> (res, res, C)."""
    H, W = img.shape[:2]
    cx, cy = center
    # source sample grid
    lin = (np.arange(out_res) + 0.5) / out_res - 0.5
    xs = cx + lin * size
    ys = cy + lin * size
    gx, gy = np.meshgrid(xs, ys)

    x0 = np.floor(gx).astype(np.int64)
    y0 = np.floor(gy).astype(np.int64)
    fx = gx - x0
    fy = gy - y0

    def sample(yy, xx):
        valid = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
        yy = np.clip(yy, 0, H - 1)
        xx = np.clip(xx, 0, W - 1)
        out = img[yy, xx].astype(np.float32)
        return out * valid[..., None]

    c = (sample(y0, x0) * ((1 - fx) * (1 - fy))[..., None]
         + sample(y0, x0 + 1) * (fx * (1 - fy))[..., None]
         + sample(y0 + 1, x0) * ((1 - fx) * fy)[..., None]
         + sample(y0 + 1, x0 + 1) * (fx * fy)[..., None])
    return c


def get_single_image_crop(img: np.ndarray, bbox: np.ndarray,
                          out_res: int = IMG_RES,
                          normalize: bool = True) -> np.ndarray:
    """bbox [cx, cy, size] -> normalized (res, res, 3) float32 patch.

    Matches the reference pipeline: crop, scale to [0, 1], ImageNet
    normalize (hmr/img_utils.py + constants IMG_NORM_*). NHWC layout (the
    torch reference is CHW).
    """
    patch = crop_image(img, (bbox[0], bbox[1]), bbox[2], out_res)
    if img.dtype == np.uint8 or patch.max() > 2.0:
        patch = patch / 255.0
    if normalize:
        patch = (patch - np.asarray(IMG_NORM_MEAN)) / np.asarray(IMG_NORM_STD)
    return patch.astype(np.float32)
