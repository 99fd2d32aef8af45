"""Visualization: sample triptychs, tensor->image helpers, feature dumps.

Rebuild of utils/visualization.py: `plot_sample` (:45) saves the
noisy/denoised/GT triptych + standalone denoised PNG; `quality_assess`
(:26) returns the PSNR/SSIM dict (jnp metrics instead of skimage);
`tensor2im` (:10) with NHWC arrays.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .metrics import psnr as _psnr, matlab_ssim


def scale_down(img):
    return np.float32(img) / 255.0


def scale_up(img):
    return np.uint8(np.clip(img, 0, 1) * 255.0)


def tensor2im(x, video: bool = False) -> np.ndarray:
    """[B, H, W, C] (or [B, T, H, W, C] with video=True) -> uint8-scale
    float image(s) in [0, 255]."""
    arr = np.asarray(x, np.float32)
    if not video:
        arr = arr[0]
    return np.clip(arr * 255.0, 0, 255)


def quality_assess(X, Y, data_range: float = 255.0) -> dict:
    """X: estimate, Y: reference; [H, W, C] arrays."""
    p = float(_psnr(np.asarray(X), np.asarray(Y), data_range=data_range))
    s255 = 255.0 / data_range
    xs = np.moveaxis(np.asarray(X, np.float32) * s255, -1, 0)
    ys = np.moveaxis(np.asarray(Y, np.float32) * s255, -1, 0)
    s = float(matlab_ssim(xs, ys))
    return {"PSNR": p, "SSIM": s}


def plot_sample(img_lr, img_dn, img_hr, filename: str = "result",
                model_name: str = "Unet", epoch: int = -1,
                print_metrics: bool = False, save_plot: bool = True,
                save_path: str = "./", res=None):
    """Noisy / denoised / GT triptych jpg + denoised png
    (reference plot_sample, utils/visualization.py:45-96)."""
    if np.max(img_hr) <= 1:
        img_lr, img_dn, img_hr = map(scale_up, (img_lr, img_dn, img_hr))
    if res is None:
        q_lr = quality_assess(img_lr, img_hr)
        q_dn = quality_assess(img_dn, img_hr)
        psnr = [q_lr["PSNR"], q_dn["PSNR"], -1]
        ssim = [q_lr["SSIM"], q_dn["SSIM"], -1]
    else:
        psnr = [res[0], res[2], -1]
        ssim = [res[1], res[3], -1]
    os.makedirs(save_path, exist_ok=True)
    if save_plot:
        import cv2
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        images = {"Noisy Image": img_lr, model_name: img_dn,
                  "Ground Truth": img_hr}
        fig, axes = plt.subplots(1, 3, figsize=(20, 6))
        for i, (title, img) in enumerate(images.items()):
            axes[i].imshow(img)
            axes[i].set_title(f"{title}\n{img.shape} - psnr:{psnr[i]:.2f}"
                              f" - ssim{ssim[i]:.4f}")
            axes[i].axis("off")
        plt.suptitle(f"{filename} - Epoch: {epoch}")
        cv2.imwrite(os.path.join(save_path, f"{filename}_denoised.png"),
                    img_dn[:, :, ::-1])
        fig.savefig(os.path.join(save_path,
                                 f"{filename}-Epoch{epoch}.jpg"),
                    bbox_inches="tight")
        plt.close(fig)
    return psnr, ssim, filename
