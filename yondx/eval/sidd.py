"""SIDD evaluation / benchmark harness (reference YOND_SIDD.eval :485-570,
.benchmark :572-630, multiprocess_plot :635-677).

Per scene: run the iterative engine, compute raw PSNR (data_range 1) +
MATLAB SSIM (x255) per 256x256 crop per iteration, log per-image lines,
persist per-image metrics to metrics/{method}_metrics.pkl and cache outputs
to npy/{method}/{k:03d}.npy; metric/PNG work runs on a thread pool off the
device path.
"""
from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, Optional

import numpy as np

from ..core.logging import log
from ..core.meters import AverageMeter, MetricsRecorder
from .metrics import psnr, matlab_ssim


class SIDDEvalHarness:
    def __init__(self, engine, dataset, method_name: str,
                 max_iter: int = 1, save_plot: bool = False,
                 sample_dir: str = "images", logfile: Optional[str] = None,
                 cache_npy: bool = True):
        self.engine = engine
        self.dataset = dataset
        self.method_name = method_name
        self.max_iter = max_iter
        self.save_plot = save_plot
        self.sample_dir = sample_dir
        self.logfile = logfile or f"./logs/log_{method_name}.log"
        self.cache_npy = cache_npy
        self.metrics = MetricsRecorder(
            f"./metrics/{method_name}_metrics.pkl")
        self.psnrs = [AverageMeter("PSNR") for _ in range(max_iter + 2)]
        self.ssims = [AverageMeter("SSIM") for _ in range(max_iter + 2)]
        self.psnrs_rgb = [AverageMeter("PSNR_RGB") for _ in range(max_iter + 2)]
        self.ssims_rgb = [AverageMeter("SSIM_RGB") for _ in range(max_iter + 2)]

    def _score_scene(self, name: str, raw_dns, lr, hr, meta=None):
        """Metric work for one scene (runs on the thread pool).

        Protocol parity with the reference multiprocess_plot
        (YOND_SIDD.py:635-677): raw PSNR is computed PER 256x256 CROP at
        data_range=1 and meaned over the 32 crops (:651) — NOT one PSNR
        over the whole stack (a different statistic); SSIM likewise per
        crop at x255 (:652). A non-positive output updates -1 (:645-648).
        With save_plot and metadata, also the sRGB branch: render noisy/GT
        /denoised PNGs via process_sidd_image and per-crop sRGB PSNR/SSIM
        at data_range=255 (:658-670).
        """
        rec = {"psnr": [], "ssim": []}
        srgb = bool(self.save_plot and meta is not None
                    and all(k in meta for k in ("bayer_2by2", "wb", "cst2")))
        img_hr = None
        if srgb:
            rec["psnr_rgb"], rec["ssim_rgb"] = [], []
            os.makedirs(self.sample_dir, exist_ok=True)
            self._render_png(lr, meta, f"{name[:4]}_noisy.png")
            if hr is not None:
                img_hr = self._render_png(hr, meta, f"{name[:4]}_gt.png")
        last = (0.0, 0.0)
        for it, dn in enumerate(raw_dns):
            if np.max(dn) <= 0:
                self.psnrs[it].update(-1)
                self.ssims[it].update(-1)
                continue
            p = float(np.mean([float(psnr(d, h, data_range=1.0))
                               for d, h in zip(dn, hr)]))
            s = float(np.mean([float(matlab_ssim(d * 255, h * 255))
                               for d, h in zip(dn, hr)]))
            self.psnrs[it].update(p)
            self.ssims[it].update(s)
            rec["psnr"].append(p)
            rec["ssim"].append(s)
            last = (p, s)
            if srgb:
                img_dn = self._render_png(dn, meta, f"{name[:4]}_{it}.png")
                if img_hr is not None:
                    dn_c = np.split(img_dn, dn.shape[0], axis=-2)
                    hr_c = np.split(img_hr, dn.shape[0], axis=-2)
                    p_rgb = float(np.mean(
                        [float(psnr(a.astype(np.float32),
                                    b.astype(np.float32), data_range=255.0))
                         for a, b in zip(dn_c, hr_c)]))
                    s_rgb = float(np.mean(
                        [float(matlab_ssim(
                            np.moveaxis(a, -1, 0).astype(np.float32),
                            np.moveaxis(b, -1, 0).astype(np.float32)))
                         for a, b in zip(dn_c, hr_c)]))
                    self.psnrs_rgb[it].update(p_rgb)
                    self.ssims_rgb[it].update(s_rgb)
                    rec["psnr_rgb"].append(p_rgb)
                    rec["ssim_rgb"].append(s_rgb)
        self.psnrs[-1].update(last[0])
        self.ssims[-1].update(last[1])
        self.metrics[name] = {**self.metrics.data.get(name, {}), **rec}
        log(f"{name}: PSNR={last[0]:.2f}, SSIM={last[1]:.4f}",
            logfile=self.logfile)
        if srgb and rec.get("psnr_rgb"):
            self.psnrs_rgb[-1].update(rec["psnr_rgb"][-1])
            self.ssims_rgb[-1].update(rec["ssim_rgb"][-1])
            log(f"PSNR(sRGB)={rec['psnr_rgb'][-1]:.2f}, "
                f"SSIM(sRGB)={rec['ssim_rgb'][-1]:.4f}",
                logfile=self.logfile)

    def _render_benchmark(self, name: str, raw_dns, lr, meta):
        os.makedirs(self.sample_dir, exist_ok=True)
        self._render_png(lr, meta, f"{name[:4]}_noisy.png")
        for it, dn in enumerate(raw_dns):
            self._render_png(dn, meta, f"{name[:4]}_{it}.png")

    def _render_png(self, crops, meta, fname: str) -> np.ndarray:
        """[32,256,256] crop stack -> 256x8192 bayer strip -> sRGB PNG
        (the reference renders the concatenated strip, YOND_SIDD.py:637)."""
        from ..isp.render import process_sidd_image
        strip = np.concatenate(list(np.asarray(crops)), axis=-1)
        return process_sidd_image(
            strip, meta["bayer_2by2"], meta["wb"], meta["cst2"],
            save_file_rgb=os.path.join(self.sample_dir, fname))

    def run(self, wp: int = 1023, bl: int = 64, ratio: float = 1.0,
            limit: Optional[int] = None) -> Dict[str, Any]:
        pool = ThreadPoolExecutor(max_workers=4)
        futures = []
        n = len(self.dataset) if limit is None else min(limit,
                                                        len(self.dataset))
        for k in range(n):
            data = self.dataset[k]
            name = data["name"]
            p = {"wp": wp, "bl": bl, "ratio": ratio,
                 "scale": (wp - bl) / ratio, "gain": 1.0, "sigma": 0.0}
            if "cfa" in data:
                p["cfa"] = data["cfa"]
            res = self.engine.iter_denoise(data, p, img_id=k)
            self.metrics[name] = {"reg": res["regs"]}
            if "hr" in data:
                futures.append(pool.submit(
                    self._score_scene, name, res["raw_dns"], data["lr"],
                    data["hr"], data.get("meta")))
            elif self.save_plot and data.get("meta") is not None:
                # benchmark split (no GT): still render noisy/denoised PNGs
                # (reference benchmark, YOND_SIDD.py:572-630)
                futures.append(pool.submit(
                    self._render_benchmark, name, res["raw_dns"],
                    data["lr"], data["meta"]))
            if self.cache_npy:
                os.makedirs(f"npy/{self.method_name}", exist_ok=True)
                np.save(f"npy/{self.method_name}/{k:03d}.npy",
                        np.stack(res["raw_dns"]))
        for f in futures:
            f.result()
        pool.shutdown()

        for it in range(self.max_iter + 1):
            log(f"Iter{it}: PSNR={self.psnrs[it].avg:.2f}, "
                f"SSIM={self.ssims[it].avg:.4f}", logfile=self.logfile)
            if self.psnrs_rgb[it].count:
                log(f"Iter{it}: PSNR(sRGB)={self.psnrs_rgb[it].avg:.2f}, "
                    f"SSIM(sRGB)={self.ssims_rgb[it].avg:.4f}",
                    logfile=self.logfile)
        log(f"Iter_last: PSNR={self.psnrs[-1].avg:.2f}, "
            f"SSIM={self.ssims[-1].avg:.4f}", logfile=self.logfile)
        self.metrics.save()
        out = {"psnr": [m.avg for m in self.psnrs],
               "ssim": [m.avg for m in self.ssims]}
        if self.psnrs_rgb[0].count:
            out["psnr_rgb"] = [m.avg for m in self.psnrs_rgb]
            out["ssim_rgb"] = [m.avg for m in self.ssims_rgb]
        return out

    def write_submission(self, results: np.ndarray,
                         out_dir: str = "submits") -> str:
        """Write the SIDD benchmark SubmitRaw.mat (the reference keeps this
        commented out, YOND_SIDD.py:542-549/620-627; key must be
        'results'). results: [n_scenes, 32, 256, 256]."""
        import scipy.io as sio
        path = os.path.join(out_dir, self.method_name)
        os.makedirs(path, exist_ok=True)
        out = os.path.join(path, "SubmitRaw.mat")
        sio.savemat(out, {"results": np.asarray(results, np.float32)})
        return out
