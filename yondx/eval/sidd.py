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

    def _score_scene(self, name: str, raw_dns, hr):
        """Metric work for one scene (runs on the thread pool)."""
        rec = {"psnr": [], "ssim": []}
        last = (0.0, 0.0)
        for it, dn in enumerate(raw_dns):
            p = float(psnr(dn, hr, data_range=1.0))
            s = float(np.mean([float(matlab_ssim(d * 255, h * 255))
                               for d, h in zip(dn, hr)]))
            self.psnrs[it].update(p)
            self.ssims[it].update(s)
            rec["psnr"].append(p)
            rec["ssim"].append(s)
            last = (p, s)
        self.psnrs[-1].update(last[0])
        self.ssims[-1].update(last[1])
        self.metrics[name] = {**self.metrics.data.get(name, {}), **rec}
        log(f"{name}: PSNR={last[0]:.2f}, SSIM={last[1]:.4f}",
            logfile=self.logfile)

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
                    self._score_scene, name, res["raw_dns"], data["hr"]))
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
        log(f"Iter_last: PSNR={self.psnrs[-1].avg:.2f}, "
            f"SSIM={self.ssims[-1].avg:.4f}", logfile=self.logfile)
        self.metrics.save()
        return {"psnr": [m.avg for m in self.psnrs],
                "ssim": [m.avg for m in self.ssims]}

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
