"""`yond` CLI — blind raw denoising eval/benchmark.

The YOND_SIDD.py / YOND_{DND,ELD,LRID,any}.py entry point family
(reference YOND_SIDD.py:723-744 + README.md:38-47; the non-SIDD scripts
are absent from the public snapshot but fully specified by their runfiles)
collapses into one driver keyed by pipeline.data_type:
- SIDD: 32x256x256 validation blocks, per-crop batched denoise;
- ELD / LRID / DND / ANY: full-frame overlap-tiled denoise.

Flags match the reference parser: -f runfile, -m mode, --debug, --nofig,
--nohost. Model weights: .ckpt (yondx) or .pth (ported from the torch
reference via yondx.models.torch_port).
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import jax

from ..config import load_runfile
from ..core.logging import log
from ..models import build_model, param_count
from ..models.registry import init_params, is_guided
from ..pipeline import VSTDenoiser, YONDEngine, PipelineConfig, TiledRunner
from ..train.ckpt import load_checkpoint, find_checkpoint
from ..vst.lut import BiasLUT


def build_parser():
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--runfile", "-f",
                   default="runfiles/YOND/SIDD_simple+full_pre_grumix.yml")
    p.add_argument("--mode", "-m", default="eval")
    p.add_argument("--debug", action="store_true", default=False)
    p.add_argument("--nofig", action="store_true", default=True)
    p.add_argument("--nohost", action="store_true", default=False)
    p.add_argument("--limit", type=int, default=None,
                   help="evaluate only the first N scenes")
    p.add_argument("--cpu", action="store_true", default=False,
                   help="force the CPU backend")
    return p


def load_model_params(arch, model_name, fast_ckpt, input_shape=(1, 128, 128, 4)):
    """Checkpoint search order best -> last -> bare, .ckpt then .pth
    (reference YOND_SIDD.py:178-183)."""
    model = build_model(arch)
    params = init_params(model, jax.random.PRNGKey(0), input_shape,
                         guided=is_guided(arch))
    path = find_checkpoint(fast_ckpt, model_name)
    if path:
        params = load_checkpoint(path, params)["params"]
        log(f"Loaded weights from {path}")
        return model, params
    for suffix in ("_best_model", "_last_model", ""):
        pth = os.path.join(fast_ckpt, f"{model_name}{suffix}.pth")
        if os.path.exists(pth):
            from ..models.torch_port import port_checkpoint
            params = port_checkpoint(arch["name"], pth)
            log(f"Ported torch weights from {pth}")
            return model, params
    log(f"Warning: no checkpoint for {model_name} under {fast_ckpt}; "
        "using random init")
    return model, params


class YOND:
    """The runfile-driven application object (YOND_SIDD class analog)."""

    def __init__(self, argv=None):
        self.parser = build_parser().parse_args(argv)
        if self.parser.cpu:
            jax.config.update("jax_platforms", "cpu")
        self.args = load_runfile(self.parser.runfile, mode=self.parser.mode)
        self.mode = self.args["mode"]
        self.arch = self.args["arch"]
        self.pipe = PipelineConfig.from_dict(self.args["pipeline"])
        self.model_name = self.args["model_name"]
        self.method_name = self.args["method_name"]
        self.fast_ckpt = self.args["fast_ckpt"]
        self.save_plot = not self.parser.nofig
        self.sample_dir = os.path.join(self.args.get("result_dir", "images"),
                                       self.method_name)
        os.makedirs(self.sample_dir, exist_ok=True)
        os.makedirs("./logs", exist_ok=True)
        os.makedirs("./metrics", exist_ok=True)
        self.logfile = f"./logs/log_{self.method_name}.log"

        self.model, self.params = load_model_params(
            self.arch, self.model_name, self.fast_ckpt)
        n = param_count(self.params)
        log(f"Method Name:\t{self.method_name}", logfile=self.logfile,
            notime=True)
        log(f"Model Name:\t{self.model_name}", logfile=self.logfile,
            notime=True)
        log(f"Architecture:\t{self.arch['name']}", logfile=self.logfile,
            notime=True)
        log(f"Parameters:\t{n / 1e6:.2f}M", logfile=self.logfile,
            notime=True)

        self.denoiser = VSTDenoiser(
            self.model, self.params, guided=is_guided(self.arch),
            bias_corr=self.pipe.bias_corr, vst_type=self.pipe.vst_type)
        self.engine = YONDEngine(self.denoiser, self.pipe,
                                 biaslut=BiasLUT(),
                                 logfile=self.logfile)

    def _dataset(self, mode):
        dst = self.args.get(f"dst_{mode}", self.args.get("dst", {}))
        name = dst.get("dataset", "")
        root = dst.get("root_dir", "")
        if name == "SIDD_Dataset":
            from ..data.datasets import SIDDValDataset
            return SIDDValDataset(root, mode=dst.get("mode", mode))
        raise NotImplementedError(
            f"dataset {name!r}: provide data under {root!r} (SIDD) or use "
            "the synthetic self-test via bench.py")

    def eval(self, limit=None):
        from ..eval.sidd import SIDDEvalHarness
        dst = self._dataset("eval")
        harness = SIDDEvalHarness(
            self.engine, dst, self.method_name,
            max_iter=self.pipe.max_iter, save_plot=self.save_plot,
            sample_dir=self.sample_dir, logfile=self.logfile)
        return harness.run(limit=limit or self.parser.limit)

    def benchmark(self, limit=None):
        from ..eval.sidd import SIDDEvalHarness
        dst = self._dataset("test")
        harness = SIDDEvalHarness(
            self.engine, dst, self.method_name,
            max_iter=self.pipe.max_iter, save_plot=self.save_plot,
            sample_dir=self.sample_dir, logfile=self.logfile)
        return harness.run(limit=limit or self.parser.limit)


def main(argv=None):
    app = YOND(argv)
    if "eval" in app.mode:
        metrics = app.eval()
        log(f"Metrics saved in ./metrics/{app.method_name}_metrics.pkl")
    if "test" in app.mode:
        app.benchmark()


if __name__ == "__main__":
    main()
