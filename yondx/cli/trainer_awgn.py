"""`trainer-awgn` CLI — AWGN denoiser training (trainer_AWGN.py analog).

Flags match the reference AWGN_Parser (trainer_AWGN.py:370-382). The
__main__ flow mirrors the reference (:384-406): train -> final eval sweep
over dst_test.sigma_list with the best checkpoint.
"""
from __future__ import annotations

import argparse


import jax

from ..config import load_runfile
from ..core.logging import log
from ..train import AWGNTrainer
from ..train.ckpt import find_checkpoint, load_checkpoint


def build_parser():
    p = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--runfile", "-f",
                   default="runfiles/Gaussian/GRU_5to50_norm_mix.yml")
    p.add_argument("--mode", "-m", default="train")
    p.add_argument("--debug", action="store_true", default=False,
                   help="tiny synthetic dataset, few steps")
    p.add_argument("--nofig", action="store_true", default=False)
    p.add_argument("--nohost", action="store_true", default=False)
    p.add_argument("--cpu", action="store_true", default=False)
    p.add_argument("--epochs", type=int, default=None,
                   help="override stop_epoch")
    p.add_argument("--steps-per-epoch", type=int, default=None)
    return p


def main(argv=None):
    opts = build_parser().parse_args(argv)
    if opts.cpu:
        jax.config.update("jax_platforms", "cpu")
    args = load_runfile(opts.runfile, mode=opts.mode)
    if opts.debug:
        for k in ("dst_train", "dst_eval", "dst_test"):
            if k in args:
                args[k]["synthetic_len"] = 16
        args["hyper"]["stop_epoch"] = min(args["hyper"]["stop_epoch"],
                                          args["hyper"].get("last_epoch", 0)
                                          + 2)
    if opts.epochs:
        args["hyper"]["stop_epoch"] = opts.epochs

    trainer = AWGNTrainer(args)
    mode = args["mode"]
    if mode == "train":
        trainer.train(steps_per_epoch=opts.steps_per_epoch)
        mode = "evaltest"

    if "eval" in mode:
        # reload best model for the final sweep (reference :394-398)
        path = find_checkpoint(trainer.fast_ckpt, trainer.model_name)
        if path:
            from ..parallel import replicate
            state = load_checkpoint(path, jax.device_get(trainer.params))
            # keep the reloaded params mesh-placed (round-1 weak #7: bare
            # host arrays would silently re-place per eval call)
            trainer.params = replicate(trainer.mesh, state["params"])
        sigma_list = args.get("dst_test", args.get("dst_eval", {})).get(
            "sigma_list", [10, 25, 50])
        for sigma in sigma_list:
            log(f"AWGN Datasets: sigma={sigma}",
                logfile=f"./logs/log_{trainer.model_name}.log")
            trainer.eval(epoch=-1, sigma=sigma)
    log(f"Metrics have been saved in "
        f"./metrics/{trainer.model_name}_metrics.pkl")


if __name__ == "__main__":
    main()
