"""Train the flagship SNR-Net (GuidedResUnet nf=32) on synthetic pseudo-raw.

Uses the headline runfile recipe (GRU_5to50_norm_mix) with the procedural
sRGB dataset standing in for DIV2K+SID (no external data in this image).
"""
import sys
import jax
from yondx.config import load_runfile
from yondx.train import AWGNTrainer

args = load_runfile("runfiles/Gaussian/GRU_5to50_norm_mix.yml", mode="train")
args["hyper"]["batch_size"] = 64
args["hyper"]["stop_epoch"] = int(sys.argv[1]) if len(sys.argv) > 1 else 400
args["hyper"]["T"] = 2
args["hyper"]["plot_freq"] = 20
args["hyper"]["save_freq"] = 10
for k in ("dst_train", "dst_eval", "dst_test"):
    args[k]["synthetic_len"] = 2048 if k == "dst_train" else 64
tr = AWGNTrainer(args)
tr.train()
tr.eval(epoch=-1)
