"""Train UNetSeeInDark (the no-guidance variant, Unet_5to50_norm recipe)."""
import sys
from yondx.config import load_runfile
from yondx.train import AWGNTrainer

args = load_runfile("runfiles/Gaussian/Unet_5to50_norm.yml", mode="train")
args["hyper"]["batch_size"] = 64
args["hyper"]["stop_epoch"] = int(sys.argv[1]) if len(sys.argv) > 1 else 200
args["hyper"]["T"] = 1
args["hyper"]["plot_freq"] = 20
args["hyper"]["save_freq"] = 10
for k in ("dst_train", "dst_eval", "dst_test"):
    args[k]["synthetic_len"] = 2048 if k == "dst_train" else 64
tr = AWGNTrainer(args)
tr.train()
tr.eval(epoch=-1)
