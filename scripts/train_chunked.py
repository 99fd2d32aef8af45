"""Chunked training driver: runs training in bounded-lifetime child
processes (resume-from-checkpoint between chunks).

Needed because the sandbox's tunneled device client leaks ~15 MB of host
memory per executed step (see memory: tpu-tunnel-single-client /
yondx-perf-model) — a single long process eventually OOMs. Each chunk is a
fresh interpreter; the auto-resume path (hyper.last_epoch = -1) picks up
where the checkpoint left off.

Usage: python scripts/train_chunked.py <runfile> <stop_epoch> [chunk]
"""
import os
import subprocess
import sys

RUNFILE = sys.argv[1] if len(sys.argv) > 1 else \
    "runfiles/Gaussian/GRU_5to50_norm_mix.yml"
STOP = int(sys.argv[2]) if len(sys.argv) > 2 else 400
CHUNK = int(sys.argv[3]) if len(sys.argv) > 3 else 40

CHILD = r"""
import sys
from yondx.config import load_runfile
from yondx.train import AWGNTrainer
runfile, stop, chunk = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
args = load_runfile(runfile, mode="train")
args["hyper"]["batch_size"] = 64
args["hyper"]["last_epoch"] = -1      # auto-resume from checkpoint
args["hyper"]["stop_epoch"] = stop    # schedule period unchanged
args["hyper"]["plot_freq"] = 20
args["hyper"]["save_freq"] = 10
for k in ("dst_train", "dst_eval", "dst_test"):
    args[k]["synthetic_len"] = 2048 if k == "dst_train" else 64
tr = AWGNTrainer(args)
target = min(tr.epoch + chunk, stop)
if tr.epoch >= stop:
    print("DONE")
    sys.exit(0)
tr.train(stop_epoch=target)
print(f"chunk finished at epoch {tr.epoch}")
if tr.epoch >= stop:
    tr.eval(epoch=-1)
    print("DONE")
"""


def main():
    for i in range(200):
        proc = subprocess.run(
            [sys.executable, "-c", CHILD, RUNFILE, str(STOP), str(CHUNK)],
            capture_output=True, text=True)
        tail = (proc.stdout + proc.stderr).strip().splitlines()[-6:]
        print(f"[chunk {i}] rc={proc.returncode}", *tail, sep="\n  ",
              flush=True)
        if "DONE" in proc.stdout:
            break
        if proc.returncode != 0 and "DONE" not in proc.stdout:
            # crashed chunk: resume anyway (checkpointed every 10 epochs)
            continue


if __name__ == "__main__":
    main()
