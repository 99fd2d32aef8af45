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


STALL_SECS = int(os.environ.get("YONDX_STALL_SECS", 600))
# axon start-wedge: a client sometimes hangs on its first dispatch
# (memory: axon-tunnel-pathologies); kill + retry recovers. Raise via
# YONDX_STALL_SECS when the chunk compiles a BRAND-NEW training graph —
# a cold compile over the tunnel can exceed 600 s and must not be
# mistaken for a wedge (the GuidedResUnetS2D fine-tune hit this).


def _run_chunk_with_watchdog():
    import tempfile
    import time
    out = tempfile.NamedTemporaryFile(mode="w+", suffix=".log", delete=False)
    proc = subprocess.Popen(
        [sys.executable, "-u", "-c", CHILD, RUNFILE, str(STOP), str(CHUNK)],
        stdout=out, stderr=subprocess.STDOUT, text=True)
    last_size, last_change = 0, time.time()
    while proc.poll() is None:
        time.sleep(15)
        size = os.path.getsize(out.name)
        if size != last_size:
            last_size, last_change = size, time.time()
        elif time.time() - last_change > STALL_SECS:
            print(f"  [watchdog] no output for {STALL_SECS}s — killing "
                  f"wedged chunk pid {proc.pid}", flush=True)
            proc.kill()
            proc.wait()
            break
    out.seek(0)
    text = out.read()
    out.close()
    os.unlink(out.name)
    return proc.returncode, text


def main():
    for i in range(200):
        rc, text = _run_chunk_with_watchdog()
        tail = text.strip().splitlines()[-6:]
        print(f"[chunk {i}] rc={rc}", *tail, sep="\n  ", flush=True)
        if "DONE" in text:
            break
        # crashed/wedged chunk: resume anyway (checkpointed every 10
        # epochs); brief settle so the next client doesn't start-wedge
        import time
        time.sleep(30)


if __name__ == "__main__":
    main()
