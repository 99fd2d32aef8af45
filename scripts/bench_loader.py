"""On-disk npy corpus loader benchmark (VERDICT r2 Missing #5).

Generates a real corpus on disk (procedural sRGB crops, uint8 npy — the
YOND/train_mix format the reference trains from,
yond_datasets.py:283-284), then measures what fraction of a simulated
training step the BatchLoader's next() blocks for at batch 64, against the
round-2 measured v5e step time (~0.29 s at batch 64: train_chunked logs).

Gate: loader wait < 5% of step time (reference anchor: num_workers=8
DataLoader keeping the GPU fed, trainer_AWGN.py:45-50).

Run: python scripts/bench_loader.py [--root DIR] [--n 1024] [--steps 48]
"""
import argparse
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from yondx.core.logging import log
from yondx.data.datasets import NpyFolderDataset, BatchLoader, \
    SyntheticSRGBDataset


def build_corpus(root: str, n: int, size: int = 256):
    d = os.path.join(root, "train")
    os.makedirs(d, exist_ok=True)
    existing = len([f for f in os.listdir(d) if f.endswith(".npy")])
    if existing >= n:
        return
    gen = SyntheticSRGBDataset(length=n, size=size, cache=False,
                               disk_cache=None)
    for i in range(n):
        np.save(os.path.join(d, f"crop_{i:05d}.npy"), gen[i])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/yondx_loader_bench")
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=48)
    ap.add_argument("--step-time", type=float, default=0.29,
                    help="simulated device step seconds (v5e batch-64 "
                         "measured, round-2 train logs)")
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--fresh", action="store_true",
                    help="rebuild the corpus from scratch")
    args = ap.parse_args()

    if args.fresh and os.path.isdir(args.root):
        shutil.rmtree(args.root)
    t0 = time.perf_counter()
    build_corpus(args.root, args.n)
    log(f"corpus ready ({args.n} x 256x256x3 uint8 npy) "
        f"in {time.perf_counter() - t0:.1f}s")
    # drop nothing from the page cache — the reference's steady-state epochs
    # re-read warm files too; cold-cache is the first epoch only.

    ds = NpyFolderDataset(args.root, "train")
    loader = BatchLoader(ds, args.batch, shuffle=True, seed=0,
                         prefetch=8, workers=args.workers)

    # cold pass: first epoch reads from disk (the reference's epoch-1
    # behavior); the gate applies to the steady state, where the page
    # cache is warm — real training re-reads the same corpus every epoch.
    t0 = time.perf_counter()
    n_cold = sum(1 for _ in loader.epoch(0))
    log(f"cold epoch: {n_cold} batches in {time.perf_counter() - t0:.2f}s")

    def batches():
        e = 1
        while True:
            yield from loader.epoch(e)
            e += 1

    it = batches()
    next(it)  # warm the pool
    waits, steps = [], 0
    for _ in range(args.steps):
        t = time.perf_counter()
        try:
            batch = next(it)
        except StopIteration:
            break
        waits.append(time.perf_counter() - t)
        assert batch.shape[0] == args.batch
        time.sleep(args.step_time)      # the simulated device step
        steps += 1
    wait = float(np.sum(waits))
    total = wait + steps * args.step_time
    pct = 100.0 * wait / total
    log(f"batch={args.batch} workers={args.workers} steps={steps}: "
        f"loader wait {wait * 1000 / max(steps, 1):.1f} ms/step = "
        f"{pct:.2f}% of step time (gate <5%): "
        f"{'PASS' if pct < 5.0 else 'FAIL'}")
    return 0 if pct < 5.0 else 1


if __name__ == "__main__":
    sys.exit(main())
