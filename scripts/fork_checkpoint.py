"""Fork a checkpoint under a new model name for a fine-tune recipe.

Copies `src` model's best (or last) checkpoint to `dst` model's
*_last_model.ckpt with epoch and best_psnr reset and the optimizer state
dropped, so a runfile with hyper.last_epoch: -1 auto-resumes the WEIGHTS
while the LR schedule and Adam moments start fresh. This is the warm-
start mechanism the round-3 chroma fine-tune used by hand (the advisor
flagged the by-hand variant as clobber-prone — this makes it a one-liner
that never touches the source artifact).

Usage: python scripts/fork_checkpoint.py SRC_MODEL DST_MODEL [--last]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--ckpt-dir", default="checkpoints/Gaussian")
    ap.add_argument("--last", action="store_true",
                    help="fork the last (not best) checkpoint")
    args = ap.parse_args()
    from yondx.train.ckpt import (find_checkpoint, load_checkpoint,
                                  save_checkpoint)
    src = find_checkpoint(args.ckpt_dir, args.src,
                          prefer="last" if args.last else "best")
    assert src, f"no checkpoint for {args.src} under {args.ckpt_dir}"
    state = load_checkpoint(src)
    dst = os.path.join(args.ckpt_dir, f"{args.dst}_last_model.ckpt")
    assert not os.path.exists(dst), f"{dst} exists; refusing to clobber"
    save_checkpoint(dst, state["params"], None, epoch=0, best_psnr=0.0)
    print(f"forked {src} -> {dst} (epoch 0, best 0, no opt state)")


if __name__ == "__main__":
    main()
