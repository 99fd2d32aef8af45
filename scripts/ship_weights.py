"""Strip optimizer state from the best checkpoints and stage them for
shipping (params-only ~45 MB vs 134 MB with Adam moments)."""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

from yondx.train.ckpt import load_checkpoint, save_checkpoint


def main():
    argv = sys.argv[1:]
    if argv:  # consecutive src dst pairs; a lone src ships in place
        if len(argv) % 2:
            argv.append(argv[-1])
        pairs = list(zip(argv[0::2], argv[1::2]))
    else:
        pairs = [
        ("checkpoints/Gaussian/Gaussian_GRU_mix_5to50_norm_best_model.ckpt",
         "checkpoints/Gaussian/Gaussian_GRU_mix_5to50_norm_best_model.ckpt"),
        ("checkpoints/Gaussian/Gaussian_Unet_mix_5to50_norm_best_model.ckpt",
         "checkpoints/Gaussian/Gaussian_Unet_mix_5to50_norm_best_model.ckpt"),
    ]
    for src, dst in pairs:
        state = load_checkpoint(src)
        save_checkpoint(dst, state["params"], None,
                        epoch=state.get("epoch", 0),
                        best_psnr=state.get("best_psnr", 0.0))
        print(f"{src} -> {dst} (params only, epoch {state.get('epoch')})")


if __name__ == "__main__":
    main()
