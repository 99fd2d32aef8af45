"""Train a noise-estimation net (PGEstTrainer) from a runfile.

Usage: python scripts/train_est.py [runfile] [stop_epoch] [--cpu]
Default runfile: runfiles/Gaussian/EstPGE.yml (the PGE scalar net that
serves the engine's est_type 'pge' path).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

argv = [a for a in sys.argv[1:] if a != "--cpu"]
if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/yondx_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from yondx.config import load_runfile
from yondx.train.pg_trainer import PGEstTrainer

runfile = argv[0] if argv else "runfiles/Gaussian/EstPGE.yml"
stop = int(argv[1]) if len(argv) > 1 else None

args = load_runfile(runfile, mode="train")
tr = PGEstTrainer(args)
tr.train(epochs=stop)
