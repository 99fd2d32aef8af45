"""Distillation transfer path of the trainer (args 'distill' block):
teacher-targeted loss + frozen-stage updates, used to fit the
GuidedResUnetS2D packing adapter against the flagship teacher."""
import os

import numpy as np
import jax

from yondx.models import build_model
from yondx.models.registry import init_params
from yondx.train import AWGNTrainer
from yondx.train.ckpt import save_checkpoint


def _args(tmp):
    return {
        "model_name": "t_distill", "fast_ckpt": tmp, "checkpoint": tmp,
        "result_dir": tmp,
        "arch": {"name": "GuidedResUnetS2D", "guided": True, "in_nc": 4,
                 "out_nc": 4, "nf": 8, "nframes": 1, "res": True,
                 "norm": True, "out_k": 3},
        "distill": {
            "teacher_arch": {"name": "GuidedResUnet", "guided": True,
                             "in_nc": 4, "out_nc": 4, "nf": 4,
                             "nframes": 1, "res": True, "norm": True},
            "teacher_ckpt": "t_teacher", "weight": 1.0, "gt_weight": 0.0,
            "freeze": "ported"},
        "hyper": {"lr_scheduler": "WarmupCosine", "learning_rate": 1e-3,
                  "batch_size": 2, "last_epoch": 0, "step_size": 1,
                  "stop_epoch": 1, "T": 1, "save_freq": 100,
                  "plot_freq": 100},
        "dst_train": {"patch_size": 64, "sigma_min": 5, "sigma_max": 50,
                      "clip": True, "command": "", "mode": "train",
                      "synthetic_len": 2},
        "dst_eval": {"patch_size": 64, "sigma_list": [10, 25, 50],
                     "clip": True, "command": "", "mode": "eval",
                     "synthetic_len": 2},
    }


def test_distill_freezes_ported_and_trains_adapter(tmp_path):
    tmp = str(tmp_path)
    args = _args(tmp)
    tm = build_model(args["distill"]["teacher_arch"])
    tp = init_params(tm, jax.random.PRNGKey(3), (1, 32, 32, 4))
    save_checkpoint(os.path.join(tmp, "t_teacher_last_model.ckpt"),
                    tp, None, 0, 0.0)
    tr = AWGNTrainer(args)
    p0 = jax.device_get(tr.params)
    tr.train(stop_epoch=1, steps_per_epoch=2)
    p1 = jax.device_get(tr.params)

    def leaf(p, *path):
        v = p["params"]
        for k in path:
            v = v[k]
        return np.asarray(v)

    # interior (ported twin) stages must not move in the adapter phase
    np.testing.assert_array_equal(leaf(p0, "conv1", "conv1", "kernel"),
                                  leaf(p1, "conv1", "conv1", "kernel"))
    np.testing.assert_array_equal(leaf(p0, "pool2", "Conv_0", "kernel")
                                  if "Conv_0" in p0["params"]["pool2"]
                                  else leaf(p0, "conv4", "conv1", "kernel"),
                                  leaf(p1, "pool2", "Conv_0", "kernel")
                                  if "Conv_0" in p1["params"]["pool2"]
                                  else leaf(p1, "conv4", "conv1", "kernel"))
    # the packing-boundary adapter must train
    assert not np.array_equal(leaf(p0, "conv_in", "kernel"),
                              leaf(p1, "conv_in", "kernel"))
    assert not np.array_equal(leaf(p0, "conv_out", "kernel"),
                              leaf(p1, "conv_out", "kernel"))
    # out_k: 3 gives the tail a 3x3 unpacking kernel
    assert leaf(p1, "conv_out", "kernel").shape[:2] == (3, 3)
