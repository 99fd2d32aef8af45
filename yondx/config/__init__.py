"""YAML runfile loading — same schema as the reference.

Runfiles carry the blocks dst/dst_train/dst_eval/dst_test (YAML anchors
supported by pyyaml natively), arch, hyper, pipeline, est_* (reference
trainer_base.py:48-83, YOND_SIDD.py:143-199). `load_runfile` applies the
same normalizations: default clip, bias_corr 'none' -> None, mode
override, root_dir prefixing.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import yaml


def load_runfile(path: str, mode: Optional[str] = None,
                 host_prefix: Optional[str] = None) -> Dict[str, Any]:
    with open(path, "r", encoding="utf-8") as f:
        args = yaml.load(f.read(), Loader=yaml.FullLoader)
    if mode is not None:
        args["mode"] = mode
    if "dst" in args and "clip" not in args["dst"]:
        args["dst"]["clip"] = False
    if "pipeline" in args and args["pipeline"].get("bias_corr") == "none":
        args["pipeline"]["bias_corr"] = None
    if host_prefix:
        for key in args:
            if "dst" in key and isinstance(args[key], dict) \
                    and "root_dir" in args[key]:
                args[key]["root_dir"] = os.path.join(host_prefix,
                                                     args[key]["root_dir"])
    return args
