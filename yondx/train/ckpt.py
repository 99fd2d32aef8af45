"""Checkpointing with the reference's best/last/epoch naming contract.

Reference: epoch archives saved_model/{name}_e{epoch:04d}.pth + rolling
{name}_last_model.pth every save_freq (trainer_AWGN.py:158-164),
{name}_best_model.pth on eval-PSNR record (:292-296), resume via
hyper.last_epoch (:21-30). Improvement over the reference: the optimizer
state and epoch counter are checkpointed too (the reference only saves
weights — SURVEY.md §5).

Format: orbax-compatible? — simpler: flax msgpack of
{params, opt_state, epoch, best_psnr}; .ckpt extension.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

from flax import serialization


def save_checkpoint(path: str, params: Any, opt_state: Any = None,
                    epoch: int = 0, best_psnr: float = 0.0) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    blob = serialization.msgpack_serialize({
        "params": serialization.to_state_dict(params),
        "opt_state": serialization.to_state_dict(opt_state)
        if opt_state is not None else {},
        "epoch": epoch,
        "best_psnr": best_psnr,
    })
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: str, params_template: Any = None,
                    opt_state_template: Any = None) -> Dict[str, Any]:
    with open(path, "rb") as f:
        state = serialization.msgpack_restore(f.read())
    if params_template is not None:
        state["params"] = serialization.from_state_dict(
            params_template, state["params"])
    if opt_state_template is not None and state.get("opt_state"):
        state["opt_state"] = serialization.from_state_dict(
            opt_state_template, state["opt_state"])
    return state


def find_checkpoint(fast_ckpt: str, model_name: str,
                    prefer: str = "best") -> Optional[str]:
    """Search order best -> last -> bare for inference (reference
    YOND_SIDD.py:178-183); prefer='last' for training resume (resuming
    from 'best' would rewind a run whose eval metric has plateaued)."""
    order = ("_best_model", "_last_model", "") if prefer == "best" \
        else ("_last_model", "_best_model", "")
    for suffix in order:
        p = os.path.join(fast_ckpt, f"{model_name}{suffix}.ckpt")
        if os.path.exists(p):
            return p
    return None
