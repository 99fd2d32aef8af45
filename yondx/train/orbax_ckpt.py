"""Orbax checkpoint backend (alternative to the msgpack files in
yondx.train.ckpt; same best/last/epoch naming contract via directory
names). Orbax adds atomic async saves and future-proof restore across
sharding changes — relevant for multi-host training."""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax


def save(path: str, params: Any, opt_state: Any = None, epoch: int = 0,
         best_psnr: float = 0.0) -> None:
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    state = {"params": jax.device_get(params),
             "opt_state": jax.device_get(opt_state)
             if opt_state is not None else None,
             "meta": {"epoch": epoch, "best_psnr": best_psnr}}
    if os.path.exists(path):
        import shutil
        shutil.rmtree(path)
    ckptr.save(path, state)
    ckptr.wait_until_finished()


def load(path: str, template: Optional[Dict[str, Any]] = None):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(os.path.abspath(path), target=template)
    return ckptr.restore(os.path.abspath(path))
