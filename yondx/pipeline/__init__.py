"""The YOND engine: blind raw denoising via NLE -> VST -> AWGN net ->
exact-unbiased inverse VST, iterated with collaborative re-estimation.

TPU-native rebuild of YOND_SIDD.py's pipeline layer (`VST_Denoiser` :250,
`Simple_Denoiser` :238, `IterDenoise` :301). Key structural changes:
- the whole VST chain + network + inverse runs as ONE jit; crop batches go
  through together instead of a Python loop (reference loops 32x per scene,
  YOND_SIDD.py:398-407, with a CPU<->GPU round trip per crop);
- the bias LUT is consumed as a per-call 1-D electron-domain curve gathered
  on device (see yondx.vst.lut);
- host code only orchestrates iteration guards and noise-parameter scalars.
"""
from .denoiser import VSTDenoiser, SimpleDenoiser, BM3DVSTDenoiser
from .engine import YONDEngine, PipelineConfig
from .runner import TiledRunner

__all__ = ["VSTDenoiser", "SimpleDenoiser", "BM3DVSTDenoiser",
           "YONDEngine", "PipelineConfig",
           "TiledRunner"]
