"""yondx — a TPU-native (JAX/XLA/Pallas) blind raw-image denoising framework.

A ground-up rebuild of the capabilities of YOND ("You Only Need a Denoiser",
reference: fenghansen/YOND_public) designed for TPU hardware:

- Bayer/ISP ops, generalized Anscombe VST and its exact unbiased inverse,
  Poisson-Gaussian bias correction (closed-form + numeric + 2-D LUT) as pure
  jnp kernels fused under jit (`yondx.isp`, `yondx.vst`).
- Patch-statistics noise-level estimation (self / collaborative NLF) as a
  single fused device computation (`yondx.nle`).
- A Flax model zoo (SNR-Net / GuidedResUnet, UNetSeeInDark, EstUNet, ...)
  in NHWC layout (`yondx.models`).
- The YOND iterative denoising engine: NLE -> VST -> AWGN denoiser ->
  exact-unbiased inverse VST, iterated with collaborative re-estimation
  (`yondx.pipeline`).
- Device-resident sRGB->pseudo-raw "unprocess" data augmentation and AWGN
  training under jax.random (`yondx.data`, `yondx.train`).
- Data/spatial parallelism over `jax.sharding.Mesh` (`yondx.parallel`).

The public CLI entry points (`yondx.cli`) keep the reference's YAML runfile
schema (dst*/arch/hyper/pipeline blocks).
"""

__version__ = "0.1.0"
