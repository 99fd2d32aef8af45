"""UNet conv roofline audit on the real chip (VERDICT r2 #4).

Measures every conv shape in the GuidedResUnet forward at bench-frame
resolution in ISOLATION (jitted, steady-state), sums them, and compares
against the measured whole-network forward. If the sum ~= the whole (no
fusion slack) and each layer runs at the lane-limited XLA conv throughput
for its channel count (32-ch convs ~6-7 TF/s on a v5e, >=128-ch 18-27,
matmul peak ~92 — round-2 measurements), then the current UNet time IS
the XLA roofline for this architecture and further speedup requires an
architecture change (channels-wide retrain) or a custom Mosaic kernel
(blocked in this environment — docs/STATUS.md).

Run: python scripts/unet_roofline.py [--H 1792] [--W 1792] [--reps 10]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/yondx_xla_cache")
import jax.numpy as jnp

from yondx.core.logging import log


def time_fn(fn, *args, reps=10):
    """Steady-state seconds/call: one scalar HOST FETCH after `reps`
    dispatches. block_until_ready over the axon tunnel does not reliably
    block (measured: 0.1 ms for a 90 ms graph) — only np.asarray of the
    scalar result forces completion. fn must return a scalar."""
    np.asarray(fn(*args))
    t0 = time.perf_counter()
    accs = [fn(*args) for _ in range(reps)]
    np.asarray(sum(accs))
    return (time.perf_counter() - t0) / reps


def conv_flops(H, W, cin, cout, k=3):
    return 2.0 * H * W * cin * cout * k * k


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--H", type=int, default=1792)
    ap.add_argument("--W", type=int, default=1792)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    args = ap.parse_args()
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    H, W = args.H, args.W

    # GuidedResUnet conv inventory at nf=32 (models/unets.py
    # _GuidedUNetBase): conv_in 4->32; per scale s=0..3 one down block
    # (2x conv3x3 f->f) and one up block (1x1 2f->f + 2x conv3x3 f->f)
    # at spatial H/2^s, f=32*2^s; stride-2 pools f->2f; bottleneck block
    # (2x conv3x3 512->512 at H/16); 2x2 deconvs 2f->f; 1x1 out.
    nf = 32
    widths = [nf, nf * 2, nf * 4, nf * 8]

    def mk_conv(cin, cout, k, stride=1):
        kern = jax.random.normal(jax.random.PRNGKey(0),
                                 (k, k, cin, cout), dt) * 0.02

        @jax.jit
        def f(x):
            y = jax.lax.conv_general_dilated(
                x, kern, (stride, stride), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.sum(y.astype(jnp.float32))
        return f

    total_est = 0.0

    def bench_shape(tag, h, w, cin, cout, k, n, stride=1):
        nonlocal total_est
        x = jax.random.normal(jax.random.PRNGKey(1), (1, h, w, cin), dt)
        f = mk_conv(cin, cout, k, stride)
        d = time_fn(f, x, reps=args.reps)
        fl = conv_flops(h // stride, w // stride, cin, cout, k)
        total_est += n * d
        log(f"{tag:26s} {d * 1e3:7.2f} ms  {fl / d / 1e12:5.1f} TF/s  x{n}")

    bench_shape("conv_in 4->32", H, W, 4, 32, 3, 1)
    for s, c in enumerate(widths):
        h, w = H >> s, W >> s
        bench_shape(f"scale{s} 3x3 {c}->{c}", h, w, c, c, 3, 4)
        bench_shape(f"scale{s} 1x1 {2*c}->{c}", h, w, 2 * c, c, 1, 1)
        bench_shape(f"pool{s} 3x3s2 {c}->{2*c}", h, w, c, 2 * c, 3, 1,
                    stride=2)
    bench_shape("bottleneck 3x3 512->512", H >> 4, W >> 4, 512, 512, 3, 2)
    log(f"sum of isolated convs (inventory, no deconvs/guides): "
        f"{total_est * 1e3:.1f} ms")

    # whole-network forward at the same size
    from yondx.models import build_model
    from yondx.models.registry import init_params
    arch = {"name": "GuidedResUnet", "guided": True, "in_nc": 4,
            "out_nc": 4, "nf": 32, "nframes": 1, "res": True, "norm": True}
    model = build_model(arch, dtype=dt)
    params = init_params(model, jax.random.PRNGKey(0), (1, 128, 128, 4))
    x4 = jax.random.normal(jax.random.PRNGKey(2), (1, H, W, 4), jnp.float32)
    t = jnp.ones((1,), jnp.float32) * 0.02

    @jax.jit
    def fwd(x, t):
        return jnp.sum(model.apply(params, x, t).astype(jnp.float32))

    dt_net = time_fn(fwd, x4, t, reps=args.reps)
    mp = H * W * 4 / 1e6   # rggb planes = 4x spatial, bayer MP = H*W*4
    log(f"whole GuidedResUnet fwd @[1,{H},{W},4] ({args.dtype}): "
        f"{dt_net * 1e3:.1f} ms = {mp / dt_net:.1f} MP(bayer)/s")
    log(f"fusion slack vs isolated sum: "
        f"{(total_est - dt_net) / dt_net * 100:+.1f}%")

    # lane-limit reference points: same conv at wider output channels
    for c_out in (32, 64, 128, 256):
        x = jax.random.normal(jax.random.PRNGKey(1), (1, H, W, 32), dt)
        f = mk_conv(32, c_out, 3)
        d = time_fn(f, x, reps=args.reps)
        log(f"lane ref: conv3x3 32->{c_out} @{H}x{W}: {d * 1e3:7.2f} ms "
            f"{conv_flops(H, W, 32, c_out) / d / 1e12:5.1f} TF/s")


if __name__ == "__main__":
    main()
