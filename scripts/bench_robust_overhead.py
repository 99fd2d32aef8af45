"""Microbench: where the robust-NLE overhead goes at bench-frame size.

Per-dispatch tunnel latency is ~30 ms (memory: axon-tunnel-pathologies),
so single-dispatch timings are floor-dominated. Each op is instead run
`reps` times INSIDE one jit via lax.scan, serialized by folding a scalar
of each output back into the carry (+s*1e-30: numerically a no-op, but a
real data dependency so XLA cannot parallelize or CSE the iterations);
per-op cost = (chain time - one dispatch floor) / reps.
Run ONLY when no other TPU client is live (single-client tunnel).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/yondx_xla_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from yondx.nle.robust import (mad_self_estimate, mad_collab_estimate,
                              mad_pg_fit, _band_subsample_rows, _haar_hh,
                              _maybe_subsample, _MAX_CELLS,
                              NB_M, NB_D, _D_RANGE)

REPS = 20


def timed(fn, *args, reps=REPS):
    """ms per op, amortized over a serialized in-graph scan chain."""
    @jax.jit
    def run(*a):
        def body(carry, _):
            s = jnp.sum(jnp.stack([jnp.sum(o).astype(jnp.float32)
                                   for o in jax.tree.leaves(fn(*carry))]))
            return tuple(c + s * 1e-30 for c in carry), s
        _, ss = lax.scan(body, a, None, length=reps)
        return jnp.sum(ss)

    np.asarray(run(*args))  # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3 / reps


def _bins(d, m, dmax):
    r = jnp.clip(d / dmax, 1e-4, 1.0)
    dbin = jnp.clip(((jnp.log(r) + _D_RANGE) / _D_RANGE * NB_D
                     ).astype(jnp.int32), 0, NB_D - 1)
    bucket = jnp.clip((jnp.clip(m, 0, 1) * (NB_M - 1)).astype(jnp.int32),
                      0, NB_M - 1)
    return bucket * NB_D + dbin, bucket


def hist_two(d, m):
    d = jnp.abs(d.reshape(-1)); m = m.reshape(-1)
    idx, bucket = _bins(d, m, jnp.max(d) + 1e-30)
    counts = jax.ops.segment_sum(jnp.ones_like(d), idx,
                                 num_segments=NB_M * NB_D)
    sum_m = jax.ops.segment_sum(m, bucket, num_segments=NB_M)
    return counts, sum_m


def hist_one(d, m):
    d = jnp.abs(d.reshape(-1)); m = m.reshape(-1)
    idx, _ = _bins(d, m, jnp.max(d) + 1e-30)
    acc = jax.ops.segment_sum(jnp.stack([jnp.ones_like(d), m], -1), idx,
                              num_segments=NB_M * NB_D)
    acc = acc.reshape(NB_M, NB_D, 2)
    return acc[..., 0], jnp.sum(acc[..., 1], axis=1)


def main():
    rng = np.random.default_rng(0)
    H, W = 1536, 2048   # 12.6 MP bayer -> rggb planes
    clean = np.kron(rng.random((12, 16)) * 0.7 + 0.05,
                    np.ones((H // 12, W // 16)))
    noisy = np.clip(clean + rng.normal(0, 0.03, clean.shape), 0, 1)
    x = jnp.asarray(noisy[..., None].repeat(4, -1).astype(np.float32))
    dn = jnp.asarray((clean[..., None].repeat(4, -1)).astype(np.float32))

    print(f"mad_self_estimate      : {timed(mad_self_estimate, x):7.2f} ms")
    print(f"mad_collab_estimate    : {timed(mad_collab_estimate, x, dn):7.2f} ms")
    print(f"band_subsample (1x)    : "
          f"{timed(lambda a: _band_subsample_rows(a, 4 * _MAX_CELLS), x):7.2f} ms")
    bs = _band_subsample_rows(x, 4 * _MAX_CELLS)
    print(f"haar on bands          : {timed(_haar_hh, bs):7.2f} ms")
    d, m = _haar_hh(bs)
    d2, m2 = _maybe_subsample(d, m)
    print(f"mad_pg_fit (hist+fit)  : {timed(mad_pg_fit, d2, m2):7.2f} ms")
    print(f"hist two-scatter       : {timed(hist_two, d2, m2):7.2f} ms")
    print(f"hist one-scatter [N,2] : {timed(hist_one, d2, m2):7.2f} ms")
    for cap in (17, 16):
        dd, mm = d.reshape(-1)[: 1 << cap], m.reshape(-1)[: 1 << cap]
        print(f"hist two @2^{cap}        : {timed(hist_two, dd, mm):7.2f} ms")


if __name__ == "__main__":
    main()
