"""Gridless curve-kernel probe (is the remote-Mosaic failure the GRID or
the in-kernel compute feeding the dot?), then the full suite."""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t0 = time.perf_counter()
    float(jax.jit(lambda a: (jnp.sin(a) * a).sum())(
        jnp.arange(128, dtype=jnp.float32)))
    _emit(stage="warmup", cold_start_s=round(time.perf_counter() - t0, 1))

    n, seg, nseg = 2048, 64, 32
    M = 16384
    x = jnp.linspace(-1.2, 1.2, M, dtype=jnp.float32).reshape(M, 1)
    grid_c = np.linspace(-1, 1, n)
    curve = np.tanh(2.0 * grid_c).astype(np.float32)
    npad = nseg * seg
    cpad = np.concatenate([curve, np.broadcast_to(curve[-1],
                                                  (npad + 1 - n,))])
    T = np.zeros((nseg, seg + 1), np.float32)
    T[:, :seg] = cpad[:npad].reshape(nseg, seg)
    T[:, seg] = cpad[seg::seg][:nseg]
    Tt = jnp.asarray(T.T)

    def curve_kernel(x_ref, t_ref, o_ref):
        xv = x_ref[...]
        one = jnp.float32(1.0)
        zero = jnp.float32(0.0)
        v = jnp.float32((n - 1) / 2.0) * (xv + one)
        v = jnp.clip(v, zero, jnp.float32(n - 1))
        ki = jnp.minimum(jnp.floor(v).astype(jnp.int32), jnp.int32(n - 2))
        f = v - ki.astype(jnp.float32)
        hi = ki // jnp.int32(seg)
        lo = ki - hi * jnp.int32(seg)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, seg + 1), 1)
        oh = (jnp.where(lanes == lo, one - f, zero)
              + jnp.where(lanes == lo + jnp.int32(1), f, zero))
        P = jax.lax.dot_general(
            oh, t_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        segs = jax.lax.broadcasted_iota(jnp.int32, (1, nseg), 1)
        o_ref[...] = jnp.sum(jnp.where(segs == hi, P, zero), axis=1,
                             keepdims=True)

    def oracle(xv):
        v = np.clip((n - 1) / 2.0 * (xv + 1.0), 0, n - 1)
        ki = np.minimum(np.floor(v).astype(np.int64), n - 2)
        f = (v - ki).astype(np.float32)
        return (1 - f) * curve[ki] + f * curve[ki + 1]

    # (a) gridless whole-block curve kernel, 16k samples
    try:
        out = pl.pallas_call(
            curve_kernel,
            out_shape=jax.ShapeDtypeStruct((M, 1), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, Tt)
        dev = float(np.abs(np.asarray(out).reshape(-1)
                           - oracle(np.asarray(x).reshape(-1))).max())
        _emit(variant="curve_gridless_16k", ok=bool(dev < 2e-6), maxdev=dev)
    except Exception as exc:
        _emit(variant="curve_gridless_16k", ok=False,
              error=f"{type(exc).__name__}: {exc}"[:160])

    # (b) XLA-chunked gridless: 8 chunks of 16k in one jit
    try:
        def chunked(xf, Tt):
            outs = []
            for c in range(8):
                xc = jax.lax.dynamic_slice(
                    xf, (jnp.int32(c * M),), (M,)).reshape(M, 1)
                outs.append(pl.pallas_call(
                    curve_kernel,
                    out_shape=jax.ShapeDtypeStruct((M, 1), jnp.float32),
                    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                              pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(xc, Tt))
            return jnp.concatenate(outs, axis=0).reshape(-1)

        rng = np.random.default_rng(3)
        xbig = rng.uniform(-1.2, 1.2, size=8 * M).astype(np.float32)
        got = np.asarray(jax.jit(chunked)(jnp.asarray(xbig), Tt))
        dev = float(np.abs(got - oracle(xbig)).max())
        _emit(variant="curve_chunked_128k", ok=bool(dev < 2e-6), maxdev=dev)
    except Exception as exc:
        _emit(variant="curve_chunked_128k", ok=False,
              error=f"{type(exc).__name__}: {exc}"[:160])

    import run_tpu_r3

    run_tpu_r3.main()


if __name__ == "__main__":
    main()
