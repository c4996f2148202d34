"""Feature-bisect the remote Mosaic compiler with micro-kernels.

The round-3 Pallas kernels (grain_read, curve_kernel) crash the axon
remote compile helper (HTTP 500) while the round-2 dither kernel
compiles — this probe compiles one tiny kernel per suspected feature to
map the supported envelope.  One process, one cold start.
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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

    def try_case(name, fn, check=None):
        try:
            out = fn()
            ok = True if check is None else bool(check(np.asarray(out)))
            _emit(case=name, ok=ok)
        except Exception as exc:
            _emit(case=name, ok=False,
                  error=f"{type(exc).__name__}: {exc}"[:160])

    x2d = jnp.arange(2048 * 128, dtype=jnp.float32).reshape(2048, 128)

    # 1. baseline: gridded elementwise (the dither kernel's shape)
    def base():
        def k(x_ref, o_ref):
            o_ref[...] = x_ref[...] * 2.0
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((2048, 128), jnp.float32),
            grid=(2,),
            in_specs=[pl.BlockSpec((1024, 128), lambda i: (i, jnp.int32(0)),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1024, 128), lambda i: (i, jnp.int32(0)),
                                   memory_space=pltpu.VMEM))(x2d)
    try_case("baseline_elementwise", base,
             lambda o: abs(o[5, 5] - x2d[5, 5] * 2).item() < 1e-6)

    # 2. lane-1 blocks: (R, 1)
    xc = jnp.arange(4096, dtype=jnp.float32).reshape(4096, 1)

    def lane1():
        def k(x_ref, o_ref):
            o_ref[...] = x_ref[...] + 1.0
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((4096, 1), jnp.float32),
            grid=(4,),
            in_specs=[pl.BlockSpec((1024, 1), lambda i: (i, jnp.int32(0)),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1024, 1), lambda i: (i, jnp.int32(0)),
                                   memory_space=pltpu.VMEM))(xc)
    try_case("lane1_blocks", lane1, lambda o: abs(o[7, 0] - 8).item() < 1e-6)

    # 3. in-kernel MXU dot
    a = jnp.ones((256, 128), jnp.float32)
    b = jnp.ones((128, 128), jnp.float32)

    def dotk():
        def k(a_ref, b_ref, o_ref):
            o_ref[...] = jax.lax.dot_general(
                a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(a, b)
    try_case("mxu_dot", dotk, lambda o: abs(o[0, 0] - 128).item() < 1e-4)

    # 4. in-kernel narrow dot (65-wide contraction, 32-wide output)
    a2 = jnp.ones((1024, 65), jnp.float32)
    b2 = jnp.ones((65, 32), jnp.float32)

    def dot_narrow():
        def k(a_ref, b_ref, o_ref):
            o_ref[...] = jax.lax.dot_general(
                a_ref[...], b_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((1024, 32), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(a2, b2)
    try_case("mxu_dot_narrow", dot_narrow,
             lambda o: abs(o[0, 0] - 65).item() < 1e-4)

    # 5. 3D block output
    def out3d():
        def k(x_ref, o_ref):
            o_ref[...] = x_ref[...].reshape(1, 16, 128) * 2.0
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((2, 16, 128), jnp.float32),
            grid=(2,),
            in_specs=[pl.BlockSpec((16, 128), lambda i: (i, jnp.int32(0)),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(
                (1, 16, 128), lambda i: (i, jnp.int32(0), jnp.int32(0)),
                memory_space=pltpu.VMEM))(x2d[:32])
    try_case("block_3d_out", out3d)

    # 6. in-kernel transpose
    def transp():
        def k(x_ref, o_ref):
            o_ref[...] = jnp.transpose(x_ref[...], (1, 0))
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((128, 256), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(
                jnp.arange(256 * 128, dtype=jnp.float32).reshape(256, 128))
    try_case("transpose2d", transp,
             lambda o: abs(o[3, 2] - (2 * 128 + 3)).item() < 1e-6)

    # 7. scalar prefetch
    def prefetch():
        def k(s_ref, x_ref, o_ref):
            o_ref[...] = x_ref[...] + s_ref[0].astype(jnp.float32)
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(2,),
            in_specs=[pl.BlockSpec((1024, 128),
                                   lambda i, s: (i, jnp.int32(0)),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1024, 128),
                                   lambda i, s: (i, jnp.int32(0)),
                                   memory_space=pltpu.VMEM))
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((2048, 128), jnp.float32),
            grid_spec=gs)(jnp.asarray([7], jnp.int32), x2d)
    try_case("scalar_prefetch", prefetch,
             lambda o: abs(o[0, 0] - 7).item() < 1e-6)

    # 8. manual DMA HBM->VMEM with dynamic offset
    def dma():
        def k(s_ref, x_hbm, o_ref, scratch, sem):
            s = jnp.int32(s_ref[0])
            cp = pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(s, 128)], scratch, sem)
            cp.start()
            cp.wait()
            o_ref[...] = scratch[...]
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((8, 128), lambda i, s: (jnp.int32(0),
                                                           jnp.int32(0)),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA])
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            grid_spec=gs)(jnp.asarray([128], jnp.int32),
                          jnp.arange(8 * 512, dtype=jnp.float32)
                          .reshape(8, 512))
    try_case("manual_dma_dynamic", dma,
             lambda o: abs(o[0, 0] - 128).item() < 1e-6)

    # 9. iota-compare two-hot build + narrow dot (the curve inner loop,
    #    natural 128-lane tiles)
    def twohot():
        def k(lo_ref, f_ref, t_ref, o_ref):
            lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 65), 1)
            lo = lo_ref[...]
            f = f_ref[...]
            oh = (jnp.where(lanes == lo, 1.0 - f, 0.0)
                  + jnp.where(lanes == lo + jnp.int32(1), f, 0.0))
            o_ref[...] = jax.lax.dot_general(
                oh, t_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        lo = jnp.zeros((512, 1), jnp.int32)
        f = jnp.zeros((512, 1), jnp.float32)
        t = jnp.ones((65, 32), jnp.float32)
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((512, 32), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(lo, f, t)
    try_case("twohot_lane1_dot", twohot, lambda o: abs(o[0, 0] - 1) < 1e-5)


if __name__ == "__main__":
    main()
