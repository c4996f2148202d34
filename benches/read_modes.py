"""Head-to-head read-mode timing on the TPU: gather vs grouped per case,
in one warm process (drift-controlled: the two modes alternate within
the session).  Also re-bisects the curve kernel with corrected variants
(no captured constants).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _emit(**kw):
    print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                      for k, v in kw.items()}), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    float(jax.jit(lambda a: (jnp.sin(a) * a).sum())(
        jnp.arange(128, dtype=jnp.float32)))
    _emit(stage="warmup", cold_start_s=round(time.perf_counter() - t0, 1))

    import suite
    from webaudio_tpu.graph import compiler as C

    probe = jax.jit(lambda o: jnp.max(jnp.abs(o)))

    def measure(name, case_fn, mode, runs=5):
        os.environ["WEBAUDIO_GRAIN_READ"] = mode
        try:
            ctx, seconds = case_fn()
            cg = C.compile_graph(dict(ctx._nodes), list(ctx._edges),
                                 ctx.sample_rate, ctx.length,
                                 ctx._destination.node_id)
            out, _ = C.render_compiled(cg, ctx._nodes, ctx.length)
            suite._force(lambda: probe(out))
            vals = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(runs):
                    out, _ = C.render_compiled(cg, ctx._nodes, ctx.length)
                suite._force(lambda: probe(out))
                vals.append(seconds / ((time.perf_counter() - t0) / runs))
            vals.sort()
            _emit(case=name, mode=mode, rtf=vals[1], lo=vals[0], hi=vals[2])
        except Exception as exc:
            _emit(case=name, mode=mode,
                  error=f"{type(exc).__name__}: {exc}"[:160])
        finally:
            os.environ.pop("WEBAUDIO_GRAIN_READ", None)

    cases = [("granular", suite.case_granular_grains),
             ("buffer_biquad", suite.case_buffer_biquad),
             ("convolution_reverb", suite.case_convolution_reverb),
             ("mastering_chain", suite.case_mastering_chain)]
    # alternate modes so drift hits both equally
    for rep in range(2):
        for name, fn in cases:
            for mode in ("gather", "grouped"):
                measure(f"{name}_r{rep}", fn, mode)

    # --- curve-kernel bisect, corrected (constants built in-body) ----------
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, M = 1024, 4096
    n, seg, nseg = 2048, 64, 32
    x = jnp.linspace(-1.2, 1.2, M, dtype=jnp.float32).reshape(M, 1)
    T = jnp.ones((seg + 1, nseg), jnp.float32)

    def run_variant(name, kern, with_table):
        try:
            specs = [pl.BlockSpec((R, 1), lambda i: (i, jnp.int32(0)),
                                  memory_space=pltpu.VMEM)]
            args = [x]
            if with_table:
                specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
                args.append(T)
            out = pl.pallas_call(
                kern, out_shape=jax.ShapeDtypeStruct((M, 1), jnp.float32),
                grid=(M // R,), in_specs=specs,
                out_specs=pl.BlockSpec((R, 1), lambda i: (i, jnp.int32(0)),
                                       memory_space=pltpu.VMEM))(*args)
            _emit(variant=name, ok=True, v0=float(np.asarray(out)[0, 0]))
        except Exception as exc:
            _emit(variant=name, ok=False,
                  error=f"{type(exc).__name__}: {exc}"[:160])

    def v2(x_ref, o_ref):
        xv = x_ref[...]
        v = jnp.float32((n - 1) / 2.0) * (xv + jnp.float32(1.0))
        v = jnp.clip(v, jnp.float32(0.0), jnp.float32(n - 1))
        ki = jnp.minimum(jnp.floor(v).astype(jnp.int32), jnp.int32(n - 2))
        o_ref[...] = v - ki.astype(jnp.float32)

    def v3(x_ref, o_ref):
        xv = x_ref[...]
        v = jnp.float32((n - 1) / 2.0) * (xv + jnp.float32(1.0))
        v = jnp.clip(v, jnp.float32(0.0), jnp.float32(n - 1))
        ki = jnp.minimum(jnp.floor(v).astype(jnp.int32), jnp.int32(n - 2))
        hi = ki // jnp.int32(seg)
        lo = ki - hi * jnp.int32(seg)
        o_ref[...] = lo.astype(jnp.float32) + hi.astype(jnp.float32)

    def v4(x_ref, t_ref, o_ref):
        xv = x_ref[...]
        v = jnp.float32((n - 1) / 2.0) * (xv + jnp.float32(1.0))
        v = jnp.clip(v, jnp.float32(0.0), jnp.float32(n - 1))
        ki = jnp.minimum(jnp.floor(v).astype(jnp.int32), jnp.int32(n - 2))
        f = v - ki.astype(jnp.float32)
        hi = ki // jnp.int32(seg)
        lo = ki - hi * jnp.int32(seg)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, seg + 1), 1)
        oh = (jnp.where(lanes == lo, jnp.float32(1.0) - f, jnp.float32(0.0))
              + jnp.where(lanes == lo + jnp.int32(1), f, jnp.float32(0.0)))
        P = jax.lax.dot_general(
            oh, t_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        o_ref[...] = P[:, :1]

    def v5(x_ref, t_ref, o_ref):
        xv = x_ref[...]
        v = jnp.float32((n - 1) / 2.0) * (xv + jnp.float32(1.0))
        v = jnp.clip(v, jnp.float32(0.0), jnp.float32(n - 1))
        ki = jnp.minimum(jnp.floor(v).astype(jnp.int32), jnp.int32(n - 2))
        f = v - ki.astype(jnp.float32)
        hi = ki // jnp.int32(seg)
        lo = ki - hi * jnp.int32(seg)
        lanes = jax.lax.broadcasted_iota(jnp.int32, (1, seg + 1), 1)
        oh = (jnp.where(lanes == lo, jnp.float32(1.0) - f, jnp.float32(0.0))
              + jnp.where(lanes == lo + jnp.int32(1), f, jnp.float32(0.0)))
        P = jax.lax.dot_general(
            oh, t_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        segs = jax.lax.broadcasted_iota(jnp.int32, (1, nseg), 1)
        o_ref[...] = jnp.sum(jnp.where(segs == hi, P, jnp.float32(0.0)),
                             axis=1, keepdims=True)

    run_variant("v2_floor_clip", v2, False)
    run_variant("v3_div_mod", v3, False)
    run_variant("v4_twohot_dot", v4, True)
    run_variant("v5_select_reduce", v5, True)


if __name__ == "__main__":
    main()
