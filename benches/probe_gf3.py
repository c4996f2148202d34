"""Split the fused-bank render's on-chip time: gather vs kernel vs rest.

Findings so far (runs_r05/probe_gf3.jsonl / probe_gf3b.jsonl + the
backend's own estimated_cycles in hlo_800_fused.txt):
  - row gather: 3.16 ms at g=16 (248k descriptors), 2.29 ms at g=32
  - the (RSp, Cw) -> (Cw, RSp) HBM transpose: 2.98 ms (copy.6)
  - whole-resource T(2,128) layout copy of the 3-D staged rows: 1.72 ms
    (copy.5) — killed by FLAT (N, Cwp) staging
  - the 1-trip lax.scan xs conversion: 0.85 ms — killed by the nb==1
    scan bypass (compiler.py)
This sweep A/Bs the remaining knobs: g (16/32), M (block width), and
GF_T (transpose on the VMEM tile vs through HBM), then render-benches
the best combos end-to-end.

Usage: python benches/probe_gf3.py   (alone — single-client TPU)
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _emit(**kw):
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in kw.items()}), flush=True)


def bench(fn, *args, depth=25, reps=3):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    vals = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(depth):
            out = fn(*args)
        jax.block_until_ready(out)
        vals.append((time.perf_counter() - t0) / depth * 1e3)
    vals.sort()
    return vals[1], vals


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    float(jax.jit(lambda a: (jnp.sin(a) * a).sum())(
        jnp.arange(128, dtype=jnp.float32)))
    _emit(stage="warmup", cold_start_s=round(time.perf_counter() - t0, 1))

    from webaudio_tpu.ops.grain_read import _grain_bank_fused

    K, Q, C = 9, 128, 2
    nq = 3446
    B = nq * Q
    L = 142187
    rng = np.random.default_rng(3)
    t = jnp.arange(B, dtype=jnp.int32)
    okf = jnp.ones((K, nq), jnp.float32)
    sv = jnp.zeros((K, nq), jnp.int32)
    ev = jnp.full((K, nq), B, jnp.int32)
    bi = jnp.asarray(rng.integers(0, L - 200, (K, nq)).astype(np.int32))
    bf = jnp.asarray(rng.random((K, nq)).astype(np.float32))
    rt = jnp.asarray((0.9 + 0.2 * rng.random((K, nq)))
                     .astype(np.float32))
    gain = jnp.asarray(rng.random((K, B)).astype(np.float32))
    edge = jnp.zeros((C,), jnp.float32)

    for g, M, tin in [(16, 1024, False), (16, 1024, True),
                      (16, 2048, True), (32, 2048, False),
                      (32, 2048, True), (32, 4096, True)]:
        w = int(np.ceil(g * 1.1)) + 3
        Cwp = ((C * w + 7) // 8) * 8
        rows_gf = jnp.asarray(rng.standard_normal(
            (L + 2, Cwp)).astype(np.float32))

        def kf(rows_gf, t, okf, sv, ev, bi, bf, rt, gain, edge,
               g=g, w=w, M=M, tin=tin):
            out = _grain_bank_fused(
                rows_gf, t, okf, sv, ev, bi, bf, rt, gain, edge,
                g=g, w=w, L=L, Q=Q, gl0=-1e30, gl1=1e30, M=M, tin=tin)
            return jnp.sum(out, dtype=jnp.float32)

        try:
            ms, vals = bench(jax.jit(kf), rows_gf, t, okf, sv, ev, bi,
                             bf, rt, gain, edge)
            _emit(stage="kernel_full", g=g, M=M, tin=tin, w=w, ms=ms,
                  runs=[round(v, 3) for v in vals])
        except Exception as exc:
            _emit(stage="kernel_full", g=g, M=M, tin=tin,
                  error=f"{type(exc).__name__}: {exc}"[:300])

    # full renders (includes the nb==1 scan bypass) for contrast combos
    import granular_ablate
    import suite
    from webaudio_tpu.graph import compiler as C_

    probe = jax.jit(lambda o: jnp.max(jnp.abs(o)))
    for label, env, n in [
        ("fused_default_800", {"WEBAUDIO_GRAIN_READ": "fused"}, 800),
        ("fused_g32m2048_800", {"WEBAUDIO_GRAIN_READ": "fused",
                                "WEBAUDIO_GRAIN_GROUP": "32",
                                "WEBAUDIO_GF_M": "2048"}, 800),
        ("groupedt_800", {"WEBAUDIO_GRAIN_READ": "grouped_t"}, 800),
        ("fused_default_400", {"WEBAUDIO_GRAIN_READ": "fused"}, 400),
        ("fused_g32m2048_400", {"WEBAUDIO_GRAIN_READ": "fused",
                                "WEBAUDIO_GRAIN_GROUP": "32",
                                "WEBAUDIO_GF_M": "2048"}, 400),
    ]:
        old = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            ctx, seconds = granular_ablate.build(n_grains=n)
            cg = C_.compile_graph(dict(ctx._nodes), list(ctx._edges),
                                  ctx.sample_rate, ctx.length,
                                  ctx._destination.node_id)
            out, _ = C_.render_compiled(cg, ctx._nodes, ctx.length)
            suite._force(lambda: probe(out))
            for depth in (5, 25):
                vals = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    for _ in range(depth):
                        out, _ = C_.render_compiled(cg, ctx._nodes,
                                                    ctx.length)
                    suite._force(lambda: probe(out))
                    vals.append(seconds / ((time.perf_counter() - t0)
                                           / depth))
                vals.sort()
                _emit(stage="render_full", mode=label, depth=depth,
                      rtf=round(vals[1], 1),
                      runs=[round(v, 1) for v in vals])
        except Exception as exc:
            _emit(stage="render_full", mode=label,
                  error=f"{type(exc).__name__}: {exc}"[:300])
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v


if __name__ == "__main__":
    main()
