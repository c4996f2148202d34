"""Focused in-situ probe for the grouped_v VMEM grain select (r5).

Cheap gate before spending a full suite session on it: does the REMOTE
Mosaic accept the kernel (local AOT lowering already passes — that only
gates compilability, benches/COMPILE_CACHE.md), does the on-chip render
match grouped_t numerically (<=1-ulp products + downstream fusion
differences, bounded like tests/test_grain_read.py's render A/B), and
what does it measure at 5/25-deep on both grain densities.

Usage: python benches/probe_grouped_v.py      (alone — single-client TPU)
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

    import granular_ablate
    import suite
    from webaudio_tpu.graph import compiler as C

    probe = jax.jit(lambda o: jnp.max(jnp.abs(o)))

    def compile_case(n_grains, mode):
        os.environ["WEBAUDIO_GRAIN_READ"] = mode
        try:
            ctx, seconds = granular_ablate.build(n_grains=n_grains)
            cg = C.compile_graph(dict(ctx._nodes), list(ctx._edges),
                                 ctx.sample_rate, ctx.length,
                                 ctx._destination.node_id)
            return ctx, cg, seconds
        finally:
            os.environ.pop("WEBAUDIO_GRAIN_READ", None)

    for n in (400, 800):
        refs = {}
        for mode in ("grouped_t", "grouped_v"):
            try:
                t0 = time.perf_counter()
                ctx, cg, seconds = compile_case(n, mode)
                out, _ = C.render_compiled(cg, ctx._nodes, ctx.length)
                suite._force(lambda: probe(out))
                compile_s = time.perf_counter() - t0
                _emit(stage="compile", n_grains=n, mode=mode,
                      seconds=round(compile_s, 1))
            except Exception as exc:
                _emit(stage="compile", n_grains=n, mode=mode,
                      error=f"{type(exc).__name__}: {exc}"[:400])
                continue
            # numeric cross-check on the first render (device-side
            # reduction — readbacks have a minutes-scale per-shape setup)
            refs[mode] = out
            if len(refs) == 2:
                d = jax.jit(lambda a, b: (
                    jnp.max(jnp.abs(a - b)),
                    jnp.sum((a - b) ** 2) / jnp.maximum(
                        jnp.sum(b ** 2), jnp.float32(1e-30))))(
                    refs["grouped_v"], refs["grouped_t"])
                _emit(stage="numeric", n_grains=n,
                      max_abs=float(d[0]), rel_energy=float(d[1]))
            # timing: 3 medians at 5-deep and at 25-deep
            for runs in (5, 25):
                vals = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    for _ in range(runs):
                        out, _ = C.render_compiled(cg, ctx._nodes,
                                                   ctx.length)
                    suite._force(lambda: probe(out))
                    vals.append(seconds / ((time.perf_counter() - t0)
                                           / runs))
                vals.sort()
                _emit(stage="timing", n_grains=n, mode=mode, depth=runs,
                      rtf=round(vals[1], 1),
                      runs=[round(v, 1) for v in vals])


if __name__ == "__main__":
    main()
