"""Where do the remote 6.5 GB/render come from on the 800-grain case?

Local AOT lowering prices the render at 0.13 GB accessed; the remote
compiler reports ~6.5 GB (= the measured 9.2 ms at the HBM roof, so the
number is real).  This probe compiles the full render remotely for the
grain-read modes and prints cost_analysis + memory_analysis, then scans
the OPTIMIZED HLO for the largest materialized buffers (fusion outputs)
so the fat intermediate can be named and attacked.

Usage: python benches/probe_hlo_granular.py   (alone — single-client TPU)
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _emit(**kw):
    print(json.dumps(kw), flush=True)


_SHAPE = re.compile(r"(f32|f64|s32|s64|pred|u8|bf16)\[([\d,]*)\]")
_BYTES = {"f32": 4, "s32": 4, "f64": 8, "s64": 8, "pred": 1, "u8": 1,
          "bf16": 2}


def _buf_bytes(text_line):
    """Total bytes of all result shapes on one HLO line."""
    # only the lhs (before '=') describes the op's own output
    lhs = text_line.split("=", 1)[0]
    tot = 0
    for m in _SHAPE.finditer(lhs):
        dt, dims = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        tot += n * _BYTES[dt]
    return tot


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    float(jax.jit(lambda a: (jnp.sin(a) * a).sum())(
        jnp.arange(128, dtype=jnp.float32)))
    _emit(stage="warmup", cold_start_s=round(time.perf_counter() - t0, 1))

    import granular_ablate
    from webaudio_tpu.graph import compiler as C

    for mode in ("grouped_t", "grouped_v"):
        os.environ["WEBAUDIO_GRAIN_READ"] = mode
        try:
            ctx, seconds = granular_ablate.build(n_grains=800)
            cg = C.compile_graph(dict(ctx._nodes), list(ctx._edges),
                                 ctx.sample_rate, ctx.length,
                                 ctx._destination.node_id)
            comp = cg.jit_scan.lower(*C.render_args(cg, ctx.length)).compile()
        finally:
            os.environ.pop("WEBAUDIO_GRAIN_READ", None)
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        _emit(stage="cost", mode=mode,
              gbytes=round(float(ca.get("bytes accessed", 0)) / 1e9, 3),
              gflops=round(float(ca.get("flops", 0)) / 1e9, 3))
        try:
            ma = comp.memory_analysis()
            _emit(stage="memory", mode=mode,
                  temp_mb=round(ma.temp_size_in_bytes / 1e6, 1),
                  output_mb=round(ma.output_size_in_bytes / 1e6, 1),
                  arg_mb=round(ma.argument_size_in_bytes / 1e6, 1))
        except Exception as exc:
            _emit(stage="memory", mode=mode, error=str(exc)[:200])
        try:
            txt = comp.as_text()
        except Exception as exc:
            _emit(stage="hlo", mode=mode, error=str(exc)[:200])
            continue
        sized = []
        for line in txt.splitlines():
            ls = line.strip()
            if "=" not in ls or ls.startswith("//"):
                continue
            b = _buf_bytes(ls)
            if b >= (64 << 20):
                op = ls.split("=", 1)[1].strip().split("(", 1)[0]
                sized.append((b, op[:60], ls.split("=", 1)[0].strip()[:70]))
        sized.sort(reverse=True)
        _emit(stage="hlo", mode=mode, n_lines=len(txt.splitlines()),
              big_buffers=[{"mb": round(b / 1e6, 1), "op": op, "lhs": lhs}
                           for b, op, lhs in sized[:20]])


if __name__ == "__main__":
    main()
