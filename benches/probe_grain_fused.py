"""Focused in-situ probe for the fully-fused grain bank kernel (r5).

probe_hlo2 showed the XLA lane path materializing ~1.67 GB/render of
full-length intermediates on the 800-grain case (6.25 GB total remote
cost at the HBM roof = the measured 9.2 ms).  grain_bank_fused moves
playhead, masks, two-hot select, edge correction, and the envelope into
one VMEM kernel; expected remote cost ~0.5 GB.  This probe gates the
default flip: remote Mosaic acceptance, on-chip numeric agreement with
grouped_t, remote cost_analysis bytes, and 5/25-deep timings on both
densities against grouped_v (the current TPU default).

Usage: python benches/probe_grain_fused.py   (alone — single-client TPU)
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

    from webaudio_tpu.ops.grain_read import grain_fused_supported

    t0 = time.perf_counter()
    sup = grain_fused_supported()
    _emit(stage="probe", grain_fused_supported=sup,
          seconds=round(time.perf_counter() - t0, 1))

    import granular_ablate
    import suite
    from webaudio_tpu.graph import compiler as C

    probe = jax.jit(lambda o: jnp.max(jnp.abs(o)))

    # label -> env overrides (fused_g8: half-width rows, w 21 -> 12, a
    # ~43% cut in the kernel's per-sample two-hot passes at 2x gather
    # descriptors — the VPU-bound/BW-bound discriminator)
    MODES = [
        ("grouped_t", {"WEBAUDIO_GRAIN_READ": "grouped_t"}),
        ("grouped_v", {"WEBAUDIO_GRAIN_READ": "grouped_v"}),
        ("fused", {"WEBAUDIO_GRAIN_READ": "fused"}),
        ("fused_g8", {"WEBAUDIO_GRAIN_READ": "fused",
                      "WEBAUDIO_GRAIN_GROUP": "8"}),
    ]
    if len(sys.argv) > 1:
        keep = set(sys.argv[1:])
        MODES = [m for m in MODES if m[0] in keep]

    def compile_case(n_grains, env):
        old = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            ctx, seconds = granular_ablate.build(n_grains=n_grains)
            cg = C.compile_graph(dict(ctx._nodes), list(ctx._edges),
                                 ctx.sample_rate, ctx.length,
                                 ctx._destination.node_id)
            return ctx, cg, seconds
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    for n in (400, 800):
        refs = {}
        for mode, env in MODES:
            try:
                t0 = time.perf_counter()
                ctx, cg, seconds = compile_case(n, env)
                out, _ = C.render_compiled(cg, ctx._nodes, ctx.length)
                suite._force(lambda: probe(out))
                compile_s = time.perf_counter() - t0
                k = next(kn for kn in cg.kernels.values()
                         if hasattr(kn, "lane_start"))
                _emit(stage="compile", n_grains=n, mode=mode,
                      read_mode=k.read_mode,
                      seconds=round(compile_s, 1))
            except Exception as exc:
                _emit(stage="compile", n_grains=n, mode=mode,
                      error=f"{type(exc).__name__}: {exc}"[:400])
                continue
            refs[mode] = out
            if mode != "grouped_t" and "grouped_t" in refs:
                d = jax.jit(lambda a, b: (
                    jnp.max(jnp.abs(a - b)),
                    jnp.sum((a - b) ** 2) / jnp.maximum(
                        jnp.sum(b ** 2), jnp.float32(1e-30))))(
                    refs[mode], refs["grouped_t"])
                _emit(stage="numeric", n_grains=n, mode=mode,
                      max_abs=float(d[0]), rel_energy=float(d[1]))
            # remote cost model (deterministic, drift-immune)
            try:
                comp = cg.jit_scan.lower(
                    *C.render_args(cg, ctx.length)).compile()
                ca = comp.cost_analysis()
                if isinstance(ca, list):
                    ca = ca[0]
                _emit(stage="cost", n_grains=n, mode=mode,
                      gbytes=round(float(ca.get("bytes accessed", 0))
                                   / 1e9, 3))
            except Exception as exc:
                _emit(stage="cost", n_grains=n, mode=mode,
                      error=f"{type(exc).__name__}: {exc}"[:200])
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
