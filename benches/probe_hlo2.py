"""Name the 800-grain case's 6.5 GB/render (probe v2).

probe_hlo_granular.py came back with big_buffers=[] because it parsed
shapes from the LHS of `=` — HLO text puts the output shape on the RHS
(`%name = f32[dims]{layout} opcode(...)`).  This probe fixes the parse,
walks the OPTIMIZED HLO's while-loop body (the scan), ranks every
instruction by output bytes x trip count, and saves the full HLO text
for offline study.  It also diffs the remote cost model across the
ablation flags (compile-only, so backend drift is irrelevant):
    full grouped_v / no_read / const-gain / no-gain / lane_env=0 / 400.

Usage: python benches/probe_hlo2.py   (alone — single-client TPU)
"""

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

OUT_HLO = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "runs_r05", "hlo_800_grouped_v.txt")


def _emit(**kw):
    print(json.dumps(kw), flush=True)


_BYTES = {"f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8, "u64": 8,
          "pred": 1, "u8": 1, "s8": 1, "bf16": 2, "f16": 2, "u16": 2,
          "s16": 2}
_SHAPE = re.compile(r"(f32|f64|s32|s64|u32|u64|pred|u8|s8|bf16|f16|u16|s16)"
                    r"\[([\d,]*)\]")


def _shape_bytes(frag):
    tot = 0
    for m in _SHAPE.finditer(frag):
        dt, dims = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        tot += n * _BYTES[dt]
    return tot


def _out_bytes(line):
    """Output bytes of one HLO instruction line (shape(s) on the RHS of
    '=', before the opcode's '(' — tuples covered by taking the prefix up
    to the first lowercase opcode token)."""
    rhs = line.split("=", 1)[1].lstrip()
    # the output type is everything before the opcode word; opcodes are
    # bare identifiers NOT followed by '[' — find the first token that
    # looks like `word(`
    m = re.search(r"\b([a-z][a-z0-9\-]*)\(", rhs)
    frag = rhs[:m.start()] if m else rhs
    return _shape_bytes(frag)


def _computations(txt):
    """name -> list of instruction lines, by brace-scanning the dump."""
    comps = {}
    cur, buf = None, []
    for line in txt.splitlines():
        ls = line.strip()
        m = re.match(r"^(?:ENTRY\s+)?%?([\w.\-]+)\s*\(.*\{$", ls)
        if cur is None and m and "=" not in ls.split("(", 1)[0]:
            cur, buf = m.group(1), []
            continue
        if cur is not None:
            if ls == "}":
                comps[cur] = buf
                cur = None
            elif "=" in ls and not ls.startswith("//"):
                buf.append(ls)
    return comps


def analyze_hlo(txt, emit_name):
    comps = _computations(txt)
    # resolve scan bodies via the while instructions' body= attributes
    # (names vary: while_body / wide.region_0.sunk / ...)
    body_names = set(re.findall(r"body=%?([\w.\-]+)", txt))
    body_names |= {n for n in comps if "body" in n}
    bodies = [(n, comps[n]) for n in body_names if n in comps]
    _SKIP = ("parameter", "tuple", "get-tuple-element")
    ranked_all = []
    for name, lines in bodies:
        per_iter = 0
        rows = []
        for ls in lines:
            op_m = re.search(r"=\s*[^=]*?\b([a-z][a-z0-9\-]*)\(", ls)
            op = op_m.group(1) if op_m else "?"
            if op in _SKIP:
                continue
            b = _out_bytes(ls)
            per_iter += b
            if b >= (1 << 20):
                lhs = ls.split("=", 1)[0].strip()
                calls = re.search(r"calls=%?([\w.\-]+)", ls)
                rows.append((b, op, lhs[:60],
                             calls.group(1) if calls else ""))
        rows.sort(reverse=True)
        ranked_all.append((name, per_iter, rows))
    ranked_all.sort(key=lambda t: -t[1])
    for name, per_iter, rows in ranked_all[:3]:
        _emit(stage=emit_name, body=name,
              per_iter_mb=round(per_iter / 1e6, 2),
              top=[{"mb": round(b / 1e6, 2), "op": op, "lhs": lhs,
                    "calls": c} for b, op, lhs, c in rows[:15]])
    return ranked_all, comps


def fused_detail(comps, calls_name, emit_name):
    """Per-instruction bytes inside one fused computation (what the
    fusion reads/writes: parameters = operands, root = output)."""
    lines = comps.get(calls_name, [])
    rows = []
    for ls in lines:
        b = _out_bytes(ls)
        if b >= (1 << 20):
            op = re.search(r"=\s*[^=]*?\b([a-z][a-z0-9\-]*)\(", ls)
            rows.append({"mb": round(b / 1e6, 2),
                         "op": op.group(1) if op else "?",
                         "lhs": ls.split("=", 1)[0].strip()[:60]})
    rows.sort(key=lambda r: -r["mb"])
    _emit(stage=emit_name, fused=calls_name, big=rows[:15])


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    float(jax.jit(lambda a: (jnp.sin(a) * a).sum())(
        jnp.arange(128, dtype=jnp.float32)))
    _emit(stage="warmup", cold_start_s=round(time.perf_counter() - t0, 1))

    import granular_ablate
    from webaudio_tpu.graph import compiler as C

    def compile_case(n_grains=800, env="ramped", flags=None):
        flags = dict(flags or {})
        old = {}
        for k, v in flags.items():
            old[k] = os.environ.get(k)
            os.environ[k] = v
        try:
            ctx, seconds = granular_ablate.build(n_grains=n_grains, env=env)
            cg = C.compile_graph(dict(ctx._nodes), list(ctx._edges),
                                 ctx.sample_rate, ctx.length,
                                 ctx._destination.node_id)
            comp = cg.jit_scan.lower(
                *C.render_args(cg, ctx.length)).compile()
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v
        return ctx, cg, comp

    def cost(comp):
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return ca

    # ---- 1. full 800-grain case: geometry + while-body ranking ----------
    ctx, cg, comp = compile_case()
    k = next(kn for kn in cg.kernels.values()
             if hasattr(kn, "lane_start"))
    _emit(stage="geometry", block_frames=cg.block_frames,
          nb=ctx.length // cg.block_frames +
          (1 if ctx.length % cg.block_frames else 0),
          lanes_K=int(k.lane_start.shape[0]),
          grains_G=int(k.lane_start.shape[1]),
          read_mode=k.read_mode, win_Qs=k.win_Qs, win_W=k.win_W,
          lane_aligned=bool(k.lane_aligned),
          lane_env=bool(k.lane_env), buf_len=int(k.buf_len))
    ca = cost(comp)
    _emit(stage="cost", case="full_800_groupedv",
          gbytes=round(float(ca.get("bytes accessed", 0)) / 1e9, 3),
          gflops=round(float(ca.get("flops", 0)) / 1e9, 3))
    # all cost-analysis keys above 100 MB — the model may itemize
    big_keys = {kk: round(float(v) / 1e9, 3) for kk, v in ca.items()
                if isinstance(v, (int, float)) and float(v) > 1e8}
    _emit(stage="cost_keys", keys=dict(sorted(
        big_keys.items(), key=lambda kv: -kv[1])[:25]))

    txt = comp.as_text()
    with open(OUT_HLO, "w") as f:
        f.write(txt)
    _emit(stage="hlo_saved", path=OUT_HLO, n_lines=len(txt.splitlines()))
    ranked, comps = analyze_hlo(txt, "body_rank")
    # drill into the two fattest fusions of the fattest body
    if ranked:
        seen = 0
        for b, op, lhs, calls in ranked[0][2]:
            if calls and seen < 3:
                fused_detail(comps, calls, "fused_detail")
                seen += 1

    # ---- 2. differential remote cost over the ablation flags ------------
    for name, n, env, flags in [
        ("no_read", 800, "ramped", {"WEBAUDIO_GRAIN_ABLATE": "no_read"}),
        ("const_gains", 800, "const", None),
        ("no_gain", 800, "none", None),
        ("lane_env_off", 800, "ramped", {"WEBAUDIO_LANE_ENV": "0"}),
        ("grains_400", 400, "ramped", None),
        ("grouped_t", 800, "ramped", {"WEBAUDIO_GRAIN_READ": "grouped_t"}),
        ("gather", 800, "ramped", {"WEBAUDIO_GRAIN_READ": "gather"}),
    ]:
        try:
            _, cg2, comp2 = compile_case(n_grains=n, env=env, flags=flags)
            ca2 = cost(comp2)
            _emit(stage="cost", case=name, block_frames=cg2.block_frames,
                  gbytes=round(float(ca2.get("bytes accessed", 0)) / 1e9, 3),
                  gflops=round(float(ca2.get("flops", 0)) / 1e9, 3))
        except Exception as exc:
            _emit(stage="cost", case=name,
                  error=f"{type(exc).__name__}: {exc}"[:200])


if __name__ == "__main__":
    main()
