"""Bisect remote-compile failures of the round-3 Pallas kernels.

One process, one cold start; each variant just compiles (and, when the
compile lands, runs a small numeric check).  Prints one JSON line per
variant.
"""

import json
import sys
import time
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    float(jax.jit(lambda a: (jnp.sin(a) * a).sum())(
        jnp.arange(128, dtype=jnp.float32)))
    _emit(stage="warmup", cold_start_s=round(time.perf_counter() - t0, 1))

    from webaudio_tpu.ops.curve_kernel import curve_lookup_tpu
    from webaudio_tpu.ops.grain_read import (
        windowed_read_reference, windowed_read_tpu)

    rng = np.random.default_rng(2)

    # --- curve kernel variants ---------------------------------------------
    n, seg = 2048, 64
    nseg = -(-n // seg)
    grid = np.linspace(-1, 1, n)
    curve = np.tanh(2.0 * grid).astype(np.float32)
    npad = nseg * seg
    cpad = np.concatenate([curve, np.broadcast_to(curve[-1],
                                                  (npad + 1 - n,))])
    T = np.zeros((nseg, seg + 1), np.float32)
    T[:, :seg] = cpad[:npad].reshape(nseg, seg)
    T[:, seg] = cpad[seg::seg][:nseg]
    x = rng.uniform(-1.2, 1.2, size=1 << 16).astype(np.float32)

    def curve_oracle(xv):
        v = np.clip((n - 1) / 2.0 * (xv + 1.0), 0, n - 1)
        ki = np.minimum(np.floor(v).astype(np.int64), n - 2)
        f = (v - ki).astype(np.float32)
        return (1 - f) * curve[ki] + f * curve[ki + 1]

    for prec in ("highest", "default"):
        t0 = time.perf_counter()
        try:
            got = np.asarray(curve_lookup_tpu(
                jnp.asarray(x), jnp.asarray(T.T), n, seg, prec=prec))
            dev = float(np.abs(got - curve_oracle(x)).max())
            _emit(kernel="curve", prec=prec, ok=True, maxdev=dev,
                  compile_s=round(time.perf_counter() - t0, 1))
        except Exception as exc:
            _emit(kernel="curve", prec=prec, ok=False,
                  error=f"{type(exc).__name__}: {exc}"[:200])

    # --- windowed-read variants --------------------------------------------
    C, L, Qs, W = 2, 4000, 128, 192
    NB = 23
    data = np.zeros((C, L + W + 2), np.float32)
    data[:, :L] = rng.standard_normal((C, L)).astype(np.float32)
    w0 = rng.integers(0, L - W, size=NB).astype(np.int32)
    loc = rng.integers(0, W - 2, size=(NB, Qs)).astype(np.int32)
    frac = rng.random((NB, Qs)).astype(np.float32)
    ref = windowed_read_reference(data, w0, loc, frac)
    for prec in ("highest", "default"):
        try:
            got = np.asarray(windowed_read_tpu(
                jnp.asarray(data), jnp.asarray(w0), jnp.asarray(loc),
                jnp.asarray(frac), Qs, W, prec=prec))
            dev = float(np.abs(got - ref).max())
            _emit(kernel="windowed_read", prec=prec, ok=True, maxdev=dev)
        except Exception as exc:
            _emit(kernel="windowed_read", prec=prec, ok=False,
                  error=f"{type(exc).__name__}: {exc}"[:200])

    # --- control: mastering chain without any new Pallas --------------------
    os.environ["WEBAUDIO_CURVE"] = "xla"
    os.environ["WEBAUDIO_GRAIN_READ"] = "gather"
    try:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import suite
        from webaudio_tpu.graph import compiler as Cmp

        ctx, seconds = suite.case_mastering_chain()
        cg = Cmp.compile_graph(dict(ctx._nodes), list(ctx._edges),
                               ctx.sample_rate, ctx.length,
                               ctx._destination.node_id)
        t0 = time.perf_counter()
        out, _ = Cmp.render_compiled(cg, ctx._nodes, ctx.length)
        probe = jax.jit(lambda o: jnp.max(jnp.abs(o)))
        peak = suite._force(lambda: probe(out))
        _emit(kernel="mastering_xla_control", ok=bool(np.isfinite(peak)),
              compile_s=round(time.perf_counter() - t0, 1))
    except Exception as exc:
        _emit(kernel="mastering_xla_control", ok=False,
              error=f"{type(exc).__name__}: {exc}"[:200])


if __name__ == "__main__":
    main()
