"""One-process TPU bench driver: cold-start warmup, Pallas smoke check,
then the full suite.

The axon backend's remote compiler has a 2-15 min PER-PROCESS cold start
(first compile only; later compiles are ~0.4 s) — running every case in
one process is the only honest way to measure many cases.  The smoke
check validates the fused Pallas windowed-read kernel on real hardware
before the suite depends on it; on failure the run degrades to the
gather path instead of erroring every sampled case.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    float(jax.jit(lambda a: (jnp.sin(a) * a).sum())(
        jnp.arange(128, dtype=jnp.float32)))
    print(json.dumps({"stage": "warmup",
                      "cold_start_s": round(time.perf_counter() - t0, 1)}),
          flush=True)

    rng = np.random.default_rng(2)

    # Pallas windowed-read smoke: exactness on the real chip
    try:
        from webaudio_tpu.ops.grain_read import (
            windowed_read_reference, windowed_read_tpu)
        C, L, Qs, W = 2, 4000, 128, 192
        NB = 23
        data = np.zeros((C, L + W + 2), np.float32)
        data[:, :L] = rng.standard_normal((C, L)).astype(np.float32)
        w0 = rng.integers(0, L - W, size=NB).astype(np.int32)
        loc = rng.integers(0, W - 2, size=(NB, Qs)).astype(np.int32)
        frac = rng.random((NB, Qs)).astype(np.float32)
        got = np.asarray(windowed_read_tpu(
            jnp.asarray(data), jnp.asarray(w0), jnp.asarray(loc),
            jnp.asarray(frac), Qs, W))
        ref = windowed_read_reference(data, w0, loc, frac)
        dev = float(np.abs(got - ref).max())
        assert dev < 2e-6, dev
        print(json.dumps({"stage": "pallas_smoke", "ok": True,
                          "maxdev": dev}), flush=True)
    except Exception as exc:
        os.environ["WEBAUDIO_GRAIN_READ"] = "gather"
        print(json.dumps({"stage": "pallas_smoke", "ok": False,
                          "error": f"{type(exc).__name__}: {exc}"[:300],
                          "fallback": "gather"}), flush=True)

    # curve-kernel smoke: gate the Pallas curve path the same way
    try:
        from webaudio_tpu.ops.curve_kernel import curve_lookup_tpu

        n, seg = 2048, 64
        grid = np.linspace(-1, 1, n)
        curve = np.tanh(2.0 * grid).astype(np.float32)
        nseg = -(-n // seg)
        npad = nseg * seg
        cpad = np.concatenate([curve, np.broadcast_to(curve[-1],
                                                      (npad + 1 - n,))])
        T = np.zeros((nseg, seg + 1), np.float32)
        T[:, :seg] = cpad[:npad].reshape(nseg, seg)
        T[:, seg] = cpad[seg::seg][:nseg]
        xs = rng.uniform(-1.2, 1.2, size=1 << 15).astype(np.float32)
        got = np.asarray(curve_lookup_tpu(
            jnp.asarray(xs), jnp.asarray(T.T), n, seg))
        v = np.clip((n - 1) / 2.0 * (xs + 1.0), 0, n - 1)
        ki = np.minimum(np.floor(v).astype(np.int64), n - 2)
        f = (v - ki).astype(np.float32)
        ref = (1 - f) * curve[ki] + f * curve[ki + 1]
        dev = float(np.abs(got - ref).max())
        assert dev < 2e-6, dev
        os.environ["WEBAUDIO_CURVE"] = "pallas"   # proven: enable
        print(json.dumps({"stage": "curve_smoke", "ok": True,
                          "maxdev": dev}), flush=True)
    except Exception as exc:
        os.environ.pop("WEBAUDIO_CURVE", None)    # default xla
        print(json.dumps({"stage": "curve_smoke", "ok": False,
                          "error": f"{type(exc).__name__}: {exc}"[:300],
                          "fallback": "xla"}), flush=True)

    import suite

    suite.main()


if __name__ == "__main__":
    main()
