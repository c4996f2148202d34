"""Trigger many short oscillators on a timeline (reference:
examples/many_oscillators.rs — a new sine every 50 ms, forever).

Rendered offline: 100 sines, one every 50 ms, each 1.5 s long.  Above the
fusion threshold the compiler rewrites them into one (V, B) voice bank —
the node count stays at user scale, the kernel count does not.
"""
import _common  # noqa: F401
import numpy as np
import webaudio_tpu as wa
from webaudio_tpu.media.wav import write_wav

fs = 44100.0
seconds = 6.5
ctx = wa.OfflineAudioContext(2, int(fs * seconds), fs)

rng = np.random.RandomState(0)
for i in range(100):
    now = i * 0.05
    osc = ctx.create_oscillator(
        frequency=float(rng.randint(100, 3000)))
    amp = ctx.create_gain(gain=0.05)
    osc.connect(amp)
    amp.connect(ctx.destination)
    osc.start(now)
    osc.stop(now + 1.5)

out = ctx.start_rendering_sync()
write_wav("/tmp/many_oscillators.wav", out.to_array(), fs)

from webaudio_tpu.diagnostics import collect_diagnostics
diag = collect_diagnostics(ctx)
groups = diag.get("fusion", {}).get("groups", [])
print(f"user nodes: {len(ctx._nodes)}; fused groups: "
      + ", ".join(f"{g['kind']}x{g['voices']}" for g in groups))
print("wrote /tmp/many_oscillators.wav", out)
