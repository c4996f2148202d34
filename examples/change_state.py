"""Offline suspend / graph mutation mid-render (reference:
examples/change_state.rs + OfflineAudioContext suspend tests): schedule
context edits at quantum boundaries while rendering."""
import _common  # noqa: F401
import numpy as np
import webaudio_tpu as wa
from webaudio_tpu.media.wav import write_wav

fs = 48000.0
ctx = wa.OfflineAudioContext(2, int(fs * 3.0), fs)
osc = ctx.create_oscillator(frequency=440.0)
g = ctx.create_gain(gain=0.5)
osc.connect(g)
g.connect(ctx.destination)
osc.start()


def add_harmony(context):
    o2 = context.create_oscillator(frequency=660.0)
    o2.connect(g)
    o2.start()
    print(f"  t={context.current_time:.2f}s: added a fifth")


def detune_down(context):
    osc.frequency.exponential_ramp_to_value_at_time(
        220.0, context.current_time + 1.0)
    print(f"  t={context.current_time:.2f}s: gliding down an octave")


ctx.suspend_sync(1.0, add_harmony)
ctx.suspend_sync(2.0, detune_down)
out = ctx.start_rendering_sync()
write_wav("/tmp/change_state.wav", out.to_array(), fs)
print("wrote /tmp/change_state.wav", out)
