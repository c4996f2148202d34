"""Multichannel (5.1) routing with splitter/merger (reference:
examples/multichannel.rs): a different tone in each of 6 channels."""
import _common  # noqa: F401
import numpy as np
import webaudio_tpu as wa
from webaudio_tpu.media.wav import write_wav

fs = 48000.0
ctx = wa.OfflineAudioContext(6, int(fs * 2.0), fs)
ctx.destination.channel_count = 6  # discrete 6-channel output

merger = ctx.create_channel_merger(6)
merger.connect(ctx.destination)

for ch, freq in enumerate([220, 330, 440, 550, 660, 880]):
    osc = ctx.create_oscillator(frequency=float(freq))
    g = ctx.create_gain(gain=0.4)
    osc.connect(g)
    g.connect(merger, 0, ch)
    osc.start(ch * 0.25)

out = ctx.start_rendering_sync()
arr = out.to_array()
for ch in range(6):
    print(f"channel {ch}: rms {np.sqrt((arr[ch]**2).mean()):.3f}")
write_wav("/tmp/multichannel.wav", arr, fs)
print("wrote /tmp/multichannel.wav (6ch)", out)
