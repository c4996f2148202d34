"""AM synthesis (reference: examples/amplitude_modulation.rs):
a low-frequency oscillator modulating the gain of a carrier."""
import _common  # noqa: F401
import webaudio_tpu as wa
from webaudio_tpu.media.wav import write_wav

fs = 44100.0
ctx = wa.OfflineAudioContext(2, int(fs * 4), fs)

carrier = ctx.create_oscillator(frequency=300.0)
mod = ctx.create_oscillator(frequency=8.0)          # LFO
mod_gain = ctx.create_gain(gain=0.5)                # depth
am = ctx.create_gain(gain=0.5)                      # carrier gain: 0.5 +/- 0.5

mod.connect(mod_gain)
mod_gain.connect(am.gain)                           # audio-rate param input
carrier.connect(am)
am.connect(ctx.destination)
carrier.start()
mod.start()

buf = ctx.start_rendering_sync()
write_wav("/tmp/amplitude_modulation.wav", buf.to_array(), fs)
print("wrote /tmp/amplitude_modulation.wav", buf)
