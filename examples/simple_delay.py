"""Plain (acyclic) delay: dry + 0.4 s echo (reference:
examples/simple_delay.rs)."""
import _common  # noqa: F401
import webaudio_tpu as wa
from webaudio_tpu.media.wav import write_wav

fs = 44100.0
ctx = wa.OfflineAudioContext(2, int(fs * 4.0), fs)
clip = ctx.decode_audio_data_sync("/root/reference/samples/sample.wav")

src = ctx.create_buffer_source()
src.buffer = clip
src.connect(ctx.destination)

delay = ctx.create_delay(max_delay_time=1.0)
delay.delay_time.value = 0.4
wet = ctx.create_gain(gain=0.5)
src.connect(delay)
delay.connect(wet)
wet.connect(ctx.destination)

src.start()
out = ctx.start_rendering_sync()
write_wav("/tmp/simple_delay.wav", out.to_array(), fs)
print("wrote /tmp/simple_delay.wav", out)
