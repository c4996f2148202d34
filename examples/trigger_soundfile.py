"""AudioBufferSourceNode trigger modes (reference:
examples/trigger_soundfile.rs).

Schedules the same decoded clip six ways on one offline timeline: full
play, early stop, offset, offset+duration, backwards from an offset, and
backwards over the whole buffer (negative playback_rate).
"""
import _common  # noqa: F401
import numpy as np
import webaudio_tpu as wa
from webaudio_tpu.media.wav import write_wav

fs = 44100.0
ctx = wa.OfflineAudioContext(2, int(fs * 12.0), fs)
clip = ctx.decode_audio_data_sync("/root/reference/samples/sample.wav")


def voice(**kw):
    src = ctx.create_buffer_source(**kw)
    src.buffer = clip
    src.connect(ctx.destination)
    return src


print("++ play until end")
voice().start(0.0)

print("++ play / stop after 1 s")
s = voice()
s.start(3.5)
s.stop(4.5)

print("++ play / stop 1 s with offset 1 s")
s = voice()
s.start_at_with_offset(5.0, 1.0)
s.stop(6.0)

print("++ play 1 s with offset and duration")
voice().start_at_with_offset_and_duration(6.5, 1.0, 1.0)

print("++ play backward from offset 1 s")
s = voice(playback_rate=-1.0)
s.start_at_with_offset(8.0, 1.0)

print("++ play backward full buffer")
s = voice(playback_rate=-1.0)
s.start_at_with_offset(9.5, float(clip.duration))

out = ctx.start_rendering_sync()
write_wav("/tmp/trigger_soundfile.wav", out.to_array(), fs)
print("wrote /tmp/trigger_soundfile.wav", out)
