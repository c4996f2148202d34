"""Pitching a sampled buffer with playback_rate and detune (reference:
examples/audio_buffer_source_pitching.rs)."""
import _common  # noqa: F401
import webaudio_tpu as wa
from webaudio_tpu.media.wav import write_wav

fs = 44100.0
ctx = wa.OfflineAudioContext(2, int(fs * 8.0), fs)
clip = ctx.decode_audio_data_sync("/root/reference/samples/sample.wav")

settings = [
    ("original", dict()),
    ("octave down (rate 0.5)", dict(playback_rate=0.5)),
    ("fifth up (detune +700c)", dict(detune=700.0)),
    ("reversed", dict(playback_rate=-1.0)),
]
t = 0.0
for label, kw in settings:
    src = ctx.create_buffer_source(**kw)
    src.buffer = clip
    src.connect(ctx.destination)
    if kw.get("playback_rate", 1.0) < 0:
        src.start_at_with_offset(t, clip.duration)  # play from the end
    else:
        src.start(t)
    src.stop(t + 1.8)
    print(f"t={t:.1f}s  {label}")
    t += 2.0

out = ctx.start_rendering_sync()
write_wav("/tmp/buffer_pitching.wav", out.to_array(), fs)
print("wrote /tmp/buffer_pitching.wav", out)
