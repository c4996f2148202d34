"""Cross-rate buffer playback (reference: examples/resampling.rs).

The reference ships the same clips recorded at 38000/44100/48000 Hz;
`decode_audio_data_sync` resamples each to the context rate (the
reference does the same, decoding.rs:51), so all three takes should
sound identical.
"""
import _common  # noqa: F401
import numpy as np
import webaudio_tpu as wa
from webaudio_tpu.media.wav import write_wav

fs = 44100.0
S = "/root/reference/samples"
probe = wa.OfflineAudioContext(1, 1, fs)

segments = []
for rate in (38000, 44100, 48000):
    clip = probe.decode_audio_data_sync(f"{S}/think-mono-{rate}.wav")
    ctx = wa.OfflineAudioContext(1, int(fs * 3.0), fs)
    src = ctx.create_buffer_source()
    src.buffer = clip
    src.connect(ctx.destination)
    src.start()
    seg = ctx.start_rendering_sync().to_array()
    segments.append(seg)
    print(f"think-mono-{rate}.wav (media {rate} Hz): decoded to "
          f"{clip.sample_rate:.0f} Hz, {clip.duration:.2f} s, "
          f"rms {float(np.sqrt((seg**2).mean())):.4f}")

# cross-check: the 44100 and 48000 versions should align closely
a, b = segments[1][0], segments[2][0]
n = min(len(a), len(b))
corr = float(np.corrcoef(a[:n], b[:n])[0, 1])
print(f"correlation 44100-source vs 48000-source render: {corr:.4f}")

out = np.concatenate(segments, axis=1)
write_wav("/tmp/resampling.wav", out, fs)
print("wrote /tmp/resampling.wav (three takes, one per media rate)")
