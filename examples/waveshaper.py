"""WaveShaperNode distortion (reference: examples/waveshaper.rs).

Drives a clip through a classic soft-clip curve at each oversampling
setting and reports the high-frequency (alias) energy each one leaves
above the signal band.
"""
import _common  # noqa: F401
import numpy as np
import webaudio_tpu as wa
from webaudio_tpu.media.wav import write_wav

fs = 44100.0
seconds = 3.0


def make_distortion_curve(amount: float, n: int = 2048) -> np.ndarray:
    """The ubiquitous k-scaled arctan-ish web-audio distortion curve."""
    x = np.linspace(-1.0, 1.0, n, dtype=np.float32)
    k = amount
    return ((3 + k) * x * 20 * (np.pi / 180)
            / (np.pi + k * np.abs(x))).astype(np.float32)


clip = wa.OfflineAudioContext(2, 1, fs).decode_audio_data_sync(
    "/root/reference/samples/sample.wav")

segments = []
for over in ("none", "2x", "4x"):
    ctx = wa.OfflineAudioContext(2, int(fs * seconds), fs)
    src = ctx.create_buffer_source(loop=True)
    src.buffer = clip
    pre = ctx.create_gain(gain=2.0)                 # drive
    shaper = ctx.create_wave_shaper(oversample=over)
    shaper.set_curve(make_distortion_curve(400.0))
    post = ctx.create_gain(gain=0.4)
    src.connect(pre)
    pre.connect(shaper)
    shaper.connect(post)
    post.connect(ctx.destination)
    src.start()
    seg = ctx.start_rendering_sync().to_array()
    segments.append(seg)

    spec = np.abs(np.fft.rfft(seg[0] * np.hanning(seg.shape[1])))
    freqs = np.fft.rfftfreq(seg.shape[1], 1 / fs)
    hf = float((spec[freqs > 15000.0] ** 2).sum())
    total = float((spec ** 2).sum())
    print(f"oversample={over:4s}  energy >15 kHz: {10*np.log10(hf/total):+6.1f} dB"
          f" of total")

out = np.concatenate(segments, axis=1)
write_wav("/tmp/waveshaper.wav", out, fs)
print("wrote /tmp/waveshaper.wav (none / 2x / 4x, 3 s each)")
