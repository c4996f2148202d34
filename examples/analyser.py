"""AnalyserNode spectrum readback (reference: examples/analyser.rs).

Renders a 1.5 kHz tone through an analyser and prints an ASCII spectrum.
"""
import _common  # noqa: F401
import numpy as np
import webaudio_tpu as wa

fs = 48000.0
ctx = wa.OfflineAudioContext(1, 8192, fs)
osc = ctx.create_oscillator(frequency=1500.0)
an = ctx.create_analyser(fft_size=2048)
osc.connect(an)
an.connect(ctx.destination)
osc.start()
ctx.start_rendering_sync()

bins = np.zeros(an.frequency_bin_count, np.float32)
an.get_float_frequency_data(bins)
peak_bin = int(np.argmax(bins))
print(f"spectral peak at {peak_bin * fs / 2048:.0f} Hz "
      f"({bins[peak_bin]:.1f} dB)")
# coarse ASCII spectrum, 32 bands
bands = bins[: 512].reshape(32, -1).max(axis=1)
lo, hi = -100.0, 0.0
for i, b in enumerate(bands):
    n = int(np.clip((b - lo) / (hi - lo), 0, 1) * 60)
    print(f"{i * fs / 2 / 1024 * 16:7.0f} Hz |{'#' * n}")
