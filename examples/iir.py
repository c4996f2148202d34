"""IIRFilterNode lowpass vs the equivalent BiquadFilterNode (reference:
examples/iir.rs — same coefficients, same response)."""
import _common  # noqa: F401
import numpy as np
import webaudio_tpu as wa
from webaudio_tpu.media.wav import write_wav

fs = 44100.0
# biquad lowpass coefficients at 200 Hz (the reference example's values)
feedforward = [0.000016636797512844526, 0.00003327359502568905,
               0.000016636797512844526]
feedback = [1.0, -1.9884300106225539, 0.9884965578126054]

ctx = wa.OfflineAudioContext(2, int(fs * 3.0), fs)
clip = ctx.decode_audio_data_sync("/root/reference/samples/sample.wav")
src = ctx.create_buffer_source()
src.buffer = clip
iir = ctx.create_iir_filter(feedforward=feedforward, feedback=feedback)
src.connect(iir)
iir.connect(ctx.destination)
src.start()
out = ctx.start_rendering_sync()
write_wav("/tmp/iir_lowpass.wav", out.to_array(), fs)

# frequency response readback (matches get_frequency_response on biquad)
freqs = np.array([100.0, 200.0, 1000.0, 4000.0], np.float32)
mag = np.zeros_like(freqs)
phase = np.zeros_like(freqs)
iir.get_frequency_response(freqs, mag, phase)
for f, m in zip(freqs, mag):
    print(f"|H({f:6.0f} Hz)| = {20*np.log10(max(m,1e-9)):+6.1f} dB")
print("wrote /tmp/iir_lowpass.wav")
