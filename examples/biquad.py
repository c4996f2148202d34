"""BiquadFilterNode tour (reference: examples/biquad.rs).

Runs white-ish source material through each of the eight filter types,
sweeping the frequency param, and prints each type's frequency response
at a few probe points (get_frequency_response, biquad_filter.rs:670-743).
"""
import _common  # noqa: F401
import numpy as np
import webaudio_tpu as wa
from webaudio_tpu.media.wav import write_wav

fs = 44100.0
TYPES = ["lowpass", "highpass", "bandpass", "lowshelf", "highshelf",
         "peaking", "notch", "allpass"]

clip = wa.OfflineAudioContext(2, 1, fs).decode_audio_data_sync(
    "/root/reference/samples/sample.wav")

segments = []
for ftype in TYPES:
    ctx = wa.OfflineAudioContext(2, int(fs * 1.0), fs)
    src = ctx.create_buffer_source(loop=True)
    src.buffer = clip
    f = ctx.create_biquad_filter(type=ftype, q=4.0, gain=6.0)
    f.frequency.set_value_at_time(200.0, 0.0)
    f.frequency.exponential_ramp_to_value_at_time(8000.0, 1.0)
    src.connect(f)
    f.connect(ctx.destination)
    src.start()
    segments.append(ctx.start_rendering_sync().to_array())

    probe = np.array([100.0, 1000.0, 10000.0], np.float32)
    mag = np.zeros_like(probe)
    phase = np.zeros_like(probe)
    f.get_frequency_response(probe, mag, phase)
    mags = "  ".join(f"{fq:>6.0f}Hz:{20*np.log10(max(m,1e-9)):+6.1f}dB"
                     for fq, m in zip(probe, mag))
    print(f"{ftype:10s} {mags}")

out = np.concatenate(segments, axis=1)
write_wav("/tmp/biquad_tour.wav", out, fs)
print(f"wrote /tmp/biquad_tour.wav ({out.shape[1]/fs:.0f} s, "
      f"one second per filter type)")
