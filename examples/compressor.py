"""Dynamics compression A/B (reference: examples/compressor.rs).

Plays the same clip dry and through a DynamicsCompressorNode and prints
the gain reduction; writes both renders to /tmp for listening.
"""
import _common  # noqa: F401
import numpy as np
import webaudio_tpu as wa
from webaudio_tpu.media.wav import write_wav

fs = 44100.0
clip = wa.OfflineAudioContext(2, 1, fs).decode_audio_data_sync(
    "/root/reference/samples/sample.wav")


def render(with_compressor: bool):
    ctx = wa.OfflineAudioContext(2, int(fs * 3.0), fs)
    src = ctx.create_buffer_source()
    src.buffer = clip
    if with_compressor:
        comp = ctx.create_dynamics_compressor(threshold=-30.0, ratio=12.0,
                                              knee=24.0)
        src.connect(comp)
        comp.connect(ctx.destination)
    else:
        src.connect(ctx.destination)
        comp = None
    src.start()
    out = ctx.start_rendering_sync()
    if comp is not None:
        print(f"compressor reduction: {comp.reduction:+.1f} dB")
    return out


dry = render(False)
wet = render(True)
write_wav("/tmp/compressor_dry.wav", dry.to_array(), fs)
write_wav("/tmp/compressor_wet.wav", wet.to_array(), fs)
print("dry peak", float(np.abs(dry.to_array()).max()),
      "wet peak", float(np.abs(wet.to_array()).max()))
print("wrote /tmp/compressor_dry.wav and /tmp/compressor_wet.wav")
