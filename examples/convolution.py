"""ConvolverNode room simulation (reference: examples/convolution.rs).

Plays a dry vocal clip, then through two measured impulse responses
(small room, parking garage), using the reference's sample assets.
"""
import _common  # noqa: F401
import numpy as np
import webaudio_tpu as wa
from webaudio_tpu.media.wav import write_wav

fs = 44100.0
S = "/root/reference/samples"
probe_ctx = wa.OfflineAudioContext(1, 1, fs)
voice = probe_ctx.decode_audio_data_sync(f"{S}/vocals-dry.wav")
irs = {
    "dry": None,
    "small-room": probe_ctx.decode_audio_data_sync(
        f"{S}/small-room-response.wav"),
    "parking-garage": probe_ctx.decode_audio_data_sync(
        f"{S}/parking-garage-response.wav"),
}

segments = []
for name, ir in irs.items():
    ctx = wa.OfflineAudioContext(2, int(fs * 3.0), fs)
    src = ctx.create_buffer_source()
    src.buffer = voice
    if ir is None:
        src.connect(ctx.destination)
    else:
        verb = ctx.create_convolver()
        verb.set_buffer(ir)          # normalized equal-power scaling applies
        src.connect(verb)
        verb.connect(ctx.destination)
    src.start()
    seg = ctx.start_rendering_sync().to_array()
    rms = float(np.sqrt((seg ** 2).mean()))
    print(f"{name:16s} ir={0 if ir is None else ir.length:6d} frames  "
          f"rms={rms:.4f}")
    segments.append(seg)

out = np.concatenate(segments, axis=1)
write_wav("/tmp/convolution.wav", out, fs)
print("wrote /tmp/convolution.wav (dry / small room / garage, 3 s each)")
