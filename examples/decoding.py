"""Decode every supported media format (reference: examples/decoding.rs).

WAV/AIFF/FLAC decode natively in wahost.cpp; mp3/ogg/aac/alac/webm go
through the wacodec.cpp host over the system FFmpeg libraries (the
analog of the reference's symphonia probe)."""
import _common  # noqa: F401
import os
import numpy as np
import webaudio_tpu as wa

SAMPLES = "/root/reference/samples"
files = ["sample.wav", "sample.aiff", "sample.flac", "sample.mp3",
         "sample.ogg", "sample-aac.m4a", "sample-alac.m4a", "sample.webm",
         "major-scale.ogg", "siren.mp3"]

ctx = wa.OfflineAudioContext(2, 128, 44100.0)
for name in files:
    path = os.path.join(SAMPLES, name)
    if not os.path.exists(path):
        print(f"{name:20s} (missing)")
        continue
    try:
        buf = ctx.decode_audio_data_sync(path)
        data = buf.get_channel_data(0)
        print(f"{name:20s} {buf.number_of_channels}ch "
              f"{buf.sample_rate:7.0f} Hz {buf.duration:7.3f}s "
              f"peak {np.abs(data).max():.3f}")
    except Exception as exc:
        print(f"{name:20s} FAILED: {exc}")
