"""'True physics' Doppler siren (reference: examples/doppler.rs).

A siren passes the listener: a DelayNode models the finite speed of sound
(343 m/s; 100 m away = 0.29 s delay) while a PannerNode with an inverse
distance model moves the source from y=+100 to y=-100 over 10 seconds.
The changing delay produces the physical Doppler pitch bend.
"""
import _common  # noqa: F401
import numpy as np
import webaudio_tpu as wa
from webaudio_tpu.media.wav import write_wav

fs = 44100.0
seconds = 10.0
ctx = wa.OfflineAudioContext(2, int(fs * seconds), fs)

siren = ctx.decode_audio_data_sync("/root/reference/samples/siren.mp3")
src = ctx.create_buffer_source(loop=True)
src.buffer = siren

panner = ctx.create_panner(
    panning_model="equalpower", distance_model="inverse",
    position_x=0.0, position_y=100.0, position_z=1.0,
    orientation_x=1.0, orientation_y=0.0, orientation_z=0.0,
    ref_distance=1.0, max_distance=10000.0, rolloff_factor=1.0,
    cone_inner_angle=360.0, cone_outer_angle=0.0, cone_outer_gain=0.0)
# drive past the listener along y
panner.position_y.linear_ramp_to_value_at_time(-100.0, seconds)

# finite speed of sound: 0.29 s at 100 m, 0 as it crosses us
delay = ctx.create_delay(max_delay_time=1.0)
doppler_max = 100.0 / 343.0
delay.delay_time.set_value_at_time(doppler_max, 0.0)
delay.delay_time.linear_ramp_to_value_at_time(0.0, seconds / 2)
delay.delay_time.linear_ramp_to_value_at_time(doppler_max, seconds)

src.connect(delay)
delay.connect(panner)
panner.connect(ctx.destination)
src.start()

out = ctx.start_rendering_sync()
write_wav("/tmp/doppler.wav", out.to_array(), fs)
arr = out.to_array()
mid = int(fs * seconds / 2)
print(f"level far (t=0.5s): {np.abs(arr[:, int(0.5*fs):int(1.0*fs)]).max():.4f}")
print(f"level close (t=5s): {np.abs(arr[:, mid:mid+int(0.5*fs)]).max():.4f}")
print("wrote /tmp/doppler.wav")
