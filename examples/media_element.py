"""MediaElement playback control: seek / rate / pause (reference:
examples/media_element.rs) through MediaElementAudioSourceNode."""
import _common  # noqa: F401
import time

import webaudio_tpu as wa
from webaudio_tpu.media.element import MediaElement

el = MediaElement("/root/reference/samples/major-scale.ogg")
el.loop = True
el.playback_rate = 1.25

ctx = wa.AudioContext(sample_rate=44100.0, sink_id="none",
                      render_size_hint=8192)
src = ctx.create_media_element_source(el)
src.connect(ctx.destination)
el.play()
time.sleep(0.4)
print(f"t={el.current_time:.2f}s after 0.4 s at 1.25x")
el.current_time = 2.0          # seek
time.sleep(0.2)
el.pause()
print(f"paused at t={el.current_time:.2f}s, duration {el.duration:.2f}s")
ctx.close().result()
print("AudioContext state:", ctx.state)
