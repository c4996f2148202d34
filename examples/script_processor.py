"""ScriptProcessorNode: user Python callback in the render graph
(reference: examples/script_processor.rs — a bitcrusher via the deprecated
script-processor API; AudioWorkletNode is the fast path)."""
import _common  # noqa: F401
import numpy as np
import webaudio_tpu as wa
from webaudio_tpu.media.wav import write_wav

fs = 48000.0
ctx = wa.OfflineAudioContext(1, int(fs * 2.0), fs)
osc = ctx.create_oscillator(type="sawtooth", frequency=110.0)

sp = ctx.create_script_processor(buffer_size=512,
                                 number_of_input_channels=1,
                                 number_of_output_channels=1)


def crush(event):
    # 4-bit quantize + 8x sample-hold, the classic bitcrusher
    x = event.input_buffer[0]
    held = np.repeat(x[::8], 8)[: len(x)]
    event.output_buffer[0] = np.round(held * 8.0) / 8.0


sp.set_onaudioprocess(crush)
osc.connect(sp)
sp.connect(ctx.destination)
osc.start()
out = ctx.start_rendering_sync()
write_wav("/tmp/script_bitcrush.wav", out.to_array(), fs)
print("wrote /tmp/script_bitcrush.wav", out)
