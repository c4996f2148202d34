"""Coverage for remaining node variants: true-stereo convolver, cone gain,
position readback, 2x oversampling."""

import numpy as np
import pytest

from webaudio_tpu import OfflineAudioContext


def test_convolver_true_stereo_4ch_ir():
    # 4-channel IR: [LL, LR, RL, RR] routing with stereo mixdown
    # (reference: convolver.rs:420-487)
    fs = 48000.0
    ctx = OfflineAudioContext(2, 256, fs)
    # stereo input: impulse on L only
    buf = ctx.create_buffer(2, 4, fs)
    buf.copy_to_channel(np.array([1, 0, 0, 0], np.float32), 0)
    src = ctx.create_buffer_source()
    src.buffer = buf
    ir = ctx.create_buffer(4, 2, fs)
    # LL->0.1, LR->0.2, RL->0.3, RR->0.4 at lag 0
    for c, v in enumerate((0.1, 0.2, 0.3, 0.4)):
        ir.copy_to_channel(np.array([v, 0], np.float32), c)
    conv = ctx.create_convolver(disable_normalization=True)
    conv.set_buffer(ir)
    src.connect(conv)
    conv.connect(ctx.destination)
    src.start()
    out = ctx.start_rendering_sync()
    # L input only: out.L = L*LL + R*RL = 0.1; out.R = L*LR + R*RR = 0.2
    assert out.get_channel_data(0)[0] == pytest.approx(0.1, abs=1e-5)
    assert out.get_channel_data(1)[0] == pytest.approx(0.2, abs=1e-5)


def test_panner_cone_gain():
    fs = 48000.0

    def level(orientation_x):
        ctx = OfflineAudioContext(2, 128, fs)
        src = ctx.create_constant_source(offset=1.0)
        p = ctx.create_panner(position_z=-1.0,
                              orientation_x=orientation_x,
                              orientation_y=0.0,
                              orientation_z=-abs(1 - abs(orientation_x)),
                              cone_inner_angle=40.0, cone_outer_angle=90.0,
                              cone_outer_gain=0.1)
        src.connect(p)
        p.connect(ctx.destination)
        src.start()
        out = ctx.start_rendering_sync().to_array()
        return float(np.sqrt((out[:, 64] ** 2).sum()))

    # source at (0,0,-1), listener at origin.  The reference measures the
    # cone angle against normalize(source_pos - listener_pos)
    # (spatial.rs:278-300), so orientation (0,0,-1) is inside the inner
    # cone (gain 1) and (0,0,+1) is fully outside (cone_outer_gain).
    inner = level(0.0)         # helper passes orientation (0,0,-1)
    ctx = OfflineAudioContext(2, 128, fs)
    src = ctx.create_constant_source(offset=1.0)
    p = ctx.create_panner(position_z=-1.0, orientation_x=0.0,
                          orientation_y=0.0, orientation_z=1.0,
                          cone_inner_angle=40.0, cone_outer_angle=90.0,
                          cone_outer_gain=0.1)
    src.connect(p)
    p.connect(ctx.destination)
    src.start()
    out = ctx.start_rendering_sync().to_array()
    outer = float(np.sqrt((out[:, 64] ** 2).sum()))
    assert inner > outer * 5   # outer-cone attenuation 0.1
    assert outer == pytest.approx(inner * 0.1, rel=0.05)


def test_buffer_source_position_readback():
    fs = 48000.0
    n = 1000
    ctx = OfflineAudioContext(1, 512, fs)
    buf = ctx.create_buffer(1, n, fs)
    buf.copy_to_channel(np.ones(n, np.float32), 0)
    src = ctx.create_buffer_source()
    src.buffer = buf
    src.connect(ctx.destination)
    src.start()
    ctx.start_rendering_sync()
    # 512 frames rendered at rate 1 -> position = 512 samples = 512/fs s
    assert src.position == pytest.approx(512 / fs, rel=1e-6)


# waveshaper oversampling is oracle-tested (alias suppression, latency,
# low-frequency equivalence) in tests/test_waveshaper_oversample.py


def test_loop_point_mutation_applies_at_rerender_boundaries():
    """Reference reads loop points per quantum via control message
    (audio_buffer_source.rs:67-105); the compiled engine applies mutations
    at re-trace boundaries (suspend_sync / session recompile / any
    graph-version bump).  Pin both paths: the post-mutation region must
    BIT-match a context that had the new loop points all along."""
    import numpy as np
    import webaudio_tpu as wa

    fs = 48000.0

    def build(ls_frames):
        ctx = wa.OfflineAudioContext(1, 8192, fs)
        b = ctx.create_buffer(1, 1000, fs)
        b.copy_to_channel((np.arange(1000) % 97 / 97.0).astype(np.float32), 0)
        src = ctx.create_buffer_source(loop=True)
        src.buffer = b
        src.loop_start = ls_frames / fs
        src.loop_end = 900 / fs
        src.connect(ctx.destination)
        src.start()
        return ctx, src

    # suspend_sync path
    ctx, src = build(100)
    ctx.suspend_sync(4096 / fs, lambda c: setattr(src, "loop_start",
                                                  300 / fs))
    out = ctx.start_rendering_sync().get_channel_data(0)
    old = build(100)[0].start_rendering_sync().get_channel_data(0)
    new = build(300)[0].start_rendering_sync().get_channel_data(0)
    np.testing.assert_array_equal(out[:4096], old[:4096])
    np.testing.assert_array_equal(out[4096:], new[4096:])
    assert np.abs(out[4096:] - old[4096:]).max() > 0.1  # mutation visible

    # RenderSession path (recompile on graph-version bump between steps)
    from webaudio_tpu.checkpoint import RenderSession

    ctx2, src2 = build(100)
    s = RenderSession(ctx2, quanta_per_block=16)
    first = s.step(4096)
    src2.loop_start = 300 / fs        # bumps the graph version
    second = s.step(4096)
    np.testing.assert_array_equal(first[0], old[:4096])
    np.testing.assert_array_equal(second[0], new[4096:])


def test_sounddevice_backend_gated_and_functional():
    """SURVEY §7 item 7 (optional dev-machine output): without the
    sounddevice package the sink raises NotSupportedError with guidance;
    with one present (faked here) audio flows through an OutputStream in
    PortAudio's interleaved layout."""
    import numpy as np
    import pytest as _pytest

    from webaudio_tpu.constants import NotSupportedError
    from webaudio_tpu.io_backends import SoundDeviceBackend, build_backend

    # no sounddevice on TPU hosts -> clear gate
    import sys as _sys

    assert "sounddevice" not in _sys.modules
    with _pytest.raises(NotSupportedError, match="sounddevice"):
        build_backend("sounddevice", 2, 48000.0)

    # fake PortAudio: capture what would reach the device
    written = []

    class FakeStream:
        latency = 0.012

        def __init__(self, samplerate, channels, dtype, device):
            self.channels = channels

        def start(self):
            pass

        def write(self, data):
            written.append(np.asarray(data))

        def stop(self):
            pass

        def close(self):
            pass

    class FakeSD:
        OutputStream = FakeStream

    be = SoundDeviceBackend(2, 48000.0, _module=FakeSD)
    chunk = np.arange(8, dtype=np.float32).reshape(2, 4)
    be.write(chunk, 0.0)
    be.close()
    assert written and written[0].shape == (4, 2)        # interleaved
    np.testing.assert_array_equal(written[0], chunk.T)
    assert be.output_latency == 0.012
