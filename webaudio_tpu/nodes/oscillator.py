"""OscillatorNode: periodic waveform source.

reference: src/node/oscillator.rs.  The per-sample f64 phase loop
(oscillator.rs:437-556) becomes a vectorized block kernel (ops/oscillator);
sub-sample start advances the phase by `incr * (n0 - start*fs)` exactly like
the reference's ratio pre-advance (oscillator.rs:521-529); frequencies at or
beyond Nyquist emit silence while the phase keeps advancing
(oscillator.rs:542-556).
"""

from __future__ import annotations

from enum import Enum

import numpy as np
import jax.numpy as jnp

from ..graph.compiler import Kernel
from ..ops import oscillator as osc_ops
from ..param import AudioParamDescriptor, AutomationRate
from ..periodic_wave import PeriodicWave
from ..constants import InvalidStateError
from .scheduled_source import AudioScheduledSourceNode


class OscillatorType(str, Enum):
    SINE = "sine"
    SQUARE = "square"
    SAWTOOTH = "sawtooth"
    TRIANGLE = "triangle"
    CUSTOM = "custom"


class _OscillatorKernel(Kernel):
    def __init__(self, type_: OscillatorType, wavetable, start_frame: int,
                 stop_frame: int, start_time: float, sample_rate: float,
                 const_freq: float | None = None):
        self.type_ = type_
        self.wavetable = None if wavetable is None else np.asarray(wavetable)
        self.start_frame = start_frame
        self.stop_frame = stop_frame
        self.sample_rate = sample_rate
        # constant computed frequency -> closed-form phase (no cumsums)
        self.const_freq = const_freq
        # sub-sample start phase pre-advance ratio in [0, 1)
        # (reference: oscillator.rs:521-529)
        if start_frame >= 2**31 - 1:
            self.start_ratio = 0.0
        else:
            self.start_ratio = float(start_frame - start_time * sample_rate)

    def resources(self):
        return None if self.wavetable is None else {"table": self.wavetable}

    def tail_frames(self):
        # closed-form phase is time-indexed; cumsum phase carries state
        return 0 if self.const_freq is not None else None

    def init_state(self):
        return {"phase": jnp.zeros((), jnp.float64)}

    def process(self, scope, state, inputs, params):
        fs = self.sample_rate
        mask = scope.active_mask(self.start_frame, self.stop_frame)

        if self.const_freq is not None:
            # closed-form phase for constant frequency: no cumsums, no
            # carry dependency — phase = incr * (n - start) + ratio*incr
            computed = jnp.float32(self.const_freq)
            incr_host = np.float64(np.float32(self.const_freq)) / fs
            ref = min(self.start_frame, 2**31 - 1)
            n_rel = (scope.t_idx - np.int32(ref)).astype(jnp.float64)
            phase = jnp.mod((n_rel + self.start_ratio) * incr_host,
                            1.0).astype(jnp.float32)
            incr = jnp.broadcast_to(jnp.float32(incr_host), (scope.frames,))
            carry = state["phase"]  # structural placeholder
        else:
            freq = params["frequency"]
            detune = params["detune"]
            computed = osc_ops.computed_frequency(freq, detune)
            incr64 = computed.astype(jnp.float64) / fs
            incr64 = jnp.broadcast_to(incr64, (scope.frames,))
            incr = incr64.astype(jnp.float32)

            # start correction applies from the block containing the first
            # active sample onward (carried through the f64 phase afterwards)
            at_start = scope.t_idx == self.start_frame
            corr = jnp.sum(jnp.where(at_start, incr64, 0.0)) * self.start_ratio

            phase, carry = osc_ops.accumulate_phase(
                state["phase"], incr64, mask, corr)

        nyquist = fs / 2.0
        audible = jnp.abs(computed) < nyquist

        if self.type_ == OscillatorType.SINE:
            wave = osc_ops.sine(phase)
        elif self.type_ == OscillatorType.SAWTOOTH:
            wave = osc_ops.sawtooth(phase, incr)
        elif self.type_ == OscillatorType.SQUARE:
            wave = osc_ops.square(phase, incr)
        elif self.type_ == OscillatorType.TRIANGLE:
            wave = osc_ops.triangle(phase)
        else:
            wave = osc_ops.wavetable_lookup(phase, scope.node_resources["table"])

        out = jnp.where(mask & audible, wave, 0.0).astype(jnp.float32)
        return {"phase": carry}, [out[None, :]]


class OscillatorNode(AudioScheduledSourceNode):
    _number_of_inputs = 0
    _number_of_outputs = 1

    def __init__(self, context, type: str = "sine", frequency: float = 440.0,
                 detune: float = 0.0, periodic_wave: PeriodicWave | None = None):
        super().__init__(context)
        fs = context.sample_rate
        self.frequency = self._register_param(
            "frequency",
            AudioParamDescriptor(
                name="frequency", automation_rate=AutomationRate.A,
                default_value=440.0, min_value=-fs / 2, max_value=fs / 2))
        self.detune = self._register_param(
            "detune",
            AudioParamDescriptor(
                name="detune", automation_rate=AutomationRate.A,
                default_value=0.0, min_value=-153600.0, max_value=153600.0))
        if frequency != 440.0:
            self.frequency.set_value(frequency)
        if detune != 0.0:
            self.detune.set_value(detune)
        self._periodic_wave = periodic_wave
        if periodic_wave is not None:
            self._type = OscillatorType.CUSTOM
        else:
            self._type = OscillatorType(type)

    @property
    def type(self) -> OscillatorType:
        return self._type

    @type.setter
    def type(self, t):
        self.set_type(t)

    def set_type(self, t):
        t = OscillatorType(t)
        # [spec] setting type on a custom oscillator is not allowed
        if self._type == OscillatorType.CUSTOM:
            if t != OscillatorType.CUSTOM:
                raise InvalidStateError(
                    "cannot change oscillator type when a custom periodic wave is set")
            return
        if t == OscillatorType.CUSTOM:
            raise InvalidStateError(
                "set a PeriodicWave via set_periodic_wave to use a custom type")
        self._type = t
        self.context._invalidate_graph_cache()

    def set_periodic_wave(self, wave: PeriodicWave):
        self._periodic_wave = wave
        self._type = OscillatorType.CUSTOM
        self.context._invalidate_graph_cache()

    def output_channel_count(self, input_counts):
        return [1]

    def make_kernel(self, render_ctx):
        start, stop = self._schedule_frames(render_ctx.sample_rate)
        table = None
        if self._type == OscillatorType.CUSTOM:
            table = self._periodic_wave.as_array()
        const_freq = None
        plans = render_ctx.param_plans
        if plans and plans["frequency"].is_constant and plans["detune"].is_constant:
            f = np.float32(min(max(plans["frequency"].scalar,
                                   self.frequency.min_value),
                               self.frequency.max_value))
            d = np.float32(min(max(plans["detune"].scalar,
                                   self.detune.min_value),
                               self.detune.max_value))
            const_freq = float(np.float32(f * np.exp2(d / np.float32(1200.0))))
        return _OscillatorKernel(self._type, table, start, stop,
                                 self._start_time, render_ctx.sample_rate,
                                 const_freq=const_freq)
