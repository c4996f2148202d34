"""PannerNode + AudioListener: 3D spatialization (equal-power model).

reference: src/node/panner.rs + src/spatial.rs.  The per-sample zip over 15
spatial params (panner.rs:729-779) becomes one vectorized geometry pipeline
over the block: azimuth/elevation from the listener frame
(spatial.rs:205-270), linear/inverse/exponential distance models
(panner.rs:955-985), cone gain (panner.rs:927-953), equal-power mono/stereo
ear gains (panner.rs:988-1055) — all branchless `where` selects.

The AudioListener is a registered hidden node holding 9 AudioParams
(reference: spatial.rs:34-45, node ids 1..=10); panners subscribe to them
via the compiler's foreign-params channel.  The HRTF panning model is
implemented in hrtf.py (HRIR gather + partitioned convolution).
"""

from __future__ import annotations

import math
from enum import Enum

import numpy as np
import jax.numpy as jnp

from ..constants import NotSupportedError, InvalidStateError
from ..graph.compiler import Kernel
from ..ops.mixing import ChannelCountMode
from ..param import AudioParamDescriptor, AutomationRate
from .audio_node import AudioNode, ChannelConfig


class PanningModelType(str, Enum):
    EQUAL_POWER = "equalpower"
    HRTF = "HRTF"


class DistanceModelType(str, Enum):
    LINEAR = "linear"
    INVERSE = "inverse"
    EXPONENTIAL = "exponential"


_FMAX = 3.4028235e38


class AudioListener(AudioNode):
    """Hidden node owning the 9 listener params
    (reference: spatial.rs:34-45)."""

    _number_of_inputs = 0
    _number_of_outputs = 1

    def __init__(self, context):
        super().__init__(context)
        mk = lambda name, dv: self._register_param(
            name, AudioParamDescriptor(
                name=name, automation_rate=AutomationRate.A,
                default_value=dv, min_value=-_FMAX, max_value=_FMAX))
        self.position_x = mk("position_x", 0.0)
        self.position_y = mk("position_y", 0.0)
        self.position_z = mk("position_z", 0.0)
        self.forward_x = mk("forward_x", 0.0)
        self.forward_y = mk("forward_y", 0.0)
        self.forward_z = mk("forward_z", -1.0)
        self.up_x = mk("up_x", 0.0)
        self.up_y = mk("up_y", 1.0)
        self.up_z = mk("up_z", 0.0)

    def output_channel_count(self, input_counts):
        return [1]

    def make_kernel(self, render_ctx):
        class _Noop(Kernel):
            def tail_frames(self):
                return 0

            def process(self, scope, state, inputs, params):
                return state, [jnp.zeros((1, scope.frames), jnp.float32)]

        return _Noop()


# --- vectorized spatial math (spatial.rs ports) ----------------------------

def _normalize(v, eps=0.0):
    n2 = v[0] ** 2 + v[1] ** 2 + v[2] ** 2
    inv = jnp.where(n2 > 0.0, 1.0 / jnp.sqrt(jnp.maximum(n2, 1e-38)), 0.0)
    return [v[0] * inv, v[1] * inv, v[2] * inv], n2


def _cross(a, b):
    return [a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0]]


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def azimuth_elevation(sp, lp, lf, lu):
    """Vectorized port of spatial.rs:205-270.  All args are length-3 lists
    of () or (B,) f32 arrays; returns (azimuth, elevation) in degrees."""
    rel = [sp[i] - lp[i] for i in range(3)]
    rel_len2 = rel[0] ** 2 + rel[1] ** 2 + rel[2] ** 2
    degenerate = rel_len2 <= np.float32(1.17549435e-38)

    sl, _ = _normalize(rel)
    lright = _cross(lf, lu)
    lright_norm, lright_len2 = _normalize(lright)
    no_right = lright_len2 == 0.0
    lforward_norm, _ = _normalize(lf)
    up = _cross(lright_norm, lforward_norm)

    dot_up = jnp.clip(_dot(sl, up), -1.0, 1.0)
    elevation = 90.0 - 180.0 * jnp.arccos(dot_up) / np.pi
    elevation = jnp.where(elevation > 90.0, 180.0 - elevation, elevation)
    elevation = jnp.where(elevation < -90.0, -180.0 - elevation, elevation)

    proj = [sl[i] - up[i] * dot_up for i in range(3)]
    proj_norm, proj_len2 = _normalize(proj)
    proj_zero = proj_len2 == 0.0

    dot_right = jnp.clip(_dot(proj_norm, lright_norm), -1.0, 1.0)
    azimuth = 180.0 * jnp.arccos(dot_right) / np.pi
    front_back = _dot(proj_norm, lforward_norm)
    azimuth = jnp.where(front_back < 0.0, 360.0 - azimuth, azimuth)
    azimuth = jnp.where((azimuth >= 0.0) & (azimuth <= 270.0),
                        90.0 - azimuth, 450.0 - azimuth)

    azimuth = jnp.where(degenerate | no_right | proj_zero, 0.0, azimuth)
    elevation = jnp.where(degenerate | no_right,
                          0.0, jnp.where(proj_zero, elevation, elevation))
    elevation = jnp.where(degenerate | no_right, 0.0, elevation)
    return azimuth, elevation


def source_listener_angle(sp, so, lp):
    """Vectorized port of spatial.rs:278-300 (degrees, absolute)."""
    so_norm, so_len2 = _normalize(so)
    rel = [sp[i] - lp[i] for i in range(3)]
    rel_len2 = rel[0] ** 2 + rel[1] ** 2 + rel[2] ** 2
    sl, _ = _normalize(rel)
    d = jnp.clip(_dot(sl, so_norm), -1.0, 1.0)
    ang = jnp.abs(180.0 * jnp.arccos(d) / np.pi)
    return jnp.where((so_len2 == 0.0) |
                     (rel_len2 <= np.float32(1.17549435e-38)), 0.0, ang)


def spatial_gains(node: "PannerNode", params):
    """Shared spatial pipeline for both panning models: returns
    (azimuth_deg, elevation_deg, dist_gain * cone_gain) from the node's
    distance/cone settings and the (own + foreign listener) params.
    reference: panner.rs:927-985 + spatial.rs."""
    n = node
    sp = [params["position_x"], params["position_y"], params["position_z"]]
    so = [params["orientation_x"], params["orientation_y"],
          params["orientation_z"]]
    lp = [params["l_position_x"], params["l_position_y"],
          params["l_position_z"]]
    lf = [params["l_forward_x"], params["l_forward_y"], params["l_forward_z"]]
    lu = [params["l_up_x"], params["l_up_y"], params["l_up_z"]]

    azimuth, elevation = azimuth_elevation(sp, lp, lf, lu)

    # distance gain (panner.rs:955-985), f64 in reference -> f32 here
    dist = jnp.sqrt((sp[0] - lp[0]) ** 2 + (sp[1] - lp[1]) ** 2
                    + (sp[2] - lp[2]) ** 2)
    ref_d = n.ref_distance
    if n.distance_model == DistanceModelType.LINEAR:
        rolloff = min(max(n.rolloff_factor, 0.0), 1.0)
        d2ref = min(ref_d, n.max_distance)
        d2max = max(ref_d, n.max_distance)
        dcl = jnp.clip(dist, d2ref, d2max)
        dist_gain = 1.0 - rolloff * (dcl - d2ref) / (d2max - d2ref)
    elif n.distance_model == DistanceModelType.INVERSE:
        rolloff = max(n.rolloff_factor, 0.0)
        dist_gain = jnp.where(
            dist > 0.0,
            ref_d / (ref_d + rolloff * (jnp.maximum(dist, ref_d) - ref_d)),
            1.0)
    else:
        rolloff = max(n.rolloff_factor, 0.0)
        dist_gain = (jnp.maximum(dist, ref_d) / ref_d) ** (-rolloff)

    # cone gain (panner.rs:927-953)
    abs_inner = abs(n.cone_inner_angle) / 2.0
    abs_outer = abs(n.cone_outer_angle) / 2.0
    if abs_inner >= 180.0 and abs_outer >= 180.0:
        cone_gain = jnp.ones_like(dist_gain)
    else:
        ang = source_listener_angle(sp, so, lp)
        span = max(abs_outer - abs_inner, 1e-20)
        t = (ang - abs_inner) / span
        mid = (1.0 - t) + n.cone_outer_gain * t
        cone_gain = jnp.where(ang < abs_inner, 1.0,
                              jnp.where(ang >= abs_outer,
                                        n.cone_outer_gain, mid))
    return azimuth, elevation, dist_gain * cone_gain


class _EqualPowerPannerKernel(Kernel):
    def __init__(self, node: "PannerNode", mono_input: bool):
        self.n = node
        self.mono_input = mono_input

    def tail_frames(self):
        return 0

    def process(self, scope, state, inputs, params):
        x = inputs[0]
        azimuth, _elev, g = spatial_gains(self.n, params)

        # ear gains (panner.rs:988-1055)
        az = jnp.clip(azimuth, -180.0, 180.0)
        az = jnp.where(az < -90.0, -180.0 - az,
                       jnp.where(az > 90.0, 180.0 - az, az))
        half_pi = np.float32(np.pi / 2.0)
        if self.mono_input:
            xx = (az + 90.0) / 180.0
            gl = jnp.cos(xx * half_pi)
            gr = jnp.sin(xx * half_pi)
            mono = x[0]
            out = jnp.stack([mono * gl * g, mono * gr * g])
        else:
            xx = jnp.where(az <= 0.0, (az + 90.0) / 90.0, az / 90.0)
            gl = jnp.cos(xx * half_pi)
            gr = jnp.sin(xx * half_pi)
            il, ir = x[0], x[1]
            left = jnp.where(az <= 0.0, il + ir * gl, il * gl)
            right = jnp.where(az <= 0.0, ir * gr, ir + il * gr)
            out = jnp.stack([left * g, right * g])
        return state, [out.astype(jnp.float32)]


class PannerNode(AudioNode):
    _number_of_inputs = 1
    _number_of_outputs = 1

    def __init__(self, context, panning_model: str = "equalpower",
                 distance_model: str = "inverse",
                 position_x: float = 0.0, position_y: float = 0.0,
                 position_z: float = 0.0, orientation_x: float = 1.0,
                 orientation_y: float = 0.0, orientation_z: float = 0.0,
                 ref_distance: float = 1.0, max_distance: float = 10000.0,
                 rolloff_factor: float = 1.0, cone_inner_angle: float = 360.0,
                 cone_outer_angle: float = 360.0, cone_outer_gain: float = 0.0,
                 **options):
        cfg = ChannelConfig(count=2, mode=ChannelCountMode.CLAMPED_MAX)
        super().__init__(context, channel_config=cfg)
        fs = context.sample_rate
        mk = lambda name, dv, rate=AutomationRate.A: self._register_param(
            name, AudioParamDescriptor(
                name=name, automation_rate=rate,
                default_value=dv, min_value=-_FMAX, max_value=_FMAX))
        self.position_x = mk("position_x", 0.0)
        self.position_y = mk("position_y", 0.0)
        self.position_z = mk("position_z", 0.0)
        self.orientation_x = mk("orientation_x", 1.0)
        self.orientation_y = mk("orientation_y", 0.0)
        self.orientation_z = mk("orientation_z", 0.0)
        for name, v in (("position_x", position_x), ("position_y", position_y),
                        ("position_z", position_z),
                        ("orientation_x", orientation_x),
                        ("orientation_y", orientation_y),
                        ("orientation_z", orientation_z)):
            if getattr(self, name).default_value != v:
                getattr(self, name).set_value(v)

        self._panning_model = PanningModelType(panning_model)
        self.distance_model = DistanceModelType(distance_model)
        if ref_distance < 0:
            raise RuntimeError("RangeError - refDistance must be non-negative")
        if max_distance <= 0:
            raise RuntimeError("RangeError - maxDistance must be positive")
        if rolloff_factor < 0:
            raise RuntimeError("RangeError - rolloffFactor must be non-negative")
        if not (0.0 <= cone_outer_gain <= 1.0):
            raise InvalidStateError("coneOuterGain must be in [0, 1]")
        self.ref_distance = float(ref_distance)
        self.max_distance = float(max_distance)
        self.rolloff_factor = float(rolloff_factor)
        self.cone_inner_angle = float(cone_inner_angle)
        self.cone_outer_angle = float(cone_outer_angle)
        self.cone_outer_gain = float(cone_outer_gain)
        # instantiate the listener (and its params) on first panner
        context.listener

    @property
    def panning_model(self) -> PanningModelType:
        return self._panning_model

    @panning_model.setter
    def panning_model(self, v):
        self._panning_model = PanningModelType(v)
        self.context._invalidate_graph_cache()

    def set_position(self, x: float, y: float, z: float):
        self.position_x.set_value(x)
        self.position_y.set_value(y)
        self.position_z.set_value(z)

    def set_orientation(self, x: float, y: float, z: float):
        self.orientation_x.set_value(x)
        self.orientation_y.set_value(y)
        self.orientation_z.set_value(z)

    def _validate_channel_count(self, count: int):
        if count > 2:
            raise NotSupportedError(
                "PannerNode channel count cannot be greater than two")

    def _validate_channel_count_mode(self, mode: ChannelCountMode):
        if mode == ChannelCountMode.MAX:
            raise NotSupportedError(
                "PannerNode channel count mode cannot be set to max")

    def foreign_params(self):
        l = self.context.listener
        return {
            "l_position_x": (l, "position_x"),
            "l_position_y": (l, "position_y"),
            "l_position_z": (l, "position_z"),
            "l_forward_x": (l, "forward_x"),
            "l_forward_y": (l, "forward_y"),
            "l_forward_z": (l, "forward_z"),
            "l_up_x": (l, "up_x"),
            "l_up_y": (l, "up_y"),
            "l_up_z": (l, "up_z"),
        }

    def output_channel_count(self, input_counts):
        return [2]

    def make_kernel(self, render_ctx):
        mono = render_ctx.input_channel_counts[0] == 1
        if self._panning_model == PanningModelType.HRTF:
            from .hrtf import HrtfPannerKernel

            return HrtfPannerKernel(self, render_ctx)
        return _EqualPowerPannerKernel(self, mono)
