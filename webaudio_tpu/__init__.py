"""webaudio_tpu — a TPU-native batch/offline audio rendering engine.

A ground-up re-design of the Web Audio API (capabilities of
orottier/web-audio-api-rs, mounted at /root/reference) for TPU hardware:

- node topologies are traced and compiled into a single XLA computation
  (instead of a per-128-frame interpreted render thread);
- long renders run as `lax.scan` over large blocks with functional state;
- AudioParam automation timelines are precompiled into dense on-device
  tensors;
- recursive filters become truncated-IR FFT convolutions (LTI case) or
  associative scans (time-varying case);
- batches of independent graphs vmap/shard over device meshes.

Public API mirrors the reference crate: contexts, `create_*` factories,
`connect` / `start`, AudioParam automation methods.
"""

import os as _os

import jax as _jax

# f64 is used for host-side time math and small per-voice scalar carries
# (phase accumulators); audio tensors are always explicit f32.
_jax.config.update("jax_enable_x64", True)


def _enable_persistent_compile_cache():
    """Point JAX's persistent compilation cache at a writable directory.

    Cold compiles on the tunneled TPU backend run 4-400 s per program
    (benches/RESULTS_v5e.jsonl `compile_seconds`); the persistent cache
    makes every later process that compiles an identical program hit disk
    instead.  Opt out (or redirect) with WEBAUDIO_COMPILE_CACHE=0|<dir>.
    Failures (read-only fs, backend refusing executable serialization)
    degrade to uncached compiles, never to errors."""
    pref = _os.environ.get("WEBAUDIO_COMPILE_CACHE", "")
    if pref == "0":
        return
    # CPU-only sessions (the test harness) skip the cache unless
    # explicitly pointed at a directory: XLA:CPU persists AOT executables
    # specialized to the compiling host's CPU flags, and reloading them on
    # a heterogeneous fleet risks SIGILL.  The win is the tunneled-TPU
    # remote compile path anyway.
    try:
        plats = (_jax.config.jax_platforms
                 or _os.environ.get("JAX_PLATFORMS", "") or "")
    except AttributeError:  # pragma: no cover - very old jax
        plats = _os.environ.get("JAX_PLATFORMS", "")
    if not pref and plats.strip().lower() == "cpu":
        return
    cache_dir = pref or _os.path.join(
        _os.path.expanduser("~"), ".cache", "webaudio_tpu", "xla_cache")
    try:
        _os.makedirs(cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything: even "fast" local compiles are expensive
        # through the tunnel's serialized remote-compile path
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_persistent_compile_cache()

from .constants import (  # noqa: F401,E402
    RENDER_QUANTUM_SIZE, MAX_CHANNELS,
    WebAudioError, NotSupportedError, IndexSizeError, InvalidStateError,
    InvalidAccessError, RangeError,
)
from .buffer import AudioBuffer  # noqa: F401,E402
from .param import AudioParam, AudioParamDescriptor, AutomationRate  # noqa: F401,E402
from .periodic_wave import PeriodicWave  # noqa: F401,E402
from .ops.mixing import ChannelCountMode, ChannelInterpretation  # noqa: F401,E402
from .context.base import BaseAudioContext, AudioContextState  # noqa: F401,E402
from .context.offline import OfflineAudioContext  # noqa: F401,E402

__version__ = "0.1.0"

_LAZY = {
    "AudioContext": ("webaudio_tpu.context.online", "AudioContext"),
    "AudioContextOptions": ("webaudio_tpu.context.online", "AudioContextOptions"),
    "AudioWorkletNode": ("webaudio_tpu.worklet", "AudioWorkletNode"),
    "AudioWorkletProcessor": ("webaudio_tpu.worklet", "AudioWorkletProcessor"),
    "MessagePort": ("webaudio_tpu.worklet", "MessagePort"),
    "MediaStream": ("webaudio_tpu.media.streams", "MediaStream"),
    "MediaStreamTrack": ("webaudio_tpu.media.streams", "MediaStreamTrack"),
    "MediaRecorder": ("webaudio_tpu.media.recorder", "MediaRecorder"),
    "MediaElement": ("webaudio_tpu.media.element", "MediaElement"),
    "MediaDecoder": ("webaudio_tpu.media.decoding", "MediaDecoder"),
    "enumerate_devices_sync": ("webaudio_tpu.media.devices", "enumerate_devices_sync"),
    "get_user_media_sync": ("webaudio_tpu.media.devices", "get_user_media_sync"),
    "MediaTrackConstraints": ("webaudio_tpu.media.devices", "MediaTrackConstraints"),
    "MediaDeviceInfo": ("webaudio_tpu.media.devices", "MediaDeviceInfo"),
    "EventType": ("webaudio_tpu.events", "EventType"),
    "AudioRenderCapacityEvent": ("webaudio_tpu.stats", "AudioRenderCapacityEvent"),
    "GraphBatch": ("webaudio_tpu.parallel.batch", "GraphBatch"),
    "MixedGraphBatch": ("webaudio_tpu.parallel.batch", "MixedGraphBatch"),
    "render_time_sharded": ("webaudio_tpu.parallel.segments", "render_time_sharded"),
    "RenderSession": ("webaudio_tpu.checkpoint", "RenderSession"),
    "OscillatorBankNode": ("webaudio_tpu.nodes.oscillator_bank", "OscillatorBankNode"),
}


def __getattr__(name):
    # lazy imports for heavier submodules
    if name in _LAZY:
        import importlib

        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
