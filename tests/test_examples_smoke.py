"""Opt-in smoke run of the examples/ directory (the reference keeps its
examples compiling via `cargo check --examples`; this is the analog).

Default-off because the full sweep costs ~15 CPU-minutes (a-rate biquad
sweeps compile f64 associative scans per filter type).  Enable with
WEBAUDIO_TEST_EXAMPLES=1; each example runs in a subprocess on CPU
(examples/_common.py forces the platform) and must exit 0.

    WEBAUDIO_TEST_EXAMPLES=1 python -m pytest tests/test_examples_smoke.py -q
"""

import os
import subprocess
import sys

import pytest

EXAMPLES_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")

# excluded from the sweep: benchmarks.py (a bench driver, minutes-long),
# roundtrip_latency_test.py + toy_webrtc.py (interactive / socket loops)
SKIP = {"benchmarks.py", "roundtrip_latency_test.py", "toy_webrtc.py",
        "_common.py"}

EXAMPLES = sorted(
    f for f in os.listdir(EXAMPLES_DIR)
    if f.endswith(".py") and f not in SKIP)


@pytest.mark.skipif(os.environ.get("WEBAUDIO_TEST_EXAMPLES") != "1",
                    reason="set WEBAUDIO_TEST_EXAMPLES=1 to run the sweep")
@pytest.mark.parametrize("name", EXAMPLES)
def test_example_runs(name):
    env = dict(os.environ, WEBAUDIO_PLATFORM="cpu")
    proc = subprocess.run(
        [sys.executable, name], cwd=EXAMPLES_DIR, env=env,
        capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (
        f"{name} exited {proc.returncode}\n--- stdout ---\n"
        f"{proc.stdout[-2000:]}\n--- stderr ---\n{proc.stderr[-2000:]}")
