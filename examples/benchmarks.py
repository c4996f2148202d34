"""Speedup-vs-realtime harness (reference: examples/benchmarks.rs — the
padenot/webaudio-benchmark port that prints how many times faster than
realtime each workload renders).

Run on the TPU:   python examples/benchmarks.py
Run on CPU:       WEBAUDIO_PLATFORM=cpu python examples/benchmarks.py
"""
import _common  # noqa: F401
import json
import subprocess
import sys
import os

HERE = os.path.dirname(os.path.abspath(__file__))
SUITE = os.path.join(os.path.dirname(HERE), "benches", "suite.py")

print(f"{'benchmark':32s} {'speedup vs realtime':>20s}")
print("-" * 54)
# each case in its own process: one TPU client at a time + clean dispatch
for case in ("buffer_biquad", "many_oscillators_fused", "convolution_reverb",
             "hrtf_moving", "mastering_chain", "stereo_pan_automation",
             "iir_chain", "delay_network"):
    out = subprocess.run([sys.executable, "-u", SUITE, case],
                         capture_output=True, text=True, timeout=900)
    for line in out.stdout.splitlines():
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "value" in rec:
            print(f"{rec['case']:32s} {rec['value']:>18.1f}x")
        else:
            print(f"{rec['case']:32s} {'ERROR':>19s}")
