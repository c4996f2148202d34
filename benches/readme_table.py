"""Render the README performance table from benches/RESULTS_v5e.jsonl.

Usage: python benches/readme_table.py
Prints markdown rows: case | 5-deep median [range] | steady-state (25-deep)
median [range].  Keeps number provenance mechanical — the README quotes
exactly what the aggregator wrote.
"""

import json
import os

LABELS = {
    "buffer_biquad": "sample.wav → biquad lowpass (BASELINE config 1, `bench.py`)",
    "many_oscillators": "500 oscillators + ADSR envelopes (1001-node graph, auto-fused)",
    "many_oscillators_fused": "500-voice fused oscillator bank (config 2)",
    "convolution_reverb": "convolution reverb, 3.7 s IR + feedback delay (config 3, two-rate compiled)",
    "hrtf_moving": "HRTF panner, moving listener (config 4)",
    "mastering_chain": "mastering chain: 4× waveshaper → compressor → analyser (config 5, pallas3 curve)",
    "stereo_pan_automation": "stereo pan a-rate automation",
    "iir_chain": "order-4 IIR chain",
    "delay_network": "feedback delay network (cyclic, two-rate compiled)",
    "granular_grains": "granular synthesis, 400 enveloped grains (auto-fused, aligned lane-packed)",
    "granular_grains_800": "granular synthesis, 800 grains (2× density)",
}


def fmt(v):
    return f"{v:,.0f}×"


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    rows = []
    with open(os.path.join(here, "RESULTS_v5e.jsonl")) as f:
        for line in f:
            rows.append(json.loads(line))
    for r in rows:
        case = r.get("case")
        if case not in LABELS:
            continue
        runs = r.get("all_runs") or []
        ss = r.get("all_ss25") or []
        col1 = f"**{fmt(r['value'])}**"
        if runs:
            col1 += f" [{runs[0]:,.0f}–{runs[-1]:,.0f}]"
        col2 = "—"
        if r.get("value_ss25"):
            col2 = f"**{fmt(r['value_ss25'])}**"
            if ss:
                col2 += f" [{ss[0]:,.0f}–{ss[-1]:,.0f}]"
        print(f"| {LABELS[case]} | {col1} | {col2} |")
    for r in rows:
        if not r.get("case"):
            continue
        if r["case"].startswith("batched") or r["case"] == "mixed_corpus":
            print(f"| {r['case']} | {json.dumps({k: v for k, v in r.items() if k not in ('all_runs', 'all_ss25')})} |")


if __name__ == "__main__":
    main()
