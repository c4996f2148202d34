"""Merge the per-session suite logs (benches/runs_r{N}/*.jsonl) into the
committed RESULTS file.

Only `final_*.jsonl` sessions aggregate (identical final code); earlier
session*.jsonl files are archived intermediates from in-flight
optimization states.  Each session runs every case in one process
(benches/run_tpu_r4.py);
per-case numbers are medians of >=3 fenced trials within the session.
Sessions drift ±20-60% with remote-service health, so the committed
value is the MEDIAN across session medians and the artifact carries
every observed trial (`all_runs`) plus the spread — the number cannot be
quoted rosier than the range.  `value_ss25` / `all_ss25` aggregate the
25-deep steady-state trials the same way (r4 protocol: the end-of-trial
fence costs a fixed ~25-30 ms tunnel readback RTT regardless of depth,
so the 5-deep `value` carries a ~5 ms/render measurement artifact and
the deep-pipeline number is the honest on-chip throughput).

Usage: python benches/aggregate_results.py [outfile] [runs_dir]
"""

import glob
import json
import os
import sys


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    out_path = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(here, "RESULTS_v5e.jsonl")
    runs_dir = sys.argv[2] if len(sys.argv) > 2 else "runs_r04"
    by_case: dict = {}
    order: list = []
    s = os.path.join(here, runs_dir, "final_*.jsonl")
    sessions = sorted(glob.glob(s))
    for path in sessions:
        with open(path) as f:
            for line in f:
                rec = json.loads(line)
                case = rec.get("case") or rec.get("stage")
                if case is None or "error" in rec:
                    continue
                by_case.setdefault(case, []).append(rec)
                if case not in order:
                    order.append(case)

    lines = []
    for case in order:
        recs = by_case[case]
        if case in ("warmup", "pallas_smoke"):
            continue
        vals = sorted(r["value"] for r in recs if r.get("value") is not None)
        if not vals:
            continue
        med = vals[len(vals) // 2]
        # keep the (median-session) record's roofline fields
        best = min(recs, key=lambda r: abs((r.get("value") or 0) - med))
        rec = dict(best)
        all_runs = sorted(
            x for r in recs for x in (r.get("runs") or [r["value"]]))
        rec["value"] = med
        rec["sessions"] = len(vals)
        rec["all_runs"] = [round(x, 1) for x in all_runs]
        rec["spread_pct"] = round(
            100.0 * (all_runs[-1] - all_runs[0]) / med, 1) if med else None
        all_ss = sorted(
            x for r in recs for x in (r.get("ss25_runs") or []))
        if all_ss:
            rec["value_ss25"] = round(all_ss[len(all_ss) // 2], 1)
            rec["all_ss25"] = [round(x, 1) for x in all_ss]
        rec.pop("runs", None)
        rec.pop("ss25_runs", None)
        lines.append(json.dumps(rec))
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_path} ({len(lines)} cases from "
          f"{len(sessions)} sessions)")


if __name__ == "__main__":
    main()
