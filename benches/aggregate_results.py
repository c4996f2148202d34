"""Merge the per-session suite logs (benches/runs_r*/final_*.jsonl) into
the committed RESULTS file.

Only `final_*.jsonl` sessions aggregate (identical final code); earlier
session*.jsonl files are archived intermediates from in-flight
optimization states.  Each session runs every case in one process
(benches/run_tpu_r5.py); per-case numbers are medians of >=3 fenced
trials within the session.  Sessions drift ±20-60% with remote-service
health, so the committed value is the MEDIAN across session medians and
the artifact carries every observed trial (`all_runs`) plus the spread —
the number cannot be quoted rosier than the range.  `value_ss25` /
`all_ss25` aggregate the 25-deep steady-state trials the same way (the
end-of-trial fence costs a fixed ~25-30 ms tunnel readback RTT
regardless of depth, so the 5-deep `value` carries a ~5 ms/render
measurement artifact and the deep-pipeline number is the honest on-chip
throughput).

SESSION-HEALTH GATE (round 5, VERDICT r4 item 1a): sessions carrying a
`session_health` record with healthy=false are EXCLUDED from medians —
their rows stay in the committed runs_* logs, and the gating decision is
written into the output's leading `_meta` record so it is auditable.
Sessions predating the gate are inferred from their batched_graphs
canary (the sharpest discriminator: 9,087-11,240x healthy vs 3,930x in
the degraded r4 final_s8).

Usage: python benches/aggregate_results.py [outfile] [runs_dir ...]
"""

import glob
import json
import os
import sys

CANARY_MIN = 6000.0  # 60% of the healthy r4 batched median (VERDICT 1a)


def session_health(records) -> bool:
    """True if the session is usable for aggregation."""
    hs = [r for r in records if r.get("stage") == "session_health"]
    if hs:
        return all(r.get("healthy") for r in hs)
    # legacy session (no gate): infer from the untagged batched canary
    for r in records:
        if r.get("case") in ("batched_graphs", "canary_batched:start") \
                and r.get("value") is not None:
            return r["value"] >= CANARY_MIN
    return True


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    out_path = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(here, "RESULTS_v5e.jsonl")
    runs_dirs = sys.argv[2:] or ["runs_r05"]
    sessions = []
    for d in runs_dirs:
        sessions += sorted(glob.glob(os.path.join(here, d, "final_*.jsonl")))

    by_case: dict = {}
    order: list = []
    used, degraded, empty = [], [], []
    for path in sessions:
        with open(path) as f:
            records = [json.loads(line) for line in f if line.strip()]
        name = os.path.relpath(path, here)
        if not any(r.get("case") for r in records):
            empty.append(name)
            continue
        if not session_health(records):
            degraded.append(name)
            continue
        used.append(name)
        for rec in records:
            case = rec.get("case") or rec.get("stage")
            if case is None or "error" in rec:
                continue
            by_case.setdefault(case, []).append(rec)
            if case not in order:
                order.append(case)

    lines = [json.dumps({
        "_meta": "aggregate", "sessions_used": used,
        "sessions_degraded_excluded": degraded, "sessions_empty": empty,
        "canary_min": CANARY_MIN,
    })]
    for case in order:
        recs = by_case[case]
        if case in ("warmup", "pallas_smoke", "session_health"):
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
    print(f"wrote {out_path}: {len(lines) - 1} cases from "
          f"{len(used)} healthy sessions "
          f"(excluded degraded: {degraded or 'none'}; empty: {empty or 'none'})")


if __name__ == "__main__":
    main()
