#!/usr/bin/env python3
"""Per-key bench regression harness.

Diffs a fresh BENCH_FULL.json against the standing BASELINE.md round row,
flags keys slower than REGRESS_RATIO x baseline, re-times each flagged key
in isolation via graft.tools.BenchOne (steady-state min over reps, its own
JVM — the documented answer to this VM's CPU-steal stalls), measures
/proc/stat steal around the whole run, and emits a verdict JSON:

    python3 scripts/bench_regress.py BENCH_FULL.json BENCH_REGRESS_r5.json \
        [--baseline r4] [--sf /root/testdata/sf0.1] [--ratio 2.0] [--no-rerun]

Verdicts per flagged key:
  noise      — isolated rerun lands back under the ratio (microVM stall)
  regression — isolated rerun confirms the slowdown (real plan/code cost)
Keys new since the baseline row are listed, never flagged.
"""
import argparse
import json
import re
import subprocess
import sys

ABS_FLOOR_SEC = 0.25  # ratio on a 0.1 s key is noise by construction
# Slow-drift alarm: current vs the key's calibration-normalized history
# median. Bench's calib_sec key (a fixed pure-CPU loop) rescales every
# history row to the current host's speed, so the tight band doesn't
# false-positive on ambient VM drift. The calib rollout is COMPLETE:
# every key that ever appeared in a pre-calib row now has >= 4
# calibrated rows (verified r10), so uncalibrated legacy rows are
# simply ignored and the legacy slack ratio is deleted. New history
# rows are REQUIRED to carry calib_sec; a bench run without one is
# diffed but never recorded.
DRIFT_RATIO = 1.15
QUIET_STEAL_MAX = 500  # jiffies; noisier runs are diffed but not recorded


def read_steal():
    with open("/proc/stat") as f:
        for line in f:
            if line.startswith("cpu "):
                return int(line.split()[8])
    return 0


def baseline_row(md_path, label):
    """Extract the per-query JSON from the BASELINE.md row labeled `label`."""
    with open(md_path) as f:
        for line in f:
            m = re.match(r"\|\s*%s\s*\|" % re.escape(label), line)
            if m:
                j = re.search(r"`(\{.*\})`", line)
                if j:
                    return json.loads(j.group(1))
    raise SystemExit(f"no row labeled {label!r} with a JSON cell in {md_path}")


def benchone(keys, sf, reps):
    """One sbt invocation, one BenchOne JVM per key; returns key -> min sec."""
    cmds = [f"runMain graft.tools.BenchOne {k} {sf} {reps}" for k in keys]
    out = subprocess.run(
        ["sbt", "-batch"] + cmds, capture_output=True, text=True,
        env={**__import__("os").environ, "SPARK_GRAFT_CPUS": "32"}).stdout
    best = {}
    for m in re.finditer(r"\[benchone\] (\S+) rep\d+: ([0-9.]+) s", out):
        k, sec = m.group(1), float(m.group(2))
        best[k] = min(best.get(k, sec), sec)
    return best


def drift_check(history_path, cur, label):
    """Append this run to the history JSONL and flag slow drifts.

    The 2x single-round ratio misses a key that gains 25% every round;
    comparing against the MEDIAN of all recorded rounds catches the
    compounding. Steal-polluted runs (steal_jiffies > QUIET_STEAL_MAX)
    are diffed but NOT appended, so host noise can't poison the
    history median; reading tolerates a missing file.
    """
    hist = []
    try:
        with open(history_path) as f:
            hist = [json.loads(line) for line in f if line.strip()]
    except FileNotFoundError:
        pass
    drifts = []
    cur_calib = cur.get("calib_sec")
    for k, sec in cur["queries"].items():
        # rescale each calibrated history row to the CURRENT host's
        # measured speed (row_sec * cur_calib / row_calib); pre-calib
        # legacy rows are ignored (rollout complete — see header note)
        past = sorted(
            h["queries"][k] * cur_calib / h["calib_sec"]
            for h in hist
            if k in h.get("queries", {}) and cur_calib and h.get("calib_sec"))
        if len(past) >= 2 and sec > ABS_FLOOR_SEC:
            mid = len(past) // 2
            med = (past[mid] if len(past) % 2 == 1
                   else (past[mid - 1] + past[mid]) / 2.0)
            if med > 0 and sec > DRIFT_RATIO * med:
                drifts.append({"key": k, "history_median_sec": round(med, 3),
                               "run_sec": sec,
                               "ratio": round(sec / med, 2),
                               "ratio_bound": DRIFT_RATIO,
                               "calib_normalized": True,
                               "n_history_rounds": len(past)})
    steal = cur.get("steal_jiffies")
    if cur_calib is None:
        print("history: run has no calib_sec — diffed but NOT recorded",
              file=sys.stderr)
    elif steal is None or steal <= QUIET_STEAL_MAX:
        with open(history_path, "a") as f:
            f.write(json.dumps({"label": label, "total": cur.get("total"),
                                "steal_jiffies": steal,
                                "calib_sec": cur_calib,
                                "queries": cur["queries"]}) + "\n")
    return drifts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("bench_json")
    ap.add_argument("out_json")
    ap.add_argument("--baseline", default="r4")
    ap.add_argument("--baseline-md", default="BASELINE.md")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--ratio", type=float, default=2.0)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--history", default="BENCH_HISTORY.jsonl",
                    help="per-round per-key history JSONL (append + drift check)")
    ap.add_argument("--label", default="",
                    help="history entry label, e.g. r5")
    ap.add_argument("--no-rerun", action="store_true",
                    help="diff only; skip the BenchOne isolation pass")
    args = ap.parse_args()

    cur = json.load(open(args.bench_json))
    base = baseline_row(args.baseline_md, args.baseline)
    curq = cur["queries"]

    flagged = []
    for k, sec in sorted(curq.items()):
        if k not in base:
            continue
        if sec > args.ratio * base[k] and sec > ABS_FLOOR_SEC:
            flagged.append({"key": k, "baseline_sec": base[k], "run_sec": sec,
                            "run_ratio": round(sec / base[k], 2)})

    steal0 = read_steal()
    if flagged and not args.no_rerun:
        best = benchone([f["key"] for f in flagged], args.sf, args.reps)
        for f in flagged:
            iso = best.get(f["key"])
            f["isolated_min_sec"] = iso
            if iso is None:
                f["verdict"] = "rerun_failed"
            else:
                f["isolated_ratio"] = round(iso / f["baseline_sec"], 2)
                f["verdict"] = ("noise" if iso <= args.ratio * f["baseline_sec"]
                                else "regression")
    else:
        for f in flagged:
            f["verdict"] = "unreviewed"
    steal1 = read_steal()

    verdict = {
        "baseline_row": args.baseline,
        "ratio_threshold": args.ratio,
        "bench_total_sec": cur.get("total"),
        "bench_steal_jiffies": cur.get("steal_jiffies"),
        "rerun_steal_jiffies": steal1 - steal0,
        "n_keys": len(curq),
        "n_shared_with_baseline": sum(1 for k in curq if k in base),
        "new_keys": sorted(k for k in curq if k not in base),
        "missing_keys": sorted(k for k in base if k not in curq),
        "flagged": flagged,
        "n_regressions": sum(1 for f in flagged
                             if f.get("verdict") == "regression"),
        "drifts_vs_history_median": drift_check(
            args.history, cur, args.label or args.baseline),
    }
    json.dump(verdict, open(args.out_json, "w"), indent=1)
    print(f"{len(flagged)} flagged / {verdict['n_regressions']} confirmed "
          f"regressions -> {args.out_json}")
    if verdict["n_regressions"]:
        for f in flagged:
            if f.get("verdict") == "regression":
                print(f"  REGRESSION {f['key']}: {f['baseline_sec']}s -> "
                      f"{f['isolated_min_sec']}s (x{f['isolated_ratio']})")
        sys.exit(1)


if __name__ == "__main__":
    main()
