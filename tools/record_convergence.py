"""Record a tools/learning_demo.py run into CONVERGENCE.json.

Usage: python tools/record_convergence.py RUN_OUTPUT [--note TEXT]

Parses the demo's one-JSON-line-per-eval output and writes
{"curve": [...], "summary": {...}} next to bench.py, where bench.py's
final line picks the summary up (load_convergence_summary). The summary
keeps the fields a reader needs to judge end-to-end training without
the full curve: final/best SR+SPL, iteration count, sec/iter.
"""

import argparse
import json
import os


def parse_curve(path: str) -> list:
    curve = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line.startswith("{"):
                continue
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            # eval points only: operational lines may also carry an
            # "iter" field (e.g. the babysitter's no_progress marker)
            if "iter" in d and "success" in d:
                curve.append(d)
    # Appended session logs may repeat an iter (resume from a checkpoint
    # older than the last recorded eval) or arrive out of order; keep the
    # LATEST entry per iter and sort, so 'iters'/'sr_curve' are well
    # defined (advisor r4).
    by_iter = {}
    for d in curve:
        by_iter[d["iter"]] = d
    return [by_iter[i] for i in sorted(by_iter)]


def summarize(curve: list, note: str = "") -> dict:
    best = max(curve, key=lambda d: d.get("success", 0.0))
    last = curve[-1]
    out = {
        "iters": last["iter"],
        "sr_final": last.get("success"),
        "spl_final": last.get("spl"),
        "sr_best": best.get("success"),
        "spl_best": best.get("spl"),
        "best_iter": best["iter"],
        "il_loss_final": last.get("IL_loss"),
        "sec_per_iter": last.get("sec_per_iter"),
        "sr_curve": {str(d["iter"]): d.get("success") for d in curve},
    }
    if note:
        out["note"] = note
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_output")
    ap.add_argument("--note", default="")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    curve = parse_curve(args.run_output)
    if not curve:
        raise SystemExit(f"no eval lines found in {args.run_output}")
    out_path = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CONVERGENCE.json")
    with open(out_path, "w") as f:
        json.dump({"curve": curve, "summary": summarize(curve, args.note)},
                  f, indent=1)
    print(json.dumps(summarize(curve, args.note)))


if __name__ == "__main__":
    main()
