"""Aggregate multi-seed adversarial-benefit runs into one summary.

Round-4 VERDICT item 1c: report mean +/- spread across seeds instead of a
single-seed point estimate, and check the paper's qualitative ordering
(no-enh > cascade > joint) holds for every seed. Reads whichever of the
per-seed artifacts exist:

  results/adversarial_benefit.json                 (toy, seed 0)
  results/adversarial_benefit_seed<k>.json         (toy, seed k)
  results/adversarial_benefit_adadelta.json        (toy, reference recipe)
  results/adversarial_benefit_reference.json       (reference scale, seed 0)
  results/adversarial_benefit_reference_seed<k>.json

Writes results/adversarial_benefit_summary.json and prints it.
Usage: python scripts/summarize_seeds.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "results")


def _load(path):
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return None


def _collect(pattern_base, default_seed_file):
    runs = []
    d = _load(default_seed_file)
    if d is not None:
        runs.append(d)
    for p in sorted(glob.glob(pattern_base)):
        d = _load(p)
        if d is not None:
            runs.append(d)
    return runs


def _stats(runs):
    rows = []
    for r in runs:
        rows.append({
            "seed": (r.get("recipe") or {}).get("seed", 0),
            "optimizer": (r.get("recipe") or {}).get("optimizer", "adam"),
            "no_enh": r["noisy_wer_no_enhancement"],
            "cascade": r["noisy_wer_cascade_enhancement"],
            "joint": r["noisy_wer_joint_adversarial"],
            "ordering_holds": (
                r["noisy_wer_joint_adversarial"]
                < r["noisy_wer_cascade_enhancement"]
                and r["noisy_wer_joint_adversarial"]
                < r["noisy_wer_no_enhancement"]
            ),
        })
    joints = [x["joint"] for x in rows]
    out = {
        "n_runs": len(rows),
        "runs": rows,
        "all_orderings_hold": all(x["ordering_holds"] for x in rows),
    }
    if joints:
        out["joint_wer_mean"] = round(sum(joints) / len(joints), 4)
        out["joint_wer_min"] = round(min(joints), 4)
        out["joint_wer_max"] = round(max(joints), 4)
    return out


def main():
    toy = _collect(os.path.join(RES, "adversarial_benefit_seed*.json"),
                   os.path.join(RES, "adversarial_benefit.json"))
    ada = _load(os.path.join(RES, "adversarial_benefit_adadelta.json"))
    ref = _collect(
        os.path.join(RES, "adversarial_benefit_reference_seed*.json"),
        os.path.join(RES, "adversarial_benefit_reference.json"))
    summary = {
        "toy_scale": _stats(toy) if toy else None,
        "toy_scale_adadelta": _stats([ada]) if ada else None,
        "reference_scale": _stats(ref) if ref else None,
    }
    print(json.dumps(summary, indent=2))
    with open(os.path.join(RES, "adversarial_benefit_summary.json"),
              "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
