"""Parse the parity run logs into summary.json (the committed, auditable
evidence behind PARITY.md — VERDICT r2 weak #1).

Extracts per-epoch (epoch, lr, train, val) trajectories and the final
Train/Val/Test errors from every <model>/seed<NN>/run.log, then reports
mean±std across seeds per model.
"""

from __future__ import annotations

import json
import os
import re
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
EPOCH_RE = re.compile(
    r"Epoch: (\d+), Learning Rate: ([\d.e-]+), Training Error: ([\d.naif-]+),"
    r" Val Error: ([\d.naif-]+)"
)
FINAL_RE = re.compile(r"^(Train|Val|Test) Error: ([\d.naif-]+)", re.M)


def parse_log(path: str) -> dict | None:
    if not os.path.exists(path):
        return None
    text = open(path).read()
    traj = [
        {"epoch": int(m[0]), "lr": float(m[1]), "train": float(m[2]),
         "val": float(m[3])}
        for m in EPOCH_RE.findall(text)
    ]
    finals = {k.lower(): float(v) for k, v in FINAL_RE.findall(text)}
    if "test" not in finals:
        return None
    return {"final": finals, "trajectory": traj}


def main():
    models = ["CGCNN_demo", "MPNN_demo", "SchNet_demo", "MEGNet_demo",
              "GCN_demo", "SM_demo", "SOAP_demo"]
    out = {}
    for m in models:
        seeds = {}
        base = os.path.join(HERE, m)
        if not os.path.isdir(base):
            continue
        for d in sorted(os.listdir(base)):
            if not d.startswith("seed"):
                continue
            rec = parse_log(os.path.join(base, d, "run.log"))
            if rec:
                seeds[d[4:]] = rec
        if not seeds:
            continue
        tests = [s["final"]["test"] for s in seeds.values()]
        vals = [s["final"].get("val", float("nan")) for s in seeds.values()]
        out[m] = {
            "seeds": seeds,
            "test_mae_mean": float(np.mean(tests)),
            "test_mae_std": float(np.std(tests)),
            "val_mae_mean": float(np.mean(vals)),
            "n_seeds": len(seeds),
        }
    with open(os.path.join(HERE, "summary.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("model               test MAE (mean±std over seeds)")
    for m, r in out.items():
        print(f"{m:<18s}  {r['test_mae_mean']:.4f} ± {r['test_mae_std']:.4f} "
              f"(n={r['n_seeds']})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
