"""Convert the QMOF dataset (local json dumps) to our training layout.

Reference analog: data/MOF_data/process.py (qmof.json +
qmof_structure_data.json from the QMOF Figshare archive -> per-structure
json + targets.csv with the PBE band gap). Structures arrive as pymatgen
Structure dicts; we convert them directly — no pymatgen dependency.

Usage:
    python get_qmof.py --qmof qmof.json --structures qmof_structure_data.json \
        --out MOF_data
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import numpy as np

from matdeeplearn_tpu.data.structures import (
    SYMBOL_TO_NUMBER,
    Structure,
    write_ase_json,
)


def structure_from_pymatgen_dict(s: dict, sid: str) -> Structure:
    cell = np.array(s["lattice"]["matrix"], float)
    numbers, positions = [], []
    for site in s["sites"]:
        sp = max(site["species"], key=lambda e: e.get("occu", 1.0))
        numbers.append(SYMBOL_TO_NUMBER[sp["element"]])
        positions.append(site["xyz"])
    return Structure(np.array(numbers), np.array(positions), cell,
                     np.ones(3, bool), sid)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--qmof", default="qmof.json")
    ap.add_argument("--structures", default="qmof_structure_data.json")
    ap.add_argument("--out", default="MOF_data")
    ap.add_argument("--target", default="outputs.pbe.bandgap")
    args = ap.parse_args()

    for path in (args.qmof, args.structures):
        if not os.path.exists(path):
            sys.exit(f"{path} not found — download the QMOF archive from "
                     "https://figshare.com/articles/dataset/QMOF_Database/13147324")

    with open(args.qmof) as f:
        props = {e["qmof_id"]: e for e in json.load(f)}
    with open(args.structures) as f:
        struct_data = json.load(f)
    os.makedirs(args.out, exist_ok=True)

    def lookup(entry: dict, dotted: str):
        cur = entry
        for part in dotted.split("."):
            if not isinstance(cur, dict) or part not in cur:
                return None
            cur = cur[part]
        return cur

    targets = []
    for entry in struct_data:
        qid = entry["qmof_id"]
        y = lookup(props.get(qid, {}), args.target)
        if y is None:
            continue
        st = structure_from_pymatgen_dict(entry["structure"], qid)
        write_ase_json(st, os.path.join(args.out, f"{qid}.json"))
        targets.append((qid, float(y)))

    with open(os.path.join(args.out, "targets.csv"), "w") as f:
        for qid, y in targets:
            f.write(f"{qid},{y}\n")
    print(f"wrote {len(targets)} structures to {args.out}")


if __name__ == "__main__":
    main()
