"""Extract C2DB 2D-material structures + work functions from a local c2db.db.

Reference analog: data/2D_data/read_db.py (ase.db select on 'workfunction'
-> per-structure json + targets.csv). The C2DB sqlite database must be
obtained from the C2DB project (https://c2db.fysik.dtu.dk) first; this
script reads it with our first-party ase.db reader — no ase dependency.

Usage:
    python get_c2db.py --db c2db.db --out 2D_data [--key workfunction]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from matdeeplearn_tpu.data.structures import read_ase_db_with_keys, write_ase_json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--db", default="c2db.db")
    ap.add_argument("--out", default="2D_data")
    ap.add_argument("--key", default="workfunction",
                    help="key-value property to use as the target; rows "
                    "without it are skipped")
    args = ap.parse_args()

    if not os.path.exists(args.db):
        sys.exit(f"{args.db} not found — download the C2DB database first "
                 "(https://c2db.fysik.dtu.dk)")
    os.makedirs(args.out, exist_ok=True)

    count, targets = 0, []
    for structure, keys in read_ase_db_with_keys(args.db):
        y = keys.get(args.key)
        if y is None:
            continue
        structure.structure_id = str(count)
        write_ase_json(structure, os.path.join(args.out, f"{count}.json"))
        targets.append((count, float(y)))
        count += 1
    print(count)

    with open(os.path.join(args.out, "targets.csv"), "w") as f:
        for idx, y in targets:
            f.write(f"{idx},{y}\n")
    print(f"wrote {count} structures to {args.out}")


if __name__ == "__main__":
    main()
