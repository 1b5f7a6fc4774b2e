"""Fetch Catalysis-Hub surface reaction structures + adsorption energies.

Reference analog: data/surface_data/ase_cathub.py (GraphQL pagination over
api.catalysis-hub.org, reaction systems -> per-structure json + targets.csv
with reactionEnergy). This version uses plain requests and writes our
ASE-json layout via first-party writers.

Usage:
    python get_cathub.py --pub-id MamunHighT2019 --out surface_data
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import numpy as np

from matdeeplearn_tpu.data.structures import Structure, write_ase_json

GRAPHQL = "https://api.catalysis-hub.org/graphql"

QUERY = """{{
  reactions(pubId: "{pub_id}", first: {page_size}, after: "{cursor}") {{
    totalCount
    pageInfo {{ hasNextPage endCursor }}
    edges {{ node {{
      Equation
      reactionEnergy
      reactionSystems {{ name systems {{ energy InputFile(format: "json") }} }}
    }} }}
  }}
}}"""


def ase_json_to_structure(text: str, sid: str) -> Structure | None:
    """Parse the InputFile payload (an ASE-json document) into a Structure."""
    try:
        doc = json.loads(text)
        key = next(k for k in doc if k.isdigit())
        entry = doc[key]

        def arr(name, dtype):
            v = entry[name]
            if isinstance(v, dict) and "__ndarray__" in v:
                shape, dt, data = v["__ndarray__"]
                return np.array(data, dtype=dt).reshape(shape)
            return np.asarray(v, dtype)

        return Structure(
            arr("numbers", np.int64), arr("positions", np.float64),
            arr("cell", np.float64), arr("pbc", bool), sid,
        )
    except (KeyError, StopIteration, ValueError, json.JSONDecodeError):
        return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pub-id", default="MamunHighT2019",
                    help="Catalysis-Hub publication id")
    ap.add_argument("--out", default="surface_data")
    ap.add_argument("--page-size", type=int, default=50)
    ap.add_argument("--star-only", action="store_true", default=True,
                    help="keep only the adsorbate+slab ('star') systems")
    args = ap.parse_args()

    try:
        import requests
    except ImportError:
        sys.exit("the 'requests' package is required for acquisition scripts")

    os.makedirs(args.out, exist_ok=True)
    targets = []
    count, cursor, has_next = 0, "", True
    while has_next:
        q = QUERY.format(pub_id=args.pub_id, page_size=args.page_size,
                         cursor=cursor)
        r = requests.get(GRAPHQL, {"query": q}, timeout=120)
        r.raise_for_status()
        data = r.json()["data"]["reactions"]
        has_next = data["pageInfo"]["hasNextPage"]
        cursor = data["pageInfo"]["endCursor"]
        for edge in data["edges"]:
            node = edge["node"]
            energy = node.get("reactionEnergy")
            if energy is None:
                continue
            for rs in node.get("reactionSystems") or []:
                name = rs.get("name", "")
                # 'star' systems are the adsorbate-on-slab structures the
                # reference keeps; skip gas references (ending in 'gas').
                if args.star_only and not name.endswith("star"):
                    continue
                if name == "star":  # bare slab
                    continue
                sysd = rs.get("systems") or {}
                st = ase_json_to_structure(sysd.get("InputFile", ""), str(count))
                if st is None:
                    continue
                write_ase_json(st, os.path.join(args.out, f"{count}.json"))
                targets.append((count, float(energy)))
                count += 1
        print(f"{count} structures (cursor {cursor})")

    with open(os.path.join(args.out, "targets.csv"), "w") as f:
        for idx, y in targets:
            f.write(f"{idx},{y}\n")
    print(f"wrote {count} structures to {args.out}")


if __name__ == "__main__":
    main()
