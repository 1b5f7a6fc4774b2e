"""Generate a synthetic smoke-test dataset (random metal clusters).

Analog of the reference's bundled data/test_data (1,001 Pt clusters of 10
atoms in a 20 A box, total energy targets; README.md:51-65): random
clusters with a cheap pair-potential energy target so models can overfit
it and prove the full pipeline end-to-end with no downloads.

Usage:
    python synthetic.py --out test_data [--n 1000] [--atoms 10] [--element 78]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from matdeeplearn_tpu.data.structures import Structure, write_ase_json


def pair_energy(pos: np.ndarray, eps: float = 1.0, r0: float = 2.7) -> float:
    """Lennard-Jones-style cluster energy (smooth, size-extensive)."""
    d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    iu = np.triu_indices(len(pos), 1)
    r = np.maximum(d[iu], 0.5)
    x = (r0 / r) ** 6
    return float(np.sum(eps * (x * x - 2 * x)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="test_data")
    ap.add_argument("--n", type=int, default=1000)
    ap.add_argument("--atoms", type=int, default=10)
    ap.add_argument("--element", type=int, default=78, help="atomic number")
    ap.add_argument("--box", type=float, default=20.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out, exist_ok=True)
    rows = []
    for i in range(args.n):
        # Jittered-lattice cluster: near-physical separations (no overlaps),
        # so the pair-potential targets stay in a learnable range.
        side = int(np.ceil(args.atoms ** (1 / 3)))
        grid = np.stack(np.meshgrid(*[np.arange(side)] * 3), -1).reshape(-1, 3)
        sel = rng.permutation(len(grid))[: args.atoms]
        pos = grid[sel] * 2.7 + rng.normal(scale=0.15, size=(args.atoms, 3))
        pos += args.box / 2 - pos.mean(0)
        st = Structure(
            np.full(args.atoms, args.element), pos,
            np.zeros((3, 3)), np.zeros(3, bool), str(i),
        )
        write_ase_json(st, os.path.join(args.out, f"{i}.json"))
        rows.append(f"{i},{pair_energy(pos):.6f}")
    with open(os.path.join(args.out, "targets.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")
    print(f"wrote {args.n} structures to {args.out}")


if __name__ == "__main__":
    main()
