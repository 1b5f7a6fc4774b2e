"""Test config: force CPU with 8 virtual devices for multi-chip sharding
tests. Must run before jax initializes a backend (the axon TPU tunnel makes
eager ops round-trip through a network proxy — unusable for unit tests)."""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def _make_structures(rng, n=12, min_atoms=3, max_atoms=9, periodic=True):
    from matdeeplearn_tpu.data.structures import Structure

    structs = []
    for i in range(n):
        na = int(rng.integers(min_atoms, max_atoms + 1))
        cell = np.eye(3) * (6.0 + rng.random() * 2)
        if periodic:
            pos = rng.random((na, 3)) @ cell
            pbc = np.ones(3, bool)
        else:
            pos = rng.random((na, 3)) * 8.0
            cell = np.zeros((3, 3))
            pbc = np.zeros(3, bool)
        z = rng.integers(1, 30, size=na)
        structs.append(Structure(z, pos, cell, pbc, structure_id=str(i)))
    return structs


@pytest.fixture(scope="session")
def toy_structures():
    return _make_structures(np.random.default_rng(42))


@pytest.fixture(scope="session")
def toy_data_dir(tmp_path_factory):
    """On-disk synthetic dataset dir (ase-json files + targets.csv)."""
    import json

    rng = np.random.default_rng(7)
    root = tmp_path_factory.mktemp("toy_data")
    structs = _make_structures(rng, n=16, min_atoms=3, max_atoms=8)
    rows = []
    for s in structs:
        doc = {
            "1": {
                "cell": {"array": {"__ndarray__": [[3, 3], "float64", s.cell.ravel().tolist()]}},
                "numbers": {"__ndarray__": [[len(s)], "int64", s.numbers.tolist()]},
                "pbc": {"__ndarray__": [[3], "bool", s.pbc.tolist()]},
                "positions": {"__ndarray__": [[len(s), 3], "float64", s.positions.ravel().tolist()]},
            }
        }
        with open(root / f"{s.structure_id}.json", "w") as f:
            json.dump(doc, f)
        rows.append(f"{s.structure_id},{rng.normal():.6f}")
    (root / "targets.csv").write_text("\n".join(rows) + "\n")
    return str(root)


TOY_PROCESSING_ARGS = {"graph_max_radius": 5.0, "graph_max_neighbors": 6,
                       "verbose": "False"}


@pytest.fixture(scope="session")
def toy_dataset(toy_data_dir):
    """A small processed dataset built from synthetic structures on disk."""
    from matdeeplearn_tpu.data import get_dataset

    return get_dataset(
        toy_data_dir,
        target_index=0,
        processing_args=dict(TOY_PROCESSING_ARGS),
    )
