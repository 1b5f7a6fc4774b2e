"""Dataset-acquisition layer: ASE-json writer round-trip, keyed db reader,
pymatgen-dict conversion, and the synthetic generator feeding the real
featurization pipeline end-to-end."""

import json
import os
import sqlite3
import subprocess
import sys

import numpy as np
import pytest

from matdeeplearn_tpu.data.structures import (
    Structure,
    read_ase_db_with_keys,
    read_ase_json,
    write_ase_json,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_write_ase_json_roundtrip(tmp_path, rng):
    s = Structure(
        rng.integers(1, 40, 6), rng.random((6, 3)) * 5,
        np.diag([4.0, 5.0, 6.0]), np.array([True, True, False]), "x",
    )
    path = str(tmp_path / "s.json")
    write_ase_json(s, path)
    s2 = read_ase_json(path, "x")
    np.testing.assert_array_equal(s2.numbers, s.numbers)
    np.testing.assert_allclose(s2.positions, s.positions)
    np.testing.assert_allclose(s2.cell, s.cell)
    np.testing.assert_array_equal(s2.pbc, s.pbc)


def test_read_ase_db_with_keys(tmp_path):
    db = str(tmp_path / "kv.db")
    con = sqlite3.connect(db)
    con.execute(
        "CREATE TABLE systems (id INTEGER PRIMARY KEY, numbers BLOB, "
        "positions BLOB, cell BLOB, pbc INTEGER, key_value_pairs TEXT)"
    )
    num = np.array([1, 8], np.int32)
    pos = np.array([[0, 0, 0], [0, 0, 1.0]])
    cell = np.eye(3) * 5
    con.execute(
        "INSERT INTO systems VALUES (1, ?, ?, ?, 7, ?)",
        (num.tobytes(), pos.tobytes(), cell.tobytes(),
         json.dumps({"workfunction": 4.5})),
    )
    con.execute(
        "INSERT INTO systems VALUES (2, ?, ?, ?, 0, NULL)",
        (num.tobytes(), pos.tobytes(), cell.tobytes()),
    )
    con.commit()
    con.close()

    rows = read_ase_db_with_keys(db)
    assert len(rows) == 2
    s1, k1 = rows[0]
    assert k1 == {"workfunction": 4.5}
    assert s1.pbc.all()
    np.testing.assert_allclose(s1.positions, pos)
    _, k2 = rows[1]
    assert k2 == {}


def test_pymatgen_dict_conversion():
    sys.path.insert(0, os.path.join(REPO, "datasets", "mof"))
    try:
        from get_qmof import structure_from_pymatgen_dict
    finally:
        sys.path.pop(0)
    d = {
        "lattice": {"matrix": [[5, 0, 0], [0, 6, 0], [0, 0, 7]]},
        "sites": [
            {"species": [{"element": "Zn", "occu": 1.0}], "xyz": [0, 0, 0]},
            {"species": [{"element": "O", "occu": 0.5},
                         {"element": "C", "occu": 0.5}], "xyz": [1, 2, 3]},
        ],
    }
    s = structure_from_pymatgen_dict(d, "q1")
    assert s.numbers[0] == 30
    assert s.numbers[1] in (6, 8)  # dominant species tie -> either, not crash
    np.testing.assert_allclose(s.cell, np.diag([5.0, 6.0, 7.0]))


def test_cathub_inputfile_parser():
    sys.path.insert(0, os.path.join(REPO, "datasets", "surface"))
    try:
        from get_cathub import ase_json_to_structure
    finally:
        sys.path.pop(0)
    payload = json.dumps({"1": {
        "numbers": {"__ndarray__": [[2], "int64", [78, 78]]},
        "positions": {"__ndarray__": [[2, 3], "float64",
                                      [0, 0, 0, 0, 0, 2.0]]},
        "cell": {"__ndarray__": [[3, 3], "float64",
                                 [8, 0, 0, 0, 8, 0, 0, 0, 8]]},
        "pbc": {"__ndarray__": [[3], "bool", [True, True, False]]},
    }})
    s = ase_json_to_structure(payload, "0")
    assert s is not None and len(s) == 2 and s.positions[1, 2] == 2.0
    assert ase_json_to_structure("not json", "0") is None


def test_synthetic_generator_feeds_pipeline(tmp_path):
    out = str(tmp_path / "gen")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "datasets", "synthetic.py"),
         "--out", out, "--n", "12", "--atoms", "6"],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr
    assert os.path.exists(os.path.join(out, "targets.csv"))

    from matdeeplearn_tpu.data import get_dataset

    ds = get_dataset(out, target_index=0,
                     processing_args={"verbose": "False"})
    assert len(ds) == 12
    assert np.isfinite(ds.targets).all()
    assert ds.node_x.shape[1] > 100  # one-hot dict + degree features
