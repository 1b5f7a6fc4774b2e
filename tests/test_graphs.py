"""Featurization numerics vs independent references (scipy/numpy golden)."""

import numpy as np
import pytest
from scipy.stats import rankdata

from matdeeplearn_tpu.data import graphs as G
from matdeeplearn_tpu.data.structures import Structure, mic_distance_matrix


def test_ordinal_rank_matches_scipy_masked(rng):
    # scipy orders *masked* entries among themselves by value, we by column —
    # irrelevant downstream because threshold_sort discards masked entries.
    # The behavioral contract: unmasked ranks identical, masked ranked last.
    m = rng.random((20, 20)) * 10
    invalid = m > 6.0
    got = G.ordinal_rank_rows(m, invalid)
    want = rankdata(np.ma.array(m, mask=invalid), method="ordinal", axis=1)
    np.testing.assert_array_equal(got[~invalid], want[~invalid])
    n_valid = (~invalid).sum(axis=1, keepdims=True)
    assert (got[invalid] > np.broadcast_to(n_valid, got.shape)[invalid]).all()


def test_threshold_sort_reference_semantics(rng):
    # Reproduce the reference's masked-rank trim exactly (process.py:540-560).
    n, radius, k = 15, 5.0, 4
    pos = rng.random((n, 3)) * 8
    m = np.linalg.norm(pos[None] - pos[:, None], axis=-1)
    got = G.threshold_sort(m, radius, k)

    mask = m > radius
    ranks = rankdata(np.ma.array(m, mask=mask), method="ordinal", axis=1).astype(float)
    ranks = np.nan_to_num(np.where(mask, np.nan, ranks))
    ranks[ranks > k + 1] = 0
    want = np.where(ranks == 0, 0.0, m)
    np.testing.assert_allclose(got, want)
    # each row keeps at most k+1 entries (incl. the zero self-distance)
    assert ((got > 0).sum(axis=1) <= k + 1).all()


def test_self_loops_and_edge_order(rng):
    m = np.array([[0.0, 1.0, 9.0], [1.0, 0.0, 2.0], [9.0, 2.0, 0.0]])
    trimmed = G.threshold_sort(m, 5.0, 2)
    src, dst, dist = G.dense_to_edges(trimmed)
    src, dst, dist = G.add_self_loops(src, dst, dist, 3)
    # row-major off-diagonal entries then self loops
    assert list(src) == [0, 1, 1, 2, 0, 1, 2]
    assert list(dst) == [1, 0, 2, 1, 0, 1, 2]
    np.testing.assert_allclose(dist, [1, 1, 2, 2, 0, 0, 0])


def test_mic_distance_orthorhombic():
    cell = np.diag([10.0, 10.0, 10.0])
    s = Structure([1, 1], [[0.5, 0.5, 0.5], [9.5, 9.5, 9.5]], cell, [True] * 3)
    d = mic_distance_matrix(s)
    np.testing.assert_allclose(d[0, 1], np.sqrt(3.0), atol=1e-12)
    assert d[0, 0] == 0


def test_mic_distance_matches_ase_algorithm(rng):
    # Triclinic cell: compare against brute-force over a 5^3 supercell.
    cell = np.array([[6.0, 0, 0], [2.0, 5.0, 0], [1.0, 1.5, 7.0]])
    pos = rng.random((6, 3)) @ cell
    s = Structure([6] * 6, pos, cell, [True] * 3)
    d = mic_distance_matrix(s)
    shifts = np.array(
        [[i, j, k] for i in range(-2, 3) for j in range(-2, 3) for k in range(-2, 3)]
    ) @ cell
    delta = pos[None, :, :] - pos[:, None, :]
    brute = np.min(
        np.linalg.norm(delta[:, :, None, :] + shifts[None, None], axis=-1), axis=2
    )
    np.testing.assert_allclose(d, brute, atol=1e-9)


def test_mic_partial_pbc(rng):
    cell = np.diag([10.0, 10.0, 30.0])
    s = Structure(
        [1, 1], [[0.5, 0.5, 1.0], [9.5, 0.5, 29.0]], cell, [True, True, False]
    )
    d = mic_distance_matrix(s)
    np.testing.assert_allclose(d[0, 1], np.sqrt(1.0 + 28.0**2), atol=1e-12)


def test_one_hot_degree():
    src = np.array([0, 0, 1, 0, 1, 2], dtype=np.int32)
    out = G.one_hot_degree(src, 3, max_degree=4)
    assert out.shape == (3, 5)
    np.testing.assert_array_equal(out[0], [0, 0, 0, 1, 0])  # degree 3
    np.testing.assert_array_equal(out[1], [0, 0, 1, 0, 0])  # degree 2
    np.testing.assert_array_equal(out[2], [0, 1, 0, 0, 0])  # degree 1


def test_gaussian_basis_formula(rng):
    d = rng.random(17).astype(np.float32)
    got = G.gaussian_basis(d, 0.0, 1.0, 50, 0.2)
    offsets = np.linspace(0, 1, 50)
    coeff = -0.5 / ((1.0 - 0.0) * 0.2) ** 2
    want = np.exp(coeff * (d[:, None] - offsets[None]) ** 2)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert got.shape == (17, 50)


def test_normalize_edges():
    dists = [np.array([0.0, 2.0, 4.0]), np.array([1.0, 8.0])]
    normed, lo, hi = G.normalize_edges(dists)
    assert lo == 0.0 and hi == 8.0
    np.testing.assert_allclose(normed[0], [0, 0.25, 0.5])
    np.testing.assert_allclose(normed[1], [0.125, 1.0])


def test_generated_dictionary():
    d = G.generated_atom_dictionary([8, 1, 26])
    assert set(d) == {1, 8, 26}
    np.testing.assert_array_equal(d[1], [1, 0, 0])
    np.testing.assert_array_equal(d[8], [0, 1, 0])
    np.testing.assert_array_equal(d[26], [0, 0, 1])
    d2 = G.generated_atom_dictionary([5, 3])  # binary LabelBinarizer case
    np.testing.assert_array_equal(d2[3], [0])
    np.testing.assert_array_equal(d2[5], [1])


def test_default_dictionary_is_one_hot():
    d = G.default_atom_dictionary()
    assert d[1].shape == (100,)
    assert d[78][77] == 1.0 and d[78].sum() == 1.0
