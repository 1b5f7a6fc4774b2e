"""Descriptor module: CM/SM formula checks and SOAP invariance properties."""

import numpy as np
import pytest

from matdeeplearn_tpu.data import descriptors as DS
from matdeeplearn_tpu.data.structures import Structure


def _rot(axis, angle):
    axis = np.asarray(axis, float) / np.linalg.norm(axis)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K


def test_coulomb_matrix_formula():
    s = Structure([1, 8], [[0, 0, 0], [0, 0, 1.0]], np.zeros((3, 3)), [False] * 3)
    m = DS.coulomb_matrix(s, 3)
    assert m.shape == (3, 3)
    assert abs(m[0, 0] - 0.5 * 1 ** 2.4) < 1e-12
    assert abs(m[1, 1] - 0.5 * 8 ** 2.4) < 1e-12
    assert abs(m[0, 1] - 8.0) < 1e-12  # Z1*Z2/d = 1*8/1
    assert m[2, 2] == 0  # padding


def test_sine_matrix_periodic_invariance(rng):
    cell = np.diag([5.0, 6.0, 7.0])
    pos = rng.random((4, 3)) @ cell
    s1 = Structure([6, 8, 1, 26], pos, cell, [True] * 3)
    # translate by a lattice vector: sine matrix must be unchanged
    s2 = Structure([6, 8, 1, 26], pos + cell[0], cell, [True] * 3)
    m1 = DS.sine_matrix(s1, 4)
    m2 = DS.sine_matrix(s2, 4)
    np.testing.assert_allclose(m1, m2, atol=1e-9)


def test_eigenspectrum_sorted_by_abs():
    m = np.diag([1.0, -5.0, 3.0])
    ev = DS.eigenspectrum(m)
    np.testing.assert_allclose(ev, [-5.0, 3.0, 1.0])


def test_sm_features_shape(toy_structures):
    n_max = max(len(s) for s in toy_structures)
    f = DS.sm_features(toy_structures, n_max)
    assert f.shape == (len(toy_structures), n_max)
    assert np.isfinite(f).all()


class TestSOAP:
    @pytest.fixture(scope="class")
    def cluster(self):
        rng = np.random.default_rng(11)
        pos = rng.random((5, 3)) * 3.0
        return Structure([1, 1, 8, 6, 8], pos, np.zeros((3, 3)), [False] * 3)

    def test_shape(self, cluster):
        f = DS.soap_features([cluster], [1, 6, 8], rcut=4.0, nmax=3, lmax=2,
                             sigma=0.4)
        nsp, npairs, nl = 3, 6, 3
        assert f.shape == (1, nsp * npairs * nl)
        assert np.isfinite(f).all()
        assert np.abs(f).max() > 0

    def test_rotation_invariance(self, cluster):
        R = _rot([1, 2, 3], 1.1)
        rotated = Structure(
            cluster.numbers, cluster.positions @ R.T, cluster.cell, cluster.pbc
        )
        f1 = DS.soap_features([cluster], [1, 6, 8], rcut=4.0, nmax=3, lmax=2,
                              sigma=0.4)
        f2 = DS.soap_features([rotated], [1, 6, 8], rcut=4.0, nmax=3, lmax=2,
                              sigma=0.4)
        np.testing.assert_allclose(f1, f2, rtol=1e-5, atol=1e-8)

    def test_translation_invariance(self, cluster):
        moved = Structure(
            cluster.numbers, cluster.positions + 5.0, cluster.cell, cluster.pbc
        )
        f1 = DS.soap_features([cluster], [1, 6, 8], rcut=4.0, nmax=3, lmax=2,
                              sigma=0.4)
        f2 = DS.soap_features([moved], [1, 6, 8], rcut=4.0, nmax=3, lmax=2,
                              sigma=0.4)
        np.testing.assert_allclose(f1, f2, rtol=1e-6, atol=1e-10)

    def test_species_sensitivity(self, cluster):
        # swapping an O for an N must change the descriptor
        swapped = Structure(
            np.array([1, 1, 7, 6, 8]), cluster.positions, cluster.cell, cluster.pbc
        )
        f1 = DS.soap_features([cluster], [1, 6, 7, 8], rcut=4.0, nmax=3,
                              lmax=2, sigma=0.4)
        f2 = DS.soap_features([swapped], [1, 6, 7, 8], rcut=4.0, nmax=3,
                              lmax=2, sigma=0.4)
        assert np.abs(f1 - f2).max() > 1e-6
