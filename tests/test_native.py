"""Native C++ featurizer vs the numpy reference path — exact agreement."""

import numpy as np
import pytest

from matdeeplearn_tpu.data import graphs as G
from matdeeplearn_tpu.data.native import featurize_structures, get_library


@pytest.fixture(scope="module")
def lib():
    lib = get_library()
    if lib is None:
        pytest.skip("native featurizer unavailable (g++ missing?)")
    return lib


def test_native_matches_numpy(lib, toy_structures):
    radius, k = 5.0, 6
    out = featurize_structures(toy_structures, radius, k)
    assert out is not None
    srcs, dsts, dists = out
    for s, src_n, dst_n, dist_n in zip(toy_structures, srcs, dsts, dists):
        src_p, dst_p, dist_p = G.build_graph(s, radius, k)
        np.testing.assert_array_equal(src_n, src_p)
        np.testing.assert_array_equal(dst_n, dst_p)
        np.testing.assert_allclose(dist_n, dist_p, atol=1e-10)


def test_native_nonperiodic(lib, rng):
    from matdeeplearn_tpu.data.structures import Structure

    structs = [
        Structure(rng.integers(1, 20, 7), rng.random((7, 3)) * 6,
                  np.zeros((3, 3)), np.zeros(3, bool), str(i))
        for i in range(5)
    ]
    srcs, dsts, dists = featurize_structures(structs, 4.0, 3)
    for s, src_n, dst_n, dist_n in zip(structs, srcs, dsts, dists):
        src_p, dst_p, dist_p = G.build_graph(s, 4.0, 3)
        np.testing.assert_array_equal(src_n, src_p)
        np.testing.assert_array_equal(dst_n, dst_p)
        np.testing.assert_allclose(dist_n, dist_p, atol=1e-10)


def test_native_triclinic(lib, rng):
    from matdeeplearn_tpu.data.structures import Structure

    cell = np.array([[6.0, 0, 0], [2.0, 5.0, 0], [1.0, 1.5, 7.0]])
    structs = [
        Structure(rng.integers(1, 20, 6), rng.random((6, 3)) @ cell,
                  cell, np.ones(3, bool), str(i))
        for i in range(4)
    ]
    srcs, dsts, dists = featurize_structures(structs, 5.0, 4)
    for s, src_n, dst_n, dist_n in zip(structs, srcs, dsts, dists):
        src_p, dst_p, dist_p = G.build_graph(s, 5.0, 4)
        np.testing.assert_array_equal(src_n, src_p)
        np.testing.assert_allclose(dist_n, dist_p, atol=1e-10)
