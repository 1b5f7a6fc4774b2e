"""SOAP validated against an independent brute-force oracle (VERDICT r1
weak #6: the analytic expansion had only property tests).

The implementation (data/descriptors.py:222-287) expands the Gaussian
neighbor density on GTO radials × real Y_lm using the analytic scaled
modified-spherical-Bessel formula. The oracle here shares NONE of that
math: it integrates  c_{s,n,lm} = ∫ ρ_s(r) g_n(|r|) Y_lm(r̂) d³r  directly
on a dense radial × Gauss-Legendre × azimuthal grid, with Y_lm built from
scipy.special (an independent implementation), then forms the same
inner-averaged power spectrum. Agreement rules out errors in the Bessel
recurrence, the 4π expansion factor, the Y_lm layout/normalization, and
the m-summation — everything except the (documented, dscribe-convention)
GTO basis choice, whose orthonormality is asserted separately."""

import numpy as np
import pytest
from scipy.special import sph_harm_y

from matdeeplearn_tpu.data.descriptors import (
    _gto_radial_basis,
    soap_features,
)
from matdeeplearn_tpu.data.structures import Structure

RCUT, NMAX, LMAX, SIGMA = 4.0, 3, 3, 0.5


def _real_ylm_scipy(lmax, theta, phi):
    """Real spherical harmonics from scipy's complex ones; same flat
    (l, m) layout as descriptors._real_sph_harm: index l² + l + m."""
    out = np.zeros(((lmax + 1) ** 2,) + theta.shape)
    for l in range(lmax + 1):
        for m in range(l + 1):
            y = sph_harm_y(l, m, theta, phi)  # includes Condon-Shortley
            if m == 0:
                out[l * l + l] = y.real
            else:
                # real combinations: sqrt2*(-1)^m Re/Im
                out[l * l + l + m] = np.sqrt(2.0) * (-1.0) ** m * y.real
                out[l * l + l - m] = np.sqrt(2.0) * (-1.0) ** m * y.imag
    return out


def _oracle_power_spectrum(structure, species, rcut, nmax, lmax, sigma):
    """Brute-force inner-averaged SOAP power spectrum (cluster only)."""
    species = sorted(set(int(s) for s in species))
    nsp = len(species)
    sp_index = {z: i for i, z in enumerate(species)}
    nl = lmax + 1

    # Quadrature: radial grid matching the implementation's support,
    # 64-pt Gauss-Legendre in cosθ, 128 uniform azimuthal points.
    rg = np.linspace(1e-4, rcut + 4 * sigma, 280)
    wr = np.gradient(rg) * rg ** 2
    gnl = _gto_radial_basis(nmax, rcut, rg)  # shared basis convention
    ct, wt = np.polynomial.legendre.leggauss(64)
    theta = np.arccos(ct)
    nphi = 128
    phi = np.linspace(0.0, 2 * np.pi, nphi, endpoint=False)
    dphi = 2 * np.pi / nphi

    th_g, ph_g = np.meshgrid(theta, phi, indexing="ij")     # (T, P)
    ylm = _real_ylm_scipy(lmax, th_g, ph_g)                 # (LM, T, P)
    st = np.sin(th_g)
    dirs = np.stack(
        [st * np.cos(ph_g), st * np.sin(ph_g), np.cos(th_g)], axis=-1
    )                                                       # (T, P, 3)
    wang = wt[:, None] * dphi                               # (T, 1)

    c = np.zeros((nsp, nmax, nl * nl))
    for center in structure.positions:
        # points: center + r * dir -> density per species
        pts = center[None, None, None, :] + rg[:, None, None, None] * dirs
        for spi, z in enumerate(species):
            nb = structure.positions[structure.numbers == z]
            if not len(nb):
                continue
            keep = np.linalg.norm(nb - center, axis=1) <= rcut
            nb = nb[keep]
            if not len(nb):
                continue
            d2 = ((pts[None, ...] - nb[:, None, None, None, :]) ** 2).sum(-1)
            rho = np.exp(-d2 / (2 * sigma * sigma)).sum(0)  # (R, T, P)
            ang = np.einsum("mtp,rtp,tp->rm", ylm, rho, wang)  # (R, LM)
            c[spi] += np.einsum("nr,r,rm->nm", gnl, wr, ang)
    c /= max(len(structure), 1)

    pairs = [(a, b) for a in range(nsp) for b in range(a, nsp)]
    vec = np.zeros((len(pairs), nmax, nl))
    for pi, (a, b) in enumerate(pairs):
        for l in range(nl):
            sl = slice(l * l, (l + 1) * (l + 1))
            vec[pi, :, l] = np.einsum("nm,nm->n", c[a, :, sl], c[b, :, sl])
    return vec.ravel()


def test_gto_basis_orthonormal():
    grid = np.linspace(1e-4, RCUT + 4 * SIGMA, 256)
    g = _gto_radial_basis(NMAX, RCUT, grid)
    w = np.gradient(grid) * grid ** 2
    s = (g * w[None, :]) @ g.T
    np.testing.assert_allclose(s, np.eye(NMAX), atol=5e-4)


def test_soap_matches_bruteforce_integration():
    rng = np.random.default_rng(3)
    pos = np.array(
        [[0.0, 0.0, 0.0], [1.1, 0.4, -0.3], [-0.7, 1.2, 0.5],
         [0.3, -0.9, 1.0]]
    ) + rng.normal(scale=0.05, size=(4, 3))
    z = np.array([8, 1, 1, 8])
    s = Structure(z, pos, np.zeros((3, 3)), np.zeros(3, bool), "oracle")

    got = soap_features([s], [1, 8], RCUT, NMAX, LMAX, SIGMA)[0]
    want = _oracle_power_spectrum(s, [1, 8], RCUT, NMAX, LMAX, SIGMA)

    scale = np.abs(want).max()
    assert scale > 1e-3  # non-degenerate case
    np.testing.assert_allclose(got, want, atol=2e-3 * scale, rtol=2e-3)
