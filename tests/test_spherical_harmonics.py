"""Real-SH basis vs scipy ground truth (the UniDepth/UniK3D ray embedding)."""

import numpy as np
import pytest

import jax.numpy as jnp

from monocular_depth_estimation_trt_tpu.ops.spherical_harmonics import (
    num_sh_components,
    real_spherical_harmonics,
)


def _scipy_real_sh(l, m, theta, phi):
    """Orthonormal real SH WITHOUT Condon-Shortley phase (our convention)."""
    from scipy.special import sph_harm_y

    # scipy's sph_harm_y(l, m, theta, phi) includes the CS phase (-1)^m
    y = sph_harm_y(l, abs(m), theta, phi)
    cs = (-1.0) ** abs(m)  # strip Condon-Shortley
    if m > 0:
        return cs * np.sqrt(2.0) * np.real(y)
    if m < 0:
        return cs * np.sqrt(2.0) * np.imag(y)
    return np.real(y)


@pytest.mark.parametrize("lmax", [2, 4, 8])
def test_matches_scipy(rng, lmax):
    pytest.importorskip("scipy")
    v = rng.standard_normal((64, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    ours = np.asarray(real_spherical_harmonics(jnp.asarray(v, jnp.float32), lmax))
    assert ours.shape == (64, num_sh_components(lmax))

    theta = np.arccos(np.clip(v[:, 2], -1, 1))  # polar from +z
    phi = np.arctan2(v[:, 1], v[:, 0])
    idx = 0
    for l in range(lmax + 1):
        for m in range(-l, l + 1):
            ref = _scipy_real_sh(l, m, theta, phi)
            assert np.allclose(ours[:, idx], ref, atol=2e-5), (l, m)
            idx += 1


def test_orthonormality(rng):
    """Monte-Carlo check: E[Y_i Y_j] over the sphere = delta_ij / (4 pi)."""
    n = 200_000
    v = rng.standard_normal((n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    sh = np.asarray(real_spherical_harmonics(jnp.asarray(v, jnp.float32), 3))
    gram = 4 * np.pi * (sh.T @ sh) / n
    assert np.allclose(gram, np.eye(sh.shape[1]), atol=0.08)
