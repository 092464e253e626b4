"""Real spherical harmonics on unit vectors (Cartesian input).

UniDepth V2 / UniK3D embed camera ray directions with real spherical
harmonics before conditioning their depth decoders (upstream
``unidepth/utils/sht.py`` ``rsh_cart_8`` — an unrolled degree-8 basis; the
reference exports it inside the ONNX graph, ``Uni_Depth_V2/onnx_export.py:9``).
Here the basis is evaluated with the associated-Legendre recurrence instead of
an 81-term unrolled polynomial — identical math, and the recurrence stays a
handful of fused elementwise ops under XLA.

Conventions: orthonormal real SH, Condon-Shortley phase absorbed (none),
component order l = 0..lmax, m = -l..l — (lmax+1)^2 components. Verified
against scipy in ``tests/test_spherical_harmonics.py``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def num_sh_components(lmax: int) -> int:
    return (lmax + 1) ** 2


def real_spherical_harmonics(xyz: jax.Array, lmax: int = 8) -> jax.Array:
    """Evaluate the real SH basis on (..., 3) unit vectors.

    Returns (..., (lmax+1)^2) with components ordered (l, m):
    (0,0), (1,-1), (1,0), (1,1), (2,-2), ...

    Real SH definition:
      Y_{l,0}  = K(l,0) P_l^0(z)
      Y_{l,m}  = sqrt(2) K(l,m) P_l^m(z) cos(m phi),  m > 0
      Y_{l,-m} = sqrt(2) K(l,m) P_l^m(z) sin(m phi),  m > 0
    with K(l,m) = sqrt((2l+1)/(4pi) * (l-m)!/(l+m)!).

    Works in Cartesian form: with r_xy = sqrt(x^2+y^2),
    P_l^m(z) cos(m phi) and sin(m phi) are computed via the recurrences
      C_m = x C_{m-1} - y S_{m-1},  S_m = x S_{m-1} + y C_{m-1}
    (so C_m = r_xy^m cos(m phi) — the r_xy^m factor cancels against the
    sin^m(theta) factor inside P_l^m, keeping everything polynomial in
    x, y, z and free of trig/atan2).
    """
    x = xyz[..., 0]
    y = xyz[..., 1]
    z = xyz[..., 2]
    dtype = jnp.promote_types(xyz.dtype, jnp.float32)
    x = x.astype(dtype)
    y = y.astype(dtype)
    z = z.astype(dtype)

    out = []

    # P~_m^m(z) * r_xy^{-m} accumulated in "pmm": the associated Legendre
    # P_m^m = (-1)^m (2m-1)!! (1-z^2)^{m/2}; we keep (1-z^2)^{m/2} = r_xy^m
    # folded into the azimuth factors C_m/S_m instead, so pmm holds only
    # (-1)^m (2m-1)!! and the z-recurrence stays polynomial.
    # Azimuth factors (start: C_0 = 1, S_0 = 0).
    c_m = jnp.ones_like(x)
    s_m = jnp.zeros_like(x)

    # Storage for P^m_l with the r_xy^m factor removed ("reduced" Legendre).
    # reduced P_m^m:
    def k_norm(l: int, m: int) -> float:
        return math.sqrt(
            (2 * l + 1) / (4 * math.pi) * math.factorial(l - m) / math.factorial(l + m)
        )

    # cols[m] = list of reduced P_l^m for l = m..lmax
    sh = {}
    pmm = jnp.ones_like(x)  # reduced P_0^0
    for m in range(lmax + 1):
        if m > 0:
            # reduced P_m^m = (2m-1) * previous (sign (-1)^m omitted: real SH
            # convention here absorbs Condon-Shortley; scipy comparison test
            # fixes the overall sign convention)
            pmm = pmm * (2 * m - 1)
            c_m, s_m = x * c_m - y * s_m, x * s_m + y * c_m
        p_prev = pmm  # reduced P_m^m
        # reduced P_{m+1}^m = (2m+1) z P_m^m
        p_curr = (2 * m + 1) * z * pmm if m < lmax else None
        for l in range(m, lmax + 1):
            if l == m:
                p = p_prev
            elif l == m + 1:
                p = p_curr
            else:
                # (l-m) P_l^m = (2l-1) z P_{l-1}^m - (l+m-1) P_{l-2}^m
                p = ((2 * l - 1) * z * p_curr - (l + m - 1) * p_prev) / (l - m)
                p_prev, p_curr = p_curr, p
            k = k_norm(l, m)
            if m == 0:
                sh[(l, 0)] = k * p
            else:
                s2 = math.sqrt(2.0) * k
                sh[(l, m)] = s2 * p * c_m
                sh[(l, -m)] = s2 * p * s_m

    for l in range(lmax + 1):
        for m in range(-l, l + 1):
            out.append(sh[(l, m)])
    return jnp.stack(out, axis=-1)
