"""Closed-form small-matrix inverses.

``jnp.linalg.inv`` lowers to an LU solve that runs as a sequential scalar
pipeline on TPU (~2 ms/step for a batch of 4x4s in the cached-inference
graph).  The 3x3 adjugate inverse and the affine 4x4 block inverse are pure
elementwise math that fuses into neighbors for free.
"""

from __future__ import annotations

import jax.numpy as jnp


def inv3(a):
    """Inverse of [..., 3, 3] matrices via the adjugate."""
    c00 = a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1]
    c01 = a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2]
    c02 = a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]
    c10 = a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2]
    c11 = a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0]
    c12 = a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1]
    c20 = a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1]
    c21 = a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2]
    c22 = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    det = a[..., 0, 0] * c00 + a[..., 0, 1] * c01 + a[..., 0, 2] * c02
    adj = jnp.stack(
        [
            jnp.stack([c00, c10, c20], -1),
            jnp.stack([c01, c11, c21], -1),
            jnp.stack([c02, c12, c22], -1),
        ],
        -2,
    )
    return adj / det[..., None, None]


def inv_affine4(m):
    """Inverse of [..., 4, 4] affine transforms (last row 0,0,0,1)."""
    ainv = inv3(m[..., :3, :3])
    t = m[..., :3, 3]
    ti = -jnp.einsum("...ij,...j->...i", ainv, t)
    top = jnp.concatenate([ainv, ti[..., None]], axis=-1)  # [..., 3, 4]
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)
