"""Pallas RCS renderer (ops/rcs_render.py) vs the XLA chain oracle."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rcbevdet_tpu.core.gaussian import compute_rcs_seeds, render_rcs_maps
from rcbevdet_tpu.ops.rcs_render import render_rcs_maps_pallas


def _case(rng, p=40, ny=32, nx=64, r_max=5):
    centers = np.stack(
        [rng.integers(-3, nx + 3, p), rng.integers(-3, ny + 3, p)], -1
    ).astype(np.int32)
    radius = rng.uniform(0.0, r_max + 2.0, p).astype(np.float32)
    rcs = rng.standard_normal(p).astype(np.float32) * 5.0
    mask = rng.random(p) < 0.8
    return centers, radius, rcs, mask


def test_pallas_render_matches_xla_chain():
    rng = np.random.default_rng(3)
    ny, nx, r_max = 32, 64, 5
    centers, radius, rcs, mask = _case(rng, ny=ny, nx=nx, r_max=r_max)
    heat_ref, feat_ref = render_rcs_maps(
        jnp.asarray(centers), jnp.asarray(radius), jnp.asarray(rcs),
        jnp.asarray(mask), ny, nx, r_max
    )
    seed_r, seed_v = compute_rcs_seeds(
        jnp.asarray(centers), jnp.asarray(radius), jnp.asarray(rcs),
        jnp.asarray(mask), ny, nx, r_max
    )
    heat, feat = render_rcs_maps_pallas(
        seed_r[None], seed_v[None], r_max, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(heat[0]), np.asarray(heat_ref), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(feat[0]), np.asarray(feat_ref), atol=1e-6
    )


def test_pallas_render_empty_canvas():
    ny, nx, r_max = 16, 128, 4
    seed_r = jnp.full((1, ny, nx), -1, jnp.int32)
    seed_v = jnp.full((1, ny, nx), -jnp.inf, jnp.float32)
    heat, feat = render_rcs_maps_pallas(seed_r, seed_v, r_max, interpret=True)
    assert np.all(np.asarray(heat) == 0.0)
    assert np.all(np.asarray(feat) == 0.0)
