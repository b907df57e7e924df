"""Native fused image preprocessing vs the PIL oracle."""

import numpy as np
import pytest
from PIL import Image

from rcbevdet_tpu.data.image_ops_native import available, transform_normalize
from rcbevdet_tpu.data.image_pipeline import (
    IMG_MEAN,
    IMG_STD,
    normalize_image,
    transform_image,
)

pytestmark = pytest.mark.skipif(
    not available(), reason="no C++ toolchain for the native image ops"
)


@pytest.mark.parametrize(
    "resize_dims,crop,flip,rotate",
    [
        ((176, 99), (10, 20, 100, 70), False, 0.0),
        ((176, 99), (10, 20, 100, 70), True, 0.0),
        ((120, 68), (0, 4, 88, 36), False, 4.2),
        ((120, 68), (0, 4, 88, 36), True, -5.1),
    ],
)
def test_native_matches_pil(rng, resize_dims, crop, flip, rotate):
    src = rng.integers(0, 256, (90, 160, 3)).astype(np.uint8)
    img = Image.fromarray(src)
    ref = normalize_image(
        transform_image(img, resize_dims, crop, flip, rotate)
    )
    got = transform_normalize(
        src, resize_dims, crop, flip, rotate, IMG_MEAN.reshape(3),
        IMG_STD.reshape(3),
    )
    # back to 0..255 units for interpretable tolerances
    diff = np.abs(ref - got) * IMG_STD.reshape(1, 1, 3)
    if rotate == 0.0:
        assert diff.max() <= 1.001  # PIL int16 fixed point vs our float
    else:
        # nearest-rotation boundary picks: >=99.9% pixel-exact
        assert (diff > 1.5).mean() < 2e-3
        assert diff.mean() < 0.1


def test_native_batch_matches_single(rng):
    from rcbevdet_tpu.data.image_ops_native import transform_normalize_batch

    n = 5
    imgs = rng.integers(0, 256, (n, 90, 160, 3)).astype(np.uint8)
    rd = np.tile([120, 68], (n, 1))
    crops = np.tile([0, 4, 88, 36], (n, 1))
    flips = np.asarray([0, 1, 0, 1, 0], np.uint8)
    rotates = np.asarray([0.0, 2.0, -3.0, 0.0, 5.0])
    out = transform_normalize_batch(
        imgs, rd, crops, flips, rotates, IMG_MEAN.reshape(3),
        IMG_STD.reshape(3), (32, 88), num_threads=3,
    )
    for i in range(n):
        ref = transform_normalize(
            imgs[i], tuple(rd[i]), tuple(crops[i]), bool(flips[i]),
            float(rotates[i]), IMG_MEAN.reshape(3), IMG_STD.reshape(3),
        )
        np.testing.assert_allclose(out[i], ref, atol=1e-6)
