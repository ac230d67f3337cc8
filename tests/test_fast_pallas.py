"""Pallas fused FAST kernel vs the pure-jnp oracle (interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from orbslam_jpminipc_tpu.ops import fast
from orbslam_jpminipc_tpu.ops.fast_pallas import fast_detect_tpu


@pytest.mark.parametrize("shape", [(97, 140), (64, 128), (130, 257)])
@pytest.mark.parametrize("threshold", [7.0, 20.0])
def test_matches_jnp_oracle(rng, shape, threshold):
    img = jnp.array(rng.integers(0, 255, shape).astype(np.float32))
    ref = np.asarray(fast.nonmax_3x3(fast.fast_score_map(img, threshold)))
    got = np.asarray(fast_detect_tpu(img, threshold, interpret=True))
    np.testing.assert_array_equal(ref, got)


def test_smooth_image_has_no_corners(rng):
    ys = np.arange(80, dtype=np.float32)[:, None]
    img = jnp.array(np.tile(ys, (1, 130)))  # vertical ramp
    got = np.asarray(fast_detect_tpu(img, 7.0, interpret=True))
    # crop the implicit zero-pad boundary like the extractor's border mask
    assert (got[5:-5, 5:-5] == 0).all()
