"""Pallas kernel parity tests (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from dynosam_tpu.frontend.tracker import shi_tomasi_response
from dynosam_tpu.ops.pallas.shi_tomasi import shi_tomasi_response_pallas


def test_shi_tomasi_parity_interpret():
    img = jnp.asarray(np.random.default_rng(0).random((128, 256), np.float32))
    ref = shi_tomasi_response(img)
    out = shi_tomasi_response_pallas(img, interpret=True)
    np.testing.assert_allclose(
        np.asarray(out[4:-4, 4:-4]), np.asarray(ref[4:-4, 4:-4]), atol=1e-5
    )


def test_shi_tomasi_vmap_rule_interpret():
    """The custom batching rule must produce per-image results identical to
    mapping the unbatched kernel (no halo leak across the batch axis)."""
    import jax

    from dynosam_tpu.ops.pallas import shi_tomasi as st

    imgs = jnp.asarray(
        np.random.default_rng(5).random((3, 128, 256), np.float32)
    )
    batched = st._call_batched(imgs, st._TILE_H, interpret=True)
    for b in range(3):
        single = st._call_unbatched(imgs[b], st._TILE_H, True)
        np.testing.assert_allclose(
            np.asarray(batched[b])[2:-2, 2:-2],
            np.asarray(single)[2:-2, 2:-2],
            atol=1e-5,
        )
