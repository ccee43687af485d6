"""utils/packing.py: exact flat-vector packing (the deferred-throughput
drain path's correctness depends on bit-exact int/bool round trips)."""

import jax
import jax.numpy as jnp
import numpy as np

from dynosam_tpu.utils.packing import build_packer


def test_pack_unpack_roundtrip_exact():
    rng = np.random.default_rng(0)
    rec = {
        "f": jnp.asarray(rng.standard_normal((3, 4)).astype(np.float32)),
        "i": jnp.asarray(
            rng.integers(-(2**31), 2**31 - 1, (7,), dtype=np.int64).astype(
                np.int32
            )
        ),
        "b": jnp.asarray(rng.integers(0, 2, (5,)).astype(bool)),
        "s": jnp.asarray(np.float32(3.25)),  # scalar
    }
    shapes = {k: jax.ShapeDtypeStruct(v.shape, v.dtype) for k, v in rec.items()}
    pack, unpack, width = build_packer(shapes)
    row = np.asarray(jax.jit(pack)(rec))
    assert row.shape == (width,) and row.dtype == np.float32
    out = unpack(row)
    np.testing.assert_array_equal(out["f"], np.asarray(rec["f"]))
    # int32 must round-trip BIT-exactly (ids can exceed float32's 2^24)
    np.testing.assert_array_equal(out["i"], np.asarray(rec["i"]))
    assert out["i"].dtype == np.int32
    np.testing.assert_array_equal(out["b"], np.asarray(rec["b"]))
    assert out["b"].dtype == np.bool_
    assert float(out["s"]) == 3.25


def test_ring_buffer_rows_independent():
    shapes = {"x": jax.ShapeDtypeStruct((2,), jnp.float32)}
    pack, unpack, width = build_packer(shapes)
    buf = jnp.zeros((4, width), jnp.float32)
    write = jax.jit(
        lambda b, i, v: b.at[i].set(pack({"x": v})), donate_argnums=0
    )
    for i in range(3):
        buf = write(buf, jnp.asarray(i, jnp.int32), jnp.full((2,), float(i)))
    rows = np.asarray(buf[:3])
    for i in range(3):
        np.testing.assert_array_equal(unpack(rows[i])["x"], [i, i])


def test_unsupported_dtype_rejected():
    """f16/f64/int64 fields would silently value-cast through float32 lanes;
    build_packer must refuse them at build time (round-4 advisor)."""
    import pytest

    for bad in (jnp.float16, jnp.float64, jnp.int64):
        shapes = {"x": jax.ShapeDtypeStruct((2,), bad)}
        with pytest.raises(TypeError, match="pack exactly"):
            build_packer(shapes)
    # narrow ints are fine: every value round-trips through int32 exactly
    shapes = {"x": jax.ShapeDtypeStruct((2,), jnp.uint8)}
    pack, unpack, width = build_packer(shapes)
    out = unpack(np.asarray(pack({"x": jnp.asarray([7, 255], jnp.uint8)})))
    np.testing.assert_array_equal(out["x"], [7, 255])
    assert out["x"].dtype == np.uint8
