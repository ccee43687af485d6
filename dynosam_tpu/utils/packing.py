"""Exact flat-vector packing of array dicts (device) + unpacking (host).

Why: on runtimes where every device->host buffer transfer costs a full
round trip (the tunneled TPU here measures ~60-85 ms per buffer, regardless
of size), draining N frames x 20 small arrays costs minutes while the
compute itself takes under a second. Packing each frame's record into ONE
float32 vector on device — and accumulating frames into one ring buffer —
turns the whole drain into a single transfer.

Exactness: int32 fields are BITCAST into float32 lanes (not value-cast), so
arbitrary ids round-trip exactly; bools go through int32. Hosts unpack by
reinterpreting the bytes back.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def build_packer(sample_tree: Dict[str, jax.ShapeDtypeStruct]):
    """From {key: ShapeDtypeStruct} build (pack_fn, unpack_fn, width).

    pack_fn: dict of device arrays -> (width,) float32 vector (jit-safe).
    unpack_fn: (width,) np.float32 row -> dict of np arrays (original
    shapes/dtypes).
    """
    spec = []
    off = 0
    for k in sorted(sample_tree):
        s = sample_tree[k]
        dt = np.dtype(s.dtype)
        # exactness guard: only dtypes that round-trip through float32
        # lanes are supported. A silent value-cast of f16/f64 (or an int
        # wider/narrower than 32 bits) would corrupt values/dtypes for any
        # future field — fail loudly at build time instead.
        if not (
            dt == np.float32
            or dt == np.bool_
            or (np.issubdtype(dt, np.integer) and dt.itemsize <= 4)
        ):
            raise TypeError(
                f"build_packer: field {k!r} has dtype {dt} — only float32, "
                "bool, and <=32-bit integers pack exactly into float32 lanes"
            )
        size = int(np.prod(s.shape)) if s.shape else 1
        spec.append((k, off, tuple(s.shape), dt))
        off += size
    width = off

    def pack(d):
        parts = []
        for k, _, _, dtype in spec:
            v = d[k]
            if v.dtype == jnp.bool_:
                v = v.astype(jnp.int32)
            if jnp.issubdtype(v.dtype, jnp.integer):
                v = jax.lax.bitcast_convert_type(
                    v.astype(jnp.int32), jnp.float32
                )
            parts.append(jnp.asarray(v, jnp.float32).reshape(-1))
        return jnp.concatenate(parts) if parts else jnp.zeros((0,), jnp.float32)

    def unpack(row: np.ndarray) -> Dict[str, np.ndarray]:
        row = np.asarray(row, np.float32)
        out = {}
        for k, o, shape, dtype in spec:
            size = int(np.prod(shape)) if shape else 1
            flat = row[o : o + size]
            if dtype == np.bool_:
                flat = flat.view(np.int32) != 0
            elif np.issubdtype(dtype, np.integer):
                flat = flat.view(np.int32).astype(dtype)
            out[k] = flat.reshape(shape) if shape else flat.reshape(())[()]
        return out

    return pack, unpack, width
