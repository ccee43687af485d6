"""Pallas TPU kernel: YOLO mask combination (coefficients x prototype basis).

Parity target: the reference's CUDA `YOLO_Mask_Combination_Kernel`
(/root/reference/dynosam_nn/src/YoloV8CudaUtils.cu:80) — per detection k,
mask_k(h, w) = sigmoid(sum_c coef[k, c] * proto[c, h, w]).

One fused kernel: tiles the prototype plane over the spatial axis, keeps the
(K, nm) coefficient table resident in VMEM, and emits sigmoid(coef @ proto)
without materializing the pre-activation logits in HBM (the XLA lowering
round-trips the (K, HW) logits; this kernel writes the activated masks once).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(coef_ref, proto_ref, out_ref):
    # coef: (K, nm), proto block: (nm, T) -> out block: (K, T)
    logits = jnp.dot(
        coef_ref[:], proto_ref[:], preferred_element_type=jnp.float32
    )
    out_ref[:] = jax.nn.sigmoid(logits)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def mask_combine_pallas(proto, coef, tile: int = 512, interpret: bool = False):
    """proto: (Hp, Wp, nm) float; coef: (K, nm) -> (K, Hp, Wp) sigmoid masks."""
    Hp, Wp, nm = proto.shape
    K = coef.shape[0]
    HW = Hp * Wp

    # pad to hardware-friendly shapes (f32 min tile 8 x 128)
    Kp = _round_up(max(K, 8), 8)
    HWp = _round_up(HW, tile)
    nmp = _round_up(max(nm, 8), 8)

    proto_t = jnp.transpose(proto.reshape(HW, nm))           # (nm, HW)
    proto_t = jnp.pad(proto_t, ((0, nmp - nm), (0, HWp - HW)))
    coef_p = jnp.pad(
        coef.astype(jnp.float32), ((0, Kp - K), (0, nmp - nm))
    )

    out = pl.pallas_call(
        _kernel,
        grid=(HWp // tile,),
        in_specs=[
            pl.BlockSpec((Kp, nmp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (nmp, tile), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (Kp, tile), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Kp, HWp), jnp.float32),
        interpret=interpret,
    )(coef_p, proto_t.astype(jnp.float32))

    return out[:K, :HW].reshape(K, Hp, Wp)
