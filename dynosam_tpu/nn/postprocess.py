"""YOLOv8-seg post-processing: DFL decode, fixed-shape NMS, mask combination.

TPU-native equivalents of the reference's CUDA kernels
(/root/reference/dynosam_nn/src/YoloV8CudaUtils.cu:23 `YOLO_PostProcess_Kernel`
— decode + confidence threshold — and :80 `YOLO_Mask_Combination_Kernel` —
combine 32 mask coefficients with the prototype basis into per-instance
masks). Everything is shape-static and jit-safe: detections live in a padded
(max_detections,) table with a validity mask, NMS is a fixed-iteration greedy
suppression over score-sorted candidates, and mask combination is one
(K, nm) x (nm, H*W) matmul + sigmoid + box crop (the Pallas variant fuses
all three: ops/pallas/mask_combine.py).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp


class Detections(NamedTuple):
    boxes: jnp.ndarray    # (K, 4) xyxy in input pixels
    scores: jnp.ndarray   # (K,)
    classes: jnp.ndarray  # (K,) int32
    mcoef: jnp.ndarray    # (K, nm) mask coefficients
    valid: jnp.ndarray    # (K,) bool


def decode_level(box_logits, cls_logits, mcoef, stride, reg_max=16):
    """One pyramid level -> flat candidate table.

    box_logits: (H, W, 4*reg_max) DFL logits; distances = E[softmax(bins)]
    in units of stride, anchors at cell centers ((x+0.5)*stride).
    Returns (boxes_xyxy (N,4), scores (N,nc), mcoef (N,nm)).
    """
    H, W = box_logits.shape[:2]
    bl = box_logits.reshape(H, W, 4, reg_max)
    bins = jnp.arange(reg_max, dtype=bl.dtype)
    dist = jnp.sum(jax.nn.softmax(bl, axis=-1) * bins, axis=-1)  # (H,W,4) ltrb
    xs = (jnp.arange(W, dtype=bl.dtype) + 0.5) * stride
    ys = (jnp.arange(H, dtype=bl.dtype) + 0.5) * stride
    cx, cy = jnp.meshgrid(xs, ys)
    d = dist * stride
    x1 = cx - d[..., 0]
    y1 = cy - d[..., 1]
    x2 = cx + d[..., 2]
    y2 = cy + d[..., 3]
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1).reshape(-1, 4)
    scores = jax.nn.sigmoid(cls_logits).reshape(H * W, -1)
    return boxes, scores, mcoef.reshape(H * W, -1)


def decode_all(outputs, strides: Sequence[int] = (8, 16, 32), reg_max=16):
    """All levels of a single image (no batch dim) -> concatenated tables."""
    bs, ss, ms = [], [], []
    for bl, cl, mc, st in zip(
        outputs["boxes"], outputs["cls"], outputs["mcoef"], strides
    ):
        b, s, m = decode_level(bl, cl, mc, st, reg_max)
        bs.append(b)
        ss.append(s)
        ms.append(m)
    return jnp.concatenate(bs), jnp.concatenate(ss), jnp.concatenate(ms)


def _iou_matrix(boxes_a, boxes_b):
    """(A, 4) x (B, 4) xyxy -> (A, B) IoU."""
    ax1, ay1, ax2, ay2 = [boxes_a[:, i] for i in range(4)]
    bx1, by1, bx2, by2 = [boxes_b[:, i] for i in range(4)]
    ix1 = jnp.maximum(ax1[:, None], bx1[None, :])
    iy1 = jnp.maximum(ay1[:, None], by1[None, :])
    ix2 = jnp.minimum(ax2[:, None], bx2[None, :])
    iy2 = jnp.minimum(ay2[:, None], by2[None, :])
    iw = jnp.clip(ix2 - ix1, 0.0, None)
    ih = jnp.clip(iy2 - iy1, 0.0, None)
    inter = iw * ih
    area_a = jnp.clip(ax2 - ax1, 0.0, None) * jnp.clip(ay2 - ay1, 0.0, None)
    area_b = jnp.clip(bx2 - bx1, 0.0, None) * jnp.clip(by2 - by1, 0.0, None)
    return inter / jnp.clip(area_a[:, None] + area_b[None, :] - inter, 1e-9, None)


def nms(
    boxes,
    scores_nc,
    mcoef,
    *,
    max_detections: int = 32,
    pre_topk: int = 256,
    score_threshold: float = 0.25,
    iou_threshold: float = 0.6,
    class_ids: Sequence[int] | None = None,
    class_agnostic: bool = True,
) -> Detections:
    """Fixed-shape greedy NMS.

    1. best class per candidate (optionally restricted to `class_ids` — the
       reference's class filtering, YoloV8ObjectDetector.cc);
    2. top `pre_topk` by score;
    3. greedy suppression among them (vectorized: candidate i survives iff no
       higher-scoring SURVIVING candidate overlaps it — computed with a
       fixed-iteration pass, exact for chains up to the iteration count);
    4. emit the top `max_detections` survivors as a padded table.
    """
    nc = scores_nc.shape[-1]
    if class_ids is not None:
        keep = jnp.zeros((nc,), bool).at[jnp.asarray(class_ids)].set(True)
        scores_nc = jnp.where(keep[None, :], scores_nc, 0.0)
    cls = jnp.argmax(scores_nc, axis=-1).astype(jnp.int32)
    score = jnp.max(scores_nc, axis=-1)
    score = jnp.where(score >= score_threshold, score, 0.0)

    k = min(pre_topk, score.shape[0])
    top_s, top_i = jax.lax.top_k(score, k)
    top_b = boxes[top_i]
    top_c = cls[top_i]
    top_m = mcoef[top_i]

    iou = _iou_matrix(top_b, top_b)
    same_cls = (
        jnp.ones((k, k), bool)
        if class_agnostic
        else top_c[:, None] == top_c[None, :]
    )
    # overlap[i, j]: higher-ranked j suppresses i (j < i by sort order)
    higher = jnp.tril(jnp.ones((k, k), bool), k=-1).T  # [j < i] at (i, j)? ->
    # rows i, cols j: j ranked higher (j < i)
    higher = jnp.arange(k)[None, :] < jnp.arange(k)[:, None]
    overlap = (iou > iou_threshold) & same_cls & higher

    # iterative exact greedy: alive starts all-true; a candidate dies iff an
    # alive higher-ranked candidate overlaps it; iterate to fixpoint (chain
    # length <= k, but suppression chains are short in practice — 8 passes)
    alive = top_s > 0.0

    def body(_, alive):
        killed = jnp.any(overlap & alive[None, :], axis=1)
        return (top_s > 0.0) & ~killed

    alive = jax.lax.fori_loop(0, 8, body, alive)

    # compact the survivors to the front, pad to max_detections
    order = jnp.argsort(jnp.where(alive, -top_s, jnp.inf))
    sel = order[:max_detections]
    valid = alive[sel] & (top_s[sel] > 0.0)
    return Detections(
        boxes=top_b[sel],
        scores=jnp.where(valid, top_s[sel], 0.0),
        classes=jnp.where(valid, top_c[sel], -1),
        mcoef=top_m[sel],
        valid=valid,
    )


def combine_masks(
    det: Detections,
    proto,                      # (Hp, Wp, nm) prototype basis (input/4)
    out_hw,                     # (H, W) of the network input
    mask_threshold: float = 0.5,
    use_pallas: bool = False,
    box_pad: float = 0.0,
):
    """Per-instance masks from coefficients + prototypes, cropped to boxes.

    sigma(proto @ coef_k) upsampled to input resolution, zeroed outside the
    detection box, thresholded — the YOLO_Mask_Combination_Kernel contract
    (YoloV8CudaUtils.cu:80). Returns (K, H, W) bool.

    box_pad: expand the crop box by this many pixels before zeroing — a
    tight regressed box otherwise clips boundary mask pixels (measurable
    IoU loss on small instances at the stride-4 prototype resolution).
    """
    H, W = out_hw
    Hp, Wp, nm = proto.shape
    if use_pallas:
        from dynosam_tpu.ops.pallas.mask_combine import mask_combine_pallas

        low = mask_combine_pallas(proto, det.mcoef)            # (K, Hp, Wp)
    else:
        flat = proto.reshape(Hp * Wp, nm)
        low = jax.nn.sigmoid(det.mcoef @ flat.T).reshape(-1, Hp, Wp)
    masks = jax.image.resize(low, (low.shape[0], H, W), method="bilinear")
    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    b = det.boxes
    inside = (
        (xs >= b[:, 0, None, None] - box_pad)
        & (xs <= b[:, 2, None, None] + box_pad)
        & (ys >= b[:, 1, None, None] - box_pad)
        & (ys <= b[:, 3, None, None] + box_pad)
    )
    return (masks > mask_threshold) & inside & det.valid[:, None, None]


def masks_to_label_image(masks, scores):
    """(K, H, W) bool + (K,) scores -> (H, W) int32 instance-label image
    (0 background, 1..K by detection index; overlaps resolved by score)."""
    K = masks.shape[0]
    s = jnp.where(masks, scores[:, None, None], -jnp.inf)
    best = jnp.argmax(s, axis=0)
    any_hit = jnp.any(masks, axis=0)
    return jnp.where(any_hit, best + 1, 0).astype(jnp.int32)
