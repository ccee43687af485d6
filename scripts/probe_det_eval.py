"""Probe the detector eval's IoU distribution vs engine decode params.

The committed checkpoint's held-out mean per-GT best-mask IoU includes
MISSED instances as zeros, so the mean conflates mask quality with recall.
This probe renders the held-out scenes ONCE, then sweeps engine decode
params (score_threshold, max_detections) and prints, per config: mean IoU,
the zero-IoU (missed) share, and the mean over detected-only instances —
to show whether the gap to the 0.75 gate is segmentation quality or recall.

Usage: python scripts/probe_det_eval.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp
    from flax import serialization

    import scripts.train_detector as td
    from dynosam_tpu.nn import yolov8
    from dynosam_tpu.nn.detector import YoloV8DetectorEngine

    model = yolov8.YoloV8Seg(num_classes=td.NUM_CLASSES, scale=td.SCALE)
    import jax

    x0 = jnp.zeros((1, td.IMG_H, td.IMG_W, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0)
    with open(td.CKPT_PATH, "rb") as f:
        params = serialization.from_bytes(params, f.read())
    params = jax.tree.map(lambda a: a.astype(jnp.float32), params)

    # render held-out scenes once (same seed/protocol as train_detector.eval_iou)
    rng = np.random.default_rng(10_000)
    frames = []
    for _ in range(48):
        scn = td.random_scene(rng)
        cm = td._cls_of_oid(scn)
        fr = scn.frame(int(rng.integers(0, scn.scn.spec.num_frames)))
        frames.append((np.asarray(fr.rgb), np.asarray(fr.mask), cm))
    print(f"rendered {len(frames)} held-out frames", flush=True)

    for mask_thr, box_pad in (
        (0.5, 0.0), (0.5, 2.0), (0.5, 4.0),
        (0.4, 0.0), (0.4, 2.0), (0.35, 2.0),
    ):
            eng = YoloV8DetectorEngine(
                params=params,
                num_classes=td.NUM_CLASSES,
                scale=td.SCALE,
                input_hw=(td.IMG_H, td.IMG_W),
                max_detections=8,
                score_threshold=0.25,
                mask_threshold=mask_thr,
                box_pad=box_pad,
                class_ids=None,
                use_pallas_masks=False,
            )
            ious, hits = [], []
            for rgb, gt, cm in frames:
                label, det = eng.detect(jnp.asarray(rgb))
                label = np.asarray(label)
                det_cls = np.asarray(det.classes)
                for oid in np.unique(gt):
                    if oid <= 0:
                        continue
                    g = gt == oid
                    if g.sum() < 40:
                        continue
                    best, best_lab = 0.0, -1
                    for lab in np.unique(label):
                        if lab <= 0:
                            continue
                        p = label == lab
                        inter = np.logical_and(g, p).sum()
                        union = np.logical_or(g, p).sum()
                        iou = inter / max(union, 1)
                        if iou > best:
                            best, best_lab = iou, lab
                    ious.append(best)
                    if best > 0.1 and best_lab > 0:
                        hits.append(
                            int(det_cls[best_lab - 1]) == int(cm[int(oid)])
                        )
            a = np.asarray(ious)
            det_only = a[a > 0.1]
            print(
                f"mthr={mask_thr:.2f} pad={box_pad:.0f}  n={a.size:3d}  "
                f"mean={a.mean():.3f}  missed={np.mean(a <= 0.1):.1%}  "
                f"mean|detected={det_only.mean():.3f}  "
                f"clsacc={np.mean(hits):.3f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
