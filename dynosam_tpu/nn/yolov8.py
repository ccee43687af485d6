"""YOLOv8-seg instance-segmentation network, TPU-native (flax/linen, NHWC).

From-scratch JAX implementation of the architecture the reference runs via
TensorRT (/root/reference/dynosam_nn/src/YoloV8ObjectDetector.cc — engine
load + enqueue; the network itself is ultralytics YOLOv8-seg, exported at
/root/reference/dynosam_nn/export/export_yolo_tensorrt.py). Here the network
IS the framework's code: bf16-friendly NHWC convs that XLA maps onto the MXU,
one jitted forward for all three pyramid levels.

Structure (ultralytics yolov8-seg.yaml, public architecture):
  backbone: stem + 4 stages of (stride-2 Conv, C2f) + SPPF
  neck:     FPN top-down (upsample + concat + C2f) then PAN bottom-up
  heads:    per-level box branch (4*reg_max DFL logits), class branch (nc),
            mask-coefficient branch (nm), plus a Proto mask-basis head on P3
Scales: n/s/m/l/x via (depth, width, max_channels) multipliers.

Weight import from ultralytics .pt checkpoints: `load_ultralytics_weights`
in nn/weights.py maps the state_dict onto this module tree.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

SCALES = {
    # depth, width, max_channels
    # "t" is repo-local (no ultralytics counterpart): a ~0.9M-param variant
    # for the in-repo synthetic training pipeline (scripts/train_detector.py)
    # where 80-class COCO capacity is wasted; width 0.125 keeps every layer
    # MXU-aligned via _make_divisible's 8-multiple rounding.
    "t": (0.34, 0.125, 1024),
    "n": (0.34, 0.25, 1024),
    "s": (0.34, 0.50, 1024),
    "m": (0.67, 0.75, 768),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.25, 512),
}


def _make_divisible(x: float, divisor: int = 8) -> int:
    return max(divisor, int(x + divisor / 2) // divisor * divisor)


def _scale_ch(c: int, width: float, max_ch: int) -> int:
    return _make_divisible(min(c, max_ch) * width)


def _scale_n(n: int, depth: float) -> int:
    return max(1, round(n * depth))


class ConvBnSiLU(nn.Module):
    """Conv2d + BatchNorm + SiLU — ultralytics' `Conv` block."""

    out_ch: int
    kernel: int = 1
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.kernel // 2
        x = nn.Conv(
            self.out_ch,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((p, p), (p, p)),
            use_bias=False,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-3,
            name="bn",
        )(x)
        return nn.silu(x)


class Bottleneck(nn.Module):
    out_ch: int
    shortcut: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBnSiLU(self.out_ch, 3, name="cv1")(x, train)
        y = ConvBnSiLU(self.out_ch, 3, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.out_ch:
            y = x + y
        return y


class C2f(nn.Module):
    """Cross-stage partial block with n bottlenecks (ultralytics C2f)."""

    out_ch: int
    n: int = 1
    shortcut: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = self.out_ch // 2
        y = ConvBnSiLU(2 * c, 1, name="cv1")(x, train)
        parts = [y[..., :c], y[..., c:]]
        for i in range(self.n):
            parts.append(
                Bottleneck(c, self.shortcut, name=f"m{i}")(parts[-1], train)
            )
        return ConvBnSiLU(self.out_ch, 1, name="cv2")(
            jnp.concatenate(parts, axis=-1), train
        )


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 chained 5x5 maxpools."""

    out_ch: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1] // 2
        x = ConvBnSiLU(c, 1, name="cv1")(x, train)
        p1 = nn.max_pool(x, (5, 5), strides=(1, 1), padding="SAME")
        p2 = nn.max_pool(p1, (5, 5), strides=(1, 1), padding="SAME")
        p3 = nn.max_pool(p2, (5, 5), strides=(1, 1), padding="SAME")
        return ConvBnSiLU(self.out_ch, 1, name="cv2")(
            jnp.concatenate([x, p1, p2, p3], axis=-1), train
        )


class Proto(nn.Module):
    """Mask prototype head on P3: conv -> 2x deconv -> conv -> nm channels."""

    mid_ch: int
    nm: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBnSiLU(self.mid_ch, 3, name="cv1")(x, train)
        x = nn.ConvTranspose(
            self.mid_ch, (2, 2), strides=(2, 2), use_bias=True, name="upsample"
        )(x)
        x = ConvBnSiLU(self.mid_ch, 3, name="cv2")(x, train)
        return ConvBnSiLU(self.nm, 1, name="cv3")(x, train)


def _upsample2(x):
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), method="nearest")


class YoloV8Seg(nn.Module):
    """Full segmentation model. Input NHWC float (0..1); returns per-level
    raw head outputs + prototypes:

      boxes:  list of (B, Hl, Wl, 4*reg_max) DFL logits
      cls:    list of (B, Hl, Wl, nc) class logits
      mcoef:  list of (B, Hl, Wl, nm) mask coefficients (raw; tanh-free)
      proto:  (B, H/4, W/4, nm) mask basis
    """

    num_classes: int = 80
    scale: str = "n"
    reg_max: int = 16
    nm: int = 32

    @nn.compact
    def __call__(self, x, train: bool = False):
        depth, width, max_ch = SCALES[self.scale]
        ch = lambda c: _scale_ch(c, width, max_ch)
        nrep = lambda n: _scale_n(n, depth)

        # ---- backbone -----------------------------------------------------
        x = ConvBnSiLU(ch(64), 3, 2, name="b0")(x, train)        # /2
        x = ConvBnSiLU(ch(128), 3, 2, name="b1")(x, train)       # /4
        x = C2f(ch(128), nrep(3), True, name="b2")(x, train)
        x = ConvBnSiLU(ch(256), 3, 2, name="b3")(x, train)       # /8
        p3 = C2f(ch(256), nrep(6), True, name="b4")(x, train)
        x = ConvBnSiLU(ch(512), 3, 2, name="b5")(p3, train)      # /16
        p4 = C2f(ch(512), nrep(6), True, name="b6")(x, train)
        x = ConvBnSiLU(ch(1024), 3, 2, name="b7")(p4, train)     # /32
        x = C2f(ch(1024), nrep(3), True, name="b8")(x, train)
        p5 = SPPF(ch(1024), name="b9")(x, train)

        # ---- neck: FPN top-down -------------------------------------------
        u4 = jnp.concatenate([_upsample2(p5), p4], axis=-1)
        n4 = C2f(ch(512), nrep(3), False, name="n12")(u4, train)
        u3 = jnp.concatenate([_upsample2(n4), p3], axis=-1)
        n3 = C2f(ch(256), nrep(3), False, name="n15")(u3, train)  # P3 out

        # PAN bottom-up
        d4 = ConvBnSiLU(ch(256), 3, 2, name="n16")(n3, train)
        m4 = C2f(ch(512), nrep(3), False, name="n18")(
            jnp.concatenate([d4, n4], axis=-1), train
        )                                                          # P4 out
        d5 = ConvBnSiLU(ch(512), 3, 2, name="n19")(m4, train)
        m5 = C2f(ch(1024), nrep(3), False, name="n21")(
            jnp.concatenate([d5, p5], axis=-1), train
        )                                                          # P5 out

        feats = [n3, m4, m5]

        # ---- heads ----------------------------------------------------------
        c_box = max(16, feats[0].shape[-1] // 4, 4 * self.reg_max)
        c_cls = max(feats[0].shape[-1], min(self.num_classes, 100))
        c_m = max(feats[0].shape[-1] // 4, self.nm)

        boxes, clss, mcoefs = [], [], []
        for i, f in enumerate(feats):
            b = ConvBnSiLU(c_box, 3, name=f"box{i}_0")(f, train)
            b = ConvBnSiLU(c_box, 3, name=f"box{i}_1")(b, train)
            boxes.append(
                nn.Conv(4 * self.reg_max, (1, 1), name=f"box{i}_2")(b)
            )
            c = ConvBnSiLU(c_cls, 3, name=f"cls{i}_0")(f, train)
            c = ConvBnSiLU(c_cls, 3, name=f"cls{i}_1")(c, train)
            clss.append(nn.Conv(self.num_classes, (1, 1), name=f"cls{i}_2")(c))
            m = ConvBnSiLU(c_m, 3, name=f"m{i}_0")(f, train)
            m = ConvBnSiLU(c_m, 3, name=f"m{i}_1")(m, train)
            mcoefs.append(nn.Conv(self.nm, (1, 1), name=f"m{i}_2")(m))

        proto = Proto(_scale_ch(256, width, max_ch), self.nm, name="proto")(
            feats[0], train
        )
        return {"boxes": boxes, "cls": clss, "mcoef": mcoefs, "proto": proto}


def strides_for(input_hw: Tuple[int, int]) -> Sequence[int]:
    return (8, 16, 32)


def init_params(
    key, num_classes=80, scale="n", input_hw=(384, 640), dtype=jnp.float32
):
    model = YoloV8Seg(num_classes=num_classes, scale=scale)
    x = jnp.zeros((1, input_hw[0], input_hw[1], 3), dtype)
    variables = model.init(key, x)
    return model, variables
