"""Ultralytics YOLOv8-seg checkpoint import.

Maps an ultralytics `state_dict` (torch tensor names `model.{idx}.{...}`)
onto the flax module tree of nn/yolov8.py. The reference consumes the same
network via ONNX->TensorRT export
(/root/reference/dynosam_nn/export/export_yolo_tensorrt.py); here the
weights map directly onto the JAX model.

Offline note: full ultralytics .pt checkpoints pickle the ultralytics Module
class and cannot be unpickled without the package. Export a plain state_dict
first (`torch.save(model.model.state_dict(), "sd.pt")`) — this loader takes
either that file path or an in-memory dict of tensors/ndarrays.

Layer-index map (yolov8-seg.yaml): 0-9 backbone, 12/15 FPN C2f, 16-21 PAN,
22 Segment head (cv2=box, cv3=cls, cv4=mask-coef, proto, dfl).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

# our module name -> ultralytics layer index
_BLOCK_MAP = {
    "b0": 0, "b1": 1, "b2": 2, "b3": 3, "b4": 4,
    "b5": 5, "b6": 6, "b7": 7, "b8": 8, "b9": 9,
    "n12": 12, "n15": 15, "n16": 16, "n18": 18, "n19": 19, "n21": 21,
}


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _conv_k(t):
    """torch Conv2d (O, I, H, W) -> flax (H, W, I, O)."""
    return _np(t).transpose(2, 3, 1, 0)


def _deconv_k(t):
    """torch ConvTranspose2d (I, O, H, W) -> flax (H, W, I, O)."""
    return _np(t).transpose(2, 3, 0, 1)


class _TreeWriter:
    def __init__(self):
        self.params: Dict[str, Any] = {}
        self.stats: Dict[str, Any] = {}

    def _set(self, root, path, value):
        d = root
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = value

    def conv_bn(self, sd, prefix, path):
        """ultralytics Conv (conv + bn) -> our ConvBnSiLU at `path`."""
        self._set(self.params, path + ("conv", "kernel"), _conv_k(sd[prefix + ".conv.weight"]))
        self._set(self.params, path + ("bn", "scale"), _np(sd[prefix + ".bn.weight"]))
        self._set(self.params, path + ("bn", "bias"), _np(sd[prefix + ".bn.bias"]))
        self._set(self.stats, path + ("bn", "mean"), _np(sd[prefix + ".bn.running_mean"]))
        self._set(self.stats, path + ("bn", "var"), _np(sd[prefix + ".bn.running_var"]))

    def conv_bias(self, sd, prefix, path):
        self._set(self.params, path + ("kernel",), _conv_k(sd[prefix + ".weight"]))
        self._set(self.params, path + ("bias",), _np(sd[prefix + ".bias"]))

    def c2f(self, sd, idx, name, n):
        p = f"model.{idx}"
        self.conv_bn(sd, p + ".cv1", (name, "cv1"))
        self.conv_bn(sd, p + ".cv2", (name, "cv2"))
        for i in range(n):
            self.conv_bn(sd, f"{p}.m.{i}.cv1", (name, f"m{i}", "cv1"))
            self.conv_bn(sd, f"{p}.m.{i}.cv2", (name, f"m{i}", "cv2"))


def _count_bottlenecks(sd, idx):
    n = 0
    while f"model.{idx}.m.{n}.cv1.conv.weight" in sd:
        n += 1
    return n


def load_ultralytics_weights(state_dict_or_path, num_classes=80, scale="n"):
    """Build flax variables {'params':..., 'batch_stats':...} from an
    ultralytics YOLOv8-seg state_dict (dict or torch-saved file path)."""
    sd = state_dict_or_path
    if isinstance(sd, (str, bytes)):
        import torch

        sd = torch.load(sd, map_location="cpu", weights_only=True)
    # strip a leading "model." double prefix if the dict came from
    # model.state_dict() of the wrapping ultralytics Model
    if any(k.startswith("model.model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items() if k.startswith("model.")}

    w = _TreeWriter()
    for name, idx in _BLOCK_MAP.items():
        p = f"model.{idx}"
        if f"{p}.conv.weight" in sd:                    # plain Conv block
            w.conv_bn(sd, p, (name,))
        elif f"{p}.m.0.cv1.conv.weight" in sd:          # C2f
            w.c2f(sd, idx, name, _count_bottlenecks(sd, idx))
        elif f"{p}.cv1.conv.weight" in sd:              # SPPF (cv1/cv2 only)
            w.conv_bn(sd, p + ".cv1", (name, "cv1"))
            w.conv_bn(sd, p + ".cv2", (name, "cv2"))
        else:
            raise KeyError(f"cannot find ultralytics layer {idx} for {name}")

    # Segment head (layer 22): cv2 = box, cv3 = cls, cv4 = mask coefficients
    head = "model.22"
    for lvl in range(3):
        for branch, ours in (("cv2", "box"), ("cv3", "cls"), ("cv4", "m")):
            base = f"{head}.{branch}.{lvl}"
            w.conv_bn(sd, f"{base}.0", (f"{ours}{lvl}_0",))
            w.conv_bn(sd, f"{base}.1", (f"{ours}{lvl}_1",))
            w.conv_bias(sd, f"{base}.2", (f"{ours}{lvl}_2",))

    # proto
    w.conv_bn(sd, f"{head}.proto.cv1", ("proto", "cv1"))
    w._set(
        w.params,
        ("proto", "upsample", "kernel"),
        _deconv_k(sd[f"{head}.proto.upsample.weight"]),
    )
    w._set(
        w.params,
        ("proto", "upsample", "bias"),
        _np(sd[f"{head}.proto.upsample.bias"]),
    )
    w.conv_bn(sd, f"{head}.proto.cv2", ("proto", "cv2"))
    w.conv_bn(sd, f"{head}.proto.cv3", ("proto", "cv3"))

    import jax.numpy as jnp

    to_jnp = lambda tree: {
        k: to_jnp(v) if isinstance(v, dict) else jnp.asarray(v)
        for k, v in tree.items()
    }
    return {"params": to_jnp(w.params), "batch_stats": to_jnp(w.stats)}
