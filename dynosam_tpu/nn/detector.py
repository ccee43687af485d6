"""Object-detection engine interface (dynosam_nn ObjectDetector parity).

Reference: /root/reference/dynosam_nn/include/dynosam_nn/ObjectDetector.hpp:15
(`ObjectDetectionEngine::process(image) -> ObjectDetectionResult`) and the
TensorRT YOLOv8-seg implementation. The TPU port of an instance-segmentation
network (with Pallas post-processing kernels replacing YoloV8CudaUtils.cu) is
scheduled for a later round; this module defines the stable interface the
tracker consumes plus a mask-passthrough engine for datasets that provide
segmentation.

Contract: `process` returns an int32 (H, W) instance mask with 0 = background
and arbitrary per-frame labels; temporal identity is supplied downstream by
nn.bytetrack (see frontend/tracker.py's untracked-mask path).
"""

from __future__ import annotations

from typing import Protocol

import jax.numpy as jnp


class ObjectDetectionEngine(Protocol):
    def process(self, rgb: jnp.ndarray) -> jnp.ndarray:
        """(H, W, 3) image -> (H, W) int32 instance mask (0 = background)."""
        ...


class MaskPassthroughEngine:
    """Uses externally provided masks (prefer_provided_object_detection)."""

    def __init__(self):
        self._mask = None

    def set_mask(self, mask: jnp.ndarray):
        self._mask = mask

    def process(self, rgb: jnp.ndarray) -> jnp.ndarray:
        if self._mask is None:
            return jnp.zeros(rgb.shape[:2], jnp.int32)
        return self._mask
