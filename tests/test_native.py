"""Native IO runtime vs Python-reference parity + prefetcher."""

import numpy as np
import pytest

from dynosam_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)

H, W = 37, 53


@pytest.fixture(scope="module")
def files(tmp_path_factory):
    root = tmp_path_factory.mktemp("native_io")
    rng = np.random.default_rng(0)
    flow = rng.standard_normal((H, W, 2)).astype(np.float32)
    flo = root / "f.flo"
    with open(flo, "wb") as f:
        np.float32(202021.25).tofile(f)
        np.int32(W).tofile(f)
        np.int32(H).tofile(f)
        flow.tofile(f)
    mask = rng.integers(-1, 30, (H, W)).astype(np.int32)
    txt = root / "m.txt"
    np.savetxt(txt, mask, fmt="%d")
    return str(flo), str(txt), flow, mask


def test_read_flo(files):
    flo, _, flow, _ = files
    out = native.read_flo(flo, H, W)
    np.testing.assert_array_equal(out, flow)


def test_read_txt_mask(files):
    _, txt, _, mask = files
    out = native.read_txt_mask(txt, H, W)
    np.testing.assert_array_equal(out, mask)


def test_bad_flo_magic(tmp_path):
    p = tmp_path / "bad.flo"
    p.write_bytes(b"\x00" * 64)
    with pytest.raises(ValueError):
        native.read_flo(str(p), 2, 2)


def test_disparity_to_depth():
    raw = np.array([[0, 256, 512]], np.uint16)
    out = native.disparity_to_depth(raw, base_line=387.5744, scale=256.0)
    np.testing.assert_allclose(out[0, 1], 387.5744, rtol=1e-6)
    np.testing.assert_allclose(out[0, 2], 387.5744 / 2, rtol=1e-6)
    assert out[0, 0] == 0.0


def test_prefetcher(files):
    flo, txt, flow, mask = files
    pf = native.Prefetcher(n_workers=2)
    for frame in range(4):
        pf.submit(frame, flo, txt, H, W)
    # collect out of order
    for frame in [2, 0, 3, 1]:
        f_out, m_out = pf.collect(frame, H, W)
        np.testing.assert_array_equal(f_out, flow)
        np.testing.assert_array_equal(m_out, mask)
    pf.close()
