"""Native C++ JPEG loader tests (auto-built; PIL is the reference)."""

import io

import numpy as np
import pytest
from PIL import Image

from ppn_tpu.native import loader as nl


def _jpeg_bytes(rng, h=240, w=320):
    img = Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=92)
    return buf.getvalue(), np.asarray(img.convert("RGB"))


def test_native_builds_and_loads():
    assert nl.available(), "native loader failed to build (g++/libjpeg?)"


def _smooth_jpeg(h=240, w=320):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.stack([xx / w, yy / h, (xx + yy) / (w + h)], -1)
    img = (img * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=95)
    return buf.getvalue()


def test_decode_resize_matches_pil():
    # smooth image: PIL's antialiased downscale vs pure bilinear agree
    # closely here (white noise would not — different filters)
    jpeg = _smooth_jpeg()
    out = nl.decode_resize(jpeg, (128, 160))
    assert out.shape == (128, 160, 3) and out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0

    img = Image.open(io.BytesIO(jpeg)).convert("RGB").resize(
        (160, 128), Image.BILINEAR)
    ref = np.asarray(img, np.float32) / 255.0
    # same libjpeg underneath; bilinear kernels differ slightly at edges
    assert np.abs(out - ref).mean() < 0.02
    corr = np.corrcoef(out.ravel(), ref.ravel())[0, 1]
    assert corr > 0.98, corr


def test_decode_identity_size_exact():
    """No resize (out size == source size) ⇒ pixels match PIL decode."""
    rng = np.random.default_rng(1)
    jpeg, _ = _jpeg_bytes(rng, h=64, w=64)
    out = nl.decode_resize(jpeg, (64, 64))
    ref = np.asarray(
        Image.open(io.BytesIO(jpeg)).convert("RGB"), np.float32) / 255.0
    np.testing.assert_allclose(out, ref, atol=1.5e-2)


def test_corrupt_jpeg_raises():
    with pytest.raises(ValueError, match="decode failed"):
        nl.decode_resize(b"not a jpeg at all", (64, 64))


def test_async_pool_out_of_order_ids():
    rng = np.random.default_rng(2)
    pool = nl.NativeJpegLoader((96, 96), num_workers=3)
    try:
        jpegs = {}
        for i in range(8):
            j, _ = _jpeg_bytes(rng, h=100 + i, w=150)
            jpegs[i] = j
            pool.submit(i, j)
        got = {}
        for _ in range(8):
            rid, frame = pool.get()
            assert frame is not None
            assert frame.shape == (96, 96, 3)
            got[rid] = frame
        assert set(got) == set(range(8))
        # frames differ per id (not all the same buffer)
        assert not np.array_equal(got[0], got[1])
    finally:
        pool.close()


def test_async_pool_reports_failures():
    pool = nl.NativeJpegLoader((32, 32), num_workers=1)
    try:
        pool.submit(5, b"garbage")
        rid, frame = pool.get()
        assert rid == 5 and frame is None
    finally:
        pool.close()


def test_jpeg_dims_header_only():
    rng = np.random.default_rng(3)
    jpeg, _ = _jpeg_bytes(rng, h=123, w=77)
    assert nl.jpeg_dims(jpeg) == (77, 123)  # (W, H)
    with pytest.raises(ValueError):
        nl.jpeg_dims(b"not a jpeg at all")


def test_dataset_loads_jpeg_via_native(tmp_path):
    """MPIIDataset routes .jpg files through the native decoder and scales
    GT by the original image size (VERDICT r2 next #3: loader was
    orphaned)."""
    import json

    from PIL import Image

    from ppn_tpu.configs import get_config
    from ppn_tpu.data.mpii import MPIIDataset

    cfg = get_config("tiny_test")
    (tmp_path / "images").mkdir()
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (128, 192, 3), dtype=np.uint8)
    Image.fromarray(arr).save(tmp_path / "images" / "a.jpg", quality=95)
    ann = [{
        "image": "a.jpg",
        "joints": [[10.0 + i, 20.0 + i] for i in range(16)],
        "joints_vis": [1] * 16,
    }]
    (tmp_path / "train.json").write_text(json.dumps(ann))

    for native in (True, False):
        ds = MPIIDataset(cfg, str(tmp_path), "train.json",
                         native_jpeg=native)
        s = ds[0]
        Ht, Wt = cfg.model.insize
        assert s["image"].shape == (Ht, Wt, 3)
        assert s["image"].dtype == np.float32
        assert 0.0 <= s["image"].min() and s["image"].max() <= 1.0
        # GT scaled by ORIGINAL dims regardless of decode path
        # (joints are remapped by ds.perm into config keypoint order)
        want = (np.asarray([[10.0 + i, 20.0 + i] for i in range(16)],
                           np.float32)[np.asarray(ds.perm)]
                * np.asarray([Wt / 192, Ht / 128], np.float32))
        np.testing.assert_allclose(s["keypoints"][0], want, rtol=1e-5)

    # both decode paths agree closely on a real (smooth-ish) image
    a = MPIIDataset(cfg, str(tmp_path), "train.json", native_jpeg=True)[0]
    b = MPIIDataset(cfg, str(tmp_path), "train.json", native_jpeg=False)[0]
    assert np.abs(a["image"] - b["image"]).mean() < 0.12  # filter diff
