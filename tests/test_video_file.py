"""Video app file-source path (cv2 capture → pipeline) on a generated clip."""

import numpy as np
import pytest

from ppn_tpu.configs import get_config


def test_capture_frames_from_file(tmp_path):
    cv2 = pytest.importorskip("cv2")

    path = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10,
                        (160, 120))
    if not w.isOpened():
        pytest.skip("no mp4 encoder available")
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
              for _ in range(5)]
    for f in frames:
        w.write(f[..., ::-1])  # writer expects BGR
    w.release()

    from ppn_tpu.apps.video import capture_frames

    got = list(capture_frames(path))
    assert len(got) == 5
    assert got[0].shape == (120, 160, 3)
    # RGB round trip through the codec: lossy but correlated
    corr = np.corrcoef(got[2].ravel().astype(float),
                       frames[2].ravel().astype(float))[0, 1]
    assert corr > 0.5, corr


def test_capture_frames_bad_source():
    pytest.importorskip("cv2")
    from ppn_tpu.apps.video import capture_frames

    with pytest.raises(RuntimeError, match="cannot open"):
        next(capture_frames("/nonexistent/clip.mp4"))


def test_video_main_on_file(tmp_path):
    cv2 = pytest.importorskip("cv2")

    path = str(tmp_path / "clip.mp4")
    cfg = get_config("tiny_test")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 5, (96, 72))
    if not w.isOpened():
        pytest.skip("no mp4 encoder available")
    rng = np.random.default_rng(1)
    for _ in range(3):
        w.write(rng.integers(0, 255, (72, 96, 3), dtype=np.uint8))
    w.release()

    from ppn_tpu.apps import video

    video.main(["--config", "tiny_test", "--source", path, "--json"])


def test_video_main_on_jpeg_dir(tmp_path):
    """--source <dir of JPEGs> streams through the native decode pool."""
    import json as _json

    from PIL import Image

    rng = np.random.default_rng(1)
    d = tmp_path / "jpegs"
    d.mkdir()
    for i in range(3):
        arr = rng.integers(0, 255, (72, 96, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"f{i}.jpg", quality=90)

    import contextlib
    import io as _io

    from ppn_tpu.apps import video

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        video.main(["--config", "tiny_test", "--source", str(d),
                    "--frames", "4", "--json"])
    out = [ln for ln in buf.getvalue().splitlines() if ln.startswith("{")]
    summary = _json.loads(out[-1])
    # the latest-frame slot drops stale frames by design (realtime
    # semantics): at least one decoded JPEG must flow through end-to-end
    assert summary["frames"] >= 1
    assert summary["p50_ms"] > 0


def test_synthetic_frames_prerendered_pool():
    """The synthetic source pre-renders a cycled pool (frame generation
    must not be part of the measured streaming loop)."""
    from ppn_tpu.apps.video import synthetic_frames

    frames = list(synthetic_frames(5, size=(64, 64), pool=2))
    assert len(frames) == 5
    assert frames[0].shape == (64, 64, 3) and frames[0].dtype == np.uint8
    np.testing.assert_array_equal(frames[0], frames[2])  # pool cycles
    assert not np.array_equal(frames[0], frames[1])      # pool is diverse
