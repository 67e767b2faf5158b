"""Ingest pipeline tests: preprocessing semantics + the reference .bin contract."""

import numpy as np
import pytest
from PIL import Image

from resnetc_tpu.data import (
    BatchLoader,
    IMAGENET_MEAN,
    IMAGENET_STD,
    load_input_bin,
    preprocess_file,
    preprocess_image,
    save_input_bin,
    synthetic_batches,
)

FIXTURE = "/root/reference/test_imgs/ILSVRC2012_val_00004749.jpeg"


def test_preprocess_shapes_and_layouts():
    img = Image.open(FIXTURE)
    nhwc = preprocess_image(img, layout="NHWC")
    nchw = preprocess_image(img, layout="NCHW")
    assert nhwc.shape == (1, 224, 224, 3)
    assert nchw.shape == (1, 3, 224, 224)
    np.testing.assert_array_equal(nhwc.transpose(0, 3, 1, 2), nchw)


def test_preprocess_normalization_constants():
    """A mid-gray image must map to exactly (0.5-mean)/std per channel."""
    gray = Image.new("RGB", (300, 280), (128, 128, 128))
    out = preprocess_image(gray)[0]
    expected = (128 / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(out[50, 50], expected, rtol=1e-5)
    np.testing.assert_allclose(out[0, 0], expected, rtol=1e-5)


def test_preprocess_resizes_short_side_then_center_crops():
    # 100x50 (WxH): short side H -> 232, so W -> 464; crop center 224.
    img = Image.new("RGB", (100, 50))
    out = preprocess_image(img)
    assert out.shape == (1, 224, 224, 3)


def test_input_bin_roundtrip_reference_contract(tmp_path):
    """.bin files are flat NCHW little-endian f32 (convert_imgs_to_bin.py:21-23)."""
    x = preprocess_file(FIXTURE)  # NHWC
    path = tmp_path / "img.bin"
    save_input_bin(x, path)
    raw = np.fromfile(path, dtype="<f4")
    assert raw.size == 3 * 224 * 224
    np.testing.assert_array_equal(raw.reshape(1, 3, 224, 224), x.transpose(0, 3, 1, 2))
    back = load_input_bin(path)
    np.testing.assert_array_equal(back, x)


def test_load_input_bin_size_check(tmp_path):
    (tmp_path / "bad.bin").write_bytes(b"\x00" * 40)
    with pytest.raises(ValueError):
        load_input_bin(tmp_path / "bad.bin")


def test_batch_loader_produces_device_batches():
    loader = BatchLoader([FIXTURE], batch_size=2, steps=3, image_size=96)
    batches = list(loader)
    assert len(batches) == 3
    for b in batches:
        assert b.shape == (2, 96, 96, 3)
        assert b.dtype == np.float32
    # Same source image everywhere -> identical rows.
    np.testing.assert_array_equal(np.asarray(batches[0])[0], np.asarray(batches[0])[1])


def test_batch_loader_rejects_empty_and_undersized():
    with pytest.raises(ValueError):
        BatchLoader([], batch_size=1)
    with pytest.raises(ValueError):
        BatchLoader([FIXTURE], batch_size=2)  # one image, no steps given


def test_batch_loader_surfaces_decode_errors(tmp_path):
    bad = tmp_path / "corrupt.jpeg"
    bad.write_bytes(b"not a jpeg")
    with pytest.raises(Exception):
        list(BatchLoader([bad], batch_size=1, steps=1))


def test_batch_loader_abandoned_iteration_stops_producer():
    """Breaking out of iteration early must not leak the producer thread
    blocked on a full queue (the take(it, n) pattern in cmd_train)."""
    import threading
    import time

    before = {t.ident for t in threading.enumerate()}
    loader = BatchLoader([FIXTURE], batch_size=1, steps=100, image_size=64, prefetch=2)
    for _ in loader:
        break  # abandon after one batch — producer is mid-stream, queue fills
    deadline = time.monotonic() + 10.0
    while time.monotonic() < deadline:
        leaked = [
            t for t in threading.enumerate()
            if t.ident not in before and t.is_alive()
        ]
        if not leaked:
            break
        time.sleep(0.05)
    assert not leaked, f"producer thread(s) leaked after abandoned iteration: {leaked}"


def test_synthetic_batches():
    it = synthetic_batches(batch_size=4, image_size=32, steps=2, num_classes=10)
    (x1, y1), (x2, y2) = list(it)
    assert x1.shape == (4, 32, 32, 3) and y1.shape == (4,)
    assert int(y1.max()) < 10
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
