"""Native C++ runtime tests: binio contract + ingest parity with PIL.

The native library is required in CI (the toolchain is part of the image);
if it genuinely can't build, the framework still works via the pure-Python
fallbacks, but these tests fail loudly rather than skipping silently.
"""

import numpy as np
import pytest

from resnetc_tpu import native
from resnetc_tpu.data.preprocess import IMAGENET_MEAN, IMAGENET_STD, preprocess_file

FIXTURE = "/root/reference/test_imgs/ILSVRC2012_val_00004749.jpeg"


def test_native_builds_and_loads():
    assert native.available(), "native lib failed to build/load (make -C resnetc_tpu/native)"


def test_write_read_f32_roundtrip(tmp_path):
    arr = np.arange(4096, dtype=np.float32) * 0.5
    path = str(tmp_path / "t.f32")
    native.write_f32(path, arr)
    back = native.read_f32(path, arr.size)
    np.testing.assert_array_equal(back, arr)


def test_read_f32_size_mismatch(tmp_path):
    path = str(tmp_path / "t.f32")
    native.write_f32(path, np.zeros(10, np.float32))
    with pytest.raises(ValueError):
        native.read_f32(path, 20)


def test_read_f32_many_parallel(tmp_path):
    paths, sizes = [], []
    for i in range(20):
        p = str(tmp_path / f"w{i}.f32")
        native.write_f32(p, np.full(100 + i, float(i), np.float32))
        paths.append(p)
        sizes.append(100 + i)
    arrays = native.read_f32_many(paths, sizes)
    for i, a in enumerate(arrays):
        assert a.shape == (100 + i,)
        assert (a == i).all()


def test_read_f32_many_detects_size_mismatch(tmp_path):
    p = str(tmp_path / "w.f32")
    native.write_f32(p, np.zeros(10, np.float32))
    with pytest.raises(ValueError):
        native.read_f32_many([p], [11])


def test_native_preprocess_matches_pil():
    """Decode+resize+crop+normalize must match the PIL path to within one
    uint8 quantisation step per channel (the two resamplers round
    intermediates differently by at most 1 level)."""
    pil = preprocess_file(FIXTURE)[0]
    nat = native.preprocess_files(
        [FIXTURE], resize=232, crop=224, mean=IMAGENET_MEAN, std=IMAGENET_STD
    )[0]
    assert nat.shape == pil.shape == (224, 224, 3)
    one_level = 1.0 / 255.0 / IMAGENET_STD  # one u8 step in normalized units
    diff = np.abs(pil - nat)
    assert (diff <= one_level[None, None, :] + 1e-5).all(), diff.max()
    # And almost everywhere they agree exactly.
    frac_exact = (diff < 1e-6).mean()
    assert frac_exact > 0.9, frac_exact


def test_native_preprocess_batch_threads():
    out = native.preprocess_files(
        [FIXTURE] * 6, resize=232, crop=224,
        mean=IMAGENET_MEAN, std=IMAGENET_STD, num_threads=3,
    )
    assert out.shape == (6, 224, 224, 3)
    np.testing.assert_array_equal(out[0], out[5])


def test_native_preprocess_bad_file(tmp_path):
    bad = tmp_path / "bad.jpeg"
    bad.write_bytes(b"definitely not a jpeg")
    with pytest.raises(ValueError):
        native.preprocess_files(
            [str(bad)], resize=232, crop=224,
            mean=IMAGENET_MEAN, std=IMAGENET_STD,
        )
