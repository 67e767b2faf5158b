"""Image preprocessing: the torchvision ImageNet eval transform, standalone.

Reimplements what the reference gets from
``ResNet152_Weights.IMAGENET1K_V1.transforms()`` (convert_imgs_to_bin.py:12):
resize the short side (bilinear), center-crop, scale to [0,1], normalize with
the ImageNet mean/std.  torchvision is not a dependency — decode is PIL,
everything after is numpy, and the output feeds ``jax.device_put`` directly.

Also reads/writes the reference's input-binary contract: a flat headerless
little-endian float32 file holding the preprocessed NCHW tensor
(convert_imgs_to_bin.py:21-23, consumed at main.cu:236-237).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
from PIL import Image

# Exact torchvision constants (convert_imgs_to_bin.py via the weights
# transform; also pytorch_inference.py's normalize).
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)

#: Short-side resize used by the reference's transform pipeline (SURVEY.md §2:
#: resize 232 -> center-crop 224).
DEFAULT_RESIZE = 232
DEFAULT_CROP = 224


def _resize_short_side(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    if w <= h:
        new_w, new_h = size, max(1, round(h * size / w))
    else:
        new_w, new_h = max(1, round(w * size / h)), size
    return img.resize((new_w, new_h), Image.BILINEAR)


def _center_crop(img: Image.Image, size: int) -> Image.Image:
    w, h = img.size
    left = (w - size) // 2
    top = (h - size) // 2
    return img.crop((left, top, left + size, top + size))


def preprocess_image(
    img: Image.Image,
    *,
    resize: int = DEFAULT_RESIZE,
    crop: int = DEFAULT_CROP,
    layout: str = "NHWC",
) -> np.ndarray:
    """PIL image -> normalized float32 array with a leading batch dim of 1.

    ``layout`` selects "NHWC" (framework native) or "NCHW" (the reference's
    on-disk layout).
    """
    img = img.convert("RGB")
    img = _resize_short_side(img, resize)
    img = _center_crop(img, crop)
    x = np.asarray(img, dtype=np.float32) / 255.0  # HWC in [0,1]
    x = (x - IMAGENET_MEAN) / IMAGENET_STD
    if layout == "NCHW":
        x = x.transpose(2, 0, 1)
    elif layout != "NHWC":
        raise ValueError(f"layout must be 'NHWC' or 'NCHW', got {layout!r}")
    return x[None]


def preprocess_file(path: str | os.PathLike, **kwargs) -> np.ndarray:
    """JPEG/PNG file -> preprocessed batch-of-1 array (PIL path)."""
    with Image.open(path) as img:
        return preprocess_image(img, **kwargs)


def preprocess_files_batch(
    paths: list[str],
    *,
    resize: int = DEFAULT_RESIZE,
    crop: int = DEFAULT_CROP,
    num_threads: int = 4,
) -> np.ndarray:
    """Batch decode+preprocess -> (N, crop, crop, 3) float32 NHWC.

    Uses the native C++ ingest (libjpeg + threaded, 1.6x PIL per core) when
    built and all inputs are JPEGs; falls back to PIL per file otherwise.
    Both paths agree to within one uint8 level (tests/test_native.py).
    """
    jpeg_only = all(str(p).lower().endswith((".jpg", ".jpeg")) for p in paths)
    if jpeg_only:
        try:
            from resnetc_tpu import native

            if native.available():
                return native.preprocess_files(
                    [str(p) for p in paths], resize=resize, crop=crop,
                    mean=IMAGENET_MEAN, std=IMAGENET_STD,
                    num_threads=num_threads,
                )
        except (ValueError, RuntimeError):
            pass  # corrupt file or lib failure: PIL gives the real error
    return np.concatenate(
        [preprocess_file(p, resize=resize, crop=crop) for p in paths]
    )


def save_input_bin(x: np.ndarray, path: str | os.PathLike) -> None:
    """Write the reference's input format: flat little-endian f32, NCHW order
    (convert_imgs_to_bin.py:21-23)."""
    x = np.asarray(x, dtype=np.float32)
    if x.ndim == 4 and x.shape[-1] == 3:  # NHWC -> NCHW for the disk contract
        x = x.transpose(0, 3, 1, 2)
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    x.astype("<f4").tofile(path)


def load_input_bin(
    path: str | os.PathLike,
    *,
    batch: int = 1,
    height: int = DEFAULT_CROP,
    width: int = DEFAULT_CROP,
    layout: str = "NHWC",
) -> np.ndarray:
    """Read a reference test_bins/*.bin file (flat NCHW f32, shape supplied by
    the caller — same contract as main.cu:236-237)."""
    raw = np.fromfile(path, dtype="<f4")
    expected = batch * 3 * height * width
    if raw.size != expected:
        raise ValueError(f"{path}: {raw.size} elems, expected {expected}")
    x = raw.reshape(batch, 3, height, width)
    if layout == "NHWC":
        x = x.transpose(0, 2, 3, 1)
    return np.ascontiguousarray(x)
