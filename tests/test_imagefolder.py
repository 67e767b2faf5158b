"""ImageFolder dataset tests: scanning, transforms, loaders, eval loop."""

import jax
import numpy as np
import pytest
from PIL import Image

from resnetc_tpu.data.imagefolder import (
    ImageFolderLoader,
    evaluate,
    random_resized_crop,
    scan_imagefolder,
)

FIXTURE = "/root/reference/test_imgs/ILSVRC2012_val_00004749.jpeg"


@pytest.fixture(scope="module")
def folder(tmp_path_factory):
    """Tiny 2-class ImageFolder tree: fixture copies vs solid-color images."""
    root = tmp_path_factory.mktemp("imagefolder")
    (root / "cat").mkdir()
    (root / "dog").mkdir()
    fix = Image.open(FIXTURE).convert("RGB")
    for i in range(5):
        fix.save(root / "cat" / f"c{i}.jpeg")
        Image.new("RGB", (300, 260), (30 * i, 100, 200)).save(
            root / "dog" / f"d{i}.jpeg"
        )
    return root


def test_scan_imagefolder(folder):
    samples, classes = scan_imagefolder(folder)
    assert classes == ["cat", "dog"]
    assert len(samples) == 10
    labels = sorted(l for _, l in samples)
    assert labels == [0] * 5 + [1] * 5


def test_scan_empty_raises(tmp_path):
    with pytest.raises(ValueError):
        scan_imagefolder(tmp_path)


def test_random_resized_crop_shapes():
    rng = np.random.default_rng(0)
    img = Image.new("RGB", (123, 77))
    out = random_resized_crop(img, rng, size=64)
    assert out.size == (64, 64)
    # Extreme aspect input exercises the center-crop fallback.
    thin = Image.new("RGB", (400, 10))
    out = random_resized_crop(thin, rng, size=32)
    assert out.size == (32, 32)


def test_eval_loader_deterministic(folder):
    a = [
        (np.asarray(x), np.asarray(y))
        for x, y in ImageFolderLoader(folder, batch_size=4, image_size=64)
    ]
    b = [
        (np.asarray(x), np.asarray(y))
        for x, y in ImageFolderLoader(folder, batch_size=4, image_size=64)
    ]
    assert len(a) == 2  # 10 // 4
    for (xa, ya), (xb, yb) in zip(a, b):
        np.testing.assert_array_equal(xa, xb)
        np.testing.assert_array_equal(ya, yb)
        assert xa.shape == (4, 64, 64, 3)


def test_train_loader_shuffles_and_augments(folder):
    loader = ImageFolderLoader(
        folder, batch_size=4, image_size=64, train=True, epochs=2, seed=1
    )
    batches = [(np.asarray(x), np.asarray(y)) for x, y in loader]
    assert len(batches) == 4  # 2 steps/epoch x 2 epochs
    # Same image augmented at different positions must differ (random crop).
    x0 = batches[0][0]
    assert not np.allclose(x0[0], x0[1]) or batches[0][1][0] != batches[0][1][1]
    # Epoch orders differ.
    y_epoch1 = np.concatenate([batches[0][1], batches[1][1]])
    y_epoch2 = np.concatenate([batches[2][1], batches[3][1]])
    assert y_epoch1.shape == y_epoch2.shape == (8,)


def test_loader_rejects_small_dataset(folder):
    with pytest.raises(ValueError):
        ImageFolderLoader(folder, batch_size=64)


def test_evaluate_runs_end_to_end(folder):
    from resnetc_tpu.models import resnet
    from resnetc_tpu.serve import InferenceEngine
    from resnetc_tpu.tensor import FP32

    cfg = resnet.get_config("resnet18", num_classes=2)
    engine = InferenceEngine(
        cfg, resnet.init(cfg, jax.random.key(0)), policy=FP32
    )
    result = evaluate(engine, folder, batch_size=5, image_size=64)
    assert result["count"] == 10.0
    assert 0.0 <= result["top1"] <= 1.0


def test_loader_shard_partitions_epoch(folder):
    """shard=(i, n) slices must be disjoint across processes, cover the
    truncated epoch, and agree on steps_per_epoch (collective lockstep)."""
    loaders = [
        ImageFolderLoader(
            folder, batch_size=2, image_size=32, train=True, shard=(i, 2),
            seed=7,
        )
        for i in range(2)
    ]
    orders = [ld._epoch_order(0) for ld in loaders]
    assert len(orders[0]) == len(orders[1]) == 5
    assert not (set(orders[0]) & set(orders[1])), "shards overlap"
    assert len(set(orders[0]) | set(orders[1])) == 10
    assert loaders[0].steps_per_epoch == loaders[1].steps_per_epoch == 2
    # Per-process slice smaller than the batch must be rejected up front.
    with pytest.raises(ValueError):
        ImageFolderLoader(folder, batch_size=6, image_size=32, shard=(0, 2))


def test_loader_shard_augmentation_streams_differ(tmp_path):
    """Sharded processes must draw DISTINCT augmentation parameters: with a
    folder of identical images, the first training batch of shard (0, 2)
    and shard (1, 2) must differ (same source pixels, different crops) —
    otherwise global-batch augmentation diversity silently divides by
    n_proc (round-4 review finding)."""
    root = tmp_path / "same"
    (root / "only").mkdir(parents=True)
    fix = Image.open(FIXTURE).convert("RGB")
    for i in range(4):
        fix.save(root / "only" / f"s{i}.jpeg")

    def first_batch(shard):
        ld = ImageFolderLoader(
            root, batch_size=2, image_size=32, train=True, seed=3,
            shard=shard, to_device=False,
        )
        x, _ = next(iter(ld))
        return np.asarray(x)

    a, b = first_batch((0, 2)), first_batch((1, 2))
    assert not np.array_equal(a, b), "augmentation streams identical"
    # And the unsharded stream is unchanged by the seeding refactor:
    # shard=None must stay deterministic run to run.
    c = first_batch(None)
    d = first_batch(None)
    np.testing.assert_array_equal(c, d)
