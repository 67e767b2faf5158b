"""ImageFolder dataset: labeled training/eval batches from a directory tree.

Layout: ``root/<class_name>/<image>.jpeg`` (the torchvision ImageFolder
convention; classes are sorted directory names).  The reference has no
dataset layer at all — it classifies exactly one hardcoded file
(main.cu:236) — so this is new surface required by the training config
(BASELINE.json #4: "SGD on ImageNet-val shards").

Two transforms:

- eval: short-side resize + center crop (data.preprocess, exact torchvision
  eval semantics);
- train: RandomResizedCrop(scale 0.08-1.0, ratio 3/4-4/3) + horizontal flip
  (the standard ResNet recipe), seeded and reproducible.

Decode runs on background threads (PIL or the native C++ ingest for the
eval transform); batches arrive device-resident via jax.device_put.
"""

from __future__ import annotations

import math
import queue
import threading
from pathlib import Path
from typing import Any, Iterator

import jax
import numpy as np
from PIL import Image

from resnetc_tpu.data.preprocess import (
    DEFAULT_CROP,
    DEFAULT_RESIZE,
    IMAGENET_MEAN,
    IMAGENET_STD,
    preprocess_image,
)

_EXTS = (".jpg", ".jpeg", ".png")


def scan_imagefolder(root: str | Path) -> tuple[list[tuple[str, int]], list[str]]:
    """Return ([(path, label)], class_names) for an ImageFolder tree."""
    root = Path(root)
    classes = sorted(d.name for d in root.iterdir() if d.is_dir())
    if not classes:
        raise ValueError(f"no class directories under {root}")
    samples: list[tuple[str, int]] = []
    for label, name in enumerate(classes):
        for f in sorted((root / name).iterdir()):
            if f.suffix.lower() in _EXTS:
                samples.append((str(f), label))
    if not samples:
        raise ValueError(f"no images under {root}")
    return samples, classes


def random_resized_crop(
    img: Image.Image,
    rng: np.random.Generator,
    *,
    size: int,
    scale: tuple[float, float] = (0.08, 1.0),
    ratio: tuple[float, float] = (3 / 4, 4 / 3),
) -> Image.Image:
    """torchvision RandomResizedCrop semantics (10 tries then center fallback)."""
    w, h = img.size
    area = w * h
    log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        aspect = math.exp(rng.uniform(*log_ratio))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            left = int(rng.integers(0, w - cw + 1))
            top = int(rng.integers(0, h - ch + 1))
            crop = img.crop((left, top, left + cw, top + ch))
            return crop.resize((size, size), Image.BILINEAR)
    # Fallback: center crop of the constrained aspect.
    in_ratio = w / h
    if in_ratio < ratio[0]:
        cw, ch = w, int(round(w / ratio[0]))
    elif in_ratio > ratio[1]:
        cw, ch = int(round(h * ratio[1])), h
    else:
        cw, ch = w, h
    left, top = (w - cw) // 2, (h - ch) // 2
    return img.crop((left, top, left + cw, top + ch)).resize((size, size), Image.BILINEAR)


def _train_transform(path: str, rng: np.random.Generator, size: int) -> np.ndarray:
    with Image.open(path) as img:
        img = img.convert("RGB")
        img = random_resized_crop(img, rng, size=size)
        if rng.random() < 0.5:
            img = img.transpose(Image.FLIP_LEFT_RIGHT)
        x = np.asarray(img, np.float32) / 255.0
        return (x - IMAGENET_MEAN) / IMAGENET_STD


def _eval_transform(path: str, size: int) -> np.ndarray:
    with Image.open(path) as img:
        return preprocess_image(img, resize=DEFAULT_RESIZE if size == DEFAULT_CROP else int(size * DEFAULT_RESIZE / DEFAULT_CROP), crop=size)[0]


class ImageFolderLoader:
    """Labeled (images, labels) device batches from an ImageFolder tree.

    train=True: shuffled epochs, RandomResizedCrop + flip; train=False:
    deterministic order, eval transform, remainder dropped (static shapes).
    """

    def __init__(
        self,
        root: str | Path,
        *,
        batch_size: int,
        image_size: int = DEFAULT_CROP,
        train: bool = False,
        epochs: int | None = None,
        seed: int = 0,
        sharding: Any | None = None,
        label_sharding: Any | None = None,
        decode_workers: int = 2,
        prefetch: int = 2,
        shard: tuple[int, int] | None = None,
        to_device: bool = True,
    ):
        self.samples, self.classes = scan_imagefolder(root)
        # Multi-host data parallelism: shard=(process_index, process_count)
        # gives each process a disjoint 1/count strided slice of every
        # epoch's (shuffled) order; batch_size is then the PER-PROCESS
        # batch.  Every process must use the same seed so the shuffles
        # agree and the slices partition the epoch.
        self.shard = shard
        n_local = (
            len(self.samples) if shard is None else len(self.samples) // shard[1]
        )
        if n_local < batch_size:
            raise ValueError(
                f"{n_local} images (per process) < batch_size {batch_size}"
            )
        self.batch_size = batch_size
        self.image_size = image_size
        self.train = train
        self.epochs = epochs if epochs is not None else 1
        self.seed = seed
        self.sharding = sharding
        self.label_sharding = label_sharding
        self.decode_workers = max(1, decode_workers)
        self.prefetch = prefetch
        # to_device=False yields host np arrays — for multi-host callers
        # that assemble global arrays themselves (device_put here would add
        # a redundant full-batch round trip per step).
        self.to_device = to_device
        self.steps_per_epoch = n_local // batch_size

    def __len__(self) -> int:
        return self.steps_per_epoch * self.epochs

    def _epoch_order(self, epoch: int) -> list[int]:
        idx = np.arange(len(self.samples))
        if self.train:
            np.random.default_rng(self.seed + epoch).shuffle(idx)
        if self.shard is not None:
            i, n = self.shard
            # Strided post-shuffle slice: disjoint across processes, and
            # truncated to the common length so every process runs the
            # same number of steps (collectives stay in lockstep).
            idx = idx[i::n][: len(self.samples) // n]
        return idx.tolist()

    def __iter__(self) -> Iterator[tuple[jax.Array, jax.Array]]:
        from concurrent.futures import ThreadPoolExecutor

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        _SENTINEL = object()
        errbox: list[BaseException] = []
        stop = threading.Event()  # set when the consumer abandons iteration

        def _put(item) -> bool:
            """Bounded put that gives up once the consumer is gone (see
            data/loader.py — same abandoned-iterator thread-leak fix)."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        # Augmentation streams must be per-process DISTINCT under
        # multi-host sharding (same self.seed on every process keeps the
        # shuffles aligned): seed by the GLOBAL draw position of the local
        # counter — position p, p+n, p+2n, ... for shard (p, n).  Unsharded
        # this is (seed, i), the original stream.
        aug_p, aug_n = self.shard if self.shard is not None else (0, 1)

        def decode_one(i: int, path: str) -> np.ndarray:
            rng = np.random.default_rng((self.seed, i * aug_n + aug_p))
            return _train_transform(path, rng, self.image_size)

        def eval_batch(paths: list[str]) -> np.ndarray:
            # Eval transform is deterministic -> batch through the native
            # threaded ingest (PIL fallback inside).
            from resnetc_tpu.data.preprocess import (
                DEFAULT_CROP,
                DEFAULT_RESIZE,
                preprocess_files_batch,
            )

            resize = (
                DEFAULT_RESIZE
                if self.image_size == DEFAULT_CROP
                else int(self.image_size * DEFAULT_RESIZE / DEFAULT_CROP)
            )
            return preprocess_files_batch(
                paths, resize=resize, crop=self.image_size,
                num_threads=self.decode_workers,
            )

        def producer():
            try:
                with ThreadPoolExecutor(self.decode_workers) as pool:
                    counter = 0
                    for epoch in range(self.epochs):
                        order = self._epoch_order(epoch)
                        for step in range(self.steps_per_epoch):
                            batch_idx = order[
                                step * self.batch_size : (step + 1) * self.batch_size
                            ]
                            paths = [self.samples[i][0] for i in batch_idx]
                            labels = np.array(
                                [self.samples[i][1] for i in batch_idx], np.int32
                            )
                            uniq = counter * self.batch_size
                            if self.train:
                                imgs = list(
                                    pool.map(
                                        decode_one,
                                        range(uniq, uniq + self.batch_size),
                                        paths,
                                    )
                                )
                                batch = np.stack(imgs)
                            else:
                                batch = eval_batch(paths)
                            counter += 1
                            if self.to_device:
                                item = (
                                    jax.device_put(batch, self.sharding),
                                    jax.device_put(labels, self.label_sharding),
                                )
                            else:
                                item = (batch, labels)
                            ok = _put(item)
                            if not ok:
                                return
            except BaseException as e:
                errbox.append(e)
            finally:
                _put(_SENTINEL)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _SENTINEL:
                    break
                yield item
            t.join()
            if errbox:
                raise errbox[0]
        finally:
            stop.set()
            while True:  # drain so a producer blocked on put() wakes and exits
                try:
                    q.get_nowait()
                except queue.Empty:
                    break


def evaluate(engine, root: str | Path, *, batch_size: int = 64, image_size: int = DEFAULT_CROP) -> dict[str, float]:
    """Top-1 accuracy of an InferenceEngine over an ImageFolder tree.

    Note: engine class indices are the model's training indices; for
    self-labeled folders the folder order must match.
    """
    loader = ImageFolderLoader(
        root, batch_size=batch_size, image_size=image_size, train=False
    )
    correct = correct5 = total = 0
    for images, labels in loader:
        logits = np.asarray(engine.logits(images), np.float32)
        y = np.asarray(labels)
        correct += int((logits.argmax(-1) == y).sum())
        top5 = np.argsort(logits, axis=-1)[:, -5:]
        correct5 += int((top5 == y[:, None]).any(axis=-1).sum())
        total += len(y)
    return {
        "top1": correct / max(total, 1),
        "top5": correct5 / max(total, 1),
        "count": float(total),
    }
