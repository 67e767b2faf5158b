"""Batched ingest: background decode + host->device prefetch.

The reference feeds its engine exactly one preprocessed image read from disk
(main.cu:236-238).  The serving/training configs in BASELINE.json need
device-resident *batches* with decode overlapped against device compute, so
this loader:

- decodes/preprocesses on background threads (JPEG decode is the classic
  host bottleneck — SURVEY.md §7 "hard parts"),
- assembles fixed-shape NHWC batches (static shapes keep XLA happy), and
- keeps a prefetch queue of device-resident arrays (``jax.device_put``
  with an optional ``Sharding``) so step N+1's H2D transfer overlaps step N's
  compute — the double-buffering the reference's sync-per-copy tensor layer
  (cuda/tensor.cuh:184-199) structurally cannot do.
"""

from __future__ import annotations

import queue
import threading
from collections.abc import Iterable, Iterator, Sequence
from pathlib import Path
from typing import Any

import jax
import numpy as np

from resnetc_tpu.data.preprocess import DEFAULT_CROP, preprocess_file


class BatchLoader:
    """Iterate device-resident NHWC batches decoded from image files.

    Parameters
    ----------
    paths: image files (JPEG/PNG). Recycled (in order) if ``steps`` needs more
        than one pass.
    batch_size: fixed output batch size (short remainders are dropped —
        static shapes only).
    steps: number of batches to produce; None = one epoch.
    sharding: optional ``jax.sharding.Sharding`` for the device batches
        (e.g. batch-sharded over the DP mesh axis).
    prefetch: queue depth of ready device batches.
    decode_workers: background decode threads.
    """

    def __init__(
        self,
        paths: Sequence[str | Path],
        *,
        batch_size: int,
        image_size: int = DEFAULT_CROP,
        steps: int | None = None,
        sharding: Any | None = None,
        prefetch: int = 2,
        decode_workers: int = 2,
    ):
        if not paths:
            raise ValueError("BatchLoader needs at least one image path")
        self.paths = [str(p) for p in paths]
        self.batch_size = batch_size
        self.image_size = image_size
        if steps is None:
            steps = len(self.paths) // batch_size
            if steps == 0:
                raise ValueError(
                    f"{len(self.paths)} images < batch_size {batch_size}; pass steps= to recycle"
                )
        self.steps = steps
        self.sharding = sharding
        self.prefetch = prefetch
        self.decode_workers = max(1, decode_workers)

    def _decoded(self) -> Iterator[np.ndarray]:
        """Stream of single preprocessed images, decoded batch-at-a-time via
        the native threaded ingest (PIL fallback), order-preserving."""
        from resnetc_tpu.data.preprocess import preprocess_files_batch

        total = self.steps * self.batch_size
        for start in range(0, total, self.batch_size):
            n = min(self.batch_size, total - start)
            chunk = [
                self.paths[(start + j) % len(self.paths)] for j in range(n)
            ]
            batch = preprocess_files_batch(
                chunk, crop=self.image_size, num_threads=self.decode_workers
            )
            yield from batch

    def __iter__(self) -> Iterator[jax.Array]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        _SENTINEL = object()
        errbox: list[BaseException] = []
        stop = threading.Event()  # set when the consumer abandons iteration

        def _put(item) -> bool:
            """Bounded put that gives up once the consumer is gone — without
            this, an abandoned iterator (e.g. ``itertools.islice``) leaves the
            producer blocked on a full queue forever, leaking the thread and
            pinning prefetched device batches for the process lifetime."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                batch = np.empty(
                    (self.batch_size, self.image_size, self.image_size, 3), np.float32
                )
                n = 0
                for img in self._decoded():
                    if stop.is_set():
                        return
                    batch[n] = img
                    n += 1
                    if n == self.batch_size:
                        if not _put(jax.device_put(batch.copy(), self.sharding)):
                            return
                        n = 0
            except BaseException as e:  # surfaced to the consumer below
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

    def __len__(self) -> int:
        return self.steps


def synthetic_batches(
    *,
    batch_size: int,
    image_size: int = DEFAULT_CROP,
    steps: int,
    num_classes: int = 1000,
    sharding: Any | None = None,
    label_sharding: Any | None = None,
    seed: int = 0,
) -> Iterable[tuple[jax.Array, jax.Array]]:
    """Deterministic fake (images, labels) batches for benchmarks and tests.

    Host-generated once, device-resident thereafter — benchmark loops measure
    device compute, not the host RNG.
    """
    rng = np.random.default_rng(seed)
    images = rng.standard_normal((batch_size, image_size, image_size, 3)).astype(np.float32)
    labels = rng.integers(0, num_classes, size=(batch_size,)).astype(np.int32)
    dev_images = jax.device_put(images, sharding)
    dev_labels = jax.device_put(labels, label_sharding)
    for _ in range(steps):
        yield dev_images, dev_labels
