"""Batch assembly and host->device prefetch.

Replaces the reference's torch DataLoader usage (fit.py:56-63, infer.py:79-83)
with a TPU-first pipeline:

- ``BatchLoader``: threaded example loading (GeoTIFF windowed reads release
  the GIL inside the native reader) assembled into fixed-shape NHWC numpy
  batches. Training drops the ragged final batch to keep one compiled shape;
  evaluation pads it with duplicated examples and a ``valid`` mask so every
  tile is scored exactly once (the reference simply runs batch-size-1
  evaluation, predict.py:206-233).
- ``device_prefetch``: double-buffered ``jax.device_put`` onto a
  ``NamedSharding`` so the batch-leading axis lands sharded across the data
  mesh axis while the previous step computes.

The ``metadata`` field (python objects) stays host-side, mirroring the
reference's tensors_and_lists_collate_fn (datasets/__init__.py:14-30).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np


class BatchLoader:
    """Iterable over fixed-shape batches of a FloodPlanetDataset."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        n_workers: int = 4,
        drop_last: bool = False,
        seed: int | None = 0,
        output_metadata: bool = False,
        pad_final: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.n_workers = max(1, n_workers)
        self.drop_last = drop_last
        self.output_metadata = output_metadata
        self.pad_final = pad_final
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _epoch_order(self) -> np.ndarray:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)
        self._epoch += 1
        return order

    def _assemble(self, examples: list, n_valid: int) -> dict:
        batch = {
            "image": np.stack([e["image"] for e in examples]),
            "target": np.stack([e["target"] for e in examples]),
            "mean": np.stack([e["mean"] for e in examples]),
            "std": np.stack([e["std"] for e in examples]),
            "valid": (np.arange(len(examples)) < n_valid),
        }
        if self.output_metadata:
            batch["metadata"] = [e.get("metadata") for e in examples]
        return batch

    def __iter__(self) -> Iterator[dict]:
        order = self._epoch_order()
        n = len(order)
        use_batch_api = hasattr(self.dataset, "load_batch")

        # Partition the epoch into batch index lists up front.
        batches: list[list[int]] = []
        position = 0
        while position < n:
            end = min(position + self.batch_size, n)
            if end - position < self.batch_size and self.drop_last:
                break
            batches.append([int(order[i]) for i in range(position, end)])
            position = end

        def load(batch_indices: list[int]) -> list[dict]:
            if use_batch_api:
                # One native batch-read call (C++ thread pool inside).
                return self.dataset.load_batch(
                    batch_indices, self.output_metadata
                )
            return [
                self.dataset.load_example(i, self.output_metadata)
                for i in batch_indices
            ]

        with ThreadPoolExecutor(max_workers=self.n_workers) as pool:
            inflight = 3  # batches in flight
            futures = {
                i: pool.submit(load, batches[i])
                for i in range(min(inflight, len(batches)))
            }
            for b in range(len(batches)):
                examples = futures.pop(b).result()
                nxt = b + inflight
                if nxt < len(batches):
                    futures[nxt] = pool.submit(load, batches[nxt])
                n_valid = len(examples)
                if n_valid < self.batch_size and self.pad_final:
                    # Pad with duplicates of the last example; 'valid' masks
                    # them out of metrics and stitching.
                    examples = examples + [examples[-1]] * (
                        self.batch_size - n_valid
                    )
                yield self._assemble(examples, n_valid)


def device_prefetch(iterator, sharding=None, size: int = 2):
    """Move batches to device ahead of consumption (double buffering).

    ``sharding`` is either one jax.sharding.Sharding applied to every array
    leaf, or a dict of key -> Sharding (see
    parallel.mesh.batch_shardings_for, used for 2-D data x space meshes);
    python-object leaves (metadata) pass through untouched.
    """
    import jax

    def put(batch):
        out = {}
        for key, value in batch.items():
            if isinstance(value, np.ndarray):
                s = sharding.get(key) if isinstance(sharding, dict) else sharding
                out[key] = (
                    jax.device_put(value, s)
                    if s is not None
                    else jax.device_put(value)
                )
            else:
                out[key] = value
        return out

    q: queue.Queue = queue.Queue(maxsize=size)
    sentinel = object()
    error_holder = []

    def producer():
        try:
            for batch in iterator:
                q.put(put(batch))
        except BaseException as exc:  # propagate loader errors to consumer
            error_holder.append(exc)
        finally:
            q.put(sentinel)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()
    while True:
        item = q.get()
        if item is sentinel:
            if error_holder:
                raise error_holder[0]
            return
        yield item
