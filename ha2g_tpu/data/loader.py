"""Batch iterator + device sharding.

Replaces the reference's torch DataLoader with worker processes
(lmdb_data_loader.py, train.py:259-263): samples live in fixed-shape host
arrays, each epoch is a shuffled view, and batches are placed on the device
mesh with the batch axis sharded over the 'data' axis (the TPU-native
equivalent of DataParallel, SURVEY.md section 2.9).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

import numpy as np
import jax

from ha2g_tpu.data.dataset import WindowedSamples

BATCH_KEYS = ("text", "word_seq", "word_lengths", "pose", "target", "audio",
              "spec", "vids")


class BatchLoader:
    def __init__(self, samples: WindowedSamples, batch_size: int,
                 shuffle: bool = True, drop_last: bool = True,
                 seed: int = 0, sharding=None, keys=None,
                 prefetch: int = 2):
        # keys: restrict batches to the fields the training system consumes
        # (the raw 16 kHz audio alone is ~37 MB per 256-batch; shipping it
        # to a model that only reads spectrograms wastes most of the step's
        # host->device bandwidth over this TPU's tunnel)
        self.keys = tuple(keys) if keys else BATCH_KEYS
        self.s = samples
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.default_rng(seed)
        self.sharding = sharding
        # prefetch N batches on a host thread: the numpy gather +
        # device_put of the next batch overlaps the device's current step
        # (jax dispatch is async, but the host-side slicing is not)
        self.prefetch = max(int(prefetch), 0)

    def __len__(self):
        n = len(self.s)
        return n // self.batch_size if self.drop_last else \
            -(-n // self.batch_size)

    def _gather(self) -> Iterator[dict]:
        """Host-side batches (numpy gather only — safe on any thread)."""
        n = len(self.s)
        idx = self.rng.permutation(n) if self.shuffle else np.arange(n)
        stop = n - n % self.batch_size if self.drop_last else n
        for i in range(0, stop, self.batch_size):
            sel = idx[i:i + self.batch_size]
            yield {k: getattr(self.s, k if k != "text" else "text")[sel]
                   for k in self.keys}

    def _place(self, batch: dict) -> dict:
        # device placement stays on the CONSUMER thread: device_put from a
        # worker thread can deadlock on this TPU's experimental backend
        if self.sharding is not None:
            return jax.device_put(batch, self.sharding)
        return batch

    def _produce(self) -> Iterator[dict]:
        for batch in self._gather():
            yield self._place(batch)

    def __iter__(self) -> Iterator[dict]:
        if self.prefetch == 0:
            yield from self._produce()
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        _END = object()

        def patient_put(item):
            # the queue may be full when the epoch ends normally; dropping
            # the sentinel/error here would hang the consumer
            while True:
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    if stop.is_set():
                        return False  # consumer is gone

        def worker():
            try:
                for b in self._gather():
                    if not patient_put(b):
                        return
            except BaseException as e:  # noqa: BLE001 — re-raised below
                # surface producer failures in the consumer thread: a
                # swallowed exception here would read as a silent empty
                # epoch
                patient_put(e)
                return
            patient_put(_END)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                b = q.get()
                if b is _END:
                    break
                if isinstance(b, BaseException):
                    raise b
                yield self._place(b)
        finally:
            # consumer may abandon iteration (e.g. next(iter(loader))):
            # unblock and retire the worker instead of leaking it
            stop.set()
            while True:
                try:
                    if q.get_nowait() is _END:
                        break
                except queue.Empty:
                    break
            t.join(timeout=5.0)
