"""Batch iterator + device sharding.

Replaces the reference's torch DataLoader with worker processes
(lmdb_data_loader.py, train.py:259-263): samples live in fixed-shape host
arrays, each epoch is a shuffled view, and batches are placed on the device
mesh with the batch axis sharded over the 'data' axis (the TPU-native
equivalent of DataParallel, SURVEY.md section 2.9).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import jax

from ha2g_tpu.data.dataset import WindowedSamples

BATCH_KEYS = ("text", "word_seq", "word_lengths", "pose", "target", "audio",
              "spec", "vids")


class BatchLoader:
    def __init__(self, samples: WindowedSamples, batch_size: int,
                 shuffle: bool = True, drop_last: bool = True,
                 seed: int = 0, sharding=None, keys=None):
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

    def __len__(self):
        n = len(self.s)
        return n // self.batch_size if self.drop_last else \
            -(-n // self.batch_size)

    def __iter__(self) -> Iterator[dict]:
        n = len(self.s)
        idx = self.rng.permutation(n) if self.shuffle else np.arange(n)
        stop = n - n % self.batch_size if self.drop_last else n
        for i in range(0, stop, self.batch_size):
            sel = idx[i:i + self.batch_size]
            batch = {k: getattr(self.s, k if k != "text" else "text")[sel]
                     for k in self.keys}
            if self.sharding is not None:
                batch = jax.device_put(batch, self.sharding)
            yield batch
