"""Bucketed batch loader with background prefetch.

XLA compiles one executable per batch shape, so batches are grouped by
length bucket (see data.batch.LENGTH_BUCKETS): a handful of compilations
total instead of one per protein length, and zero runtime OOM risk (static
shapes). Within an epoch, proteins are shuffled with a seeded PRNG, grouped
into same-bucket batches, and the batch order is shuffled again. A
background thread overlaps host featurization/stacking with device compute
(the reference uses multi-process torch DataLoaders for the same purpose).
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Iterator, Optional

import numpy as np

from packppi_tpu.data.batch import bucket_length, stack_batch


class BucketedLoader:
    """Iterates ProteinBatch (or custom-stacked) batches over a dataset.

    Args:
        dataset: indexable returning feature dicts.
        batch_size: proteins per batch (same-bucket).
        shuffle: reshuffle each epoch (seeded).
        drop_last: drop trailing incomplete batches.
        stack_fn: features-list -> batch (default ProteinBatch stacking).
        prefetch: number of batches prepared ahead on a worker thread.
    """

    def __init__(self, dataset, batch_size: int, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = False,
                 stack_fn: Optional[Callable] = None, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.stack_fn = stack_fn or stack_batch
        self.prefetch = prefetch
        self.epoch = 0
        self._lengths: Optional[list[int]] = None

    def _ensure_lengths(self):
        if self._lengths is None:
            lengths = getattr(self.dataset, "lengths", None)
            if lengths is not None:
                # manifest-backed parse-only counts (ComplexDataset.lengths):
                # planning never featurizes the whole corpus serially
                self._lengths = list(lengths() if callable(lengths) else lengths)
            else:
                self._lengths = [len(self.dataset[i]["residue_type"])
                                 for i in range(len(self.dataset))]

    def _plan(self) -> list[list[int]]:
        """Same-bucket batches of dataset indices for this epoch."""
        self._ensure_lengths()
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self.epoch).shuffle(idx)
        by_bucket: dict[int, list[int]] = {}
        for i in idx:
            by_bucket.setdefault(bucket_length(self._lengths[i]), []).append(int(i))
        batches = []
        for bucket, members in by_bucket.items():
            for s in range(0, len(members), self.batch_size):
                chunk = members[s:s + self.batch_size]
                if len(chunk) == self.batch_size or not self.drop_last:
                    batches.append(chunk)
        if self.shuffle:
            np.random.default_rng(self.seed * 7919 + self.epoch).shuffle(batches)
        return batches

    def __len__(self) -> int:
        return len(self._plan())

    def plan(self) -> list[list[int]]:
        """The dataset-index batches the NEXT __iter__ will yield, in order
        — callers that need to map batched outputs back to dataset entries
        (e.g. packppi-ddg --eval_csv) align against this."""
        return self._plan()

    def first_batch(self):
        """First batch of the current plan, built synchronously (None if
        the plan is empty). Use this for shape/init templates: taking
        ``next(iter(loader))`` and abandoning the iterator leaves its
        prefetch worker blocked on a full queue for process lifetime,
        pinning ``prefetch+1`` featurized batches in host memory."""
        batches = self._plan()
        if not batches:
            return None
        feats = [self.dataset[i] for i in batches[0]]
        target = max(bucket_length(len(f["residue_type"])) for f in feats)
        return self.stack_fn(feats, target_len=target)

    def __iter__(self) -> Iterator:
        batches = self._plan()
        self.epoch += 1

        def make(batch_idx):
            feats = [self.dataset[i] for i in batch_idx]
            target = max(bucket_length(len(f["residue_type"])) for f in feats)
            return self.stack_fn(feats, target_len=target)

        if self.prefetch <= 0:
            for b in batches:
                yield make(b)
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def worker():
            # a worker failure must surface in the consumer, not silently
            # truncate the epoch (a prefetch error that ends iteration
            # early would yield wrong-but-plausible eval metrics)
            try:
                for b in batches:
                    q.put(make(b))
                q.put(stop)
            except BaseException as e:  # noqa: BLE001 — re-raised in consumer
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
