"""Prefetching training data loader.

TPU-native equivalent of the reference's multi-worker torch DataLoader
(/root/reference/train_ds_medplib.py:478-484, `--workers` default 4): sample
loading + preprocessing runs in a thread pool (PIL decode, the C++
native/preprocess.cpp resize path, and numpy all release the GIL) and
finished macro-batches wait in a bounded queue, so the host prepares the
next batch while the device runs the current step. Deterministic: the
index stream reproduces the trainer's inline iterator exactly (same seed,
same epoch permutation, same wrap-around), so resume replay and loss curves
are loader-independent.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from medplib_tpu.data.dataset import CollatorConfig, collate, to_model_batch


class PrefetchLoader:
    """Iterates stacked [accum, ...] device batch trees forever (the
    trainer's grad-accumulation contract), loading samples concurrently.

    num_workers=0 degrades to fully synchronous in-thread loading (the
    debug path; also what the tiny CLI uses)."""

    def __init__(self, dataset, cc: CollatorConfig, batch_size: int,
                 accum_steps: int = 1, num_workers: int = 4,
                 prefetch: int = 2, seed: int = 42, collate_fn=None):
        self.dataset = dataset
        self.cc = cc
        # collate_fn(samples, cc) -> (arrays, meta); the ICL trainer passes
        # icl_dataset.collate_icl here (reference switches the dataset class
        # AND collator contract together, train_ds_medplib.py:367-374)
        self.collate_fn = collate_fn or collate
        self.batch_size = batch_size
        self.accum_steps = accum_steps
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.seed = seed
        self._stop = threading.Event()

    # the index stream must match train/cli.py's inline iterator
    def _index_stream(self) -> Iterator[list]:
        rng = np.random.default_rng(self.seed)
        order = rng.permutation(len(self.dataset))
        pos = 0
        while True:
            micro_groups = []
            for _ in range(self.accum_steps):
                idxs = [int(order[(pos + j) % len(self.dataset)])
                        for j in range(self.batch_size)]
                pos += self.batch_size
                micro_groups.append(idxs)
            yield micro_groups

    def _build(self, micro_groups, pool: Optional[ThreadPoolExecutor]):
        if pool is not None:
            flat = [i for g in micro_groups for i in g]
            loaded = list(pool.map(self.dataset.__getitem__, flat))
            it = iter(loaded)
            samples_per_group = [[next(it) for _ in g] for g in micro_groups]
        else:
            samples_per_group = [[self.dataset[i] for i in g]
                                 for g in micro_groups]
        micros = []
        for samples in samples_per_group:
            arrays, _ = self.collate_fn(samples, self.cc)
            micros.append(to_model_batch(arrays))
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *micros)

    def __iter__(self):
        if self.num_workers <= 0:
            for groups in self._index_stream():
                if self._stop.is_set():
                    return
                yield self._build(groups, None)
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        pool = ThreadPoolExecutor(self.num_workers)
        err: list = []

        def produce():
            try:
                for groups in self._index_stream():
                    batch = self._build(groups, pool)
                    while not self._stop.is_set():
                        try:
                            q.put(batch, timeout=0.5)
                            break
                        except queue.Full:
                            continue
                    if self._stop.is_set():
                        return
            except BaseException as e:  # noqa: BLE001 - re-raised below
                err.append(e)
                # bounded put: if the consumer already went away with a full
                # queue, don't block this thread forever
                while not self._stop.is_set():
                    try:
                        q.put(None, timeout=0.5)
                        break
                    except queue.Full:
                        continue

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    raise err[0]
                yield batch
        finally:
            self._stop.set()
            pool.shutdown(wait=False)

    def close(self):
        self._stop.set()
