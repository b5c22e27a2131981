"""Host-side input pipeline.

TPU-native replacement for PyTorch DataLoader + DistributedSampler +
`nerv.training.BaseDataModule` (reference usage: scripts/train.py:21-27).
Design:

- `Dataset`: random-access protocol returning dicts of numpy arrays.
- `DataLoader`: multi-threaded prefetching batcher producing fixed-shape
  numpy batches (static shapes for XLA). Per-epoch shuffling is seeded and
  deterministic. With multi-host JAX, each process loads only its shard of
  every global batch (contiguous per-process block, so the assembled global
  array equals the single-host batch), replacing DistributedSampler.
- Corrupted-sample retry: datasets may raise `SampleError`; the loader
  resamples a random other index, mirroring the `_rand_another` pattern
  (video_based/datasets/movi.py:54-60).

Two worker modes:

- ``worker_mode="thread"`` (default): decode work is numpy/PIL which
  releases the GIL, so threads avoid torch's worker-process serialization
  entirely on hosts where decode dominates.
- ``worker_mode="process"``: spawn-based worker processes, the analog of
  torch ``DataLoader(num_workers=)``, for pipelines whose collate or
  pure-Python transform time is GIL-bound at production host scale. The
  dataset and collate_fn are pickled once per worker at startup; batches
  return over a multiprocessing queue. Workers are launched with the
  axon/TPU sitecustomize disabled and ``JAX_PLATFORMS=cpu`` so a worker
  never dials the TPU tunnel nor pays the ~5s jax import.
"""

import os
import queue
import threading
import traceback
from typing import Callable, Dict, Iterator, Optional

import numpy as np


class SampleError(Exception):
    """Raised by datasets on corrupted/undecodable samples."""


class Dataset:
    """Random-access dataset protocol."""

    def __len__(self):
        raise NotImplementedError

    def __getitem__(self, idx) -> Dict[str, np.ndarray]:
        raise NotImplementedError


def default_collate(samples):
    """Stack a list of dict samples into a dict batch."""
    out = {}
    for k in samples[0]:
        vals = [s[k] for s in samples]
        if np.isscalar(vals[0]) or getattr(vals[0], "ndim", 1) == 0:
            out[k] = np.asarray(vals)
        else:
            out[k] = np.stack(vals)
    return out


class _WorkerError:
    """Exception surrogate that survives the pickle boundary."""

    def __init__(self, exc):
        self.formatted = "".join(
            traceback.format_exception(type(exc), exc, exc.__traceback__))

    def raise_(self):
        raise RuntimeError(
            "loader worker process failed:\n" + self.formatted)


def _fetch_with_retry(dataset, idx, seed, max_retries):
    """Shared corrupted-sample resample policy (movi.py:54-60 analog)."""
    rng = np.random.RandomState((seed + 1) * 7919 + int(idx))
    for _ in range(max_retries + 1):
        try:
            return dataset[int(idx)]
        except SampleError:
            idx = rng.randint(0, len(dataset))
    raise RuntimeError(
        f"failed to load a valid sample after {max_retries} retries")


def _mp_worker(dataset, collate_fn, seed, max_retries, task_q, result_q):
    """Worker-process loop: (pos, indices) tasks -> (pos, batch) results.

    Module-level so the spawn context can pickle it by reference; the
    dataset/collate_fn arrive pickled once at startup.
    """
    while True:
        task = task_q.get()
        if task is None:
            return
        pos, indices = task
        try:
            batch = collate_fn([
                _fetch_with_retry(dataset, i, seed, max_retries)
                for i in indices
            ])
        except Exception as e:  # pragma: no cover - exercised via proxy
            batch = _WorkerError(e)
        result_q.put((pos, batch))


class DataLoader:
    """Deterministic, prefetching, sharded batch loader."""

    def __init__(
        self,
        dataset: Dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = True,
        num_workers: int = 4,
        collate_fn: Optional[Callable] = None,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
        max_retries: int = 3,
        worker_mode: str = "thread",
    ):
        assert batch_size % process_count == 0, (
            "global batch size must divide evenly across hosts")
        self.dataset = dataset
        self.global_batch_size = batch_size
        self.local_batch_size = batch_size // process_count
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(num_workers, 1)
        self.collate_fn = collate_fn or default_collate
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        self.max_retries = max_retries
        assert worker_mode in ("thread", "process"), worker_mode
        self.worker_mode = worker_mode
        self.epoch = 0

    def set_epoch(self, epoch: int):
        self.epoch = epoch
        # datasets with per-sample augmentation RNG reseed on epoch
        # boundaries (the DistributedSampler.set_epoch analog)
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(epoch)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.global_batch_size
        return (n + self.global_batch_size - 1) // self.global_batch_size

    def _epoch_indices(self):
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        num_batches = len(self)
        for b in range(num_batches):
            batch = order[b * self.global_batch_size:(b + 1) *
                          self.global_batch_size]
            # host shard: contiguous block of the global batch. Blocks (not
            # DistributedSampler-style strides) make the assembled global
            # array (`jax.make_array_from_process_local_data`, row order =
            # process order) IDENTICAL to the single-process batch, so a
            # multi-host fit is loss-comparable step-for-step with a
            # single-host fit of the same global batch
            # (tests/test_distributed.py).
            yield np.array_split(batch, self.process_count)[
                self.process_index]

    def _fetch(self, idx):
        return _fetch_with_retry(self.dataset, idx, self.seed,
                                 self.max_retries)

    def _load_batch(self, indices):
        return self.collate_fn([self._fetch(i) for i in indices])

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        batches = list(self._epoch_indices())
        if not batches:
            return
        if self.worker_mode == "process":
            yield from self._iter_processes(batches)
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.num_workers * 2)
        stop = threading.Event()
        it_lock = threading.Lock()
        it = iter(enumerate(batches))
        results = {}
        results_lock = threading.Lock()
        results_cv = threading.Condition(results_lock)

        def worker():
            while not stop.is_set():
                with it_lock:
                    try:
                        pos, indices = next(it)
                    except StopIteration:
                        return
                try:
                    batch = self._load_batch(indices)
                except Exception as e:  # propagate to consumer
                    batch = e
                with results_cv:
                    results[pos] = batch
                    results_cv.notify_all()

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(self.num_workers)
        ]
        for t in threads:
            t.start()
        try:
            for pos in range(len(batches)):
                with results_cv:
                    while pos not in results:
                        # fail loudly instead of hanging the epoch when
                        # every worker died without producing this batch
                        # (e.g. a crash in a native decode path)
                        if not any(t.is_alive() for t in threads):
                            raise RuntimeError(
                                f"all {self.num_workers} loader workers "
                                f"exited without producing batch {pos}")
                        results_cv.wait(timeout=60.0)
                    batch = results.pop(pos)
                if isinstance(batch, Exception):
                    raise batch
                yield batch
        finally:
            stop.set()

    def _iter_processes(self, batches):
        """Spawn-based worker-process epoch (torch num_workers analog).

        A feeder thread keeps a bounded window of (pos, indices) tasks in
        flight; results are re-ordered on the consumer side so delivery is
        deterministic regardless of worker scheduling. Any worker death is
        a hard error (torch DataLoader semantics) — with lazily fed tasks
        the dead worker's task would otherwise be silently lost.
        """
        import multiprocessing as mp

        ctx = mp.get_context("spawn")
        nw = min(self.num_workers, len(batches))
        # bound host memory: at most ~2 tasks/results in flight per worker
        task_q = ctx.Queue(2 * nw + nw)
        result_q = ctx.Queue(2 * nw)

        # Workers must not dial the TPU tunnel nor pay the axon jax
        # import: blank the sitecustomize trigger + force cpu for the
        # duration of the spawn (children inherit the env at start()).
        saved = {
            k: os.environ.pop(k, None)
            for k in ("PALLAS_AXON_POOL_IPS",)
        }
        saved_platforms = os.environ.get("JAX_PLATFORMS")
        os.environ["JAX_PLATFORMS"] = "cpu"
        try:
            workers = [
                ctx.Process(
                    target=_mp_worker,
                    args=(self.dataset, self.collate_fn, self.seed,
                          self.max_retries, task_q, result_q),
                    daemon=True,
                ) for _ in range(nw)
            ]
            for w in workers:
                w.start()
        finally:
            for k, v in saved.items():
                if v is not None:
                    os.environ[k] = v
            if saved_platforms is None:
                os.environ.pop("JAX_PLATFORMS", None)
            else:
                os.environ["JAX_PLATFORMS"] = saved_platforms

        stop = threading.Event()

        def feeder():
            for pos, indices in enumerate(batches):
                while not stop.is_set():
                    try:
                        task_q.put((pos, np.asarray(indices)), timeout=0.5)
                        break
                    except queue.Full:  # pragma: no cover
                        continue
                if stop.is_set():
                    return
            for _ in range(nw):
                task_q.put(None)

        feed_thread = threading.Thread(target=feeder, daemon=True)
        feed_thread.start()

        results = {}
        try:
            for pos in range(len(batches)):
                while pos not in results:
                    try:
                        got_pos, batch = result_q.get(timeout=5.0)
                        results[got_pos] = batch
                    except queue.Empty:
                        dead = [w for w in workers if not w.is_alive()]
                        if dead:
                            raise RuntimeError(
                                f"{len(dead)}/{nw} loader worker processes "
                                f"exited unexpectedly (exitcodes "
                                f"{[w.exitcode for w in dead]}) before "
                                f"producing batch {pos}")
                batch = results.pop(pos)
                if isinstance(batch, _WorkerError):
                    batch.raise_()
                yield batch
        finally:
            stop.set()
            for w in workers:
                w.terminate()
            for w in workers:
                w.join(timeout=5.0)
            for q_ in (task_q, result_q):
                q_.cancel_join_thread()
                q_.close()


class DataModule:
    """Bundles train/val loaders, the `BaseDataModule` analog
    (reference scripts/train.py:21-27)."""

    def __init__(self, params, train_set, val_set, collate_fn=None,
                 process_index=0, process_count=1):
        self.params = params
        self.train_set = train_set
        self.val_set = val_set
        self.train_loader = None
        if train_set is not None:
            self.train_loader = DataLoader(
                train_set,
                batch_size=params.train_batch_size * process_count
                if params.get("batch_is_per_host", True) else
                params.train_batch_size,
                shuffle=True,
                drop_last=True,
                num_workers=params.get("num_workers", 4),
                collate_fn=collate_fn,
                seed=params.get("seed", 0),
                process_index=process_index,
                process_count=process_count,
                worker_mode=params.get("loader_worker_mode", "thread"),
            )
        self.val_loader = DataLoader(
            val_set,
            batch_size=params.get("val_batch_size", params.train_batch_size) *
            (process_count if params.get("batch_is_per_host", True) else 1),
            shuffle=False,
            drop_last=False,
            num_workers=params.get("num_workers", 4),
            collate_fn=collate_fn,
            seed=params.get("seed", 0),
            process_index=process_index,
            process_count=process_count,
            worker_mode=params.get("loader_worker_mode", "thread"),
        )
