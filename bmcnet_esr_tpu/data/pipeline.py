"""Batched, prefetching host pipeline for event sequence clips.

Replaces the reference's torch ``DataLoader`` stack
(``dataloader/h5dataloader.py:183-272``: worker processes rasterizing count
images + ``DistributedSampler``) with a TPU-idiomatic design:

* items are raw padded event windows (rasterization happens **on device**
  inside the jitted step — the big architectural win over the reference's
  CPU-worker scatter loops, SURVEY.md §7 "hard parts" #5);
* worker *threads* (numpy slicing releases the GIL inside h5py/BLAS) each own
  private h5 handles; batches are round-robin assigned so iteration order is
  deterministic even with parallel workers;
* multi-host sharding is file-window index-space partitioning by
  ``(shard_index, shard_count)`` — the SPMD replacement for
  ``DistributedSampler`` (``h5dataloader.py:49-59,191-201``).

The batch layout is dense and scan-ready: ``inp_events [B, L, 4, N]`` with
valid lengths, vs the reference's per-step list of overlapping seqn-windows
(``h5dataloader.py:233-237``) — overlap duplication is resolved on device by
slicing consecutive frame pairs out of the rasterized ``[B, L, H, W, 2]``
stack.
"""

from __future__ import annotations

import copy
import logging
import queue
import threading
from typing import Dict, Iterator, List, Sequence

import numpy as np

from bmcnet_esr_tpu.data.h5dataset import DatasetConfig, EventSequenceDataset


def load_datalist(path: str) -> List[str]:
    """Read a datalist txt (one h5 path per line; reference datalist/*.txt)."""
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


def concatenate_datasets(
    paths: Sequence[str], config: DatasetConfig
) -> List[EventSequenceDataset]:
    return [EventSequenceDataset(p, config) for p in paths]


class SequenceLoader:
    """Iterates batches of ``[B, L, ...]`` numpy clips with thread prefetch."""

    def __init__(
        self,
        paths: Sequence[str],
        config: DatasetConfig,
        batch_size: int,
        *,
        shuffle: bool = False,
        drop_last: bool = False,
        pad_last: bool = False,
        compact: bool = False,
        num_workers: int = 2,
        prefetch: int = 4,
        seed: int = 0,
        shard_index: int = 0,
        shard_count: int = 1,
    ):
        self.config = config
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        # pad_last: wrap-pad the final short batch to full size and mark the
        # padding in a `clip_mask` key, so shape-specialized jitted steps
        # compile ONCE per run (the eval step excludes padded clips by mask)
        self.pad_last = pad_last and not drop_last
        # compact: ship events as int16 xy + int8 p (no timestamps) — the
        # count-image train path never reads ts, and the transfer drops ~69%
        # (ops/batch.compact_events); keys become {inp,gt}_{xy,p}.  At NFS
        # scale (10 MB/iter) the upload already hides under compute; the win
        # is recipes where transfer rivals compute (RGB: 75 -> 23 MB/iter)
        self.compact = compact
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.shard_index = shard_index
        self.shard_count = shard_count
        self.epoch = 0

        self.datasets = concatenate_datasets(paths, config)
        first = self.datasets[0].dataset
        self.inp_resolution = first.layout.inp_resolution
        self.gt_resolution = first.layout.gt_resolution
        self.scale = config.scale
        self.seqn = config.sequence.seqn
        for ds in self.datasets[1:]:
            if ds.dataset.layout.inp_resolution != self.inp_resolution:
                raise ValueError("all datasets in one loader must share a resolution")

        # global (dataset_id, clip_id) index space
        self._index: List = []
        for d, ds in enumerate(self.datasets):
            self._index.extend((d, i) for i in range(len(ds)))

    def __len__(self) -> int:
        # arithmetic, not a materialized shard: the shuffle cannot change
        # the count, and _shard_indices pads to equal-length shards
        n = len(self._index)
        if self.shard_count > 1:
            n = -(-n // self.shard_count)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _shard_indices(self, epoch: int):
        idx = list(self._index)
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(idx)
        if self.shard_count > 1:
            # wrap-around padding to a multiple of shard_count (exactly
            # DistributedSampler): every shard gets the SAME length, so all
            # hosts yield the same number of batches per epoch and never
            # desync on collectives
            total = -(-len(idx) // self.shard_count) * self.shard_count
            reps = -(-total // len(idx))
            idx = (idx * reps)[:total]
        # strided shard: same semantics as DistributedSampler
        shard = idx[self.shard_index :: self.shard_count]
        return shard

    def _make_batches(self, epoch: int) -> List[List]:
        shard = self._shard_indices(epoch)
        batches = [
            shard[i : i + self.batch_size] for i in range(0, len(shard), self.batch_size)
        ]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        batches = [b for b in batches if b]
        if self.pad_last and batches and len(batches[-1]) < self.batch_size:
            last = list(batches[-1])
            real = len(last)
            reps = -(-self.batch_size // len(shard)) + 1
            last = (last + list(shard) * reps)[: self.batch_size]
            batches[-1] = [(d, i, k < real) for k, (d, i) in enumerate(last)]
        return batches

    def _collate(self, items_per_clip: List[List[Dict]]) -> Dict[str, np.ndarray]:
        """clips (B) of windows (L) of dicts -> dict of [B, L, ...] arrays."""
        keys = items_per_clip[0][0].keys()
        out: Dict[str, np.ndarray] = {}
        for key in keys:
            out[key] = np.stack(
                [np.stack([np.asarray(w[key]) for w in clip]) for clip in items_per_clip]
            )
        return out

    def _load_batch(self, datasets, batch, rng) -> Dict[str, np.ndarray]:
        clips, mask = [], []
        for entry in batch:
            d, i, real = entry if len(entry) == 3 else (*entry, True)
            clip_seed = int(rng.integers(0, 2**31))
            clips.append(datasets[d].get_clip(i, seed=clip_seed))
            mask.append(1.0 if real else 0.0)
        out = self._collate(clips)
        if self.compact:
            from bmcnet_esr_tpu.ops.batch import compact_events

            for prefix in ("inp", "gt"):
                key = f"{prefix}_events"
                if key in out:
                    out[f"{prefix}_xy"], out[f"{prefix}_p"] = compact_events(out.pop(key))
        if self.pad_last:
            # present in EVERY batch so the pytree structure (and therefore
            # the jit signature) is identical across the epoch
            out["clip_mask"] = np.asarray(mask, np.float32)
        return out

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        epoch = self.epoch
        self.epoch += 1
        batches = self._make_batches(epoch)
        if not batches:
            return iter(())

        n_workers = min(self.num_workers, len(batches))
        queues = [queue.Queue(maxsize=self.prefetch) for _ in range(n_workers)]
        stop = threading.Event()

        def put_or_stop(q, item) -> bool:
            """Blocking put that aborts when the consumer abandoned the
            iterator (otherwise producers would pin h5 handles forever)."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker(wid: int):
            # private h5 handles per worker thread: shallow-copy datasets but
            # drop the shared (non-thread-safe) h5py file objects.
            local = []
            for ds in self.datasets:
                c = copy.copy(ds)
                c.dataset = copy.copy(ds.dataset)
                c.dataset._file = None
                local.append(c)
            try:
                for b, batch in enumerate(batches):
                    if b % n_workers != wid:
                        continue
                    if stop.is_set():
                        break
                    rng = np.random.default_rng((self.seed, epoch, b))
                    if not put_or_stop(queues[wid], self._load_batch(local, batch, rng)):
                        break
            except BaseException as exc:  # noqa: BLE001 — must reach the consumer
                # a worker failure (corrupt h5, schema mismatch) must NOT
                # degrade into a silent early completion sentinel: that
                # would drop ~1/num_workers of the epoch without a trace,
                # and under multi-host break the equal-batch-count
                # invariant (the next collective would hang every host).
                # Ship the exception itself; the consumer re-raises.
                put_or_stop(queues[wid], exc)
            finally:
                # close BEFORE signalling completion: if the interpreter
                # starts finalizing while a daemon worker sits inside h5py's
                # close (holding HDF5's global lock), CPython >= 3.12 freezes
                # the thread at its next GIL acquisition and h5py's atexit
                # then deadlocks on that lock — the sentinel must mean "this
                # worker holds no h5 handles anymore".  The sentinel itself
                # must ALWAYS go out, even if a close raises, or the consumer
                # blocks forever on its untimed get.
                try:
                    for ds in local:
                        try:
                            ds.dataset.close()
                        except Exception:
                            logging.getLogger(__name__).warning(
                                "loader worker failed to close an h5 handle",
                                exc_info=True,
                            )
                finally:
                    put_or_stop(queues[wid], None)

        threads = [
            threading.Thread(target=worker, args=(w,), daemon=True) for w in range(n_workers)
        ]
        for t in threads:
            t.start()

        empty_exc = queue.Empty  # bind now: module globals vanish at teardown
        shut = []

        def shutdown_workers():
            if shut:  # idempotent: atexit and the generator finally both call
                return
            shut.append(True)
            stop.set()
            for q in queues:  # unblock producers stuck on put()
                try:
                    q.get_nowait()
                except empty_exc:
                    pass
            # wait for workers to release their h5 handles — proceeding (or
            # finalizing the interpreter) while a worker is inside h5py
            # teardown deadlocks, see the worker-side comment
            for t in threads:
                t.join(timeout=10.0)
                if t.is_alive():
                    logging.getLogger(__name__).warning(
                        "loader worker %s still running after 10s; "
                        "interpreter exit may block on h5py teardown",
                        t.name,
                    )

        # abandoned-iterator safety: a generator's `finally` only runs at GC,
        # which during interpreter shutdown comes AFTER h5py's atexit — too
        # late (that handler would close files under live worker threads).
        # atexit runs LIFO, so registering here guarantees workers are
        # stopped and joined BEFORE h5py's import-time handler.
        import atexit

        atexit.register(shutdown_workers)

        try:
            done = [False] * n_workers
            b = 0
            while not all(done):
                wid = b % n_workers
                b += 1
                if done[wid]:
                    continue
                item = queues[wid].get()
                if item is None:
                    done[wid] = True
                    continue
                if isinstance(item, BaseException):
                    # surfaced from a failed worker (see the worker's
                    # except): the epoch is incomplete — raise, never
                    # silently yield a short epoch
                    raise RuntimeError(
                        "loader worker failed while reading a batch"
                    ) from item
                yield item
        finally:
            try:
                atexit.unregister(shutdown_workers)
            except Exception:
                pass  # generator GC'd during interpreter teardown
            shutdown_workers()
