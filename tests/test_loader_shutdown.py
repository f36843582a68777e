"""Loader shutdown discipline.

Regression tests for an interpreter-exit deadlock found at NFS-scale files:
workers used to enqueue their completion sentinel BEFORE closing their h5
handles, so the interpreter could begin finalizing while a daemon worker sat
inside h5py's close holding HDF5's global lock — CPython >= 3.12 freezes
daemon threads at the next GIL acquisition during finalization, and h5py's
atexit then deadlocked on that lock (tiny fixtures close instantly, which is
why the rest of the suite never hit it).  The fix: close handles before the
sentinel, join workers in the iterator's `finally`, and run the same shutdown
from an atexit hook (LIFO -> before h5py's) for abandoned iterators.
"""

import threading

import pytest

from bmcnet_esr_tpu.data import DatasetConfig, SequenceLoader
from bmcnet_esr_tpu.data.h5dataset import EventH5Dataset
from bmcnet_esr_tpu.data.packager import write_synthetic_fixture


@pytest.fixture(scope="module")
def h5_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("shutdown") / "seq.h5")
    return write_synthetic_fixture(
        path,
        sensor_resolution=(32, 32),
        prefixes=("ori", "down2"),
        events_per_scale={"ori": 160_000, "down2": 40_000},
    )


def make_loader(h5_path, **kw):
    cfg = DatasetConfig.from_dict(
        {
            "scale": 2,
            "ori_scale": "down2",
            "need_gt_events": True,
            "mode": "events",
            "window": 256,
            "sliding_window": 128,
            "data_augment": {"enabled": False},
            "sequence": {"sequence_length": 4, "seqn": 2, "step_size": 4},
        }
    )
    return SequenceLoader([h5_path], cfg, batch_size=2, num_workers=2, **kw)


def test_exhausted_epoch_joins_workers_and_closes_handles(h5_path, monkeypatch):
    closes = []
    orig_close = EventH5Dataset.close

    def recording_close(self):
        if getattr(self, "_file", None) is not None:
            closes.append(threading.current_thread().name)
        orig_close(self)

    monkeypatch.setattr(EventH5Dataset, "close", recording_close)

    loader = make_loader(h5_path)
    before = threading.active_count()
    n = sum(1 for _ in loader)
    assert n == len(loader) > 0
    # iterator completion implies workers are joined (not merely signalled)
    assert threading.active_count() == before
    # every worker closed its private handle (2 workers x 1 file)
    worker_closes = [t for t in closes if t != "MainThread"]
    assert len(worker_closes) == 2


def test_close_failure_still_delivers_sentinel(h5_path, monkeypatch):
    """A worker whose h5 close raises must still signal completion, or the
    consumer blocks forever on its untimed queue get."""
    orig_close = EventH5Dataset.close

    def flaky_close(self):
        had_file = getattr(self, "_file", None) is not None
        orig_close(self)
        if had_file and threading.current_thread().name != "MainThread":
            raise OSError("synthetic close failure")

    monkeypatch.setattr(EventH5Dataset, "close", flaky_close)
    loader = make_loader(h5_path)
    n = sum(1 for _ in loader)  # must not hang
    assert n == len(loader)


def test_abandoned_iterator_joins_workers(h5_path):
    loader = make_loader(h5_path)
    before = threading.active_count()
    it = iter(loader)
    next(it)
    next(it)
    it.close()  # generator finally must stop AND join the workers
    assert threading.active_count() == before
    # the loader remains usable for a fresh epoch afterwards
    assert sum(1 for _ in loader) == len(loader)


def test_atexit_hook_registered_per_iteration(h5_path):
    import atexit

    unregistered = []
    orig_unregister = atexit.unregister

    def spy_unregister(fn):
        unregistered.append(getattr(fn, "__name__", str(fn)))
        return orig_unregister(fn)

    loader = make_loader(h5_path)
    try:
        atexit.unregister = spy_unregister
        for _ in loader:
            pass
    finally:
        atexit.unregister = orig_unregister
    # the iterator cleaned up its interpreter-exit hook on normal completion
    assert "shutdown_workers" in unregistered
