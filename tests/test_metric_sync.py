"""Cross-process metric synchronization + host decode prefetch.

Parity: `MetricLogger.synchronize_between_processes`
(`/root/reference/util/misc.py:225-236` dist.all_reduce of [count, total])
and the torch-DataLoader-worker overlap in the sequence loops
(`extract_predicts.py:99-130`).
"""

import numpy as np

from uvhand_tpu.utils.logging import MetricLogger
from uvhand_tpu.data.loader import prefetch_samples


def test_synchronize_between_processes_merges_counts():
    # simulate two hosts with different local metric streams
    a, b = MetricLogger(), MetricLogger()
    for v in (1.0, 2.0, 3.0):
        a.update(loss=v)
    for v in (10.0, 20.0):
        b.update(loss=v)

    states = {
        "a": {k: (m.count, m.total) for k, m in a.meters.items()},
        "b": {k: (m.count, m.total) for k, m in b.meters.items()},
    }

    def fake_allgather_for(me):
        # what process_allgather returns: stacked [count, total] per host
        def fn(arr):
            other = "b" if me == "a" else "a"
            return np.stack([np.asarray(arr),
                             np.asarray(states[other]["loss"], np.float64)])
        return fn

    a.synchronize_between_processes(allgather_fn=fake_allgather_for("a"))
    b.synchronize_between_processes(allgather_fn=fake_allgather_for("b"))

    expect = (1 + 2 + 3 + 10 + 20) / 5.0
    assert abs(a.meters["loss"].global_avg - expect) < 1e-12
    assert abs(b.meters["loss"].global_avg - expect) < 1e-12
    assert a.meters["loss"].count == b.meters["loss"].count == 5


def test_synchronize_single_process_noop():
    lg = MetricLogger()
    lg.update(loss=4.0)
    lg.synchronize_between_processes()  # process_count==1 -> no-op
    assert lg.meters["loss"].global_avg == 4.0


class _SlowDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"idx": i, "x": np.full((4,), i, np.float32)}


def test_prefetch_samples_order_and_content():
    ds = _SlowDataset(20)
    chunks = [[0, 1, 2], [3, 4, 5], [6, 7, 8], [9, 10, 11]]
    got = list(prefetch_samples(ds, chunks, ahead=2, workers=4))
    assert len(got) == len(chunks)
    for chunk, samples in zip(chunks, got):
        assert [s["idx"] for s in samples] == chunk
        for s in samples:
            np.testing.assert_array_equal(s["x"], np.full((4,), s["idx"]))
