"""device_prefetch: background-thread device staging (data/prefetch.py)."""

import numpy as np
import pytest

import jax

from camels_diffusion_model_tpu.data.prefetch import device_prefetch


def test_preserves_order_count_and_values():
    batches = [
        (np.full((2, 3), i, np.float32), np.full((2,), -i, np.float32))
        for i in range(7)
    ]
    out = list(device_prefetch(batches, depth=3))
    assert len(out) == 7
    for i, (bx, bc) in enumerate(out):
        assert isinstance(bx, jax.Array)
        np.testing.assert_array_equal(np.asarray(bx), batches[i][0])
        np.testing.assert_array_equal(np.asarray(bc), batches[i][1])


def test_transform_runs_per_item():
    seen = []

    def transform(item):
        seen.append(item)
        return item * 2

    out = list(device_prefetch([1, 2, 3], transform=transform, depth=2))
    assert out == [2, 4, 6]
    assert seen == [1, 2, 3]


def test_short_iterables_and_depth_one():
    assert list(device_prefetch([], depth=2)) == []
    assert [int(x) for x in device_prefetch([np.int32(5)], depth=4)] == [5]
    vals = [np.float32(v) for v in (1.0, 2.0, 3.0)]
    assert [float(x) for x in device_prefetch(vals, depth=1)] == [1.0, 2.0, 3.0]


def test_transform_exception_propagates():
    def boom(item):
        if item == 2:
            raise RuntimeError("bad batch")
        return item

    it = device_prefetch([1, 2, 3], transform=boom, depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="bad batch"):
        list(it)


def test_invalid_depth_rejected():
    with pytest.raises(ValueError):
        next(device_prefetch([1], depth=0))


def test_lazy_source_not_fully_consumed_ahead():
    # depth bounds read-ahead: after consuming 1 item with depth=2, the
    # source should have been pulled at most 1 + 2 times.
    pulled = []

    def gen():
        for i in range(10):
            pulled.append(i)
            yield i

    it = device_prefetch(gen(), transform=lambda x: x, depth=2)
    assert next(it) == 0
    assert len(pulled) <= 4
