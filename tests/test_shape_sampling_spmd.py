"""Per-batch global shape sampling under multi-host SPMD (VERDICT r3 #5).

The reference samples a new (ratio, pixels) shape per batch
(reference datasets/utils.py:29-53). Under SPMD every controller must
trace the SAME program shape for the same step; round 3 simply disabled
sampling for process_count > 1. Now batch n's shape is a pure function of
(shape_seed, n) and the Loader delivers batches in ticket order, so two
processes with different data seeds but a shared shape_seed consume
identical shape SEQUENCES.
"""

import numpy as np
import pytest

from unidepth_tpu.datasets.loader import Loader, ShapeSampler, WeightedConcat

pytestmark = pytest.mark.smoke

CONSTRAINTS = {
    "ratio_bounds": (0.5, 2.0),
    "pixels_min": 1000,
    "pixels_max": 4000,
    "shape_mult": 14,
    "sample": True,
}


class _ShapedDummy:
    """Minimal shape-aware dataset: honors the loader's per-batch
    image_shape like BaseDataset.get_single_item does."""

    def __init__(self, length=32, seed=0):
        self.length, self.seed = length, seed

    def __len__(self):
        return self.length

    def get_single_item(self, idx, rng, image_shape=None, base=None):
        h, w = image_shape if image_shape is not None else (28, 28)
        r = np.random.default_rng(self.seed + idx)
        depth = r.uniform(0.1, 10.0, (h, w)).astype(np.float32)
        return {
            "image": r.integers(0, 255, (h, w, 3), dtype=np.uint8),
            "depth": depth,
            "depth_mask": depth > 0,
            "K": np.asarray(
                [[0.7 * w, 0, w / 2], [0, 0.7 * w, h / 2], [0, 0, 1]], np.float32
            ),
            "validity": np.ones((h, w), bool),
            "flip": False,
            "si": False,
        }


def _loader(data_seed, shape_seed, num_threads):
    return Loader(
        WeightedConcat([_ShapedDummy(length=32, seed=data_seed)]),
        batch_size=2,
        shape_sampler=ShapeSampler(CONSTRAINTS),
        num_threads=num_threads,
        seed=data_seed,
        shape_seed=shape_seed,
    )


def _take_shapes(loader, n):
    it = iter(loader)
    out = []
    for _ in range(n):
        out.append(next(it)["image"].shape[1:3])
    loader.close()
    return out


def test_two_processes_identical_shape_sequence():
    """Different per-process data seeds, same shape_seed -> identical
    consumed shape sequence (the multi-host contract)."""
    a = _take_shapes(_loader(data_seed=0, shape_seed=7, num_threads=4), 12)
    b = _take_shapes(_loader(data_seed=100, shape_seed=7, num_threads=4), 12)
    assert a == b
    assert len(set(a)) > 1, "degenerate sampler: one shape only"


def test_threaded_matches_single_thread_sequence():
    """Worker scheduling must not perturb the shape sequence: the
    threaded ordered path equals the deterministic num_threads=0 path."""
    a = _take_shapes(_loader(data_seed=3, shape_seed=11, num_threads=4), 10)
    b = _take_shapes(_loader(data_seed=3, shape_seed=11, num_threads=0), 10)
    assert a == b


def test_shape_for_batch_is_pure():
    ld = _loader(data_seed=0, shape_seed=5, num_threads=0)
    seq1 = [ld.shape_for_batch(n) for n in range(20)]
    seq2 = [ld.shape_for_batch(n) for n in range(20)]
    assert seq1 == seq2
    for h, w in seq1:
        assert h % 14 == 0 and w % 14 == 0


def test_unordered_mode_unchanged():
    """Without shape_seed the legacy path still works (shapes drawn from
    worker rngs, unordered delivery)."""
    ld = Loader(
        WeightedConcat([_ShapedDummy(length=16)]),
        batch_size=2,
        shape_sampler=ShapeSampler(CONSTRAINTS),
        num_threads=2,
        seed=0,
    )
    shapes = _take_shapes(ld, 4)
    assert all(h % 14 == 0 and w % 14 == 0 for h, w in shapes)
