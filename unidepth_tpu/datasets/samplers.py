"""Evaluation sampling across processes.

Reference parity: DistributedSamplerNoDuplicate (datasets/samplers.py:4-19)
— a sampler that shards a dataset across ranks WITHOUT padding duplicates
on the trailing rank, so validation metrics are exact. Here it is a simple
index iterator: process p of P takes indices p, p+P, p+2P, ... with no
wrap-around.
"""

from __future__ import annotations


class ShardedEvalSampler:
    def __init__(self, length: int, num_shards: int, shard_id: int):
        assert 0 <= shard_id < num_shards
        self.length = length
        self.num_shards = num_shards
        self.shard_id = shard_id

    def __iter__(self):
        return iter(range(self.shard_id, self.length, self.num_shards))

    def __len__(self):
        return (self.length - self.shard_id + self.num_shards - 1) // self.num_shards
