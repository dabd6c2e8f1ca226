"""Regression tests for the round-5 fixed-cost helpers: the size-aware
pre-shuffle coalesce, the small-table read block policy, and the bounded
per-worker task-instance cache."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray
import ray.data as rd

from kgx.functions.collect import default_shuffle_blocks, shuffle_coalesce
from kgx.sources.pages import _SMALL_TABLE_BYTES, read_table


def test_shuffle_coalesce_merges_tiny_blocks():
    # 64 one-row blocks of narrow data must coalesce down to the
    # cluster-derived target (max(8, ncpu//2)) — the B_in x B_out
    # machinery fix.
    ds = rd.range(64, override_num_blocks=64)
    out = shuffle_coalesce(ds).materialize()
    assert out.num_blocks() == default_shuffle_blocks()
    # rows survive untouched
    assert sorted(r["id"] for r in out.take_all()) == list(range(64))


def test_shuffle_coalesce_respects_block_size_bound():
    # A dataset whose bytes exceed target_block_bytes x target keeps
    # MORE blocks than the cpu-derived floor: a corpus-proportional
    # table can never collapse into oversize blocks.
    big = rd.range(4000, override_num_blocks=40).map_batches(
        lambda b: pa.table({"payload": [b"x" * 10_000] * b.num_rows}),
        batch_format="pyarrow")
    out = shuffle_coalesce(big, target_block_bytes=1 << 20).materialize()
    size = out.size_bytes()
    assert size > (1 << 20)
    assert out.num_blocks() >= size // (1 << 20)


def test_read_table_small_file_block_policy(tmp_path):
    p = str(tmp_path / "small.parquet")
    pq.write_table(pa.table({"x": list(range(1000))}), p)
    assert os.path.getsize(p) < _SMALL_TABLE_BYTES
    ds = read_table(p, columns=["x"])
    ncpu = int(ray.cluster_resources().get("CPU", 4))
    assert ds.materialize().num_blocks() <= max(8, ncpu // 2)
    assert ds.count() == 1000


def test_read_table_directory_uses_default(tmp_path):
    d = tmp_path / "sharded"
    d.mkdir()
    for i in range(3):
        pq.write_table(pa.table({"x": [i] * 10}), str(d / f"part{i}.parquet"))
    ds = read_table(str(d))
    assert ds.count() == 30  # no override path taken; just reads


def test_task_instance_cache_is_bounded():
    from kgx.stages.extract import (_WORKER_EXTRACTOR_CACHE,
                                    _WORKER_EXTRACTOR_CACHE_MAX,
                                    make_task_extractor)

    class Echo:
        def __init__(self, tag):
            self.tag = tag

        def __call__(self, batch):
            return batch

    _WORKER_EXTRACTOR_CACHE.clear()
    batch = pa.table({"x": [1]})
    for i in range(3 * _WORKER_EXTRACTOR_CACHE_MAX):
        make_task_extractor(Echo, tag=i)(batch)
    assert len(_WORKER_EXTRACTOR_CACHE) <= _WORKER_EXTRACTOR_CACHE_MAX
    # LRU keeps the most recent keys
    assert any(f"'tag', {3 * _WORKER_EXTRACTOR_CACHE_MAX - 1}" in k
               for k in _WORKER_EXTRACTOR_CACHE)
