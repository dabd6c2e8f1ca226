"""User-callable map-reduce hook API (SURVEY.md §2.10).

The reference exposes ``MapReduceProcessor.process(items, question,
map_func, reduce_func, max_concurrency)``
(/root/reference/querying/map_reduce.py:21-61): user callables mapped
over items with a bounded-concurrency asyncio semaphore, results
(optionally helpfulness-sorted) reduced to one value.

Here the same hook rides Ray Data: items become a Dataset, ``map_func``
runs inside ``map_batches`` (row-at-a-time adapter, batched transport,
``concurrency`` bounds the pool instead of a semaphore), and
``reduce_func`` runs once on the collected mapped values — which are
small by contract (one reduced record per item), so the driver-side
collect is the reference's own contract, not a scale hazard.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from typing import Any

import pyarrow as pa
import ray.data as rd


def process(items: list[Any], question: str,
            map_func: Callable[[Any, str], Any],
            reduce_func: Callable[[list[Any], str], Any],
            *, max_concurrency: int | None = None,
            sort_key: Callable[[Any], Any] | None = None) -> Any:
    """Map ``map_func(item, question)`` over items in parallel, then
    ``reduce_func(mapped, question)``.

    ``sort_key`` optionally orders mapped results before the reduce (the
    reference sorts by LLM helpfulness desc, map_reduce.py:119); default
    keeps item order.  Callables must be picklable (defined at module
    level or closures over picklable state).
    """
    if not items:
        return reduce_func([], question)

    items_tbl = pa.table({
        "idx": pa.array(range(len(items)), pa.int64()),
        "item": pa.array([json.dumps(i) for i in items], pa.string()),
    })

    def run_map(batch: pa.Table) -> pa.Table:
        idxs = batch["idx"].to_pylist()
        outs = [json.dumps(map_func(json.loads(i), question))
                for i in batch["item"].to_pylist()]
        return pa.table({
            "idx": pa.array(idxs, pa.int64()),
            "mapped": pa.array(outs, pa.string()),
        })

    ds = rd.from_arrow(items_tbl)
    if max_concurrency:
        ds = ds.repartition(min(len(items), max_concurrency))
    mapped_rows: list[tuple[int, Any]] = []
    for b in ds.map_batches(run_map,
                            batch_format="pyarrow").iter_batches(
            batch_format="pyarrow"):
        for i, m in zip(b["idx"].to_pylist(), b["mapped"].to_pylist()):
            mapped_rows.append((i, json.loads(m)))
    mapped_rows.sort(key=lambda t: t[0])
    mapped = [m for _i, m in mapped_rows]
    if sort_key is not None:
        mapped.sort(key=sort_key)
    return reduce_func(mapped, question)
