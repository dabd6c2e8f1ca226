"""Sharded fingerprint index actors — the one stage where raw Ray actors
are the right tool (a shared MUTABLE membership index that must answer
"seen before?" across batches and across runs; a Dataset shuffle can
dedup within one pass, but cannot consult state from a previous pass
without re-reading that corpus into the shuffle).

Shape: ``n_shards`` single-purpose actors, each owning the fingerprints
whose first 8 digest bytes (as a big-endian int64) hash into its shard,
so any shard count up to 2^64 gets a near-uniform split.  Lookups/inserts batch per
(caller batch x shard): a ``map_batches`` task partitions its batch's
fingerprints by shard and issues ONE ``check_and_add``/``contains`` call
per shard, so actor round-trips are O(shards) per batch, not O(rows).
Memory: 16-byte digests in a Python set, ~70 B/entry effective — 10^8
fingerprints ≈ 7 GB total across shards; shard count spreads that across
nodes (each actor is independently placeable).  Persistence is one
parquet file per shard (``save``/``load``), so an index survives runs
and an ingest pipeline can dedup against everything it has ever seen.

Ordering semantics: ``filter_new`` is first-seen-wins ACROSS calls (rows
already in the index always drop; exactly one of the in-flight
duplicates within a single streaming pass survives, but WHICH one
depends on block arrival order).  For order-independent single-corpus
dedup use ``kgx.pipelines.kg.dedup_pages_by_text``; the index's job is
the INCREMENTAL case — "drop what yesterday's corpus already contains"
— where the seen-set is fixed and the result is deterministic.

The reference has no incremental anything (it re-indexes from scratch,
/root/reference/graphrag_lite_x.py); this is the engine-side primitive
its users would need at a 10^12-document scale.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray


@ray.remote(num_cpus=0.25)
class FingerprintShard:
    """One shard's membership set.  num_cpus=0.25 — lookups are tiny
    set probes; four shards co-schedule per core."""

    def __init__(self) -> None:
        self._seen: set[bytes] = set()

    def check_and_add(self, fps: list[bytes]) -> list[bool]:
        """True where fp was NEW (and is now recorded).  Duplicates
        WITHIN the list resolve first-occurrence-wins."""
        seen = self._seen
        out = []
        for f in fps:
            if f in seen:
                out.append(False)
            else:
                seen.add(f)
                out.append(True)
        return out

    def contains(self, fps: list[bytes]) -> list[bool]:
        seen = self._seen
        return [f in seen for f in fps]

    def ingest(self, fps: list[bytes]) -> int:
        before = len(self._seen)
        self._seen.update(fps)
        return len(self._seen) - before

    def size(self) -> int:
        return len(self._seen)

    def dump(self) -> bytes:
        """Shard contents as parquet bytes (for save())."""
        import io
        buf = io.BytesIO()
        pq.write_table(
            pa.table({"fp": pa.array(sorted(self._seen), pa.binary())}),
            buf)
        return buf.getvalue()


class FingerprintIndex:
    """Facade over the shard actors."""

    def __init__(self, n_shards: int = 8):
        self.n_shards = n_shards
        self.shards = [FingerprintShard.remote() for _ in range(n_shards)]

    # -- routing ---------------------------------------------------------
    @staticmethod
    def fingerprint(text: str) -> bytes:
        return hashlib.md5(text.encode("utf-8")).digest()

    def _route(self, fps: list[bytes]) -> dict[int, list[int]]:
        """shard -> positions in fps (shard = first 8 digest bytes as a
        big-endian int, mod n) — uniform for any shard count, unlike a
        single-byte route which leaves shards past 256 permanently empty
        and skews when n_shards does not divide 256.  ``load`` re-routes
        from the raw fingerprints, so saved indexes stay compatible."""
        buckets: dict[int, list[int]] = {}
        n = self.n_shards
        for i, f in enumerate(fps):
            s = int.from_bytes(f[:8], "big") % n if f else 0
            buckets.setdefault(s, []).append(i)
        return buckets

    def _call(self, method: str, fps: list[bytes]) -> list[bool]:
        buckets = self._route(fps)
        futs = {s: getattr(self.shards[s], method).remote(
                    [fps[i] for i in idx])
                for s, idx in buckets.items()}
        out = [False] * len(fps)
        for s, idx in buckets.items():
            for i, v in zip(idx, ray.get(futs[s])):
                out[i] = v
        return out

    # -- dataset ops ------------------------------------------------------
    def filter_new(self, ds, *, text_col: str = "text"):
        """Keep only rows whose text fingerprint is not yet in the index,
        inserting as it goes (first-seen-wins across everything the
        index has ever been shown)."""
        idx = self

        def fn(batch: pa.Table) -> pa.Table:
            fps = [idx.fingerprint(t) if t else b""
                   for t in batch[text_col].to_pylist()]
            new = idx._call("check_and_add", fps)
            mask = pa.array(new, pa.bool_())
            return batch.filter(mask)

        return ds.map_batches(fn, batch_format="pyarrow")

    def filter_seen(self, ds, *, text_col: str = "text"):
        """Drop rows whose fingerprint IS in the index, WITHOUT mutating
        it — the deterministic variant: with a fixed index the result is
        independent of block arrival order (use this to screen a new
        corpus against previously ingested ones; handle duplicates
        WITHIN the new corpus with an order-independent dedup)."""
        idx = self

        def fn(batch: pa.Table) -> pa.Table:
            fps = [idx.fingerprint(t) if t else b""
                   for t in batch[text_col].to_pylist()]
            seen = idx._call("contains", fps)
            mask = pa.array([not s for s in seen], pa.bool_())
            return batch.filter(mask)

        return ds.map_batches(fn, batch_format="pyarrow")

    @staticmethod
    def digest_texts(ds, *, text_col: str = "text"):
        """Dataset of per-row md5 digests for a texts Dataset — the
        persisted PER-SOURCE parquet sidecar an incremental pipeline
        writes once per ingested corpus, so later ingests rebuild the
        membership set from 16-byte digests instead of re-reading the
        texts (kgx/pipelines/kg.py:_fpindex_sync)."""
        def fn(batch: pa.Table) -> pa.Table:
            return pa.table({"fp": pa.array(
                [FingerprintIndex.fingerprint(t) if t else b""
                 for t in batch[text_col].to_pylist()], pa.binary())})
        return ds.map_batches(fn, batch_format="pyarrow")

    def ingest_digests(self, ds, *, fp_col: str = "fp") -> int:
        """Bulk-add PRE-COMPUTED digests (a saved sidecar from
        :meth:`digest_texts`) — same in-task actor routing as
        ``ingest_texts``; the driver never sees a fingerprint."""
        idx = self

        def fn(batch: pa.Table) -> pa.Table:
            fps = batch[fp_col].to_pylist()
            buckets = idx._route(fps)
            added = sum(ray.get([
                idx.shards[s].ingest.remote([fps[i] for i in ii])
                for s, ii in buckets.items()]))
            return pa.table({"added": pa.array([added], pa.int64())})

        tot = 0
        for b in ds.map_batches(fn, batch_format="pyarrow") \
                   .iter_batches(batch_format="pyarrow"):
            tot += sum(b["added"].to_pylist())
        return tot

    def ingest_texts(self, ds, *, text_col: str = "text") -> int:
        """Bulk-add every row's fingerprint; returns rows newly added."""
        idx = self

        def fn(batch: pa.Table) -> pa.Table:
            fps = [idx.fingerprint(t) if t else b""
                   for t in batch[text_col].to_pylist()]
            buckets = idx._route(fps)
            added = sum(ray.get([
                idx.shards[s].ingest.remote([fps[i] for i in ii])
                for s, ii in buckets.items()]))
            return pa.table({"added": pa.array([added], pa.int64())})

        tot = 0
        for b in ds.map_batches(fn, batch_format="pyarrow") \
                   .iter_batches(batch_format="pyarrow"):
            tot += sum(b["added"].to_pylist())
        return tot

    # -- stats / persistence ----------------------------------------------
    def size(self) -> int:
        return sum(ray.get([s.size.remote() for s in self.shards]))

    def save(self, out_dir: str) -> None:
        os.makedirs(out_dir, exist_ok=True)
        blobs = ray.get([s.dump.remote() for s in self.shards])
        for i, blob in enumerate(blobs):
            with open(os.path.join(out_dir, f"shard-{i:04d}.parquet"),
                      "wb") as f:
                f.write(blob)

    @classmethod
    def load(cls, in_dir: str, n_shards: int | None = None
             ) -> "FingerprintIndex":
        import glob
        files = sorted(glob.glob(os.path.join(in_dir, "shard-*.parquet")))
        idx = cls(n_shards or len(files) or 8)
        for f in files:
            fps = pq.read_table(f)["fp"].to_pylist()
            buckets = idx._route(fps)
            ray.get([idx.shards[s].ingest.remote([fps[i] for i in ii])
                     for s, ii in buckets.items()])
        return idx
