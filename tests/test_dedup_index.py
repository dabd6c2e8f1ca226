"""FingerprintIndex actors (kgx/state/dedup_index.py) + cross-shard page
screening in update_pipeline."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from kgx.state.dedup_index import FingerprintIndex


def _docs(texts, start=0):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(start, start + len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def test_filter_new_first_pass_keeps_all_second_drops_dups(ray_session):
    idx = FingerprintIndex(n_shards=4)
    first = ["alpha text", "beta text", "gamma text"]
    out1 = idx.filter_new(_docs(first)).to_pandas()
    assert sorted(out1["text"]) == sorted(first)
    # second pass: one repeat, one new
    out2 = idx.filter_new(_docs(["beta text", "delta text"], 10)).to_pandas()
    assert out2["text"].tolist() == ["delta text"]
    assert idx.size() == 4


def test_filter_seen_does_not_mutate(ray_session):
    idx = FingerprintIndex(n_shards=4)
    idx.ingest_texts(_docs(["known one", "known two"]))
    assert idx.size() == 2
    out = idx.filter_seen(_docs(["known one", "fresh"])).to_pandas()
    assert out["text"].tolist() == ["fresh"]
    assert idx.size() == 2                      # contains-only
    # repeated call gives the identical answer (deterministic)
    out2 = idx.filter_seen(_docs(["known one", "fresh"])).to_pandas()
    assert out2["text"].tolist() == ["fresh"]


def test_save_load_roundtrip(ray_session, tmp_path):
    idx = FingerprintIndex(n_shards=4)
    texts = [f"doc number {i}" for i in range(50)]
    idx.ingest_texts(_docs(texts))
    d = str(tmp_path / "fpidx")
    idx.save(d)
    idx2 = FingerprintIndex.load(d)
    assert idx2.size() == 50
    assert idx2.filter_seen(_docs(texts[:5] + ["brand new"])) \
               .to_pandas()["text"].tolist() == ["brand new"]


def test_ingest_counts_only_new(ray_session):
    idx = FingerprintIndex(n_shards=4)
    assert idx.ingest_texts(_docs(["a b", "c d"])) == 2
    assert idx.ingest_texts(_docs(["a b", "e f"])) == 1


def test_update_pipeline_cross_shard_dedup(ray_session, tmp_path_factory):
    """A new shard whose pages duplicate base-corpus pages contributes
    NOTHING new: the cross-shard screen drops them before extraction."""
    import glob
    import shutil
    from kgx.pipelines.kg import KGConfig, run_pipeline, update_pipeline
    from kgx.synth import write_pages

    root = str(tmp_path_factory.mktemp("xshard"))
    pages = write_pages(root, 80, seed=13)
    files = sorted(glob.glob(f"{pages}/*.parquet"))
    a, b = os.path.join(root, "a"), os.path.join(root, "b")
    os.makedirs(a), os.makedirs(b)
    half = len(files) // 2
    for f in files[:half]:
        shutil.copy(f, a)
    # shard b: the second half PLUS a copy of one first-half file
    for f in files[half:]:
        shutil.copy(f, b)
    shutil.copy(files[0], os.path.join(b, "dup-of-first.parquet"))

    cfg = KGConfig(cross_shard_dedup=True)
    out = str(tmp_path_factory.mktemp("kg_x"))
    run_pipeline(a, out, cfg)
    p = update_pipeline(b, out, cfg)

    # the duplicated file's pages were screened out of the shard's texts
    shard_texts = pq.read_table(
        os.path.join(p["shard"], "texts").replace("extracted", "texts"))
    base_texts = pq.read_table(os.path.join(out, "texts"))
    assert set(shard_texts["url"].to_pylist()).isdisjoint(
        base_texts["url"].to_pylist())

    # and the final KG equals a from-scratch run over the TRUE union
    # (duplicates removed), because screened pages add no mentions
    out_ref = str(tmp_path_factory.mktemp("kg_ref"))
    ref = run_pipeline(pages, out_ref, KGConfig())
    got = pq.read_table(p["nodes"])
    want = pq.read_table(ref["nodes"])
    assert got.to_pylist() == want.to_pylist()


def test_shard_actor_death_fails_loudly_not_silently(ray_session):
    """A dead shard must raise, never silently report 'unseen' (which
    would let duplicates back in).  Default max_restarts=0 means the
    RayActorError surfaces to the caller — correctness by loud failure;
    persistence (save/load) is the recovery path."""
    import pytest
    import ray
    from ray.exceptions import RayActorError

    idx = FingerprintIndex(n_shards=2)
    idx.ingest_texts(_docs(["some known text"]))
    ray.kill(idx.shards[0])
    ray.kill(idx.shards[1])
    with pytest.raises((RayActorError, Exception)):
        fps = [idx.fingerprint("some known text")]
        idx._call("contains", fps)


def test_cross_shard_knob_invalidates_shard_checkpoint(ray_session,
                                                       tmp_path_factory):
    """cross_shard_dedup is a SEMANTIC knob: toggling it must re-run the
    ingested shard's texts stage (config-hash invalidation), not silently
    reuse the differently-filtered checkpoint."""
    import glob
    import os
    import shutil
    from kgx.pipelines.kg import KGConfig, run_pipeline, update_pipeline
    from kgx.synth import write_pages

    root = str(tmp_path_factory.mktemp("knobinv"))
    pages = write_pages(root, 60, seed=23)
    files = sorted(glob.glob(f"{pages}/*.parquet"))
    a, b = os.path.join(root, "a"), os.path.join(root, "b")
    os.makedirs(a), os.makedirs(b)
    for f in files[:len(files) // 2]:
        shutil.copy(f, a)
    for f in files[len(files) // 2:]:
        shutil.copy(f, b)
    # duplicate one base file into the shard so the knob has an effect
    shutil.copy(files[0], os.path.join(b, "dup.parquet"))

    out = str(tmp_path_factory.mktemp("kg_knob"))
    run_pipeline(a, out, KGConfig())
    p1 = update_pipeline(b, out, KGConfig(cross_shard_dedup=False))
    texts1 = pq.read_table(os.path.join(p1["shard"], "texts")).num_rows
    p2 = update_pipeline(b, out, KGConfig(cross_shard_dedup=True))
    texts2 = pq.read_table(os.path.join(p2["shard"], "texts")).num_rows
    assert p1["shard"] == p2["shard"]
    assert texts2 < texts1          # duplicated pages screened out


def test_route_uses_wide_digest_not_first_byte(ray_session):
    """ADVICE r2: routing must use 8 digest bytes so shard counts that do
    not divide 256 (or exceed 256) still split near-uniformly."""
    idx = FingerprintIndex(n_shards=5)
    fps = [FingerprintIndex.fingerprint(f"doc-{i}") for i in range(2000)]
    buckets = idx._route(fps)
    sizes = sorted(len(v) for v in buckets.values())
    assert len(buckets) == 5                    # every shard gets traffic
    assert sizes[0] > 0.6 * sizes[-1]           # near-uniform, not 256-skewed
    # first-byte-only routing would differ from the wide route for many fps
    wide = {i: int.from_bytes(f[:8], "big") % 5 for i, f in enumerate(fps)}
    for s, ii in buckets.items():
        for i in ii:
            assert wide[i] == s


def _pages_parquet(path, rows):
    """(url, ts_us, text) rows -> a pages-shaped parquet file."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    os.makedirs(path, exist_ok=True)
    t = pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "html": pa.array([None] * len(rows), pa.binary()),
        "text": pa.array([r[2] for r in rows], pa.string()),
        "lang": pa.array(["en"] * len(rows), pa.string()),
    })
    pq.write_table(t, os.path.join(path, "part.parquet"))
    return path


def test_update_supersede_parity(ray_session, tmp_path_factory):
    """Newest-snapshot-wins: update_pipeline(supersede_recrawls=True)
    over a shard that re-crawls a url with changed text must equal a
    from-scratch build over each url's LATEST snapshot, byte for byte,
    on nodes, edges and claims."""
    import pyarrow.parquet as pq
    from kgx.pipelines.kg import KGConfig, run_pipeline, update_pipeline

    root = str(tmp_path_factory.mktemp("supersede"))
    base_rows = [("u://1", 1_000_000, "alpha beta alpha"),
                 ("u://2", 1_000_000, "beta gamma"),
                 ("u://3", 1_000_000, "delta alpha epsilon")]
    shard_rows = [("u://2", 2_000_000, "epsilon zeta zeta"),   # re-crawl
                  ("u://4", 2_000_000, "gamma gamma theta")]   # new url
    latest_rows = [base_rows[0], shard_rows[0], base_rows[2], shard_rows[1]]

    cfg = KGConfig(extractor="term", supersede_recrawls=True)
    a = _pages_parquet(os.path.join(root, "a"), base_rows)
    b = _pages_parquet(os.path.join(root, "b"), shard_rows)
    out = os.path.join(root, "out")
    run_pipeline(a, out, cfg)
    p = update_pipeline(b, out, cfg)

    fresh_in = _pages_parquet(os.path.join(root, "latest"), latest_rows)
    fresh = run_pipeline(fresh_in, os.path.join(root, "fresh"), cfg)

    for stage in ("nodes", "edges", "claims"):
        got = pq.read_table(p[stage]).to_pylist()
        want = pq.read_table(fresh[stage]).to_pylist()
        assert got == want, stage

    # the retracted snapshot's terms must actually be gone
    names = {r["name"] for r in pq.read_table(p["nodes"]).to_pylist()}
    assert "beta" in names           # still in u://1
    assert "zeta" in names and "theta" in names
    # gamma now appears only via u://4 (u://2's old snapshot retracted)
    nodes = {r["name"]: r["n_instances"]
             for r in pq.read_table(p["nodes"]).to_pylist()}
    assert nodes["gamma"] == 2


def test_supersede_requires_warc_ts(ray_session, tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest
    from kgx.pipelines.kg import KGConfig, run_pipeline
    root = str(tmp_path_factory.mktemp("supersede_bad"))
    os.makedirs(os.path.join(root, "a"), exist_ok=True)
    pq.write_table(pa.table({
        "url": pa.array(["u://1"], pa.string()),
        "html": pa.array([None], pa.binary()),
        "text": pa.array(["alpha"], pa.string()),
        "lang": pa.array(["en"], pa.string()),
    }), os.path.join(root, "a", "part.parquet"))
    with pytest.raises(Exception, match="warc_ts"):
        run_pipeline(os.path.join(root, "a"), os.path.join(root, "out"),
                     KGConfig(extractor="term", supersede_recrawls=True))


def _crawlmeta_dir(root, name, rows):
    """rows = (url, ts_int) -> a fake extracted-checkpoint layout whose
    crawlmeta sidecar _supersede_losers reads."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    src = os.path.join(root, name)
    ext = os.path.join(src, "extracted")
    os.makedirs(ext, exist_ok=True)
    mdir = os.path.join(src, "crawlmeta")
    os.makedirs(mdir, exist_ok=True)
    pq.write_table(pa.table({
        "url": pa.array([r[0] for r in rows], pa.string()),
        "ts": pa.array([r[1] for r in rows], pa.int64()),
    }), os.path.join(mdir, "meta.parquet"))
    return ext


def _losers_brute(rowsets):
    """The pre-r5 driver-dict semantics, as the parity twin."""
    best = {}
    for i, rows in enumerate(rowsets):
        for url, ts in rows:
            if (url not in best) or ((ts, i) > best[url]):
                best[url] = (ts, i)
    return [{u for u, _ in rows if best[u][1] != i}
            for i, rows in enumerate(rowsets)]


def test_supersede_losers_parity_and_bounded_state(
        ray_session, tmp_path_factory):
    """r5: _supersede_losers runs as a bucketed groupby argmax shuffle;
    the driver materializes ONLY overlap-bounded loser rows.  Parity vs
    the brute-force dict on adversarial data (ties, per-source
    duplicates, 3 sources), and bounded-state: base N=2000 urls,
    refresh N/100 -> exactly the overlap materializes."""
    import random

    from kgx.pipelines.kg import _supersede_losers

    root = str(tmp_path_factory.mktemp("sup_losers"))

    # --- adversarial parity: ties on ts (source position wins), a url
    # re-crawled twice WITHIN one source, disjoint + overlapping urls
    rowsets = [
        [("u://a", 10), ("u://b", 10), ("u://c", 5), ("u://c", 30)],
        [("u://a", 10), ("u://d", 1)],            # ts tie with source 0
        [("u://b", 9), ("u://c", 30), ("u://e", 2)],  # tie with src 0's max
    ]
    paths = [_crawlmeta_dir(root, f"s{i}", rows)
             for i, rows in enumerate(rowsets)]
    assert _supersede_losers(paths) == _losers_brute(rowsets)

    # --- randomized parity
    rng = random.Random(7)
    urls = [f"u://{i}" for i in range(80)]
    rowsets = [[(u, rng.randrange(5)) for u in rng.sample(urls, 50)]
               for _ in range(3)]
    paths = [_crawlmeta_dir(root, f"r{i}", rows)
             for i, rows in enumerate(rowsets)]
    assert _supersede_losers(paths) == _losers_brute(rowsets)

    # --- bounded driver state: 2000-url base, 20-url refresh
    n, overlap = 2000, 20
    base = [(f"u://{i}", 100) for i in range(n)]
    refresh = [(f"u://{i}", 200) for i in range(overlap)]
    paths = [_crawlmeta_dir(root, "base", base),
             _crawlmeta_dir(root, "refresh", refresh)]
    losers = _supersede_losers(paths)
    assert losers[0] == {f"u://{i}" for i in range(overlap)}
    assert losers[1] == set()
    # what reached the driver is the OVERLAP, two orders below the corpus
    assert sum(len(s) for s in losers) == overlap


def test_supersede_losers_single_source(ray_session, tmp_path_factory):
    from kgx.pipelines.kg import _supersede_losers
    root = str(tmp_path_factory.mktemp("sup_single"))
    p = _crawlmeta_dir(root, "only", [("u://1", 5), ("u://2", 9)])
    assert _supersede_losers([p]) == [set()]


def test_fpindex_persist_zero_reread(ray_session, tmp_path_factory):
    """r5 (VERDICT item 2): cross_shard_dedup persists per-source digest
    sidecars under {out}/fpindex; the SECOND ingest rebuilds the
    membership set from those sidecars and reads ZERO prior texts
    checkpoints (manifest-asserted), with results identical to a
    from-scratch clean-union run."""
    import glob
    import json
    import shutil
    from kgx.pipelines.kg import KGConfig, run_pipeline, update_pipeline
    from kgx.synth import write_pages

    root = str(tmp_path_factory.mktemp("fpp"))
    pages = write_pages(root, 90, seed=31)
    files = sorted(glob.glob(f"{pages}/*.parquet"))
    third = max(1, len(files) // 3)
    dirs = []
    for i, chunk in enumerate((files[:third], files[third:2 * third],
                               files[2 * third:])):
        d = os.path.join(root, f"s{i}")
        os.makedirs(d)
        for f in chunk:
            shutil.copy(f, d)
        dirs.append(d)
    # each later shard also duplicates a file from an EARLIER one, so
    # the screen has real work on every ingest
    shutil.copy(files[0], os.path.join(dirs[1], "dup0.parquet"))
    shutil.copy(files[third], os.path.join(dirs[2], "dup1.parquet"))

    cfg = KGConfig(cross_shard_dedup=True)
    out = str(tmp_path_factory.mktemp("kg_fpp"))
    run_pipeline(dirs[0], out, cfg)
    update_pipeline(dirs[1], out, cfg)          # cold: digests base texts

    mpath = os.path.join(out, "fpindex", "_MANIFEST.json")
    with open(mpath) as f:
        m1 = json.load(f)
    # first ingest had to read the base texts once (cold digesting)
    assert len(m1["ingested"]) == 1

    p = update_pipeline(dirs[2], out, cfg)      # warm: sidecars only
    with open(mpath) as f:
        m2 = json.load(f)
    assert len(m2["ingested"]) == 2             # base texts + shard 1
    # THE contract: the warm sync read no prior texts checkpoint
    assert m2["last_sync_texts_reads"] == []

    # byte-identical to the from-scratch clean union
    out_ref = str(tmp_path_factory.mktemp("kg_fpp_ref"))
    ref = run_pipeline(pages, out_ref, KGConfig())
    assert pq.read_table(p["nodes"]).to_pylist() == \
        pq.read_table(ref["nodes"]).to_pylist()
    assert pq.read_table(p["edges"]).to_pylist() == \
        pq.read_table(ref["edges"]).to_pylist()
