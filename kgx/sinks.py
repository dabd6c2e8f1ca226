"""Training-data export sinks.

The reference exports its graph as JSON (S2, `main.py:86-107` save path);
a training-data pipeline additionally needs the CURATED CORPUS exported
in the shape trainers ingest — sharded JSONL (one object per line, many
files, never one giant file).  This module is the write-side twin of
``kgx/sources/pages.py``'s JSONL ingest.

Scale shape: `Dataset.write_json` writes one file per block, so shard
count tracks the pipeline's own partitioning and every writer task is
independent (resumable, restartable, no driver bottleneck).  A
`_MANIFEST.json` records the input fingerprint, row/file counts and
config so a re-run with unchanged input SKIPS the write entirely — the
same resume contract the KG pipeline's stages use
(kgx/state/manifest.py).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

_MANIFEST = "_MANIFEST.json"


def write_jsonl_shards(ds, out_dir: str, *, input_fp: str,
                       config: dict | None = None) -> dict:
    """Write ``ds`` as sharded JSONL under ``out_dir`` with a resume
    manifest.

    If ``out_dir`` already holds a manifest whose input fingerprint and
    config match, the write is skipped and the stored manifest returned
    (idempotent re-runs — the caller fingerprints its INPUT, not the
    output).  Returns the manifest dict: {input_fp, config, n_rows,
    n_files, files}.
    """
    cfg = dict(config or {})
    mpath = os.path.join(out_dir, _MANIFEST)
    if os.path.exists(mpath):
        with open(mpath) as f:
            m = json.load(f)
        if m.get("input_fp") == input_fp and m.get("config") == cfg \
                and all(os.path.exists(os.path.join(out_dir, f))
                        for f in m.get("files", [])):
            # every listed shard is still on disk — safe to skip; a
            # partially deleted dir with an intact manifest falls
            # through to a full rewrite instead of returning stale
            # counts
            return m
    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(out_dir):               # stale partial output
        if (f.endswith(".json") or f.endswith(".jsonl")) \
                and not f.startswith("_"):
            os.unlink(os.path.join(out_dir, f))
    ds.write_json(out_dir)
    files = sorted(f for f in os.listdir(out_dir)
                   if f.endswith(".json") and not f.startswith("_"))
    n_rows = 0
    for f in files:
        with open(os.path.join(out_dir, f), "rb") as fh:
            n_rows += sum(1 for _ in fh)
    manifest = {"input_fp": input_fp, "config": cfg,
                "n_rows": n_rows, "n_files": len(files), "files": files}
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, mpath)                      # atomic publish
    return manifest


def export_curated_jsonl(sf_dir: str, out_dir: str, *,
                         seq_len: int = 512) -> dict:
    """End-to-end training-data export: the composed curation chain
    (lang gate -> quality gate -> scrub -> dedup -> pack,
    kgx/pipelines/curate.py) packed to ``seq_len`` token sequences and
    written as sharded JSONL with the resume manifest.

    Returns the manifest.  Re-running over the same input directory is
    a no-op (manifest fingerprint match)."""
    from kgx.pipelines.curate import curate_corpus
    from kgx.state.manifest import fingerprint_input

    fp = fingerprint_input(os.path.join(sf_dir, "documents.parquet"))
    packed = curate_corpus(sf_dir, seq_len=seq_len)   # chain ends packed
    return write_jsonl_shards(packed, out_dir, input_fp=fp,
                              config={"seq_len": seq_len, "v": 1})


def export_manifest_table(sf_dir: str, out_dir: str | None = None,
                          *, seq_len: int = 512) -> pa.Table:
    """One-row manifest report of :func:`export_curated_jsonl` — the
    driver-visible query surface for the export path (rows-only: a
    filesystem side effect has no SQL twin; row/file counts and the
    skip-on-rerun contract are pytest-gated)."""
    out_dir = out_dir or os.path.join(
        "/tmp", "kgx_export_" + os.path.basename(sf_dir.rstrip("/")))
    m = export_curated_jsonl(sf_dir, out_dir, seq_len=seq_len)
    return pa.table({
        "n_rows": pa.array([m["n_rows"]], pa.int64()),
        "n_files": pa.array([m["n_files"]], pa.int64()),
        "seq_len": pa.array([seq_len], pa.int64()),
    })
