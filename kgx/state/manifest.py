"""Checkpoint manifests + per-partition lineage (north_rule: a killed run
resumes from the last completed stage; every stage emits lineage records).

The reference checkpoints nothing — only a terminal JSON save
(/root/reference/main.py:105-118); a crash loses everything.  Here every
stage materializes sharded Parquet under ``{out_dir}/{stage}/`` and, on
success, writes ``{out_dir}/{stage}/_MANIFEST.json`` recording the input
fingerprint (sorted relpath+size of the input parquet files), a config
hash, row count, wall time and the completed output files.  On a re-run a
stage whose manifest matches fingerprint+config is skipped wholesale;
a stage interrupted mid-write has no manifest and is re-run idempotently
(output dir wiped first).  Partition(file)-level lineage records go to
``{out_dir}/lineage/{stage}.parquet``:
``(stage, partition, file, rows, bytes, wall_s)``.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import time

import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST_NAME = "_MANIFEST.json"


def _parquet_files(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    return sorted(glob.glob(os.path.join(path, "**", "*.parquet"),
                            recursive=True))


def fingerprint_input(path: str) -> str:
    """sha1 over sorted (relpath, size) of the input's parquet files."""
    h = hashlib.sha1()
    root = path if os.path.isdir(path) else os.path.dirname(path)
    for f in _parquet_files(path):
        rel = os.path.relpath(f, root)
        h.update(f"{rel}:{os.path.getsize(f)};".encode())
    return h.hexdigest()


def config_hash(cfg: dict) -> str:
    return hashlib.sha1(
        json.dumps(cfg, sort_keys=True, default=str).encode()).hexdigest()


def stage_dir(out_dir: str, stage: str) -> str:
    return os.path.join(out_dir, stage)


def stage_is_done(out_dir: str, stage: str, input_fp: str, cfg_hash: str) -> bool:
    mpath = os.path.join(stage_dir(out_dir, stage), MANIFEST_NAME)
    if not os.path.exists(mpath):
        return False
    try:
        with open(mpath) as f:
            m = json.load(f)
    except (OSError, json.JSONDecodeError):
        return False
    if m.get("input_fingerprint") != input_fp or m.get("config_hash") != cfg_hash:
        return False
    # every recorded output file must still exist with the recorded size
    sdir = stage_dir(out_dir, stage)
    for rec in m.get("files", []):
        fp = os.path.join(sdir, rec["file"])
        if not os.path.exists(fp) or os.path.getsize(fp) != rec["bytes"]:
            return False
    return True


def begin_stage(out_dir: str, stage: str) -> str:
    """Wipe any partial output of an incomplete stage; return its dir."""
    sdir = stage_dir(out_dir, stage)
    if os.path.exists(sdir):
        shutil.rmtree(sdir)
    os.makedirs(sdir, exist_ok=True)
    return sdir


def finish_stage(out_dir: str, stage: str, input_fp: str, cfg_hash: str,
                 wall_s: float, extra: dict | None = None) -> dict:
    """Write the stage manifest + per-partition lineage records."""
    sdir = stage_dir(out_dir, stage)
    files, lineage_rows = [], []
    total_rows = 0
    for i, f in enumerate(_parquet_files(sdir)):
        rel = os.path.relpath(f, sdir)
        nrows = pq.ParquetFile(f).metadata.num_rows
        nbytes = os.path.getsize(f)
        total_rows += nrows
        files.append({"file": rel, "rows": nrows, "bytes": nbytes})
        lineage_rows.append((stage, i, rel, nrows, nbytes, wall_s))
    manifest = {
        "stage": stage,
        "input_fingerprint": input_fp,
        "config_hash": cfg_hash,
        "rows_out": total_rows,
        "wall_s": round(wall_s, 3),
        "finished_at": time.time(),
        "files": files,
    }
    if extra:
        manifest.update(extra)
    with open(os.path.join(sdir, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)

    ldir = os.path.join(out_dir, "lineage")
    os.makedirs(ldir, exist_ok=True)
    tbl = pa.table({
        "stage": pa.array([r[0] for r in lineage_rows], pa.string()),
        "partition": pa.array([r[1] for r in lineage_rows], pa.int32()),
        "file": pa.array([r[2] for r in lineage_rows], pa.string()),
        "rows": pa.array([r[3] for r in lineage_rows], pa.int64()),
        "bytes": pa.array([r[4] for r in lineage_rows], pa.int64()),
        "wall_s": pa.array([r[5] for r in lineage_rows], pa.float64()),
    })
    pq.write_table(tbl, os.path.join(ldir, f"{stage}.parquet"))
    return manifest
