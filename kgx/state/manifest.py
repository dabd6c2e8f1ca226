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


def run_partitioned_stage(out_dir: str, stage: str, input_files: list[str],
                          cfg_hash: str, build_group, resume: bool,
                          n_groups: int) -> bool:
    """Partition-level resumable stage (north_rule: a killed run resumes
    from the last completed block, finer than whole stages).

    ``input_files`` are split into ``n_groups`` contiguous groups; each
    group builds independently into ``{stage}/g{gi:04d}/`` via
    ``build_group(gdir, gfiles)`` and gets its own ``_MANIFEST.json``
    (input fingerprint + config hash).  On re-run, groups whose manifest
    matches are SKIPPED — their output files are not rewritten — and only
    unfinished/stale groups rebuild.  The stage-level manifest is written
    once every group is done, so downstream stages see the usual
    all-or-nothing contract.  Returns True if any group (re)built.
    """
    sdir = stage_dir(out_dir, stage)
    fp_all = fingerprint_input_files(input_files)
    if resume and stage_is_done(out_dir, stage, fp_all, cfg_hash):
        return False
    os.makedirs(sdir, exist_ok=True)
    # drop the stale stage-level manifest (it will be rewritten) and any
    # entries that are not group dirs of the current layout
    n_groups = max(1, min(n_groups, len(input_files)))
    expected = {f"g{gi:04d}" for gi in range(n_groups)}
    for entry in os.listdir(sdir):
        if entry not in expected:
            path = os.path.join(sdir, entry)
            shutil.rmtree(path) if os.path.isdir(path) else os.remove(path)

    # balanced contiguous split: ceil-division would hand the last
    # group(s) ZERO files whenever n_groups doesn't divide the count
    # (12 files / 8 groups -> two empty groups -> read_parquet([]))
    bounds = [round(i * len(input_files) / n_groups)
              for i in range(n_groups + 1)]
    built = False
    t0 = time.perf_counter()
    for gi in range(n_groups):
        gfiles = input_files[bounds[gi]:bounds[gi + 1]]
        if not gfiles:          # empty input: nothing to build
            continue
        gname = f"g{gi:04d}"
        gdir = os.path.join(sdir, gname)
        gfp = fingerprint_input_files(gfiles)
        if resume and stage_is_done(sdir, gname, gfp, cfg_hash):
            continue
        if os.path.exists(gdir):
            shutil.rmtree(gdir)
        os.makedirs(gdir)
        gt0 = time.perf_counter()
        build_group(gdir, gfiles)
        finish_stage(sdir, gname, gfp, cfg_hash,
                     time.perf_counter() - gt0, lineage=False)
        built = True
    finish_stage(out_dir, stage, fp_all, cfg_hash, time.perf_counter() - t0,
                 extra={"n_groups": n_groups})
    return built


def fingerprint_input_files(files: list[str]) -> str:
    """sha1 over (basename, size) of an explicit file list."""
    h = hashlib.sha1()
    for f in sorted(files):
        h.update(f"{os.path.basename(f)}:{os.path.getsize(f)};".encode())
    return h.hexdigest()


def begin_stage(out_dir: str, stage: str) -> str:
    """Wipe any partial output of an incomplete stage; return its dir."""
    sdir = stage_dir(out_dir, stage)
    if os.path.exists(sdir):
        shutil.rmtree(sdir)
    os.makedirs(sdir, exist_ok=True)
    return sdir


def finish_stage(out_dir: str, stage: str, input_fp: str, cfg_hash: str,
                 wall_s: float, extra: dict | None = None,
                 lineage: bool = True) -> dict:
    """Write the stage manifest + per-partition lineage records.

    ``lineage=False`` for group-level manifests inside a partitioned
    stage — lineage parquet must never land inside a stage's DATA
    directory, where downstream readers would pick it up as data."""
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

    if not lineage:
        return manifest
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
