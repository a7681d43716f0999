"""Per-stage checkpointing, lineage manifests and resume.

The reference's durability story is append-only files + consumed
offsets (reference src/index/terms.c:320-344): a crashed writer loses
only its in-flight doc.  The batch-pipeline analogue (north rule:
"checkpoint-resumable stage boundaries with per-partition lineage"):

  * every stage can materialize to ``{out_dir}/{stage}/`` as a
    directory of Parquet part files,
  * a ``manifest.json`` is written LAST (atomic rename) recording the
    config hash, row count, per-file lineage (path, rows, bytes) and
    wall time — its presence is the ``_SUCCESS`` marker,
  * on re-run, a stage whose manifest exists *and* matches the current
    config hash is loaded with ``read_parquet`` instead of recomputed;
    everything downstream re-derives from it.

Stage output directories are independent, so a run that died between
stage k and k+1 resumes at k+1 — the batch equivalent of replaying
from a consumed offset.
"""

from __future__ import annotations

import json
import os
import time

from nxsearch_ray.config import PipelineConfig

MANIFEST = "manifest.json"


def stage_dir(out_dir: str, stage: str) -> str:
    return os.path.join(out_dir, stage)


def manifest_path(out_dir: str, stage: str) -> str:
    return os.path.join(stage_dir(out_dir, stage), MANIFEST)


def is_complete(out_dir: str, stage: str, cfg: PipelineConfig) -> bool:
    path = manifest_path(out_dir, stage)
    if not os.path.exists(path):
        return False
    try:
        with open(path) as f:
            m = json.load(f)
    except (OSError, json.JSONDecodeError):
        return False
    return m.get("config_hash") == cfg.config_hash()


def load_stage(out_dir: str, stage: str):
    import ray.data

    from nxsearch_ray.sources.io import read_parquet_clean

    return read_parquet_clean(stage_dir(out_dir, stage),
                                 file_extensions=["parquet"])


def write_stage(ds, out_dir: str, stage: str, cfg: PipelineConfig,
                extra: dict | None = None):
    """Materialize a Dataset to the stage directory + manifest; returns
    a Dataset re-read from the checkpoint (so downstream consumers pull
    from disk, not from a re-executed lineage)."""
    sdir = stage_dir(out_dir, stage)
    t0 = time.monotonic()
    # Clear any previous attempt first: a crash mid-write or a config
    # change leaves stale part files (and possibly a stale manifest)
    # that load_stage would otherwise mix with this run's output.  The
    # manifest is written LAST, so after this rmtree the stage is
    # unambiguously "incomplete" until the new manifest lands.
    if os.path.isdir(sdir):
        import shutil

        shutil.rmtree(sdir)
    os.makedirs(sdir, exist_ok=True)
    ds.write_parquet(sdir)
    wall = time.monotonic() - t0

    files = []
    rows = 0
    for name in sorted(os.listdir(sdir)):
        if not name.endswith(".parquet"):
            continue
        import pyarrow.parquet as pq

        fpath = os.path.join(sdir, name)
        md = pq.ParquetFile(fpath).metadata
        files.append({"file": name, "rows": md.num_rows,
                      "bytes": os.path.getsize(fpath)})
        rows += md.num_rows

    manifest = {
        "stage": stage,
        "config_hash": cfg.config_hash(),
        "rows": rows,
        "wall_s": round(wall, 3),
        "partitions": files,
        **(extra or {}),
    }
    tmp = manifest_path(out_dir, stage) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, manifest_path(out_dir, stage))
    return load_stage(out_dir, stage)


def checkpoint(ds_factory, out_dir: str | None, stage: str,
               cfg: PipelineConfig, extra: dict | None = None):
    """Resume-or-compute: returns (dataset, skipped: bool).

    ``ds_factory`` is only called when the checkpoint is absent/stale;
    with ``out_dir=None`` checkpointing is disabled (pure streaming)."""
    if out_dir is None:
        return ds_factory(), False
    if is_complete(out_dir, stage, cfg):
        return load_stage(out_dir, stage), True
    return write_stage(ds_factory(), out_dir, stage, cfg, extra), False
