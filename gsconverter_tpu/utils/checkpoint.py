"""Checkpoint / resume for the canonical splat pytree.

The reference has no checkpointing (SURVEY.md §5) — its on-disk formats ARE
its only serialization.  For large-scene batch jobs we snapshot the
canonical cloud between filter stages so a preempted run resumes at the last
completed stage (deterministic restartable pipeline).

Format: a single .npz per snapshot plus a tiny JSON manifest recording the
stage name and static metadata.  Multi-host: each host writes its own shard
file (``shard{process_index}``); ``load`` reassembles.
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..cloud import SplatCloud

MANIFEST = "manifest.json"


def save(cloud: SplatCloud, directory: str, stage: str) -> str:
    """Snapshot the cloud after ``stage``; returns the snapshot dir."""
    import jax

    snap = os.path.join(directory, stage)
    os.makedirs(snap, exist_ok=True)
    c = cloud.to_numpy()
    arrays = dict(
        pos=c.pos, sh_dc=c.sh_dc, sh_rest=c.sh_rest, opacity=c.opacity,
        log_scale=c.log_scale, quat=c.quat, normal=c.normal,
    )
    if c.rgb is not None:
        arrays["rgb"] = c.rgb
    for k, v in c.extras.items():
        arrays[f"extra__{k}"] = v
    shard = jax.process_index() if jax.process_count() > 1 else 0
    np.savez_compressed(os.path.join(snap, f"shard{shard}.npz"), **arrays)
    if shard == 0:
        with open(os.path.join(snap, MANIFEST), "w") as f:
            json.dump(
                dict(stage=stage, n=cloud.n,
                     active_sh_degree=cloud.active_sh_degree,
                     shards=max(1, jax.process_count())),
                f,
            )
    return snap


def load(directory: str, stage: str) -> SplatCloud:
    snap = os.path.join(directory, stage)
    with open(os.path.join(snap, MANIFEST)) as f:
        manifest = json.load(f)
    parts = []
    for s in range(manifest["shards"]):
        with np.load(os.path.join(snap, f"shard{s}.npz")) as z:
            parts.append({k: z[k] for k in z.files})
    merged = {
        k: np.concatenate([p[k] for p in parts]) for k in parts[0]
    }
    extras = {
        k[len("extra__"):]: v
        for k, v in merged.items() if k.startswith("extra__")
    }
    # host-resident leaves: the pipeline uploads per-op (utils/transfer.py)
    return SplatCloud(
        pos=merged["pos"],
        sh_dc=merged["sh_dc"],
        sh_rest=merged["sh_rest"],
        opacity=merged["opacity"],
        log_scale=merged["log_scale"],
        quat=merged["quat"],
        normal=merged["normal"],
        rgb=merged.get("rgb"),
        extras=extras,
        active_sh_degree=manifest["active_sh_degree"],
    )


def latest_stage(directory: str, stages: list[str]) -> str | None:
    """Last stage (in pipeline order) with a complete snapshot."""
    done = None
    for s in stages:
        if os.path.exists(os.path.join(directory, s, MANIFEST)):
            done = s
    return done
