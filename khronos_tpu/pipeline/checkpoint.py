"""Live checkpoint / resume of a running pipeline.

The reference has **no** crash recovery — "a crash loses in-memory state"
(SURVEY.md §5; only periodic map *output* snapshots exist,
experiment_manager.cpp:228-242). This module goes beyond parity: the FULL
mutable pipeline state — voxel volume (device arrays), tracks, frame buffer,
factor/deformation graph, accumulated mesh, change evidence, 4D map
snapshots — is serialized so a run can resume mid-sequence and produce the
same outputs as an uninterrupted run (tested in tests/test_checkpoint.py).

Format: a single gzip pickle (version-tagged) with jax.Array leaves converted
to numpy on save; restore re-uploads lazily on first device use. Compiled
programs are never serialized — components rebuild them via __setstate__
(ActiveWindow._build_fused_step) or module-level jit caches.
"""

from __future__ import annotations

import gzip
import os
import pickle

import numpy as np

CHECKPOINT_VERSION = 1
_FILE = "pipeline.ckpt"


class _HostPickler(pickle.Pickler):
    """Pickler that spills jax.Array leaves to numpy wherever they appear,
    so restore never requires the same device layout."""

    def reducer_override(self, obj):
        import jax

        if isinstance(obj, jax.Array):
            return (np.asarray, (np.asarray(obj),))
        return NotImplemented


def save(pipeline, directory: str) -> str:
    """Write a resumable checkpoint of the full pipeline state."""
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, _FILE)
    payload = {
        "version": CHECKPOINT_VERSION,
        "pipeline": pipeline,
    }
    tmp = path + ".tmp"
    with gzip.open(tmp, "wb", compresslevel=1) as fh:
        _HostPickler(fh, protocol=pickle.HIGHEST_PROTOCOL).dump(payload)
    os.replace(tmp, path)  # atomic: a crash mid-write never corrupts the last good ckpt
    return path


def load(directory: str):
    """Restore a pipeline checkpoint written by save()."""
    path = os.path.join(directory, _FILE)
    with gzip.open(path, "rb") as fh:
        payload = pickle.load(fh)
    if payload.get("version") != CHECKPOINT_VERSION:
        raise ValueError(
            f"checkpoint version {payload.get('version')} != {CHECKPOINT_VERSION}"
        )
    return payload["pipeline"]


def exists(directory: str) -> bool:
    return os.path.exists(os.path.join(directory, _FILE))
