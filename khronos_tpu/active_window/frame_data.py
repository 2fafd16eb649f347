"""FrameData: one sensor frame plus derived detection images, and a ring buffer.

Equivalent of the reference's khronos::FrameData (khronos/include/khronos/
active_window/data/frame_data.h:59-83: InputData + dynamic_image/object_image
int id maps with 0 = static/background) and FrameDataBuffer
(frame_data_buffer.cpp:57-109: keeps recent frames alive for object
extraction, trims frames no track references).

TPU design: images are JAX arrays kept on device; the buffer is a host-side
list of frames with python bookkeeping (which tracks reference which frames),
mirroring the reference's host-side buffer. Stamps: int64 ns for bookkeeping,
float32 seconds (relative to sequence start) on device.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from khronos_tpu.config import check_ge, check_gt


@dataclasses.dataclass
class FrameData:
    """One input frame with pose and derived images.

    depth:   [H, W] float32 z-depth (m); <=0 marks invalid pixels.
    color:   [H, W, 3] float32 in [0, 1].
    labels:  [H, W] int32 semantic class id (-1 = unknown).
    instances: optional [H, W] int32 externally-provided instance ids (0 = none).
    R_w_c / t_w_c: camera-to-world pose.
    dynamic_image: [H, W] int32 motion-cluster id, 0 = static (filled by the
        motion detector).
    object_image: [H, W] int32 semantic-cluster id, 0 = background (filled by
        the object detector).
    """

    stamp_ns: int
    depth: jnp.ndarray
    color: jnp.ndarray
    labels: jnp.ndarray
    R_w_c: np.ndarray
    t_w_c: np.ndarray
    instances: Optional[jnp.ndarray] = None
    label_features: Optional[np.ndarray] = None  # [num_instances, D] open-set
    dynamic_image: Optional[jnp.ndarray] = None
    object_image: Optional[jnp.ndarray] = None
    dynamic_clusters: list = dataclasses.field(default_factory=list)
    semantic_clusters: list = dataclasses.field(default_factory=list)

    def __post_init__(self):
        # Poses are HOST data (9+3 floats, consumed by host bookkeeping every
        # frame). A device-array pose would force a per-frame device->host
        # pull, and on this runtime ANY pull serializes behind the whole
        # device queue (measured: 0.2 ms idle vs 270 ms with a backlog) —
        # so coerce to numpy exactly once, at construction.
        self.R_w_c = np.asarray(self.R_w_c, np.float32)
        self.t_w_c = np.asarray(self.t_w_c, np.float32)

    @property
    def stamp_s(self) -> float:
        return self.stamp_ns * 1e-9


@dataclasses.dataclass
class FrameDataBufferConfig:
    max_buffer_size: int = 300
    store_every_n_frames: int = 1

    def check(self):
        check_gt(self.max_buffer_size, 0, "max_buffer_size")
        check_ge(self.store_every_n_frames, 1, "store_every_n_frames")


class FrameDataBuffer:
    """Bounded frame retention for object extraction (host-side)."""

    def __init__(self, config: FrameDataBufferConfig):
        self.config = config
        self._frames: Dict[int, FrameData] = {}  # stamp_ns -> frame
        self._counter = 0

    def store(self, frame: FrameData) -> bool:
        self._counter += 1
        if (self._counter - 1) % self.config.store_every_n_frames != 0:
            return False
        self._frames[frame.stamp_ns] = frame
        return True

    def trim(self, referenced_stamps: set) -> int:
        """Drop frames not referenced by any active track; enforce max size.

        Mirrors FrameDataBuffer::trimBuffer: oldest unreferenced frames go
        first; if still over capacity, oldest referenced frames are dropped too.
        Returns number of frames removed.
        """
        removed = 0
        stamps = sorted(self._frames)
        for s in stamps:
            if s not in referenced_stamps:
                del self._frames[s]
                removed += 1
        stamps = sorted(self._frames)
        while len(stamps) > self.config.max_buffer_size:
            del self._frames[stamps.pop(0)]
            removed += 1
        return removed

    def get(self, stamp_ns: int) -> Optional[FrameData]:
        return self._frames.get(stamp_ns)

    def frames_in(self, stamps) -> List[FrameData]:
        return [self._frames[s] for s in stamps if s in self._frames]

    def __len__(self):
        return len(self._frames)

    def stamps(self) -> List[int]:
        return sorted(self._frames)
