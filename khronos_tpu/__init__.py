"""khronos_tpu — a TPU-native spatio-temporal metric-semantic SLAM engine.

A from-scratch JAX/XLA/Pallas design with the capabilities of MIT-SPARK/Khronos
(RSS 2024): online TSDF + semantic fusion, free-space motion detection, object
detection/tracking in a temporal active window, per-object reconstruction, a
pose-graph/deformation-graph backend with robust optimization, ray-based
long-term change detection, reconciliation, and a queryable 4D map.

Layer map (mirrors SURVEY.md §1, re-designed TPU-first):
  data/            L0  dataset adapters + synthetic sensor
  active_window/   L1  per-frame hot path (one jitted program per frame)
  backend/         L3  factor-graph optimization, deformation, merges
  changes/         L3' ray-based change detection + reconciliation
  stm/             L4  scene-graph model + 4D spatio-temporal map
  eval/            L5  offline evaluation suite
  map/, ops/, geometry/, parallel/, config/, utils/ are shared infrastructure.
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: the voxel-grid programs take minutes to
# compile in this environment; cache hits make every later process start fast.
import os as _os

import jax as _jax

_cache_dir = _os.environ.get(
    "JAX_COMPILATION_CACHE_DIR", _os.path.expanduser("~/.cache/jax_comp")
)
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
