from khronos_tpu.geometry.camera import Camera, bilinear_sample, nearest_sample
from khronos_tpu.geometry import bbox, transforms

__all__ = ["Camera", "bilinear_sample", "nearest_sample", "bbox", "transforms"]
