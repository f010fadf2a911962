"""L4 acceleration: BVH build (host / native C++) + stackless traversal."""

from raysnail_tpu.accel.bvh import BvhArrays, build_bvh

__all__ = ["BvhArrays", "build_bvh"]
