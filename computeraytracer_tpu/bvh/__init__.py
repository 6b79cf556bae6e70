from computeraytracer_tpu.bvh.builder import BVHArrays, build_bvh, scene_bvh
from computeraytracer_tpu.bvh.traverse import intersect_bvh

__all__ = ["BVHArrays", "build_bvh", "scene_bvh", "intersect_bvh"]
