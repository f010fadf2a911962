"""L3 geometry: batched SoA primitive intersectors (reference: src/hittable/).

Instead of the reference's `Arc<dyn Hittable>` polymorphism, every primitive
type is a struct-of-arrays group; intersection is a dense batched test of the
whole ray batch against the whole group with a min-t reduction, and the scene
intersector combines the per-group winners (see raysnail_tpu/scene.py).
"""

from raysnail_tpu.geometry.hit import Hit, BIG, combine_hits, miss

__all__ = ["Hit", "BIG", "combine_hits", "miss"]
