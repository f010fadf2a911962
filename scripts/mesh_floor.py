#!/usr/bin/env python
"""End-to-end attribution for the mesh+arealight bench config: time the
full frame (current best binning mode) against the SAME scene with the knot
removed (non-mesh floor: spheres + shading + regen bookkeeping). The gap is
the traversal kernel's true end-to-end share — the number the divergence
work is chasing. Usage: python scripts/mesh_floor.py [entry|entrydir|never]
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from raysnail_tpu import ir
from raysnail_tpu.camera import build_camera
from raysnail_tpu.config import RenderConfig
from raysnail_tpu.scene import SceneBuilder
from raysnail_tpu.scenes.meshes import torus_knot


def build(with_mesh: bool):
    b = SceneBuilder()
    if with_mesh:
        v, f, n = torus_knot(n_seg=200, n_ring=24)
        b.add(ir.Mesh(vertices=v, indices=f, normals=n,
                      material=ir.DiffuseMetal(400.0, ir.Constant((0.8, 0.6, 0.3)))))
    b.add(ir.Sphere((0, -1001.3, 0), 1000.0,
                    ir.Lambertian(ir.Constant((0.4, 0.4, 0.45)))))
    b.add(ir.Sphere((4, 6, 3), 1.5,
                    ir.DiffuseLight(ir.Constant((1.0, 0.95, 0.9)), 8.0)),
          light=True)
    b.set_background((0.05, 0.05, 0.08), (0.1, 0.12, 0.2))
    return b.compile()


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "entry"
    sys.path.insert(0, os.path.join(REPO))
    import bench

    cam = build_camera(look_from=(0, 1.5, 4), look_at=(0, 0, 0), fov=45,
                       width=320, height=200)
    cfg = RenderConfig(width=320, height=200, samples=16, max_depth=6,
                       mesh_bin=mode)
    for label, with_mesh in (("full", True), ("no-mesh floor", False)):
        mrays, comp, wall = bench._time_render(build(with_mesh), cam, cfg)
        print(f"{label:14s}: {mrays:7.3f} Mrays/s  steady={wall:5.2f}s "
              f"compile={comp:5.1f}s", flush=True)


if __name__ == "__main__":
    main()
