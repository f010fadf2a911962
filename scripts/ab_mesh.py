"""A/B: mesh intersect paths on the real device (brute XLA vs pallas packet).

Usage: python scripts/ab_mesh.py [n_seg n_ring] (default 200 24 = 9600 tris)
"""
import os
import sys
import time

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from raysnail_tpu import ir
from raysnail_tpu.camera import build_camera
from raysnail_tpu.config import RenderConfig
from raysnail_tpu.prelude import rng as prng
from raysnail_tpu.render import _full_grid, make_sample_step
from raysnail_tpu.scene import SceneBuilder
from raysnail_tpu.scenes.meshes import torus_knot

n_seg = int(sys.argv[1]) if len(sys.argv) > 1 else 200
n_ring = int(sys.argv[2]) if len(sys.argv) > 2 else 24

v, f, n = torus_knot(n_seg=n_seg, n_ring=n_ring)
print(f"tris={len(f)}", file=sys.stderr)
b = SceneBuilder()
b.add(ir.Mesh(vertices=v, indices=f, normals=n,
              material=ir.DiffuseMetal(400.0, ir.Constant((0.8, 0.6, 0.3)))))
b.add(ir.Sphere((0, -1001.3, 0), 1000.0, ir.Lambertian(ir.Constant((0.4, 0.4, 0.45)))))
b.add(ir.Sphere((4, 6, 3), 1.5, ir.DiffuseLight(ir.Constant((1.0, 0.95, 0.9)), 8.0)),
      light=True)
b.set_background((0.05, 0.05, 0.08), (0.1, 0.12, 0.2))
scene = b.compile()

spp_req = int(os.environ.get("AB_SPP", "16"))
base = RenderConfig(width=320, height=200, samples=spp_req, max_depth=6)
cam = build_camera(look_from=(0, 1.5, 4), look_at=(0, 0, 0), fov=45,
                   width=base.width, height=base.height)

px, py = _full_grid(base)
px = jnp.asarray(px, base.dtype)
py = jnp.asarray(py, base.dtype)
key = prng.key(7)
spp = base.effective_samples


def run(name, cfg, reps=int(os.environ.get("AB_REPS", "3"))):
    step = make_sample_step(scene, cfg)
    t0 = time.time()
    out = step(scene.arrays, cam, key, jnp.arange(1, dtype=jnp.int32), px, py)
    float(out.x.sum())
    compile_s = time.time() - t0
    # steady state: interleave reps of full spp chains
    t0 = time.time()
    accum = None
    for r in range(reps):
        for start in range(spp):
            ids = jnp.arange(start, start + 1, dtype=jnp.int32)
            s = step(scene.arrays, cam, key, ids, px, py)
            accum = s if accum is None else accum + s
    float(accum.x.sum())
    dt = time.time() - t0
    mrays = base.width * base.height * spp * reps / dt / 1e6
    print(f"{name}: {mrays:.3f} Mrays/s primary (compile {compile_s:.1f}s, steady {dt:.2f}s)")
    import numpy as np
    img = np.stack([np.asarray(accum.x), np.asarray(accum.y), np.asarray(accum.z)])
    return mrays, img


if __name__ == "__main__":
    import numpy as np

    which = os.environ.get("AB_WHICH", "both")
    a = c = None
    if which in ("both", "pallas"):
        a, img_a = run("pallas-packet", base.replace(mesh_pallas="force", mesh_sort=False))
    if which in ("both", "sort"):
        run("pallas+sort  ", base.replace(mesh_pallas="force", mesh_sort=True))
    if which in ("both", "brute"):
        c, img_c = run("brute-xla    ", base.replace(mesh_pallas="never"))
    if a and c:
        print(f"speedup pallas/brute: {a / c:.2f}x")
        d = np.abs(img_a - img_c)
        print(f"image agreement: mean|diff|={d.mean():.2e} max={d.max():.2e} "
              f"(scale mean={np.abs(img_c).mean():.3f})")
