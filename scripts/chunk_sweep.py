import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from raysnail_tpu.config import RenderConfig
from raysnail_tpu.prelude import rng as prng
from raysnail_tpu.render import _full_grid, make_sample_step
from raysnail_tpu.sdl import build_scene

cfg = RenderConfig(width=800, height=500, samples=65, max_depth=8)
scene, camera = build_scene("/root/repo/sdl/example.sdl", cfg)
step = make_sample_step(scene, cfg)
px, py = _full_grid(cfg)
px = jnp.asarray(px, cfg.dtype); py = jnp.asarray(py, cfg.dtype)
key = prng.key(7)
spp = cfg.effective_samples

for k in (1, 2, 4, 8):
    ids0 = jnp.arange(0, k, dtype=jnp.int32)
    t0 = time.time()
    out = step(scene.arrays, camera, key, ids0, px, py)
    float(out.x.sum())
    print(f"k={k} compile+first {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    accum = None
    for s in range(0, spp - (spp % k) , k):
        o = step(scene.arrays, camera, key, jnp.arange(s, s+k, dtype=jnp.int32), px, py)
        accum = o if accum is None else accum + o
    float(accum.x.sum())
    dt = time.time()-t0
    n = cfg.width*cfg.height*(spp - (spp % k))
    print(f"k={k}: {n/dt/1e6:.2f} Mrays/s ({dt:.2f}s)", flush=True)
