"""The wavefront path-tracing integrator.

Replicates the reference's recursive `ray_color` (src/camera.rs:156-255) as an
iterative bounce loop (lax.scan over the depth budget) over a dense ray batch
with masked lanes instead of recursion — rays that die keep flowing with
alive=False (static shapes; divergence costs masked VPU work, not control
flow).

Estimator (compat path, the default — camera.rs:194-247):
  * emitted term added every bounce (before scattering);
  * skip_pdf materials (metal, dielectric): follow the specular ray,
    throughput *= albedo;
  * otherwise a 50/50 branch:
      - light branch: direction toward a random light, denominator pdf
        HARDCODED to 1/pi (camera.rs:199), shadow origin backed off along the
        incoming ray by shadow_eps (camera.rs:208-212), optional phong
        highlight multiplier (camera.rs:199-206);
      - BSDF branch: sample the material's pdf; numerator == denominator so
        the weight is exactly 1 (camera.rs:216-218, 240-242);
    weight = pdf.value(dir) / pdf_val with the reference's <=0/NaN clamp of
    the denominator to 1e-5 (camera.rs:236-238).
  * miss -> background gradient, ray dies (camera.rs:254).

A physically-correct one-sample MIS estimator is available behind
cfg.proper_mis (weights 0.5*(p_light + p_bsdf) in the denominator with the
true light solid-angle pdf) — OFF by default for reference parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from raysnail_tpu import lights as lightslib
from raysnail_tpu import materials as matlib
from raysnail_tpu import scene as scenelib
from raysnail_tpu import textures as texlib
from raysnail_tpu.camera import Ray
from raysnail_tpu.config import RenderConfig
from raysnail_tpu.prelude import rng as prng
from raysnail_tpu.prelude.sampling import PI
from raysnail_tpu.prelude.vec import Vec3

# Measured crossover for routing static sphere groups through the pallas
# traversal kernel instead of the dense sweep (scripts/ab_spherebvh_scale.py
# + ab_spherebvh.py, 1x v5e, 400x225 frames):
#   478 spheres (rtow_13_1, depth 8): dense 8.86 vs kernel 1.81  -> dense 4.9x
#   8192 jittered-grid (depth 4):     dense 1.26 vs kernel 1.55  -> kernel 1.2x
#   32768:                            dense 0.41 vs kernel 1.27  -> kernel 3.1x
# "force" ignores this (tests).
SPHERE_BVH_AUTO_MIN = 4096

def _slot_layout(kinds: frozenset, has_lights: bool):
    """Per-bounce uniform slots, allocated only for the material/light kinds
    the scene actually contains — RNG is a first-order cost, so a pure
    Lambertian scene draws 6 uniforms per bounce instead of 17."""
    idx = {}
    n = 0
    if matlib.MIXED in kinds:
        idx["mix"] = n; n += 1
    if has_lights:
        idx["branch"], idx["pick"], idx["l1"], idx["l2"] = n, n + 1, n + 2, n + 3
        n += 4
    if matlib.DIELECTRIC in kinds:
        idx["refl"] = n; n += 1
    idx["bsdf"] = n
    n += 2  # base cosine / sphere sample
    if (matlib.DIFFUSE_METAL in kinds) or (matlib.BLINN_PHONG in kinds):
        n += 2 * matlib.REJECT_TRIES
    if matlib.BLINN_PHONG in kinds:
        n += 1
    return idx, n


def radiance(scene: scenelib.Scene, arrays: scenelib.SceneArrays,
             cfg: RenderConfig, ray: Ray, keys) -> Vec3:
    """Per-ray radiance estimate after up to cfg.max_depth bounces.
    `keys` is the per-ray key batch (N, ...): every draw folds in the bounce
    index and a purpose tag, so the estimate for a given (pixel, sample) is
    independent of batch tiling and mesh sharding."""
    shape = jnp.shape(ray.direction.x)
    static = scene.static
    kinds = static.mat_kinds
    slot, n_uniforms = _slot_layout(kinds, static.has_lights)

    # pallas policy: the v4 traversal kernel (ops/bvh_pallas.py) carries both
    # the mesh path and large static sphere groups on accelerators; the old
    # dense-sweep sphere kernel (ops/sphere_pallas.py) stays behind "force"
    # for tests. CPU runs everything through fused XLA (pallas only under
    # interpret, for tests).
    on_cpu = jax.default_backend() == "cpu"
    use_pallas = cfg.use_pallas == "force"
    pallas_interpret = use_pallas and on_cpu
    mesh_pallas = cfg.mesh_pallas == "force" or (
        cfg.mesh_pallas == "auto" and not on_cpu
    )
    mesh_interpret = mesh_pallas and on_cpu
    # sphere_bvh "auto" gate is COUNT-aware: at 478 spheres (rtow_13_1,
    # 400x225@16spp depth 8, v5e) the traversal kernel measured 1.81 Mrays/s
    # vs 8.86 for the dense (rays x spheres) sweep — the pairwise sweep is
    # embarrassingly vectorizable and wins until the O(S) work dwarfs the
    # kernel's scalar walk overhead (see scripts/ab_spherebvh_scale.py).
    n_spheres = (
        int(arrays.spheres.radius.shape[0]) if arrays.spheres is not None else 0
    )
    sphere_bvh = cfg.sphere_bvh == "force" or (
        cfg.sphere_bvh == "auto" and not on_cpu
        and n_spheres >= SPHERE_BVH_AUTO_MIN
    )
    sphere_bvh_interpret = sphere_bvh and on_cpu

    def bounce(carry, b):
        if cfg.wavefront_sort:
            # wavefront compaction: stable-partition live lanes to the front
            # so traversal packets (128 consecutive lanes) are dense in live
            # rays. Costs one argsort + ~16 gathers per bounce — kept behind
            # a flag so the tradeoff is measurable per scene (bench --all
            # reports book2 both ways).
            o, d, time, T, L, alive, kv, rid = carry
            order = jnp.argsort(~alive, stable=True)
            take = lambda a: jnp.take(a, order, axis=0)
            o, d, T, L = (v.map(take) for v in (o, d, T, L))
            time, alive, kv, rid = (take(a) for a in (time, alive, kv, rid))
        else:
            o, d, time, T, L, alive = carry
            kv = keys
        r = Ray(origin=o, direction=d, time=time)
        kb = prng.fold_all(kv, b)

        hit = scenelib.intersect(scene, arrays, r, cfg.t_min, cfg.t_max, kb,
                                 use_pallas=use_pallas,
                                 pallas_interpret=pallas_interpret,
                                 mesh_pallas=mesh_pallas,
                                 mesh_interpret=mesh_interpret,
                                 mesh_sort=cfg.mesh_sort,
                                 sphere_bvh=sphere_bvh,
                                 sphere_bvh_interpret=sphere_bvh_interpret,
                                 active=alive)

        # miss -> background, die (camera.rs:254)
        bg = arrays.background.color(d)
        missed = alive & (~hit.valid)
        L = L + Vec3.where(missed, T * bg, Vec3.zeros(shape, T.dtype))

        u = prng.ray_uniforms(prng.fold_all(kb, prng.SCATTER), n_uniforms)

        if matlib.MIXED in kinds:
            mat_id = matlib.resolve(arrays.materials, hit.mat_id, u[slot["mix"]])
        else:
            mat_id = jnp.where(hit.mat_id < 0, 0, hit.mat_id)
        rows = matlib.gather(arrays.materials, mat_id)
        p = o + d * hit.t
        tex_color = texlib.evaluate(
            arrays.textures, rows.tex_id, hit.u, hit.v, p, static.tex_modes
        )

        active = alive & hit.valid
        emit = matlib.emitted(rows, tex_color)
        L = L + Vec3.where(active, T * emit, Vec3.zeros(shape, T.dtype))

        if static.has_absorb:
            # EXTENSION (off unless a Dielectric sets `absorption`): the
            # segment that just ended INSIDE a dielectric (back-face hit,
            # outside=False) attenuates by Beer-Lambert exp(-sigma * t)
            sigma = matlib.gather_absorb(arrays.materials, mat_id)
            interior = active & (~hit.outside) & (rows.mtype == matlib.DIELECTRIC)
            att = (sigma * (-hit.t)).map(jnp.exp)
            T = Vec3.where(interior, T * att, T)

        # -- specular (skip_pdf) path ------------------------------------
        skip = matlib.is_skip_pdf(rows)
        u_refl = u[slot["refl"]] if "refl" in slot else hit.t  # unused if absent
        spec_dir, absorbed = matlib.specular_dir(
            rows, d, hit.normal, hit.outside, u_refl, kinds
        )

        # -- pdf path ------------------------------------------------------
        bsdf_dir = matlib.bsdf_sample(rows, d, hit.normal, u[slot["bsdf"]:], kinds)
        if static.has_lights:
            sampler = lightslib.sample_proper if cfg.proper_mis else lightslib.sample
            light_raw = sampler(
                arrays.lights, p, u[slot["pick"]], u[slot["l1"]], u[slot["l2"]],
                static.light_kinds
            )
            light_dir = light_raw.unit()
            use_light = u[slot["branch"]] < cfg.light_sample_prob
            light_multi = matlib.phong_highlight(light_dir, d, hit.normal, rows)
        else:
            light_dir = bsdf_dir
            use_light = jnp.zeros(shape, bool)
            light_multi = jnp.ones(shape, T.dtype)

        pdf_dir = Vec3.where(use_light, light_dir, bsdf_dir)
        val = matlib.bsdf_pdf_value(rows, d, hit.normal, pdf_dir, kinds,
                                    proper=cfg.proper_mis)

        if cfg.proper_mis and static.has_lights:
            # one-sample MIS: denominator = the true mixture density of the
            # combined sampler, with the real solid-angle light pdf
            p_light = lightslib.pdf_value(arrays.lights, p, pdf_dir, static.light_kinds)
            denom = (
                cfg.light_sample_prob * p_light
                + (1.0 - cfg.light_sample_prob) * val
            )
        else:
            # compat: light branch denominator hardcoded to 1/pi
            denom = jnp.where(use_light, 1.0 / PI, val)
        denom = jnp.where((denom <= 0.0) | jnp.isnan(denom), 1e-5, denom)
        weight = val / denom
        multi = jnp.where(use_light, light_multi, 1.0)

        # shadow back-off start for the light branch (camera.rs:208-212)
        pdf_origin = Vec3.where(use_light, o + d * (hit.t - cfg.shadow_eps), p)

        new_d = Vec3.where(skip, spec_dir, pdf_dir)
        new_o = Vec3.where(skip, p, pdf_origin)
        t_mult = jnp.where(skip, 1.0, weight * multi)
        T = Vec3.where(active, T * tex_color * t_mult, T)

        scatters = rows.mtype != matlib.DIFFUSE_LIGHT
        alive = active & scatters & ~(skip & absorbed)

        o = Vec3.where(alive, new_o, o)
        d = Vec3.where(alive, new_d, d)
        if cfg.wavefront_sort:
            return (o, d, time, T, L, alive, kv, rid), None
        return (o, d, time, T, L, alive), None

    init = (
        ray.origin, ray.direction, ray.time,
        Vec3.ones(shape, ray.direction.x.dtype),
        Vec3.zeros(shape, ray.direction.x.dtype),
        jnp.ones(shape, bool),
    )
    if cfg.wavefront_sort:
        init = init + (keys, jnp.arange(shape[0], dtype=jnp.int32))
    body = bounce
    if cfg.remat_bounces:
        # reverse-mode stores only the per-bounce carries (o,d,T,L,alive ~13
        # floats/ray) and recomputes the bounce body — an order of magnitude
        # less residual memory, which is what bounds fwd+bwd batch sizes
        body = jax.checkpoint(bounce)
    out_carry, _ = jax.lax.scan(body, init, jnp.arange(cfg.max_depth))
    L = out_carry[4]
    if cfg.wavefront_sort:
        # scatter the accumulated radiance back into original ray order
        rid = out_carry[7]
        L = Vec3(
            jnp.zeros(shape, L.x.dtype).at[rid].set(L.x),
            jnp.zeros(shape, L.y.dtype).at[rid].set(L.y),
            jnp.zeros(shape, L.z.dtype).at[rid].set(L.z),
        )
    # rays still alive after the budget contribute nothing (camera.rs:161-163)
    return L
