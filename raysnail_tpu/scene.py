"""Scene compilation: host IR -> flat SoA device arrays + static closures.

This replaces the reference's `World { bvh, lights, background, default }`
(src/hittable/collection/world.rs) and its BVH-of-trait-objects with:

  * SceneArrays — a jit-friendly pytree of primitive groups + the material /
    texture / light tables (the differentiable leaves live here);
  * static closures — CSG trees, media, and structure flags that are baked
    into the traced program (scene structure changes retrace; parameter
    changes don't);
  * intersect() — the dense dispatcher that combines per-group winners.

The transform lowering (SURVEY.md sect.7 step 2) happens here: transforms are
decomposed and baked into primitive parameters at compile time, so the render
hot path has no transform facade.
"""

from __future__ import annotations

import dataclasses
import os as _os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from raysnail_tpu import ir, lights as lightslib, materials as matlib, textures as texlib
from raysnail_tpu.geometry import boxes, csg, media as medialib, quadrics, rects, spheres, triangles
from raysnail_tpu.geometry import transforms as tf
from raysnail_tpu.geometry.hit import Hit, combine_hits, miss
from raysnail_tpu.prelude import rng as prng
from raysnail_tpu.prelude.vec import Vec3


class Background(NamedTuple):
    """Vertical gradient c1 -> c2 on 0.5*(dir.y + 1) (world.rs:19-23; the SDL
    driver's fixed sky raysnail.rs:364-367). Solid color = c1 == c2."""
    c1: Vec3
    c2: Vec3

    def color(self, direction: Vec3) -> Vec3:
        t = 0.5 * (direction.y + 1.0)
        return self.c1 * (1.0 - t) + self.c2 * t


class SceneArrays(NamedTuple):
    spheres: Optional[spheres.SphereGroup]
    boxes: Optional[boxes.BoxGroup]
    rects: Optional[rects.RectGroup]
    quadrics: Optional[quadrics.QuadricGroup]
    triangles: Optional[triangles.TriangleGroup]
    materials: matlib.MaterialTable
    textures: texlib.TextureTable
    lights: Optional[lightslib.LightArrays]
    background: Background


@dataclasses.dataclass(frozen=True)
class SceneStatic:
    tex_modes: frozenset
    mat_kinds: frozenset
    light_kinds: frozenset
    moving: bool
    has_lights: bool
    n_media: int
    n_csg: int
    sphere_chunk: int = 512
    tri_brute: bool = False   # dense sweep instead of BVH walk (small meshes)
    has_absorb: bool = False  # any dielectric with Beer-Lambert absorption
    mix_depth: int = 1        # max Mixed-material nesting (resolve iterations)


@dataclasses.dataclass
class Scene:
    arrays: SceneArrays
    static: SceneStatic
    csg_trees: tuple      # closed over by the traced program
    media: tuple
    mandelbulbs: tuple

    def intersect(self, ray, t_min, t_max, key) -> Hit:
        return intersect(self, self.arrays, ray, t_min, t_max, key)


# axis-aligned box groups at least this large get a packed BVH for the
# pallas traversal kernel (the dense slab sweep stays for small groups)
BOX_BVH_MIN_BUILD = 130


def intersect(scene: Scene, arrays: SceneArrays, ray, t_min, t_max, key,
              use_pallas: bool = False, pallas_interpret: bool = False,
              mesh_pallas: bool = False, mesh_interpret: bool = False,
              mesh_sort: bool = False, mesh_bin: str = "never",
              sphere_bvh: bool = False,
              sphere_bvh_interpret: bool = False, box_pallas: bool = False,
              box_interpret: bool = False, active=None) -> Hit:
    """Closest hit across all primitive groups. `arrays` is passed separately
    so a jitted caller can thread traced arrays while `scene` supplies the
    static structure. `key` is the per-ray key batch (only media draw from
    it). `active` is the integrator's alive mask — the pallas traversal paths
    use it to stop dead lanes from admitting BVH nodes."""
    best = miss(jnp.shape(ray.direction.x), ray.direction.x.dtype)
    if arrays.spheres is not None:
        best = combine_hits(
            best,
            spheres.intersect(arrays.spheres, ray, t_min, t_max,
                              moving=scene.static.moving,
                              chunk=scene.static.sphere_chunk,
                              need_uv=texlib.IMAGE in scene.static.tex_modes,
                              use_pallas=use_pallas,
                              pallas_interpret=pallas_interpret,
                              use_bvh=sphere_bvh,
                              bvh_interpret=sphere_bvh_interpret,
                              active=active),
        )
    if arrays.boxes is not None:
        if box_pallas and arrays.boxes.pk_bb is not None:
            # sphere hits (above) cap the traversal via t_cap
            best = combine_hits(best, boxes.intersect_pallas(
                arrays.boxes, ray, t_min, t_max, active=active,
                t_cap=best.t, interpret=box_interpret))
        else:
            best = combine_hits(
                best, boxes.intersect(arrays.boxes, ray, t_min, t_max))
    if arrays.rects is not None:
        best = combine_hits(best, rects.intersect(arrays.rects, ray, t_min, t_max))
    if arrays.quadrics is not None:
        best = combine_hits(best, quadrics.intersect(arrays.quadrics, ray, t_min, t_max))
    if arrays.triangles is not None:
        # geometry gradients are out of scope: detach the mesh hit (the BVH
        # while_loop is not reverse-differentiable anyway)
        if use_pallas or mesh_pallas:
            # `best` from the cheap dense groups above caps the traversal:
            # a bounce ray that already hit the ground sphere at t=0.5 never
            # admits mesh nodes beyond it
            tri_hit = triangles.intersect_pallas(
                arrays.triangles, ray, t_min, t_max, active=active,
                t_cap=best.t,
                interpret=pallas_interpret or mesh_interpret,
                sort_rays=mesh_sort, bin_mode=mesh_bin)
        elif scene.static.tri_brute:
            tri_hit = triangles.intersect_brute(arrays.triangles, ray, t_min, t_max)
        else:
            tri_hit = triangles.intersect(arrays.triangles, ray, t_min, t_max)
        best = combine_hits(best, jax.lax.stop_gradient(tri_hit))
    if scene.csg_trees:
        best = combine_hits(best, csg.intersect_trees(scene.csg_trees, ray, t_min, t_max))
    if scene.media:
        us = prng.ray_uniforms(prng.fold_all(key, prng.MEDIUM), len(scene.media))
        best = combine_hits(
            best, medialib.intersect_media(scene.media, ray, t_min, t_max, us)
        )
    for bulb in scene.mandelbulbs:
        # same while_loop caveat as meshes: detached
        best = combine_hits(
            best,
            jax.lax.stop_gradient(bulb.hit(ray, t_min, t_max, active=active)))
    return best


# -- builder ---------------------------------------------------------------

class SceneBuilder:
    """Collects IR specs and lowers them to a Scene.

    `add(obj)` adds world geometry; `add(obj, light=True)` also registers the
    object in the light-sampling list (the reference adds light spheres to
    BOTH the world and `lights`, bin/raysnail.rs:353-362)."""

    def __init__(self):
        self.objects: list = []
        self.light_specs: list = []
        self.background = Background(
            c1=Vec3.full((1.0, 1.0, 1.0)), c2=Vec3.full((0.5, 0.7, 1.0))
        )

    def add(self, obj, light: bool = False):
        self.objects.append(obj)
        if light:
            # The light spec must describe the object's WORLD-space placement:
            # bake a translate+uniform-scale transform into the spec (matching
            # the geometry lowering below) and reject anything the sampler
            # cannot represent, so NEE never targets a pre-transform shape.
            m = ir.unmat4(obj.transform) if getattr(obj, "transform", None) else None
            ts = tf.is_translate_uniform_scale(m) if m is not None else (1.0, np.zeros(3))
            if isinstance(obj, ir.Sphere):
                if ts is None:
                    raise ValueError(
                        "light spheres only support translate/uniform-scale "
                        "transforms (anything else lowers to a quadric, which "
                        "the light sampler cannot target)")
                s, off = ts
                c = tuple(np.asarray(obj.center, np.float64) * s + off)
                self.light_specs.append(("sphere", c, obj.radius * abs(s)))
            elif isinstance(obj, ir.Rect) and obj.k_axis == 1:
                if ts is None:
                    raise ValueError(
                        "light rects only support translate/uniform-scale "
                        "transforms (a rotated rect light would need an "
                        "oriented-rect sampler; see rect.rs:141-153)")
                s, off = ts
                a0, a1 = sorted((obj.a0 * s + off[0], obj.a1 * s + off[0]))
                b0, b1 = sorted((obj.b0 * s + off[2], obj.b1 * s + off[2]))
                self.light_specs.append(
                    ("rect_xz", obj.k * s + off[1], a0, a1, b0, b1)
                )
            else:
                raise ValueError("lights must be spheres or XZ rects (rect.rs:141-153)")
        return self

    def set_background(self, c1, c2=None):
        c1 = Vec3.full(tuple(c1))
        self.background = Background(c1=c1, c2=Vec3.full(tuple(c2)) if c2 is not None else c1)
        return self

    def compile(self, dtype=jnp.float32) -> Scene:
        return _compile(self, dtype)


class _Tables:
    """Deduplicating collectors for materials and textures."""

    def __init__(self):
        self.tex_index: dict = {}
        self.tex_rows: list = []
        self.mat_index: dict = {}
        self.mat_rows: list = []
        self.images: list = []
        self.perlins: list = []
        self.deep_checker = False  # some checker has non-constant children
        self.checker_depth = 0     # max checker nesting (1 = plain checker)
        self._row_depth: list = [] # per-row checker nesting depth
        self.mix_depth = 1         # max Mixed-material nesting
        self._mat_depth: list = [] # per-row Mixed nesting depth
        # row 0: the world default white Lambertian (world.rs:25-60)
        self.material(ir.Lambertian(ir.Constant((1.0, 1.0, 1.0))))

    def texture(self, spec) -> int:
        spec = ir.as_texture(spec)
        if spec in self.tex_index:
            return self.tex_index[spec]
        row = dict(ttype=texlib.CONSTANT, color1=(0.0, 0.0, 0.0), color2=(0.0, 0.0, 0.0),
                   scale=1.0, image_id=-1, depth=0, perlin_id=-1,
                   child1=-1, child2=-1)
        if isinstance(spec, ir.Constant):
            row["color1"] = spec.rgb
        elif isinstance(spec, ir.Checker):
            # generic over child textures like the reference's Checker<T1,T2>
            # (checker.rs:8-28), INCLUDING checker-of-checker: children
            # register as their own table rows and evaluation descends the
            # static max nesting depth, re-deriving the cell sign with each
            # level's own scale (textures.evaluate).
            odd, even = ir.as_texture(spec.odd), ir.as_texture(spec.even)
            c1, c2 = self.texture(odd), self.texture(even)
            row.update(ttype=texlib.CHECKER, scale=spec.scale,
                       child1=c1, child2=c2)
            row["_depth"] = 1 + max(self._row_depth[c1], self._row_depth[c2])
            self.checker_depth = max(self.checker_depth, row["_depth"])
            if isinstance(odd, ir.Constant) and isinstance(even, ir.Constant):
                # fast path: constant cells read color1/color2 directly
                row.update(color1=odd.rgb, color2=even.rgb)
            else:
                self.deep_checker = True
        elif isinstance(spec, ir.ImageTex):
            from PIL import Image
            img = np.asarray(Image.open(spec.path).convert("RGB"), np.float32) / 255.0
            row.update(ttype=texlib.IMAGE, image_id=len(self.images))
            self.images.append(img)
        elif isinstance(spec, ir.Noise):
            ttype = {"normal": texlib.PERLIN, "turbulence": texlib.PERLIN_TURB,
                     "marble": texlib.PERLIN_MARBLE}[spec.kind]
            row.update(ttype=ttype, scale=spec.scale, depth=spec.depth,
                       perlin_id=len(self.perlins))
            self.perlins.append(_perlin_tables(spec))
        else:
            raise TypeError(f"unknown texture {spec!r}")
        idx = len(self.tex_rows)
        self._row_depth.append(row.pop("_depth", 0))
        self.tex_rows.append(row)
        self.tex_index[spec] = idx
        return idx

    def material(self, spec) -> int:
        if spec is None:
            return -1
        if spec in self.mat_index:
            return self.mat_index[spec]
        row = dict(mtype=matlib.LAMBERTIAN, tex_id=0, param0=0.0, param1=0.0,
                   emit_mult=0.0, phong_factor=0.0, phong_exponent=1.0,
                   mix_prob=0.0, mix_a=0, mix_b=0, absorb=(0.0, 0.0, 0.0))
        if isinstance(spec, ir.Lambertian):
            row.update(mtype=matlib.LAMBERTIAN, tex_id=self.texture(spec.texture),
                       phong_factor=spec.phong_factor, phong_exponent=spec.phong_exponent)
        elif isinstance(spec, ir.Metal):
            row.update(mtype=matlib.METAL, tex_id=self.texture(spec.texture),
                       phong_factor=spec.phong_factor, phong_exponent=spec.phong_exponent)
        elif isinstance(spec, ir.DiffuseMetal):
            row.update(mtype=matlib.DIFFUSE_METAL, tex_id=self.texture(spec.texture),
                       param0=spec.exponent,
                       phong_factor=spec.phong_factor, phong_exponent=spec.phong_exponent)
        elif isinstance(spec, ir.Dielectric):
            row.update(mtype=matlib.DIELECTRIC, tex_id=self.texture(ir.Constant(spec.rgb)),
                       param0=spec.ior, param1=1.0 if spec.schlick else 0.0,
                       absorb=tuple(spec.absorption))
        elif isinstance(spec, ir.BlinnPhong):
            row.update(mtype=matlib.BLINN_PHONG, tex_id=self.texture(spec.texture),
                       param0=spec.k_specular, param1=spec.exponent,
                       phong_factor=spec.phong_factor, phong_exponent=spec.phong_exponent)
        elif isinstance(spec, ir.DiffuseLight):
            row.update(mtype=matlib.DIFFUSE_LIGHT, tex_id=self.texture(spec.texture),
                       emit_mult=spec.multiplier)
        elif isinstance(spec, ir.Isotropic):
            row.update(mtype=matlib.ISOTROPIC, tex_id=self.texture(ir.Constant(spec.rgb)))
        elif isinstance(spec, ir.Mixed):
            # nests like the reference's Arc<dyn Material> pair
            # (mixed_material.rs:15-23): children register as their own rows;
            # resolve() iterates the scene's static max nesting depth
            a = self.material(spec.material_1)
            b = self.material(spec.material_2)
            row.update(mtype=matlib.MIXED, mix_prob=spec.probability_1, mix_a=a, mix_b=b)
            row["_depth"] = 1 + max(self._mat_depth[a], self._mat_depth[b])
            self.mix_depth = max(self.mix_depth, row["_depth"])
        else:
            raise TypeError(f"unknown material {spec!r}")
        idx = len(self.mat_rows)
        self._mat_depth.append(row.pop("_depth", 0))
        self.mat_rows.append(row)
        self.mat_index[spec] = idx
        return idx


def _perlin_tables(spec: ir.Noise):
    """Per-noise lattice parameters. The lattice VALUES are hash-derived on
    the fly (textures._lattice_corner) — the explicit float/vec/perm tables
    of noise.rs:41-70 became 44 serialized per-lane gathers per evaluation
    on TPU (4x the whole book2 frame, scripts/ablate_book2.py); only the
    seed, vector flag and smoothing mode remain."""
    seed = np.uint32((spec.seed + 12345) & 0xFFFFFFFF)
    smooth = {"none": 0, "linear": 1, "hermitian": 2}[spec.smooth]
    return seed, bool(spec.vector), smooth


def _compile(builder: SceneBuilder, dtype) -> Scene:
    tables = _Tables()

    sph, box_list, rect_list, quad_list, mesh_list = [], [], [], [], []
    csg_trees, media_nodes, bulbs = [], [], []
    moving = False

    def lower(obj, parent_tf: np.ndarray | None = None):
        nonlocal moving
        own = ir.unmat4(obj.transform) if getattr(obj, "transform", None) else None
        m = _combine_tf(parent_tf, own)

        if isinstance(obj, ir.Sphere):
            mat = tables.material(obj.material)
            if m is None:
                if any(obj.speed):
                    moving = True
                sph.append((obj.center, obj.radius, obj.speed, mat))
                return
            ts = tf.is_translate_uniform_scale(m)
            if ts is not None:
                s, off = ts
                c = np.asarray(obj.center) * s + off
                if any(obj.speed):
                    moving = True
                sph.append((tuple(c), obj.radius * s, obj.speed, mat))
            else:
                coeffs = tf.transform_quadric(
                    tf.sphere_to_quadric(obj.center, obj.radius), m
                )
                quad_list.append((coeffs, mat))
        elif isinstance(obj, ir.Box):
            mat = tables.material(obj.material)
            if m is None:
                box_list.append((obj.p_min, obj.p_max, mat, None, None))
            else:
                inv_rot, inv_off = tf.inverse_rows(m)
                box_list.append((obj.p_min, obj.p_max, mat, inv_rot, inv_off))
        elif isinstance(obj, ir.Rect):
            mat = tables.material(obj.material)
            if m is None:
                rect_list.append((obj, mat, None, None))
            else:
                inv_rot, inv_off = tf.inverse_rows(m)
                rect_list.append((obj, mat, inv_rot, inv_off))
        elif isinstance(obj, ir.Quadric):
            mat = tables.material(obj.material)
            coeffs = tuple(float(c) for c in obj.coeffs)
            if m is not None:
                coeffs = tf.transform_quadric(coeffs, m)
            quad_list.append((coeffs, mat))
        elif isinstance(obj, ir.Csg):
            mat = tables.material(obj.material)
            node = _lower_csg(obj, m, tables, dtype)
            csg_trees.append(node)
        elif isinstance(obj, ir.ConstantMedium):
            mat = tables.material(ir.Isotropic(obj.rgb))
            leaf = _leaf_of(obj.boundary, m, -1, tables, dtype, register_material=False)
            media_nodes.append(
                medialib.MediumNode(
                    boundary=leaf,
                    neg_inv_density=jnp.asarray(-1.0 / obj.density, dtype),
                    mat_id=mat,
                )
            )
        elif isinstance(obj, ir.Mandelbulb):
            from raysnail_tpu.geometry.mandelbulb import MandelbulbNode
            mat = tables.material(obj.material)
            bulbs.append(MandelbulbNode(mat_id=mat))
        elif isinstance(obj, ir.Mesh):
            mat = tables.material(obj.material)
            mesh_list.append((obj, mat))
        else:
            raise TypeError(f"unknown object {obj!r}")

    for obj in builder.objects:
        lower(obj)

    def f32(x):
        return jnp.asarray(np.asarray(x, np.float64), dtype)

    sphere_group = None
    if sph:
        chunk = 512
        n = len(sph)
        pad = (-n) % chunk if n > chunk else 0
        centers = np.asarray([s[0] for s in sph] + [(0, 0, 0)] * pad, np.float64)
        radii = np.asarray([s[1] for s in sph] + [1.0] * pad, np.float64)
        speeds = np.asarray([s[2] for s in sph] + [(0, 0, 0)] * pad, np.float64)
        mats = np.asarray([s[3] for s in sph] + [-1] * pad, np.int32)
        active = np.asarray([True] * n + [False] * pad)
        # packed BVH blocks for the pallas kernel: worth it for big static
        # sphere sets (rtow_13_1's 478 spheres); motion blur stays on the
        # dense path (centers move per-ray with time)
        pk_bb = pk_links = pk_sph = pk_cbb = pk_crange = None
        if n >= 64 and not moving:
            c = centers[:n]
            r = radii[:n]
            ones = np.ones(n)
            pk_bb, pk_links, pk_cbb, pk_crange, pk_sph = _pack_leaf_blocks(
                c - r[:, None], c + r[:, None],
                [c[:, 0], c[:, 1], c[:, 2], r * r, ones,
                 np.asarray([s[3] for s in sph], np.float64), r],
            )
        sphere_group = spheres.SphereGroup(
            center=Vec3.from_array(f32(centers)),
            radius=f32(radii),
            speed=Vec3.from_array(f32(speeds)),
            mat_id=jnp.asarray(mats),
            active=jnp.asarray(active),
            pk_bb=jnp.asarray(pk_bb) if pk_bb is not None else None,
            pk_links=jnp.asarray(pk_links) if pk_links is not None else None,
            pk_sph=jnp.asarray(pk_sph) if pk_sph is not None else None,
            pk_cbb=jnp.asarray(pk_cbb) if pk_cbb is not None else None,
            pk_crange=jnp.asarray(pk_crange) if pk_crange is not None else None,
        )

    box_group = None
    if box_list:
        any_oriented = any(b[3] is not None for b in box_list)
        pmin = f32([b[0] for b in box_list])
        pmax = f32([b[1] for b in box_list])
        mats = jnp.asarray([b[2] for b in box_list], jnp.int32)
        active = jnp.ones(len(box_list), bool)
        inv_rows = inv_off = None
        if any_oriented:
            eye = np.eye(3)
            rots = np.asarray([b[3] if b[3] is not None else eye for b in box_list])
            offs = np.asarray([b[4] if b[4] is not None else np.zeros(3) for b in box_list])
            inv_rows = tuple(Vec3.from_array(f32(rots[:, i, :])) for i in range(3))
            inv_off = Vec3.from_array(f32(offs))
        pk_bb = pk_links = pk_box = pk_cbb = pk_crange = None
        if not any_oriented and len(box_list) >= BOX_BVH_MIN_BUILD:
            # packed BVH for the pallas traversal kernel: book2's 400-box
            # ground (scene.rs:341-358) re-swept the dense (rays x boxes)
            # slab test every bounce; the packet kernel sweeps only
            # admitted 128-box leaf blocks (VERDICT r3 item 4)
            pmin_np = np.asarray([b[0] for b in box_list], np.float64)
            pmax_np = np.asarray([b[1] for b in box_list], np.float64)
            ones = np.ones(len(box_list))
            mats_np = np.asarray([b[2] for b in box_list], np.float64)
            pk_bb, pk_links, pk_cbb, pk_crange, pk_box = _pack_leaf_blocks(
                pmin_np, pmax_np,
                [pmin_np[:, 0], pmin_np[:, 1], pmin_np[:, 2],
                 pmax_np[:, 0], pmax_np[:, 1], pmax_np[:, 2],
                 ones, mats_np],
            )
            pk_bb = jnp.asarray(pk_bb)
            pk_links = jnp.asarray(pk_links)
            pk_box = jnp.asarray(pk_box)
            pk_cbb = jnp.asarray(pk_cbb)
            pk_crange = jnp.asarray(pk_crange)
        box_group = boxes.BoxGroup(
            p_min=Vec3.from_array(pmin), p_max=Vec3.from_array(pmax),
            mat_id=mats, active=active, inv_rows=inv_rows, inv_off=inv_off,
            pk_bb=pk_bb, pk_links=pk_links, pk_box=pk_box,
            pk_cbb=pk_cbb, pk_crange=pk_crange,
        )

    rect_group = None
    if rect_list:
        any_oriented = any(r[2] is not None for r in rect_list)
        inv_rows = inv_off = None
        if any_oriented:
            eye = np.eye(3)
            rots = np.asarray([r[2] if r[2] is not None else eye
                               for r in rect_list])
            offs = np.asarray([r[3] if r[3] is not None else np.zeros(3)
                               for r in rect_list])
            inv_rows = tuple(Vec3.from_array(f32(rots[:, i, :])) for i in range(3))
            inv_off = Vec3.from_array(f32(offs))
        rect_group = rects.RectGroup(
            k_axis=jnp.asarray([r.k_axis for r, *_ in rect_list], jnp.int32),
            k=f32([r.k for r, *_ in rect_list]),
            a0=f32([r.a0 for r, *_ in rect_list]),
            a1=f32([r.a1 for r, *_ in rect_list]),
            b0=f32([r.b0 for r, *_ in rect_list]),
            b1=f32([r.b1 for r, *_ in rect_list]),
            mat_id=jnp.asarray([m for _, m, *_ in rect_list], jnp.int32),
            active=jnp.ones(len(rect_list), bool),
            inv_rows=inv_rows, inv_off=inv_off,
        )

    quad_group = None
    if quad_list:
        cols = np.asarray([q[0] for q in quad_list], np.float64).T
        quad_group = quadrics.QuadricGroup(
            *(f32(c) for c in cols),
            mat_id=jnp.asarray([q[1] for q in quad_list], jnp.int32),
            active=jnp.ones(len(quad_list), bool),
        )

    BRUTE_FORCE_MAX = 32768  # triangles; above this the BVH walk wins
    tri_group = None
    tri_brute = False
    if mesh_list:
        tri_group = _build_triangles(mesh_list, f32)
        tri_brute = int(tri_group.mat_id.shape[0]) <= BRUTE_FORCE_MAX

    # light list
    light_arrays = None
    light_kinds = set()
    if builder.light_specs:
        kinds, centers, radii, ks, a0s, a1s, b0s, b1s = [], [], [], [], [], [], [], []
        for spec in builder.light_specs:
            if spec[0] == "sphere":
                kinds.append(lightslib.SPHERE)
                centers.append(spec[1]); radii.append(spec[2])
                ks.append(0.0); a0s.append(0.0); a1s.append(0.0); b0s.append(0.0); b1s.append(0.0)
                light_kinds.add(lightslib.SPHERE)
            else:
                kinds.append(lightslib.RECT_XZ)
                centers.append((0.0, 0.0, 0.0)); radii.append(0.0)
                _, k, a0, a1, b0, b1 = spec
                ks.append(k); a0s.append(a0); a1s.append(a1); b0s.append(b0); b1s.append(b1)
                light_kinds.add(lightslib.RECT_XZ)
        light_arrays = lightslib.LightArrays(
            kind=jnp.asarray(kinds, jnp.int32),
            center=Vec3.from_array(f32(centers)),
            radius=f32(radii), k=f32(ks),
            a0=f32(a0s), a1=f32(a1s), b0=f32(b0s), b1=f32(b1s),
        )

    # tables -> arrays
    tr = tables.tex_rows
    tex_modes = frozenset(r["ttype"] for r in tr)
    if tables.deep_checker or tables.checker_depth > 1:
        # static descent depth for nested / non-constant checkers
        tex_modes = tex_modes | {texlib.CHECKER_DEEP,
                                 ("checker_depth", tables.checker_depth)}
    atlas = atlas_wh = None
    if tables.images:
        mh = max(i.shape[0] for i in tables.images)
        mw = max(i.shape[1] for i in tables.images)
        atlas_np = np.zeros((len(tables.images), mh, mw, 3), np.float32)
        wh = []
        for i, img in enumerate(tables.images):
            atlas_np[i, : img.shape[0], : img.shape[1]] = img
            wh.append((img.shape[1], img.shape[0]))
        atlas = jnp.asarray(atlas_np)
        atlas_wh = jnp.asarray(wh, jnp.int32)
    perlin_seed = perlin_is_vec = perlin_smooth = None
    if tables.perlins:
        perlin_seed = jnp.asarray(
            np.asarray([p[0] for p in tables.perlins], np.uint32))
        perlin_is_vec = jnp.asarray([p[1] for p in tables.perlins])
        perlin_smooth = jnp.asarray([p[2] for p in tables.perlins], jnp.int32)

    texture_table = texlib.TextureTable(
        ttype=jnp.asarray([r["ttype"] for r in tr], jnp.int32),
        color1=Vec3.from_array(f32([r["color1"] for r in tr])),
        color2=Vec3.from_array(f32([r["color2"] for r in tr])),
        scale=f32([r["scale"] for r in tr]),
        image_id=jnp.asarray([r["image_id"] for r in tr], jnp.int32),
        depth=jnp.asarray([r["depth"] for r in tr], jnp.int32),
        child1=jnp.asarray([r["child1"] for r in tr], jnp.int32),
        child2=jnp.asarray([r["child2"] for r in tr], jnp.int32),
        atlas=atlas, atlas_wh=atlas_wh,
        perlin_id=jnp.asarray([r["perlin_id"] for r in tr], jnp.int32),
        perlin_seed=perlin_seed,
        perlin_is_vec=perlin_is_vec, perlin_smooth=perlin_smooth,
    )

    mr = tables.mat_rows
    mat_kinds = frozenset(r["mtype"] for r in mr)
    has_absorb = any(any(c != 0.0 for c in r["absorb"]) for r in mr)
    material_table = matlib.MaterialTable(
        mtype=jnp.asarray([r["mtype"] for r in mr], jnp.int32),
        tex_id=jnp.asarray([r["tex_id"] for r in mr], jnp.int32),
        param0=f32([r["param0"] for r in mr]),
        param1=f32([r["param1"] for r in mr]),
        emit_mult=f32([r["emit_mult"] for r in mr]),
        phong_factor=f32([r["phong_factor"] for r in mr]),
        phong_exponent=f32([r["phong_exponent"] for r in mr]),
        mix_prob=f32([r["mix_prob"] for r in mr]),
        mix_a=jnp.asarray([r["mix_a"] for r in mr], jnp.int32),
        mix_b=jnp.asarray([r["mix_b"] for r in mr], jnp.int32),
        absorb=Vec3.from_array(f32([r["absorb"] for r in mr])) if has_absorb else None,
    )

    arrays = SceneArrays(
        spheres=sphere_group, boxes=box_group, rects=rect_group,
        quadrics=quad_group, triangles=tri_group,
        materials=material_table, textures=texture_table,
        lights=light_arrays, background=builder.background,
    )
    static = SceneStatic(
        tex_modes=tex_modes,
        mat_kinds=mat_kinds,
        light_kinds=frozenset(light_kinds),
        moving=moving,
        has_lights=light_arrays is not None,
        n_media=len(media_nodes),
        n_csg=len(csg_trees),
        tri_brute=tri_brute,
        has_absorb=has_absorb,
        mix_depth=tables.mix_depth,
    )
    return Scene(arrays=arrays, static=static, csg_trees=tuple(csg_trees),
                 media=tuple(media_nodes), mandelbulbs=tuple(bulbs))


def _leaf_tree(bb_min, bb_max):
    """Fat-leaf BVH (leaf = LANES prims) node arrays for the pallas
    traversal kernel. -> (pk_bb (K, M, 8) f32, pk_links (K, M, 4) i32,
    pk_cbb (K, 64, 8) f32, pk_crange (K, 64, 4) i32, order, pad mask, safe
    indices, n_blocks) where K = 8 direction-octant node orders
    (front-to-back traversal) for trees that fit SMEM 8x, else K = 1
    (build order). pk_cbb/pk_crange are the TWO-LEVEL coarse cut
    (accel.bvh.coarse_cut): <= 64 subtree-root bboxes + their DFS node
    ranges, padded with never-admitting empty boxes."""
    from raysnail_tpu.accel.bvh import build_bvh, coarse_cut, relinearize_octants
    from raysnail_tpu.ops.bvh_pallas import COARSE_MAX, LANES

    fat = build_bvh(bb_min, bb_max, leaf_size=LANES)
    order = fat.prim_order
    pad = order < 0
    safe = np.where(pad, 0, order)

    m = fat.bb_min.shape[0]
    # 8 octant orders cost K*M*16 B of links SMEM (~590 KB usable): the cap
    # covers the 200k-tri mesh's ~3.1k nodes (400 KB) — front-to-back
    # ordering is what lets best_t prune divergent packets early there
    oct_cap = int(_os.environ.get("RAYSNAIL_BVH_OCT_CAP", "4600"))
    if m <= oct_cap:
        bb8, links8 = relinearize_octants(fat)
        links8[:, :, 0] //= LANES
        pk_bb, pk_links = bb8, links8
    else:
        pk_bb = np.zeros((1, m, 8), np.float32)
        pk_bb[0, :, 0:3] = fat.bb_min
        pk_bb[0, :, 3:6] = fat.bb_max
        pk_links = np.zeros((1, m, 4), np.int32)
        pk_links[0, :, 0] = fat.first // LANES
        pk_links[0, :, 1] = fat.count
        pk_links[0, :, 2] = fat.miss
    k_ord = pk_bb.shape[0]
    pk_cbb = np.zeros((k_ord, COARSE_MAX, 8), np.float32)
    pk_cbb[:, :, 0:3] = 1e30   # padding entries: empty box, never admits
    pk_cbb[:, :, 3:6] = -1e30
    pk_crange = np.full((k_ord, COARSE_MAX, 4), m, np.int32)
    for k in range(k_ord):
        cuts = coarse_cut(pk_links[k, :, 1], pk_links[k, :, 2],
                          max_entries=COARSE_MAX)
        starts = np.asarray([c[0] for c in cuts])
        pk_cbb[k, :len(cuts), :] = pk_bb[k, starts, :]
        pk_crange[k, :len(cuts), 0] = starts
        pk_crange[k, :len(cuts), 1] = np.asarray([c[1] for c in cuts])
    return (pk_bb, pk_links, pk_cbb, pk_crange, order, pad, safe,
            len(order) // LANES)


def _pack_leaf_blocks(bb_min, bb_max, fields):
    """Fat-leaf BVH (leaf = LANES prims) + (B, NF, LANES) field blocks for
    the pallas traversal kernel (ops/bvh_pallas.py): fields on sublanes,
    primitives on lanes — the compact layout with no lane padding. Padding
    rows are zeroed, so a `valid` field of ones marks real primitives.

    fields: list of (P,) float arrays, one per block row; NF rounds up to a
    multiple of 8 (f32 sublane tile).
    -> (pk_bb (K, M, 8) f32, pk_links (K, M, 4) i32,
        pk_cbb (K, 64, 8) f32, pk_crange (K, 64, 4) i32,
        pk_prim (B, NF, LANES) f32)
    """
    from raysnail_tpu.ops.bvh_pallas import LANES

    (pk_bb, pk_links, pk_cbb, pk_crange, order, pad, safe,
     n_blocks) = _leaf_tree(bb_min, bb_max)
    nf = -(-len(fields) // 8) * 8
    pk = np.zeros((n_blocks, nf, LANES), np.float32)
    for i, f in enumerate(fields):
        vals = np.where(pad, 0.0, np.asarray(f, np.float64)[safe])
        pk[:, i, :] = vals.reshape(n_blocks, LANES)
    return pk_bb, pk_links, pk_cbb, pk_crange, pk


def _pack_mxu_blocks(bb_min, bb_max, nrm, q, r, e1, e2, np0, attr_fields):
    """MXU-solve leaf blocks (ops/bvh_pallas.py NF_MXU): (B, 16, 640) —
    lanes 0:512 the solve table F (denom | t | beta | gamma columns of the
    one-matmul Cramer solve), lanes 512:640 the attr table
    [valid, mat, n0, n1, n2]."""
    from raysnail_tpu.ops.bvh_pallas import LANES, MXU_LANES, NF_MXU

    (pk_bb, pk_links, pk_cbb, pk_crange, order, pad, safe,
     n_blocks) = _leaf_tree(bb_min, bb_max)

    def ro(a):
        """(P,) or (P,3) -> padded-reordered (n_blocks, LANES[, 3])."""
        vals = np.asarray(a, np.float64)[safe]
        vals[pad] = 0.0
        return vals.reshape((n_blocks, LANES) + vals.shape[1:])

    pk = np.zeros((n_blocks, NF_MXU, MXU_LANES), np.float32)
    nrm_o, q_o, r_o = ro(nrm), ro(q), ro(r)
    e1_o, e2_o, np0_o = ro(e1), ro(e2), ro(np0)
    for ax in range(3):
        pk[:, ax, 0:128] = nrm_o[:, :, ax]          # denom: d . n
        pk[:, 3 + ax, 128:256] = nrm_o[:, :, ax]    # t: o-part = n
        pk[:, ax, 256:384] = q_o[:, :, ax]          # beta: d-part
        pk[:, 6 + ax, 256:384] = e2_o[:, :, ax]     # beta: (o x d)-part = dd
        pk[:, ax, 384:512] = r_o[:, :, ax]          # gamma: d-part
        pk[:, 6 + ax, 384:512] = -e1_o[:, :, ax]    # gamma: (o x d)-part = -a
    pk[:, 9, 128:256] = -np0_o                      # t: const = -(n . p0)
    for i, f in enumerate(attr_fields):
        pk[:, i, 512:640] = ro(f)
    return pk_bb, pk_links, pk_cbb, pk_crange, pk


def _build_triangles(mesh_list, f32):
    """Merge all meshes into one triangle pool + one BVH; reorder per-face
    data into BVH leaf order (padding rows get mat_id = -2)."""
    from raysnail_tpu.accel.bvh import build_bvh
    from raysnail_tpu.io.obj import vertex_normals

    all_p0, all_p1, all_p2 = [], [], []
    all_n0, all_n1, all_n2 = [], [], []
    all_mat = []
    for spec, mat in mesh_list:
        v = np.asarray(spec.vertices, np.float64)
        faces = np.asarray(spec.indices, np.int32)
        n = spec.normals
        if n is None:
            n = vertex_normals(v, faces)
        else:
            n = np.asarray(n, np.float64)
        all_p0.append(v[faces[:, 0]]); all_p1.append(v[faces[:, 1]]); all_p2.append(v[faces[:, 2]])
        all_n0.append(n[faces[:, 0]]); all_n1.append(n[faces[:, 1]]); all_n2.append(n[faces[:, 2]])
        all_mat.append(np.full(len(faces), mat, np.int32))

    p0 = np.concatenate(all_p0); p1 = np.concatenate(all_p1); p2 = np.concatenate(all_p2)
    n0 = np.concatenate(all_n0); n1 = np.concatenate(all_n1); n2 = np.concatenate(all_n2)
    mat = np.concatenate(all_mat)

    bb_min = np.minimum(np.minimum(p0, p1), p2)
    bb_max = np.maximum(np.maximum(p0, p1), p2)
    bvh = build_bvh(bb_min, bb_max)

    order = bvh.prim_order
    pad = order < 0
    safe = np.where(pad, 0, order)

    def reorder(a, padval=0.0):
        out = a[safe].copy()
        out[pad] = padval
        return out

    p0o = reorder(p0); p1o = reorder(p1); p2o = reorder(p2)

    # packed layout for the pallas traversal kernel (ops/bvh_pallas.py):
    # geometry + vertex normals + material per block so the kernel finishes
    # hits itself (no XLA gathers on the mesh path at all)
    e1 = p0 - p1
    e2 = p0 - p2
    ones = np.ones(len(p0))
    import os as _os
    # default cramer: the MXU one-matmul solve MEASURED ~20% slower end-to-
    # end on v5e (kern_sweepstats r4: shuffled 41.4 vs 33.2 ms — the
    # (128,16)x(16,512) HIGHEST-precision matmul + operand staging costs
    # more than the ~55 VPU ops it replaces); kept behind the env knob as
    # measured evidence
    if _os.environ.get("RAYSNAIL_MESH_SOLVER", "cramer") == "mxu":
        # MXU solve format (bvh_pallas NF_MXU): per-tri features so one
        # (128,16)x(16,512) matmul yields denom/t/beta/gamma numerators
        nrm = np.cross(e1, e2)          # n = a x dd
        q = np.cross(p0, e2)            # p0 x dd   (beta, d-part)
        r = np.cross(e1, p0)            # a x p0    (gamma, d-part)
        np0 = np.sum(nrm * p0, axis=1)  # n . p0
        pk_bb, pk_links, pk_cbb, pk_crange, pk_tri = _pack_mxu_blocks(
            bb_min, bb_max, nrm, q, r, e1, e2, np0,
            [ones, mat.astype(np.float64),
             n0[:, 0], n0[:, 1], n0[:, 2], n1[:, 0], n1[:, 1], n1[:, 2],
             n2[:, 0], n2[:, 1], n2[:, 2]],
        )
    else:
        pk_bb, pk_links, pk_cbb, pk_crange, pk_tri = _pack_leaf_blocks(
            bb_min, bb_max,
            [p0[:, 0], p0[:, 1], p0[:, 2], e1[:, 0], e1[:, 1], e1[:, 2],
             e2[:, 0], e2[:, 1], e2[:, 2], ones,
             n0[:, 0], n0[:, 1], n0[:, 2], n1[:, 0], n1[:, 1], n1[:, 2],
             n2[:, 0], n2[:, 1], n2[:, 2], mat.astype(np.float64)],
    )

    return triangles.TriangleGroup(
        p0=Vec3.from_array(f32(p0o)),
        edge_a=Vec3.from_array(f32(p0o - p1o)),
        edge_d=Vec3.from_array(f32(p0o - p2o)),
        n0=Vec3.from_array(f32(reorder(n0))),
        n1=Vec3.from_array(f32(reorder(n1))),
        n2=Vec3.from_array(f32(reorder(n2))),
        mat_id=jnp.asarray(np.where(pad, -2, mat[safe]).astype(np.int32)),
        bb_min=Vec3.from_array(jnp.asarray(bvh.bb_min)),
        bb_max=Vec3.from_array(jnp.asarray(bvh.bb_max)),
        first=jnp.asarray(bvh.first),
        count=jnp.asarray(bvh.count),
        miss=jnp.asarray(bvh.miss),
        pk_bb=jnp.asarray(pk_bb),
        pk_links=jnp.asarray(pk_links),
        pk_tri=jnp.asarray(pk_tri),
        pk_cbb=jnp.asarray(pk_cbb),
        pk_crange=jnp.asarray(pk_crange),
    )


def _combine_tf(parent, own):
    if parent is None and own is None:
        return None
    if parent is None:
        return own
    if own is None:
        return parent
    return parent @ own  # child's own transforms apply first


def _leaf_of(obj, m, inherit_mat, tables, dtype, register_material=True):
    """Lower a CSG child (Sphere/Box/Quadric/Csg) to a leaf/node, pushing the
    accumulated transform m down."""
    own = ir.unmat4(obj.transform) if getattr(obj, "transform", None) else None
    m = _combine_tf(m, own)
    mat = tables.material(obj.material) if register_material else inherit_mat

    def scal(x):
        return jnp.asarray(float(x), dtype)

    if isinstance(obj, ir.Sphere):
        if m is None:
            return csg.SphereLeaf(
                center=Vec3.full(tuple(obj.center), (), dtype),
                radius=scal(obj.radius), mat_id=mat,
            )
        ts = tf.is_translate_uniform_scale(m)
        if ts is not None:
            s, off = ts
            c = np.asarray(obj.center) * s + off
            return csg.SphereLeaf(
                center=Vec3.full(tuple(c), (), dtype),
                radius=scal(obj.radius * s), mat_id=mat,
            )
        coeffs = tf.transform_quadric(tf.sphere_to_quadric(obj.center, obj.radius), m)
        return csg.QuadricLeaf(coeffs=quadrics.Coeffs(*(scal(c) for c in coeffs)), mat_id=mat)
    if isinstance(obj, ir.Box):
        if m is None:
            return csg.BoxLeaf(
                p_min=Vec3.full(tuple(obj.p_min), (), dtype),
                p_max=Vec3.full(tuple(obj.p_max), (), dtype),
                inv_rows=None, inv_off=None, mat_id=mat,
            )
        inv_rot, inv_off = tf.inverse_rows(m)
        return csg.BoxLeaf(
            p_min=Vec3.full(tuple(obj.p_min), (), dtype),
            p_max=Vec3.full(tuple(obj.p_max), (), dtype),
            inv_rows=tuple(Vec3.full(tuple(inv_rot[i]), (), dtype) for i in range(3)),
            inv_off=Vec3.full(tuple(inv_off), (), dtype),
            mat_id=mat,
        )
    if isinstance(obj, ir.Quadric):
        coeffs = tuple(float(c) for c in obj.coeffs)
        if m is not None:
            coeffs = tf.transform_quadric(coeffs, m)
        return csg.QuadricLeaf(coeffs=quadrics.Coeffs(*(scal(c) for c in coeffs)), mat_id=mat)
    if isinstance(obj, ir.Rect):
        inv_rows = inv_off = None
        if m is not None:
            rot, off = tf.inverse_rows(m)
            inv_rows = tuple(Vec3.full(tuple(rot[i]), (), dtype) for i in range(3))
            inv_off = Vec3.full(tuple(off), (), dtype)
        return csg.RectLeaf(
            k_axis=int(obj.k_axis), k=scal(obj.k),
            a0=scal(obj.a0), a1=scal(obj.a1), b0=scal(obj.b0), b1=scal(obj.b1),
            inv_rows=inv_rows, inv_off=inv_off, mat_id=mat,
        )
    if isinstance(obj, ir.Mesh):
        if m is not None:
            v = np.asarray(obj.vertices, np.float64)
            vh = np.concatenate([v, np.ones((len(v), 1))], 1)
            obj = dataclasses.replace(obj, vertices=tuple(map(tuple, (vh @ m.T)[:, :3])),
                                      normals=None if obj.normals is None else tuple(
                                          map(tuple, np.asarray(obj.normals, np.float64)
                                              @ np.linalg.inv(m[:3, :3]))))
        f32 = lambda x: jnp.asarray(np.asarray(x, np.float64), dtype)
        group = _build_triangles([(obj, mat)], f32)
        brute = int(group.mat_id.shape[0]) <= 32768
        return csg.MeshLeaf(group=group, mat_id=mat, brute=brute)
    if isinstance(obj, ir.Csg):
        return _lower_csg(obj, m, tables, dtype)
    raise TypeError(f"unsupported CSG child {obj!r}")


def _lower_csg(obj: ir.Csg, m, tables: _Tables, dtype):
    # invariant: obj.transform is already folded into m by the caller
    mat = tables.material(obj.material)
    left = _leaf_of(obj.left, m, -1, tables, dtype)
    right = _leaf_of(obj.right, m, -1, tables, dtype)
    if obj.op == "intersection":
        return csg.IntersectionNode(left=left, right=right, mat_id=mat)
    if obj.op == "difference":
        minus_mat = getattr(right, "mat_id", -1)
        return csg.DifferenceNode(plus=left, minus=right, mat_id=mat,
                                  minus_mat_id=minus_mat)
    raise ValueError(f"unknown csg op {obj.op}")
