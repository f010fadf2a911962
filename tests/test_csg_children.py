"""CSG over arbitrary hittables: mesh and rect children.

The reference composes any Arc<dyn Hittable> (intersection.rs:19-23); for
rects and triangle meshes the child semantics are contains() = false
(rect.rs:122-125, triangle_mesh.rs:133-136) and hit.t2 = f64::MAX
(rect.rs:118, triangle_mesh.rs:119-126). These tests pin that behavior.
"""

import jax.numpy as jnp
import numpy as np

from raysnail_tpu import ir
from raysnail_tpu.camera import Ray
from raysnail_tpu.prelude.vec import Vec3
from raysnail_tpu.scene import SceneBuilder
from raysnail_tpu.scenes.meshes import uv_sphere


def _rays(origins, directions):
    o = Vec3.from_array(jnp.asarray(origins, jnp.float32))
    d = Vec3.from_array(jnp.asarray(directions, jnp.float32)).unit()
    return Ray(origin=o, direction=d, time=jnp.zeros(o.x.shape, jnp.float32))


def _tree_for(obj):
    b = SceneBuilder()
    b.add(obj)
    scene = b.compile()
    assert len(scene.csg_trees) == 1
    return scene.csg_trees[0]


def test_csg_mesh_intersection_box():
    """Intersection(mesh-shell, left-half box): the mesh surface is visible
    only where the box contains it; elsewhere the CSG yields no hit."""
    v, f, n = uv_sphere(24, 32)
    tree = _tree_for(ir.Csg(
        op="intersection",
        left=ir.Mesh(vertices=v, indices=f, normals=n,
                     material=ir.Lambertian(ir.Constant((0.8, 0.2, 0.2)))),
        right=ir.Box((-2.0, -2.0, -2.0), (-0.05, 2.0, 2.0)),
    ))
    # ray A: toward a point on the LEFT half (x<0) -> mesh surface visible
    # ray B: toward the RIGHT half (x>0) -> hit point outside the box -> miss
    rays = _rays([(-0.5, 0.0, 5.0), (0.5, 0.0, 5.0)],
                 [(0.0, 0.0, -1.0), (0.0, 0.0, -1.0)])
    h = tree.hit(rays, 1e-3, 1e9)
    valid = np.asarray(h.valid)
    assert valid[0] and not valid[1]
    # the left-half hit is the mesh front surface near z = sqrt(1 - 0.25)
    t1 = float(np.asarray(h.t1)[0])
    assert abs(t1 - (5.0 - np.sqrt(0.75))) < 0.05  # faceted sphere tolerance
    # t2 is the reference's f64::MAX analogue (triangle hits are shells)
    assert float(np.asarray(h.t2)[0]) > 1e8


def test_csg_rect_intersection_box():
    """Intersection(box, rect-inside-box): the rect plane is the visible
    surface for rays that cross it inside the box (contains()=false makes
    the rect a shell; the box's containment selects the far=rect hit)."""
    tree = _tree_for(ir.Csg(
        op="intersection",
        left=ir.Box((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0)),
        right=ir.Rect(k_axis=2, k=0.0, a0=-0.5, a1=0.5, b0=-0.5, b1=0.5,
                      material=ir.Lambertian(ir.Constant((0.2, 0.8, 0.2)))),
    ))
    rays = _rays([(0.0, 0.0, 5.0),     # crosses the rect at (0,0,0)
                  (0.75, 0.75, 5.0)],  # inside the box, outside rect bounds
                 [(0.0, 0.0, -1.0), (0.0, 0.0, -1.0)])
    h = tree.hit(rays, 1e-3, 1e9)
    valid = np.asarray(h.valid)
    assert valid[0] and not valid[1]
    np.testing.assert_allclose(float(np.asarray(h.t1)[0]), 5.0, atol=1e-4)
    # uv at the rect center is (0.5, 0.5)
    np.testing.assert_allclose(
        [float(np.asarray(h.u)[0]), float(np.asarray(h.v)[0])], [0.5, 0.5],
        atol=1e-5)


def test_csg_rect_blocks_difference():
    """Difference(box - rect) with the rect in FRONT of the box: the
    reference's case analysis (difference.rs:57-106) yields NO hit (minus
    valid, not plus-first, minus.t2=MAX never re-enters) — pinned here."""
    tree = _tree_for(ir.Csg(
        op="difference",
        left=ir.Box((-1.0, -1.0, -1.0), (1.0, 1.0, 1.0),
                    material=ir.Lambertian(ir.Constant((0.5, 0.5, 0.5)))),
        right=ir.Rect(k_axis=2, k=2.0, a0=-3.0, a1=3.0, b0=-3.0, b1=3.0),
    ))
    rays = _rays([(0.0, 0.0, 5.0), (0.0, 4.0, 5.0)],
                 [(0.0, 0.0, -1.0), (0.0, 0.0, -1.0)])
    h = tree.hit(rays, 1e-3, 1e9)
    valid = np.asarray(h.valid)
    assert not valid[0]   # rect occludes per the case analysis
    assert not valid[1]   # plain miss


def test_csg_mesh_renders_in_scene():
    """End-to-end: a CSG(mesh ∩ box) inside a full scene render."""
    from raysnail_tpu.camera import build_camera
    from raysnail_tpu.config import RenderConfig
    from raysnail_tpu.render import render

    v, f, n = uv_sphere(12, 16)
    b = SceneBuilder()
    b.add(ir.Csg(
        op="intersection",
        left=ir.Mesh(vertices=v, indices=f, normals=n,
                     material=ir.Lambertian(ir.Constant((0.8, 0.3, 0.2)))),
        right=ir.Box((-2.0, -2.0, -2.0), (0.0, 2.0, 2.0)),
    ))
    b.set_background((0.6, 0.7, 0.9))
    cfg = RenderConfig(width=32, height=24, samples=4, max_depth=3)
    cam = build_camera(look_from=(0, 0, 4), look_at=(0, 0, 0), fov=40,
                       width=cfg.width, height=cfg.height)
    img = render(b.compile(), cam, cfg, seed=3)
    assert np.isfinite(img).all()
    # left half shows the red mesh; the right half is pure background
    left = img[:, : cfg.width // 2]
    right = img[:, cfg.width // 2 + 2:]
    assert left[..., 0].max() > 0.5
    bg = np.asarray([0.6, 0.7, 0.9]) ** 0.5  # gamma
    assert np.abs(right - bg).max() < 0.05
