"""Mandelbulb distance field: trig-free DE vs the literal reference formula,
and sphere-traced hits (reference: src/hittable/geometry/raymarching.rs)."""

import jax.numpy as jnp
import numpy as np

from raysnail_tpu.geometry import mandelbulb as mb
from raysnail_tpu.camera import Ray
from raysnail_tpu.prelude.vec import Vec3


def _vec(a):
    return Vec3.from_array(jnp.asarray(a, jnp.float32))


def test_distance_est_matches_trig_formula(rng_np):
    # points spanning inside, near-surface, and outside the r=1.3 bound
    pts = rng_np.uniform(-1.5, 1.5, (4096, 3)).astype(np.float32)
    # include axis-degenerate points (rho = 0) where arctan2 conventions matter
    pts[:8, 0:2] = 0.0
    pts[8] = (0.0, 0.0, 0.0)
    p = _vec(pts)
    de_poly, inside_poly = mb.distance_est(p)
    de_trig, inside_trig = mb.distance_est_trig(p)
    ip, it = np.asarray(inside_poly), np.asarray(inside_trig)
    # points that straddle the bailout under f32 rounding may flip their
    # escape iteration (the orbit is chaotic); require near-total agreement
    agree = ip == it
    assert agree.mean() > 0.995, agree.mean()
    dp = np.asarray(de_poly)[agree]
    dt = np.asarray(de_trig)[agree]
    rel = np.abs(dp - dt) / np.maximum(np.abs(dt), 1e-6)
    assert np.median(rel) < 1e-4, np.median(rel)
    assert np.quantile(rel, 0.99) < 1e-2, np.quantile(rel, 0.99)
    # the axis-degenerate points are not chaotic: exact-path agreement
    np.testing.assert_allclose(np.asarray(de_poly)[:9], np.asarray(de_trig)[:9],
                               rtol=1e-4)


def test_hit_and_miss():
    node = mb.MandelbulbNode(mat_id=0)
    o = _vec(np.asarray([[3.0, 0.0, 0.0], [3.0, 0.0, 0.0]]))
    d = _vec(np.asarray([[-1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]))  # toward / away
    h = node.hit(Ray(origin=o, direction=d, time=jnp.zeros(2, jnp.float32)),
                 1e-3, 1e30)
    valid = np.asarray(h.valid)
    assert valid[0] and not valid[1]
    t = float(np.asarray(h.t)[0])
    # surface along +x axis lies inside the bounding radius 1.3
    assert 3.0 - 1.3 <= t <= 3.0
    n = np.asarray(h.normal.to_array())[0]
    assert n[0] > 0.5  # outward-facing normal roughly +x
