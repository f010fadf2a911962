"""Rect UV orientation + image-texture lookup parity.

Reference semantics: AARect.uv = ((p[a]-a0)/a_len, (p[b]-b0)/b_len) with axis
tuples yz->(a=y,b=z), xz->(a=x,b=z), xy->(a=x,b=y) (rect.rs:58-80, 94-99);
Image.color flips v, nearest-neighbor, edge clamp (image.rs:36-49). Boxes
delegate to their six AARect faces (box.rs:48-112), so rect parity covers
box faces too."""

import jax.numpy as jnp
import numpy as np

from raysnail_tpu import textures as texlib
from raysnail_tpu.camera import Ray
from raysnail_tpu.geometry import rects
from raysnail_tpu.prelude.vec import Vec3


def _ray(o, d):
    n = len(o)
    return Ray(
        origin=Vec3.from_array(jnp.asarray(o, jnp.float32)),
        direction=Vec3.from_array(jnp.asarray(d, jnp.float32)),
        time=jnp.zeros(n, jnp.float32),
    )


def test_rect_uv_all_orientations():
    # one rect per orientation, each with distinct bounds
    group = rects.RectGroup(
        k_axis=jnp.asarray([0, 1, 2], jnp.int32),       # YZ, XZ, XY
        k=jnp.asarray([5.0, -2.0, 3.0], jnp.float32),
        a0=jnp.asarray([1.0, 10.0, -4.0], jnp.float32),
        a1=jnp.asarray([3.0, 14.0, 0.0], jnp.float32),
        b0=jnp.asarray([0.0, -1.0, 2.0], jnp.float32),
        b1=jnp.asarray([8.0, 1.0, 4.0], jnp.float32),
        mat_id=jnp.asarray([0, 1, 2], jnp.int32),
        active=jnp.ones(3, bool),
    )
    # rays hitting known points on each rect, fired along the k axis
    # YZ rect (x=5): hit (5, y=2.5, z=6) -> u=(2.5-1)/2, v=(6-0)/8
    # XZ rect (y=-2): hit (x=11, -2, z=0.5) -> u=(11-10)/4, v=(0.5+1)/2
    # XY rect (z=3): hit (x=-1, y=3.5, 3) -> u=(-1+4)/4, v=(3.5-2)/2
    ray = _ray(
        [(0.0, 2.5, 6.0), (11.0, 4.0, 0.5), (-1.0, 3.5, 0.0)],
        [(1.0, 0.0, 0.0), (0.0, -1.0, 0.0), (0.0, 0.0, 1.0)],
    )
    h = rects.intersect(group, ray, 1e-3, 1e30)
    assert np.asarray(h.valid).all()
    np.testing.assert_array_equal(np.asarray(h.mat_id), [0, 1, 2])
    np.testing.assert_allclose(
        np.asarray(h.u), [1.5 / 2.0, 1.0 / 4.0, 3.0 / 4.0], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(h.v), [6.0 / 8.0, 1.5 / 2.0, 1.5 / 2.0], atol=1e-6)


def test_image_texture_v_flip_and_clamp():
    # 2x2 atlas image: row 0 (image TOP) = red|green, row 1 = blue|white
    img = np.asarray(
        [[[1, 0, 0], [0, 1, 0]],
         [[0, 0, 1], [1, 1, 1]]], np.float32)
    table = texlib.TextureTable(
        ttype=jnp.asarray([texlib.IMAGE], jnp.int32),
        color1=Vec3.full((0, 0, 0), (1,), jnp.float32),
        color2=Vec3.full((0, 0, 0), (1,), jnp.float32),
        scale=jnp.ones(1, jnp.float32),
        image_id=jnp.asarray([0], jnp.int32),
        depth=jnp.zeros(1, jnp.int32),
        atlas=jnp.asarray(img)[None],
        atlas_wh=jnp.asarray([[2, 2]], jnp.int32),
        perlin_id=jnp.zeros(1, jnp.int32),
        perlin_seed=None, perlin_is_vec=None, perlin_smooth=None,
    )
    tid = jnp.zeros(4, jnp.int32)
    # v=1 is the image TOP (v flipped, image.rs:38); u=0 left
    u = jnp.asarray([0.1, 0.9, 0.1, 0.9], jnp.float32)
    v = jnp.asarray([0.9, 0.9, 0.1, 0.1], jnp.float32)
    c = texlib.evaluate(table, tid, u, v, Vec3.zeros((4,), jnp.float32),
                        frozenset({texlib.IMAGE}))
    got = np.stack([np.asarray(c.x), np.asarray(c.y), np.asarray(c.z)], -1)
    np.testing.assert_allclose(
        got, [[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]], atol=1e-6)
    # edge clamp: u/v outside [0,1) stay on border pixels (image.rs:40-45)
    c2 = texlib.evaluate(table, tid[:1], jnp.asarray([1.5], jnp.float32),
                         jnp.asarray([-0.5], jnp.float32),
                         Vec3.zeros((1,), jnp.float32),
                         frozenset({texlib.IMAGE}))
    np.testing.assert_allclose(
        [float(c2.x[0]), float(c2.y[0]), float(c2.z[0])], [1, 1, 1], atol=1e-6)
