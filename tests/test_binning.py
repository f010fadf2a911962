"""Supertile ray binning (ops/binning.py): the one-hot MXU permutation must
round-trip exactly and the binned traversal must equal the plain one."""

import jax.numpy as jnp
import numpy as np
import pytest

from raysnail_tpu import ir
from raysnail_tpu.camera import Ray
from raysnail_tpu.geometry import triangles
from raysnail_tpu.ops import binning
from raysnail_tpu.prelude.vec import Vec3
from raysnail_tpu.scene import _build_triangles
from raysnail_tpu.scenes.meshes import uv_sphere

TMIN, TMAX = jnp.float32(1e-3), jnp.float32(1e30)


def test_perm_round_trip_exact():
    rng_np = np.random.default_rng(11)
    n = 2 * binning.B
    key = jnp.asarray(rng_np.integers(0, binning.N_KEYS, n), jnp.int32)
    x = [jnp.asarray(rng_np.standard_normal(n), jnp.float32)
         for _ in range(5)]
    p = binning.perm(key)
    # each row and column of P is one-hot (a real permutation)
    pm = np.asarray(p)
    np.testing.assert_array_equal(pm.sum(axis=1), 1.0)
    np.testing.assert_array_equal(pm.sum(axis=2), 1.0)
    y = binning.apply(p, x)
    # sorted keys are non-decreasing inside each supertile
    ks = np.asarray(binning.apply(p, [key.astype(jnp.float32)])[0])
    for g in range(n // binning.B):
        seg = ks[g * binning.B:(g + 1) * binning.B]
        assert (np.diff(seg) >= 0).all()
    back = binning.unapply(p, y)
    for a, b in zip(x, back):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_keys_modes():
    rng_np = np.random.default_rng(12)
    n = binning.B
    o = jnp.asarray(rng_np.uniform(-3, 3, (3, n)), jnp.float32)
    d = jnp.asarray(rng_np.standard_normal((3, n)), jnp.float32)
    cap = jnp.full((n,), 1e30, jnp.float32).at[:7].set(-1.0)
    bb = jnp.asarray([-1, -1, -1, 1, 1, 1], jnp.float32)
    for mode in ("entry", "dir", "miss", "entrydir"):
        nk = binning.MODE_KEYS[mode]
        k = binning.keys(o[0], o[1], o[2], d[0], d[1], d[2], cap, bb,
                         1e-3, mode)
        kn = np.asarray(k)
        assert ((kn >= 0) & (kn < nk)).all()
        assert (kn[:7] == nk - 1).all()  # dead lanes -> last bin


@pytest.mark.parametrize("mode", ["entry", "dir", "miss", "entrydir"])
def test_binned_traversal_matches_plain(mode):
    rng_np = np.random.default_rng(13)
    v, f, n = uv_sphere(10, 14, center=(0.0, 0.0, -3.0))
    spec = ir.Mesh(vertices=v, indices=f, normals=n)
    group = _build_triangles(
        [(spec, 0)], lambda a: jnp.asarray(np.asarray(a), jnp.float32))
    n_rays = 300  # exercises padding to TILE_R
    o = rng_np.uniform(-1, 1, (n_rays, 3)).astype(np.float32)
    d = rng_np.standard_normal((n_rays, 3)).astype(np.float32)
    d[:, 2] -= 2.0
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    ray = Ray(
        origin=Vec3.from_array(jnp.asarray(o)),
        direction=Vec3.from_array(jnp.asarray(d)),
        time=jnp.zeros(n_rays, jnp.float32),
    )
    h_pk = triangles.intersect_pallas(group, ray, TMIN, TMAX, interpret=True)
    h_bin = triangles.intersect_pallas(group, ray, TMIN, TMAX,
                                       interpret=True, bin_mode=mode)
    np.testing.assert_array_equal(np.asarray(h_pk.valid),
                                  np.asarray(h_bin.valid))
    np.testing.assert_array_equal(np.asarray(h_pk.t), np.asarray(h_bin.t))
    np.testing.assert_array_equal(np.asarray(h_pk.mat_id),
                                  np.asarray(h_bin.mat_id))
    np.testing.assert_array_equal(
        np.asarray(h_pk.normal.to_array()), np.asarray(h_bin.normal.to_array()))
