"""LBVH builder invariants (layout contract of ``BVH/hlbvh.cpp:164-193``)."""

import jax
import numpy as np
import pytest

from mcpt.bvh import lbvh


def random_tris(n, seed=0, scale=10.0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-scale, scale, (n, 1, 3))
    offs = rng.uniform(-0.5, 0.5, (n, 3, 3))
    return (base + offs).astype(np.float32)


def test_expand_bits():
    import jax.numpy as jnp

    # bit i of input lands at bit 3i of output
    v = lbvh.expand_bits_10(jnp.array([0b1111111111], dtype=jnp.uint32))
    assert int(v[0]) == 0b1001001001001001001001001001
    v = lbvh.expand_bits_10(jnp.array([1, 2, 4], dtype=jnp.uint32))
    assert [int(x) for x in v] == [1, 8, 64]


def test_morton_ordering():
    import jax.numpy as jnp

    # points along the diagonal get increasing codes
    pts = jnp.stack([jnp.linspace(0, 0.999, 16)] * 3, axis=1)
    codes = np.asarray(lbvh.morton30(pts))
    assert (np.diff(codes) > 0).all()


@pytest.mark.parametrize("n", [2, 3, 7, 64, 257])
def test_build_invariants(n):
    verts = random_tris(n, seed=n)
    bvh = lbvh.build_lbvh(jax.numpy.asarray(verts))
    assert bvh.n_nodes == 2 * n - 1
    res = lbvh.validate_bvh(bvh, verts)
    assert res["ok"], res["errors"][:5]


def test_build_single_triangle():
    verts = random_tris(1)
    bvh = lbvh.build_lbvh(jax.numpy.asarray(verts))
    assert bvh.n_nodes == 1
    assert int(bvh.parent[0]) == -1


def test_duplicate_positions():
    """Identical centroids ⇒ equal Morton codes; the position tiebreak must keep
    the topology a valid binary tree (the reference relies on its radix sort
    stability for the same case)."""
    one = random_tris(1, seed=3)
    verts = np.repeat(one, 33, axis=0)
    bvh = lbvh.build_lbvh(jax.numpy.asarray(verts))
    res = lbvh.validate_bvh(bvh, verts)
    assert res["ok"], res["errors"][:5]


def test_root_bbox_covers_scene():
    verts = random_tris(100, seed=5)
    bvh = lbvh.build_lbvh(jax.numpy.asarray(verts))
    np.testing.assert_allclose(
        np.asarray(bvh.bbmin[0]), verts.reshape(-1, 3).min(0), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(bvh.bbmax[0]), verts.reshape(-1, 3).max(0), atol=1e-5
    )
