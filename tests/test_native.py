"""Native C++ tier (mcpt/native): parity with the pure-Python implementations.

The library is built on demand (``make -C mcpt/native``); tests skip when no
toolchain is available.
"""

import os
import textwrap

import numpy as np
import pytest

from mcpt import native

pytestmark = pytest.mark.skipif(
    not native.ensure_built(), reason="native toolchain unavailable"
)


@pytest.fixture
def obj_dir(tmp_path):
    (tmp_path / "m.mtl").write_text(
        textwrap.dedent(
            """
            newmtl red
            Kd 0.9 0.1 0.1
            newmtl lamp
            Ka 5 5 5
            newmtl glass
            Ni 1.5
            newmtl shiny
            Ks 1 1 1
            Ns 50
            Kd .2 .2 .2
            """
        )
    )
    (tmp_path / "s.obj").write_text(
        textwrap.dedent(
            """
            mtllib m.mtl
            v 0 0 0
            v 1 0 0
            v 1 1 0
            v 0 1 0
            usemtl red
            f 1 2 3 4
            usemtl shiny
            f 1/1 2/2 3/3
            usemtl glass
            f -4 -3 -2
            """
        )
    )
    return str(tmp_path)


def test_loader_parity(obj_dir):
    from mcpt.io.objloader import load_object

    a = load_object(obj_dir, "s.obj", use_native="never")
    b = native.load_object_native(obj_dir, "s.obj")
    np.testing.assert_array_equal(a.verts, b.verts)
    np.testing.assert_array_equal(a.mat_id, b.mat_id)
    np.testing.assert_array_equal(a.mtype, b.mtype)
    np.testing.assert_allclose(a.kd, b.kd)
    np.testing.assert_allclose(a.ks, b.ks)
    np.testing.assert_allclose(a.ka, b.ka)
    np.testing.assert_allclose(a.ns, b.ns)
    np.testing.assert_allclose(a.ni, b.ni)


def test_loader_missing_file(obj_dir):
    with pytest.raises(FileNotFoundError):
        native.load_object_native(obj_dir, "nope.obj")


@pytest.mark.parametrize("n", [2, 33, 500])
def test_lbvh_topology_matches_jax(n):
    import jax.numpy as jnp

    from mcpt.bvh import lbvh
    from mcpt.types import BVH
    from tests.test_lbvh import random_tris

    verts = random_tris(n, seed=n + 7)
    bvh_j = lbvh.build_lbvh(jnp.asarray(verts))
    bbmin, bbmax, left, right, parent = native.build_lbvh_native(verts)
    np.testing.assert_array_equal(np.asarray(bvh_j.left), left)
    np.testing.assert_array_equal(np.asarray(bvh_j.right), right)
    np.testing.assert_array_equal(np.asarray(bvh_j.parent), parent)
    np.testing.assert_allclose(np.asarray(bvh_j.bbmin), bbmin, atol=1e-5)
    bvh_n = BVH(jnp.asarray(bbmin), jnp.asarray(bbmax), jnp.asarray(left),
                jnp.asarray(right), jnp.asarray(parent))
    res = lbvh.validate_bvh(bvh_n, verts)
    assert res["ok"], res["errors"][:3]


def test_native_treelet_improves_and_valid():
    import jax.numpy as jnp

    from mcpt.bvh import lbvh, metrics
    from mcpt.types import BVH
    from tests.test_lbvh import random_tris

    verts = random_tris(300, seed=42, scale=3.0)
    bbmin, bbmax, left, right, parent = native.build_lbvh_native(verts)
    # copy: jnp.asarray is zero-copy on CPU and the native optimizer mutates
    bvh0 = BVH(jnp.array(bbmin), jnp.array(bbmax), jnp.array(left),
               jnp.array(right), jnp.array(parent))
    s0 = metrics.sah(bvh0)
    native.treelet_optimize_native(bbmin, bbmax, left, right, parent)
    bvh1 = BVH(jnp.asarray(bbmin), jnp.asarray(bbmax), jnp.asarray(left),
               jnp.asarray(right), jnp.asarray(parent))
    s1 = metrics.sah(bvh1)
    assert s1 <= s0 + 1e-4
    res = lbvh.validate_bvh(bvh1, verts)
    assert res["ok"], res["errors"][:3]
    # exact agreement with the numpy implementation (same algorithm)
    from mcpt.bvh import treelet

    s_py = metrics.sah(treelet.optimize_treelets(bvh0, use_native="never"))
    assert abs(s1 - s_py) < 1e-3 * s_py
