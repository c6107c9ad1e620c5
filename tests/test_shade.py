"""BSDF math unit + statistical tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcpt.render import shade as sh


def test_onb_orthonormal():
    rng = np.random.default_rng(0)
    n = rng.normal(size=(256, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=1, keepdims=True)
    t1, t2 = sh.build_onb(jnp.asarray(n))
    t1, t2 = np.asarray(t1), np.asarray(t2)
    for a, b in [(t1, t2), (t1, n), (t2, n)]:
        assert np.abs((a * b).sum(-1)).max() < 1e-5
    assert np.abs(np.linalg.norm(t1, axis=1) - 1).max() < 1e-5
    assert np.abs(np.linalg.norm(t2, axis=1) - 1).max() < 1e-5


def test_cosine_sampling_moments():
    """pdf = cosθ/π ⇒ E[cosθ] = 2/3, E[cos²θ] = 1/2."""
    k = jax.random.key(0)
    u = jax.random.uniform(k, (200_000, 2))
    n = jnp.tile(jnp.array([[0.0, 0, 1.0]]), (u.shape[0], 1))
    wi = np.asarray(sh.sample_cosine_hemisphere(n, u[:, 0], u[:, 1]))
    cos = wi[:, 2]
    assert (cos > 0).all()
    assert abs(cos.mean() - 2 / 3) < 3e-3
    assert abs((cos**2).mean() - 0.5) < 3e-3
    # unit length
    assert np.abs(np.linalg.norm(wi, axis=1) - 1).max() < 1e-4


def test_phong_sampling_moments():
    """pdf ∝ cos^Ns α ⇒ E[cos α] = (Ns+1)/(Ns+2)."""
    ns = 20.0
    k = jax.random.key(1)
    u = jax.random.uniform(k, (100_000, 2))
    r = jnp.tile(jnp.array([[0.0, 0, 1.0]]), (u.shape[0], 1))
    wi = np.asarray(
        sh.sample_phong_lobe(r, jnp.full((u.shape[0],), ns), u[:, 0], u[:, 1])
    )
    cosa = wi[:, 2]
    assert abs(cosa.mean() - (ns + 1) / (ns + 2)) < 2e-3


def test_mirror():
    n = jnp.array([[0.0, 0, 1.0]])
    d = jnp.array([[1.0, 0, -1.0]]) / np.sqrt(2)
    out = np.asarray(sh.mirror(n, d))[0]
    np.testing.assert_allclose(out, [1 / np.sqrt(2), 0, 1 / np.sqrt(2)], atol=1e-6)


def test_refract_and_tir():
    n = jnp.array([[0.0, 0, 1.0]])
    # normal incidence air→glass: straight through
    d = jnp.array([[0.0, 0, -1.0]])
    t, tir = sh.refract(n, d, jnp.array([1 / 1.5]))
    assert not bool(tir[0])
    np.testing.assert_allclose(np.asarray(t)[0], [0, 0, -1], atol=1e-6)
    # glass→air at 60° > critical angle (~41.8°): TIR
    s60, c60 = np.sin(np.pi / 3), np.cos(np.pi / 3)
    d2 = jnp.array([[s60, 0, -c60]])
    _, tir2 = sh.refract(n, d2, jnp.array([1.5]))
    assert bool(tir2[0])
    # Snell's law at 45° air→glass
    s45 = np.sin(np.pi / 4)
    d3 = jnp.array([[s45, 0, -s45]])
    t3, tir3 = sh.refract(n, d3, jnp.array([1 / 1.5]))
    assert not bool(tir3[0])
    sin_out = float(jnp.abs(t3[0, 0]))
    assert sin_out == pytest.approx(s45 / 1.5, abs=1e-6)


def test_schlick():
    # normal incidence → r0 = ((n-1)/(n+1))²
    f = float(sh.schlick_fresnel(jnp.array(1.0), jnp.array(1.5)))
    assert f == pytest.approx(0.04, abs=1e-3)
    # grazing → 1
    f = float(sh.schlick_fresnel(jnp.array(0.0), jnp.array(1.5)))
    assert f == pytest.approx(1.0, abs=1e-6)


def test_eval_bsdf_diffuse():
    from mcpt import types as T

    mats = T.materials_from_numpy(
        [T.DIFFUSE], [[0.6, 0.6, 0.6]], [[0] * 3], [[0] * 3], [0], [1]
    )
    n = jnp.array([[0.0, 0, 1.0]])
    wo = jnp.array([[0.0, 0, 1.0]])
    wi = jnp.array([[0.0, 0.6, 0.8]])
    f, pdf = sh.eval_bsdf(mats, jnp.array([0]), n, wo, wi)
    np.testing.assert_allclose(np.asarray(f)[0], [0.6 / np.pi] * 3, rtol=1e-5)
    assert float(pdf[0]) == pytest.approx(0.8 / np.pi, rel=1e-5)
    # below horizon: zero
    f2, pdf2 = sh.eval_bsdf(mats, jnp.array([0]), n, wo, -wi)
    assert float(f2[0, 0]) == 0.0 and float(pdf2[0]) == 0.0
