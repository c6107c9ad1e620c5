"""Unit tests for the hybrid engine's inter-bounce coherence sort keys.

The key layouts are the hybrid pipeline's main measured performance knob
(docs/PERF_NOTES.md r4 §3, r5 §6); these tests pin their structural
contracts — dead-rays-last, 31-bit range, grouping order per mode — on
the CPU, independent of any Pallas kernel.  Reference counterpart: the
reference has no inter-bounce sort at all (its wavefront re-reads global
ray state each bounce, ``kernels/intersection.cl``); the key machinery is
TPU-native design, tested TPU-natively.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from mcpt.pallas.cluster_megakernel import _hybrid_sort_key, resolve_key_mode

KEY_MODES = ("cell", "dir", "dir6", "dir9")


def _keys(key_mode, n=64, seed=0, coarse_bits=6, alive=None):
    rng = np.random.default_rng(seed)
    o = rng.uniform(0.0, 10.0, (3, n)).astype(np.float32)
    d = rng.uniform(-1.0, 1.0, (3, n)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    if alive is None:
        alive = (rng.uniform(size=n) > 0.3).astype(np.float32)
    bb_lo = jnp.zeros(3, jnp.float32)
    bb_inv = jnp.full(3, 0.1, jnp.float32)
    k = _hybrid_sort_key(
        jnp.asarray(o[0]), jnp.asarray(o[1]), jnp.asarray(o[2]),
        jnp.asarray(d[0]), jnp.asarray(d[1]), jnp.asarray(d[2]),
        jnp.asarray(alive), bb_lo, bb_inv, coarse_bits, key_mode,
    )
    return np.asarray(k), alive, o, d


@pytest.mark.parametrize("key_mode", KEY_MODES)
def test_dead_rays_sort_last(key_mode):
    k, alive, _, _ = _keys(key_mode)
    dead = alive < 0.5
    assert np.all(k[dead] == 0x7FFFFFFF)
    # every live key sorts strictly before the dead sentinel
    assert np.all(k[~dead] < 0x7FFFFFFF)


@pytest.mark.parametrize("key_mode", KEY_MODES)
def test_keys_are_nonnegative_int32(key_mode):
    # int32 sort keys must not wrap negative (lax.sort would misorder)
    k, _, _, _ = _keys(key_mode, n=256, seed=1)
    assert k.dtype == np.int32
    assert np.all(k >= 0)


def test_dir_modes_group_by_direction_first():
    # two rays sharing one origin cell but opposite directions must land in
    # different top-level groups under dir/dir6/dir9, the SAME group under
    # cell's top bits (direction only appears below the coarse origin bits)
    o = jnp.asarray([[5.0, 5.0], [5.0, 5.0], [5.0, 5.0]], jnp.float32)
    d = jnp.asarray([[1.0, -1.0], [0.0, 0.0], [0.0, 0.0]], jnp.float32)
    alive = jnp.ones(2, jnp.float32)
    bb_lo = jnp.zeros(3, jnp.float32)
    bb_inv = jnp.full(3, 0.1, jnp.float32)
    coarse_bits = 6
    out = {}
    for mode in KEY_MODES:
        out[mode] = np.asarray(_hybrid_sort_key(
            o[0], o[1], o[2], d[0], d[1], d[2], alive, bb_lo, bb_inv,
            coarse_bits, mode))
    # cell: coarse origin bits are the top bits — identical origins share them
    fine_bits = min(30 - coarse_bits, 12)
    assert (out["cell"][0] >> (3 + fine_bits)) == (out["cell"][1] >> (3 + fine_bits))
    # dir modes: the direction field sits above (coarse_bits + fine_bits)
    # = 18 bits in all three layouts — opposite x directions must differ there
    for mode in ("dir", "dir6", "dir9"):
        assert (out[mode][0] >> 18) != (out[mode][1] >> 18), mode


def test_dir9_key_fits_31_bits_at_max_coarse():
    # dir9 shrinks fine bits to keep (9 + coarse + fine) <= 30; verify no
    # overflow at the largest coarse_bits the CLI exposes
    for cb in (6, 9, 12):
        k, _, _, _ = _keys("dir9", n=512, seed=2, coarse_bits=cb)
        assert np.all(k >= 0)
        assert np.all(k <= 0x7FFFFFFF)


def test_resolve_key_mode_auto():
    # pilot says rays survive deep (closed interior) -> direction-first
    assert resolve_key_mode("auto", (1.0,) * 7) == "dir6"
    assert resolve_key_mode("auto", (0.95, 0.9, 0.85, 0.8)) == "dir6"
    # rays die fast (open scene) -> origin-first
    assert resolve_key_mode("auto", (0.6, 0.3, 0.1)) == "cell"
    # no pilot in hand -> documented dir6 default (README "no-pilot" note)
    assert resolve_key_mode("auto", None) == "dir6"
    assert resolve_key_mode("auto", ()) == "dir6"
    # explicit modes pass through untouched
    for mode in KEY_MODES:
        assert resolve_key_mode(mode, (0.1,)) == mode
