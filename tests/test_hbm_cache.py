"""HBM-resident hot-feature cache (GPUCache analog) tests."""
import numpy as np
import jax.numpy as jnp

from dgl_tpu.graphbolt import HBMFeatureCache, NumpyFeature


def _feat(n=200, f=8, seed=0):
    return NumpyFeature(
        np.random.default_rng(seed).normal(size=(n, f)).astype(np.float32))


def test_read_batch_matches_direct():
    fb = _feat()
    cache = HBMFeatureCache(fb, hot_ids=np.arange(0, 200, 3))
    ids = np.random.default_rng(1).integers(0, 200, 64)
    out = np.asarray(cache.read_batch(ids))
    np.testing.assert_allclose(out, fb.read(ids), rtol=1e-6)


def test_hit_miss_accounting():
    fb = _feat()
    cache = HBMFeatureCache(fb, hot_ids=np.arange(100))  # first half hot
    cache.read_batch(np.arange(50))          # all hits
    assert cache.hits == 50 and cache.misses == 0
    cache.read_batch(np.arange(150, 200))    # all misses
    assert cache.misses == 50
    assert abs(cache.hit_rate() - 0.5) < 1e-9


def test_from_degrees_pins_top_degree():
    fb = _feat()
    deg = np.zeros(200)
    deg[[5, 17, 99]] = [10, 30, 20]
    cache = HBMFeatureCache.from_degrees(fb, deg, capacity=3)
    assert set(cache._hot_sorted.tolist()) == {5, 17, 99}
    cache.read_batch(np.asarray([17, 99, 5]))
    assert cache.misses == 0


def test_all_miss_and_all_hit_paths():
    fb = _feat()
    cache = HBMFeatureCache(fb, hot_ids=np.asarray([0]))
    ids = np.asarray([1, 2, 3])
    np.testing.assert_allclose(np.asarray(cache.read_batch(ids)),
                               fb.read(ids), rtol=1e-6)
    ids = np.asarray([0, 0])
    np.testing.assert_allclose(np.asarray(cache.read_batch(ids)),
                               fb.read(ids), rtol=1e-6)


def test_feature_api_passthrough():
    fb = _feat()
    cache = HBMFeatureCache(fb, hot_ids=np.arange(10))
    assert cache.size() == (8,)
    assert cache.count() == 200
    np.testing.assert_allclose(np.asarray(cache.read()), fb.read())
