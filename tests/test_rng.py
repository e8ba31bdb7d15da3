import numpy as np

from crawler_spark import rng


def test_deterministic_and_batch_invariant():
    a = rng.u01(42, np.arange(100), 3, 0)
    b = rng.u01(42, np.arange(100), 3, 0)
    assert np.array_equal(a, b)
    # slicing the batch gives the same per-element values
    c = rng.u01(42, np.arange(50, 100), 3, 0)
    assert np.array_equal(a[50:], c)


def test_uniformity_rough():
    u = rng.u01(7, np.arange(200_000), 0, 0)
    assert 0.0 <= u.min() and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 0.005
    # coin at alpha=0.85 stops ~15% of the time
    assert abs((u > 0.85).mean() - 0.15) < 0.005


def test_randint_bounds_and_spread():
    n = 7
    r = rng.randint(n, 1, np.arange(100_000), 2, 1)
    assert r.min() >= 0 and r.max() < n
    counts = np.bincount(r, minlength=n) / len(r)
    assert np.abs(counts - 1 / n).max() < 0.01


def test_streams_independent():
    a = rng.u01(42, 5, 1, 0)
    b = rng.u01(42, 5, 1, 1)
    assert a != b
