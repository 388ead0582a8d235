"""Planner factorization (mirrors ``Autosort::new``, ``autosort/mod.rs:104-134``)."""

import numpy as np
import pytest

from fourier_tpu.plan import factorize_autosort, next_power_of_two


def test_schedule_examples():
    # One leading radix-4 stage, then greedy 8s, 4s, 3s, 2s.
    assert factorize_autosort(1) == []
    assert factorize_autosort(2) == [2]
    assert factorize_autosort(3) == [3]
    assert factorize_autosort(4) == [4]
    assert factorize_autosort(8) == [4, 2]
    assert factorize_autosort(16) == [4, 4]
    assert factorize_autosort(32) == [4, 8]
    assert factorize_autosort(64) == [4, 8, 2]
    assert factorize_autosort(4096) == [4, 8, 8, 8, 2]
    assert factorize_autosort(243) == [3, 3, 3, 3, 3]
    assert factorize_autosort(12) == [4, 3]
    assert factorize_autosort(6) == [3, 2]


def test_non_factorable():
    for n in (5, 7, 125, 625, 3125, 191, 439, 1013, 222, 722, 1418):
        # 222 = 2*3*37, 722 = 2*19^2, 1418 = 2*709 — composite but not 2^a*3^b.
        if n in (222, 722, 1418):
            assert factorize_autosort(n) is None
        else:
            assert factorize_autosort(n) is None


def test_product_invariant():
    for n in range(1, 2000):
        stages = factorize_autosort(n)
        if stages is not None:
            assert int(np.prod(stages, initial=1)) == n
            # factorable exactly when n = 2^a * 3^b
            m = n
            while m % 2 == 0:
                m //= 2
            while m % 3 == 0:
                m //= 3
            assert m == 1
        else:
            m = n
            while m % 2 == 0:
                m //= 2
            while m % 3 == 0:
                m //= 3
            assert m != 1


def test_invalid_size():
    with pytest.raises(ValueError):
        factorize_autosort(0)
    with pytest.raises(ValueError):
        factorize_autosort(-3)


def test_next_power_of_two():
    assert next_power_of_two(1) == 1
    assert next_power_of_two(2) == 2
    assert next_power_of_two(3) == 4
    assert next_power_of_two(145) == 256
    # Bluestein inner size for n=73: next_pow2(145) = 256 (bluesteins.rs:110)
