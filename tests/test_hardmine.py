import jax
import jax.numpy as jnp
import numpy as np

from r2l_tpu.hardmine import (init_pool, parse_hard_ratio, sample_hard,
                              update_pool)


def test_parse_hard_ratio():
    assert parse_hard_ratio("", 100) == (0, 0)
    assert parse_hard_ratio(0.2, 100) == (20, 20)
    assert parse_hard_ratio("0.2", 100) == (20, 20)
    assert parse_hard_ratio("0.1,0.3", 100) == (10, 30)
    assert parse_hard_ratio([0.1, 0.3], 100) == (10, 30)


def test_pool_fills_then_replaces(key):
    pool = init_pool(8, 3)
    assert int(pool.size) == 0
    # Fill in two chunks of 4.
    r1 = jnp.arange(12.0).reshape(4, 3)
    pool = update_pool(pool, r1, jnp.zeros((2,), jnp.int32))
    assert int(pool.size) == 4 and int(pool.ptr) == 4
    r2 = r1 + 100
    pool = update_pool(pool, r2, jnp.zeros((2,), jnp.int32))
    assert int(pool.size) == 8
    np.testing.assert_array_equal(np.asarray(pool.rays[:4]), np.asarray(r1))
    np.testing.assert_array_equal(np.asarray(pool.rays[4:]), np.asarray(r2))
    # Full: new rays land in the sampled slots.
    r3 = jnp.full((2, 3), -1.0)
    pool = update_pool(pool, r3, jnp.array([1, 6], jnp.int32))
    assert int(pool.size) == 8
    np.testing.assert_array_equal(np.asarray(pool.rays[1]), [-1, -1, -1])
    np.testing.assert_array_equal(np.asarray(pool.rays[6]), [-1, -1, -1])


def test_sample_hard_fallback_when_empty(key):
    pool = init_pool(8, 3)
    fallback = jnp.arange(9.0).reshape(3, 3)
    rays, idx = sample_hard(pool, key, 2, fallback)
    np.testing.assert_array_equal(np.asarray(rays), np.asarray(fallback[:2]))


def test_sample_hard_uses_pool_only_when_full(key):
    """Until the pool is full the fresh fallback is used (reference only
    samples the pool once it reaches capacity, `main.py:1339`); once full,
    draws are distinct slots (without replacement, `main.py:1340-1341`)."""
    pool = init_pool(8, 3)
    pool = update_pool(pool, jnp.ones((4, 3)) * 7, jnp.zeros((1,), jnp.int32))
    fallback = jnp.full((4, 3), 2.0)
    rays, _ = sample_hard(pool, key, 4, fallback)
    np.testing.assert_array_equal(np.asarray(rays), np.asarray(fallback))

    pool = update_pool(pool, jnp.ones((4, 3)) * 9, jnp.zeros((1,), jnp.int32))
    assert int(pool.size) == 8
    for k in jax.random.split(key, 5):
        rays, idx = sample_hard(pool, k, 4, fallback)
        assert len(set(np.asarray(idx).tolist())) == 4  # no replacement
        assert set(np.unique(np.asarray(rays))) <= {7.0, 9.0}


def test_sample_hard_stratified_distinct_and_uniform(key):
    """Stratified mode: n distinct in-range slots, one per stratum,
    shuffled (so update_pool's first-n_in replacement isn't biased to
    low strata), and every slot reachable across keys. Exercises a
    capacity NOT divisible by n (remainder strata)."""
    cap, n = 37, 8            # base=4, rem=5 -> strata sizes 5,5,5,5,5,4,4,4
    pool = init_pool(cap, 3)
    pool = pool._replace(rays=jnp.arange(cap * 3.0).reshape(cap, 3),
                         size=jnp.asarray(cap, jnp.int32))
    fallback = jnp.zeros((n, 3))
    seen = set()
    sortedness = 0
    for k in jax.random.split(key, 64):
        rays, idx = sample_hard(pool, k, n, fallback, mode="stratified")
        ids = np.asarray(idx).tolist()
        assert len(set(ids)) == n                       # distinct
        assert min(ids) >= 0 and max(ids) < cap         # in range
        # one per stratum: stratum starts are 0,5,10,15,20,25,29,33
        starts = [0, 5, 10, 15, 20, 25, 29, 33]
        ends = starts[1:] + [cap]
        for lo, hi in zip(starts, ends):
            assert sum(lo <= i < hi for i in ids) == 1
        # picked rays really come from those slots
        np.testing.assert_array_equal(np.asarray(rays),
                                      np.asarray(pool.rays)[ids])
        seen.update(ids)
        sortedness += ids == sorted(ids)
    assert seen == set(range(cap))                      # full coverage
    assert sortedness <= 2                              # shuffled order


def test_sample_hard_permutation_mode_matches_reference_draw(key):
    """mode='permutation' keeps the reference's exact uniform-subset
    semantics (`main.py:1340-1341`)."""
    pool = init_pool(8, 3)
    pool = pool._replace(rays=jnp.arange(24.0).reshape(8, 3),
                         size=jnp.asarray(8, jnp.int32))
    rays, idx = sample_hard(pool, key, 4, jnp.zeros((4, 3)),
                            mode="permutation")
    want = jax.random.permutation(key, 8)[:4]
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(want))


def test_update_pool_jit_donation():
    pool = init_pool(16, 9)

    @jax.jit
    def step(p, rays, idx):
        return update_pool(p, rays, idx)

    pool = step(pool, jnp.ones((4, 9)), jnp.zeros((2,), jnp.int32))
    assert int(pool.size) == 4
