import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from vnext_tpu.ops.hungarian import auction_lap, hungarian_match


@pytest.mark.parametrize("seed", range(5))
@pytest.mark.parametrize("k,q", [(3, 10), (8, 40), (20, 300)])
def test_auction_matches_scipy_objective(seed, k, q):
    rng = np.random.RandomState(seed)
    cost = rng.rand(k, q).astype(np.float32) * 10
    valid = np.ones(k, bool)
    assign = np.asarray(auction_lap(jnp.asarray(cost), jnp.asarray(valid)))
    # valid permutation
    assert (assign >= 0).all()
    assert len(set(assign.tolist())) == k
    ours = cost[np.arange(k), assign].sum()
    rows, cols = linear_sum_assignment(cost)
    ref = cost[rows, cols].sum()
    assert ours <= ref + k * 1e-3, f"auction {ours} vs scipy {ref}"


def test_auction_respects_valid_mask():
    rng = np.random.RandomState(0)
    cost = rng.rand(6, 12).astype(np.float32)
    valid = np.asarray([True, True, False, True, False, False])
    assign = np.asarray(auction_lap(jnp.asarray(cost), jnp.asarray(valid)))
    assert (assign[~valid] == -1).all()
    active = assign[valid]
    assert (active >= 0).all() and len(set(active.tolist())) == valid.sum()


def test_auction_prefers_obvious_assignment():
    cost = np.full((2, 5), 10.0, np.float32)
    cost[0, 3] = 0.0
    cost[1, 1] = 0.0
    assign = np.asarray(auction_lap(jnp.asarray(cost), jnp.ones(2, bool)))
    assert assign.tolist() == [3, 1]


def test_hungarian_match_outputs():
    cost = np.full((2, 4), 5.0, np.float32)
    cost[0, 2] = 0.0
    cost[1, 0] = 0.0
    a, sel, gfq = hungarian_match(jnp.asarray(cost), jnp.ones(2, bool))
    assert np.asarray(a).tolist() == [2, 0]
    assert np.asarray(sel).tolist() == [True, False, True, False]
    assert np.asarray(gfq)[2] == 0 and np.asarray(gfq)[0] == 1
