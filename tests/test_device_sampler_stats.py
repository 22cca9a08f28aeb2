"""Statistical validation of the on-device sampler's pick distributions
(round-3 verdict weak #10): quantify mode="unique"'s deviation from true
without-replacement sampling in the critical regime d ~ fanout, and pin
mode="exact" to the reference semantics
(``src/array/cpu/rowwise_pick.h:27-50``: every subset of size fanout
equally likely => inclusion probability fanout/d, always exactly fanout
distinct picks)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgl_tpu.sampling.device_sampler import _sample_level


def _star_graph(d):
    """Node 0 with in-neighbors 1..d (CSC)."""
    indptr = jnp.asarray(np.array([0, d]), jnp.int32)
    indices = jnp.asarray(np.arange(1, d + 1), jnp.int32)
    return indptr, indices


def _trials(d, fanout, mode, trials=4000):
    indptr, indices = _star_graph(d)
    frontier = jnp.zeros((1,), jnp.int32)

    @jax.jit
    def one(key):
        nbr, mask = _sample_level(key, indptr, indices, frontier,
                                  fanout, mode)
        return nbr[0], mask[0]

    keys = jax.random.split(jax.random.PRNGKey(0), trials)
    nbrs = np.zeros((trials, fanout), np.int64)
    masks = np.zeros((trials, fanout), bool)
    for i, k in enumerate(keys):
        n, m = one(k)
        nbrs[i] = np.asarray(n)
        masks[i] = np.asarray(m)
    return nbrs, masks


@pytest.mark.parametrize("d", [8, 12, 20, 40])
def test_unique_mode_distinct_count_matches_theory(d):
    """E[#distinct] for masked-duplicate sampling is d(1-(1-1/d)^f);
    the documented deficit vs exact (= f) is largest at d ~ f."""
    f = 10
    nbrs, masks = _trials(d, f, "unique")
    got = masks.sum(1).mean()
    if d <= f:
        expect = d  # take-all branch
    else:
        expect = d * (1 - (1 - 1 / d) ** f)
    assert abs(got - expect) < 0.15, (got, expect)
    # every kept pick is a real neighbor and distinct within its row
    for i in range(200):
        kept = nbrs[i][masks[i]]
        assert np.unique(kept).size == kept.size


@pytest.mark.parametrize("d", [11, 12, 15, 25, 40])
def test_exact_mode_is_true_without_replacement(d):
    """mode='exact': always exactly fanout distinct picks; per-neighbor
    inclusion frequency == fanout/d (chi-square-level tolerance)."""
    f = 10
    nbrs, masks = _trials(d, f, "exact")
    assert masks.all()
    counts = np.zeros(d + 1, np.int64)
    for i in range(nbrs.shape[0]):
        row = nbrs[i]
        assert np.unique(row).size == f, row  # distinct
        counts[row] += 1
    p = counts[1:] / nbrs.shape[0]  # inclusion frequency per neighbor
    expect = f / d
    se = np.sqrt(expect * (1 - expect) / nbrs.shape[0])
    assert np.abs(p - expect).max() < 5 * se + 0.01, (p, expect)


def test_exact_mode_take_all_small_degree():
    nbrs, masks = _trials(4, 10, "exact")
    assert (masks.sum(1) == 4).all()
    assert (np.sort(nbrs[:, :4], axis=1) == np.arange(1, 5)).all()


def test_exact_mode_marginal_uniform_pairs():
    """Pairwise inclusion should match without-replacement (negative
    association), not independent-with-replacement: P(i and j both
    picked) = f(f-1)/(d(d-1))."""
    d, f = 15, 10
    nbrs, _ = _trials(d, f, "exact", trials=4000)
    both = 0
    for i in range(nbrs.shape[0]):
        s = set(nbrs[i].tolist())
        both += (1 in s) and (2 in s)
    p = both / nbrs.shape[0]
    expect = f * (f - 1) / (d * (d - 1))
    assert abs(p - expect) < 0.035, (p, expect)


def test_sampler_accepts_exact_mode():
    from dgl_tpu.sampling import DeviceNeighborSampler

    s = DeviceNeighborSampler([5, 5], mode="exact")
    indptr, indices = _star_graph(30)
    # two-layer sample runs under jit (all frontier nodes beyond the seed
    # have degree 0 here — masked)
    mfg = jax.jit(s.sample)(jax.random.PRNGKey(0),
                            jnp.asarray(np.array([0, 30]), jnp.int32),
                            indices, jnp.zeros((4,), jnp.int32))
    assert mfg.num_layers == 2
    with pytest.raises(ValueError):
        DeviceNeighborSampler([5], mode="bogus")
