"""Posterior alignment sampling (api.ctc_sample_alignments).

Oracle: O(V^T) enumeration of every frame path.  The sampler must (a) only
ever produce valid alignments (collapse == label), (b) report each draw's
exact path log-probability (pinned against a direct frame-sum), and (c)
reproduce the exact conditional distribution P(path | label) — pinned by
comparing empirical frequencies over a few thousand seeded draws against
the enumerated posterior within 5 sigma.  Deterministic PRNG: no flake.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_beam_search import _collapse_classic, _collapse_simplified
from tf_seq2seq_losses_tpu import ctc_sample_alignments


def _inputs(batch, num_t, vocab, seed=0):
    rand = np.random.RandomState(seed)
    lp = np.asarray(
        jax.nn.log_softmax(
            jnp.asarray(rand.randn(batch, num_t, vocab), jnp.float32), axis=2
        )
    )
    return lp


@pytest.mark.parametrize(
    "topology,collapse",
    [("classic", _collapse_classic), ("simplified", _collapse_simplified)],
)
def test_samples_are_valid_and_scored(topology, collapse):
    batch, num_t, vocab = 4, 6, 4
    lp = _inputs(batch, num_t, vocab, seed=3)
    labels = np.asarray([[1, 2], [1, 1], [3, 0], [2, 3]], np.int32)
    ll = np.asarray([2, 2, 1, 2], np.int32)
    gl = np.asarray([6, 6, 4, 5], np.int32)

    align, path_lp = jax.jit(
        lambda lp, key: ctc_sample_alignments(
            jnp.asarray(labels), lp, jnp.asarray(ll), jnp.asarray(gl), 0,
            key, num_samples=8, topology=topology,
        )
    )(jnp.asarray(lp), jax.random.PRNGKey(0))
    align, path_lp = np.asarray(align), np.asarray(path_lp)
    assert align.shape == (batch, 8, num_t)
    assert np.isfinite(path_lp).all()

    for b in range(batch):
        want = tuple(labels[b, : ll[b]])
        for s in range(8):
            path = align[b, s]
            # frames past logit_length are blank
            assert (path[gl[b]:] == 0).all()
            assert collapse(path[: gl[b]], 0) == want, (b, s, path)
            # reported log-prob == direct frame sum
            direct = sum(lp[b, t, path[t]] for t in range(gl[b]))
            np.testing.assert_allclose(path_lp[b, s], direct, atol=1e-4)


@pytest.mark.parametrize(
    "topology,collapse",
    [("classic", _collapse_classic), ("simplified", _collapse_simplified)],
)
def test_distribution_matches_enumeration(topology, collapse):
    """Empirical frequencies over 4000 draws match the exact conditional
    alignment posterior from enumeration (within 5 sigma per path)."""
    num_t, vocab = 4, 3
    lp = _inputs(1, num_t, vocab, seed=11)[0]
    label = (1, 2)

    paths, probs = [], []
    for path in itertools.product(range(vocab), repeat=num_t):
        if collapse(path, 0) == label:
            paths.append(path)
            probs.append(sum(lp[t, path[t]] for t in range(num_t)))
    assert len(paths) >= 3
    probs = np.exp(np.asarray(probs))
    cond = probs / probs.sum()

    n = 4000
    align, _ = ctc_sample_alignments(
        jnp.asarray([list(label)], jnp.int32),
        jnp.asarray(lp)[None],
        jnp.asarray([2], jnp.int32),
        jnp.asarray([num_t], jnp.int32),
        0,
        jax.random.PRNGKey(42),
        num_samples=n,
        topology=topology,
    )
    align = np.asarray(align)[0]  # [n, T]
    counts = {p: 0 for p in paths}
    for s in range(n):
        key = tuple(int(x) for x in align[s])
        assert key in counts, f"sampled an impossible path {key}"
        counts[key] += 1

    for p, want in zip(paths, cond):
        got = counts[p] / n
        sigma = np.sqrt(want * (1 - want) / n)
        assert abs(got - want) <= 5 * sigma + 1e-9, (
            p, got, want, 5 * sigma,
        )


def test_sampled_posteriors_match_analytic():
    """Cross-feature pin: the per-frame token histogram of FFBS draws must
    converge to the analytic ``ctc_token_posteriors`` (two independent code
    paths: marginalisation vs sampling)."""
    from tf_seq2seq_losses_tpu import ctc_token_posteriors

    num_t, vocab = 4, 3
    lp = _inputs(1, num_t, vocab, seed=8)
    labels = jnp.asarray([[1, 2]], jnp.int32)
    ll = jnp.asarray([2], jnp.int32)
    gl = jnp.asarray([num_t], jnp.int32)

    post = np.asarray(
        ctc_token_posteriors(labels, jnp.asarray(lp), ll, gl, 0)
    )[0]  # [T, V]

    n = 4000
    align, _ = ctc_sample_alignments(
        labels, jnp.asarray(lp), ll, gl, 0,
        jax.random.PRNGKey(7), num_samples=n,
    )
    align = np.asarray(align)[0]  # [n, T]
    emp = np.zeros((num_t, vocab))
    for t in range(num_t):
        for v in range(vocab):
            emp[t, v] = np.mean(align[:, t] == v)

    sigma = np.sqrt(np.maximum(post * (1 - post), 1e-12) / n)
    assert np.all(np.abs(emp - post) <= 5 * sigma + 1e-9), (
        np.abs(emp - post) / (sigma + 1e-12)
    )


def test_infeasible_and_empty_label():
    lp = _inputs(2, 3, 3, seed=5)
    labels = np.asarray([[1, 2], [0, 0]], np.int32)
    ll = np.asarray([2, 0], np.int32)  # sample 1: empty label
    gl = np.asarray([1, 3], np.int32)  # sample 0: infeasible (2 > 1)
    align, path_lp = ctc_sample_alignments(
        jnp.asarray(labels), jnp.asarray(lp), jnp.asarray(ll),
        jnp.asarray(gl), 0, jax.random.PRNGKey(1), num_samples=3,
    )
    align, path_lp = np.asarray(align), np.asarray(path_lp)
    assert np.isneginf(path_lp[0]).all()
    assert (align[0] == 0).all()
    # empty label: all-blank path with the exact blank log-prob sum
    assert (align[1] == 0).all()
    np.testing.assert_allclose(
        path_lp[1], lp[1, :3, 0].sum(), atol=1e-5
    )
