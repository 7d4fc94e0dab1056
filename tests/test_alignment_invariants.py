"""Cross-tool invariants at moderate shapes (no enumeration possible).

The alignment/decode utilities must relate to the loss and to each other by
hard mathematical inequalities for ANY input:

* ``-loss`` = log of the total probability of all valid paths;
* the Viterbi path is one of them:  ``viterbi_lp <= -loss``;
* every FFBS draw is a valid path: ``sample_lp <= viterbi_lp`` (argmax
  dominates any draw) and collapses to the label;
* the Viterbi alignment itself rescores to exactly ``viterbi_lp``.

These hold at B=16, T=40, V=16 where the O(V^T) oracles cannot reach —
complementing the tiny-shape enumeration pins with scale coverage.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_beam_search import _collapse_classic, _collapse_simplified
from tf_seq2seq_losses_tpu import (
    ctc_forced_alignment,
    ctc_loss_from_logproba,
    ctc_sample_alignments,
)


@pytest.mark.parametrize(
    "topology,collapse",
    [("classic", _collapse_classic), ("simplified", _collapse_simplified)],
)
def test_loss_viterbi_sample_ordering(topology, collapse):
    batch, num_t, vocab, max_l = 16, 40, 16, 12
    rand = np.random.RandomState(21)
    lp = np.asarray(
        jax.nn.log_softmax(
            jnp.asarray(rand.randn(batch, num_t, vocab), jnp.float32), axis=2
        )
    )
    labels = rand.randint(1, vocab, (batch, max_l)).astype(np.int32)
    ll = rand.randint(1, max_l + 1, (batch,)).astype(np.int32)
    gl = rand.randint(num_t // 2, num_t + 1, (batch,)).astype(np.int32)
    args = (jnp.asarray(labels), jnp.asarray(lp), jnp.asarray(ll),
            jnp.asarray(gl))

    loss = np.asarray(
        ctc_loss_from_logproba(args[0], args[1], args[2], args[3], 0,
                               topology=topology)
    )
    vit_align, vit_lp = ctc_forced_alignment(
        args[0], args[1], args[2], args[3], 0, topology=topology
    )
    vit_align, vit_lp = np.asarray(vit_align), np.asarray(vit_lp)
    s_align, s_lp = ctc_sample_alignments(
        args[0], args[1], args[2], args[3], 0,
        jax.random.PRNGKey(3), num_samples=16, topology=topology,
    )
    s_align, s_lp = np.asarray(s_align), np.asarray(s_lp)

    feasible = np.isfinite(loss)
    assert feasible.any()  # the geometry guarantees plenty of feasible rows
    for b in range(batch):
        if not feasible[b]:
            assert np.isneginf(vit_lp[b]) and np.isneginf(s_lp[b]).all()
            continue
        total = -loss[b]
        # one path cannot carry more mass than all paths
        assert vit_lp[b] <= total + 1e-3, (b, vit_lp[b], total)
        # argmax dominates every draw
        assert (s_lp[b] <= vit_lp[b] + 1e-3).all(), (b, s_lp[b], vit_lp[b])
        # Viterbi frames rescore to exactly the reported path log-prob
        direct = sum(lp[b, t, vit_align[b, t]] for t in range(gl[b]))
        np.testing.assert_allclose(vit_lp[b], direct, atol=1e-3)
        # every sampled path and the Viterbi path are valid alignments
        want = tuple(labels[b, : ll[b]])
        assert collapse(vit_align[b, : gl[b]], 0) == want
        for s in range(s_align.shape[1]):
            assert collapse(s_align[b, s, : gl[b]], 0) == want, (b, s)
