"""CTC prefix beam search (api.ctc_beam_search_decode).

Oracle: O(V^T) enumeration of every token path.  With ``beam_width`` at
least the number of reachable prefixes the search prunes nothing, so every
beam's score must equal the sequence's exact total CTC probability, the
top-1 must be the true argmax sequence, and the finite beam scores must
logsumexp to exactly 0 (total probability 1) — all three are pinned below.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_seq2seq_losses_tpu import ctc_beam_search_decode


def _collapse_classic(path, blank):
    out, prev = [], None
    for tok in path:
        if tok != prev and tok != blank:
            out.append(int(tok))
        prev = tok
    return tuple(out)


def _collapse_simplified(path, blank):
    return tuple(int(t) for t in path if t != blank)


def _true_posteriors(lp, num_t, blank, collapse):
    """Exact P(sequence) for every reachable sequence by enumeration."""
    vocab = lp.shape[1]
    acc = {}
    for path in itertools.product(range(vocab), repeat=num_t):
        seq = collapse(path, blank)
        score = sum(lp[t, path[t]] for t in range(num_t))
        acc[seq] = np.logaddexp(acc.get(seq, -np.inf), score)
    return acc


@pytest.mark.parametrize(
    "topology,collapse",
    [("classic", _collapse_classic), ("simplified", _collapse_simplified)],
)
@pytest.mark.parametrize("blank", [0, 2])
def test_beam_search_matches_enumeration(topology, collapse, blank):
    rand = np.random.RandomState(5 + blank)
    batch, num_t, vocab = 3, 4, 3
    lp = np.asarray(
        jax.nn.log_softmax(
            jnp.asarray(rand.randn(batch, num_t, vocab), jnp.float32), axis=2
        )
    )
    gl = np.asarray([num_t, num_t, 2], np.int32)

    # 64 beams >= the 31 sequences of length <= 4 over 2 non-blank tokens:
    # nothing is pruned, scores are exact totals
    toks, lens, scores = ctc_beam_search_decode(
        jnp.asarray(lp), jnp.asarray(gl), blank, beam_width=64,
        topology=topology,
    )
    toks, lens, scores = map(np.asarray, (toks, lens, scores))

    for b in range(batch):
        want = _true_posteriors(lp[b, : gl[b]], gl[b], blank, collapse)
        best_seq = max(want, key=want.get)
        got_seqs = {}
        for k in range(scores.shape[1]):
            if np.isneginf(scores[b, k]):
                continue
            seq = tuple(toks[b, k, : lens[b, k]])
            assert seq not in got_seqs, f"duplicate beam {seq}"
            got_seqs[seq] = scores[b, k]
        # top-1 is the argmax sequence with the exact score
        assert tuple(toks[b, 0, : lens[b, 0]]) == best_seq
        # every live beam's score is the exact total probability
        for seq, got in got_seqs.items():
            np.testing.assert_allclose(got, want[seq], atol=1e-5, err_msg=str(seq))
        # with nothing pruned, all sequences are found and probabilities
        # sum to exactly one
        assert set(got_seqs) == set(want)
        total = np.logaddexp.reduce(sorted(got_seqs.values()))
        np.testing.assert_allclose(total, 0.0, atol=1e-5)


def test_beam_search_prunes_gracefully_and_jits():
    rand = np.random.RandomState(11)
    lp = jax.nn.log_softmax(
        jnp.asarray(rand.randn(2, 12, 6), jnp.float32), axis=2
    )
    gl = jnp.asarray([12, 9], jnp.int32)
    fn = jax.jit(
        lambda lp: ctc_beam_search_decode(lp, gl, 0, beam_width=4)
    )
    toks, lens, scores = fn(lp)
    scores = np.asarray(scores)
    assert scores.shape == (2, 4)
    # sorted, finite, and a narrow beam's top-1 is at least as probable as
    # any other returned beam
    assert (np.diff(scores, axis=1) <= 1e-6).all()
    assert np.isfinite(scores[:, 0]).all()
    # wider beam can only improve (or match) the best score
    _, _, wide = ctc_beam_search_decode(lp, gl, 0, beam_width=32)
    assert float(np.asarray(wide)[0, 0]) >= float(scores[0, 0]) - 1e-6


def test_beam_search_validates_inputs():
    lp = jnp.zeros((1, 3, 4))
    with pytest.raises(ValueError, match="rank 3"):
        ctc_beam_search_decode(jnp.zeros((3, 4)), jnp.asarray([3]), 0)
    with pytest.raises(ValueError, match="beam_width"):
        ctc_beam_search_decode(lp, jnp.asarray([3]), 0, beam_width=0)
