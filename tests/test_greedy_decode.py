"""Best-path greedy decoding (api.ctc_greedy_decode).

Oracle: a plain-Python per-sample reimplementation (argmax -> collapse
repeats -> drop blanks), the standard ``tf.nn.ctc_greedy_decoder``
semantics.  Also pins: score = greedy frame path log-prob, truncation via
``max_length``, padding contract (zeros at/after ``lengths``), jit
compatibility, and agreement with the top beam on a peaked distribution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tf_seq2seq_losses_tpu import ctc_beam_search_decode, ctc_greedy_decode


def _oracle(lp, logit_length, blank, merge_repeats):
    """Reference greedy decode for one sample, plain Python."""
    path = [int(np.argmax(lp[t])) for t in range(logit_length)]
    score = float(sum(np.max(lp[t]) for t in range(logit_length)))
    out, prev = [], None
    for tok in path:
        if tok != blank and (not merge_repeats or tok != prev):
            out.append(tok)
        prev = tok
    return out, score


@pytest.mark.parametrize("topology", ["classic", "simplified"])
@pytest.mark.parametrize("blank", [0, 2])
def test_greedy_matches_python_oracle(topology, blank):
    rand = np.random.RandomState(11 + blank)
    batch, num_t, vocab = 5, 9, 4
    lp = np.asarray(
        jax.nn.log_softmax(
            jnp.asarray(rand.randn(batch, num_t, vocab), jnp.float32), axis=2
        )
    )
    gl = np.asarray([num_t, num_t - 1, 3, 1, 0], np.int32)

    tokens, lengths, scores = jax.jit(
        lambda lp, gl: ctc_greedy_decode(lp, gl, blank, topology=topology)
    )(lp, gl)
    tokens, lengths, scores = map(np.asarray, (tokens, lengths, scores))

    for b in range(batch):
        want, want_score = _oracle(lp[b], gl[b], blank, topology == "classic")
        assert lengths[b] == len(want), (b, tokens[b], want)
        np.testing.assert_array_equal(tokens[b, : lengths[b]], want)
        # padding contract: zeros at/after length
        np.testing.assert_array_equal(tokens[b, lengths[b]:], 0)
        np.testing.assert_allclose(scores[b], want_score, rtol=1e-6)


def test_greedy_truncates_to_max_length():
    # every frame decodes to a distinct non-blank token -> length == T
    num_t, vocab = 6, 8
    lp = np.full((1, num_t, vocab), -10.0, np.float32)
    for t in range(num_t):
        lp[0, t, 1 + t] = 0.0
    tokens, lengths, _ = ctc_greedy_decode(
        lp, np.asarray([num_t], np.int32), 0, max_length=4
    )
    assert tokens.shape == (1, 4)
    assert int(lengths[0]) == 4
    np.testing.assert_array_equal(np.asarray(tokens[0]), [1, 2, 3, 4])


def test_greedy_agrees_with_top_beam_when_peaked():
    """On a sharply peaked distribution the greedy path dominates every
    other alignment, so greedy and beam-search top-1 must agree."""
    rand = np.random.RandomState(3)
    batch, num_t, vocab = 4, 7, 5
    logits = 25.0 * rand.randn(batch, num_t, vocab).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=2))
    gl = np.full((batch,), num_t, np.int32)

    g_tokens, g_lengths, _ = ctc_greedy_decode(lp, gl, 0)
    b_tokens, b_lengths, _ = ctc_beam_search_decode(lp, gl, 0, beam_width=8)
    for b in range(batch):
        gl_b = int(g_lengths[b])
        assert gl_b == int(b_lengths[b, 0])
        np.testing.assert_array_equal(
            np.asarray(g_tokens[b, :gl_b]), np.asarray(b_tokens[b, 0, :gl_b])
        )


def test_greedy_zero_length_and_all_blank():
    lp = np.zeros((2, 4, 3), np.float32)
    lp[..., 0] = 5.0  # blank always wins
    tokens, lengths, scores = ctc_greedy_decode(
        lp, np.asarray([4, 0], np.int32), 0
    )
    np.testing.assert_array_equal(np.asarray(lengths), [0, 0])
    np.testing.assert_array_equal(np.asarray(tokens), 0)
    np.testing.assert_allclose(np.asarray(scores), [20.0, 0.0])
