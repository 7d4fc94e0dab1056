"""Viterbi forced alignment (api.ctc_forced_alignment).

Oracle: O(V^T) enumeration of every token path, scored directly on the
log-probabilities — the same brute-force defence layer as
tests/test_enumeration_oracle.py.  The best-path score and the path itself
must match (random logits make argmax ties measure-zero); the returned
alignment must also re-score to exactly ``path_logproba`` — an identity
that catches pointer/backtrack bugs independently of the oracle.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.conftest import generate_ctc_loss_inputs
from tf_seq2seq_losses_tpu import ctc_forced_alignment


def _collapse_classic(path, blank):
    out, prev = [], None
    for tok in path:
        if tok != prev and tok != blank:
            out.append(tok)
        prev = tok
    return tuple(out)


def _collapse_simplified(path, blank):
    return tuple(t for t in path if t != blank)


def _enumerate_best(lp, label, num_t, blank, collapse):
    """Brute-force best alignment: max-scoring token path collapsing to
    ``label``. Returns (score, path) or (-inf, None)."""
    vocab = lp.shape[1]
    best, best_path = -np.inf, None
    for path in itertools.product(range(vocab), repeat=num_t):
        if collapse(path, blank) != label:
            continue
        score = sum(lp[t, path[t]] for t in range(num_t))
        if score > best:
            best, best_path = score, path
    return best, best_path


@pytest.mark.parametrize(
    "topology,collapse",
    [("classic", _collapse_classic), ("simplified", _collapse_simplified)],
)
@pytest.mark.parametrize("blank", [0, 2])
def test_alignment_matches_enumeration(topology, collapse, blank):
    rand = np.random.RandomState(3 + blank)
    batch, num_t, vocab, max_l = 4, 5, 3, 3
    logits = rand.randn(batch, num_t, vocab).astype(np.float32)
    lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=2))
    tokens = [t for t in range(vocab) if t != blank]
    labels = rand.choice(tokens, size=(batch, max_l)).astype(np.int32)
    ll = rand.randint(1, max_l + 1, size=batch).astype(np.int32)
    gl = np.full(batch, num_t, np.int32)
    gl[0] = 3

    align, score = ctc_forced_alignment(
        jnp.asarray(labels), jnp.asarray(lp), jnp.asarray(ll),
        jnp.asarray(gl), blank, topology,
    )
    align, score = np.asarray(align), np.asarray(score)

    for b in range(batch):
        label = tuple(labels[b, : ll[b]])
        want, want_path = _enumerate_best(
            lp[b, : gl[b]], label, gl[b], blank, collapse
        )
        if want_path is None:
            assert np.isneginf(score[b])
            assert (align[b] == blank).all()
            continue
        np.testing.assert_allclose(score[b], want, atol=1e-5)
        assert tuple(align[b, : gl[b]]) == want_path, (
            b, tuple(align[b]), want_path
        )
        # frames past logit_length are blank
        assert (align[b, gl[b]:] == blank).all()
        # the alignment re-scores to exactly path_logproba
        rescore = sum(lp[b, t, align[b, t]] for t in range(gl[b]))
        np.testing.assert_allclose(rescore, score[b], atol=1e-5)


def test_alignment_collapses_to_label_and_jits():
    inputs = generate_ctc_loss_inputs(
        batch_size=4, max_logit_length=12, random_seed=7, num_tokens=5,
        blank_index=0,
    )
    fn = jax.jit(lambda lp: ctc_forced_alignment(
        inputs["labels"], lp, inputs["label_length"],
        inputs["logit_length"], 0, "classic",
    ))
    align, score = fn(inputs["logprobas"])
    align = np.asarray(align)
    ll = np.asarray(inputs["label_length"])
    gl = np.asarray(inputs["logit_length"])
    labels = np.asarray(inputs["labels"])
    assert np.isfinite(np.asarray(score)).all()
    for b in range(align.shape[0]):
        got = _collapse_classic(list(align[b, : gl[b]]), 0)
        assert got == tuple(labels[b, : ll[b]]), (b, got)


def test_alignment_infeasible_sample():
    # label longer than logits -> -inf score, all-blank frames
    labels = jnp.asarray([[1, 2, 1, 2]], jnp.int32)
    lp = jax.nn.log_softmax(jnp.zeros((1, 2, 3)), axis=2)
    align, score = ctc_forced_alignment(
        labels, lp, jnp.asarray([4]), jnp.asarray([2]), 0, "classic"
    )
    assert np.isneginf(float(score[0]))
    assert (np.asarray(align) == 0).all()
