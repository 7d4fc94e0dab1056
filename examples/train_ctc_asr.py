"""End-to-end CTC training demo: encoder -> sharded CTC loss -> greedy decode.

Trains the flagship encoder on a synthetic ASR task (each token has a
characteristic feature signature plus noise) with data parallelism over all
available devices, and reports loss + greedy-decode token accuracy.

Run (any backend):

    python examples/train_ctc_asr.py                  # default device(s)
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
        python examples/train_ctc_asr.py --cpu        # 8 virtual devices

This is the minimum end-to-end slice SURVEY §7 names, grown into a full
training loop: jit-compiled DP train step, infeasible-sample masking, greedy
decoding for validation.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

parser = argparse.ArgumentParser()
parser.add_argument("--cpu", action="store_true")
parser.add_argument("--steps", type=int, default=200)
parser.add_argument("--batch-per-device", type=int, default=8)
parser.add_argument("--topology", choices=["classic", "simplified"], default="classic")
args = parser.parse_args()

if args.cpu:
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

if args.cpu:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tf_seq2seq_losses_tpu.models import (  # noqa: E402
    greedy_decode_classic,
    greedy_decode_simplified,
    init_encoder,
)
from tf_seq2seq_losses_tpu.models.encoder import subsampled_length  # noqa: E402
from tf_seq2seq_losses_tpu.models import encoder as enc  # noqa: E402
from tf_seq2seq_losses_tpu.parallel.sharding import make_mesh  # noqa: E402
from tf_seq2seq_losses_tpu.parallel.train import make_train_step  # noqa: E402

VOCAB, FEAT, MAX_T, MAX_L = 8, 16, 48, 6
FRAMES_PER_TOKEN = 4  # aligned with the encoder's 2x subsampling


def synth_batch(rng, batch):
    """Synthetic utterances: each label token emits FRAMES_PER_TOKEN frames
    of its signature vector + noise; labels in [1, VOCAB) (blank = 0)."""
    signatures = np.eye(VOCAB, FEAT) * 3.0  # token -> feature direction
    labels = rng.randint(1, VOCAB, (batch, MAX_L)).astype(np.int32)
    label_length = rng.randint(2, MAX_L + 1, (batch,)).astype(np.int32)
    feats = rng.randn(batch, MAX_T, FEAT).astype(np.float32) * 0.3
    for b in range(batch):
        t = 0
        for li in range(label_length[b]):
            feats[b, t : t + FRAMES_PER_TOKEN] += signatures[labels[b, li]]
            t += FRAMES_PER_TOKEN
    feature_length = np.minimum(
        label_length * FRAMES_PER_TOKEN + 4, MAX_T
    ).astype(np.int32)
    return {
        "features": jnp.asarray(feats),
        "feature_length": jnp.asarray(feature_length),
        "labels": jnp.asarray(labels),
        "label_length": jnp.asarray(label_length),
    }


def token_accuracy(params, batch, decode_fn):
    logits = enc.apply_encoder(params, batch["features"])
    logit_length = subsampled_length(batch["feature_length"])
    tokens, lengths = decode_fn(logits, logit_length, blank_index=0)
    hits = total = 0
    toks = np.asarray(tokens)
    lens = np.asarray(lengths)
    labs = np.asarray(batch["labels"])
    lab_lens = np.asarray(batch["label_length"])
    for b in range(toks.shape[0]):
        n = int(lab_lens[b])
        pred = toks[b, : int(lens[b])].tolist()
        ref = labs[b, :n].tolist()
        m = min(len(pred), n)
        hits += sum(int(pred[i] == ref[i]) for i in range(m))
        total += n
    return hits / max(total, 1)


def main():
    n_dev = len(jax.devices())
    mesh = make_mesh((n_dev,), ("data",))
    batch = args.batch_per_device * n_dev
    print(f"devices: {n_dev} x {jax.devices()[0].platform}, global batch {batch}")

    params = init_encoder(
        jax.random.PRNGKey(0), num_features=FEAT, hidden=64, vocab=VOCAB, num_layers=2
    )
    init_state, shard_fn, train_step = make_train_step(
        mesh, learning_rate=3e-3, topology=args.topology, model_axis=None
    )
    state = init_state(params)

    decode_fn = (
        greedy_decode_classic if args.topology == "classic"
        else greedy_decode_simplified
    )
    rng = np.random.RandomState(0)
    eval_batch = synth_batch(np.random.RandomState(999), batch)

    for step in range(1, args.steps + 1):
        data = shard_fn(synth_batch(rng, batch))
        state, loss = train_step(state, data)
        if step % 25 == 0 or step == 1:
            acc = token_accuracy(state.params, eval_batch, decode_fn)
            print(f"step {step:4d}  loss {float(loss):8.4f}  "
                  f"greedy token acc {acc:5.1%}", flush=True)

    acc = token_accuracy(state.params, eval_batch, decode_fn)
    print(f"final greedy token accuracy: {acc:.1%}")

    # beam-search rescoring of the eval batch through the public API
    from tf_seq2seq_losses_tpu import ctc_beam_search_decode

    logits = enc.apply_encoder(state.params, eval_batch["features"])
    lp = jax.nn.log_softmax(logits, axis=2)
    gl = subsampled_length(eval_batch["feature_length"])
    b_toks, b_lens, b_scores = ctc_beam_search_decode(
        lp, gl, 0, beam_width=4, topology=args.topology
    )
    beam_acc = token_accuracy(
        state.params, eval_batch,
        lambda *_a, **_k: (b_toks[:, 0], b_lens[:, 0]),
    )
    print(f"final beam-4  token accuracy: {beam_acc:.1%} "
          f"(top-1 mean log-prob {float(jnp.mean(b_scores[:, 0])):.2f})")
    if args.steps >= 150 and acc < 0.9:
        raise SystemExit("demo did not converge (accuracy < 90%)")
    print("OK")


if __name__ == "__main__":
    main()
