"""Generate pinned golden tensors for the parity test (VERDICT r3 next #8).

Two sources:

* ``--source tf`` — run OFF-BOX where TensorFlow and the reference package
  (alexeytochin/tf_seq2seq_losses v0.3.0) are installable: exports the
  actual reference binary's loss/gradient/Hessian
  (/root/reference/tests/common.py:25-50 generation conventions) to
  ``golden_tf.npz``.  This container has zero pip egress and no TF, so the
  TF artifact must be produced elsewhere and committed; the script is the
  documented, reproducible recipe.
* ``--source enum`` — runnable here: exports the O(V^T) all-alignments
  enumeration oracle (float64, independent of every library code path —
  tests/test_enumeration_oracle.py) to ``golden_enum.npz``.  Matching the
  enumeration goldens is mathematically equivalent to matching any correct
  CTC implementation, including the reference binary, at these shapes.

Cases: seeds {0, 1, 2} x topologies {classic, simplified}, blank=0, plus
one blank=2 case per topology; B=3, T=5, V=3, labels up to 2 tokens
(enumeration stays cheap: 3^5 paths/sample).

Usage:  python tests/golden/make_golden.py --source enum
"""

import argparse
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(_HERE)))  # repo root
sys.path.insert(0, os.path.dirname(_HERE))  # tests/ (for the oracle import)


def _cases():
    specs = []
    for topology in ("classic", "simplified"):
        for seed in (0, 1, 2):
            specs.append((topology, 0, seed))
        specs.append((topology, 2, 100))
    out = []
    for topology, blank, seed in specs:
        rng = np.random.RandomState(seed)
        batch, num_t, num_v, lmax = 3, 5, 3, 2
        lp_raw = rng.normal(size=(batch, num_t, num_v)).astype(np.float32)
        # normalised log-probabilities (the from-logproba entry treats them
        # as free parameters; normalising keeps the values realistic)
        lp = lp_raw - np.log(
            np.exp(lp_raw).sum(axis=2, keepdims=True)
        ).astype(np.float32)
        tokens = [v for v in range(num_v) if v != blank]
        labels = rng.choice(tokens, size=(batch, lmax)).astype(np.int32)
        label_len = rng.randint(1, lmax + 1, size=batch).astype(np.int32)
        logit_len = rng.randint(2, num_t + 1, size=batch).astype(np.int32)
        out.append(
            dict(topology=topology, blank=blank, seed=seed, lp=lp,
                 labels=labels, label_len=label_len, logit_len=logit_len)
        )
    return out


def gen_enum():
    from test_enumeration_oracle import enumerate_oracle

    arrays = {}
    for i, c in enumerate(_cases()):
        batch, num_t, num_v = c["lp"].shape
        loss = np.zeros((batch,), np.float64)
        grad = np.zeros((batch, num_t, num_v), np.float64)
        hess = np.zeros((batch, num_t, num_v, num_t, num_v), np.float64)
        for b in range(batch):
            tl = int(c["logit_len"][b])
            lo, g, h = enumerate_oracle(
                c["lp"][b], c["labels"][b], int(c["label_len"][b]), tl,
                c["blank"], c["topology"],
            )
            loss[b] = lo
            grad[b, :tl] = g[:tl]
            hess[b, :tl, :, :tl, :] = h[:tl, :, :tl, :]
        key = f"case{i}"
        arrays[f"{key}/topology"] = np.bytes_(c["topology"])
        for f in ("blank", "seed", "lp", "labels", "label_len", "logit_len"):
            arrays[f"{key}/{f}"] = c[f]
        arrays[f"{key}/loss"] = loss
        arrays[f"{key}/grad"] = grad
        arrays[f"{key}/hessian"] = hess
    path = os.path.join(_HERE, "golden_enum.npz")
    np.savez_compressed(path, **arrays)
    print(f"wrote {path} ({os.path.getsize(path)} bytes, "
          f"{len(_cases())} cases)")


def gen_tf():
    # OFF-BOX ONLY.  Requires: pip install tensorflow tf-seq2seq-losses==0.3
    import tensorflow as tf  # noqa: F401
    from tf_seq2seq_losses import classic_ctc_loss, simplified_ctc_loss

    arrays = {}
    for i, c in enumerate(_cases()):
        fn = (
            classic_ctc_loss if c["topology"] == "classic"
            else simplified_ctc_loss
        )
        logits = tf.constant(c["lp"])  # logits; reference softmaxes inside
        labels = tf.constant(c["labels"])
        with tf.GradientTape(persistent=True) as t2:
            t2.watch(logits)
            with tf.GradientTape() as t1:
                t1.watch(logits)
                loss = fn(labels, logits, tf.constant(c["label_len"]),
                          tf.constant(c["logit_len"]), c["blank"])
            grad = t1.gradient(loss, logits)
        hess = t2.jacobian(grad, logits)
        key = f"case{i}"
        arrays[f"{key}/topology"] = np.bytes_(c["topology"])
        for f in ("blank", "seed", "lp", "labels", "label_len", "logit_len"):
            arrays[f"{key}/{f}"] = c[f]
        arrays[f"{key}/loss"] = loss.numpy()
        arrays[f"{key}/grad"] = grad.numpy()
        arrays[f"{key}/hessian"] = hess.numpy()
    path = os.path.join(_HERE, "golden_tf.npz")
    np.savez_compressed(path, **arrays)
    print(f"wrote {path}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", choices=["enum", "tf"], default="enum")
    args = ap.parse_args()
    (gen_enum if args.source == "enum" else gen_tf)()
