"""Where does classic V=128 fwd+grad time go? Same-run A/B of:
- full api path (logits in, log-softmax + its VJP included)
- logproba-level path (ctc_loss_from_logproba: no softmax/VJP)
- guard off
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from benchmarks.quick_bench import make_inputs, timed  # noqa: E402
from tf_seq2seq_losses_tpu import classic_ctc_loss, ctc_loss_from_logproba  # noqa: E402
from tf_seq2seq_losses_tpu.utils.config import config_override  # noqa: E402
from tf_seq2seq_losses_tpu.utils.numerics import logit_to_logproba  # noqa: E402

print("backend:", jax.default_backend(), flush=True)


def lp_loss(labels, logits, ll, gl, blank):
    # treat the input as logprobas directly (no softmax, no softmax VJP)
    return ctc_loss_from_logproba(labels, logits, ll, gl, blank)


for vocab in (32, 128):
    args = make_inputs(256, 500, vocab)
    ms_full = timed(classic_ctc_loss, args)
    print(f"V={vocab:<4d} full (logits in):      {ms_full:7.3f} ms", flush=True)
    lp_args = (args[0], logit_to_logproba(args[1], 2), args[2], args[3])
    ms_lp = timed(lp_loss, lp_args)
    print(f"V={vocab:<4d} logproba-level:        {ms_lp:7.3f} ms", flush=True)
    with config_override(guard=False):
        ms_ng = timed(classic_ctc_loss, args)
    print(f"V={vocab:<4d} full, guard off:       {ms_ng:7.3f} ms", flush=True)
