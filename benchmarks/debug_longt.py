"""Debug long-T chunked path vs pure on the chip (small batch)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax
import jax.numpy as jnp
import numpy as np

from tf_seq2seq_losses_tpu import classic_ctc_loss
from tf_seq2seq_losses_tpu.utils.config import config_override

B = int(os.environ.get("DL_B", 8))
T = int(os.environ.get("DL_T", 2000))
V = 16
rng = np.random.RandomState(0)
labels = jnp.asarray(rng.randint(1, V, (B, T // 2)).astype(np.int32))
logits = jnp.asarray(rng.randn(B, T, V).astype(np.float32))
ll = jnp.asarray(rng.randint(T // 4, T // 2, (B,)).astype(np.int32))
gl = jnp.asarray(rng.randint(T // 2, T, (B,)).astype(np.int32))

win = int(os.environ.get("DL_WINDOW", 8))
with config_override(guard=False, window=win):
    fast = jax.jit(classic_ctc_loss)(labels, logits, ll, gl, 0)
print("fast:", np.asarray(fast)[:8], flush=True)
if os.environ.get("DL_PURE", "1") == "1":
    with config_override(use_pallas=False):
        pure = jax.jit(classic_ctc_loss)(labels, logits, ll, gl, 0)
    print("pure:", np.asarray(pure)[:8], flush=True)
    print("max abs err:", float(jnp.max(jnp.abs(fast - pure))), flush=True)
