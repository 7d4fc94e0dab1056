"""One-chip TPU smoke: shard_map + Pallas kernels + custom-VJP chain together."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from tf_seq2seq_losses_tpu.parallel import make_mesh, sharded_mean_ctc_loss

mesh = make_mesh((len(jax.devices()),), ("data",))
loss_fn = sharded_mean_ctc_loss(mesh, topology="classic")
rng = np.random.RandomState(0)
B, T, V = 8 * len(jax.devices()), 50, 16
labels = jnp.asarray(rng.randint(1, V, (B, 10)).astype(np.int32))
logits = jnp.asarray(rng.randn(B, T, V).astype(np.float32))
ll = jnp.asarray(rng.randint(2, 10, (B,)).astype(np.int32))
gl = jnp.asarray(rng.randint(30, T, (B,)).astype(np.int32))
m = loss_fn(labels, logits, ll, gl)
g = jax.grad(lambda x: loss_fn(labels, x, ll, gl))(logits)
assert np.isfinite(float(m)) and np.isfinite(np.asarray(g)).all()
print(f"OK mean_loss={float(m):.4f} grad_norm={float(jnp.linalg.norm(g)):.4f} "
      f"devices={len(jax.devices())}")
