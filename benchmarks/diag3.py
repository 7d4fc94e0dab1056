import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from tf_seq2seq_losses_tpu.ops import core, pallas_lattice as pk
from tf_seq2seq_losses_tpu.ops import classic as cm
from tf_seq2seq_losses_tpu.utils.numerics import logit_to_logproba

# tiny input
rng = np.random.RandomState(0)
B, T, V = 3, 9, 5
labels = jnp.asarray(rng.randint(1, V, (B, 4)).astype(np.int32))
logits = jnp.asarray(rng.randn(B, T, V).astype(np.float32))
ll = jnp.asarray([3, 4, 2], jnp.int32)
gl = jnp.asarray([9, 7, 5], jnp.int32)
lp = logit_to_logproba(logits, 2)
ctx = core.make_context(labels, lp, ll, gl, 0)

pure = cm.loss(ctx, cm.alpha(ctx))
fast = jax.jit(pk.classic_loss_fast)(ctx)
print("pure:", np.asarray(pure))
print("fast:", np.asarray(fast))

# bit-op sanity on TPU inside a trivial pallas kernel
def bitkernel(x_ref, o_ref):
    x = x_ref[:]
    ef = pk._expfield(x)
    o_ref[:] = pk._pow2(ef - 127)  # should reconstruct 2^floor(log2 x)

x = jnp.asarray(rng.rand(8, 128).astype(np.float32)) * 100
out = pl.pallas_call(
    bitkernel,
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
)(x)
expect = np.exp2(np.floor(np.log2(np.asarray(x))))
print("bit ops ok:", bool(np.allclose(np.asarray(out), expect)))

# iroll sanity
def rollkernel(x_ref, o_ref):
    o_ref[:] = pk._iroll(x_ref[:], 1)

xi = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) - 5000
outi = pl.pallas_call(
    rollkernel,
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
)(xi)
print("iroll ok:", bool((np.asarray(outi) == np.roll(np.asarray(xi), 1, axis=1)).all()))
