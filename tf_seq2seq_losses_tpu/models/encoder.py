"""Flagship model: a small CTC-ASR encoder in pure JAX.

The reference is a loss *library* with no model zoo; this encoder exists so the
framework ships a realistic end-to-end training target for the loss — the
configuration every CTC user actually runs: acoustic features -> subsampling
conv stem -> MLP blocks -> vocab projection -> ``classic_ctc_loss``.

TPU-first choices:
* matmuls run in bfloat16 with float32 accumulation (MXU-native),
* the conv stem is a single strided ``lax.conv_general_dilated`` (time
  subsampling x2) so the hot path is conv+matmul, not gather/scatter,
* parameters are a plain pytree dict — trivially shardable with
  ``jax.sharding.NamedSharding`` (see parallel/train.py for the mesh rules).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
Params = Dict[str, Any]


def init_encoder(
    key: Array,
    num_features: int = 80,
    hidden: int = 512,
    vocab: int = 128,
    num_layers: int = 4,
) -> Params:
    """Initialise encoder parameters (He/Glorot-style scaling)."""
    keys = jax.random.split(key, 3 + 3 * num_layers)

    def dense(k, fan_in, fan_out):
        scale = np.sqrt(2.0 / fan_in).astype(np.float32)
        return {
            "w": jax.random.normal(k, (fan_in, fan_out), jnp.float32) * scale,
            "b": jnp.zeros((fan_out,), jnp.float32),
        }

    params: Params = {
        # conv stem: kernel [width=3, in=num_features, out=hidden], stride 2
        "stem": {
            "w": jax.random.normal(keys[0], (3, num_features, hidden), jnp.float32)
            * np.sqrt(2.0 / (3 * num_features)).astype(np.float32),
            "b": jnp.zeros((hidden,), jnp.float32),
        },
        "blocks": [],
        "head": dense(keys[1], hidden, vocab),
        "final_norm": {
            "scale": jnp.ones((hidden,), jnp.float32),
            "bias": jnp.zeros((hidden,), jnp.float32),
        },
    }
    for i in range(num_layers):
        k1, k2 = keys[2 + 2 * i], keys[3 + 2 * i]
        params["blocks"].append(
            {
                "norm": {
                    "scale": jnp.ones((hidden,), jnp.float32),
                    "bias": jnp.zeros((hidden,), jnp.float32),
                },
                "up": dense(k1, hidden, 4 * hidden),
                "down": dense(k2, 4 * hidden, hidden),
            }
        )
    return params


def _layer_norm(x: Array, scale: Array, bias: Array) -> Array:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-6) * scale + bias


def _dense_bf16(x: Array, p: Dict[str, Array]) -> Array:
    """bfloat16 matmul with float32 accumulation — MXU-native."""
    y = jax.lax.dot_general(
        x.astype(jnp.bfloat16),
        p["w"].astype(jnp.bfloat16),
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return y + p["b"]


def apply_encoder(params: Params, features: Array) -> Array:
    """features [B, T, F] float32 -> logits [B, ceil(T/2), V] float32."""
    # The conv stem stays float32: lax.conv's transpose rule rejects the
    # mixed bf16-operand / f32-cotangent combination that dot_general allows,
    # and the stem is a negligible share of the FLOPs anyway.
    x = jax.lax.conv_general_dilated(
        features,
        params["stem"]["w"],
        window_strides=(2,),
        padding="SAME",
        dimension_numbers=("NTC", "TIO", "NTC"),
    ) + params["stem"]["b"]
    x = jax.nn.gelu(x)
    for block in params["blocks"]:
        h = _layer_norm(x, block["norm"]["scale"], block["norm"]["bias"])
        h = jax.nn.gelu(_dense_bf16(h, block["up"]))
        x = x + _dense_bf16(h, block["down"])
    x = _layer_norm(x, params["final_norm"]["scale"], params["final_norm"]["bias"])
    return _dense_bf16(x, params["head"])


def subsampled_length(length: Array) -> Array:
    """Time length after the stride-2 SAME conv stem: ceil(length / 2)."""
    return (length + 1) // 2
