"""Topology objects: pure-XLA reference path vs Pallas kernel path.

Each topology exposes ``alpha``, ``beta``, ``gamma``, ``combine``, ``loss``
and ``loss_fast``.  The pure ``lax.scan`` implementations (ops/classic.py,
ops/simplified.py) are the correctness oracle and the CPU/GPU fallback; the
Pallas kernels (ops/pallas_lattice.py) are the TPU hot path.  Selection
happens at trace time via :mod:`tf_seq2seq_losses_tpu.utils.config`.

``gamma`` (Hessian-only, O(T^2 L^2)) always uses the pure path — it is a
small-shape feature exactly as in the reference (SURVEY §5).
"""

from __future__ import annotations

import jax

from tf_seq2seq_losses_tpu.ops import classic as _classic
from tf_seq2seq_losses_tpu.ops import simplified as _simplified
from tf_seq2seq_losses_tpu.ops.core import CtcContext
from tf_seq2seq_losses_tpu.utils.config import get_config

Array = jax.Array


def _pallas():
    from tf_seq2seq_losses_tpu.ops import pallas_lattice

    return pallas_lattice


class ClassicTopology:
    name = "classic"

    @staticmethod
    def alpha(ctx: CtcContext) -> Array:
        if get_config().pallas_enabled():
            return _pallas().classic_alpha(ctx)
        return _classic.alpha(ctx)

    @staticmethod
    def beta(ctx: CtcContext) -> Array:
        if get_config().pallas_enabled():
            return _pallas().classic_beta(ctx)
        return _classic.beta(ctx)

    @staticmethod
    def gamma(ctx: CtcContext) -> Array:
        return _classic.gamma(ctx)

    @staticmethod
    def combine(ctx: CtcContext, a: Array, b: Array) -> Array:
        return _classic.combine(ctx, a, b)

    @staticmethod
    def loss(ctx: CtcContext, alpha_tensor: Array) -> Array:
        return _classic.loss(ctx, alpha_tensor)

    @staticmethod
    def loss_fast(ctx: CtcContext) -> Array:
        """Forward-only loss: on the Pallas path the full alpha tensor is
        never written to HBM — only the final lattice slice."""
        if get_config().pallas_enabled():
            final = _pallas().classic_alpha_final(ctx)  # [B, Lp1, 2]
            return _classic.loss(ctx, final[:, None])
        return _classic.loss(ctx, _classic.alpha(ctx))


class SimplifiedTopology:
    name = "simplified"

    @staticmethod
    def alpha(ctx: CtcContext) -> Array:
        if get_config().pallas_enabled():
            return _pallas().simplified_alpha(ctx)
        return _simplified.alpha(ctx)

    @staticmethod
    def beta(ctx: CtcContext) -> Array:
        if get_config().pallas_enabled():
            return _pallas().simplified_beta(ctx)
        return _simplified.beta(ctx)

    @staticmethod
    def gamma(ctx: CtcContext) -> Array:
        return _simplified.gamma(ctx)

    @staticmethod
    def combine(ctx: CtcContext, a: Array, b: Array) -> Array:
        return _simplified.combine(ctx, a, b)

    @staticmethod
    def loss(ctx: CtcContext, alpha_tensor: Array) -> Array:
        return _simplified.loss(ctx, alpha_tensor)

    @staticmethod
    def loss_fast(ctx: CtcContext) -> Array:
        if get_config().pallas_enabled():
            final = _pallas().simplified_alpha_final(ctx)  # [B, Lp1]
            return _simplified.loss(ctx, final[:, None])
        return _simplified.loss(ctx, _simplified.alpha(ctx))


CLASSIC = ClassicTopology()
SIMPLIFIED = SimplifiedTopology()
