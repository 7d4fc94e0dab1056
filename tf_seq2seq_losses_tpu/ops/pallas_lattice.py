"""Pallas TPU kernels for the CTC lattice scans.

The hot loop of the whole framework is the sequential time recursion with a
small per-step lattice update (reference: the ``tf.while_loop`` inside
``unfold``, tools.py:191-277 — "the main computational bottleneck is the
iteration over the logit length", README.md:105-110).  These kernels replace
the XLA ``lax.scan`` lowering with a hand-scheduled loop:

* grid ``(batch_blocks, time_blocks)`` — batch blocks parallel across cores,
  time blocks sequential ("arbitrary") with the lattice carry resident in a
  VMEM scratch that persists across time blocks;
* per-step transition tensors are streamed ``[block_B, block_T, Lpad]`` tiles
  (Pallas double-buffers the HBM->VMEM pipeline automatically);
* the label axis is lane-padded to a multiple of 128 with ``-inf`` so the
  diagonal step is a single lane roll (``pltpu.roll``) — the wrap-around lane
  is always ``-inf`` by construction, mirroring the pure-JAX masking argument
  (ops/classic.py:_alpha_step);
* the forward-only loss path uses a ``*_final`` kernel that never materialises
  the ``[B, T, L]`` alpha tensor in HBM — the custom-VJP fwd needs only the
  last slice.

Batch and time are padded to block multiples with forced-blank no-op steps
(blank log-prob 0, all transition tensors ``-inf``), which provably leave the
used outputs unchanged (same argument as the reference's forced-blank rows,
base_loss.py:378-393).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tf_seq2seq_losses_tpu.ops import classic as classic_mod
from tf_seq2seq_losses_tpu.ops.core import CtcContext
from tf_seq2seq_losses_tpu.utils.config import get_config

Array = jax.Array
NEG_INF = np.float32(-np.inf)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad3(x: Array, b: int, t: int, l: int, value) -> Array:
    return jnp.pad(
        x,
        ((0, b - x.shape[0]), (0, t - x.shape[1]), (0, l - x.shape[2])),
        constant_values=value,
    )


# ---------------------------------------------------------------------------
# classic topology
# ---------------------------------------------------------------------------


def _classic_alpha_kernel(emit_all: bool, block_t: int):
    """alpha kernel body; carry = (closed, open) [block_B, Lpad] in scratch."""

    def kernel(blank_ref, pm_ref, dc_ref, do_ref, *rest):
        if emit_all:
            out0_ref, out1_ref, a0_s, a1_s = rest
        else:
            fin0_ref, fin1_ref, a0_s, a1_s = rest
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            lane = jax.lax.broadcasted_iota(jnp.int32, a0_s.shape, 1)
            a0_s[:] = jnp.where(lane == 0, 0.0, NEG_INF)
            a1_s[:] = jnp.full(a1_s.shape, NEG_INF, jnp.float32)

        def body(k, _):
            blank = blank_ref[:, k, 0]  # [block_B]
            pm = pm_ref[:, k, :]  # [block_B, Lpad]
            dc = dc_ref[:, k, :]
            do = do_ref[:, k, :]
            a0 = a0_s[:]
            a1 = a1_s[:]
            horiz_closed = jnp.logaddexp(a0, a1) + blank[:, None]
            horiz_open = a1 + pm
            diag = jnp.logaddexp(a0 + dc, a1 + do)
            diag = pltpu.roll(diag, shift=1, axis=1)
            a1_new = jnp.logaddexp(horiz_open, diag)
            a0_s[:] = horiz_closed
            a1_s[:] = a1_new
            if emit_all:
                out0_ref[:, k, :] = horiz_closed
                out1_ref[:, k, :] = a1_new
            return 0

        jax.lax.fori_loop(0, block_t, body, 0)
        if not emit_all:
            fin0_ref[:] = a0_s[:]
            fin1_ref[:] = a1_s[:]

    return kernel


def _classic_beta_kernel(block_t: int):
    """beta kernel body, time-reversed; carry = (closed, open) in scratch."""

    def kernel(
        blank_ref, pm_ref, dc_ref, do_ref, init0_ref, init1_ref,
        out0_ref, out1_ref, b0_s, b1_s,
    ):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            b0_s[:] = init0_ref[:]
            b1_s[:] = init1_ref[:]

        def body(kk, _):
            k = block_t - 1 - kk
            blank = blank_ref[:, k, 0]
            pm = pm_ref[:, k, :]
            dc = dc_ref[:, k, :]
            do = do_ref[:, k, :]
            b0 = b0_s[:]
            b1 = b1_s[:]
            horiz_closed = blank[:, None] + b0
            horiz_open = jnp.logaddexp(horiz_closed, pm + b1)
            # pltpu.roll requires non-negative shifts: -1 == lpad - 1
            b1_next = pltpu.roll(b1, shift=b1.shape[1] - 1, axis=1)
            new0 = jnp.logaddexp(horiz_closed, dc + b1_next)
            new1 = jnp.logaddexp(horiz_open, do + b1_next)
            b0_s[:] = new0
            b1_s[:] = new1
            out0_ref[:, k, :] = new0
            out1_ref[:, k, :] = new1
            return 0

        jax.lax.fori_loop(0, block_t, body, 0)

    return kernel


def _classic_kernel_inputs(ctx: CtcContext):
    """Transition tensors, batch-major [B, T, Lp1] + time-major blank [T, B]."""
    t = classic_mod.terms(ctx)
    return t.blank_lp, t.prev_tok_masked, t.diag_closed, t.diag_open


@functools.partial(jax.jit, static_argnames=("emit_all",))
def _classic_alpha_pallas(blank, pm, dc, do, *, emit_all: bool):
    cfg = get_config()
    batch, num_t, lp1 = pm.shape
    bb = min(cfg.block_batch, max(batch, 1))
    bt = min(cfg.block_time, max(num_t, 1))
    bpad = _round_up(max(batch, 1), bb)
    tpad = _round_up(max(num_t, 1), bt)
    lpad = _round_up(lp1, 128)

    blank_p = jnp.pad(
        blank[:, :, None],
        ((0, bpad - batch), (0, tpad - num_t), (0, 0)),
        constant_values=0.0,
    )
    pm_p = _pad3(pm, bpad, tpad, lpad, NEG_INF)
    dc_p = _pad3(dc, bpad, tpad, lpad, NEG_INF)
    do_p = _pad3(do, bpad, tpad, lpad, NEG_INF)

    grid = (bpad // bb, tpad // bt)
    big_spec = pl.BlockSpec((bb, bt, lpad), lambda i, j: (i, j, 0))
    blank_spec = pl.BlockSpec((bb, bt, 1), lambda i, j: (i, j, 0))

    if emit_all:
        out_shape = (
            jax.ShapeDtypeStruct((bpad, tpad, lpad), jnp.float32),
            jax.ShapeDtypeStruct((bpad, tpad, lpad), jnp.float32),
        )
        out_specs = (big_spec, big_spec)
    else:
        out_shape = (
            jax.ShapeDtypeStruct((bpad, lpad), jnp.float32),
            jax.ShapeDtypeStruct((bpad, lpad), jnp.float32),
        )
        fin_spec = pl.BlockSpec((bb, lpad), lambda i, j: (i, 0))
        out_specs = (fin_spec, fin_spec)

    out = pl.pallas_call(
        _classic_alpha_kernel(emit_all, bt),
        grid=grid,
        in_specs=[blank_spec, big_spec, big_spec, big_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((bb, lpad), jnp.float32),
            pltpu.VMEM((bb, lpad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=cfg.interpret,
    )(blank_p, pm_p, dc_p, do_p)
    return out


def classic_alpha(ctx: CtcContext) -> Array:
    """Drop-in replacement for ops.classic.alpha via the Pallas kernel."""
    blank, pm, dc, do = _classic_kernel_inputs(ctx)
    batch, num_t, lp1 = pm.shape
    out0, out1 = _classic_alpha_pallas(blank, pm, dc, do, emit_all=True)
    stacked = jnp.stack(
        [out0[:batch, :num_t, :lp1], out1[:batch, :num_t, :lp1]], axis=-1
    )  # [B, T, Lp1, 2]
    init = classic_mod._alpha_init(ctx)
    return jnp.concatenate([init[:, None], stacked], axis=1)


def classic_alpha_final(ctx: CtcContext) -> Array:
    """Final alpha slice [B, Lp1, 2] without materialising the full tensor."""
    blank, pm, dc, do = _classic_kernel_inputs(ctx)
    batch, num_t, lp1 = pm.shape
    if num_t == 0:
        return classic_mod._alpha_init(ctx)
    f0, f1 = _classic_alpha_pallas(blank, pm, dc, do, emit_all=False)
    return jnp.stack([f0[:batch, :lp1], f1[:batch, :lp1]], axis=-1)


@jax.jit
def _classic_beta_pallas(blank, pm, dc, do, init0, init1):
    cfg = get_config()
    batch, num_t, lp1 = pm.shape
    bb = min(cfg.block_batch, max(batch, 1))
    bt = min(cfg.block_time, max(num_t, 1))
    bpad = _round_up(max(batch, 1), bb)
    tpad = _round_up(max(num_t, 1), bt)
    lpad = _round_up(lp1, 128)

    # Padded *trailing* time steps must be consumed first (reverse scan), and
    # as forced-blank no-ops they leave the carry equal to the init slice.
    blank_p = jnp.pad(
        blank[:, :, None],
        ((0, bpad - batch), (0, tpad - num_t), (0, 0)),
        constant_values=0.0,
    )
    pm_p = _pad3(pm, bpad, tpad, lpad, NEG_INF)
    dc_p = _pad3(dc, bpad, tpad, lpad, NEG_INF)
    do_p = _pad3(do, bpad, tpad, lpad, NEG_INF)
    init0_p = jnp.pad(
        init0, ((0, bpad - batch), (0, lpad - lp1)), constant_values=NEG_INF
    )
    init1_p = jnp.pad(
        init1, ((0, bpad - batch), (0, lpad - lp1)), constant_values=NEG_INF
    )

    n_tb = tpad // bt
    grid = (bpad // bb, n_tb)
    big_spec = pl.BlockSpec((bb, bt, lpad), lambda i, j: (i, n_tb - 1 - j, 0))
    blank_spec = pl.BlockSpec((bb, bt, 1), lambda i, j: (i, n_tb - 1 - j, 0))
    init_spec = pl.BlockSpec((bb, lpad), lambda i, j: (i, 0))

    out0, out1 = pl.pallas_call(
        _classic_beta_kernel(bt),
        grid=grid,
        in_specs=[blank_spec, big_spec, big_spec, big_spec, init_spec, init_spec],
        out_specs=(big_spec, big_spec),
        out_shape=(
            jax.ShapeDtypeStruct((bpad, tpad, lpad), jnp.float32),
            jax.ShapeDtypeStruct((bpad, tpad, lpad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((bb, lpad), jnp.float32),
            pltpu.VMEM((bb, lpad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=cfg.interpret,
    )(blank_p, pm_p, dc_p, do_p, init0_p, init1_p)
    return out0, out1


def classic_beta(ctx: CtcContext) -> Array:
    """Drop-in replacement for ops.classic.beta via the Pallas kernel."""
    blank, pm, dc, do = _classic_kernel_inputs(ctx)
    batch, num_t, lp1 = pm.shape
    init = classic_mod._beta_last(ctx)
    out0, out1 = _classic_beta_pallas(
        blank, pm, dc, do, init[..., 0], init[..., 1]
    )
    stacked = jnp.stack(
        [out0[:batch, :num_t, :lp1], out1[:batch, :num_t, :lp1]], axis=-1
    )
    return jnp.concatenate([stacked, init[:, None]], axis=1)


# ---------------------------------------------------------------------------
# simplified topology
# ---------------------------------------------------------------------------


def _simplified_kernel(direction: int, emit_all: bool, block_t: int):
    """Single-state lattice scan; direction +1 = alpha, -1 = beta."""

    def kernel(blank_ref, diag_ref, init_ref, *rest):
        if emit_all:
            out_ref, carry_s = rest
        else:
            fin_ref, carry_s = rest
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            carry_s[:] = init_ref[:]

        def body(kk, _):
            k = kk if direction == 1 else block_t - 1 - kk
            blank = blank_ref[:, k, 0]
            diag = diag_ref[:, k, :]
            c = carry_s[:]
            horizontal = c + blank[:, None]
            if direction == 1:
                moved = pltpu.roll(c + diag, shift=1, axis=1)
            else:
                # pltpu.roll requires non-negative shifts: -1 == lpad - 1
                moved = diag + pltpu.roll(c, shift=c.shape[1] - 1, axis=1)
            new = jnp.logaddexp(horizontal, moved)
            carry_s[:] = new
            if emit_all:
                out_ref[:, k, :] = new
            return 0

        jax.lax.fori_loop(0, block_t, body, 0)
        if not emit_all:
            fin_ref[:] = carry_s[:]

    return kernel


@functools.partial(jax.jit, static_argnames=("direction", "emit_all"))
def _simplified_pallas(blank, diag, init, *, direction: int, emit_all: bool):
    cfg = get_config()
    batch, num_t, lp1 = diag.shape
    bb = min(cfg.block_batch, max(batch, 1))
    bt = min(cfg.block_time, max(num_t, 1))
    bpad = _round_up(max(batch, 1), bb)
    tpad = _round_up(max(num_t, 1), bt)
    lpad = _round_up(lp1, 128)

    blank_p = jnp.pad(
        blank[:, :, None],
        ((0, bpad - batch), (0, tpad - num_t), (0, 0)),
        constant_values=0.0,
    )
    diag_p = _pad3(diag, bpad, tpad, lpad, NEG_INF)
    init_p = jnp.pad(
        init, ((0, bpad - batch), (0, lpad - lp1)), constant_values=NEG_INF
    )

    n_tb = tpad // bt
    grid = (bpad // bb, n_tb)
    if direction == 1:
        tmap = lambda i, j: (i, j, 0)  # noqa: E731
    else:
        tmap = lambda i, j: (i, n_tb - 1 - j, 0)  # noqa: E731
    big_spec = pl.BlockSpec((bb, bt, lpad), tmap)
    blank_spec = pl.BlockSpec((bb, bt, 1), tmap)
    init_spec = pl.BlockSpec((bb, lpad), lambda i, j: (i, 0))

    if emit_all:
        out_shape = jax.ShapeDtypeStruct((bpad, tpad, lpad), jnp.float32)
        out_specs = big_spec
    else:
        out_shape = jax.ShapeDtypeStruct((bpad, lpad), jnp.float32)
        out_specs = init_spec

    return pl.pallas_call(
        _simplified_kernel(direction, emit_all, bt),
        grid=grid,
        in_specs=[blank_spec, big_spec, init_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((bb, lpad), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=cfg.interpret,
    )(blank_p, diag_p, init_p)


def simplified_alpha(ctx: CtcContext) -> Array:
    from tf_seq2seq_losses_tpu.ops import simplified as s

    batch, num_t, _ = ctx.logproba.shape
    lp1 = ctx.label.shape[1]
    init = s._alpha_init(ctx)
    out = _simplified_pallas(
        ctx.blank_lp, ctx.expected_token_lp, init, direction=1, emit_all=True
    )
    return jnp.concatenate(
        [init[:, None], out[:batch, :num_t, :lp1]], axis=1
    )


def simplified_alpha_final(ctx: CtcContext) -> Array:
    from tf_seq2seq_losses_tpu.ops import simplified as s

    batch, num_t, _ = ctx.logproba.shape
    lp1 = ctx.label.shape[1]
    init = s._alpha_init(ctx)
    if num_t == 0:
        return init
    out = _simplified_pallas(
        ctx.blank_lp, ctx.expected_token_lp, init, direction=1, emit_all=False
    )
    return out[:batch, :lp1]


def simplified_beta(ctx: CtcContext) -> Array:
    from tf_seq2seq_losses_tpu.ops import simplified as s

    batch, num_t, _ = ctx.logproba.shape
    lp1 = ctx.label.shape[1]
    init = s._beta_last(ctx)
    out = _simplified_pallas(
        ctx.blank_lp, ctx.expected_token_lp, init, direction=-1, emit_all=True
    )
    return jnp.concatenate(
        [out[:batch, :num_t, :lp1], init[:, None]], axis=1
    )
