"""Fused windowed attention with decomposed relative-position bias (Pallas).

SAM's encoder spends most of its time in 14x14-window attention blocks whose
(S, S) score matrices + rel-pos biases otherwise round-trip through HBM for
every one of B x windows x heads instances (reference dependency: SAM's
``add_decomposed_rel_pos``). This kernel keeps scores, bias, softmax and the
value matmul in VMEM per (window, head) grid cell.

The decomposed bias ``bias[q,k] = q[q]·rel_h[yq-yk] + q[q]·rel_w[xq-xk]`` is
computed in-kernel from two small projections ``Bh = q @ rel_h^T`` /
``Bw = q @ rel_w^T`` expanded through static banded selection masks — no
(S, S, D) tables and no dynamic gathers.

STATUS: experimental, NOT wired into the SAM encoder. On a v5e at SAM ViT-H
production shape (1600 windows x 196 tokens x 80 dims) this kernel measures
~14 ms vs ~9 ms for the XLA path — XLA's fusion of these small-window
attentions is already strong, and the banded bias expansion costs more than
it saves. Kept as a verified starting point for revisiting with scratch-
resident band tables / VPU-friendlier bias generation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round8(x):
    return ((x + 7) // 8) * 8


@functools.partial(jax.jit, static_argnames=("win_h", "win_w", "interpret"))
def window_attention_relpos(
    q: jnp.ndarray,  # (G, S, D) with S = win_h * win_w
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_h: jnp.ndarray,  # (2*win_h - 1, D)
    rel_w: jnp.ndarray,  # (2*win_w - 1, D)
    win_h: int,
    win_w: int,
    interpret: bool = False,
) -> jnp.ndarray:
    g, s, d = q.shape
    assert s == win_h * win_w
    # S pads to a lane multiple: logits are (S_pad, S_pad) and their last dim
    # must tile to 128 lanes or every VPU op on them runs misaligned
    s_pad = ((s + 127) // 128) * 128
    d_pad = ((d + 127) // 128) * 128
    nh, nw = 2 * win_h - 1, 2 * win_w - 1
    nh_pad, nw_pad = _round8(nh), _round8(nw)
    scale = d ** -0.5
    # windows per grid cell: amortizes grid/program overhead
    gb = 8 if g % 8 == 0 else (4 if g % 4 == 0 else (2 if g % 2 == 0 else 1))

    # static banded selection masks: band_h[dy, qi, ki] = (yq - yk + H-1 == dy)
    ys = np.arange(s) // win_w
    xs = np.arange(s) % win_w
    band_h = np.zeros((nh_pad, s_pad, s_pad), np.float32)
    band_w = np.zeros((nw_pad, s_pad, s_pad), np.float32)
    dyi = ys[:, None] - ys[None, :] + win_h - 1
    dxi = xs[:, None] - xs[None, :] + win_w - 1
    for dd in range(nh):
        band_h[dd, :s, :s] = dyi == dd
    for dd in range(nw):
        band_w[dd, :s, :s] = dxi == dd
    key_mask = np.zeros((1, s_pad), np.float32)
    key_mask[0, s:] = -1e30

    qp = jnp.pad(q, ((0, 0), (0, s_pad - s), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, s_pad - s), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, s_pad - s), (0, d_pad - d)))
    rhp = jnp.pad(rel_h.astype(q.dtype), ((0, nh_pad - nh), (0, d_pad - d)))
    rwp = jnp.pad(rel_w.astype(q.dtype), ((0, nw_pad - nw), (0, d_pad - d)))

    def kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, bh_ref, bw_ref, mask_ref, o_ref):
        for wi in range(gb):
            qq = q_ref[wi]  # (S, D)
            logits = jax.lax.dot_general(
                qq, k_ref[wi], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            # decomposed rel-pos bias via banded expansion
            bh = jax.lax.dot_general(  # (S, nh)
                qq, rh_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            bw = jax.lax.dot_general(
                qq, rw_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            bias = jnp.zeros_like(logits)
            for dd in range(nh):
                bias = bias + bh[:, dd][:, None] * bh_ref[dd]
            for dd in range(nw):
                bias = bias + bw[:, dd][:, None] * bw_ref[dd]
            logits = logits + bias + mask_ref[:]
            attn = jax.nn.softmax(logits, axis=-1).astype(v_ref.dtype)
            o_ref[wi] = jax.lax.dot_general(
                attn, v_ref[wi], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(g // gb,),
        in_specs=[
            pl.BlockSpec((gb, s_pad, d_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, s_pad, d_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, s_pad, d_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nh_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nw_pad, d_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nh_pad, s_pad, s_pad), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nw_pad, s_pad, s_pad), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gb, s_pad, d_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, s_pad, d_pad), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * g * s_pad * s_pad * d_pad,
            bytes_accessed=3 * g * s_pad * d_pad * 2,
            transcendentals=g * s_pad * s_pad,
        ),
        interpret=interpret,
    )(qp, kp, vp, rhp, rwp, jnp.asarray(band_h, q.dtype), jnp.asarray(band_w, q.dtype),
      jnp.asarray(key_mask, jnp.float32))
    return out[:, :s, :d]
