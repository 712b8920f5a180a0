"""Fused windowed attention with decomposed relative-position bias (Pallas).

SAM's encoder spends most of its time in 14x14-window attention blocks whose
(S, S) score matrices + rel-pos biases otherwise round-trip through HBM for
every one of B x windows x heads instances (reference dependency: SAM's
``add_decomposed_rel_pos``). This kernel keeps scores, bias, softmax and the
value matmul in VMEM per (window-group) grid cell.

Bias formulation: the decomposed factors are ABSOLUTE-key-indexed —
``bias[q, (ky, kx)] = bias_h[q, ky] + bias_w[q, kx]`` (models/sam.py
``_rel_pos_factors``) — so the full (S, S) bias is two rank-``win`` MXU
dots against static one-hot key-coordinate selectors:

    bias = bias_h @ selY^T + bias_w @ selX^T,  selY[k, ky] = (k // W == ky)

An earlier formulation expanded the bias through 2*win-1 static banded
(S, S) masks on the VPU; at SAM ViT-H production shape that measured ~14 ms
vs ~9 ms for XLA (the 54 full-logit VPU passes dominated). The selector-dot
form replaces them with 2 MXU dots whose K pads into the same 128-lane tile
as the score dot's K=80 — near-free.

STATUS: experimental, NOT wired into the SAM encoder. Measured on a v5e at
SAM ViT-H production shape (tools/bench_sam_ab.py, GDINO known-baseline
re-probe healthy): full encode 113.9 ms with this kernel vs 77.9 ms for the
XLA windowed path — the per-window (196-pad-256, 80-pad-128) dots are too
small to fill the MXU from an unrolled per-window loop, while XLA runs the
whole (windows*heads, S, S) score batch as one batched matmul. A companion
qkv-hoist restructure (qkv on the unpadded 4096 tokens, windows padded with
the qkv bias) also measured ~5 ms WORSE than the committed
partition-then-project path (77.9 vs ~73) — the 3*C-channel window
partition costs more than the 17% Dense-FLOP saving. Both reverted; kept
verified (tests/test_kernels.py) as a starting point only.
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
    bias_h: jnp.ndarray,  # (G, S, win_h) decomposed factor, absolute ky index
    bias_w: jnp.ndarray,  # (G, S, win_w)
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
    nh_pad, nw_pad = _round8(win_h), _round8(win_w)
    scale = d ** -0.5
    # windows per grid cell: amortizes grid/program overhead
    gb = 8 if g % 8 == 0 else (4 if g % 4 == 0 else (2 if g % 2 == 0 else 1))

    # static one-hot key-coordinate selectors (bias = factors @ selectors^T)
    ys = np.arange(s) // win_w
    xs = np.arange(s) % win_w
    sel_y = np.zeros((s_pad, nh_pad), np.float32)
    sel_x = np.zeros((s_pad, nw_pad), np.float32)
    sel_y[np.arange(s), ys] = 1.0
    sel_x[np.arange(s), xs] = 1.0
    key_mask = np.zeros((1, s_pad), np.float32)
    key_mask[0, s:] = -1e30

    qp = jnp.pad(q, ((0, 0), (0, s_pad - s), (0, d_pad - d)))
    kp = jnp.pad(k, ((0, 0), (0, s_pad - s), (0, d_pad - d)))
    vp = jnp.pad(v, ((0, 0), (0, s_pad - s), (0, d_pad - d)))
    bhp = jnp.pad(bias_h, ((0, 0), (0, s_pad - s), (0, nh_pad - win_h)))
    bwp = jnp.pad(bias_w, ((0, 0), (0, s_pad - s), (0, nw_pad - win_w)))

    def kernel(q_ref, k_ref, v_ref, bh_ref, bw_ref, sy_ref, sx_ref, mask_ref, o_ref):
        for wi in range(gb):
            qq = q_ref[wi]  # (S, D)
            logits = jax.lax.dot_general(
                qq, k_ref[wi], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            logits = logits + jax.lax.dot_general(
                bh_ref[wi], sy_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            logits = logits + jax.lax.dot_general(
                bw_ref[wi], sx_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            logits = logits + mask_ref[:]
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
            pl.BlockSpec((gb, s_pad, nh_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, s_pad, nw_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s_pad, nh_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s_pad, nw_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
    )(qp, kp, vp, bhp.astype(q.dtype), bwp.astype(q.dtype),
      jnp.asarray(sel_y, q.dtype), jnp.asarray(sel_x, q.dtype),
      jnp.asarray(key_mask, jnp.float32))
    return out[:, :s, :d]
