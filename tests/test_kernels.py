"""Pallas kernels (interpreter mode on CPU) vs XLA/numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from beyondff_tpu.core import masks as mask_ops
from beyondff_tpu.kernels import mask_iou as kiou


def test_pallas_iou_matches_oracle(rng):
    a = rng.random((130, 2100)) < 0.3
    b = rng.random((70, 2100)) < 0.4
    out = np.asarray(kiou.pad_and_iou(jnp.asarray(a), jnp.asarray(b), interpret=True))
    ref = mask_ops.pairwise_iou_np(a, b)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_pallas_iou_self(rng):
    a = rng.random((96, 4096)) < 0.2
    out = np.asarray(kiou.pad_and_iou(jnp.asarray(a), interpret=True))
    ref = mask_ops.pairwise_iou_np(a)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
    nonempty = a.sum(1) > 0
    np.testing.assert_allclose(np.diag(out)[nonempty], 1.0, rtol=1e-6)


def _xla_attention(q, k, v):
    d = q.shape[-1]
    logits = np.einsum("bqd,bkd->bqk", q * d ** -0.5, k)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    return np.einsum("bqk,bkd->bqd", w, v)


def test_flash_attention_matches_xla(rng):
    from beyondff_tpu.kernels import flash_attention as fa

    q = rng.normal(size=(2, 512, 64)).astype(np.float32)
    k = rng.normal(size=(2, 512, 64)).astype(np.float32)
    v = rng.normal(size=(2, 512, 64)).astype(np.float32)
    out = np.asarray(fa.flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                        interpret=True))
    ref = _xla_attention(q, k, v)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_flash_attention_padded(rng):
    from beyondff_tpu.kernels import flash_attention as fa

    q = rng.normal(size=(1, 300, 32)).astype(np.float32)
    k = rng.normal(size=(1, 300, 32)).astype(np.float32)
    v = rng.normal(size=(1, 300, 32)).astype(np.float32)
    out = np.asarray(fa.attend(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), interpret=True))
    ref = _xla_attention(q, k, v)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_flash_attention_small_fallback(rng):
    from beyondff_tpu.kernels import flash_attention as fa

    q = rng.normal(size=(1, 16, 8)).astype(np.float32)
    out = np.asarray(fa.attend(jnp.asarray(q), jnp.asarray(q), jnp.asarray(q)))
    ref = _xla_attention(q, q, q)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_window_attention_relpos_matches_xla(rng):
    from beyondff_tpu.kernels.window_attention import window_attention_relpos
    from beyondff_tpu.models.sam import _rel_pos_bias, _rel_pos_factors

    g, wh, ww, d = 3, 4, 5, 16
    s = wh * ww
    q = rng.normal(size=(g, s, d)).astype(np.float32)
    k = rng.normal(size=(g, s, d)).astype(np.float32)
    v = rng.normal(size=(g, s, d)).astype(np.float32)
    rel_h = rng.normal(size=(2 * wh - 1, d)).astype(np.float32) * 0.1
    rel_w = rng.normal(size=(2 * ww - 1, d)).astype(np.float32) * 0.1

    # XLA oracle: the exact path in models/sam.ViTAttention
    logits = np.einsum("gqd,gkd->gqk", q * d ** -0.5, k)
    bias = np.asarray(_rel_pos_bias((wh, ww), (wh, ww), jnp.asarray(rel_h),
                                    jnp.asarray(rel_w), jnp.asarray(q)))
    logits = logits + bias
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    ref = np.einsum("gqk,gkd->gqd", w, v)

    bias_h, bias_w = _rel_pos_factors((wh, ww), (wh, ww), jnp.asarray(rel_h),
                                      jnp.asarray(rel_w), jnp.asarray(q))
    out = np.asarray(window_attention_relpos(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), bias_h, bias_w,
        wh, ww, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_flash_attention_relpos_matches_xla(rng):
    """Decomposed rel-pos flash kernel vs the dense-bias XLA formula on a
    raster-ordered 32x64 grid (two grid rows per kv block)."""
    from beyondff_tpu.kernels import flash_attention as fa

    bh, gh, gw, d = 3, 8, 64, 32
    s = gh * gw  # 512: bq=256, bkv=512 -> 8 grid rows/kv block
    q = rng.normal(size=(bh, s, d)).astype(np.float32)
    k = rng.normal(size=(bh, s, d)).astype(np.float32)
    v = rng.normal(size=(bh, s, d)).astype(np.float32)
    bias_h = rng.normal(size=(bh, s, gh)).astype(np.float32)
    bias_w = rng.normal(size=(bh, s, gw)).astype(np.float32)

    out = np.asarray(fa.attend_relpos(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(bias_h), jnp.asarray(bias_w), gw, interpret=True))

    bias = (bias_h[:, :, :, None] + bias_w[:, :, None, :]).reshape(bh, s, s)
    logits = np.einsum("bqd,bkd->bqk", q * d ** -0.5, k) + bias
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    ref = np.einsum("bqk,bkd->bqd", w, v)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_sam_global_attention_relpos_kernel_parity(rng, monkeypatch):
    """The SAM ViTAttention rel-pos kernel branch (forced on) matches the XLA
    dense-bias path on a global block."""
    from beyondff_tpu.kernels import dispatch
    from beyondff_tpu.models import sam as sam_mod

    attn = sam_mod.ViTAttention(num_heads=2, use_rel_pos=True, input_hw=(16, 32),
                                dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(1, 16, 32, 64)).astype(np.float32))
    params = attn.init(jax.random.PRNGKey(0), x)
    # random rel-pos tables (zeros init would hide bias errors)
    params = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.normal(size=p.shape, scale=0.1).astype(np.float32)),
        params)

    ref = attn.apply(params, x)  # on CPU: dispatch.on_tpu() False -> XLA path
    from beyondff_tpu.kernels import flash_attention as fa

    real = fa.attend_relpos
    monkeypatch.setattr(dispatch, "on_tpu", lambda: True)
    monkeypatch.setenv("BFF_SAM_RELPOS_FLASH", "1")
    monkeypatch.setattr(fa, "attend_relpos",
                        lambda *a, **kw: real(*a, interpret=True, **kw))
    out = attn.apply(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)
