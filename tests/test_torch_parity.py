"""Layer-level numerical parity between our flax modules and the torch ops
whose weights the converters ingest. These conventions (kernel transposes,
qkv splitting, transposed-conv orientation) underpin every checkpoint
converter in beyondff_tpu.models."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import flax.linen as nn  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from beyondff_tpu.models.layers import Attention  # noqa: E402

RTOL, ATOL = 2e-5, 2e-5


def test_dense_matches_linear(rng):
    lin = torch.nn.Linear(8, 16)
    x = rng.normal(size=(3, 8)).astype(np.float32)
    ref = lin(torch.from_numpy(x)).detach().numpy()
    params = {"params": {"kernel": jnp.asarray(lin.weight.detach().numpy().T),
                         "bias": jnp.asarray(lin.bias.detach().numpy())}}
    out = nn.Dense(16).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=RTOL, atol=ATOL)


def test_conv_matches_conv2d(rng):
    conv = torch.nn.Conv2d(3, 5, kernel_size=3, stride=2, padding=1)
    x = rng.normal(size=(2, 3, 12, 12)).astype(np.float32)
    ref = conv(torch.from_numpy(x)).detach().numpy().transpose(0, 2, 3, 1)
    params = {"params": {"kernel": jnp.asarray(conv.weight.detach().numpy().transpose(2, 3, 1, 0)),
                         "bias": jnp.asarray(conv.bias.detach().numpy())}}
    out = nn.Conv(5, (3, 3), (2, 2), padding=1).apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=RTOL, atol=ATOL)


def test_convtranspose_matches_torch(rng):
    """stride-2 kernel-2 transposed conv — the SAM mask-upscaling shape."""
    deconv = torch.nn.ConvTranspose2d(6, 4, kernel_size=2, stride=2)
    x = rng.normal(size=(2, 6, 8, 8)).astype(np.float32)
    ref = deconv(torch.from_numpy(x)).detach().numpy().transpose(0, 2, 3, 1)
    kernel = deconv.weight.detach().numpy().transpose(2, 3, 1, 0)  # (kh, kw, out, in)
    params = {"params": {"kernel": jnp.asarray(kernel),
                         "bias": jnp.asarray(deconv.bias.detach().numpy())}}
    out = nn.ConvTranspose(4, (2, 2), (2, 2), transpose_kernel=True).apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=RTOL, atol=ATOL)


def test_layernorm_matches(rng):
    ln = torch.nn.LayerNorm(10)
    with torch.no_grad():
        ln.weight.mul_(1.7).add_(0.1)
        ln.bias.add_(0.3)
    x = rng.normal(size=(4, 10)).astype(np.float32)
    ref = ln(torch.from_numpy(x)).detach().numpy()
    params = {"params": {"scale": jnp.asarray(ln.weight.detach().numpy()),
                         "bias": jnp.asarray(ln.bias.detach().numpy())}}
    out = nn.LayerNorm().apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_attention_matches_multihead(rng):
    """Our Attention with split q/k/v == torch MultiheadAttention with in_proj,
    validating the CLIP converter's qkv split."""
    dim, heads, n = 16, 4, 6
    mha = torch.nn.MultiheadAttention(dim, heads, batch_first=True)
    x = rng.normal(size=(2, n, dim)).astype(np.float32)
    ref, _ = mha(torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x))
    ref = ref.detach().numpy()

    w_in = mha.in_proj_weight.detach().numpy()
    b_in = mha.in_proj_bias.detach().numpy()
    qw, kw, vw = np.split(w_in, 3, axis=0)
    qb, kb, vb = np.split(b_in, 3, axis=0)
    params = {"params": {
        "q": {"kernel": jnp.asarray(qw.T), "bias": jnp.asarray(qb)},
        "k": {"kernel": jnp.asarray(kw.T), "bias": jnp.asarray(kb)},
        "v": {"kernel": jnp.asarray(vw.T), "bias": jnp.asarray(vb)},
        "proj": {"kernel": jnp.asarray(mha.out_proj.weight.detach().numpy().T),
                 "bias": jnp.asarray(mha.out_proj.bias.detach().numpy())},
    }}
    out = Attention(heads).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_causal_attention_matches(rng):
    dim, heads, n = 12, 3, 5
    mha = torch.nn.MultiheadAttention(dim, heads, batch_first=True)
    x = rng.normal(size=(1, n, dim)).astype(np.float32)
    causal_t = torch.triu(torch.full((n, n), float("-inf")), diagonal=1)
    ref, _ = mha(*[torch.from_numpy(x)] * 3, attn_mask=causal_t)
    ref = ref.detach().numpy()

    w_in = mha.in_proj_weight.detach().numpy()
    b_in = mha.in_proj_bias.detach().numpy()
    qw, kw, vw = np.split(w_in, 3, axis=0)
    qb, kb, vb = np.split(b_in, 3, axis=0)
    params = {"params": {
        "q": {"kernel": jnp.asarray(qw.T), "bias": jnp.asarray(qb)},
        "k": {"kernel": jnp.asarray(kw.T), "bias": jnp.asarray(kb)},
        "v": {"kernel": jnp.asarray(vw.T), "bias": jnp.asarray(vb)},
        "proj": {"kernel": jnp.asarray(mha.out_proj.weight.detach().numpy().T),
                 "bias": jnp.asarray(mha.out_proj.bias.detach().numpy())},
    }}
    mask = jnp.tril(jnp.ones((n, n), bool))[None, None]
    out = Attention(heads).apply(params, jnp.asarray(x), mask=mask)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_embedding_matches(rng):
    emb = torch.nn.Embedding(20, 8)
    ids = rng.integers(0, 20, (3, 4))
    ref = emb(torch.from_numpy(ids)).detach().numpy()
    params = {"params": {"embedding": jnp.asarray(emb.weight.detach().numpy())}}
    out = nn.Embed(20, 8).apply(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=RTOL, atol=ATOL)


def test_ms_deform_attn_matches_official_reference(rng):
    """Core multi-scale deformable sampling vs the OFFICIAL architecture's
    pure-torch reference (transformers GroundingDino / DeformableDetr
    MultiScaleDeformableAttention: grid_sample bilinear, zeros padding,
    align_corners=False) — the reference model's CUDA op semantics
    (SURVEY.md §2.3), pinned full-function rather than per-op."""
    pytest.importorskip("transformers")
    from transformers.models.grounding_dino.modeling_grounding_dino import (
        MultiScaleDeformableAttention,
    )

    from beyondff_tpu.models.gdino import deformable

    shapes = [(12, 16), (6, 8), (3, 4)]
    b, heads, hd, q, p = 2, 4, 8, 30, 3
    s = sum(h * w for h, w in shapes)
    value = rng.normal(size=(b, s, heads, hd)).astype(np.float32)
    # locations span in-map, map-edge and out-of-map regions
    locs = rng.uniform(-0.2, 1.2, (b, q, heads, len(shapes), p, 2)).astype(np.float32)
    aw = rng.uniform(0, 1, (b, q, heads, len(shapes), p)).astype(np.float32)
    aw /= aw.reshape(b, q, heads, -1).sum(-1)[:, :, :, None, None]

    op = MultiScaleDeformableAttention()
    shapes_t = torch.tensor(shapes, dtype=torch.long)
    level_start = torch.cat(
        [torch.zeros(1, dtype=torch.long),
         torch.cumsum(shapes_t.prod(1), 0)[:-1]])
    want = op(
        torch.from_numpy(value), shapes_t, [tuple(sh) for sh in shapes],
        level_start, torch.from_numpy(locs), torch.from_numpy(aw),
        im2col_step=64,
    ).numpy()

    got = np.asarray(deformable.ms_deform_attn(
        jnp.asarray(value), [tuple(sh) for sh in shapes],
        jnp.asarray(locs), jnp.asarray(aw)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


def test_sine_position_embedding_matches_official(rng):
    """Sine PE vs the official get_sine_pos_embed (transformers GroundingDino;
    the original repo's gen_sineembed_for_position): per-pair temperature
    divisors, sin/cos interleave, and the (pos_y, pos_x, pos_w, pos_h)
    coordinate ordering the decoder's ref_point_head expects."""
    pytest.importorskip("transformers")
    from transformers.models.grounding_dino.modeling_grounding_dino import (
        get_sine_pos_embed,
    )

    from beyondff_tpu.models.gdino.model import sine_position_embedding

    hidden = 64
    # decoder case: (cx, cy, w, h) boxes -> 2*hidden PE
    ref = rng.uniform(0, 1, (2, 5, 4)).astype(np.float32)
    want = get_sine_pos_embed(torch.from_numpy(ref), num_pos_feats=2 * hidden // 4,
                              exchange_xy=True).numpy()
    got = np.asarray(sine_position_embedding(
        jnp.asarray(ref)[..., jnp.array([1, 0, 2, 3])], 2 * hidden))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    # encoder case: (y, x) grid coords fed directly (already official order);
    # the HF helper requires a (B, Q, n) layout
    yx = rng.uniform(0, 1, (1, 7, 2)).astype(np.float32)
    want2 = get_sine_pos_embed(torch.from_numpy(yx[..., ::-1].copy()),
                               num_pos_feats=hidden // 2, exchange_xy=True).numpy()
    got2 = np.asarray(sine_position_embedding(jnp.asarray(yx), hidden))
    np.testing.assert_allclose(got2, want2, atol=1e-5, rtol=1e-5)


def test_subsentence_masks_match_official(rng):
    """Per-phrase text self-attention mask + restarting position ids vs the
    official generate_masks_with_special_tokens_and_transfer_map
    (transformers GroundingDino; the reference dependency's exact helper)."""
    pytest.importorskip("transformers")
    from transformers.models.grounding_dino.modeling_grounding_dino import (
        generate_masks_with_special_tokens_and_transfer_map,
    )

    from beyondff_tpu.models.gdino.bert import subsentence_masks

    cls_id, sep_id, dot, qmark = 101, 102, 1012, 1029
    # realistic caption tokenizations: [CLS] w w . w w w . [SEP] (+ padding-ish)
    seqs = [
        [cls_id, 2001, 2002, dot, 2003, 2004, 2005, dot, sep_id],
        [cls_id, 3000, dot, 3001, 3002, qmark, 3003, dot, sep_id],
        [cls_id, 4000, 4001, 4002, 4003, dot, sep_id, 0, 0],
    ]
    for seq in seqs:
        ids = np.asarray([seq], np.int64)
        want_mask, want_pos = generate_masks_with_special_tokens_and_transfer_map(
            torch.from_numpy(ids))
        got_mask, got_pos = subsentence_masks(ids, [dot, qmark], cls_id, sep_id)
        np.testing.assert_array_equal(got_mask, want_mask.numpy(), err_msg=str(seq))
        np.testing.assert_array_equal(got_pos, want_pos.numpy().astype(np.int32),
                                      err_msg=str(seq))


def test_sam_decomposed_rel_pos_matches_official(rng):
    """SAM's decomposed relative-position bias (the thin-factor refactor that
    let XLA fuse the bias into softmax, ARCHITECTURE.md) vs the official
    add_decomposed_rel_pos (transformers SamVisionAttention)."""
    pytest.importorskip("transformers")
    from transformers.models.sam import modeling_sam as sam_hf

    from beyondff_tpu.models.sam import _rel_pos_bias

    h = w = 7
    b, dim = 3, 16
    q = rng.normal(size=(b, h * w, dim)).astype(np.float32)
    rel_h = rng.normal(size=(2 * h - 1, dim)).astype(np.float32)
    rel_w = rng.normal(size=(2 * w - 1, dim)).astype(np.float32)

    shim = sam_hf.SamVisionAttention.__new__(sam_hf.SamVisionAttention)
    want = shim.get_decomposed_rel_pos(
        torch.from_numpy(q), torch.from_numpy(rel_h), torch.from_numpy(rel_w),
        (h, w), (h, w),
    )
    want = want.reshape(b, h * w, h * w).numpy()
    got = np.asarray(_rel_pos_bias((h, w), (h, w), jnp.asarray(rel_h),
                                   jnp.asarray(rel_w), jnp.asarray(q)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_swin_rel_pos_index_and_shift_mask_match_official():
    """Swin's relative-position-index table and shifted-window attention mask
    vs the official construction (transformers SwinSelfAttention init /
    SwinLayer.get_attn_mask)."""
    pytest.importorskip("transformers")
    from transformers import SwinConfig as HFSwinConfig
    from transformers.models.swin import modeling_swin as swin_hf

    from beyondff_tpu.models.gdino.swin import _rel_pos_index, _shift_mask

    win = 4
    cfg = HFSwinConfig(embed_dim=8, depths=[1], num_heads=[2], window_size=win,
                       image_size=32, patch_size=4)
    att = swin_hf.SwinSelfAttention(cfg, dim=8, num_heads=2, window_size=win)
    np.testing.assert_array_equal(
        _rel_pos_index(win), att.relative_position_index.numpy())

    layer = swin_hf.SwinLayer(cfg, dim=8, input_resolution=(12, 16),
                              num_heads=2, shift_size=win // 2)
    want = layer.get_attn_mask(12, 16, torch.float32, "cpu").numpy()
    got = np.asarray(_shift_mask(12, 16, win, win // 2))
    np.testing.assert_array_equal(got, want)


def test_fusion_layer_matches_official(rng):
    """Image<->text fusion block vs the official GroundingDinoFusionLayer,
    weights translated — pins the pre-norm placement, the NORMED residual
    base (out = LN(x) + gamma*delta, the BiAttentionBlock rebinding quirk),
    masking, and the attention math."""
    pytest.importorskip("transformers")
    from transformers import GroundingDinoConfig
    from transformers.models.grounding_dino.modeling_grounding_dino import (
        GroundingDinoFusionLayer,
    )

    from beyondff_tpu.models.gdino.model import BiAttention

    d, heads = 32, 2
    cfg = GroundingDinoConfig(d_model=d, encoder_ffn_dim=2 * d,
                              encoder_attention_heads=2 * heads)
    torch.manual_seed(0)
    layer = GroundingDinoFusionLayer(cfg).eval()
    # give the projections/gammas non-degenerate values
    with torch.no_grad():
        for p in layer.parameters():
            p.copy_(torch.from_numpy(
                rng.normal(0, 0.2, p.shape).astype(np.float32)))

    def lin(mod):
        return {"kernel": jnp.asarray(mod.weight.detach().numpy().T),
                "bias": jnp.asarray(mod.bias.detach().numpy())}

    def ln(mod):
        return {"scale": jnp.asarray(mod.weight.detach().numpy()),
                "bias": jnp.asarray(mod.bias.detach().numpy())}

    params = {"params": {
        "ln_v": ln(layer.layer_norm_vision),
        "ln_l": ln(layer.layer_norm_text),
        "v_proj": lin(layer.attn.vision_proj),
        "l_proj": lin(layer.attn.text_proj),
        "values_v_proj": lin(layer.attn.values_vision_proj),
        "values_l_proj": lin(layer.attn.values_text_proj),
        "out_v_proj": lin(layer.attn.out_vision_proj),
        "out_l_proj": lin(layer.attn.out_text_proj),
        "gamma_v": jnp.asarray(layer.vision_param.detach().numpy()),
        "gamma_l": jnp.asarray(layer.text_param.detach().numpy()),
    }}

    b, n_img, n_txt = 2, 12, 7
    img = rng.normal(size=(b, n_img, d)).astype(np.float32)
    txt = rng.normal(size=(b, n_txt, d)).astype(np.float32)
    pad = np.ones((b, n_txt), bool)
    pad[1, 5:] = False  # padded tail on one batch row

    (want_v, _), (want_t, _) = layer(
        torch.from_numpy(img), torch.from_numpy(txt),
        attention_mask_vision=None,
        attention_mask_text=torch.from_numpy(~pad),  # HF: True = padding
    )
    mod = BiAttention(dim=d, text_dim=d, embed_dim=d, heads=heads)
    got_v, got_t = mod.apply(params, jnp.asarray(img), jnp.asarray(txt),
                             jnp.asarray(pad))  # ours: True = real token
    np.testing.assert_allclose(np.asarray(got_v), want_v.detach().numpy(),
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(got_t), want_t.detach().numpy(),
                               atol=1e-4, rtol=1e-4)
