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
