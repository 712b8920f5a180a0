"""GDINO submodules: Swin backbone shapes/shift masks, BERT masking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beyondff_tpu.models.gdino import bert as bert_mod
from beyondff_tpu.models.gdino import swin as swin_mod
from beyondff_tpu.models.init_utils import fast_init


@pytest.fixture(scope="module")
def tiny_swin():
    cfg = swin_mod.PRESETS["test"]
    module = swin_mod.SwinBackbone(cfg)
    x = jnp.zeros((1, 64, 96, 3))
    params = fast_init(module, x, seed=0)
    return module, params, cfg


def test_swin_multiscale_shapes(tiny_swin):
    module, params, cfg = tiny_swin
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 64, 96, 3)), jnp.float32)
    outs = module.apply(params, x)
    assert len(outs) == len(cfg.out_indices)
    # stage 0: /4 at embed_dim; stage 1: /8 at 2x dim
    (f0, hw0), (f1, hw1) = outs
    assert f0.shape == (2, 16, 24, cfg.embed_dim) and hw0 == (16, 24)
    assert f1.shape == (2, 8, 12, cfg.embed_dim * 2) and hw1 == (8, 12)
    assert np.isfinite(np.asarray(f1)).all()


def test_swin_handles_non_multiple_sizes(tiny_swin):
    module, params, _ = tiny_swin
    # 72x104 -> /4 = 18x26, not window multiples: padding + shift path
    x = jnp.zeros((1, 72, 104, 3))
    outs = module.apply(params, x)
    assert outs[0][0].shape[1:3] == (18, 26)


def test_shift_mask_blocks_cross_region():
    m = np.asarray(swin_mod._shift_mask(8, 8, 4, 2))
    assert m.shape == (4, 16, 16)
    assert (m == 0).any() and (m == -100).any()


def test_bert_padding_mask_isolation():
    cfg = bert_mod.PRESETS["test"]
    module = bert_mod.BertEncoder(cfg)
    ids = jnp.asarray(np.array([[5, 6, 7, 0, 0]], np.int32))
    params = fast_init(module, ids, jnp.ones((1, 5, 5), bool), seed=0)
    full = module.apply(params, ids, jnp.ones((1, 5), bool))
    # changing a masked-out (padded) token must not affect attended outputs
    mask = jnp.asarray(np.array([[1, 1, 1, 0, 0]], bool))
    a = module.apply(params, ids, mask)
    ids2 = ids.at[0, 4].set(9)
    b = module.apply(params, ids2, mask)
    np.testing.assert_allclose(np.asarray(a[0, :3]), np.asarray(b[0, :3]), rtol=1e-5)
    assert not np.allclose(np.asarray(full), np.asarray(a))


def test_bert_position_ids_change_output():
    cfg = bert_mod.PRESETS["test"]
    module = bert_mod.BertEncoder(cfg)
    ids = jnp.asarray(np.array([[5, 6, 7, 8]], np.int32))
    mask = jnp.ones((1, 4), bool)
    params = fast_init(module, ids, mask, seed=0)
    a = module.apply(params, ids, mask, jnp.asarray([[0, 1, 2, 3]], jnp.int32))
    b = module.apply(params, ids, mask, jnp.asarray([[0, 1, 0, 1]], jnp.int32))
    assert not np.allclose(np.asarray(a), np.asarray(b))
