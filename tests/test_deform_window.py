"""Tile-windowed Pallas deformable sampling vs the exact gather/matmul path.

Samples within the window radius must match ms_deform_attn exactly (it is
the same bilinear math); samples beyond the window must contribute zero
(the documented bounded deviation, kernels/deform_window.py docstring)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from beyondff_tpu.kernels import deform_window as dw  # noqa: E402
from beyondff_tpu.models.gdino import deformable  # noqa: E402

SHAPES = ((20, 30), (10, 15), (5, 8), (3, 4))  # tiny 4-level pyramid


def _setup(rng, b=1, heads=2, hd=8, p=2, max_off=3.0):
    q = sum(h * w for h, w in SHAPES)
    # all-level raster centers (the encoder convention, model.py:258-266)
    cs = []
    for h, w in SHAPES:
        ys = (np.arange(h) + 0.5) / h
        xs = (np.arange(w) + 0.5) / w
        g = np.stack(np.meshgrid(xs, ys, indexing="xy"), -1).reshape(-1, 2)
        cs.append(g)
    centers = np.concatenate(cs, 0)  # (Q, 2) normalized (x, y)
    hw = sum(h * w for h, w in SHAPES)
    value = rng.normal(size=(b, hw, heads, hd)).astype(np.float32)
    # sampling locs: center + offset (in target-level cells, per level)
    locs = np.zeros((b, q, heads, len(SHAPES), p, 2), np.float32)
    for li, (h, w) in enumerate(SHAPES):
        off = rng.uniform(-max_off, max_off, (b, q, heads, p, 2))
        locs[:, :, :, li, :, 0] = centers[None, :, None, None, 0] + off[..., 0] / w
        locs[:, :, :, li, :, 1] = centers[None, :, None, None, 1] + off[..., 1] / h
    aw = rng.uniform(0.1, 1.0, (b, q, heads, len(SHAPES), p)).astype(np.float32)
    return value, locs, aw


def _level_inputs(value, locs, aw, level):
    """Slice one level's value + cell-coord locations like ms_deform_attn."""
    sizes = [h * w for h, w in SHAPES]
    off = sum(sizes[:level])
    h, w = SHAPES[level]
    v = value[:, off:off + sizes[level]]
    gx = locs[:, :, :, level, :, 0] * w - 0.5
    gy = locs[:, :, :, level, :, 1] * h - 0.5
    return v, gx, gy, aw[:, :, :, level]


def _exact_level(value, locs, aw, level):
    """Exact single-level contribution via ms_deform_attn with other levels'
    weights zeroed."""
    aw_only = np.zeros_like(aw)
    aw_only[:, :, :, level] = aw[:, :, :, level]
    out = deformable.ms_deform_attn(
        jnp.asarray(value), SHAPES, jnp.asarray(locs), jnp.asarray(aw_only))
    b, q = locs.shape[:2]
    heads, hd = value.shape[2], value.shape[3]
    return np.asarray(out).reshape(b, q, heads, hd)


@pytest.mark.parametrize("level,tile", [(0, 4), (1, 4)])
def test_windowed_matches_exact_within_radius(rng, level, tile):
    value, locs, aw = _setup(rng, max_off=float(tile - 2))
    v, gx, gy, awl = _level_inputs(value, locs, aw, level)
    h, w = SHAPES[level]
    assign = dw.build_assignment(SHAPES, level, tile)
    got = np.asarray(dw.sample_level_windowed(
        jnp.asarray(v), jnp.asarray(gx), jnp.asarray(gy), jnp.asarray(awl),
        assign, h, w, interpret=True))
    want = _exact_level(value, locs, aw, level)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)
    assert np.abs(got).max() > 0  # non-degenerate


@pytest.mark.parametrize("tile,radius", [(8, 4), (4, 6)])
def test_windowed_decoupled_radius_matches_exact(rng, tile, radius):
    """radius decoupled from tile: offsets within radius-1 cells stay exact
    regardless of the bucketing tile (window side = tile + 2*radius)."""
    level = 0
    value, locs, aw = _setup(rng, max_off=float(radius - 2))
    v, gx, gy, awl = _level_inputs(value, locs, aw, level)
    h, w = SHAPES[level]
    assign = dw.build_assignment(SHAPES, level, tile)
    got = np.asarray(dw.sample_level_windowed(
        jnp.asarray(v), jnp.asarray(gx), jnp.asarray(gy), jnp.asarray(awl),
        assign, h, w, radius=radius, interpret=True))
    want = _exact_level(value, locs, aw, level)
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)
    assert np.abs(got).max() > 0


def test_windowed_beyond_window_clamps_and_out_of_map_zeroes(rng):
    """Out-of-window handling: samples fully outside the MAP contribute
    exactly 0 (zero-padding parity); in-map samples beyond the window clamp
    to the window edge (the documented approximation)."""
    value, locs, aw = _setup(rng, max_off=0.5)
    level, tile = 0, 4
    h, w = SHAPES[level]
    v, gx, gy, awl = _level_inputs(value, locs, aw, level)
    assign = dw.build_assignment(SHAPES, level, tile)

    # (a) far outside the map -> exactly 0
    got = np.asarray(dw.sample_level_windowed(
        jnp.asarray(v), jnp.asarray(gx + 10 * w), jnp.asarray(gy),
        jnp.asarray(awl), assign, h, w, interpret=True))
    np.testing.assert_array_equal(got, 0)

    # (b) in-map but beyond the window -> the clamped-to-window-edge sample:
    # equals running the kernel with coordinates pre-clamped to each query's
    # window (computed from the assignment geometry)
    gx_far = np.clip(gx + 2.5 * tile, None, w - 1.01)  # in-map, out-of-window for most
    w3 = 3 * tile
    tx0 = (assign.inv // assign.s_pad % assign.ntx).astype(np.float32) * tile - tile
    ty0 = (assign.inv // assign.s_pad // assign.ntx).astype(np.float32) * tile - tile
    gx_clamped = np.clip(gx_far, tx0[None, :, None, None],
                         tx0[None, :, None, None] + w3 - 2)
    gy_clamped = np.clip(gy, ty0[None, :, None, None],
                         ty0[None, :, None, None] + w3 - 2)
    got_far = np.asarray(dw.sample_level_windowed(
        jnp.asarray(v), jnp.asarray(gx_far), jnp.asarray(gy),
        jnp.asarray(awl), assign, h, w, interpret=True))
    got_pre = np.asarray(dw.sample_level_windowed(
        jnp.asarray(v), jnp.asarray(gx_clamped), jnp.asarray(gy_clamped),
        jnp.asarray(awl), assign, h, w, interpret=True))
    np.testing.assert_allclose(got_far, got_pre, atol=1e-5, rtol=1e-5)
    assert np.abs(got_far).max() > 0  # clamped samples DO contribute now


def test_assignment_covers_all_queries():
    assign = dw.build_assignment(SHAPES, 0, 4)
    q = sum(h * w for h, w in SHAPES)
    assert assign.valid.sum() == q
    assert np.array_equal(np.sort(assign.idx[assign.valid]), np.arange(q))
    # inv round-trips: slot -> query -> slot
    flat = assign.idx.reshape(-1)
    assert np.array_equal(flat[assign.inv], np.arange(q))


def test_ms_deform_attn_windowed_matches_exact(rng, monkeypatch):
    """Full ms_deform_attn with windowed=True (forced via env, Pallas
    interpreter on CPU) vs the exact path, raster queries + small offsets."""
    shapes = ((40, 48), (20, 24), (10, 12))  # L0 = 1920 > matmul threshold
    b, heads, hd, p = 1, 2, 8, 2
    q = sum(h * w for h, w in shapes)
    cs = []
    for h, w in shapes:
        ys = (np.arange(h) + 0.5) / h
        xs = (np.arange(w) + 0.5) / w
        g = np.stack(np.meshgrid(xs, ys, indexing="xy"), -1).reshape(-1, 2)
        cs.append(g)
    centers = np.concatenate(cs, 0)
    value = rng.normal(size=(b, q, heads, hd)).astype(np.float32)
    locs = np.zeros((b, q, heads, len(shapes), p, 2), np.float32)
    for li, (h, w) in enumerate(shapes):
        off = rng.uniform(-3, 3, (b, q, heads, p, 2))
        locs[:, :, :, li, :, 0] = centers[None, :, None, None, 0] + off[..., 0] / w
        locs[:, :, :, li, :, 1] = centers[None, :, None, None, 1] + off[..., 1] / h
    aw = rng.uniform(0.0, 1.0, (b, q, heads, len(shapes), p)).astype(np.float32)

    exact = np.asarray(deformable.ms_deform_attn(
        jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(aw)))
    monkeypatch.setenv("BFF_DEFORM_WINDOWED", "1")
    win = np.asarray(deformable.ms_deform_attn(
        jnp.asarray(value), shapes, jnp.asarray(locs), jnp.asarray(aw),
        windowed=True))
    np.testing.assert_allclose(win, exact, atol=3e-2, rtol=3e-2)
    # decoder-style queries (q != sum hw) must silently take the exact path
    dec = np.asarray(deformable.ms_deform_attn(
        jnp.asarray(value), shapes, jnp.asarray(locs[:, :32]),
        jnp.asarray(aw[:, :32]), windowed=True))
    ref = np.asarray(deformable.ms_deform_attn(
        jnp.asarray(value), shapes, jnp.asarray(locs[:, :32]),
        jnp.asarray(aw[:, :32])))
    np.testing.assert_allclose(dec, ref, rtol=1e-5)


def test_full_gdino_forward_windowed_matches_exact(rng, monkeypatch):
    """Model-level integration: the full GDINO forward with the windowed
    encoder kernel (interpret mode) vs the exact path, at a config whose L0
    exceeds the matmul threshold so the kernel actually engages."""
    import jax.numpy as jnp

    from beyondff_tpu.models.gdino import GroundingDINO, model as gdino_model
    from beyondff_tpu.models.gdino import bert as bert_mod, swin as swin_mod

    cfg = gdino_model.GDINOConfig(
        swin=swin_mod.PRESETS["test"], bert=bert_mod.PRESETS["test"],
        hidden=32, heads=2, levels=3, enc_layers=1, dec_layers=1,
        ffn_dim=64, num_queries=16, max_text_len=16,
        image_size=(256, 384),  # L0 = 32x48 = 1536 > _MATMUL_LEVEL_MAX
    )
    g = GroundingDINO.create(cfg, seed=0)
    gh, gw = cfg.image_size
    img = jnp.asarray(rng.normal(size=(1, gh, gw, 3)), jnp.float32)
    t = 6
    ids = jnp.asarray(rng.integers(1, cfg.bert.vocab_size, (1, t)), jnp.int32)
    sm = jnp.ones((1, t, t), bool)
    pm = jnp.ones((1, t), bool)
    pos = jnp.zeros((1, t), jnp.int32)

    monkeypatch.setenv("BFF_DEFORM_WINDOWED", "0")
    exact_logits, exact_boxes = g.module.apply(g.params, img, ids, sm, pm, pos)
    monkeypatch.setenv("BFF_DEFORM_WINDOWED", "1")
    win_logits, win_boxes = g.module.apply(g.params, img, ids, sm, pm, pos)
    # random-init offsets are tiny (within the window radius), so the paths
    # agree to float tolerance through the full network
    np.testing.assert_allclose(np.asarray(win_boxes), np.asarray(exact_boxes),
                               atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(win_logits), np.asarray(exact_logits),
                               atol=2e-2, rtol=2e-2)
