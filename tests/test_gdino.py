"""Grounding-DINO: tiny-config forward, phrase extraction, sub-modules."""

import numpy as np
import pytest

from beyondff_tpu.models.gdino import GroundingDINO
from beyondff_tpu.models.gdino import bert as bert_mod
from beyondff_tpu.models.gdino.deformable import ms_deform_attn

import jax.numpy as jnp


def test_ms_deform_attn_center_sampling():
    """Sampling exactly at a pixel center with weight 1 returns that value."""
    h, w, heads, hd = 4, 6, 2, 3
    val = np.arange(h * w * heads * hd, dtype=np.float32).reshape(1, h * w, heads, hd)
    # one query, one level, one point: sample pixel (row 1, col 2) center
    loc = np.zeros((1, 1, heads, 1, 1, 2), np.float32)
    loc[..., 0] = (2 + 0.5) / w
    loc[..., 1] = (1 + 0.5) / h
    wgt = np.ones((1, 1, heads, 1, 1), np.float32)
    out = np.asarray(ms_deform_attn(jnp.asarray(val), [(h, w)], jnp.asarray(loc), jnp.asarray(wgt)))
    expect = val[0, 1 * w + 2].reshape(-1)
    np.testing.assert_allclose(out[0, 0], expect, rtol=1e-5)


def test_ms_deform_attn_bilinear_midpoint():
    """Sampling between two pixel centers averages them."""
    h, w = 2, 2
    val = np.array([[1.0], [3.0], [5.0], [7.0]], np.float32).reshape(1, 4, 1, 1)
    loc = np.zeros((1, 1, 1, 1, 1, 2), np.float32)
    loc[..., 0] = 0.5  # x midway between the two columns
    loc[..., 1] = 0.25  # y at row-0 center
    wgt = np.ones((1, 1, 1, 1, 1), np.float32)
    out = np.asarray(ms_deform_attn(jnp.asarray(val), [(h, w)], jnp.asarray(loc), jnp.asarray(wgt)))
    np.testing.assert_allclose(out[0, 0, 0], 2.0, rtol=1e-5)  # (1+3)/2


def test_subsentence_masks():
    # [CLS] a b . c [SEP]
    ids = np.array([[2, 10, 11, 4, 12, 3]])
    mask, pos = bert_mod.subsentence_masks(ids, [4], cls_id=2, sep_id=3)
    m = mask[0]
    assert m[1, 2] and m[2, 1]  # a <-> b same phrase
    assert not m[1, 4] and not m[4, 1]  # a <-/-> c across '.'
    assert m[0, 0] and m[5, 5]  # specials attend to themselves
    assert pos[0, 1] == 0 and pos[0, 2] == 1  # phrase-local positions
    assert pos[0, 4] == 0  # restart after '.'


@pytest.fixture(scope="module")
def tiny_gdino():
    return GroundingDINO.create("test", seed=0)


def test_predict_shapes(tiny_gdino):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (48, 72, 3), dtype=np.uint8)
    boxes, scores, phrases = tiny_gdino.predict(img, "clothes", box_threshold=0.0,
                                                text_threshold=0.0)
    assert boxes.shape[1] == 4
    assert boxes.shape[0] == scores.shape[0] == len(phrases)
    assert boxes.shape[0] <= tiny_gdino.cfg.num_queries
    assert np.all(boxes >= 0) and np.all(boxes <= 1)


def test_high_threshold_filters(tiny_gdino):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (48, 72, 3), dtype=np.uint8)
    boxes, scores, _ = tiny_gdino.predict(img, "clothes", box_threshold=1.0)
    assert boxes.shape[0] == 0 and scores.shape[0] == 0


def test_ms_deform_attn_out_of_bounds_zero():
    """Points sampling outside the map contribute zero (zero-padding semantics)."""
    h, w = 4, 4
    val = np.ones((1, h * w, 1, 2), np.float32) * 5.0
    loc = np.zeros((1, 3, 1, 1, 1, 2), np.float32)
    loc[0, 0, ..., 0], loc[0, 0, ..., 1] = -0.5, 0.5   # far left
    loc[0, 1, ..., 0], loc[0, 1, ..., 1] = 0.5, 1.5    # far below
    loc[0, 2, ..., 0], loc[0, 2, ..., 1] = 0.5, 0.5    # center (valid)
    wgt = np.ones((1, 3, 1, 1, 1), np.float32)
    out = np.asarray(ms_deform_attn(jnp.asarray(val), [(h, w)], jnp.asarray(loc), jnp.asarray(wgt)))
    np.testing.assert_allclose(out[0, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[0, 1], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[0, 2], 5.0, rtol=1e-5)


def test_ms_deform_attn_edge_pixel_exact():
    """Sampling exactly at the last row/column's center uses that pixel."""
    h, w = 3, 5
    val = np.arange(h * w, dtype=np.float32).reshape(1, h * w, 1, 1)
    loc = np.zeros((1, 1, 1, 1, 1, 2), np.float32)
    loc[..., 0] = (w - 1 + 0.5) / w   # last column center
    loc[..., 1] = (h - 1 + 0.5) / h   # last row center
    wgt = np.ones((1, 1, 1, 1, 1), np.float32)
    out = np.asarray(ms_deform_attn(jnp.asarray(val), [(h, w)], jnp.asarray(loc), jnp.asarray(wgt)))
    np.testing.assert_allclose(out[0, 0, 0], h * w - 1, rtol=1e-5)


def test_deformable_matmul_and_gather_paths_agree(rng):
    """Levels under/over the matmul threshold produce consistent samples."""
    from beyondff_tpu.models.gdino import deformable

    b, heads, hd, p = 2, 2, 8, 3
    for hw in [(6, 9), (40, 40)]:  # matmul path / gather path
        h, w = hw
        q = 15
        val = jnp.asarray(rng.normal(size=(b, h * w, heads, hd)).astype(np.float32))
        locs = jnp.asarray(rng.uniform(-0.2, 1.2, (b, q, heads, 1, p, 2)).astype(np.float32))
        wgt = jnp.asarray(rng.random((b, q, heads, 1, p)).astype(np.float32))
        out = np.asarray(ms_deform_attn(val, [hw], locs, wgt))
        # numpy oracle: direct bilinear with zero padding
        ref = np.zeros((b, q, heads * hd), np.float32)
        vnp = np.asarray(val).reshape(b, h, w, heads, hd)
        for bi in range(b):
            for qi in range(q):
                for hi in range(heads):
                    acc = np.zeros(hd, np.float32)
                    for pi in range(p):
                        gx = locs[bi, qi, hi, 0, pi, 0] * w - 0.5
                        gy = locs[bi, qi, hi, 0, pi, 1] * h - 0.5
                        x0, y0 = int(np.floor(gx)), int(np.floor(gy))
                        fx, fy = gx - x0, gy - y0
                        s = np.zeros(hd, np.float32)
                        for dy, wy_ in ((0, 1 - fy), (1, fy)):
                            for dx, wx_ in ((0, 1 - fx), (1, fx)):
                                yy, xx = y0 + dy, x0 + dx
                                if 0 <= yy < h and 0 <= xx < w:
                                    s += float(wy_ * wx_) * vnp[bi, yy, xx, hi]
                        acc += float(wgt[bi, qi, hi, 0, pi]) * s
                    ref[bi, qi, hi * hd:(hi + 1) * hd] = acc
        np.testing.assert_allclose(out, ref, rtol=3e-4, atol=3e-5,
                                   err_msg=f"hw={hw}")


def test_ms_deform_attn_gather_path_matches_matmul_path(rng, monkeypatch):
    """Large levels route through the paired-map gather; forcing the same
    level through the separable-matmul interpolation path must agree
    (deformable.py _MATMUL_LEVEL_MAX dispatch)."""
    from beyondff_tpu.models.gdino import deformable as dfm

    h, w, heads, hd, q, p = 36, 36, 2, 4, 7, 3  # h*w=1296 > 1024 -> gather
    val = rng.normal(size=(1, h * w, heads, hd)).astype(np.float32)
    # locations spanning in-bounds, edges, and out-of-bounds
    loc = rng.uniform(-0.2, 1.2, (1, q, heads, 1, p, 2)).astype(np.float32)
    wgt = rng.uniform(0, 1, (1, q, heads, 1, p)).astype(np.float32)

    out_gather = np.asarray(dfm.ms_deform_attn(
        jnp.asarray(val), [(h, w)], jnp.asarray(loc), jnp.asarray(wgt)))
    monkeypatch.setattr(dfm, "_MATMUL_LEVEL_MAX", h * w)
    out_matmul = np.asarray(dfm.ms_deform_attn(
        jnp.asarray(val), [(h, w)], jnp.asarray(loc), jnp.asarray(wgt)))
    np.testing.assert_allclose(out_gather, out_matmul, rtol=1e-4, atol=1e-5)


def test_predict_batch_frames_matches_host_path(rng):
    """Single-upload detection: when the uploaded frame is already at the
    detector input size the on-device resize is the identity, so the frames
    path must reproduce the host path exactly."""
    import jax.numpy as jnp

    from beyondff_tpu.models.gdino import GroundingDINO

    gd = GroundingDINO.create("test", seed=0)
    h, w = gd.cfg.image_size
    imgs = [rng.integers(0, 255, (h, w, 3), dtype=np.uint8) for _ in range(2)]
    ref = gd.predict_batch(imgs, "chair", box_threshold=-1.0)
    got = gd.predict_batch_frames(jnp.stack([jnp.asarray(i) for i in imgs]),
                                  "chair", box_threshold=-1.0)
    for (rb, rs, rp), (gb, gs, gp) in zip(ref, got):
        np.testing.assert_allclose(gb, rb, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(gs, rs, rtol=1e-4, atol=1e-5)
        assert gp == rp

def test_split_backbone_detect_matches_call(tiny_gdino):
    """detect(backbone(x)) must be BIT-identical to __call__(x): the
    multi-class sweep banks the text-independent preamble and re-runs only
    the text-conditioned half (models/gdino/model.py split)."""
    import jax

    from beyondff_tpu.models.gdino.model import GDINOModule

    g = tiny_gdino
    h, w = g.cfg.image_size
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.standard_normal((1, h, w, 3)).astype(np.float32))
    t = 8
    ids = jnp.asarray(rng.integers(5, 50, (1, t)), jnp.int32)
    sm = jnp.ones((1, t, t), bool)
    pm = jnp.ones((1, t), bool)
    pos = jnp.asarray(np.arange(t)[None], jnp.int32)
    lo, bo = g.module.apply(g.params, img, ids, sm, pm, pos)
    feats = g.module.apply(g.params, img, method=GDINOModule.backbone)
    lo2, bo2 = g.module.apply(g.params, feats, ids, sm, pm, pos,
                              method=GDINOModule.detect)
    assert jnp.array_equal(lo, lo2) and jnp.array_equal(bo, bo2)


def test_async_feats_cache_matches_uncached(rng):
    """predict_batch_frames_async with a feats_cache (multi-class banking)
    must produce the same detections as the uncached dispatch, and the
    second call must be served from the bank."""
    from beyondff_tpu.models.gdino import GroundingDINO

    gd = GroundingDINO.create("test", seed=0)
    assert gd.supports_feats_cache
    h, w = gd.cfg.image_size
    frames = jnp.asarray(
        rng.integers(0, 255, (2, h, w, 3)).astype(np.uint8))
    ref = gd.predict_finalize(
        gd.predict_batch_frames_async(frames, "chair"), box_threshold=-1.0)

    bank = {}
    got1 = gd.predict_finalize(
        gd.predict_batch_frames_async(frames, "chair",
                                      feats_cache=(bank, ("det_feats", 0))),
        box_threshold=-1.0)
    assert ("det_feats", 0) in bank
    feats_id = id(bank[("det_feats", 0)])
    got2 = gd.predict_finalize(
        gd.predict_batch_frames_async(frames, "chair",
                                      feats_cache=(bank, ("det_feats", 0))),
        box_threshold=-1.0)
    assert id(bank[("det_feats", 0)]) == feats_id  # cache hit, not recompute

    for (rb, rs, rp), (gb, gs, gp), (hb, hs, hp) in zip(ref, got1, got2):
        np.testing.assert_allclose(gb, rb, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(gs, rs, rtol=1e-5, atol=1e-6)
        assert gp == rp
        np.testing.assert_array_equal(gb, hb)
        np.testing.assert_array_equal(gs, hs)


def test_caption_spans(tiny_gdino):
    """Fused multi-phrase caption: spans isolate each class's tokens,
    excluding [CLS]/[SEP]/'.' separators (fused multi-class sweep)."""
    caption, spans = tiny_gdino.caption_spans(["red chair", "towel", "tv"])
    assert caption == "red chair . towel . tv."
    assert len(spans) == 3
    enc = tiny_gdino.tokenizer([caption])
    ids = np.asarray(enc["input_ids"][0])
    seps = {tiny_gdino._cls_id(), tiny_gdino._sep_id(),
            *tiny_gdino._special_ids()}
    # spans are disjoint, ordered, and cover exactly the non-separator tokens
    covered = []
    for s, e in spans:
        assert e > s
        assert not any(int(t) in seps for t in ids[s:e])
        covered.extend(range(s, e))
    assert covered == sorted(covered)
    uncovered = [i for i in range(len(ids)) if i not in covered]
    assert all(int(ids[i]) in seps for i in uncovered)
    # multi-word phrase spans both its tokens
    assert spans[0][1] - spans[0][0] == 2


def test_demux_whole_span_matches_finalize(tiny_gdino):
    """predict_finalize_demux with ONE span covering every caption token is
    exactly predict_finalize: the in-model packed score is the max sigmoid
    over all (non-pad) caption tokens, which the span max reproduces."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 255, (48, 72, 3), dtype=np.uint8)
    handle = tiny_gdino._dispatch([img], "clothes", frames=False)
    t = np.asarray(handle[1]).shape[1]
    ref = tiny_gdino.predict_finalize(handle, box_threshold=0.2,
                                      text_threshold=0.25)
    demux = tiny_gdino.predict_finalize_demux(handle, [(0, t)],
                                              box_threshold=0.2,
                                              text_threshold=0.25)
    assert len(demux) == len(ref) == 1
    (rb, rs, rp), (db, ds, dp) = ref[0], demux[0][0]
    np.testing.assert_array_equal(db, rb)
    np.testing.assert_array_equal(ds, rs)
    assert dp == rp


def test_demux_span_scores_are_span_maxima(tiny_gdino):
    """Per-class demux scores equal the max packed sigmoid over that class's
    token span, and each class's keep-set thresholds independently."""
    rng = np.random.default_rng(9)
    img = rng.integers(0, 255, (48, 72, 3), dtype=np.uint8)
    caption, spans = tiny_gdino.caption_spans(["chair", "towel"])
    handle = tiny_gdino._dispatch([img], caption, frames=False)
    packed = np.asarray(handle[0], np.float32)
    probs = packed[0, :, 5:]
    out = tiny_gdino.predict_finalize_demux(handle, spans, box_threshold=0.3,
                                            text_threshold=0.25)
    for (s, e), (boxes, scores, phrases) in zip(spans, out[0]):
        want = probs[:, s:e].max(axis=1)
        keep = want > 0.3
        np.testing.assert_allclose(scores, want[keep], rtol=1e-6)
        assert boxes.shape[0] == int(keep.sum()) == len(phrases)

    # per-span thresholds: each class keeps its own operating point
    thr = [float(np.median(probs[:, s:e].max(axis=1))) for s, e in spans]
    out2 = tiny_gdino.predict_finalize_demux(handle, spans, box_threshold=thr,
                                             text_threshold=0.25)
    for (s, e), t, (boxes, scores, _p) in zip(spans, thr, out2[0]):
        want = probs[:, s:e].max(axis=1)
        np.testing.assert_allclose(scores, want[want > t], rtol=1e-6)
    with np.testing.assert_raises(ValueError):
        tiny_gdino.predict_finalize_demux(handle, spans, box_threshold=[0.3])
