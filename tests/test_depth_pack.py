"""Depth-pack transport: lossless roundtrip, spill guard, native/numpy parity.

The pack must be EXACT (it replaces the raw uint16 upload bit-for-bit —
unlike the accuracy-affecting depth_decimation lever) on every content
class: smooth surfaces, depth edges, invalid-zero speckle, constants, and
it must SPILL (return None) on noise where packing cannot beat raw.
"""

import numpy as np
import pytest

from beyondff_tpu.core import depth_pack


def _smooth(h=120, w=160, seed=0):
    """Rendered-indoor-like depth: smooth surfaces + box edges + zero
    speckle + sensor quantization noise, mm units."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    d = 2000 + 800 * np.sin(xx / 37.0) + 500 * (yy / h)
    for _ in range(6):  # boxes at nearer depth (discontinuities)
        x0, y0 = rng.integers(0, w - 20), rng.integers(0, h - 20)
        dw, dh = rng.integers(10, w // 2), rng.integers(10, h // 2)
        d[y0:y0 + dh, x0:x0 + dw] = 1200 + 100 * np.sin(xx[y0:y0 + dh, x0:x0 + dw] / 11.0)
    d = d + rng.integers(-3, 4, (h, w))  # sensor LSB noise
    d[rng.random((h, w)) < 0.02] = 0  # invalid speckle
    return np.clip(d, 0, 65535).astype(np.uint16)


CASES = {
    "smooth": _smooth(),
    "constant": np.full((64, 96), 1234, np.uint16),
    "zeros": np.zeros((64, 96), np.uint16),
    "gradient": (np.arange(80 * 96).reshape(80, 96) % 4096).astype(np.uint16),
    "odd_size": _smooth(67, 93, seed=3),  # n_px not a multiple of 64
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_roundtrip_exact(name):
    depth = CASES[name]
    packed = depth_pack.pack(depth)
    assert packed is not None, f"{name} unexpectedly spilled"
    # host oracle
    assert np.array_equal(depth_pack.roundtrip_host(packed), depth)
    # device decode
    assert np.array_equal(np.asarray(depth_pack.upload_frame(packed)), depth)


def test_smooth_content_compresses():
    """The _smooth fixture is deliberately pessimistic (steep ~20 mm/px
    gradients everywhere force the 8-bit class, iid speckle maximizes
    escapes); even there the pack must beat raw."""
    depth = _smooth(240, 320)
    packed = depth_pack.pack(depth)
    assert packed is not None
    ratio = packed.nbytes / depth.nbytes
    assert ratio < 0.85, f"wire/raw = {ratio:.2f}"


def test_gentle_content_compresses_hard():
    """Frontal-wall-like content (few mm/px gradients, LSB noise, sparse
    blob speckle — the regime real sensor depth mostly lives in) should
    reach the 2-bit class and compress ~4x+."""
    rng = np.random.default_rng(1)
    h, w = 240, 320
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    d = 2200 + 4.0 * xx + 2.0 * yy + rng.integers(-1, 2, (h, w))
    for _ in range(3):  # speckle blobs, not iid salt
        x0, y0 = rng.integers(0, w - 12), rng.integers(0, h - 12)
        d[y0:y0 + 8, x0:x0 + 12] = 0
    depth = np.clip(d, 0, 65535).astype(np.uint16)
    packed = depth_pack.pack(depth)
    assert packed is not None
    assert np.array_equal(np.asarray(depth_pack.upload_frame(packed)), depth)
    ratio = packed.nbytes / depth.nbytes
    assert ratio < 0.30, f"wire/raw = {ratio:.2f}"


def test_noise_spills():
    rng = np.random.default_rng(0)
    noise = rng.integers(0, 65535, (120, 160)).astype(np.uint16)
    assert depth_pack.pack(noise) is None


def test_native_matches_numpy_pack():
    from beyondff_tpu.utils import native

    if not native.available() or native.depth_pack_native(np.zeros(64, np.uint16)) is None:
        pytest.skip("native library unavailable")
    flat = _smooth(96, 128, seed=5).reshape(-1)
    got = native.depth_pack_native(flat)
    want = depth_pack._pack_arrays_numpy(flat)
    for g, w_, label in zip(got, want, ("classes", "preds", "bases", "stream", "esc_pos", "esc_corr")):
        assert np.array_equal(g, w_), label


def test_batch_matches_singles_mixed_caps():
    frames = [_smooth(96, 128, seed=s) for s in range(3)]
    # widen the escape side channel of one frame so caps differ across the
    # batch (exercises rebucket's padding-escape handling)
    frames[1][::7, ::5] = 0
    packs = [depth_pack.pack(f) for f in frames]
    assert all(p is not None for p in packs)
    assert len({(p.scap, p.ecap) for p in packs}) > 1
    batch = np.asarray(depth_pack.upload_frames(packs))
    singles = np.stack([np.asarray(depth_pack.upload_frame(p)) for p in packs])
    assert np.array_equal(batch, singles)
    assert np.array_equal(batch, np.stack(frames))


def test_batch_mixed_dims_rejected():
    a = depth_pack.pack(_smooth(96, 128))
    b = depth_pack.pack(_smooth(64, 96))
    with pytest.raises(ValueError):
        depth_pack.upload_frames([a, b])


def test_projection_outputs_identical_with_pack(tmp_path, monkeypatch):
    """BFF_DEPTH_PACK=1 must leave the projection stage outputs BIT-identical
    (the transport is lossless; only the wire representation changes)."""
    import os
    import sys

    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    import make_synthetic_scene

    from beyondff_tpu.config import Config
    from beyondff_tpu.pipeline import projection

    root = str(tmp_path / "dproot")
    cfg_path = make_synthetic_scene.generate(root, query="towel", seed=4)
    cfg = Config.from_yaml(cfg_path)

    def run(tag, packed):
        monkeypatch.setenv("BFF_DEPTH_PACK", "1" if packed else "0")
        c = cfg.override(**{
            "paths.mask_3d_dir": os.path.join(root, f"mask_3d_{tag}"),
            "paths.checkpoint_dir": os.path.join(root, f"ckpt_{tag}")})
        projection.run(c, "towel", resume=False)
        return torch.load(os.path.join(root, f"mask_3d_{tag}", "towel",
                                       "scene0000_00.pth"),
                          map_location="cpu", weights_only=False)

    raw = run("raw", packed=False)
    pk = run("pack", packed=True)
    assert np.array_equal(np.asarray(raw["ins"]), np.asarray(pk["ins"]))
    assert np.array_equal(np.asarray(raw["conf"]), np.asarray(pk["conf"]))
    assert list(raw["final_class"]) == list(pk["final_class"])
