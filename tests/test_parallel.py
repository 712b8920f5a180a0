"""Multi-device (8 virtual CPU) sharding: mesh, sharded lift, dp x tp train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beyondff_tpu.core import geometry
from beyondff_tpu.parallel import lift as plift
from beyondff_tpu.parallel import mesh as mesh_lib


pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def test_make_mesh_shapes():
    mesh = mesh_lib.make_mesh(data=-1, model=2)
    assert mesh.shape == {"model": 2, "data": 4}
    mesh = mesh_lib.make_mesh(data=8, model=1)
    assert mesh.shape == {"model": 1, "data": 8}
    with pytest.raises(ValueError):
        mesh_lib.make_mesh(data=3, model=3)


def test_sharded_lift_matches_single_device(rng):
    mesh = mesh_lib.make_mesh(data=8, model=1)
    n, h, w, m = 256, 16, 24, 2
    f = 8
    pcd_h = geometry.homogenize(rng.uniform([-1, -1, 1], [1, 1, 3], (n, 3)))
    intr = np.array([[12.0, 0, w / 2], [0, 12.0, h / 2], [0, 0, 1.0]])
    projs = np.stack([
        geometry.fuse_projection(intr, np.eye(4)).astype(np.float32) for _ in range(f)
    ])
    depths = rng.uniform(1, 3, (f, h, w)).astype(np.float32)
    masks = rng.random((f, m, h * w)) < 0.5
    valid = np.ones((f, m), bool)

    ref = geometry.lift_frames(
        jnp.asarray(pcd_h), jnp.asarray(projs), jnp.asarray(depths),
        jnp.asarray(masks), jnp.asarray(valid))
    sharded_fn = plift.make_sharded_lift(mesh)
    out = sharded_fn(jnp.asarray(pcd_h), jnp.asarray(projs), jnp.asarray(depths),
                     jnp.asarray(masks), jnp.asarray(valid))
    for a, b in zip(ref, out):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tensor_parallel_spec_rules():
    from jax.sharding import PartitionSpec as P
    from jax.tree_util import DictKey

    k2 = np.zeros((4, 4), np.float32)  # dense kernel
    k4 = np.zeros((2, 2, 3, 4), np.float32)  # conv kernel (e.g. patch embed)
    assert mesh_lib.tensor_parallel_spec((DictKey("attn"), DictKey("q"), DictKey("kernel")), k2) == P(None, "model")
    assert mesh_lib.tensor_parallel_spec((DictKey("attn"), DictKey("proj"), DictKey("kernel")), k2) == P("model", None)
    assert mesh_lib.tensor_parallel_spec((DictKey("ln1"), DictKey("scale")), np.zeros(4)) == P()
    # conv kernels must stay replicated even when name-matched: sharding a
    # SPATIAL dim over `model` propagates into the activations (the r4
    # dryrun's involuntary-rematerialization warning on `images`)
    assert mesh_lib.tensor_parallel_spec((DictKey("patch_embed"), DictKey("proj"), DictKey("kernel")), k4) == P()
    assert mesh_lib.tensor_parallel_spec((DictKey("attn"), DictKey("q"), DictKey("bias")), np.zeros(4)) == P("model")


def test_sharded_clip_train_step(rng):
    from beyondff_tpu.models import clip as clip_mod
    from beyondff_tpu.training import make_sharded_train_step

    mesh = mesh_lib.make_mesh(data=4, model=2)
    model = clip_mod.CLIP.create("test", seed=0)
    init_state, train_step = make_sharded_train_step(model.module, mesh)
    state = init_state(model.params)
    c = model.cfg
    images = jnp.asarray(rng.normal(size=(4, c.image_resolution, c.image_resolution, 3)),
                         jnp.float32)
    tokens = jnp.asarray(rng.integers(1, c.vocab_size, (4, c.context_length)), jnp.int32)
    state2, loss = train_step(state, images, tokens)
    assert np.isfinite(float(loss))
    assert int(state2.step) == 1
    # params actually changed
    a = jax.tree_util.tree_leaves(state2.params)[0]
    assert a.dtype == jnp.float32


def test_graft_entry_dryrun():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sharded_packed_lift_matches_single_device(rng):
    mesh = mesh_lib.make_mesh(data=8, model=1)
    n, h, w, m, f = 256, 16, 24, 3, 8
    pcd_h = geometry.homogenize(rng.uniform([-1, -1, 1], [1, 1, 3], (n, 3)))
    intr = np.array([[12.0, 0, w / 2], [0, 12.0, h / 2], [0, 0, 1.0]])
    projs = np.stack([geometry.fuse_projection(intr, np.eye(4)).astype(np.float32)] * f)
    depths = rng.uniform(1, 3, (f, h, w)).astype(np.float32)
    masks = rng.random((f, m, h * w)) < 0.5
    packed = np.stack([geometry.pack_masks(mm) for mm in masks])

    ref = geometry.lift_frames_packed(jnp.asarray(pcd_h), jnp.asarray(projs),
                                      jnp.asarray(depths), jnp.asarray(packed), n_masks=m)
    sharded = plift.make_sharded_lift_packed(mesh, n_masks=m)
    out = sharded(jnp.asarray(pcd_h), jnp.asarray(projs), jnp.asarray(depths),
                  jnp.asarray(packed))
    for a, b in zip(ref, out):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dp_detector_forward_matches_single_device(rng):
    """GDINO batched forward sharded over the data axis == single device."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from beyondff_tpu.models.gdino import GroundingDINO

    gd = GroundingDINO.create("test", seed=0)
    mesh = mesh_lib.make_mesh(data=8, model=1)
    b, t = 8, 6
    h, w = gd.cfg.image_size
    img = jnp.asarray(rng.normal(size=(b, h, w, 3)).astype(np.float32))
    ids = jnp.asarray(rng.integers(1, gd.cfg.bert.vocab_size, (b, t)), jnp.int32)
    sm = jnp.ones((b, t, t), bool)
    pm = jnp.ones((b, t), bool)
    pos = jnp.zeros((b, t), jnp.int32)

    ref_logits, ref_boxes = gd._forward(gd.params, img, ids, sm, pm, pos)

    shard = lambda x: jax.device_put(x, NamedSharding(mesh, P("data")))
    out_logits, out_boxes = gd._forward(
        gd.params, shard(img), shard(ids), shard(sm), shard(pm), shard(pos))
    np.testing.assert_allclose(np.asarray(out_boxes), np.asarray(ref_boxes),
                               rtol=1e-5, atol=1e-5)
    fin = np.isfinite(np.asarray(ref_logits))
    np.testing.assert_allclose(np.asarray(out_logits)[fin], np.asarray(ref_logits)[fin],
                               rtol=1e-4, atol=1e-4)


def test_dp_sam_encode_matches_single_device(rng):
    from beyondff_tpu.models import sam as sam_mod

    sam = sam_mod.SAM.create("test", seed=0)
    s = sam.cfg.img_size
    x = rng.normal(size=(8, s, s, 3)).astype(np.float32)
    dp = np.asarray(sam.encode_image(x))        # 8 devices: auto-sharded
    single = np.asarray(sam.encode_image(x[:1]))  # batch 1: no sharding path
    np.testing.assert_allclose(dp[:1], single, rtol=1e-4, atol=1e-5)


def test_sam_finetune_step_decreases_loss(rng):
    from beyondff_tpu.models import sam as sam_mod
    from beyondff_tpu.training.sam_finetune import make_sam_finetune_step

    mesh = mesh_lib.make_mesh(data=8, model=1)
    sam = sam_mod.SAM.create("test", seed=0)
    g = sam.cfg.img_size // sam.cfg.patch_size
    init_state, step = make_sam_finetune_step(sam.module, mesh, lr=5e-3)
    state = init_state(sam.params)

    b = 8
    emb = jnp.asarray(rng.normal(size=(b, g, g, sam.cfg.prompt_dim)).astype(np.float32))
    boxes = jnp.asarray(rng.uniform(0, sam.cfg.img_size, (b, 4)).astype(np.float32))
    targets = jnp.asarray((rng.random((b, 4 * g, 4 * g)) < 0.3).astype(np.float32))

    losses = []
    for _ in range(5):
        state, loss = step(state, emb, boxes, targets)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # encoder params frozen, decoder params moved
    enc0 = jax.tree_util.tree_leaves(sam.params["params"]["encoder"])[0]
    enc1 = jax.tree_util.tree_leaves(state.params["params"]["encoder"])[0]
    np.testing.assert_array_equal(np.asarray(enc0), np.asarray(enc1))
    dec0 = jax.tree_util.tree_leaves(sam.params["params"]["decoder"])[0]
    dec1 = jax.tree_util.tree_leaves(state.params["params"]["decoder"])[0]
    assert not np.allclose(np.asarray(dec0), np.asarray(dec1))


def test_gdino_predict_batch_dp_sharded_matches_per_image(rng):
    """predict_batch auto-shards over 8 virtual devices when B % ndev == 0;
    results must match the unsharded per-image path (models/gdino/model.py
    predict_batch dp branch)."""
    from beyondff_tpu.models.gdino import GroundingDINO

    gdino = GroundingDINO.create("test")
    images = [rng.integers(0, 255, (48, 64, 3), dtype=np.uint8) for _ in range(8)]
    batched = gdino.predict_batch(images, "chair", box_threshold=-1.0)
    assert len(batched) == 8
    for img, (boxes, scores, phrases) in zip(images, batched):
        b1, s1, p1 = gdino.predict(img, "chair", box_threshold=-1.0)
        np.testing.assert_allclose(boxes, b1, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(scores, s1, rtol=1e-5, atol=1e-6)
        assert phrases == p1


def test_sam_encode_dp_sharded_matches_per_frame(rng):
    """encode_image's data-parallel branch (B divisible by device count) is
    numerically identical to per-frame encodes, on the uint8 device-normalize
    path (models/sam.py encode_image)."""
    from beyondff_tpu.models import sam as sam_mod

    sam = sam_mod.SAM.create("test")
    frames = rng.integers(0, 255, (8, 48, 64, 3), dtype=np.uint8)
    x, input_hw = sam.preprocess(frames)
    sharded = np.asarray(sam.encode_image(x, input_hw=input_hw))
    for i in range(8):
        xi, hw_i = sam.preprocess(frames[i:i + 1])
        assert hw_i == input_hw
        single = np.asarray(sam.encode_image(xi, input_hw=hw_i))
        np.testing.assert_allclose(sharded[i], single[0], rtol=1e-5, atol=1e-6)


def test_sharded_lift_rle_matches_single_device(rng):
    """RLE lift under shard_map (frames over data axis, psum counts) equals
    the single-device lift_frames_rle."""
    import jax.numpy as jnp

    from beyondff_tpu.core import rle as rle_mod

    mesh = mesh_lib.make_mesh(data=8, model=1)
    n, h, w, m, f = 256, 16, 24, 2, 8
    pcd_h = geometry.homogenize(rng.uniform([-1, -1, 1], [1, 1, 3], (n, 3)))
    intr = np.array([[12.0, 0, w / 2], [0, 12.0, h / 2], [0, 0, 1.0]])
    projs = np.stack([
        geometry.fuse_projection(intr, np.eye(4)).astype(np.float32) for _ in range(f)])
    depths = rng.uniform(1, 3, (f, h, w)).astype(np.float32)
    masks = rng.random((f, m, h * w)) < 0.4
    r_pad = 256
    st = np.full((f, m, r_pad), h * w + 1, np.int32)
    en = np.zeros((f, m, r_pad), np.int32)
    for i in range(f):
        for j in range(m):
            s0, e0 = rle_mod.rle_bounds(rle_mod.rle_encode(masks[i, j]))
            st[i, j, : len(s0)] = s0
            en[i, j, : len(e0)] = e0

    ref = geometry.lift_frames_rle(
        jnp.asarray(pcd_h), jnp.asarray(projs), jnp.asarray(depths),
        jnp.asarray(st), jnp.asarray(en))
    fn = plift.make_sharded_lift_rle(mesh)
    out = fn(jnp.asarray(pcd_h), jnp.asarray(projs), jnp.asarray(depths),
             jnp.asarray(st), jnp.asarray(en))
    for a, b in zip(out, ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_tp_sharded_inference_matches_replicated(rng):
    """Inference models under tensor parallelism: SAM encode and the GDINO
    forward run with params sharded over model=2 (tensor_parallel_spec) and
    must match replicated execution — and the partition rules must actually
    fire (load-bearing, not vacuously replicated)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from beyondff_tpu.models import sam as sam_mod
    from beyondff_tpu.models.gdino import GroundingDINO

    mesh = mesh_lib.make_mesh(data=4, model=2)

    def model_sharded_leaves(params):
        return sum(
            1 for leaf in jax.tree_util.tree_leaves(params)
            if any(s is not None for s in leaf.sharding.spec)
        )

    # --- SAM image encoder
    sam = sam_mod.SAM.create("test", seed=0)
    tp = mesh_lib.shard_params(sam.params, mesh)
    assert model_sharded_leaves(tp) >= 10
    s = sam.cfg.img_size
    x = jnp.asarray(rng.normal(size=(1, s, s, 3)).astype(np.float32))
    ref = np.asarray(sam.module.apply(sam.params, x, method=sam_mod.SAMModule.encode))
    with mesh:
        out = np.asarray(jax.jit(
            lambda p, x: sam.module.apply(p, x, method=sam_mod.SAMModule.encode)
        )(tp, jax.device_put(x, NamedSharding(mesh, P()))))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)

    # --- GDINO detection forward
    gd = GroundingDINO.create("test", seed=0)
    tp = mesh_lib.shard_params(gd.params, mesh)
    assert model_sharded_leaves(tp) >= 10
    h, w = gd.cfg.image_size
    b, t = 1, 6
    img = jnp.asarray(rng.normal(size=(b, h, w, 3)).astype(np.float32))
    ids = jnp.asarray(rng.integers(1, gd.cfg.bert.vocab_size, (b, t)), jnp.int32)
    sm, pm = jnp.ones((b, t, t), bool), jnp.ones((b, t), bool)
    pos = jnp.zeros((b, t), jnp.int32)
    ref_logits, ref_boxes = gd._forward(gd.params, img, ids, sm, pm, pos)
    with mesh:
        logits, boxes = jax.jit(
            lambda p, *a: gd.module.apply(p, *a)
        )(tp, img, ids, sm, pm, pos)
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(ref_boxes),
                               rtol=1e-4, atol=1e-4)
    fin = np.isfinite(np.asarray(ref_logits))
    np.testing.assert_allclose(np.asarray(logits)[fin], np.asarray(ref_logits)[fin],
                               rtol=1e-3, atol=1e-3)


def test_process_scene_frame_sharded_matches_unsharded(rng, tmp_path):
    """The seg2d driver end-to-end with frame_batch=8 (frames auto-sharded
    over the 8 virtual devices in predict_batch/encode_image) must produce
    the same records as frame_batch=1 (strictly unsharded single-frame
    dispatches) — the multi-chip path of the 2D stage
    (reference hot loop: tools/segmentation_2d.py:243)."""
    import cv2

    from beyondff_tpu.config import Config
    from beyondff_tpu.pipeline.segmentation_2d import Segmentor2D

    scene = tmp_path / "scene0000_00" / "color"
    scene.mkdir(parents=True)
    for i in range(8):
        img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        cv2.imwrite(str(scene / f"{i}.jpg"), img)

    def records(frame_batch):
        cfg = Config.from_dict({
            "paths": {"scene_2d_dir": str(tmp_path)},
            "frames": {"width_2d": 64, "height_2d": 48, "downsample_ratio": 1},
            "detector": {"box_threshold": -1.0, "must_match_query": False,
                         "similarity_threshold": -1.0, "max_detections": 4,
                         "dtype": "float32", "frame_batch": frame_batch},
        })
        seg = Segmentor2D(cfg)
        return seg.process_scene("scene0000_00", "clothes")

    sharded = records(8)
    single = records(1)
    assert len(sharded) == len(single) == 8
    for a, b in zip(sharded, single):
        assert a["frame_id"] == b["frame_id"]
        assert a["labels"] == b["labels"]
        np.testing.assert_allclose(a["confidences"], b["confidences"],
                                   rtol=1e-4, atol=1e-5)
        ma = np.asarray(a["segmented_frame_masks"])
        mb = np.asarray(b["segmented_frame_masks"])
        assert ma.shape == mb.shape
        assert (ma != mb).mean() < 1e-3  # bilinear reduction-order flips only
