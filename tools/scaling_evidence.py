#!/usr/bin/env python
"""Multi-chip scaling evidence for the seg2d/projection DP design.

Two artifacts, replacing round-3's uninformative virtual-mesh wall-clock
ratios (all 8 virtual devices share one host core, so wall time proves
nothing):

1. ``--hlo`` (CPU, 8 virtual devices): compile the ACTUAL sharded programs —
   the frame-sharded GDINO detection forward and the frame-sharded RLE lift —
   and count cross-device collectives in the optimized HLO. The DP claim is
   that detection is collective-free (params replicated, frames independent)
   and the lift's only collectives are the psum pair reducing the per-point
   masked/viewed counts; this makes that checkable instead of asserted.

2. ``--analytic`` (real TPU): measure the projection stage's device programs
   (depth prep + RLE lift chunk, view-count chunk, aggregate+filter) and the
   host-side feed (PNG decode rate, host->device upload bandwidth), then
   print the n-chip projection table under stated assumptions:

   - det/view frame chunks divide across chips (frames are independent);
   - aggregate+filter stays single-chip (one (I, I) IoU per scene, ~ms);
   - the lift's psum pair costs ~(N * 4 B) x 2 over ICI per scene (sub-ms at
     250k points) — counted but negligible;
   - the host feed does NOT divide on a single host: per-chip upload
     bandwidth is the measured single-stream rate, so the table reports both
     the chip-bound time and the host-feed-bound time, and the honest
     per-scene projection = max(device/n, host_feed) + agg.

Outputs one JSON line per artifact (collected into SCALING_rNN.json).

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/scaling_evidence.py --hlo
    python tools/scaling_evidence.py --analytic          # real TPU
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

COLLECTIVE_OPS = ("all-reduce", "all-gather", "reduce-scatter",
                  "collective-permute", "all-to-all")


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def count_collectives(hlo_text: str):
    counts = {}
    for op in COLLECTIVE_OPS:
        # HLO instruction names: %all-reduce.1 = ... all-reduce(...)
        n = hlo_text.count(f" {op}(") + hlo_text.count(f" {op}-start(")
        if n:
            counts[op] = n
    return counts


def hlo_evidence(n_devices: int):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}").strip()
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    jax.config.update("jax_platforms", "cpu")
    from beyondff_tpu.core import geometry
    from beyondff_tpu.models.gdino import GroundingDINO
    from beyondff_tpu.parallel import lift as plift

    devices = jax.devices("cpu")[:n_devices]
    mesh = Mesh(np.asarray(devices), ("data",))
    sh = NamedSharding(mesh, P("data"))
    out = {"n_devices": n_devices}

    # --- frame-sharded detection program (the dp seg2d batch): the driver
    # device_puts the frame batch with P("data") and calls the jitted topk
    # forward (models/gdino/model.py _dispatch, sharded branch)
    gdino = GroundingDINO.create("test", dtype=jnp.float32)
    b = n_devices
    h, w = 64, 48
    frames = jax.device_put(
        np.zeros((b, h, w, 3), np.uint8), sh)
    t_len = 8
    tile = lambda x: jax.device_put(np.broadcast_to(x, (b, *x.shape[1:])), sh)
    ids = tile(np.ones((1, t_len), np.int32))
    self_mask = tile(np.ones((1, t_len, t_len), bool))
    pad = tile(np.ones((1, t_len), bool))
    pos = tile(np.zeros((1, t_len), np.int32))
    lowered = gdino._sharded_frames_fwd(mesh).lower(
        gdino.params, frames, ids, self_mask, pad, pos)
    hlo = lowered.compile().as_text()
    det_coll = count_collectives(hlo)
    out["detection_dp"] = {
        "program": "gdino _sharded_frames_fwd (shard_map over 'data'), frames sharded, params replicated",
        "hlo_instructions": hlo.count("\n"),
        "collectives": det_coll,
        "collective_free": not det_coll,
    }
    log(f"detection dp collectives: {det_coll or 'NONE'} "
        f"({hlo.count(chr(10))} HLO lines)")

    # --- frame-sharded RLE lift: psum-reduced (N,) masked/viewed counts are
    # the design's ONLY cross-device communication (parallel/lift.py)
    n_pts = 16384
    pcd_h = jnp.asarray(geometry.homogenize(
        np.random.default_rng(0).uniform(-2, 2, (n_pts, 3)).astype(np.float32)))
    intr = np.array([[280.0, 0, 160], [0, 280.0, 120], [0, 0, 1.0]])
    projs = np.stack([geometry.fuse_projection(intr, np.eye(4)).astype(np.float32)
                      for _ in range(8)])
    depths = np.ones((8, 240, 320), np.float32)
    st = np.zeros((8, 2, 64), np.int32)
    en = np.ones((8, 2, 64), np.int32)
    lift = plift.make_sharded_lift_rle(mesh)
    lowered = lift.lower(pcd_h, jax.device_put(projs, sh), jax.device_put(depths, sh),
                         jax.device_put(st, sh), jax.device_put(en, sh))
    hlo = lowered.compile().as_text()
    lift_coll = count_collectives(hlo)
    out["lift_dp"] = {
        "program": "make_sharded_lift_rle, frames sharded P('data'), points replicated",
        "collectives": lift_coll,
        "expected": "all-reduce(s) for the (N,) masked/viewed count psum pair only",
        "psum_bytes_per_scene_at_250k_pts": 2 * 250_000 * 4,
    }
    log(f"lift dp collectives: {lift_coll or 'NONE'}")

    # membership stays sharded on the frame axis (device_membership path
    # consumes it per-chunk), so no all-gather should appear for it
    print(json.dumps({"artifact": "hlo_collectives", **out}))
    return out


def analytic_table(chips=(1, 2, 4, 8)):
    """Real-TPU measured inputs -> n-chip projection table."""
    import jax
    import jax.numpy as jnp

    from beyondff_tpu.config import Config
    from beyondff_tpu.core import aggregation, filtering, geometry
    from beyondff_tpu.pipeline import projection

    cfg = Config()
    n_points, n_frames, det_every = 250_000, 300, 4
    h2d, w2d = cfg.frames.height_2d, cfg.frames.width_2d

    def sync(x):
        leaves = jax.tree_util.tree_leaves(x)
        float(jax.device_get(jnp.asarray(leaves[0]).reshape(-1)[0].astype(jnp.float32)))

    def timed(name, fn, iters=4):
        t0 = time.time()
        out = fn()
        sync(out)
        log(f"{name}: compile+first {time.time() - t0:.1f}s")
        rounds = []
        for _ in range(2):
            t0 = time.time()
            for _ in range(iters):
                out = fn()
            sync(out)
            rounds.append((time.time() - t0) / iters)
        dt = min(rounds)
        log(f"{name}: steady {dt * 1000:.1f} ms")
        return dt

    rng = np.random.default_rng(1)
    pcd = rng.uniform([-2, -1.5, 1.0], [2, 1.5, 4.0], (n_points, 3)).astype(np.float32)
    pcd_dev = jnp.asarray(projection._pad_points(geometry.homogenize(pcd)))
    intr = np.array([[1170.0, 0, w2d / 2], [0, 1170.0, h2d / 2], [0, 0, 1.0]])
    projs8 = jnp.asarray(np.stack([geometry.fuse_projection(intr, np.eye(4))
                                   for _ in range(8)]).astype(np.float32))
    projs32 = jnp.asarray(np.stack([geometry.fuse_projection(intr, np.eye(4))
                                    for _ in range(32)]).astype(np.float32))
    raw8 = jnp.asarray(rng.integers(500, 4000, (8, 480, 640)).astype(np.uint16))
    raw32 = jnp.asarray(rng.integers(500, 4000, (32, 480, 640)).astype(np.uint16))
    r_pad = 1024
    st1 = np.sort(rng.integers(0, h2d * w2d, (1, 1, r_pad)), axis=-1)
    en1 = np.minimum(st1 + rng.integers(1, 64, st1.shape), h2d * w2d)
    st = jnp.asarray(np.broadcast_to(st1, (8, 1, r_pad)), jnp.int32)
    en = jnp.asarray(np.broadcast_to(en1, (8, 1, r_pad)), jnp.int32)

    t_det = timed("det chunk (8 frames: depth prep + RLE lift)", lambda: geometry.lift_frames_rle(
        pcd_dev, projs8, geometry.prepare_depth(raw8, (h2d, w2d), 1000.0), st, en, 0.08))
    t_view = timed("view chunk (32 frames)", lambda: geometry.view_counts(
        pcd_dev, projs32, geometry.prepare_depth(raw32, (h2d, w2d), 1000.0), 0.08))

    membership, mc, vc = geometry.lift_frames_rle(
        pcd_dev, projs8, geometry.prepare_depth(raw8, (h2d, w2d), 1000.0), st, en, 0.08)
    n_det = n_frames // det_every
    det_chunks = -(-n_det // 8)
    view_chunks = -(-(n_frames - n_det) // 32)
    chunks = [(membership, [1] * 8)] * det_chunks
    mc_h = np.asarray(mc, np.int64)[:n_points]
    vc_h = np.asarray(vc, np.int64)[:n_points]

    def agg_filter():
        agg = aggregation.aggregate_chunks(
            chunks, n_points, [0.9] * (8 * det_chunks), ["c"] * (8 * det_chunks),
            iou_thres=0.2, min_aggregated_masks=2)
        return filtering.filter_masks(agg, mc_h, vc_h, cfg.filtering)

    t0 = time.time()
    out0 = agg_filter()
    log(f"aggregate+filter compile+first {time.time() - t0:.1f}s")
    t_aggf = 1e9
    for _ in range(2):
        t0 = time.time()
        out0 = agg_filter()
        t_aggf = min(t_aggf, time.time() - t0)
    # agg_filter's wall time includes downloading the final masks
    # (out.ins, ~Ins x N bool); split that out at the LIVE download rate so
    # a bandwidth override applies to it consistently (the r5 session's
    # collapsed link otherwise poisons this term ~20x)
    agg_dl_bytes = int(out0.ins.nbytes + out0.conf.nbytes + 8 * n_points)
    dbuf = jnp.asarray(np.random.randint(0, 255, (4 << 20,), np.uint8)) + 1
    np.asarray(jax.device_get(dbuf))
    t0 = time.time()
    np.asarray(jax.device_get(dbuf))
    down_bw_live = dbuf.nbytes / (time.time() - t0)
    t_agg_device = max(t_aggf - agg_dl_bytes / down_bw_live, 0.01)
    log(f"aggregate+filter: wall {t_aggf:.2f}s, download {agg_dl_bytes / 1e6:.0f} MB "
        f"at live {down_bw_live / 1e6:.1f} MB/s -> device {t_agg_device:.2f}s")

    # host feed: PNG depth decode rate + host->device upload bandwidth
    import cv2

    png = cv2.imencode(".png", np.asarray(raw8[0]))[1].tobytes()
    t0 = time.time()
    for _ in range(20):
        cv2.imdecode(np.frombuffer(png, np.uint8), cv2.IMREAD_UNCHANGED)
    t_png = (time.time() - t0) / 20

    # upload bandwidth in the DRIVER'S pattern: the prefetch thread async-
    # dispatches per-frame transfers and only chunk consumption fences, so
    # transfers pipeline — a fenced-per-transfer probe reads ~13-16 MB/s
    # where this pattern reads ~35-45 MB/s on the same link
    # (tools/probe_link.py sections 3a/3b), and the real driver measured
    # 3.9-4.2 s/scene e2e this session (BENCH r4), consistent only with the
    # pipelined rate. Best-of-2 per the co-tenant rule.
    bufs = [np.random.randint(0, 255, (2 << 20,), np.uint8) for _ in range(8)]
    jax.device_get(jnp.asarray(bufs[0])[:1])  # warm path
    reduce8 = jax.jit(
        lambda *xs: sum(x[:1].astype(jnp.float32).sum() for x in xs))
    t_up = 1e9
    for _ in range(2):
        t0 = time.time()
        devs = [jnp.asarray(b) for b in bufs]
        float(jax.device_get(reduce8(*devs)))
        t_up = min(t_up, time.time() - t0)
    upload_bw = sum(b.nbytes for b in bufs) / t_up
    bw_override = os.environ.get("BFF_SCALING_UPLOAD_BW_MB")
    bw_note = ""
    if bw_override:
        # the shared tunnel's co-tenant weather swings 10x within a session
        # (round-5 log: 0.5-65 MB/s); the override lets the table be built
        # from a reference-session bandwidth while everything else is
        # measured live — both values are recorded
        bw_note = (f"upload_bw injected at {float(bw_override):.1f} MB/s "
                   f"(live probe this run: {upload_bw / 1e6:.1f} MB/s)")
        upload_bw = float(bw_override) * 1e6
    depth_bytes = n_frames * 480 * 640 * 2
    host_feed_s = n_frames * t_png + depth_bytes / upload_bw
    log(f"host feed: PNG decode {t_png * 1e3:.1f} ms/frame, upload "
        f"{upload_bw / 1e6:.0f} MB/s (pipelined, best-of-2) -> "
        f"{host_feed_s:.2f} s/scene ({depth_bytes / 1e6:.0f} MB depth)")

    # depth-pack transport (core/depth_pack.py): measured pack rate + wire
    # ratio on sensor-like content (the content class real depth lives in;
    # the pack spills to raw on noise). The packed feed replaces the raw
    # upload term: n_frames * (t_png + t_pack) + packed_bytes / upload_bw.
    from beyondff_tpu.core import depth_pack as _dp

    rng2 = np.random.default_rng(7)
    yy, xx = np.mgrid[0:480, 0:640].astype(np.float32)
    dmm = 2400 + 600 * np.sin(xx / 115.0) + 300 * np.cos(yy / 85.0)
    dmm[120:360, 200:480] = 1300 + 150 * np.sin(xx[120:360, 200:480] / 30.0)
    dmm = dmm + rng2.integers(-2, 3, dmm.shape)
    dmm[rng2.random(dmm.shape) < 0.01] = 0
    sensor16 = np.clip(dmm, 0, 65535).astype(np.uint16)
    t0 = time.time()
    for _ in range(20):
        pk = _dp.pack(sensor16)
    t_pack = (time.time() - t0) / 20
    pack_ratio = pk.nbytes / sensor16.nbytes if pk is not None else 1.0
    feed_pack_s = (n_frames * (t_png + t_pack)
                   + depth_bytes * pack_ratio / upload_bw)
    log(f"depth-pack: {t_pack * 1e3:.1f} ms/frame host pack, wire ratio "
        f"{pack_ratio:.2f} -> packed feed {feed_pack_s:.2f} s/scene "
        f"(sensor-like content; raw feed {host_feed_s:.2f} s)")

    # multi-host partition/merge overhead (orchestration.sweep): measured
    # on a 120-class 2-host table + checkpoint merge — the only cross-host
    # work the class-sharded sweep does
    t_merge = _measure_host_merge()
    log(f"multi-host merge overhead: {t_merge * 1e3:.1f} ms per merge "
        f"(120 classes, 2 hosts; amortized over the whole sweep)")

    device_per_scene = det_chunks * t_det + view_chunks * t_view
    psum_ms = 2 * n_points * 4 / 20e9 * 1e3  # ICI ~20 GB/s lower bound
    # the aggregate term at the TABLE's bandwidth (device part + final-mask
    # download; uses the same bw as the feed so an override is consistent)
    t_aggf = t_agg_device + agg_dl_bytes / upload_bw
    rows = []
    for n in chips:
        dev = device_per_scene / n
        # single-host: the feed does not divide; multi-host (one host per
        # chip group, run_sweep.py --hosts) divides it — both bounds shown,
        # each also with the depth-pack feed
        per_scene = max(dev, host_feed_s) + t_aggf
        per_scene_mh = max(dev, host_feed_s / n) + t_aggf
        per_scene_pack = max(dev, feed_pack_s) + t_aggf
        per_scene_mh_pack = max(dev, feed_pack_s / n) + t_aggf
        rows.append({
            "chips": n,
            "device_s": round(dev, 3),
            "per_scene_single_host_s": round(per_scene, 3),
            "per_scene_multi_host_s": round(per_scene_mh, 3),
            "scenes_per_min_single_host": round(60 / per_scene, 1),
            "scenes_per_min_multi_host": round(60 / per_scene_mh, 1),
            "scenes_per_min_single_host_depth_pack": round(60 / per_scene_pack, 1),
            "scenes_per_min_multi_host_depth_pack": round(60 / per_scene_mh_pack, 1),
        })
        log(f"{n} chip(s): device {dev:.2f}s, single-host {per_scene:.2f}s/scene "
            f"({60 / per_scene:.1f}/min; {60 / per_scene_pack:.1f}/min packed), "
            f"multi-host {per_scene_mh:.2f}s/scene "
            f"({60 / per_scene_mh:.1f}/min; {60 / per_scene_mh_pack:.1f}/min packed)")

    out = {
        "artifact": "projection_analytic_8chip",
        "measured": {
            "det_chunk_s": round(t_det, 4), "view_chunk_s": round(t_view, 4),
            "agg_filter_device_s": round(t_agg_device, 4),
            "agg_download_mb": round(agg_dl_bytes / 1e6, 1),
            "png_decode_s_per_frame": round(t_png, 4),
            "upload_bw_mb_s": round(upload_bw / 1e6, 1),
            **({"upload_bw_note": bw_note} if bw_note else {}),
            "depth_pack_s_per_frame": round(t_pack, 4),
            "depth_pack_wire_ratio_sensor_content": round(pack_ratio, 3),
            "host_merge_s_120_classes": round(t_merge, 4),
            "det_chunks": det_chunks, "view_chunks": view_chunks,
            "psum_pair_ms_at_20GBs_ici": round(psum_ms, 3),
        },
        "assumptions": [
            "frames independent: det/view chunks divide across chips (HLO artifact shows the detection program is collective-free and the lift's only collectives are the count psums)",
            "aggregate+filter single-chip (ms-scale, one (I,I) IoU per scene)",
            "single-host rows: one host feeds all chips at the measured pipelined upload rate; multi-host rows: feed divides with hosts — IMPLEMENTED as the class-sharded sweep (run_sweep.py --hosts/--host + --merge-hosts, byte-identical merged table; tests/test_sweep.py), whose only cross-host work is the measured ms-scale merge",
            "depth_pack rows: the measured lossless wire ratio on sensor-like content (core/depth_pack.py; spills to raw on noise content) and the measured host pack cost per frame",
            "multi-class sweeps amortize the feed further: run_classes uploads each scene's depth once for the whole class list (measured 2.1x/class at 4 classes)",
            "reference baseline 1.1-4.8 s/scene on RTX A5000 (BASELINE.md)",
        ],
        "table": rows,
    }
    print(json.dumps(out))
    return out


def _measure_host_merge() -> float:
    """Time merge_host_results on a synthetic 120-class 2-host layout."""
    import tempfile

    from beyondff_tpu.config import Config
    from beyondff_tpu.orchestration import merge_host_results
    from beyondff_tpu.pipeline.evaluate import update_results_table
    from beyondff_tpu.data import scannet200

    classes = (list(scannet200.HEAD_CATS_SCANNET_200[:40])
               + list(scannet200.COMMON_CATS_SCANNET_200[:40])
               + list(scannet200.TAIL_CATS_SCANNET_200[:40]))
    avgs = {"classes": {c: {k: 0.5 for k in
                            ("ap", "ap50%", "ap25%", "rc", "rc50%", "rc25%")}
                        for c in classes}}
    with tempfile.TemporaryDirectory() as td:
        cfg = Config.from_dict({"paths": {"results_dir": td}})
        for i in range(2):
            path = os.path.join(td, f"overall_results.host{i}of2.txt")
            for c in classes[i::2]:
                update_results_table(path, c, avgs)
        ck = os.path.join(td, "proc.txt")
        import yaml

        for i in range(2):
            with open(ck + f".host{i}of2", "w") as f:
                yaml.safe_dump({c: {"segmentation": True, "projection": True,
                                    "refinement": True, "evaluation": True}
                                for c in classes[i::2]}, f)
        t0 = time.time()
        merge_host_results(cfg, 2, checkpoint_path=ck)
        return time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hlo", action="store_true")
    ap.add_argument("--analytic", action="store_true")
    ap.add_argument("--devices", type=int, default=8)
    args = ap.parse_args()
    if args.hlo:
        hlo_evidence(args.devices)
    if args.analytic:
        analytic_table()


if __name__ == "__main__":
    main()
