#!/usr/bin/env python
"""Component-level timing of the seg2d model stack on the current backend.

Splits bench.py's per-model numbers into the pieces that matter for kernel
work: Swin-B backbone vs the GDINO enhancer/decoder stack, and SAM ViT-H
global-attention blocks vs the windowed remainder (measured by differencing
a variant with global_attn_indexes=()). Timing is fenced with a host fetch
(axon's block_until_ready returns before execution — see CLAUDE.md).

    python tools/profile_models.py            # real TPU
    BFF_PLATFORM=cpu BFF_PROFILE_SCALE=small python tools/profile_models.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from beyondff_tpu.models import sam as sam_mod
    from beyondff_tpu.models.gdino import GroundingDINO, model as gdino_model
    from beyondff_tpu.models.gdino import swin as swin_mod

    small = os.environ.get("BFF_PROFILE_SCALE") == "small"
    iters = int(os.environ.get("BFF_PROFILE_ITERS", "8"))
    dtype = jnp.bfloat16

    def sync(x):
        leaves = jax.tree_util.tree_leaves(x)
        float(jax.device_get(leaves[0].reshape(-1)[0].astype(jnp.float32)))

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        sync(out)
        log(f"{name}: compile+first {time.time() - t0:.1f}s")
        t0 = time.time()
        for _ in range(iters):
            out = fn()
        sync(out)
        dt = (time.time() - t0) / iters
        print(f"{name}: {dt * 1000:.1f} ms")
        return dt

    rng = np.random.default_rng(0)
    if small:
        gd_cfg = gdino_model.PRESETS["test"]
        sam_name = "test"
    else:
        gd_cfg = gdino_model.PRESETS["swinb"]
        sam_name = "vit_h"

    gdino = GroundingDINO.create(gd_cfg, dtype=dtype, device_fill=True)
    gh, gw = gdino.cfg.image_size
    g_img = jnp.asarray(rng.normal(size=(1, gh, gw, 3)).astype(np.float32))
    t_len = 8
    ids = jnp.asarray(rng.integers(1, gdino.cfg.bert.vocab_size, (1, t_len)), jnp.int32)
    self_mask = jnp.ones((1, t_len, t_len), bool)
    pad_mask = jnp.ones((1, t_len), bool)
    pos_ids = jnp.zeros((1, t_len), jnp.int32)

    # --- full GDINO forward (same program shape as bench.py)
    gdino_fwd = jax.jit(lambda p, *a: gdino.module.apply(p, *a))
    t_full = timed("gdino full", lambda: gdino_fwd(
        gdino.params, g_img, ids, self_mask, pad_mask, pos_ids))

    # --- Swin backbone alone (same weights)
    swin = swin_mod.SwinBackbone(gdino.cfg.swin, dtype=dtype)
    swin_params = {"params": gdino.params["params"]["backbone"]}
    swin_fwd = jax.jit(lambda p, x: swin.apply(p, x))
    t_swin = timed("gdino swin backbone", lambda: swin_fwd(swin_params, g_img))
    print(f"gdino enhancer+decoder+glue (difference): {(t_full - t_swin) * 1000:.1f} ms")

    # --- SAM encode, full vs no-global-attention variant
    sam = sam_mod.SAM.create(sam_name, dtype=dtype, device_fill=True)
    s = sam.cfg.img_size
    s_img = jnp.asarray(rng.normal(size=(1, s, s, 3)).astype(np.float32))
    t_sam = timed("sam encode (full)", lambda: sam.encode_image(s_img))

    import dataclasses
    nog_cfg = dataclasses.replace(sam.cfg, global_attn_indexes=())
    sam_nog = sam_mod.SAM.create(nog_cfg, dtype=dtype, device_fill=True)
    t_nog = timed("sam encode (all-windowed)", lambda: sam_nog.encode_image(s_img))
    n_glob = len(sam.cfg.global_attn_indexes)
    print(f"sam global-attn blocks ({n_glob}): {(t_sam - t_nog) * 1000:.1f} ms total, "
          f"{(t_sam - t_nog) / max(n_glob, 1) * 1000:.1f} ms/block")


if __name__ == "__main__":
    main()
