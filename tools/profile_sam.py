"""Attribute SAM ViT-H encoder time by config-variant differencing.

Times the encoder under ablations — no rel-pos bias, bf16 softmax, no
global blocks — so the 70+ ms/frame splits into: window/global attention
matmuls, decomposed rel-pos factors + bias add, softmax precision, MLP rest.
Best-of-two rounds per variant (co-tenant noise, CLAUDE.md).

    python tools/profile_sam.py
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from beyondff_tpu.models import sam as sam_mod

    iters = int(os.environ.get("BFF_SAM_ITERS", "8"))
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)

    def sync(x):
        float(jax.device_get(x.reshape(-1)[0].astype(jnp.float32)))

    def timed(name, cfg, batch=1):
        sam = sam_mod.SAM.create(cfg, dtype=dtype, device_fill=True)
        s = sam.cfg.img_size
        img = jnp.asarray(rng.normal(size=(batch, s, s, 3)).astype(np.float32))
        t0 = time.time()
        sync(sam.encode_image(img))
        print(f"# {name}: compile+first {time.time() - t0:.1f}s", flush=True)
        best = None
        for _ in range(2):
            t0 = time.time()
            out = None
            for _ in range(iters):
                out = sam.encode_image(img)
            sync(out)
            dt = (time.time() - t0) / iters / batch
            best = dt if best is None else min(best, dt)
        print(f"{name}: {best * 1000:.1f} ms/frame", flush=True)
        return best

    base = sam_mod.PRESETS["vit_h"]
    timed("vit_h full", base)
    timed("vit_h bf16-softmax", dataclasses.replace(base, softmax_f32=False))
    timed("vit_h no-relpos", dataclasses.replace(base, use_rel_pos=False))
    timed("vit_h no-relpos bf16-softmax",
          dataclasses.replace(base, use_rel_pos=False, softmax_f32=False))
    timed("vit_h batch4 (per frame)", base, batch=4)


if __name__ == "__main__":
    main()
