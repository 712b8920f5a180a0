"""A/B the CLIP ViT-L/14 image tower: true batch vs lax.map of batch-1,
at the crop-batch sizes the seg2d hit regime produces (4/8/16).

    python tools/bench_clip_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from beyondff_tpu.models import clip as clip_mod

    iters = int(os.environ.get("BFF_AB_ITERS", "16"))
    rng = np.random.default_rng(0)
    model = clip_mod.CLIP.create("ViT-L/14", dtype=jnp.bfloat16, device_fill=True)
    n = model.cfg.image_resolution

    def sync(x):
        float(jax.device_get(x.reshape(-1)[0].astype(jnp.float32)))

    def timed(name, fn):
        t0 = time.time()
        sync(fn())
        print(f"# {name}: compile+first {time.time() - t0:.1f}s", flush=True)
        best = None
        for _ in range(2):
            t0 = time.time()
            out = None
            for _ in range(iters):
                out = fn()
            sync(out)
            dt = (time.time() - t0) / iters
            best = dt if best is None else min(best, dt)
        print(f"{name}: {best * 1000:.2f} ms", flush=True)

    for b in (4, 8, 16):
        crops = jnp.asarray(rng.integers(0, 255, (b, n, n, 3), dtype=np.uint8))
        os.environ.pop("BFF_CLIP_MAP", None)
        timed(f"clip encode batch={b} [true batch]",
              lambda: model.encode_image(crops))
        os.environ["BFF_CLIP_MAP"] = "1"
        timed(f"clip encode batch={b} [lax.map b1]",
              lambda: model.encode_image(crops))
    os.environ.pop("BFF_CLIP_MAP", None)


if __name__ == "__main__":
    main()
