"""A/B: SAM ViT-H encode with the fused window-attention kernel on/off,
plus a GDINO full-forward re-probe (known-baseline guard: ~98 ms on a v5e;
a large deviation on BOTH measurements means a co-tenant degradation window,
not code — see CLAUDE.md).

    python tools/bench_sam_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from beyondff_tpu.models import sam as sam_mod

    iters = int(os.environ.get("BFF_AB_ITERS", "8"))
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)

    def sync(x):
        leaves = jax.tree_util.tree_leaves(x)
        float(jax.device_get(leaves[0].reshape(-1)[0].astype(jnp.float32)))

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
        print(f"{name}: {best * 1000:.1f} ms", flush=True)
        return best

    sam = sam_mod.SAM.create("vit_h", dtype=dtype, device_fill=True)
    s = sam.cfg.img_size
    s_img = jnp.asarray(rng.normal(size=(1, s, s, 3)).astype(np.float32))

    for flag, label in (("0", "xla windowed attn"), ("1", "fused window kernel")):
        os.environ["BFF_SAM_WINDOW_KERNEL"] = flag
        # new jit identity per variant: encode_image caches by fn, so rebuild
        sam2 = sam_mod.SAM.create("vit_h", dtype=dtype, device_fill=True)
        timed(f"sam encode [{label}]", lambda: sam2.encode_image(s_img))
    os.environ.pop("BFF_SAM_WINDOW_KERNEL", None)

    if os.environ.get("BFF_AB_GDINO", "1") != "0":
        from beyondff_tpu.models.gdino import GroundingDINO, model as gdino_model

        gdino = GroundingDINO.create(gdino_model.PRESETS["swinb"], dtype=dtype,
                                     device_fill=True)
        gh, gw = gdino.cfg.image_size
        g_img = jnp.asarray(rng.normal(size=(1, gh, gw, 3)).astype(np.float32))
        t_len = 8
        ids = jnp.asarray(rng.integers(1, gdino.cfg.bert.vocab_size, (1, t_len)),
                          jnp.int32)
        sm = jnp.ones((1, t_len, t_len), bool)
        pm = jnp.ones((1, t_len), bool)
        pos = jnp.zeros((1, t_len), jnp.int32)
        fwd = jax.jit(lambda p, *a: gdino.module.apply(p, *a))
        timed("gdino full (re-probe)",
              lambda: fwd(gdino.params, g_img, ids, sm, pm, pos))


if __name__ == "__main__":
    main()
