"""A/B timings of the GDINO forward on the current backend.

Sweeps the knobs that changed this round — L1 window tile (8 vs 16) and the
exact-vs-windowed deformable path — with best-of-two rounds per variant
(shared-chip co-tenant noise, CLAUDE.md). Also re-times SAM encode.

    python tools/bench_gdino_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def log(msg):
    print(msg, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from beyondff_tpu.models import sam as sam_mod
    from beyondff_tpu.models.gdino import GroundingDINO, model as gdino_model

    iters = int(os.environ.get("BFF_AB_ITERS", "8"))
    dtype = jnp.bfloat16

    def sync(x):
        leaves = jax.tree_util.tree_leaves(x)
        float(jax.device_get(leaves[0].reshape(-1)[0].astype(jnp.float32)))

    def timed(name, fn):
        t0 = time.time()
        sync(fn())
        log(f"# {name}: compile+first {time.time() - t0:.1f}s")
        best = None
        for _ in range(2):
            t0 = time.time()
            out = None
            for _ in range(iters):
                out = fn()
            sync(out)
            dt = (time.time() - t0) / iters
            best = dt if best is None else min(best, dt)
        log(f"{name}: {best * 1000:.1f} ms")
        return best

    rng = np.random.default_rng(0)
    gdino = GroundingDINO.create(gdino_model.PRESETS["swinb"], dtype=dtype,
                                 device_fill=True)
    gh, gw = gdino.cfg.image_size
    g_img = jnp.asarray(rng.normal(size=(1, gh, gw, 3)).astype(np.float32))
    t_len = 8
    ids = jnp.asarray(rng.integers(1, gdino.cfg.bert.vocab_size, (1, t_len)), jnp.int32)
    sm = jnp.ones((1, t_len, t_len), bool)
    pm = jnp.ones((1, t_len), bool)
    pos = jnp.zeros((1, t_len), jnp.int32)

    variants = [("tile 8 r 8 all levels (default)", {}),
                ("tile1=16 r1=8", {"BFF_DEFORM_TILE1": "16", "BFF_DEFORM_R1": "8"}),
                ("tile1=16 r1=8 tile2=16 r2=8",
                 {"BFF_DEFORM_TILE1": "16", "BFF_DEFORM_R1": "8",
                  "BFF_DEFORM_TILE2": "16", "BFF_DEFORM_R2": "8"}),
                ("tile1=32 r1=8", {"BFF_DEFORM_TILE1": "32", "BFF_DEFORM_R1": "8"})]
    for name, env in variants:
        old = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            fwd = jax.jit(lambda p, *a: gdino.module.apply(p, *a))
            timed(f"gdino full [{name}]", lambda: fwd(
                gdino.params, g_img, ids, sm, pm, pos))
        finally:
            for k, v in old.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    sam = sam_mod.SAM.create("vit_h", dtype=dtype, device_fill=True)
    s = sam.cfg.img_size
    s_img = jnp.asarray(rng.normal(size=(1, s, s, 3)).astype(np.float32))
    timed("sam encode", lambda: sam.encode_image(s_img))


if __name__ == "__main__":
    main()
