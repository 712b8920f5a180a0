"""Attribute GDINO forward time by config-variant differencing.

Times the full swinb forward under ablations (enc_layers=0, dec_layers=0,
both) so the post-backbone cost splits into: feature enhancer (deformable
self-attn + text fusion + text self-attn + FFNs per layer), decoder
(self-attn + text cross-attn + deformable cross-attn + FFN per layer), and
backbone+glue (input proj, query selection, heads). Weights are random —
timing only. Best-of-two rounds per variant (co-tenant noise, CLAUDE.md).

    python tools/profile_gdino_blocks.py
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

    from beyondff_tpu.models.gdino import GroundingDINO, model as gdino_model

    iters = int(os.environ.get("BFF_GD_ITERS", "8"))
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)

    def sync(x):
        leaves = jax.tree_util.tree_leaves(x)
        float(jax.device_get(leaves[0].reshape(-1)[0].astype(jnp.float32)))

    def timed(name, cfg):
        gd = GroundingDINO.create(cfg, dtype=dtype, device_fill=True)
        gh, gw = gd.cfg.image_size
        img = jnp.asarray(rng.normal(size=(1, gh, gw, 3)).astype(np.float32))
        t_len = 8
        ids = jnp.asarray(rng.integers(1, gd.cfg.bert.vocab_size, (1, t_len)),
                          jnp.int32)
        sm = jnp.ones((1, t_len, t_len), bool)
        pm = jnp.ones((1, t_len), bool)
        pos = jnp.zeros((1, t_len), jnp.int32)
        fwd = jax.jit(lambda p, *a: gd.module.apply(p, *a))
        t0 = time.time()
        sync(fwd(gd.params, img, ids, sm, pm, pos))
        print(f"# {name}: compile+first {time.time() - t0:.1f}s", flush=True)
        best = None
        for _ in range(2):
            t0 = time.time()
            out = None
            for _ in range(iters):
                out = fwd(gd.params, img, ids, sm, pm, pos)
            sync(out)
            dt = (time.time() - t0) / iters
            best = dt if best is None else min(best, dt)
        print(f"{name}: {best * 1000:.1f} ms", flush=True)
        return best

    base = gdino_model.PRESETS["swinb"]
    t_full = timed("full (enc6 dec6)", base)
    t_noenc = timed("enc0 dec6", dataclasses.replace(base, enc_layers=0))
    t_nodec = timed("enc6 dec0", dataclasses.replace(base, dec_layers=0))
    t_none = timed("enc0 dec0", dataclasses.replace(base, enc_layers=0,
                                                    dec_layers=0))
    t_enc1 = timed("enc1 dec0", dataclasses.replace(base, enc_layers=1,
                                                    dec_layers=0))
    print(f"enhancer 6 layers: {(t_full - t_noenc) * 1000:.1f} ms "
          f"({(t_full - t_noenc) / 6 * 1000:.2f} ms/layer; "
          f"single-layer diff {(t_enc1 - t_none) * 1000:.2f} ms)")
    print(f"decoder 6 layers: {(t_full - t_nodec) * 1000:.1f} ms "
          f"({(t_full - t_nodec) / 6 * 1000:.2f} ms/layer)")
    print(f"backbone+glue: {t_none * 1000:.1f} ms")


if __name__ == "__main__":
    main()
