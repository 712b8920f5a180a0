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

    def timed(name, cfg, batch=1, ablate=""):
        old = os.environ.get("BFF_SAM_ABLATE")
        if ablate:
            os.environ["BFF_SAM_ABLATE"] = ablate
        try:
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
        finally:
            if ablate:
                if old is None:
                    os.environ.pop("BFF_SAM_ABLATE", None)
                else:
                    os.environ["BFF_SAM_ABLATE"] = old

    base = sam_mod.PRESETS["vit_h"]
    t_full = timed("vit_h full", base)
    t_norel = timed("vit_h ablate-relpos (XLA path)", base, ablate="norelpos")
    t_noattn = timed("vit_h ablate-windowed-attn", base, ablate="noattn")
    t_nomlp = timed("vit_h ablate-mlp", base, ablate="nomlp")
    nog = dataclasses.replace(base, global_attn_indexes=())
    t_nog = timed("vit_h all-windowed (no global)", nog)
    print(f"attribution: rel-pos bias {1e3 * (t_full - t_norel):.1f} ms | "
          f"windowed attn (incl rel-pos) {1e3 * (t_full - t_noattn):.1f} ms | "
          f"MLPs {1e3 * (t_full - t_nomlp):.1f} ms | "
          f"global blocks {1e3 * (t_full - t_nog):.1f} ms", flush=True)


if __name__ == "__main__":
    main()
