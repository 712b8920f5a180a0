"""Probe which 2D->3D broadcast/reshape formulations Mosaic lowers.

The deform-window kernel needs acc[y, x, q] = wy[y, q] * wx[x, q] built in
VMEM. Candidate lowerings differ in how the (w3, sq) and (w3x, sq) factors
expand to (w3, w3x, sq). Each variant compiles + runs a tiny kernel on the
current backend and checks against numpy.

    python tools/probe_mosaic_ops.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    W3, W3X, SQ, HD = 24, 32, 128, 32
    rng = np.random.default_rng(0)
    wy = rng.normal(size=(W3, SQ)).astype(np.float32)
    wx = rng.normal(size=(W3X, SQ)).astype(np.float32)
    win = rng.normal(size=(W3 * W3X, HD)).astype(np.float32)
    want = np.einsum("kq,kd->qd",
                     (wy[:, None, :] * wx[None, :, :]).reshape(W3 * W3X, SQ),
                     win)

    def check(name, kernel, dtype=jnp.float32):
        try:
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((SQ, HD), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(jnp.asarray(wy, dtype), jnp.asarray(wx, dtype),
              jnp.asarray(win, dtype))
            err = float(np.abs(np.asarray(out) - want).max() / np.abs(want).max())
            print(f"{name}: OK relerr={err:.2e}", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:160]
            print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)

    dn0 = (((0,), (0,)), ((), ()))

    def k_bcast_in_dim(wy_ref, wx_ref, win_ref, out_ref):
        a = jax.lax.broadcast_in_dim(wy_ref[:], (W3, W3X, SQ), (0, 2))
        b = jax.lax.broadcast_in_dim(wx_ref[:], (W3, W3X, SQ), (1, 2))
        acc = (a * b).reshape(W3 * W3X, SQ)
        out_ref[:] = jax.lax.dot_general(
            acc, win_ref[:], dn0, preferred_element_type=jnp.float32)

    def k_none_index(wy_ref, wx_ref, win_ref, out_ref):
        acc = (wy_ref[:][:, None, :] * wx_ref[:][None, :, :]).reshape(W3 * W3X, SQ)
        out_ref[:] = jax.lax.dot_general(
            acc, win_ref[:], dn0, preferred_element_type=jnp.float32)

    def k_concat_tile(wy_ref, wx_ref, win_ref, out_ref):
        # x factor tiled by sublane-concat (full-tile blocks); y factor
        # expanded by broadcast_in_dim only
        xt = jnp.concatenate([wx_ref[:]] * W3, axis=0)  # (W3*W3X, SQ)
        a = jax.lax.broadcast_in_dim(wy_ref[:], (W3, W3X, SQ), (0, 2))
        acc = a.reshape(W3 * W3X, SQ) * xt
        out_ref[:] = jax.lax.dot_general(
            acc, win_ref[:], dn0, preferred_element_type=jnp.float32)

    def k_repeat(wy_ref, wx_ref, win_ref, out_ref):
        yr = pltpu.repeat(wy_ref[:], W3X, axis=0)
        print(f"# pltpu.repeat shape: {yr.shape}", flush=True)
        xt = jnp.concatenate([wx_ref[:]] * W3, axis=0)
        out_ref[:] = jax.lax.dot_general(
            yr * xt if yr.shape == xt.shape else xt, win_ref[:], dn0,
            preferred_element_type=jnp.float32)

    check("broadcast_in_dim f32", k_bcast_in_dim)
    check("broadcast_in_dim bf16", k_bcast_in_dim, jnp.bfloat16)
    check("None-index f32", k_none_index)
    check("None-index bf16", k_none_index, jnp.bfloat16)
    check("concat-tile f32", k_concat_tile)
    check("concat-tile bf16", k_concat_tile, jnp.bfloat16)
    check("pltpu.repeat f32", k_repeat)


if __name__ == "__main__":
    main()
