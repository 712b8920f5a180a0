"""BeyondFF-TPU: TPU-native query-aware refinement for open-vocabulary 3D instance segmentation.

A ground-up JAX / XLA / Pallas / pjit rebuild of the Beyond-Fixed-Forms pipeline
(reference: zhenghao2519/Beyond-Fixed-Forms). Given a 3D point cloud, posed
multi-view RGB-D frames, a free-text query and stage-1 3D instance masks, the
framework

  1. detects + segments the queried object in 2D frames (Grounding-DINO + SAM,
     or YOLO-World + EfficientSAM) as batched XLA inference under CLIP
     supervision (``beyondff_tpu.pipeline.segmentation_2d``),
  2. lifts 2D masks onto the point cloud with a fused back-projection /
     visibility / mask-gather kernel and aggregates multi-view votes into
     query-aware 3D masks (``beyondff_tpu.pipeline.projection``),
  3. fuses stage-1 and stage-2 masks into refined final instances
     (``beyondff_tpu.pipeline.refinement``),

evaluated with the ScanNet200 AP protocol (``beyondff_tpu.eval``).

The on-disk contracts (per-scene ``.pth``/``.npz`` stage outputs, RLE mask
encoding, ``{"ins","conf","final_class"}`` dicts) are byte-compatible with the
reference so outputs interoperate both ways.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("BFF_PLATFORM"):
    # hosting environments may force a platform via jax.config at interpreter
    # start (overriding JAX_PLATFORMS); this knob wins over both
    import jax as _jax0

    _jax0.config.update("jax_platforms", _os.environ["BFF_PLATFORM"])

if not _os.environ.get("BFF_NO_COMPILE_CACHE"):
    # persistent XLA compilation cache: repeated CLI invocations skip
    # recompiles (first compile of the lift/encoder programs dominates
    # startup otherwise). Opt out with BFF_NO_COMPILE_CACHE=1.
    import jax as _jax

    # namespaced per platform: AOT artifacts are machine-specific and the
    # forced-platform knob can flip backends between runs
    _plat = _os.environ.get("BFF_PLATFORM") or _os.environ.get("JAX_PLATFORMS") or "default"
    _cache = _os.environ.get(
        "BFF_COMPILE_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "beyondff_tpu", f"xla-{_plat}"),
    )
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - older jax without these flags
        pass
