"""Device-mesh parallelism: mesh construction, frame/scene sharding, TP rules.

The reference is strictly single-GPU sequential (SURVEY.md §2.4). Here
parallel scale-out is first-class: frames shard over the ``data`` axis with
XLA collectives (psum) aggregating per-point vote counts, and model weights
can shard over the ``model`` axis for tensor parallelism.
"""

from beyondff_tpu.parallel.mesh import make_mesh, data_sharding, replicated  # noqa: F401
