"""SAM mask-decoder fine-tuning on lifted pseudo-labels.

The pipeline's multi-view-consistent 3D masks can be re-projected into frames
as pseudo-ground-truth to adapt SAM's prompt decoder to the deployment domain
(the reference has no training capability at all, SURVEY.md intro). The step
freezes the image encoder (embeddings precomputed per frame) and optimizes
the prompt encoder + mask decoder with the standard dice + sigmoid-BCE
objective, batch-sharded over the ``data`` axis.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from beyondff_tpu.models import sam as sam_mod
from beyondff_tpu.training.trainer import TrainState, make_optimizer


def mask_loss(logits: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """dice + BCE over low-res mask logits. logits/target: (B, H, W)."""
    target = target.astype(jnp.float32)
    logits = logits.astype(jnp.float32)
    bce = optax.sigmoid_binary_cross_entropy(logits, target).mean()
    probs = jax.nn.sigmoid(logits)
    inter = jnp.sum(probs * target, axis=(1, 2))
    denom = jnp.sum(probs, axis=(1, 2)) + jnp.sum(target, axis=(1, 2))
    dice = 1.0 - (2 * inter + 1.0) / (denom + 1.0)
    return bce + dice.mean()


def decoder_loss(module: sam_mod.SAMModule, params, embeddings, boxes, targets):
    """embeddings (B, g, g, d); boxes (B, 4); targets (B, 4g, 4g) binary."""

    def one(emb, box, tgt):
        masks, _iou = module.apply(params, emb, box[None], method=sam_mod.SAMModule.decode_boxes)
        return mask_loss(masks, tgt[None])

    return jax.vmap(one)(embeddings, boxes, targets).mean()


def make_sam_finetune_step(
    module: sam_mod.SAMModule,
    mesh: Mesh,
    lr: float = 1e-4,
    data_axis: str = "data",
) -> Tuple[Callable, Callable]:
    """Returns (init_state, train_step): dp-sharded decoder fine-tuning.

    Only prompt/decoder params receive updates; encoder params (if present in
    the tree) get zero-masked gradients.
    """
    tx = make_optimizer(lr)

    def trainable(path) -> bool:
        names = [str(getattr(p, "key", p)) for p in path]
        return "encoder" not in names

    def init_state(params) -> TrainState:
        # copy: the train step donates its state, which must not invalidate
        # the caller's inference params
        params = jax.tree_util.tree_map(jnp.array, params)
        opt_state = tx.init(params)
        return TrainState(params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32))

    data_in = NamedSharding(mesh, P(data_axis))

    @functools.partial(jax.jit, in_shardings=(None, data_in, data_in, data_in),
                       donate_argnums=(0,))
    def train_step(state: TrainState, embeddings, boxes, targets):
        loss, grads = jax.value_and_grad(
            lambda p: decoder_loss(module, p, embeddings, boxes, targets)
        )(state.params)
        grads = jax.tree_util.tree_map_with_path(
            lambda path, g: g if trainable(path) else jnp.zeros_like(g), grads)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state, step=state.step + 1), loss

    return init_state, train_step
