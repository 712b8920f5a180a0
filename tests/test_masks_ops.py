"""Mask algebra: IoU matmuls and connected components, device vs numpy oracle."""

import jax.numpy as jnp
import numpy as np

from beyondff_tpu.core import masks as mask_ops


def test_pairwise_iou_matches_numpy(rng):
    a = rng.random((17, 301)) < 0.3
    iou_dev = np.asarray(mask_ops.pairwise_iou(jnp.asarray(a), chunk=128))
    iou_np = mask_ops.pairwise_iou_np(a)
    np.testing.assert_allclose(iou_dev, iou_np, rtol=1e-5, atol=1e-6)
    # diagonal of non-empty masks is exactly 1
    nonempty = a.sum(1) > 0
    np.testing.assert_allclose(np.diag(iou_dev)[nonempty], 1.0, rtol=1e-6)


def test_pairwise_iou_rectangular(rng):
    a = rng.random((5, 200)) < 0.4
    b = rng.random((9, 200)) < 0.4
    iou = np.asarray(mask_ops.pairwise_iou(jnp.asarray(a), jnp.asarray(b), chunk=64))
    np.testing.assert_allclose(iou, mask_ops.pairwise_iou_np(a, b), rtol=1e-5, atol=1e-6)


def test_connected_components_random(rng):
    for n in [1, 2, 7, 33]:
        adj = rng.random((n, n)) < 0.1
        adj = adj | adj.T
        dev = np.asarray(mask_ops.connected_components(jnp.asarray(adj)))
        ref = mask_ops.connected_components_np(adj)
        np.testing.assert_array_equal(dev, ref)


def test_connected_components_chain():
    # a chain 0-1-2-...-9 needs the full log-depth closure
    n = 10
    adj = np.zeros((n, n), bool)
    for i in range(n - 1):
        adj[i, i + 1] = adj[i + 1, i] = True
    comp = np.asarray(mask_ops.connected_components(jnp.asarray(adj)))
    np.testing.assert_array_equal(comp, np.zeros(n))


def test_group_or_and_mean(rng):
    masks = rng.random((6, 50)) < 0.5
    confs = rng.random(6).astype(np.float32)
    onehot = np.zeros((2, 6), bool)
    onehot[0, [0, 2]] = True
    onehot[1, [1, 3, 4]] = True
    merged, mean_conf = mask_ops.group_or_and_mean(
        jnp.asarray(masks), jnp.asarray(confs), jnp.asarray(onehot)
    )
    np.testing.assert_array_equal(np.asarray(merged)[0], masks[0] | masks[2])
    np.testing.assert_array_equal(np.asarray(merged)[1], masks[1] | masks[3] | masks[4])
    np.testing.assert_allclose(np.asarray(mean_conf)[0], confs[[0, 2]].mean(), rtol=1e-6)
