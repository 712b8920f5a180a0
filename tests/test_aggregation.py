"""Aggregation + filtering semantics on synthetic vote sets."""

import numpy as np

from beyondff_tpu.config import FilteringConfig
from beyondff_tpu.core import aggregation, filtering


def test_aggregate_merges_by_iou_and_label(rng):
    n = 200
    base = rng.random(n) < 0.3
    # three noisy views of the same object + one distinct object + one other label
    views = []
    for _ in range(3):
        noise = rng.random(n) < 0.02
        views.append(base ^ noise)
    other = rng.random(n) < 0.3
    views.append(other)
    views.append(base.copy())  # same geometry, different label -> no merge
    membership = np.stack(views)
    confs = np.array([0.9, 0.8, 0.7, 0.6, 0.5])
    labels = ["chair", "chair", "chair", "chair", "table"]

    agg = aggregation.aggregate(membership, confs, labels, iou_thres=0.5, min_aggregated_masks=2)
    # only the 3-view chair cluster survives min_aggregated_masks=2
    assert len(agg.groups) == 1
    assert agg.groups[0] == [0, 1, 2]
    assert agg.labels == ["chair"]
    np.testing.assert_allclose(agg.conf[0], np.mean([0.9, 0.8, 0.7]), rtol=1e-6)
    np.testing.assert_array_equal(agg.ins[0], views[0] | views[1] | views[2])


def test_aggregate_device_matches_numpy(rng):
    membership = rng.random((12, 150)) < 0.25
    confs = rng.random(12)
    labels = [["a", "b"][i % 2] for i in range(12)]
    a_dev = aggregation.aggregate(membership, confs, labels, 0.2, 2, use_device=True)
    a_np = aggregation.aggregate(membership, confs, labels, 0.2, 2, use_device=False)
    assert a_dev.groups == a_np.groups
    np.testing.assert_array_equal(a_dev.ins, a_np.ins)
    np.testing.assert_allclose(a_dev.conf, a_np.conf, rtol=1e-5)


def test_aggregate_empty():
    agg = aggregation.aggregate(np.zeros((0, 10), bool), np.zeros(0), [], 0.2, 2)
    assert agg.empty and agg.groups == []


def test_solve_overlapping_order_dependent():
    # mask0 (3 views) overlaps mask1 (2 views): mask1 loses the disputed points
    ins = np.array(
        [
            [1, 1, 1, 0, 0],
            [0, 1, 1, 1, 0],
            [0, 0, 0, 1, 1],
        ],
        dtype=bool,
    )
    agg = aggregation.AggregatedMasks(
        ins=ins, conf=np.ones(3, np.float32), labels=["x"] * 3, groups=[[0, 1, 2], [3, 4], [5]]
    )
    res = aggregation.solve_overlapping(agg)
    np.testing.assert_array_equal(res.ins[0], [1, 1, 1, 0, 0])  # 3 views: keeps all
    np.testing.assert_array_equal(res.ins[1], [0, 0, 0, 1, 0])  # lost 1,2 to mask0
    # pair (1,2): num[1]=2 > num[2]=1 -> mask2 loses point 3
    np.testing.assert_array_equal(res.ins[2], [0, 0, 0, 0, 1])


def test_detected_ratio_filter_percentile_of_unique():
    masked = np.array([0, 1, 2, 4, 4, 8], np.float32)
    viewed = np.array([1, 1, 1, 1, 1, 1], np.float32)
    # ratios: 0, .5, 1, 2, 2, 4 -> unique [0,.5,1,2,4]; cut = uniq[floor(.4*5)] = uniq[2] = 1
    counts, cut = filtering.detected_ratio_filter(masked, viewed, 0.4)
    assert cut == 1.0
    np.testing.assert_array_equal(counts, [0, 0, 2, 4, 4, 8])


def test_occurrence_filter():
    counts = filtering.occurrence_filter(np.array([0, 1, 1, 3, 5]), 0.5)
    # unique [0,1,3,5]; cut = uniq[2] = 3
    np.testing.assert_array_equal(counts, [0, 0, 0, 3, 5])


def test_filter_masks_cascade(rng):
    n = 50
    ins = np.zeros((2, n), bool)
    ins[0, :30] = True
    ins[1, 25:45] = True  # overlaps mask0 on [25,30)
    agg = aggregation.AggregatedMasks(
        ins=ins, conf=np.array([0.9, 0.8], np.float32), labels=["a", "b"],
        groups=[[0, 1, 2], [3, 4]],
    )
    masked_counts = np.ones(n)  # no point filtered
    cfg = FilteringConfig(use_detected_ratio_threshold=False, use_occurrence_threshold=False,
                          remove_small_masks=5, remove_filtered_masks=0.4)
    out = filtering.filter_masks(agg, masked_counts, np.ones(n), cfg)
    # mask0 (3 views) wins the overlap; mask1 keeps 15/20 points -> retained (>0.4)
    assert out.ins.shape[0] == 2
    assert out.ins[0].sum() == 30 and out.ins[1].sum() == 15

    # tighter retention: mask1 must retain >80% -> dropped
    cfg2 = FilteringConfig(use_detected_ratio_threshold=False, use_occurrence_threshold=False,
                           remove_small_masks=5, remove_filtered_masks=0.8)
    out2 = filtering.filter_masks(agg, masked_counts, np.ones(n), cfg2)
    assert out2.ins.shape[0] == 1 and out2.labels == ["a"]


def test_aggregate_chunks_matches_host_path(rng):
    """Device-chunk aggregation (membership never downloads) must reproduce
    the host-array path exactly on the same lifted masks."""
    import jax.numpy as jnp

    from beyondff_tpu.core.aggregation import aggregate, aggregate_chunks

    n = 500
    n_pad = 512  # bucketed point padding, like the lift
    labels_pool = ["clothes", "chair"]
    chunks, all_masks, confs, labels = [], [], [], []
    for _ in range(3):  # 3 chunks of 4 frames, ragged mask counts
        f_pad, m_pad = 4, 4
        dev = np.zeros((f_pad, m_pad, n_pad), bool)
        sizes = []
        for i in range(f_pad):
            m_i = int(rng.integers(0, m_pad + 1))
            sizes.append(m_i)
            for j in range(m_i):
                m = rng.random(n) < 0.3
                dev[i, j, :n] = m
                all_masks.append(m)
                confs.append(float(rng.random()))
                labels.append(labels_pool[int(rng.integers(0, 2))])
        chunks.append((jnp.asarray(dev), sizes))
    confs = np.asarray(confs, np.float32)

    host = aggregate(np.asarray(all_masks).reshape(len(all_masks), n), confs, labels,
                     iou_thres=0.2, min_aggregated_masks=2)
    dev = aggregate_chunks(chunks, n, confs, labels,
                           iou_thres=0.2, min_aggregated_masks=2)
    assert dev.groups == host.groups
    assert dev.labels == host.labels
    np.testing.assert_array_equal(dev.ins, host.ins)
    np.testing.assert_allclose(dev.conf, host.conf, rtol=1e-6)


def test_aggregate_chunks_host_spilled_mix(rng):
    """Chunks spilled to host numpy (projection's BFF_MEMBERSHIP_HBM_MB cap)
    must aggregate identically to all-device chunks."""
    import jax.numpy as jnp

    from beyondff_tpu.core.aggregation import aggregate_chunks

    n, n_pad = 300, 384
    chunks, confs, labels = [], [], []
    for c in range(3):
        f_pad, m_pad = 2, 3
        dev = np.zeros((f_pad, m_pad, n_pad), bool)
        sizes = []
        for i in range(f_pad):
            m_i = int(rng.integers(1, m_pad + 1))
            sizes.append(m_i)
            for j in range(m_i):
                dev[i, j, :n] = rng.random(n) < 0.3
                confs.append(float(rng.random()))
                labels.append("clothes")
        chunks.append((dev, sizes))
    confs = np.asarray(confs, np.float32)

    all_dev = aggregate_chunks([(jnp.asarray(d), s) for d, s in chunks], n,
                               confs, labels, iou_thres=0.2,
                               min_aggregated_masks=2)
    # first chunk spilled to host, rest on device
    mixed = [(chunks[0][0], chunks[0][1])] + [
        (jnp.asarray(d), s) for d, s in chunks[1:]]
    out = aggregate_chunks(mixed, n, confs, labels, iou_thres=0.2,
                           min_aggregated_masks=2)
    assert out.groups == all_dev.groups
    np.testing.assert_array_equal(out.ins, all_dev.ins)


def test_aggregate_chunks_empty():
    from beyondff_tpu.core.aggregation import aggregate_chunks

    out = aggregate_chunks([], 100, np.zeros(0, np.float32), [])
    assert out.empty and out.ins.shape == (0, 100)
