"""Multi-view 3D mask aggregation: vote merge + overlap resolution.

Reimplements the reference's ``aggregate``/``merge_masks``/``solve_overlapping``
semantics (reference: tools/projection_2d_to_3d.py:100-301) with the heavy math
on device: the (I, I) IoU matrix and connected components run as MXU matmuls
(:mod:`beyondff_tpu.core.masks`); only the tiny group bookkeeping and the
order-dependent overlap resolution stay on host.

Parity-relevant semantics preserved:
  * merge graph = (IoU > iou_thres) AND exact-label-equality
    (projection_2d_to_3d.py:120-122);
  * components with fewer than ``min_aggregated_masks`` members are dropped
    entirely (projection_2d_to_3d.py:203);
  * merged confidence = mean of members, label = first member's label
    (projection_2d_to_3d.py:214-226);
  * components emitted in order of their smallest member index
    (projection_2d_to_3d.py:265-272);
  * overlap resolution walks pairs (i, j), i<j, in order and mutates masks
    as it goes — the mask aggregated from more views keeps disputed points
    (projection_2d_to_3d.py:277-301).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from beyondff_tpu.core import masks as mask_ops


@dataclass
class AggregatedMasks:
    ins: np.ndarray  # (C, N) bool
    conf: np.ndarray  # (C,) float32
    labels: List[str]
    groups: List[List[int]]  # member indices of each kept component

    @property
    def empty(self) -> bool:
        return self.ins.shape[0] == 0


def aggregate(
    membership: np.ndarray,  # (I, N) bool lifted per-(frame,mask) point masks
    confidences: np.ndarray,  # (I,) float
    labels: Sequence[str],
    iou_thres: float = 0.2,
    min_aggregated_masks: int = 2,
    use_device=None,
) -> AggregatedMasks:
    """Merge per-view masks that agree (IoU + label) into 3D instances.

    ``use_device``: None -> automatic numpy/MXU dispatch by problem size.
    """
    n_ins = membership.shape[0]
    if n_ins == 0:
        return AggregatedMasks(
            ins=np.zeros((0, membership.shape[1] if membership.ndim == 2 else 0), bool),
            conf=np.zeros((0,), np.float32),
            labels=[],
            groups=[],
        )

    label_ids = _label_ids(labels)
    iou = mask_ops.mask_iou(membership, use_device=use_device)
    same_label = label_ids[:, None] == label_ids[None, :]
    with np.errstate(invalid="ignore"):
        adj = same_label & (iou > iou_thres)

    on_device = n_ins > 256 if use_device is None else use_device
    if on_device:
        comp = np.asarray(mask_ops.connected_components(jnp.asarray(adj)))
    else:
        comp = mask_ops.connected_components_np(adj)

    # components in order of smallest member index, filtered by size
    groups: List[List[int]] = []
    for rep in np.unique(comp):  # unique() is sorted -> first-member order
        members = np.flatnonzero(comp == rep)
        if members.size >= min_aggregated_masks:
            groups.append(members.tolist())

    if not groups:
        return AggregatedMasks(
            ins=np.zeros((0, membership.shape[1]), bool),
            conf=np.zeros((0,), np.float32),
            labels=[],
            groups=[],
        )

    onehot = np.zeros((len(groups), n_ins), bool)
    for c, members in enumerate(groups):
        onehot[c, members] = True
    if on_device:
        merged, mean_conf = mask_ops.group_or_and_mean(
            jnp.asarray(membership), jnp.asarray(np.asarray(confidences, np.float32)), jnp.asarray(onehot)
        )
        merged, mean_conf = np.asarray(merged), np.asarray(mean_conf)
    else:
        merged = (onehot.astype(np.float32) @ membership.astype(np.float32)) > 0
        mean_conf = ((onehot @ np.asarray(confidences, np.float32)) / onehot.sum(1)).astype(np.float32)

    out_labels = [labels[g[0]] for g in groups]
    return AggregatedMasks(
        ins=merged.astype(bool),
        conf=mean_conf.astype(np.float32),
        labels=out_labels,
        groups=groups,
    )


def aggregate_chunks(
    chunks,  # list of (device (F, m_pad, N_pad) bool, row_sizes) lift chunks
    n_points: int,
    confidences: np.ndarray,
    labels: Sequence[str],
    iou_thres: float = 0.2,
    min_aggregated_masks: int = 2,
) -> AggregatedMasks:
    """:func:`aggregate` over DEVICE-resident lift chunks.

    The per-view membership (I x N, hundreds of MB at full scene scale) never
    crosses the host link: valid rows gather on device, the IoU matrix comes
    from the fused int8 MXU kernel / device matmul, and only the (I, I) IoU
    (a few MB) plus the merged (C, N) masks download. Numerically identical
    to the host path (tests/test_aggregation.py)."""
    import jax.numpy as jnp

    if not chunks:
        return aggregate(np.zeros((0, n_points), bool), confidences, labels,
                         iou_thres, min_aggregated_masks)

    from beyondff_tpu.core import masks as mask_ops

    # host-known row layout: chunk c contributes rows [base + i*m_pad,
    # base + i*m_pad + sizes[i]) of the flattened (sum F*m_pad, N_pad) stack
    sel: List[int] = []
    base = 0
    for dev, sizes in chunks:
        f_pad, m_pad = int(dev.shape[0]), int(dev.shape[1])
        for i, m_i in enumerate(sizes):
            start = base + i * m_pad
            sel.extend(range(start, start + m_i))
        base += f_pad * m_pad
    n_ins = len(sel)
    if n_ins == 0:
        return aggregate(np.zeros((0, n_points), bool), confidences, labels,
                         iou_thres, min_aggregated_masks)
    assert n_ins == len(labels) == len(np.asarray(confidences)), \
        f"{n_ins} lifted rows vs {len(labels)} labels"

    # bucket the row count so scenes of different sizes reuse compiled programs
    pad_rows = -n_ins % 128
    n_pad = int(chunks[0][0].shape[-1])
    # valid rows gather PER CHUNK before concatenation: the device peak is
    # sum(m_i) rows, not the full (sum F*m_pad) padded stack — this also
    # lets host-spilled chunks (projection's BFF_MEMBERSHIP_HBM_MB cap)
    # re-upload only their valid rows
    parts = []
    for dev, sizes in chunks:
        m_pad = int(dev.shape[1])
        idx = [np.arange(i * m_pad, i * m_pad + m_i, dtype=np.int32)
               for i, m_i in enumerate(sizes) if m_i]
        if idx:
            flat_idx = np.concatenate(idx)
            if isinstance(dev, np.ndarray):  # spilled chunk: select on host
                parts.append(jnp.asarray(dev.reshape(-1, n_pad)[flat_idx]))
            else:
                parts.append(jnp.take(dev.reshape(-1, n_pad),
                                      jnp.asarray(flat_idx), axis=0))
    parts.append(jnp.zeros((pad_rows, n_pad), bool))
    mem = jnp.concatenate(parts)  # (I_b, N_pad) bool, row order == sel order

    from beyondff_tpu.kernels import dispatch

    if dispatch.on_tpu():
        from beyondff_tpu.kernels import mask_iou as kiou

        iou = np.asarray(kiou.pad_and_iou(mem))[:n_ins, :n_ins]
    else:
        iou = np.asarray(mask_ops.pairwise_iou(mem))[:n_ins, :n_ins]

    label_ids = _label_ids(labels)
    same_label = label_ids[:, None] == label_ids[None, :]
    with np.errstate(invalid="ignore"):
        adj = same_label & (iou > iou_thres)
    if n_ins > 256:
        comp = np.asarray(mask_ops.connected_components(jnp.asarray(adj)))
    else:
        comp = mask_ops.connected_components_np(adj)

    groups: List[List[int]] = []
    for rep in np.unique(comp):
        members = np.flatnonzero(comp == rep)
        if members.size >= min_aggregated_masks:
            groups.append(members.tolist())
    if not groups:
        return AggregatedMasks(ins=np.zeros((0, n_points), bool),
                               conf=np.zeros((0,), np.float32), labels=[], groups=[])

    onehot = np.zeros((len(groups), n_ins + pad_rows), bool)
    for c, members in enumerate(groups):
        onehot[c, members] = True
    confs_pad = np.concatenate([np.asarray(confidences, np.float32),
                                np.zeros(pad_rows, np.float32)])
    merged, mean_conf = mask_ops.group_or_and_mean(
        mem, jnp.asarray(confs_pad), jnp.asarray(onehot))
    merged = np.asarray(merged)[:, :n_points]
    return AggregatedMasks(
        ins=merged.astype(bool),
        conf=np.asarray(mean_conf, np.float32),
        labels=[labels[g[0]] for g in groups],
        groups=groups,
    )


def solve_overlapping(agg: AggregatedMasks) -> AggregatedMasks:
    """Give disputed points to the mask aggregated from more views.

    Order-dependent sequential resolution; the overlap pair list is computed
    on the original masks, then applied with mutation in (i, j) order — exactly
    the reference's behaviour (projection_2d_to_3d.py:277-301).
    """
    ins = agg.ins.copy()
    num = [len(g) for g in agg.groups]
    c = ins.shape[0]
    pairs = [
        (i, j)
        for i in range(c)
        for j in range(i + 1, c)
        if np.any(agg.ins[i] & agg.ins[j])
    ]
    for i, j in pairs:
        if num[i] > num[j]:
            ins[j] &= ~ins[i]
        else:
            ins[i] &= ~ins[j]
    return AggregatedMasks(ins=ins, conf=agg.conf, labels=agg.labels, groups=agg.groups)


def _label_ids(labels: Sequence[str]) -> np.ndarray:
    table = {}
    ids = np.empty(len(labels), dtype=np.int32)
    for i, lab in enumerate(labels):
        ids[i] = table.setdefault(lab, len(table))
    return ids
