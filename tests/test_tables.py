"""Dataset metadata tables: sizes and spot values from the public benchmarks."""

from beyondff_tpu.data import replica, s3dis, scannet200, scannetpp


def test_scannet200_sizes():
    assert len(scannet200.CLASS_LABELS_200) == 200
    assert len(scannet200.BENCHMARK_SEMANTIC_IDXS) == 200
    assert len(scannet200.INSTANCE_CAT_SCANNET_200) == 198
    assert len(scannet200.VALID_CLASS_IDS_200_VALIDATION) == 189
    # head/common/tail partition the 200-class label space
    assert (
        len(scannet200.HEAD_CATS_SCANNET_200)
        + len(scannet200.COMMON_CATS_SCANNET_200)
        + len(scannet200.TAIL_CATS_SCANNET_200)
        == 198
    )


def test_scannet200_spot_values():
    assert scannet200.CLASS_LABELS_200[0] == "wall"
    assert "chair" in scannet200.INSTANCE_CAT_SCANNET_200
    assert scannet200.instance_label(scannet200.instance_index("chair")) == "chair"


def test_benchmark_index_mapping():
    # index() guard semantics of eval_scannet200.py:92
    assert scannet200.benchmark_index(0) == -1
    sem = scannet200.BENCHMARK_SEMANTIC_IDXS[25]
    assert scannet200.benchmark_index(sem) == 25
    assert scannet200.benchmark_index(10**9) == -1


def test_splits_load():
    val = scannet200.val_scenes()
    assert len(val) == 312
    assert all(s.startswith("scene") for s in val[:5])
    assert len(replica.INSTANCE_CAT_REPLICA) == 48
    assert len(s3dis.INSTANCE_CAT_S3DIS) == 13
    assert len(scannetpp.INSTANCE_CAT_SCANNET_PP) > 1000
