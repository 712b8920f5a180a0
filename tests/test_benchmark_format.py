"""Benchmark-format export/import round trip + orbax checkpoint round trip."""

import numpy as np

from beyondff_tpu.eval import benchmark_format as bf


def test_export_import_round_trip(tmp_path, rng):
    masks = rng.random((3, 50)) < 0.4
    labels = [5, 7, 9]
    confs = [0.9, 0.5, 0.7]
    txt = str(tmp_path / "scene0001_00.txt")
    bf.export_instances(txt, masks, labels, confs)
    back = bf.read_instances(txt)
    assert len(back) == 3
    for k, rec in enumerate(back):
        np.testing.assert_array_equal(rec["pred_mask"].astype(bool), masks[k])
        assert rec["label_id"] == labels[k]
        assert abs(rec["conf"] - confs[k]) < 1e-6


def test_orbax_round_trip(tmp_path):
    import jax.numpy as jnp

    from beyondff_tpu.training.checkpoint import load_params, save_params

    params = {"a": jnp.arange(5.0), "b": {"w": jnp.ones((2, 3))}}
    path = str(tmp_path / "ckpt")
    save_params(path, params)
    back = load_params(path, like=params)
    np.testing.assert_array_equal(np.asarray(back["a"]), np.arange(5.0))
    np.testing.assert_array_equal(np.asarray(back["b"]["w"]), np.ones((2, 3)))
