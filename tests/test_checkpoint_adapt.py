"""Class-head adaptation + weights-only artifacts tests."""

import numpy as np

from dfine_tpu.utils.checkpoint import (
    OBJ365_IDS,
    load_params_npz,
    map_class_rows,
    save_params_npz,
)


def test_map_class_rows_obj365_to_coco():
    rng = np.random.default_rng(0)
    pretrain = rng.normal(size=(366, 8)).astype(np.float32)  # obj365 head
    cur = np.zeros((80, 8), np.float32)
    out = map_class_rows(cur, pretrain)
    for coco_id, obj_id in enumerate(OBJ365_IDS):
        np.testing.assert_array_equal(out[coco_id], pretrain[obj_id + 1])


def test_map_class_rows_coco_to_obj365_roundtrip():
    rng = np.random.default_rng(1)
    coco = rng.normal(size=(80, 4)).astype(np.float32)
    obj = map_class_rows(np.zeros((366, 4), np.float32), coco)
    back = map_class_rows(np.zeros((80, 4), np.float32), obj)
    np.testing.assert_array_equal(back, coco)


def test_params_npz_roundtrip(tmp_path):
    tree = {"params": {"a": {"kernel": np.ones((2, 3), np.float32)},
                       "b": {"bias": np.zeros((4,), np.float32)}},
            "batch_stats": {"a": {"mean": np.full((3,), 0.5, np.float32)}}}
    p = tmp_path / "w.npz"
    save_params_npz(p, tree)
    back = load_params_npz(p)
    np.testing.assert_array_equal(back["params"]["a"]["kernel"], tree["params"]["a"]["kernel"])
    np.testing.assert_array_equal(back["batch_stats"]["a"]["mean"],
                                  tree["batch_stats"]["a"]["mean"])
