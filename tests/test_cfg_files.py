"""Shipped cfg/*.json configs parse and build valid VIOConfigs.

The reference ships ready-made JSON configs (cfg/tumvi_cam0.json etc.,
jsoncpp //-comment dialect); these are our equivalents, and
scripts/vio.py's -cfg default points at cfg/tumvi_cam0.json.
"""
import glob
import os

from xivo_tpu.filter.config import (config_from_json,
                                    load_json_with_comments)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_all_shipped_configs_build():
    paths = sorted(glob.glob(os.path.join(ROOT, "cfg", "*.json")))
    assert len(paths) >= 3, paths
    for p in paths:
        cfg = config_from_json(load_json_with_comments(p))
        assert cfg.dims.full > 0, p


def test_accuracy_config_sets_recommended_stack():
    cfg = config_from_json(load_json_with_comments(
        os.path.join(ROOT, "cfg", "tumvi_cam0_accuracy.json")))
    assert cfg.use_OOS and cfg.clone_frame_groups and cfg.use_fej
    # pose-only FEJ is the recommended default form
    assert not cfg.fej_feature_block
    assert cfg.Qmodel_Tbc == 3e-4 and cfg.Qmodel_Wbc == 3e-4
    assert cfg.cam_model == "equidistant"
