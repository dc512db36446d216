"""Provenance-aware cached-feature default (VERDICT r3 item 6).

The cached-feature deviation's accuracy gate (PERF.md "Cached-feature
rollout") ran on weights trained in this repo; for params imported from
reference torch checkpoints (utils/torch_import — weights trained under
joint-window BN statistics, basic.py:245-252) the auto default must be OFF
and any explicit ON must warn.
"""

import numpy as np
import pytest

from neuralrgbd_tpu.infer.loop import (TORCH_IMPORT_CACHE_WARNING,
                                       resolve_cache_features)


def test_resolve_cache_features_tristate():
    # own weights: pass-through (downstream backend default applies)
    assert resolve_cache_features(None, False) == (None, None)
    assert resolve_cache_features(True, False) == (True, None)
    assert resolve_cache_features(False, False) == (False, None)
    # torch-imported: auto => OFF with the warning
    v, warn = resolve_cache_features(None, True)
    assert v is False and warn == TORCH_IMPORT_CACHE_WARNING
    assert "torch checkpoint" in warn and "OFF" in warn
    # explicit ON is respected but never silent
    v, warn = resolve_cache_features(True, True)
    assert v is True and warn == TORCH_IMPORT_CACHE_WARNING
    # explicit OFF: no warning needed
    assert resolve_cache_features(False, True) == (False, None)


def test_cli_defaults_cache_off_for_torch_import(tmp_path, monkeypatch,
                                                 capsys):
    """End-to-end wiring: the test CLI with a torch .tar model path must
    resolve cache_features to False and print the warning."""
    torch = pytest.importorskip("torch")

    from neuralrgbd_tpu.data.synthetic import write_plane_scene
    from neuralrgbd_tpu.utils import torch_import
    import neuralrgbd_tpu.infer.loop as loop_mod
    from neuralrgbd_tpu.cli import test_kvnet as cli

    write_plane_scene(str(tmp_path / "scenes"), 0, n_frames=6)

    # stand-in torch checkpoint: the import machinery itself is covered by
    # tests/test_oracle_parity.py; here only provenance detection matters
    monkeypatch.setattr(torch_import, "load_torch_checkpoint",
                        lambda path: {})
    monkeypatch.setattr(
        torch_import, "import_torch_state_dict",
        lambda sd, params, refine_net="DPV": (params, {
            "n_imported": 0, "n_params_total": 0,
            "unmatched_torch_keys": [], "missing_flax_keys": [],
            "shape_mismatches": []}))

    captured = {}

    def fake_run_trajectory(params, cfg, traj, res_dir, **kw):
        captured.update(kw)
        return 0

    monkeypatch.setattr(loop_mod, "run_trajectory", fake_run_trajectory)

    cli.main([
        "--dataset", "scannet", "--dataset_path", str(tmp_path / "scenes"),
        "--model_path", str(tmp_path / "fake.tar"),
        "--ndepth", "8", "--feature_dim", "16",
        "--d_min", "0.5", "--d_max", "4.0",
        "--img_width", "48", "--img_height", "32",
        "--res_dir", str(tmp_path / "res"), "--chunk_t", "2",
    ])
    assert captured["cache_features"] is False
    out = capsys.readouterr().out
    assert "WARNING" in out and "torch checkpoint" in out

    # explicit --cache_features overrides but still warns
    captured.clear()
    cli.main([
        "--dataset", "scannet", "--dataset_path", str(tmp_path / "scenes"),
        "--model_path", str(tmp_path / "fake.tar"),
        "--ndepth", "8", "--feature_dim", "16",
        "--d_min", "0.5", "--d_max", "4.0",
        "--img_width", "48", "--img_height", "32",
        "--res_dir", str(tmp_path / "res2"), "--chunk_t", "2",
        "--cache_features",
    ])
    assert captured["cache_features"] is True
    assert "WARNING" in capsys.readouterr().out
