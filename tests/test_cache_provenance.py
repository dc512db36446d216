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


def test_provenance_marker_roundtrip():
    """The marker survives tree_map/device_put and is ignored by flax."""
    import jax
    import jax.numpy as jnp

    from neuralrgbd_tpu.utils.torch_import import (mark_torch_imported,
                                                   params_torch_imported)

    params = {"params": {"w": np.zeros((2, 2), np.float32)}}
    assert not params_torch_imported(params)
    marked = mark_torch_imported(params)
    assert params_torch_imported(marked)
    assert not params_torch_imported(params)          # original untouched
    # survives the transforms params routinely ride through
    assert params_torch_imported(jax.tree.map(jnp.asarray, marked))
    assert params_torch_imported(jax.device_put(marked))
    assert params_torch_imported(None) is False
    assert params_torch_imported([1, 2]) is False


def test_import_torch_state_dict_marks_provenance():
    from neuralrgbd_tpu.utils.torch_import import (import_torch_state_dict,
                                                   params_torch_imported)

    params = {"params": {"feature_extractor": {
        "firstconv_0": {"kernel": np.zeros((3, 3, 3, 4), np.float32)}}}}
    new_params, _ = import_torch_state_dict({}, params)
    assert params_torch_imported(new_params)
    new_params, _ = import_torch_state_dict({}, params,
                                            mark_provenance=False)
    assert not params_torch_imported(new_params)


def test_programmatic_auto_resolves_off_for_torch_params(capsys,
                                                         monkeypatch):
    """VERDICT r4 item 5: run_trajectory/run_trajectories_parallel/
    make_rollout must default torch-imported params to exact semantics
    — the guard lives in the programmatic layer now, not just the CLI."""
    import neuralrgbd_tpu.infer.loop as loop_mod
    from neuralrgbd_tpu.infer.loop import _auto_cache_features
    from neuralrgbd_tpu.utils.torch_import import mark_torch_imported

    own = {"params": {}}
    imported = mark_torch_imported(own)

    # own weights: backend default (CPU under tests => False)
    assert _auto_cache_features(None, own) is False
    # torch-imported: OFF regardless of backend, with the warning
    assert _auto_cache_features(None, imported) is False
    assert "torch checkpoint" in capsys.readouterr().out
    # explicit request still wins
    assert _auto_cache_features(True, imported) is True
    assert _auto_cache_features(False, imported) is False

    # the discriminating case: a TPU backend would default own weights ON,
    # and torch-imported weights must STILL resolve OFF
    monkeypatch.setattr(loop_mod.jax, "default_backend", lambda: "tpu")
    assert _auto_cache_features(None, own) is True
    assert _auto_cache_features(None, imported) is False
    assert _auto_cache_features(None, own, chunked=False) is False


def test_make_rollout_exact_for_torch_params():
    """make_rollout(params=torch-imported) builds the exact (joint-window
    BN) rollout: its output matches make_rollout(cache_features=False)
    exactly on the same inputs."""
    import jax
    import jax.numpy as jnp

    from neuralrgbd_tpu.config import ModelConfig
    from neuralrgbd_tpu.data import synthetic_batch
    from neuralrgbd_tpu.infer.rollout import make_rollout
    from neuralrgbd_tpu.train import create_train_state
    from neuralrgbd_tpu.config import TrainConfig
    from neuralrgbd_tpu.utils.torch_import import mark_torch_imported

    cfg = ModelConfig(feature_dim=16, kv_feature_dim=16, ndepth=8,
                      d_min=0.5, d_max=4.0)
    batch, _ = synthetic_batch(cfg, n_lanes=1, img_hw=(32, 48), seed=0)
    batch = jax.tree.map(jnp.asarray, batch)
    state = create_train_state(cfg, TrainConfig(lr=1e-4), batch)
    params = mark_torch_imported({"params": state.params["params"]})

    T, D = 3, cfg.ndepth
    frames = jax.tree.map(
        lambda x: jnp.stack([x] * T), batch)
    bvp0 = jnp.full((1, D, 8, 12), -np.log(D), jnp.float32)
    valid0 = jnp.zeros((1,), bool)

    d_auto, _, _ = make_rollout(cfg, params=params)(
        params, frames, bvp0, valid0)
    d_exact, _, _ = make_rollout(cfg, cache_features=False)(
        params, frames,
        jnp.full((1, D, 8, 12), -np.log(D), jnp.float32), valid0)
    np.testing.assert_array_equal(np.asarray(d_auto), np.asarray(d_exact))
