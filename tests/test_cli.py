"""Launcher CLI parity (flower_runner.py flag surface) and train-CLI args."""

import pytest

from fedicra_tpu.cli.runner import PROCEDURE_ALIASES, main as runner_main


def test_runner_debug_prints_config_and_clients(capsys):
    runner_main(
        [
            "--procedure", "flower_pCE_2D_GateCRFMsacleTreeEnergyLoss_Ours",
            "--exp", "x", "--img_class", "odoc", "--strategy", "FedICRA",
            "--model", "unet_lc_multihead", "--debug", "1",
        ]
    )
    out = capsys.readouterr().out
    assert "--procedure ours" in out
    # ODOC per-client supervision table (flower_runner.py:74-84)
    assert "scribble" in out and "keypoint" in out and "block" in out


@pytest.mark.parametrize(
    "alias,resolved",
    [
        ("flower_pCE_2D", "pce"),
        ("flower_pCE_MScaleTreeEnergyLoss_ADD", "treeenergy_add"),
        ("flower_pCE_2D_GateCRFMsacleTreeEnergyLoss_Ours", "ours"),
    ],
)
def test_runner_accepts_reference_script_names(alias, resolved, capsys):
    assert PROCEDURE_ALIASES[alias] == resolved
    runner_main(
        ["--procedure", alias, "--exp", "x", "--img_class", "faz",
         "--debug", "1"]
    )
    assert f"--procedure {resolved}" in capsys.readouterr().out


def test_runner_rejects_unknown_procedure():
    with pytest.raises(AssertionError):
        runner_main(
            ["--procedure", "nope", "--exp", "x", "--img_class", "odoc",
             "--debug", "1"]
        )


def test_runner_rejects_unknown_img_class():
    with pytest.raises(AssertionError):
        runner_main(
            ["--procedure", "pce", "--exp", "x", "--img_class", "brains",
             "--debug", "1"]
        )


@pytest.mark.parametrize("img_class,n_clients", [("odoc", 5), ("faz", 5), ("polyp", 4)])
def test_task_tables_match_reference(img_class, n_clients, capsys):
    """Client counts and supervision assignments (flower_runner.py:63-94)."""
    from fedicra_tpu.engine.config import TASKS

    t = TASKS[img_class]
    assert len(t["sup_types"]) == n_clients
    expected = {
        "odoc": ["scribble", "scribble_noisy", "scribble_noisy", "keypoint", "block"],
        "faz": ["scribble_noisy", "keypoint", "block", "box", "scribble"],
        "polyp": ["keypoint", "scribble", "box", "block"],
    }[img_class]
    assert [
        t["sup_types"][f"client{i + 1}"] for i in range(n_clients)
    ] == expected


import pytest


@pytest.mark.slow
def test_offline_test_cli_loads_per_client_best(tmp_path, monkeypatch):
    """End-to-end: a short federated run snapshots best_global +
    best_client_*; the offline test CLI must load the PER-CLIENT best model
    (reference test.py:264-265 loads client_{N}_{model}_best_model.pth) and
    emit result.csv / mean_std_result.csv / pre/*.png."""
    import h5py
    import numpy as np

    from fedicra_tpu.cli import test as tcli
    from fedicra_tpu.engine import TrainConfig
    from fedicra_tpu.federation import build_experiment

    # synthetic H5 root shaped like FAZ (5 domains, 1-channel, 2 classes)
    root = tmp_path / "FAZ_h5"
    rng = np.random.default_rng(0)
    for d in range(1, 6):
        for sub in ("train", "test"):
            ddir = root / f"Domain{d}" / sub
            ddir.mkdir(parents=True)
            for i in range(3):
                with h5py.File(ddir / f"case{i}.h5", "w") as f:
                    img = rng.random((16, 16), np.float32)
                    f["image"] = img
                    f["mask"] = (img > 0.5).astype(np.uint8)
                    lab = np.full((16, 16), 2, np.uint8)
                    lab[::5, ::5] = 1
                    lab[1::5, 2::5] = 0
                    for key in ("scribble", "scribble_noisy", "keypoint",
                                "block", "box"):
                        f[key] = lab

    cfg = TrainConfig.for_task(
        "faz", img_size=16, batch_size=2, iters=2, rep_iters=1,
        max_iterations=20, strategy="FedICRA", procedure="pce",
        model="unet_lc_multihead", eval_iters=2,
    )
    snap = tmp_path / "model" / "exp1"
    server = build_experiment(cfg, data_root=str(tmp_path),
                              snapshot_dir=str(snap))
    server.run(num_rounds=4)
    assert (snap / "best_global").exists()
    assert (snap / "best_client_0").exists()

    tcli.main([
        "--root_path", str(tmp_path), "--img_class", "faz",
        "--client", "client0", "--exp", "exp1",
        "--snapshot_root", str(tmp_path / "model"),
        "--model", "unet_lc_multihead",
    ])
    out = tmp_path / "model" / "exp1_test" / "client0"
    assert (out / "result.csv").exists()
    assert (out / "mean_std_result.csv").exists()
    assert list((out / "pre").glob("*.png"))


def test_missing_data_root_is_loud_not_synthetic(tmp_path):
    """A real run must never silently fall back to synthetic data.

    Regression: a round-5 ODOC north-star relaunch dropped --root_path and
    trained 70 iterations on generated disks, producing plausible-looking
    (0.94 dice) but meaningless metrics. Synthetic data is now an explicit
    opt-in at every layer."""
    from fedicra_tpu.cli.train import main as train_main
    from fedicra_tpu.engine.config import TrainConfig
    from fedicra_tpu.federation import load_task_splits

    cfg = TrainConfig.for_task("odoc", img_size=16, batch_size=2)
    # library layer: no root
    with pytest.raises(FileNotFoundError):
        load_task_splits(cfg, None, limit_per_client=2)
    # library layer: root that does not exist
    with pytest.raises(FileNotFoundError):
        load_task_splits(cfg, str(tmp_path / "nope"), limit_per_client=2)
    # explicit opt-in works
    splits = load_task_splits(cfg, None, limit_per_client=2, synthetic=True)
    assert len(splits) == cfg.num_clients
    # CLI layer: federated train without --root_path refuses up front
    with pytest.raises(FileNotFoundError):
        train_main([
            "--img_class", "odoc", "--exp", "guard", "--procedure", "pce",
            "--snapshot_root", str(tmp_path), "--stop_after", "2",
            "--limit_per_client", "2", "--img_size", "16",
            "--batch_size", "2", "--iters", "1",
        ])
    # CLI layer: centralized without --root_path refuses up front
    with pytest.raises(FileNotFoundError):
        train_main([
            "--centralized", "--img_class", "odoc", "--exp", "guard2",
            "--snapshot_root", str(tmp_path), "--limit_per_client", "2",
            "--img_size", "16", "--batch_size", "2", "--stop_after", "2",
        ])
