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
