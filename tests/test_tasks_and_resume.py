"""Task-config coverage (FAZ 1-channel, Polyp 4-client) + checkpoint resume."""

import pytest

pytestmark = pytest.mark.slow

import os

import jax
import jax.numpy as jnp
import numpy as np

from fedicra_tpu.data import EpochBatcher, make_synthetic_split
from fedicra_tpu.engine import TrainConfig, init_client_state, make_round_fn
from fedicra_tpu.federation import build_experiment
from fedicra_tpu.models import net_factory


def test_faz_ours_round_one_channel():
    """FAZ config: 1-channel images (repeated to 3 for the tree guide),
    2 classes, full 'ours' objective."""
    cfg = TrainConfig.for_task(
        "faz",
        img_size=16,
        batch_size=2,
        iters=2,
        rep_iters=1,
        max_iterations=40,
        strategy="FedICRA",
        procedure="ours",
        model="unet_lc_multihead",
    )
    assert cfg.in_chns == 1 and cfg.num_classes == 2 and cfg.num_clients == 5
    model = net_factory(cfg.model, in_chns=1, class_num=2, num_clients=5)
    state = init_client_state(model, cfg)
    split = make_synthetic_split(4, 16, 16, 1, 2, seed=0)
    b = EpochBatcher(split, 2, 2, "faz", seed=1)
    rf = jax.jit(make_round_fn(model, cfg))
    s2, m = rf(state, b.batches_for_round(0, 2), jnp.int32(1))
    assert np.isfinite(np.asarray(m["total_loss"])).all()
    assert "loss_tree" in m and "loss_crf" in m


def test_polyp_federation_four_clients():
    cfg = TrainConfig.for_task(
        "polyp",
        img_size=16,
        batch_size=2,
        iters=2,
        rep_iters=1,
        eval_iters=4,
        max_iterations=4,
        strategy="FedAvg",
        procedure="pce",
        model="unet_lc_multihead",
    )
    assert cfg.num_clients == 4 and cfg.in_chns == 3 and cfg.num_classes == 2
    server = build_experiment(cfg, limit_per_client=4, synthetic=True)  # not shipped
    hist = server.run(num_rounds=4, progress=False)
    assert len(hist) == 2 and any("val_mean_dice" in h for h in hist)


def test_checkpoint_resume_roundtrip(tmp_path):
    from fedicra_tpu.utils.checkpoint import CheckpointManager

    cm = CheckpointManager(str(tmp_path / "ckpt"))
    state = {
        "payload": {"params": {"w": jnp.arange(4.0)}},
        "round": jnp.asarray(30),
    }
    cm.save_resume(state)
    restored = cm.restore_resume(
        {"payload": {"params": {"w": jnp.zeros(4)}}, "round": jnp.asarray(0)}
    )
    assert restored is not None
    np.testing.assert_array_equal(
        np.asarray(restored["payload"]["params"]["w"]), np.arange(4.0)
    )
    assert int(np.asarray(restored["round"])) == 30
    # missing checkpoint -> None, not an exception
    cm2 = CheckpointManager(str(tmp_path / "empty"))
    assert cm2.restore_resume({"x": jnp.zeros(1)}) is None


def test_best_checkpoint_and_reload(tmp_path):
    from fedicra_tpu.utils.checkpoint import CheckpointManager
    from fedicra_tpu.engine.trainer import ClientState

    cm = CheckpointManager(str(tmp_path))
    payload = {"params": {"w": jnp.ones(3) * 2}, "batch_stats": {}}
    cm.save_best(payload, round_idx=20, dice=0.5)
    back = cm.restore_best_global({"params": {"w": jnp.zeros(3)}, "batch_stats": {}})
    np.testing.assert_array_equal(np.asarray(back["params"]["w"]), 2.0)
    assert os.path.exists(tmp_path / "best_info.txt")

    # client-side own-best: saved and restored per client, with an
    # append-mode history line per improvement
    state = ClientState(
        params={"w": jnp.ones(3)},
        batch_stats={},
        current_iter=jnp.asarray(10),
        rng=jax.random.PRNGKey(0),
    )
    cm.save_client_best(0, state, round_idx=20, dice=0.31)
    cm.save_client_best(0, state._replace(params={"w": jnp.ones(3) * 5}),
                        round_idx=40, dice=0.62)
    got = cm.restore_best_client(0, state._asdict())
    np.testing.assert_array_equal(np.asarray(got["params"]["w"]), 5.0)
    info = (tmp_path / "best_client_0_info.txt").read_text().splitlines()
    assert info == ["iter=20 dice=0.310000", "iter=40 dice=0.620000"]
