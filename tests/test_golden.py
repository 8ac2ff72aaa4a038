"""Golden-trajectory regression: fixed-seed losses must stay reproducible.

The reference's reproducibility mechanism is seed 2022 + deterministic cudnn
(SURVEY §4). Here the analogous guarantee: identical config + seed => bitwise
identical loss trajectories run-to-run. The cross-run golden values below pin
the trajectory; a change signals an (intended or not) numerical behaviour
change and the values must be re-baselined consciously.
"""

import pytest

pytestmark = pytest.mark.slow

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from fedicra_tpu.data import EpochBatcher, make_synthetic_split
from fedicra_tpu.engine import TrainConfig, init_client_state, make_round_fn
from fedicra_tpu.models import net_factory

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_trajectory.json")


def _run_trajectory():
    cfg = TrainConfig.for_task(
        "odoc",
        img_size=16,
        batch_size=2,
        iters=4,
        rep_iters=2,
        max_iterations=100,
        strategy="FedICRA",
        procedure="ours",
        model="unet_lc_multihead",
    )
    model = net_factory(
        cfg.model, in_chns=cfg.in_chns, class_num=cfg.num_classes,
        num_clients=cfg.num_clients,
    )
    state = init_client_state(model, cfg)
    split = make_synthetic_split(6, 16, 16, cfg.in_chns, cfg.num_classes, seed=3)
    batcher = EpochBatcher(split, cfg.batch_size, cfg.num_classes, "odoc", seed=11)
    round_fn = jax.jit(make_round_fn(model, cfg))
    state, metrics = round_fn(
        state, batcher.batches_for_round(0, cfg.iters), jnp.int32(2)
    )
    return [float(x) for x in np.asarray(metrics["total_loss"])]


def test_trajectory_is_reproducible_within_run():
    t1 = _run_trajectory()
    t2 = _run_trajectory()
    np.testing.assert_array_equal(t1, t2)


def test_trajectory_matches_golden():
    traj = _run_trajectory()
    if not os.path.exists(GOLDEN_PATH):
        with open(GOLDEN_PATH, "w") as f:
            json.dump({"total_loss": traj, "platform": jax.default_backend()}, f,
                      indent=1)
        return  # first run records the golden file
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    if golden.get("platform") != jax.default_backend():
        return  # golden values are platform-specific
    np.testing.assert_allclose(traj, golden["total_loss"], rtol=1e-4)
