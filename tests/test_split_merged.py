"""Merged-backward split trainer (FEDICRA_SPLIT_MERGED=1) must match the
two-jit part2a/part2b pipeline: the merged objective is loss_a + (lin -
stop_grad(lin)), whose value equals loss_a exactly and whose gradient is the
same SUM of terms — only the float association order differs, so parameters
agree to float tolerance and loss values (pre-update, same params in) agree
exactly on the first iteration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fedicra_tpu import native
from fedicra_tpu.data import EpochBatcher, make_synthetic_split
from fedicra_tpu.engine import TrainConfig, init_client_state
from fedicra_tpu.engine.split_trainer import make_split_round_fn
from fedicra_tpu.models import net_factory

pytestmark = [
    pytest.mark.skipif(not native.available(), reason="native lib unavailable"),
    pytest.mark.slow,
]


def _run(monkeypatch, merged, procedure="ours"):
    monkeypatch.setenv("FEDICRA_SPLIT_MERGED", "1" if merged else "0")
    cfg = TrainConfig.for_task(
        "odoc",
        img_size=16,
        batch_size=3,
        iters=2,
        rep_iters=1,
        max_iterations=60,
        strategy="FedICRA",
        procedure=procedure,
        model="unet_lc_multihead",
    )
    model = net_factory(
        cfg.model, in_chns=cfg.in_chns, class_num=cfg.num_classes,
        num_clients=cfg.num_clients,
    )
    state0 = init_client_state(model, cfg)
    split = make_synthetic_split(6, 16, 16, cfg.in_chns, cfg.num_classes, seed=3)
    batcher = EpochBatcher(split, cfg.batch_size, cfg.num_classes, "odoc", seed=5)
    batches = batcher.batches_for_round(0, cfg.iters)
    fn = make_split_round_fn(model, cfg)
    state, metrics = fn(state0, batches, jnp.asarray(1, jnp.int32))
    return state, metrics


@pytest.mark.parametrize("procedure", ["ours", "treeenergy_add"])
def test_merged_equals_two_jit(monkeypatch, procedure):
    s1, m1 = _run(monkeypatch, merged=False, procedure=procedure)
    s2, m2 = _run(monkeypatch, merged=True, procedure=procedure)
    # first iteration: same params in, identical forward semantics (same
    # rng) — only compiled-program fusion order can differ, so ~ulp scale;
    # later iterations drift by association-order float noise in the grads
    np.testing.assert_allclose(
        np.asarray(m1["total_loss"])[0], np.asarray(m2["total_loss"])[0],
        rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(m1["total_loss"]), np.asarray(m2["total_loss"]),
        rtol=2e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(m1["loss_tree"])[0], np.asarray(m2["loss_tree"])[0],
        rtol=1e-5, atol=1e-7,
    )
    # Elementwise param comparison is NOT meaningful after AdamW (the step
    # is ~lr*sign(grad): association-order noise flips signs where the true
    # gradient is ~0 — see test_split_trainer.py's identical note). Bound
    # the global relative distance instead; a wrong gradient sum would blow
    # this up by orders of magnitude.
    num = den = 0.0
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        num += float(jnp.sum((a - b) ** 2))
        den += float(jnp.sum(jnp.asarray(a) ** 2))
    rel = (num / max(den, 1e-30)) ** 0.5
    assert rel < 5e-3, rel


def test_merged_gradient_matches_sum(monkeypatch):
    """grad(loss_a + lin) == grad(loss_a) + grad(lin) to float tolerance,
    checked directly on the exposed jitted stages."""
    monkeypatch.setenv("FEDICRA_SPLIT_MERGED", "1")
    cfg = TrainConfig.for_task(
        "odoc",
        img_size=16,
        batch_size=2,
        iters=1,
        rep_iters=1,
        max_iterations=60,
        strategy="FedICRA",
        procedure="ours",
        model="unet_lc_multihead",
    )
    model = net_factory(
        cfg.model, in_chns=cfg.in_chns, class_num=cfg.num_classes,
        num_clients=cfg.num_clients,
    )
    state = init_client_state(model, cfg)
    fn = make_split_round_fn(model, cfg)
    partF = fn.parts["partF"]
    part2a = fn.parts["part2a"]
    assert fn.parts["merged"]

    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(
            rng.uniform(size=(2, 16, 16, cfg.in_chns)).astype(np.float32)
        ),
        "label": jnp.asarray(
            rng.integers(0, cfg.num_classes + 1, size=(2, 16, 16)).astype(
                np.int32
            )
        ),
    }
    k = jax.random.PRNGKey(7)
    cid = jnp.asarray(1, jnp.int32)

    # partF's shipped tensors equal part2a's (same forward, same rng path;
    # different compiled programs, so allow ulp-scale fusion differences)
    ship_f = partF(state.params, state.batch_stats, k, batch, cid)
    *_, ship_a = part2a(state.params, state.batch_stats, k, batch, cid)
    for a, b in zip(ship_f, ship_a):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=1e-6, atol=1e-7,
        )
