"""The vmapped cross-client contrast must equal the sequential torch loop.

Reference semantics (..._Ours.py:153-163): K-1 extra no-grad forwards with
other clients' embeddings, each perturbing the BN running statistics in
sequence. engine/objective.py batches them into one vmapped forward and
replays the stat threading in closed form; this test pins the equivalence
against a literal sequential-loop reimplementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from fedicra_tpu.engine import TrainConfig
from fedicra_tpu.engine.objective import _contrast_loss
from fedicra_tpu.models import net_factory


def _contrast_loss_sequential(model, params, batch_stats, images, hm_own,
                              cid, rng, cfg):
    """The round-1 Python-unrolled loop (torch-faithful oracle)."""
    K = cfg.num_clients
    sg_params = jax.lax.stop_gradient(params)
    stats = batch_stats
    total = jnp.zeros(())
    for k in range(K):
        include = jnp.asarray(k, jnp.int32) != cid
        emb = jnp.where(k == 0, cid, jnp.asarray(k, jnp.int32))
        rng, kd = jax.random.split(rng)
        out_k, mut = model.apply(
            {"params": sg_params, "batch_stats": stats},
            images,
            train=True,
            emb_idx=jnp.broadcast_to(emb, (images.shape[0],)),
            rngs={"dropout": kd},
            mutable=["batch_stats"],
        )
        hm_k = jax.lax.stop_gradient(out_k["heatmaps"][-1])
        mse = jnp.mean((hm_own - hm_k) ** 2)
        total = total + jnp.where(include, mse, 0.0)
        stats = jax.tree.map(
            lambda old, new: jnp.where(include, new, old),
            stats,
            mut["batch_stats"],
        )
    return -total / (K - 1), stats


@pytest.mark.parametrize("cid", [0, 2])
def test_vmapped_contrast_matches_sequential_loop(cid):
    cfg = TrainConfig.for_task(
        "odoc", img_size=32, batch_size=2, strategy="FedICRA",
        procedure="ours", model="unet_lc_multihead",
    ).replace(num_clients=5)
    model = net_factory(
        cfg.model, in_chns=cfg.in_chns, class_num=cfg.num_classes,
        num_clients=cfg.num_clients, client_id=0,
    )
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3))
    variables = model.init(
        {"params": rng, "dropout": jax.random.PRNGKey(2)}, x, train=False
    )
    params, stats = variables["params"], variables["batch_stats"]

    # make the running stats non-trivial so the threading test has teeth
    _, mut = model.apply(
        {"params": params, "batch_stats": stats}, x, train=True,
        emb_idx=jnp.zeros((2,), jnp.int32),
        rngs={"dropout": jax.random.PRNGKey(3)}, mutable=["batch_stats"],
    )
    stats = mut["batch_stats"]

    out = model.apply(
        {"params": params, "batch_stats": stats}, x, train=False,
        emb_idx=jnp.full((2,), cid, jnp.int32),
    )
    hm_own = out["heatmaps"][-1]
    cid_arr = jnp.asarray(cid, jnp.int32)
    key = jax.random.PRNGKey(7)

    loss_v, stats_v = jax.jit(
        lambda p, s: _contrast_loss(model, p, s, x, hm_own, cid_arr, key, cfg)
    )(params, stats)
    loss_s, stats_s = jax.jit(
        lambda p, s: _contrast_loss_sequential(
            model, p, s, x, hm_own, cid_arr, key, cfg
        )
    )(params, stats)

    np.testing.assert_allclose(loss_v, loss_s, rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(stats_v), jax.tree.leaves(stats_s)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
