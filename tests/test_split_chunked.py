"""Chunk-pipelined split trainer (FEDICRA_SPLIT_CHUNKS>1) must be exactly
the unchunked path: images are independent through the tree chain, the ROI
normalizer is computed over the full batch, and per-image losses are summed
in image order — so chunking the device<->host transfers is pure pipelining,
not an approximation."""

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


def _run(monkeypatch, chunks):
    monkeypatch.setenv("FEDICRA_SPLIT_CHUNKS", str(chunks))
    cfg = TrainConfig.for_task(
        "odoc",
        img_size=16,
        batch_size=3,
        iters=2,
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
    state0 = init_client_state(model, cfg)
    split = make_synthetic_split(6, 16, 16, cfg.in_chns, cfg.num_classes, seed=3)
    batcher = EpochBatcher(split, cfg.batch_size, cfg.num_classes, "odoc", seed=5)
    batches = batcher.batches_for_round(0, cfg.iters)
    fn = make_split_round_fn(model, cfg)
    state, metrics = fn(state0, batches, jnp.asarray(1, jnp.int32))
    return state, metrics


def test_chunked_equals_unchunked(monkeypatch):
    s1, m1 = _run(monkeypatch, 1)
    s2, m2 = _run(monkeypatch, 2)  # batch 3 -> chunks of 2 and 1
    np.testing.assert_array_equal(
        np.asarray(m1["total_loss"]), np.asarray(m2["total_loss"])
    )
    np.testing.assert_array_equal(
        np.asarray(m1["loss_tree"]), np.asarray(m2["loss_tree"])
    )
    import jax

    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_chunk_bounds():
    from fedicra_tpu.engine.split_trainer import _chunk_bounds

    assert _chunk_bounds(12, 2) == [(0, 6), (6, 12)]
    assert _chunk_bounds(3, 2) == [(0, 2), (2, 3)]
    assert _chunk_bounds(1, 4) == [(0, 1)]
    assert _chunk_bounds(5, 1) == [(0, 5)]
