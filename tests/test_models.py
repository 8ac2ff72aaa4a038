"""Model zoo tests: shapes, parameter-count parity with the reference, and
client-embedding behaviour of the LC models."""

import jax
import jax.numpy as jnp
import pytest
from flax import traverse_util

from fedicra_tpu.models import net_factory
from fedicra_tpu.models.params_filters import (
    is_ala_gated_path,
    is_head_path,
    is_pcs_path,
)

RNGS = {
    "params": jax.random.PRNGKey(0),
    "dropout": jax.random.PRNGKey(1),
    "perturb": jax.random.PRNGKey(2),
}


def _init_shape(model, x_shape):
    x = jnp.zeros(x_shape)
    return jax.eval_shape(lambda: model.init(RNGS, x, train=False))


def test_unet_param_count_matches_reference():
    # torch reference: sum(p.numel() for p in UNet(1, 2).parameters()) == 1813474
    m = net_factory("unet", in_chns=1, class_num=2)
    v = _init_shape(m, (1, 32, 32, 1))
    n = sum(p.size for p in jax.tree.leaves(v["params"]))
    assert n == 1813474


def test_unet_lc_multihead_param_count_matches_reference():
    # torch: UNet_LC_MultiHead(3, 3, 1, 5, 5, 2).parameters() == 2339219
    # (torch excludes the unregistered PCS modules; we count non-PCS params)
    m = net_factory("unet_lc_multihead", in_chns=3, class_num=3, num_clients=5)
    v = _init_shape(m, (1, 32, 32, 3))
    flat = traverse_util.flatten_dict(v["params"])
    non_pcs = sum(v.size for k, v in flat.items() if not is_pcs_path(k))
    assert non_pcs == 2339219


@pytest.mark.parametrize(
    "net_type",
    [
        "unet",
        "unet_head",
        "unet_multihead",
        "unet_ds",
        "unet_cct",
        "unet_cct_3h",
        "pnet",
        "unet_lc",
        "unet_lc_multihead",
        "unet_lc_multihead_two",
    ],
)
def test_forward_shapes(net_type):
    m = net_factory(net_type, in_chns=1, class_num=2, num_clients=5, client_id=1)
    x = jnp.zeros((2, 32, 32, 1))
    out_shapes = jax.eval_shape(
        lambda: m.apply(m.init(RNGS, x, train=False), x, train=False)
    )
    assert out_shapes["logits"].shape == (2, 32, 32, 2)


def test_multihead_aux_shapes():
    m = net_factory("unet_lc_multihead", in_chns=3, class_num=3, num_clients=5)
    x = jnp.zeros((2, 64, 64, 3))
    out = jax.eval_shape(lambda: m.apply(m.init(RNGS, x, train=False), x, train=False))
    assert [a.shape for a in out["aux"]] == [
        (2, 16, 16, 3),
        (2, 32, 32, 3),
        (2, 64, 64, 3),
    ]
    # PCS heatmap lives at the bottleneck only (pcs_num=1)
    hs = out["heatmaps"]
    assert hs[:4] == [None] * 4 and hs[4].shape == (2, 1, 1, 256)


def test_lc_embedding_changes_heatmap_and_quirk_zero_falls_back():
    m = net_factory(
        "unet_lc_multihead", in_chns=1, class_num=2, num_clients=5, client_id=2
    )
    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 32, 32, 1))
    v = m.init(RNGS, x, train=False)

    def hmap(emb_idx):
        return m.apply(v, x, train=False, emb_idx=emb_idx)["heatmaps"][-1]

    h_own = hmap(None)
    h_zero = hmap(0)  # quirk: 0 falls back to own cid (=2)
    h_three = hmap(3)
    assert jnp.allclose(h_own, h_zero)
    assert not jnp.allclose(h_own, h_three)
    # array embedding indices are honoured as-is (including 0)
    h_arr0 = hmap(jnp.asarray(0))
    assert not jnp.allclose(h_arr0, h_own)


def test_param_filters():
    m = net_factory("unet_lc_multihead", in_chns=1, class_num=2, num_clients=5)
    v = _init_shape(m, (1, 32, 32, 1))
    flat = traverse_util.flatten_dict(v["params"])
    heads = [k for k in flat if is_head_path(k)]
    assert sorted(heads) == [
        ("decoder", "out_conv", "conv", "bias"),
        ("decoder", "out_conv", "conv", "kernel"),
    ]
    gated = [k for k in flat if is_ala_gated_path(k)]
    assert all(not is_pcs_path(k) for k in gated)
    # every up1..up4 leaf and out_conv leaf is gated
    for k in flat:
        if any(p in ("up1", "up2", "up3", "up4") for p in k) and not is_pcs_path(k):
            assert k in gated


def test_efficient_unet_shapes_and_channels():
    m = net_factory("efficient_unet", in_chns=3, class_num=2)
    x = jnp.zeros((1, 64, 64, 3))
    out = jax.eval_shape(lambda: m.apply(m.init(RNGS, x, train=False), x, train=False))
    assert out["logits"].shape == (1, 64, 64, 2)
    # B3 reduction channels, smp efficient_encoder parity (reversed)
    assert [f.shape[-1] for f in out["features"]] == [384, 136, 48, 32, 40]


def test_uncertainty_api():
    from fedicra_tpu.evaluation.uncertainty import batch_uncertainty

    m = net_factory("unet", in_chns=1, class_num=2)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 1))
    v = m.init(RNGS, x, train=False)
    u = batch_uncertainty(m, v["params"], v["batch_stats"], x,
                          jax.random.PRNGKey(1), num_samples=2)
    import numpy as np

    assert np.isfinite(float(u)) and float(u) >= 0


def test_train_mode_mutates_batch_stats():
    m = net_factory("unet", in_chns=1, class_num=2)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 1))
    v = m.init(RNGS, x, train=False)
    out, mutated = m.apply(
        v, x, train=True, rngs={"dropout": jax.random.PRNGKey(5)},
        mutable=["batch_stats"],
    )
    old = traverse_util.flatten_dict(v["batch_stats"])
    new = traverse_util.flatten_dict(mutated["batch_stats"])
    changed = any(not jnp.allclose(old[k], new[k]) for k in old)
    assert changed
