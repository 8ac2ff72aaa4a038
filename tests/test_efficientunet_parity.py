"""EfficientNet-B3 torch->flax converter + forward parity (VERDICT item #6).

efficientnet-pytorch is not installed offline, so the oracle is a functional
torch executor of the exact state_dict format (torch_efficientnet_mirror.py)
driven by a synthetic checkpoint with the package's key names/shapes. The
converter under test (models/efficientunet.py) is the one that loads a real
ImageNet .pth when supplied (--encoder_weights), so this pins the mapping,
the TF-SAME padding semantics, and the B3 topology end-to-end.
"""

import sys, os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import torch_efficientnet_mirror as tm

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def converted():
    from fedicra_tpu.models.efficientunet import EffiUNet, load_pretrained_encoder

    model = EffiUNet(in_chns=3, num_classes=2)
    x0 = jnp.zeros((1, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x0,
        train=False,
    )
    sd = tm.make_b3_state_dict(in_chns=3, seed=3)
    variables = load_pretrained_encoder(variables, sd)
    return model, variables, sd


def test_encoder_forward_matches_torch(converted):
    model, variables, sd = converted
    rng = np.random.default_rng(1)
    x = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)

    torch_feats = tm.encoder_forward(sd, x)

    from fedicra_tpu.models.efficientunet import EfficientNetEncoder

    enc = EfficientNetEncoder()
    enc_vars = {
        "params": variables["params"]["encoder"],
        "batch_stats": variables["batch_stats"]["encoder"],
    }
    flax_feats = enc.apply(enc_vars, jnp.asarray(x), train=False)

    assert len(torch_feats) == len(flax_feats) == 6
    # reference smp reduction channels for B3: (3, 40, 32, 48, 136, 384)
    assert [f.shape[-1] for f in flax_feats] == [3, 40, 32, 48, 136, 384]
    for i, (tf_, ff) in enumerate(zip(torch_feats, flax_feats)):
        ff = np.asarray(ff)
        assert tf_.shape == ff.shape, (i, tf_.shape, ff.shape)
        err = np.abs(tf_ - ff).max()
        scale = np.abs(tf_).max() + 1e-6
        assert err < 2e-3 * scale + 1e-4, (i, err, scale)


def test_wrong_checkpoint_fails_loudly(converted):
    from fedicra_tpu.models.efficientunet import load_pretrained_encoder

    model, variables, sd = converted
    bad = dict(sd)
    bad["_conv_stem.weight"] = bad["_conv_stem.weight"][:, :1]  # B0-ish shape
    with pytest.raises((ValueError, KeyError)):
        load_pretrained_encoder(variables, bad)


def test_full_unet_forward_finite(converted):
    model, variables, _ = converted
    x = jnp.asarray(
        np.random.default_rng(2).uniform(size=(1, 64, 64, 3)).astype(np.float32)
    )
    out = model.apply(variables, x, train=False)
    assert out["logits"].shape == (1, 64, 64, 2)
    assert np.isfinite(np.asarray(out["logits"])).all()
