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


# --- ImageNet checkpoint story (VERDICT r2 missing #3) ----------------------
# The real efficientnet-b3-5fb5a3c3.pth cannot be fetched offline; when a
# copy is supplied (FEDICRA_B3_PTH or the default drop path), this test
# checksum-verifies it (torch-hub convention: filename suffix = first 8 hex
# of the SHA-256) and round-trips it through the converter.

def _find_b3_pth():
    cands = [
        os.environ.get("FEDICRA_B3_PTH"),
        "/root/weights/efficientnet-b3-5fb5a3c3.pth",
        os.path.expanduser("~/.cache/torch/hub/checkpoints/efficientnet-b3-5fb5a3c3.pth"),
    ]
    for c in cands:
        if c and os.path.exists(c):
            return c
    return None


@pytest.mark.skipif(_find_b3_pth() is None,
                    reason="no local efficientnet-b3 .pth supplied")
def test_imagenet_b3_checkpoint_checksum_and_load():
    import hashlib

    from fedicra_tpu.models.efficientunet import EffiUNet, load_pretrained_encoder

    path = _find_b3_pth()
    digest = hashlib.sha256(open(path, "rb").read()).hexdigest()
    stem = os.path.basename(path).rsplit(".", 1)[0]
    if "-" in stem:
        expect = stem.rsplit("-", 1)[1]
        assert digest.startswith(expect), (
            f"checkpoint {path} sha256 {digest[:8]} != filename tag {expect}"
        )

    model = EffiUNet(in_chns=3, num_classes=2)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    before = jax.tree.leaves(variables["params"]["encoder"])[0]
    loaded = load_pretrained_encoder(variables, path)
    after = jax.tree.leaves(loaded["params"]["encoder"])[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    out = model.apply(loaded, jnp.zeros((1, 64, 64, 3)), train=False)
    assert np.isfinite(np.asarray(out["logits"])).all()
