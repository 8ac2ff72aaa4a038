"""Native-resolution packed wire (FEDICRA_AUX_SHIP=native): the C++ resize
must equal jax.image.resize 'linear' and the numpy matrix path; the npacked
chain must equal the composed (resize -> unpacked chain -> adjoint) path
bitwise; and the end-to-end split trainer under the native ship must match
the full-res ship up to the bf16-class rounding the mode moves around."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fedicra_tpu import native
from fedicra_tpu.losses import tree_energy_host as teh

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib unavailable"
)


def test_cpp_resize_matches_jax_and_numpy():
    rng = np.random.default_rng(0)
    for (h, w, H, W) in [(24, 20, 96, 80), (5, 7, 5, 7), (16, 16, 33, 31)]:
        x = rng.normal(size=(2, h, w, 3)).astype(np.float32)
        up_c = native.resize_up_native(x, H, W)
        up_np = teh.resize_up_host(x, H, W)
        up_jax = np.asarray(
            jax.image.resize(jnp.asarray(x), (2, H, W, 3), "linear")
        )
        np.testing.assert_allclose(up_c, up_np, rtol=1e-6, atol=1e-6)
        # jax computes the sample weights in a different association order;
        # at non-integer ratios that shows up at a few 1e-6 absolute
        np.testing.assert_allclose(up_c, up_jax, rtol=5e-4, atol=1e-5)


def test_cpp_adjoint_is_exact_transpose():
    rng = np.random.default_rng(1)
    h, w, H, W = 12, 10, 48, 40
    x = rng.normal(size=(3, h, w, 2)).astype(np.float32)
    d = rng.normal(size=(3, H, W, 2)).astype(np.float32)
    up = native.resize_up_native(x, H, W)
    adj = native.resize_adjoint_native(d, h, w)
    lhs = float((up.astype(np.float64) * d).sum())
    rhs = float((x.astype(np.float64) * adj).sum())
    assert abs(lhs - rhs) / max(abs(lhs), 1e-9) < 1e-5
    np.testing.assert_allclose(
        adj, teh.resize_adjoint_host(d, h, w), rtol=1e-6, atol=1e-6
    )


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
@pytest.mark.parametrize("recursive", [True, False])
def test_npacked_chain_matches_composed_bitwise(dtype, recursive):
    """npacked == [C++ resize -> unpacked chain -> C++ adjoint] exactly:
    the same resize code feeds the same chain_one, so every block of the
    flat cotangent array must be bit-identical."""
    import ml_dtypes

    rng = np.random.default_rng(11)
    B, Hf, Wf, C = 3, 20, 20, 3
    prob = np.asarray(
        jax.nn.softmax(
            jnp.asarray(rng.normal(size=(B, Hf, Wf, C)).astype(np.float32)), -1
        )
    )
    low = rng.random((B, Hf, Wf, 3)).astype(np.float32)
    aux = [
        rng.normal(size=(B, Hf // s, Wf // s, C)).astype(np.float32)
        for s in (4, 2, 1)
    ]
    rois = (rng.random((B, Hf, Wf)) < 0.3).astype(np.float32)
    hws = [(Hf, Wf)] + [(a.shape[1], a.shape[2]) for a in aux]
    packed = np.concatenate(
        [prob.reshape(B, -1)] + [a.reshape(B, -1) for a in aux], 1
    )
    if dtype == "bfloat16":
        packed = packed.astype(ml_dtypes.bfloat16)

    li, dpk = teh.multi_scale_tree_loss_host_npacked(
        packed, low, rois, 0.1, hws, recursive=recursive
    )

    wide = np.asarray(packed, np.float32)
    offs = [0]
    for hh, ww in hws:
        offs.append(offs[-1] + hh * ww * C)
    blocks = [
        wide[:, offs[k]:offs[k + 1]].reshape((B,) + hws[k] + (C,))
        for k in range(4)
    ]
    aux_up = [
        native.resize_up_native(b, Hf, Wf) if b.shape[1] != Hf else b
        for b in blocks[1:]
    ]
    ref = teh.multi_scale_tree_loss_host(
        blocks[0], low, *aux_up, rois, 0.1, recursive=recursive,
        per_image=True,
    )
    np.testing.assert_array_equal(li, ref[0])
    np.testing.assert_array_equal(
        dpk[:, offs[0]:offs[1]].reshape(B, Hf, Wf, C), ref[1]
    )
    for k in range(3):
        hh, ww = hws[1 + k]
        d_nat = (
            native.resize_adjoint_native(
                np.ascontiguousarray(ref[2 + k]), hh, ww
            )
            if (hh, ww) != (Hf, Wf)
            else ref[2 + k]
        )
        np.testing.assert_array_equal(
            dpk[:, offs[1 + k]:offs[2 + k]].reshape(B, hh, ww, C), d_nat
        )


@pytest.mark.slow
def test_native_ship_trains_like_full_ship(monkeypatch):
    """End-to-end split trainer under FEDICRA_AUX_SHIP=native vs 'full':
    the two wire formats bound the same objective — values differ only by
    where the transfer rounding lands (device resize-then-round vs host
    round-then-resize) — so losses agree to that rounding scale and the
    parameter trajectories stay globally close (same bound style as
    tests/test_split_merged.py)."""
    from fedicra_tpu.data import EpochBatcher, make_synthetic_split
    from fedicra_tpu.engine import TrainConfig, init_client_state
    from fedicra_tpu.engine.split_trainer import make_split_round_fn
    from fedicra_tpu.models import net_factory

    def run(mode):
        monkeypatch.setenv("FEDICRA_AUX_SHIP", mode)
        cfg = TrainConfig.for_task(
            "odoc", img_size=16, batch_size=3, iters=2, rep_iters=1,
            max_iterations=60, strategy="FedICRA", procedure="ours",
            model="unet_lc_multihead",
        )
        model = net_factory(
            cfg.model, in_chns=cfg.in_chns, class_num=cfg.num_classes,
            num_clients=cfg.num_clients,
        )
        state0 = init_client_state(model, cfg)
        split = make_synthetic_split(
            6, 16, 16, cfg.in_chns, cfg.num_classes, seed=3
        )
        batcher = EpochBatcher(
            split, cfg.batch_size, cfg.num_classes, "odoc", seed=5
        )
        batches = batcher.batches_for_round(0, cfg.iters)
        fn = make_split_round_fn(model, cfg)
        assert fn.parts["ship_mode"] == mode
        return fn(state0, batches, jnp.asarray(1, jnp.int32))

    s_full, m_full = run("full")
    s_nat, m_nat = run("native")
    np.testing.assert_allclose(
        np.asarray(m_full["total_loss"]), np.asarray(m_nat["total_loss"]),
        rtol=2e-4, atol=1e-5,
    )
    num = den = 0.0
    for a, b in zip(jax.tree.leaves(s_full.params), jax.tree.leaves(s_nat.params)):
        num += float(jnp.sum((a - b) ** 2))
        den += float(jnp.sum(jnp.asarray(a) ** 2))
    rel = (num / max(den, 1e-30)) ** 0.5
    assert rel < 5e-3, rel
