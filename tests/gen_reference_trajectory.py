"""Generate the cross-framework golden trajectory (run offline, JSON checked in).

Runs the reference pCE federated procedure (flower_pCE_2D.py:51-181
semantics: FedAvg, AdamW recreated per round, per-iteration poly LR, partial
CE with ignore_index=num_classes) in TORCH via tests/torch_mirror.py, from
the exact flax initialization and seed-fixed injected batches, and writes
per-iteration losses to tests/reference_trajectory.json.

tests/test_reference_parity.py then asserts the JAX trainer reproduces the
trajectory. Regenerate with:  python tests/gen_reference_trajectory.py
"""

from __future__ import annotations

import json
import os

import numpy as np

CONFIG = dict(
    img_size=32,
    batch_size=2,
    in_chns=3,
    num_classes=3,
    num_clients=2,
    rounds=3,
    iters=5,
    base_lr=0.01,
    max_iterations=1000,
    seed=2022,
    data_seed=42,
)

_HERE = os.path.dirname(os.path.abspath(__file__))
GOLDEN_PATH = os.path.join(_HERE, "reference_trajectory.json")


def make_batches(cfg=CONFIG):
    """Seed-fixed injected batches, one [rounds, iters, B,H,W,C] set per client."""
    rng = np.random.default_rng(cfg["data_seed"])
    K, R, I = cfg["num_clients"], cfg["rounds"], cfg["iters"]
    B, H, C = cfg["batch_size"], cfg["img_size"], cfg["in_chns"]
    out = []
    for _ in range(K):
        out.append(
            {
                "image": rng.uniform(size=(R, I, B, H, H, C)).astype(np.float32),
                "label": rng.integers(
                    0, cfg["num_classes"] + 1, size=(R, I, B, H, H)
                ).astype(np.int32),
            }
        )
    return out


def make_jax_model_and_state(cfg=CONFIG):
    import jax

    # must match tests/conftest.py so the golden init == the test init
    jax.config.update("jax_threefry_partitionable", False)

    from fedicra_tpu.engine import TrainConfig, init_client_state
    from fedicra_tpu.models import net_factory

    tc = TrainConfig.for_task(
        "odoc",
        img_size=cfg["img_size"],
        batch_size=cfg["batch_size"],
        iters=cfg["iters"],
        rep_iters=0,
        max_iterations=cfg["max_iterations"],
        base_lr=cfg["base_lr"],
        strategy="FedAvg",
        procedure="pce",
        model="unet",
    ).replace(num_clients=cfg["num_clients"], seed=cfg["seed"])
    model = net_factory(
        "unet",
        in_chns=cfg["in_chns"],
        class_num=cfg["num_classes"],
        dropout=(0.0,) * 5,
    )
    state = init_client_state(model, tc)
    return model, tc, state


def run_jax_pce_federation(model, tc, state, client_batches, cfg=CONFIG):
    """The JAX side: per-round local training via make_round_fn + equal-weight
    FedAvg of params and BN stats (mirrors the torch loop exactly)."""
    import jax
    import jax.numpy as jnp

    from fedicra_tpu.engine.trainer import ClientState, make_round_fn
    from fedicra_tpu.federation.strategies import weighted_tree_mean

    round_fn = jax.jit(make_round_fn(model, tc))
    K = cfg["num_clients"]
    global_p, global_s = state.params, state.batch_stats
    it = state.current_iter
    rng = state.rng
    losses = [[] for _ in range(K)]
    for r in range(cfg["rounds"]):
        new_ps, new_ss = [], []
        for cid in range(K):
            st = ClientState(
                params=global_p, batch_stats=global_s, current_iter=it, rng=rng
            )
            b = {
                "image": jnp.asarray(client_batches[cid]["image"][r]),
                "label": jnp.asarray(client_batches[cid]["label"][r]),
            }
            st2, metrics = round_fn(st, b, jnp.asarray(cid, jnp.int32))
            losses[cid].extend(np.asarray(metrics["total_loss"]).tolist())
            new_ps.append(st2.params)
            new_ss.append(st2.batch_stats)
        w = [1.0] * K
        global_p = weighted_tree_mean(new_ps, w)
        global_s = weighted_tree_mean(new_ss, w)
        it = it + cfg["iters"]
    return losses, global_p


class InjectedBatcher:
    """batch_at(it) shim feeding fixed arrays to train_centralized."""

    def __init__(self, images, labels):
        import jax.numpy as jnp

        self.images = jnp.asarray(images)
        self.labels = jnp.asarray(labels)

    def batch_at(self, it):
        return {"image": self.images[it], "label": self.labels[it]}


def run_jax_sgd_centralized(model, tc, batches_flat, iters, cfg=CONFIG):
    from fedicra_tpu.engine.centralized import train_centralized

    losses = []
    state_dict, _ = train_centralized(
        model,
        tc,
        train_split=None,
        val_split=None,
        max_iterations=iters,
        eval_iters=10 * iters,  # never evaluates
        batcher=InjectedBatcher(batches_flat["image"], batches_flat["label"]),
        loss_log=losses,
    )
    return losses, state_dict["params"]


def main():
    import jax

    model, tc, state = make_jax_model_and_state()
    batches = make_batches()

    # forward parity gate: the torch mirror must match the flax forward
    from torch_mirror import TorchUNet, run_torch_pce_federation

    tm = TorchUNet(
        jax.tree.map(np.asarray, state.params),
        jax.tree.map(np.asarray, state.batch_stats),
    )
    x = batches[0]["image"][0, 0]
    flax_logits = np.asarray(
        model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x,
            train=False,
        )["logits"]
    )
    torch_logits = tm.forward(x, train=False).detach().numpy().transpose(0, 2, 3, 1)
    fwd_err = float(np.abs(flax_logits - torch_logits).max())
    assert fwd_err < 1e-4, f"forward mismatch: {fwd_err}"

    losses, final_p = run_torch_pce_federation(
        jax.tree.map(np.asarray, state.params),
        jax.tree.map(np.asarray, state.batch_stats),
        batches,
        num_classes=CONFIG["num_classes"],
        base_lr=CONFIG["base_lr"],
        max_iterations=CONFIG["max_iterations"],
        rounds=CONFIG["rounds"],
        iters=CONFIG["iters"],
    )
    checksum = float(sum(np.abs(p).sum() for p in final_p))

    # SGD centralized trajectory (Unet_pCE.py semantics): tight-tolerance
    # oracle — SGD does not amplify fp32 sign noise the way Adam does
    from torch_mirror import run_torch_sgd_centralized

    sgd_iters = CONFIG["rounds"] * CONFIG["iters"]
    flat = {
        "image": batches[0]["image"].reshape(-1, *batches[0]["image"].shape[2:]),
        "label": batches[0]["label"].reshape(-1, *batches[0]["label"].shape[2:]),
    }
    sgd_losses, sgd_final = run_torch_sgd_centralized(
        jax.tree.map(np.asarray, state.params),
        jax.tree.map(np.asarray, state.batch_stats),
        flat,
        num_classes=CONFIG["num_classes"],
        base_lr=CONFIG["base_lr"],
        max_iterations=CONFIG["max_iterations"],
        iters=sgd_iters,
    )
    golden = {
        "config": CONFIG,
        "forward_parity_max_abs_err": fwd_err,
        "losses": losses,
        "final_param_abssum": checksum,
        "sgd_losses": sgd_losses,
        "sgd_final_param_abssum": float(sum(np.abs(p).sum() for p in sgd_final)),
        "generator": "tests/gen_reference_trajectory.py (torch mirror of "
        "flower_pCE_2D.py:51-181 and Unet_pCE.py:63-244)",
    }
    with open(GOLDEN_PATH, "w") as f:
        json.dump(golden, f, indent=1)
    print(f"wrote {GOLDEN_PATH}: fwd_err={fwd_err:.2e}")
    for cid, ls in enumerate(losses):
        print(f"  client {cid} losses: {[round(l, 4) for l in ls]}")


if __name__ == "__main__":
    import sys

    sys.path.insert(0, _HERE)
    main()
