"""Benchmark: full FedICRA "Ours" training iteration throughput on one chip.

Measures images/sec/chip of the complete hot path — forward + partial CE +
recursive multi-scale tree-energy loss (4 on-device MSTs + Euler-tour tree
filters per image) + gated CRF + cross-client heatmap contrast (5 forwards)
+ backward + AdamW — at the reference's headline config (ODOC: 384x384x3,
batch 12, unet_lc_multihead, 5 clients).

Baseline anchor: the reference publishes no wall-clock numbers (BASELINE.md).
The recorded estimate for its per-GPU training rate at this config is ~12
images/s (dominated by the per-iteration CPU Boruvka round-trips:
48 MSTs over 147k-vertex grids per iteration through mst.cu:93-114 plus
5 torch forwards/backwards on a 2.3M-param U-Net). vs_baseline is
ours / 12.0 until a measured reference number replaces it in BASELINE.md.

Prints exactly one JSON line.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_IMGS_PER_SEC_ESTIMATE = 12.0


def main():
    # allow a fast CI-size run with BENCH_SMALL=1
    small = os.environ.get("BENCH_SMALL") == "1"
    img = 128 if small else 384
    batch = 4 if small else 12
    iters_timed = 3 if small else 10

    from fedicra_tpu.engine import TrainConfig, init_client_state
    from fedicra_tpu.engine.split_trainer import build_round_fn
    from fedicra_tpu.models import net_factory

    cfg = TrainConfig.for_task(
        "odoc",
        img_size=img,
        batch_size=batch,
        iters=1,
        rep_iters=0,  # single body-phase iteration per round_fn call... use 1 head iter
        max_iterations=30000,
        strategy="FedICRA",
        procedure="ours",
        model="unet_lc_multihead",
    )
    # one full-body iteration per call: iters=1, rep_iters=1
    cfg = cfg.replace(iters=1, rep_iters=1)
    if os.environ.get("BENCH_AMP") == "1":
        cfg = cfg.replace(amp=True)

    model = net_factory(
        cfg.model,
        in_chns=cfg.in_chns,
        class_num=cfg.num_classes,
        num_clients=cfg.num_clients,
        client_id=0,
    )
    state = init_client_state(model, cfg)
    round_fn = build_round_fn(model, cfg)

    rng = np.random.default_rng(0)
    batches = {
        "image": jnp.asarray(
            rng.uniform(size=(1, batch, img, img, cfg.in_chns)).astype(np.float32)
        ),
        "label": jnp.asarray(
            rng.integers(0, cfg.num_classes + 1, size=(1, batch, img, img)).astype(
                np.int32
            )
        ),
    }
    cid = jnp.asarray(1, jnp.int32)

    def sync(metrics):
        # value fetch: block_until_ready is unreliable through tunneled
        # runtimes (async dispatch reports completion early)
        return float(np.asarray(metrics["total_loss"])[-1])

    # compile + warmup
    state, m = round_fn(state, batches, cid)
    sync(m)
    state, m = round_fn(state, batches, cid)
    sync(m)

    t0 = time.perf_counter()
    for _ in range(iters_timed):
        state, metrics = round_fn(state, batches, cid)
    last_loss = sync(metrics)
    dt = time.perf_counter() - t0
    assert np.isfinite(last_loss), last_loss

    imgs_per_sec = iters_timed * batch / dt
    result = {
        "metric": "images_per_sec_per_chip (FedICRA 'Ours' full train step, ODOC 384^2 bs12)"
        if not small
        else "images_per_sec_per_chip (small config)",
        "value": round(imgs_per_sec, 3),
        "unit": "images/s/chip",
        "vs_baseline": round(imgs_per_sec / REFERENCE_IMGS_PER_SEC_ESTIMATE, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
