"""Device-time attribution for the split-trainer jits (VERDICT r4 missing #4).

probe_phases.py measures each phase's WALL time through the tunnel — one
dispatch + one fetched-value sync — which folds a ~24 ms RTT plus dispatch
shipping into every number and cannot separate "device is busy" from "wire
is busy". This probe estimates pure DEVICE time per phase with the slope
method: dispatch the same jitted program K times back-to-back (K-chained on
its own outputs where the signature allows, so execution strictly
serializes), sync ONCE by fetching a scalar from the last output, and take

    device_time ~= (T_K - T_1) / (K - 1)

The RTT and the one-off dispatch latency cancel in the difference; queued
executions run gapless on the single TPU stream. part2bc is chained through
its real (params, batch_stats, opt_state) outputs, so the K dispatches are
literally K optimizer steps — the realistic instruction mix, not a replay
of one step.

Run twice (PROBE_AMP=0/1) for the fp32 vs bf16 device-compute comparison
that the production projection (BASELINE.md "27 img/s") rests on. Takes the
quiesce sentinel like bench.py. Prints one JSON line.

Reference hot loop being projected: SURVEY.md §3.3
(flower_pCE_2D_GateCRFMsacleTreeEnergyLoss_Ours.py:142-205).
"""

import json
import os
import statistics
import time

import jax

from fedicra_tpu.utils.jit_cache import enable_persistent_cache

enable_persistent_cache()
import jax.numpy as jnp
import numpy as np


def main():
    img = int(os.environ.get("PROBE_IMG", "384"))
    batch = int(os.environ.get("PROBE_BATCH", "12"))
    reps = int(os.environ.get("PROBE_REPS", "3"))
    K = int(os.environ.get("PROBE_K", "8"))

    from fedicra_tpu.engine import TrainConfig, init_client_state
    from fedicra_tpu.engine.split_trainer import make_split_round_fn
    from fedicra_tpu.engine.trainer import _adamw, _masked_opt, poly_lr
    from fedicra_tpu.models import net_factory
    from fedicra_tpu.models.params_filters import is_pcs_path, path_mask

    cfg = TrainConfig.for_task(
        "odoc",
        img_size=img,
        batch_size=batch,
        iters=1,
        rep_iters=1,
        max_iterations=30000,
        strategy="FedICRA",
        procedure="ours",
        model="unet_lc_multihead",
    )
    if os.environ.get("PROBE_AMP") == "1":
        cfg = cfg.replace(amp=True)

    model = net_factory(
        cfg.model,
        in_chns=cfg.in_chns,
        class_num=cfg.num_classes,
        num_clients=cfg.num_clients,
        client_id=0,
    )
    state = init_client_state(model, cfg)
    parts = make_split_round_fn(model, cfg).parts
    partF, part2b = parts["partF"], parts["part2b_full"]
    merged, tdtype = parts["merged"], parts["tdtype"]
    assert merged, "probe targets the default merged-backward pipeline"

    rng = np.random.default_rng(0)
    img_np = rng.uniform(size=(batch, img, img, cfg.in_chns)).astype(np.float32)
    lab_np = rng.integers(
        0, cfg.num_classes + 1, size=(batch, img, img)
    ).astype(np.int32)
    batch_dev = {"image": jnp.asarray(img_np), "label": jnp.asarray(lab_np)}
    cid = jnp.asarray(1, jnp.int32)
    k = jax.random.PRNGKey(0)

    params, stats = state.params, state.batch_stats
    mask = path_mask(params, lambda p: not is_pcs_path(p))
    opt_state = _masked_opt(_adamw(0.0), mask).init(params)
    lr = poly_lr(cfg.base_lr, 0, cfg.max_iterations)

    def t_scalar(x):
        return float(np.asarray(x))

    # ---- warmup / compile; build a real cotangent-shaped upload ----
    ship = partF(params, stats, k, batch_dev, cid)
    cots = tuple(
        jnp.asarray(
            rng.standard_normal(c.shape).astype(np.float32) * 1e-3,
            dtype=tdtype,
        )
        for c in ship
    )
    t_scalar(ship[0].ravel()[0])
    args_tail = (lr, k, batch_dev, cid, jnp.float32(0.01), cots)
    out = part2b(params, stats, opt_state, *args_tail)
    t_scalar(out[3]["total_loss"])

    res = {
        "img": img,
        "batch": batch,
        "K": K,
        "amp": cfg.amp,
        "tdtype": str(np.dtype(tdtype)),
        "backend": jax.default_backend(),
        "load1_start": round(os.getloadavg()[0], 2),
    }

    def med(f, n=reps):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        return statistics.median(ts), [round(t, 4) for t in ts]

    # ---- partF: K independent dispatches, one scalar sync at the end
    # (single TPU stream => queued executions serialize) ----
    def fF(n):
        def run():
            last = None
            for _ in range(n):
                last = partF(params, stats, k, batch_dev, cid)
            t_scalar(last[0].ravel()[0])
        return run

    t1, t1_all = med(fF(1))
    tK, tK_all = med(fF(K))
    res["partF_wall1"] = round(t1, 4)
    res["partF_device"] = round((tK - t1) / (K - 1), 4)
    res["partF_wall1_all"], res["partF_wallK_all"] = t1_all, tK_all

    # ---- part2bc: K chained optimizer steps (params/stats/opt flow
    # through), one scalar sync on the last step's loss ----
    def f2(n):
        def run():
            p, s, o = params, stats, opt_state
            m = None
            for _ in range(n):
                p, s, o, m = part2b(p, s, o, *args_tail)
            t_scalar(m["total_loss"])
        return run

    t1, t1_all = med(f2(1))
    tK, tK_all = med(f2(K))
    res["part2bc_wall1"] = round(t1, 4)
    res["part2bc_device"] = round((tK - t1) / (K - 1), 4)
    res["part2bc_wall1_all"], res["part2bc_wallK_all"] = t1_all, tK_all

    # ---- compiled-flops MFU of the device phases ----
    flops = {}
    for name, jitted, a in (
        ("partF", partF, (params, stats, k, batch_dev, cid)),
        ("part2bc", part2b, (params, stats, opt_state) + args_tail),
    ):
        try:
            ca = jitted.lower(*a).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops[name] = float(ca.get("flops", 0.0))
        except Exception:
            flops[name] = 0.0
    res["flops_partF"] = flops["partF"]
    res["flops_part2bc"] = flops["part2bc"]
    dev_total = res["partF_device"] + res["part2bc_device"]
    res["device_s_per_iter"] = round(dev_total, 4)
    res["device_img_s"] = round(batch / dev_total, 2) if dev_total > 0 else None
    # peak: TPU v5e 197 TFLOP/s bf16, ~98 fp32
    peak = 197e12 if cfg.amp else 98.5e12
    if dev_total > 0:
        res["device_mfu"] = round(
            (flops["partF"] + flops["part2bc"]) / dev_total / peak, 4
        )
    res["load1_end"] = round(os.getloadavg()[0], 2)
    print(json.dumps(res))


if __name__ == "__main__":
    from fedicra_tpu.utils.quiesce import quiesce

    with quiesce():
        main()
