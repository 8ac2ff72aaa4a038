"""Precise phase attribution for the split-trainer iteration on TPU.

bench.py's instrumented window lumps part2a's device compute into its
"part2a_fetch" phase (the first chunk fetch blocks on the compute), so the
wire share of the iteration is not directly visible. This probe separates:

  p2a_compute   part2a dispatch + compute, synced via a SCALAR fetch only
  wire_down     np.asarray of the already-computed ship chunks (pure D2H)
  host_chain    the packed native chain on the fetched arrays (warm cache)
  wire_up       device_put of the cotangent chunks + scalar-synced consume
  p2b_compute   part2b dispatch + compute, inputs already on device
  raw D2H/H2D   tunnel bandwidth on a fresh array of the same byte size

Every timing is value-fetch synced (block_until_ready lies through the
tunnel — CLAUDE.md). Run only when the chip is otherwise idle; takes the
quiesce sentinel like bench.py. Prints one JSON line.
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
    reps = int(os.environ.get("PROBE_REPS", "5"))

    from fedicra_tpu.engine import TrainConfig, init_client_state
    from fedicra_tpu.engine.split_trainer import (
        _chunk_bounds,
        make_split_round_fn,
    )
    from fedicra_tpu.engine.trainer import _adamw, _masked_opt, poly_lr
    from fedicra_tpu.losses.tree_energy_host import (
        multi_scale_tree_loss_host_npacked,
        multi_scale_tree_loss_host_packed,
    )
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
    round_fn = make_split_round_fn(model, cfg)
    parts = round_fn.parts
    part2a, part2b = parts["part2a"], parts["part2b_full"]
    partF, merged = parts["partF"], parts["merged"]
    n_chunks, tdtype = parts["n_chunks"], parts["tdtype"]
    ship_mode = parts["ship_mode"]
    ship_shapes = parts["ship_shapes"]  # filled at first partF/part2a trace

    def chain_call(arr, lo, hi, rois, low, n_roi):
        if ship_mode == "native":
            return multi_scale_tree_loss_host_npacked(
                arr, low[lo:hi], rois[lo:hi], cfg.tree_loss_weight,
                list(ship_shapes), recursive=True, roi_total=n_roi,
            )
        return multi_scale_tree_loss_host_packed(
            arr, low[lo:hi], rois[lo:hi], cfg.tree_loss_weight,
            recursive=True, roi_total=n_roi,
        )

    rng = np.random.default_rng(0)
    img_np = rng.uniform(size=(batch, img, img, cfg.in_chns)).astype(np.float32)
    lab_np = rng.integers(0, cfg.num_classes + 1, size=(batch, img, img)).astype(
        np.int32
    )
    batch_dev = {"image": jnp.asarray(img_np), "label": jnp.asarray(lab_np)}
    cid = jnp.asarray(1, jnp.int32)
    k = jax.random.PRNGKey(0)

    params, stats = state.params, state.batch_stats
    mask = path_mask(params, lambda p: not is_pcs_path(p))
    opt_state = _masked_opt(_adamw(0.0), mask).init(params)
    lr = poly_lr(cfg.base_lr, 0, cfg.max_iterations)

    def t_scalar(x):
        return float(np.asarray(x))

    # ---- warmup: compile part2a + part2b and warm the tree cache ----
    grads_a, new_stats, loss_a, metrics_a, ship = part2a(
        params, stats, k, batch_dev, cid
    )
    t_scalar(loss_a)
    ship_np = [np.asarray(c) for c in ship]
    low = img_np if img_np.shape[-1] == 3 else np.repeat(img_np, 3, -1)
    rois = (lab_np == cfg.num_classes).astype(np.float32)
    bounds = _chunk_bounds(batch, n_chunks)
    n_roi = float(rois.sum(dtype=np.float32))
    chain_out = [
        chain_call(arr, lo, hi, rois, low, n_roi)
        for arr, (lo, hi) in zip(ship_np, bounds)
    ]
    tree_val = float(np.concatenate([c[0] for c in chain_out]).sum())
    cots_np = [c[1] for c in chain_out]
    cots = tuple(jnp.asarray(c, dtype=tdtype) for c in cots_np)
    if merged:
        args = (lr, k, batch_dev, cid, jnp.float32(tree_val), cots)
    else:
        args = (
            lr, k, batch_dev, cid, grads_a, new_stats, loss_a, metrics_a,
            jnp.float32(tree_val), cots,
        )
    p_out = part2b(params, stats, opt_state, *args)
    t_scalar(p_out[3]["total_loss"])
    shipF = partF(params, stats, k, batch_dev, cid)
    np.asarray(shipF[0])

    wire_bytes = sum(c.nbytes for c in ship_np)
    res = {"img": img, "batch": batch, "n_chunks": n_chunks,
           "tdtype": str(np.dtype(tdtype)), "wire_mb": round(wire_bytes / 1e6, 2),
           "amp": cfg.amp, "ship_mode": ship_mode}

    def med(f, n=reps):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            f()
            ts.append(time.perf_counter() - t0)
        return round(statistics.median(ts), 4), [round(t, 4) for t in ts]

    def med_inner(f, n=reps):
        """f returns its own elapsed seconds (for phases that need fresh
        un-cached device arrays set up outside the timed segment —
        jax.Array caches the host copy after the first np.asarray, so
        re-fetching the SAME array times ~0)."""
        ts = [f() for _ in range(n)]
        return round(statistics.median(ts), 4), [round(t, 4) for t in ts]

    # ---- p2a_compute: dispatch + compute, scalar sync only ----
    def f_p2a():
        out = part2a(params, stats, k, batch_dev, cid)
        t_scalar(out[2])

    res["p2a_compute"], res["p2a_compute_all"] = med(f_p2a)
    res["merged"] = merged

    # ---- pF_compute: forward-only dispatch, synced via a tiny slice
    # (shape-agnostic: ship chunks are (B,H,W,4C) full-res or (B,L) under
    # the native wire format) ----
    def f_pF():
        out = partF(params, stats, k, batch_dev, cid)
        t_scalar(out[0].ravel()[0])

    res["pF_compute"], res["pF_compute_all"] = med(f_pF)

    # ---- wire_down: ship chunks freshly computed + scalar-synced each
    # rep (a repeated fetch of the same jax.Array reads its cached host
    # copy); only the np.asarray segment is timed ----
    def f_down():
        out = part2a(params, stats, k, batch_dev, cid)
        t_scalar(out[2])  # compute definitely finished
        t0 = time.perf_counter()
        for c in out[4]:
            np.asarray(c)
        return time.perf_counter() - t0

    res["wire_down"], res["wire_down_all"] = med_inner(f_down)

    # ---- host_chain (warm low-tree cache) ----
    def f_chain():
        for arr, (lo, hi) in zip(ship_np, bounds):
            chain_call(arr, lo, hi, rois, low, n_roi)

    res["host_chain"], res["host_chain_all"] = med(f_chain)

    # ---- wire_up: H2D of the cotangent chunks, synced by consuming ----
    sum_fn = jax.jit(lambda xs: sum(jnp.sum(x.astype(jnp.float32)) for x in xs))
    t_scalar(sum_fn(cots))  # compile

    def f_up():
        dev = tuple(jnp.asarray(c, dtype=tdtype) for c in cots_np)
        t_scalar(sum_fn(dev))

    res["wire_up"], res["wire_up_all"] = med(f_up)

    # ---- p2b_compute: all inputs resident on device ----
    def f_p2b():
        out = part2b(params, stats, opt_state, *args)
        t_scalar(out[3]["total_loss"])

    res["p2b_compute"], res["p2b_compute_all"] = med(f_p2b)

    # ---- raw tunnel bandwidth at the same byte size (fresh device array
    # per rep — same host-copy-cache pitfall as above) ----
    raw = rng.uniform(size=(wire_bytes // 4,)).astype(np.float32)

    def f_raw_down():
        dev = jax.device_put(raw)
        t_scalar(dev[0])  # resident on device
        t0 = time.perf_counter()
        np.asarray(dev)
        return time.perf_counter() - t0

    res["raw_d2h"], res["raw_d2h_all"] = med_inner(f_raw_down)
    dev_raw = jnp.asarray(raw)
    t_scalar(jnp.sum(dev_raw[:8]))

    sum1 = jax.jit(jnp.sum)
    t_scalar(sum1(dev_raw))

    def f_raw_up():
        d = jnp.asarray(raw)
        t_scalar(sum1(d))

    res["raw_h2d"], res["raw_h2d_all"] = med(f_raw_up)

    res["raw_d2h_mb_s"] = round(wire_bytes / 1e6 / res["raw_d2h"], 1)
    res["raw_h2d_mb_s"] = round(wire_bytes / 1e6 / res["raw_h2d"], 1)

    # ---- single-fetch RTT: a 4-byte scalar round trip (fresh scalar per
    # rep; re-fetching the same array reads the cached host copy) ----
    inc = jax.jit(lambda x: x + 1.0)
    s = inc(jnp.float32(0.0))
    t_scalar(s)

    def f_rtt():
        nonlocal_s = inc(s)
        t0 = time.perf_counter()
        t_scalar(nonlocal_s)
        return time.perf_counter() - t0

    res["scalar_rtt"], _ = med_inner(f_rtt, n=10)

    print(json.dumps(res))


if __name__ == "__main__":
    from fedicra_tpu.utils.quiesce import quiesce

    with quiesce():
        main()
