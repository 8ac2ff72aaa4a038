"""Cross-framework collapse experiment (VERDICT r4 item 3).

BASELINE.md's round-4 FAZ record diagnosed a hard all-background collapse
(global fg-prob on true-FAZ pixels 0.012 -> 1e-4) and claimed the attractor
"is a property of the reference objective itself" — with zero
reference-side evidence. This tool produces that evidence: it runs the FULL
'ours' objective (pCE + 0.1*MScaleRecurveTree + 0.1*GatedCRF + alpha*lc,
FedICRA federation with ALA — reference flower_runner.py:63-72 +
..._Ours.py:110-164 semantics) on a matched FAZ-like synthetic config in
BOTH frameworks from the same flax initialization and the same batches:

- JAX:   fedicra_tpu's federated loop (the code under test), device tree path;
- torch: tests/torch_mirror.py's functional reference mirror with the dense
  O(V^2) path-product tree oracle — an independent implementation of the
  reference's torch semantics.

After every round it probes each client's LOCAL model on a fixed probe
batch with DENSE ground truth: mean softmax foreground probability over
true-fg pixels and fg Dice at argmax. If the all-background attractor is a
property of the objective, the fg-prob trajectory decays toward 0 in both
frameworks; if it were an implementation artifact it would appear in one
only. Results land as JSONL under --out plus a printed summary table.

The synthetic task mimics FAZ's geometry: 1-channel fundus-like texture, a
small dark central zone (~2-3%% of pixels) as foreground, scribble
supervision with a tiny fg scribble (3-5 px) vs a ~10x larger bg scribble,
everything else ignore-labeled (label == num_classes). Per-client domain
shift in brightness/contrast/noise. max_iterations is kept at the
reference's 30000 so the poly LR stays ~base_lr over the 300-iteration
horizon — the regime the real FAZ run collapsed in.

Usage:
  nice -n 19 python tools/collapse_xfw.py --out runs/collapse_xfw
  python tools/collapse_xfw.py --smoke          # 2-round CI-sized check
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, os.path.join(os.path.dirname(_HERE), "tests"))


CFG = dict(
    img_size=24,
    batch_size=4,
    in_chns=1,
    num_classes=2,
    num_clients=3,
    rounds=60,
    iters=5,
    rep_iters=2,
    base_lr=0.01,
    max_iterations=30000,   # reference budget: LR ~ base_lr over this horizon
    alpha=1.0,
    gatecrf_weight=0.1,
    gatecrf_radius=5,
    tree_weight=0.1,
    tree_sigma=0.02,
    dsn_dropout=0.0,
    ala_skip_iters=10,
    ala_num_batches=2,
    pool=12,
    probe_n=4,
    seed=2022,
    data_seed=314,
)


# ---------------------------------------------------------------- data ----

def _ellipse_mask(H, cy, cx, ry, rx, rng):
    yy, xx = np.mgrid[0:H, 0:H].astype(np.float32)
    return ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0


def make_client_pool(cid, cfg, rng):
    """FAZ-like pool for one client: images [N,H,H,1] in [0,1], scribble
    labels [N,H,H] (0 bg / 1 fg / 2 ignore), dense masks [N,H,H] (0/1)."""
    H, N = cfg["img_size"], cfg["pool"] + cfg["probe_n"]
    # client domain: brightness / contrast / noise shift
    bright = 0.45 + 0.12 * cid
    contrast = 0.8 + 0.15 * cid
    noise = 0.02 + 0.015 * cid
    imgs = np.empty((N, H, H, 1), np.float32)
    labs = np.full((N, H, H), cfg["num_classes"], np.int32)
    masks = np.zeros((N, H, H), np.int32)
    for n in range(N):
        # smooth vessel-ish texture: low-frequency random field
        base = rng.normal(size=(H // 4 + 2, H // 4 + 2)).astype(np.float32)
        up = np.kron(base, np.ones((4, 4), np.float32))[:H, :H]
        img = bright + 0.10 * contrast * up
        # dark central avascular zone, ~2-3% of pixels
        cy, cx = H / 2 + rng.uniform(-2, 2), H / 2 + rng.uniform(-2, 2)
        ry = H * rng.uniform(0.075, 0.11)
        rx = H * rng.uniform(0.075, 0.11)
        m = _ellipse_mask(H, cy, cx, ry, rx, rng)
        img = np.where(m, img - 0.35 * contrast, img)
        img += rng.normal(scale=noise, size=(H, H)).astype(np.float32)
        imgs[n, :, :, 0] = np.clip(img, 0.0, 1.0)
        masks[n] = m.astype(np.int32)
        # fg scribble: the pixel nearest the center + its in-mask 4-neighbors
        iy, ix = int(round(cy)), int(round(cx))
        for dy, dx in ((0, 0), (1, 0), (-1, 0), (0, 1), (0, -1)):
            y, x = iy + dy, ix + dx
            if 0 <= y < H and 0 <= x < H and m[y, x]:
                labs[n, y, x] = 1
        # bg scribble: ~10x more px, a horizontal stroke far from the zone
        sy = int(rng.integers(2, H // 4))
        sx = int(rng.integers(1, H // 3))
        ln = int(rng.integers(24, 40))
        for k in range(ln):
            y, x = sy + k // (H - 2), (sx + k) % (H - 2)
            if not m[y, x]:
                labs[n, y, x] = 0
    return imgs, labs, masks


def make_batches(cfg):
    """Per-client training/ALA batch arrays shaped for both loops, plus a
    probe batch with dense masks. Training batches sample a small pool with
    replacement (epoch-style replay, like the reference's small val/train
    splits)."""
    rng = np.random.default_rng(cfg["data_seed"])
    K, R, I, B = (cfg["num_clients"], cfg["rounds"], cfg["iters"],
                  cfg["batch_size"])
    train, ala, probes = [], [], []
    for cid in range(K):
        imgs, labs, masks = make_client_pool(cid, cfg, rng)
        pool = cfg["pool"]
        sel = rng.integers(0, pool, size=(R, I, B))
        train.append({
            "image": imgs[sel],                     # [R,I,B,H,H,1]
            "label": labs[sel].astype(np.int32),    # [R,I,B,H,H]
        })
        nb = cfg["ala_num_batches"]
        sel_a = rng.integers(0, pool, size=(nb, B))
        ala.append({
            "image": imgs[sel_a],
            "label": labs[sel_a].astype(np.int32),
        })
        probes.append({
            "image": imgs[pool:],                   # [probe_n,H,H,1]
            "mask": masks[pool:],                   # dense gt, [probe_n,H,H]
        })
    return train, ala, probes


def _probe_stats(fg_prob_hw, mask):
    """fg_prob_hw [N,H,W] softmax fg prob; mask [N,H,W] dense gt."""
    fg = mask.astype(bool)
    p_fg = float(fg_prob_hw[fg].mean()) if fg.any() else 0.0
    pred = (fg_prob_hw > 0.5)
    inter = float((pred & fg).sum())
    dice = 2.0 * inter / max(float(pred.sum() + fg.sum()), 1.0)
    return p_fg, dice


# ---------------------------------------------------------------- JAX -----

def run_jax(cfg, train_b, ala_b, probes, out_path, log):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_threefry_partitionable", False)

    from fedicra_tpu.engine import TrainConfig, init_client_state
    from fedicra_tpu.engine.trainer import ClientState, make_round_fn
    from fedicra_tpu.federation.ala import ala_set_weights, make_ala_epoch_fn
    from fedicra_tpu.federation.strategies import weighted_tree_mean
    from fedicra_tpu.models import net_factory

    tc = TrainConfig.for_task(
        "faz",
        img_size=cfg["img_size"],
        batch_size=cfg["batch_size"],
        iters=cfg["iters"],
        rep_iters=cfg["rep_iters"],
        max_iterations=cfg["max_iterations"],
        base_lr=cfg["base_lr"],
        strategy="FedICRA",
        procedure="ours",
        model="unet_lc_multihead",
    ).replace(
        num_clients=cfg["num_clients"],
        seed=cfg["seed"],
        tree_loss_weight=cfg["tree_weight"],
        alpha=cfg["alpha"],
        gatecrf_weight=cfg["gatecrf_weight"],
        gatecrf_radius=cfg["gatecrf_radius"],
        ala_skip_iters=cfg["ala_skip_iters"],
    )
    model = net_factory(
        "unet_lc_multihead",
        in_chns=cfg["in_chns"],
        class_num=cfg["num_classes"],
        num_clients=cfg["num_clients"],
        client_id=0,
        dropout=(0.0,) * 5,
        dsn_dropout=cfg["dsn_dropout"],
    )
    state = init_client_state(model, tc)

    @jax.jit
    def fg_prob(params, stats, images, cid):
        out = model.apply(
            {"params": params, "batch_stats": stats}, images,
            train=False, emb_idx=cid,
        )
        return jax.nn.softmax(out["logits"], axis=-1)[..., 1]

    round_fn = jax.jit(make_round_fn(model, tc))
    ala_fn = make_ala_epoch_fn(model, tc)
    K = cfg["num_clients"]
    global_p, global_s = state.params, state.batch_stats
    local_params = [state.params for _ in range(K)]
    local_stats = [state.batch_stats for _ in range(K)]
    start_phase = [True] * K
    rng = jax.random.PRNGKey(cfg["seed"])
    it = 0
    with open(out_path, "w") as f:
        for r in range(cfg["rounds"]):
            new_ps, new_ss = [], []
            for cid in range(K):
                rng, k_ala, k_round = jax.random.split(rng, 3)
                ala_arrays = {
                    "image": jnp.asarray(ala_b[cid]["image"]),
                    "label": jnp.asarray(ala_b[cid]["label"]),
                }
                params, stats, start_phase[cid] = ala_set_weights(
                    model, tc, ala_fn,
                    local_params[cid], global_p, global_s,
                    lambda _e, a=ala_arrays: a,
                    k_ala, cid, it + cfg["iters"], start_phase[cid],
                )
                st = ClientState(
                    params=params, batch_stats=stats,
                    current_iter=jnp.asarray(it, jnp.int32), rng=k_round,
                )
                b = {
                    "image": jnp.asarray(train_b[cid]["image"][r]),
                    "label": jnp.asarray(train_b[cid]["label"][r]),
                }
                st2, metrics = round_fn(st, b, jnp.asarray(cid, jnp.int32))
                local_params[cid] = st2.params
                local_stats[cid] = st2.batch_stats
                new_ps.append(st2.params)
                new_ss.append(st2.batch_stats)
            w = [1.0] * K
            global_p = weighted_tree_mean(new_ps, w)
            global_s = weighted_tree_mean(new_ss, w)
            it += cfg["iters"]
            for cid in range(K):
                p = np.asarray(fg_prob(
                    local_params[cid], local_stats[cid],
                    jnp.asarray(probes[cid]["image"]), cid,
                ))
                p_fg, dice = _probe_stats(p, probes[cid]["mask"])
                rec = {"framework": "jax", "it": it, "client": cid,
                       "fg_prob": p_fg, "dice": dice}
                f.write(json.dumps(rec) + "\n")
            f.flush()
            log(f"jax it={it} done")
    return out_path


# ---------------------------------------------------------------- torch ---

def run_torch(cfg, train_b, ala_b, probes, out_path, log):
    import torch

    import gen_reference_trajectory as gen
    import torch_mirror as tm

    torch.manual_seed(cfg["seed"])
    # matched flax init (CPU jax just for the init tree)
    import jax
    jax.config.update("jax_platforms", "cpu")
    _model, _tc, state = None, None, None
    from fedicra_tpu.engine import TrainConfig, init_client_state
    from fedicra_tpu.models import net_factory
    tc = TrainConfig.for_task(
        "faz", img_size=cfg["img_size"], batch_size=cfg["batch_size"],
        iters=cfg["iters"], rep_iters=cfg["rep_iters"],
        max_iterations=cfg["max_iterations"], base_lr=cfg["base_lr"],
        strategy="FedICRA", procedure="ours", model="unet_lc_multihead",
    ).replace(num_clients=cfg["num_clients"], seed=cfg["seed"])
    model = net_factory(
        "unet_lc_multihead", in_chns=cfg["in_chns"],
        class_num=cfg["num_classes"], num_clients=cfg["num_clients"],
        client_id=0, dropout=(0.0,) * 5, dsn_dropout=cfg["dsn_dropout"],
    )
    state = init_client_state(model, tc)

    f = open(out_path, "w")

    def probe_fn(models, it_global):
        for cid, m in enumerate(models):
            with torch.no_grad():
                logits, _ = m.forward(
                    probes[cid]["image"], train=False
                )
            p = torch.softmax(logits, dim=1)[:, 1].numpy()
            p_fg, dice = _probe_stats(p, probes[cid]["mask"])
            rec = {"framework": "torch", "it": it_global, "client": cid,
                   "fg_prob": p_fg, "dice": dice}
            f.write(json.dumps(rec) + "\n")
        f.flush()
        log(f"torch it={it_global} done")

    tm.run_torch_fedicra_ours(
        state.params, state.batch_stats,
        [ {k: v for k, v in b.items()} for b in train_b ],
        ala_b,
        num_classes=cfg["num_classes"],
        num_clients=cfg["num_clients"],
        base_lr=cfg["base_lr"],
        max_iterations=cfg["max_iterations"],
        rounds=cfg["rounds"],
        iters=cfg["iters"],
        rep_iters=cfg["rep_iters"],
        alpha=cfg["alpha"],
        gatecrf_weight=cfg["gatecrf_weight"],
        radius=cfg["gatecrf_radius"],
        ala_skip_iters=cfg["ala_skip_iters"],
        tree_weight=cfg["tree_weight"],
        tree_sigma=cfg["tree_sigma"],
        probe_fn=probe_fn,
    )
    f.close()
    return out_path


# ---------------------------------------------------------------- main ----

def summarize(paths):
    rows = []
    for p in paths:
        if not os.path.exists(p):
            continue
        with open(p) as f:
            rows += [json.loads(l) for l in f if l.strip()]
    if not rows:
        return
    fws = sorted({r["framework"] for r in rows})
    its = sorted({r["it"] for r in rows})
    K = max(r["client"] for r in rows) + 1
    print(f"\n{'it':>5}", end="")
    for fw in fws:
        for c in range(K):
            print(f"  {fw[:2]}:c{c}:fg  {fw[:2]}:c{c}:di", end="")
    print()
    take = [it for it in its if it % 25 == 0 or it == its[-1]] or its
    idx = {(r["framework"], r["it"], r["client"]): r for r in rows}
    for it in take:
        print(f"{it:>5}", end="")
        for fw in fws:
            for c in range(K):
                r = idx.get((fw, it, c))
                if r:
                    print(f"  {r['fg_prob']:8.4f}  {r['dice']:8.4f}", end="")
                else:
                    print(f"  {'-':>8}  {'-':>8}", end="")
        print()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/collapse_xfw")
    ap.add_argument("--framework", choices=("jax", "torch", "both"),
                    default="both")
    ap.add_argument("--rounds", type=int, default=CFG["rounds"])
    ap.add_argument("--smoke", action="store_true",
                    help="2 rounds at 16^2 (fast sanity check)")
    args = ap.parse_args()
    cfg = dict(CFG)
    cfg["rounds"] = args.rounds
    if args.smoke:
        cfg.update(img_size=16, rounds=2, pool=4, probe_n=2,
                   ala_skip_iters=5, batch_size=2)
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "config.json"), "w") as f:
        json.dump(cfg, f, indent=1)

    def log(msg):
        print(f"[collapse_xfw {time.strftime('%H:%M:%S')}] {msg}",
              flush=True)

    train_b, ala_b, probes = make_batches(cfg)
    fg_frac = np.mean([p["mask"].mean() for p in probes])
    log(f"data: {cfg['num_clients']} clients, pool {cfg['pool']}, "
        f"img {cfg['img_size']}^2, fg fraction {fg_frac:.4f}")
    paths = []
    if args.framework in ("jax", "both"):
        paths.append(run_jax(cfg, train_b, ala_b, probes,
                             os.path.join(args.out, "jax.jsonl"), log))
    if args.framework in ("torch", "both"):
        paths.append(run_torch(cfg, train_b, ala_b, probes,
                               os.path.join(args.out, "torch.jsonl"), log))
    summarize([os.path.join(args.out, "jax.jsonl"),
               os.path.join(args.out, "torch.jsonl")])


if __name__ == "__main__":
    main()
