"""Split-step trainer: device forward -> host tree loss -> device backward.

Some PJRT runtimes (notably tunneled dev TPUs) cannot run host callbacks
inside jit, which blocks the pure_callback tree-filter offload. This trainer
achieves the same computation with an explicit pipelined step:

  part2a (jit): value_and_grad of every tree-independent term (partial CE +
          gated CRF + cross-client contrast), which ALSO returns the softmax
          probs + aux heads its forward already computed, packed for the
          host transfer. (Until round 4 a separate part1 forward produced
          the transfer tensors; that was a whole redundant forward plus one
          extra tunnel dispatch per iteration — VERDICT r3 item 1.) Aux
          heads ship at the full output resolution by default (resize is
          free on device); set FEDICRA_AUX_SHIP=native to ship them at
          decoder-native resolution instead — ~40% smaller transfers, with
          the host paying the bilinear upsample + resize-adjoint pullback
          (the host side is shape-driven and handles both).
  host:   the native C++ multi-scale tree loss forward + analytic cotangents
          (losses/tree_energy_host.py) on (prob, image, aux, ROI).
  part2b (jit): the tree term's gradient via the *injected linear* objective
          — lin - stop_grad(lin) + const, whose gradient is exactly the host
          cotangents — added to part2a's gradients, then the masked-AdamW
          phase update, all in one dispatch.

Merged-backward mode (FEDICRA_SPLIT_MERGED=1): partF (jit) is a forward-only
producer of the transfer tensors; part2bc (jit) then differentiates ALL
terms — pCE + CRF + contrast + the injected tree term — in ONE
value_and_grad and applies the update. This removes one full
forward+remat+backward per iteration vs the part2a/part2b pipeline; the
gradient is the same sum up to float association order
(tests/test_split_merged.py).

Gradients equal the monolithic device path up to float order (grads add
linearly across the split); verified in tests/test_split_trainer.py.

Transfer pipelining: in the packed (aux_full) mode the device<->host tensors
move in FEDICRA_SPLIT_CHUNKS batch chunks (default 2 on accelerators). A
single host worker runs the native chain on chunk k while chunk k+1 is still
on the wire and each cotangent chunk uploads as soon as it is ready, so most
of the host-chain time hides behind the wire. Bit-identical to the unchunked
call
(tests/test_split_chunked.py): images are independent, the ROI normalizer
spans the full batch, per-image losses re-sum in image order.

Transfer precision: on accelerator backends the device<->host tensors
(probs/aux down, cotangents up) travel as bfloat16 — halving the dominant
tunnel/PCIe cost for inputs that feed an exp(-d) kernel and a 0.1-weighted
regularizer — while the loss *value* stays fp32. Override with
FEDICRA_TREE_TRANSFER_DTYPE=float32 (CPU backends already default to fp32
so the split==monolithic tests stay exact). See PARITY.md.

The FedICRA head/body phase structure, per-round optimizer reset, poly LR,
and rng derivation mirror engine/trainer.py so trajectories agree.
"""

from __future__ import annotations

import os
import queue
import threading
import time
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..losses.gated_crf import gated_crf_loss_auto
from ..losses.partial import partial_cross_entropy
from ..losses.tree_energy import _resize_bilinear
from ..models.params_filters import is_head_path, is_pcs_path, path_mask
from .config import TrainConfig
from .objective import _contrast_loss
from .trainer import ClientState, _adamw, _masked_opt, poly_lr

Array = jax.Array

# Opt-in instrumentation (FEDICRA_SPLIT_TIMING=1): per-iteration wall-clock
# of each pipeline phase. bench.py runs the instrumented window unchunked
# (FEDICRA_SPLIT_CHUNKS=1) so the fetch/chain/upload phases attribute serial
# cost rather than overlap residuals; production windows run uninstrumented.
_PHASE_LOG: list = []
_COST_ANALYSIS: dict = {}


def phase_log() -> list:
    return _PHASE_LOG


def cost_analysis() -> dict:
    """Compiled-program cost analysis (flops/bytes) per jitted part, captured
    on the first instrumented iteration when the backend supports it."""
    return _COST_ANALYSIS


def reset_instrumentation():
    _PHASE_LOG.clear()
    _COST_ANALYSIS.clear()


def _capture_cost(name: str, jitted, *args):
    if name in _COST_ANALYSIS:
        return
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        _COST_ANALYSIS[name] = {
            "flops": float(ca.get("flops", 0.0)),
            "bytes_accessed": float(ca.get("bytes accessed", 0.0)),
        }
    except Exception:
        _COST_ANALYSIS[name] = None


def _n_transfer_chunks() -> int:
    """Batch-dim chunking of the device<->host tree tensors (aux_full mode).

    With >1 chunks the fetch, host chain, and cotangent upload pipeline at
    chunk granularity: the host worker filters chunk k while chunk k+1 is
    still in flight on the wire, hiding most of the transfer time behind the
    (CPU-bound) native chain. The math is bit-identical to the unchunked
    call: images are independent, the ROI normalizer is computed over the
    full batch, and the per-image losses are re-concatenated and summed in
    image order. Default 2 on accelerators, 1 (off) on CPU; override with
    FEDICRA_SPLIT_CHUNKS."""
    env = os.environ.get("FEDICRA_SPLIT_CHUNKS")
    if env is not None:
        return max(1, int(env))
    return 1 if jax.default_backend() == "cpu" else 2


def _chunk_bounds(B: int, n: int):
    """[(lo, hi)] covering range(B) in n near-equal contiguous slices."""
    sizes = [B // n + (1 if i < B % n else 0) for i in range(n)]
    bounds, lo = [], 0
    for s in sizes:
        if s > 0:
            bounds.append((lo, lo + s))
        lo += s
    return bounds


def _transfer_dtype():
    env = os.environ.get("FEDICRA_TREE_TRANSFER_DTYPE")
    if env:
        return jnp.bfloat16 if env == "bfloat16" else jnp.float32
    return jnp.float32 if jax.default_backend() == "cpu" else jnp.bfloat16


def supports_host_callbacks() -> bool:
    """Probe whether the default backend can run pure_callback under jit."""
    try:
        @jax.jit
        def f(x):
            return jax.pure_callback(
                lambda v: np.asarray(v) + 1.0,
                jax.ShapeDtypeStruct((), jnp.float32),
                x,
            )

        return bool(np.isfinite(float(f(jnp.float32(1.0)))))
    except Exception:
        return False


def make_split_round_fn(model, cfg: TrainConfig):
    """Round function with the same (state, batches, cid) contract as
    trainer.make_round_fn, executed as a host-orchestrated pipelined loop."""
    H = W = cfg.img_size
    tdtype = _transfer_dtype()

    # Aux-head shipping resolution / wire format:
    #   'native' (default on accelerators): aux heads ship at decoder-native
    #     resolution, packed as ONE flat (B, L) array per chunk (~42% fewer
    #     wire bytes at 384^2 — the tunnel measures ~40 MB/s each way, probe
    #     table in BASELINE.md; measured fetch 2.01 -> 0.75 s, upload 1.40
    #     -> 1.07 s); the C++ workers do the bilinear upsample and pull the
    #     aux cotangents back through the resize ADJOINT (a few ms of 4-tap
    #     arithmetic per image — NOT the round-2 einsum regression, which
    #     resized in numpy host-side).
    #   'full' (default on CPU): aux heads resize to the output resolution
    #     ON DEVICE (free under XLA) and ship packed as one (B,H,W,4C)
    #     array per chunk; the host pays no resize. CPU default because the
    #     in-process "wire" is free there and tests pin split==monolithic
    #     through the device-resize formulation.
    #   'native_unpacked': legacy 4-array ship (kept as the simple
    #     reference path; unchunked, one RTT per array).
    default_ship = "full" if jax.default_backend() == "cpu" else "native"
    ship_mode = os.environ.get("FEDICRA_AUX_SHIP", default_ship)
    aux_full = ship_mode == "full"
    native_packed = ship_mode == "native"
    n_chunks = _n_transfer_chunks() if (aux_full or native_packed) else 1
    # per-block (h, w) shapes of the native-packed wire, captured at trace
    # time (concrete ints); the host worker needs them to deinterleave.
    ship_shapes: list = []

    def _pack_ship(probs, aux):
        """Pack the host-transfer tensors from an already-computed forward.

        aux_full: (probs, aux1..3) concatenate into ONE (B,H,W,4C) array per
        transfer chunk — tunneled runtimes pay a round-trip per fetched
        array, so four separate device->host fetches serialize four RTTs
        (measured ~2s/iter of the round-3 bench); chunking along batch
        (default 2) then lets the host chain start on chunk 0 while chunk 1
        is still on the wire (_n_transfer_chunks).

        native_packed: the same single-array chunked wire, but each block
        flattened at its own resolution: [prob(H,W,C)|aux1|aux2|aux3] as
        (B, L)."""
        if aux_full:
            hw = (probs.shape[1], probs.shape[2])
            auxr = [_resize_bilinear(a, hw) for a in aux]
            packed = jnp.concatenate([probs, *auxr], axis=-1).astype(tdtype)
            return tuple(
                packed[lo:hi]
                for lo, hi in _chunk_bounds(packed.shape[0], n_chunks)
            )
        if native_packed:
            if not ship_shapes:
                ship_shapes.extend(
                    [(t.shape[1], t.shape[2]) for t in (probs, *aux)]
                )
            flat = jnp.concatenate(
                [t.reshape(t.shape[0], -1) for t in (probs, *aux)], axis=1
            ).astype(tdtype)
            return tuple(
                flat[lo:hi]
                for lo, hi in _chunk_bounds(flat.shape[0], n_chunks)
            )
        return tuple(t.astype(tdtype) for t in (probs, *aux))

    def _forward(params, batch_stats, kd, images, cid):
        """The shared (rematerialized) training forward."""

        @jax.checkpoint
        def fwd(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                images,
                train=True,
                emb_idx=jnp.broadcast_to(cid, (images.shape[0],)),
                rngs={"dropout": kd},
                mutable=["batch_stats"],
            )
            return (
                out["logits"],
                tuple(out["aux"]),
                out["heatmaps"][-1],
                mut["batch_stats"],
            )

        return fwd(params)

    # 'ours' = pCE + CRF + contrast + recursive tree; 'treeenergy_add' =
    # pCE + additive tree only (the runner-accepted ADD procedure whose
    # script is absent upstream — engine/objective.py:_treeenergy_add)
    use_crf = cfg.procedure == "ours"
    tree_recursive = cfg.procedure == "ours"
    # Merged-backward mode (round 4): a forward-only partF produces the
    # host-transfer tensors, and ONE joint backward (part2bc) differentiates
    # pCE + CRF + contrast + the injected tree term together. The two-jit
    # part2a/part2b pipeline runs TWO full value_and_grad passes per
    # iteration (each: forward + remat + backward); merging removes one of
    # them — the gradient sum is identical up to float association order
    # (tests/test_split_merged.py). Default ON since the on-TPU record:
    # 2.144 vs 1.908 img/s/chip at the headline config (BASELINE.md round
    # 4) — the forward-only partF (0.09 s) replaces part2a (0.49 s) on the
    # pre-fetch critical path.
    merged = os.environ.get("FEDICRA_SPLIT_MERGED", "1") == "1"

    def _loss_terms(params, batch_stats, k, batch, cid):
        """All tree-independent terms from ONE forward; returns
        (loss_a, new_stats, metrics, probs, aux)."""
        images, labels = batch["image"], batch["label"]
        rng, kd = jax.random.split(k)
        logits, aux, hm_own, new_stats = _forward(
            params, batch_stats, kd, images, cid
        )
        probs = jax.nn.softmax(logits, axis=-1)
        loss_ce = partial_cross_entropy(logits, labels, cfg.num_classes)
        metrics = {"loss_ce": loss_ce}
        loss = loss_ce
        if use_crf:
            loss_crf = gated_crf_loss_auto(
                probs, images, radius=cfg.gatecrf_radius
            )
            loss = loss + cfg.gatecrf_weight * loss_crf
            metrics["loss_crf"] = loss_crf
        if cfg.fedicra and use_crf:
            # contrast belongs to the 'ours' objective only (the monolithic
            # _treeenergy_add has no loss_lc; engine/objective.py:215-237)
            loss_lc, new_stats = _contrast_loss(
                model, params, new_stats, images, hm_own, cid, rng, cfg
            )
            loss = loss + cfg.alpha * loss_lc
            metrics["loss_lc"] = loss_lc
        vis_idx = min(1, logits.shape[0] - 1)
        metrics["vis_pred"] = jnp.argmax(logits[vis_idx], -1).astype(jnp.int32)
        return loss, new_stats, metrics, probs, aux

    def loss_a_fn(params, batch_stats, k, batch, cid):
        """Every term that does NOT need the host tree results."""
        loss, new_stats, metrics, probs, aux = _loss_terms(
            params, batch_stats, k, batch, cid
        )
        # the host-transfer tensors come from THIS forward (no separate
        # part1 dispatch); they ride along as non-differentiated aux output
        return loss, (new_stats, metrics, _pack_ship(probs, aux))

    @jax.jit
    def part2a(params, stats, k, batch, cid):
        (loss_a, (new_stats, metrics, ship)), grads_a = jax.value_and_grad(
            loss_a_fn, has_aux=True
        )(params, stats, k, batch, cid)
        return grads_a, new_stats, loss_a, metrics, ship

    @jax.jit
    def partF(params, stats, k, batch, cid):
        """Forward-only producer of the host-transfer tensors (merged mode).
        Uses the same k -> kd derivation as the grad passes so the dropout
        draw (and hence the shipped probs/aux) matches part2bc's forward."""
        images = batch["image"]
        _, kd = jax.random.split(k)
        logits, aux, _, _ = _forward(params, stats, kd, images, cid)
        return _pack_ship(jax.nn.softmax(logits, axis=-1), aux)

    def _unpack_cots(cots):
        """Cotangents arrive packed as (Bc,H,W,4C) batch chunks in aux_full
        mode (one H2D upload each, pipelined with the host chain), or as four
        full-batch arrays in native_unpacked mode."""
        if aux_full:
            dcat = cots[0] if len(cots) == 1 else jnp.concatenate(cots, axis=0)
            C = cfg.num_classes
            return tuple(
                dcat[..., i * C : (i + 1) * C] for i in range(4)
            )
        return cots

    def _unpack_cots_native(cots, probs, aux):
        """Native-packed mode: cotangents arrive as flat (Bc, L) chunks in
        the ship's block layout; split them at the block offsets and reshape
        to each block's own (native) resolution — taken from the in-trace
        probs/aux shapes, which are exactly the shipped ones."""
        dcat = cots[0] if len(cots) == 1 else jnp.concatenate(cots, axis=0)
        outs, off = [], 0
        for t in (probs, *aux):
            ln = t.shape[1] * t.shape[2] * t.shape[3]
            outs.append(dcat[:, off:off + ln].reshape((-1,) + t.shape[1:]))
            off += ln
        return tuple(outs)

    def _lin_term(probs, aux, cots):
        """<(probs, aux), cots>: the injected tree term whose gradient is
        exactly the host cotangents. The aux cotangents arrive at whatever
        resolution the ship used (full by default; decoder-native under
        FEDICRA_AUX_SHIP=native, where the host pulls them back through the
        resize adjoint) — either way <aux_i, d_i> here equals
        <resize(aux_i), d_i_fullres> by linearity, so the resize below
        mirrors the ship's."""
        if native_packed:
            dp, d1, d2, d3 = _unpack_cots_native(cots, probs, aux)
        else:
            dp, d1, d2, d3 = _unpack_cots(cots)
        if aux_full:
            hw = (probs.shape[1], probs.shape[2])
            aux = tuple(_resize_bilinear(a, hw) for a in aux)
        return (
            jnp.sum(probs * jax.lax.stop_gradient(dp).astype(probs.dtype))
            + jnp.sum(aux[0] * jax.lax.stop_gradient(d1).astype(probs.dtype))
            + jnp.sum(aux[1] * jax.lax.stop_gradient(d2).astype(probs.dtype))
            + jnp.sum(aux[2] * jax.lax.stop_gradient(d3).astype(probs.dtype))
        )

    def loss_tree_fn(params, batch_stats, k, batch, cid, cots):
        """The injected tree term alone (two-jit pipeline's part2b)."""
        images = batch["image"]
        _, kd = jax.random.split(k)
        logits, aux, _, _ = _forward(params, batch_stats, kd, images, cid)
        probs = jax.nn.softmax(logits, axis=-1)
        lin = _lin_term(probs, aux, cots)
        return lin - jax.lax.stop_gradient(lin)

    def loss_merged_fn(params, batch_stats, k, batch, cid, cots):
        """Every term — tree-independent + the injected tree term — from ONE
        forward, so a single value_and_grad produces the full gradient. The
        value equals loss_a_fn's exactly (lin - stop_grad(lin) == 0)."""
        loss, new_stats, metrics, probs, aux = _loss_terms(
            params, batch_stats, k, batch, cid
        )
        lin = _lin_term(probs, aux, cots)
        return loss + lin - jax.lax.stop_gradient(lin), (new_stats, metrics)

    def make_part2b(mask_predicate):
        @jax.jit
        def part2b(params, stats, opt_state, lr, k, batch, cid,
                   grads_a, new_stats, loss_a, metrics_a,
                   tree_val, cots):
            mask = path_mask(params, mask_predicate)
            opt = _masked_opt(_adamw(lr), mask)
            grads_t = jax.grad(loss_tree_fn)(
                params, stats, k, batch, cid, cots
            )
            grads = jax.tree.map(jnp.add, grads_a, grads_t)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics = dict(metrics_a)
            metrics["loss_tree"] = tree_val
            metrics["total_loss"] = loss_a + tree_val
            return params, new_stats, opt_state, metrics

        return part2b

    def make_part2bc(mask_predicate):
        @jax.jit
        def part2bc(params, stats, opt_state, lr, k, batch, cid,
                    tree_val, cots):
            mask = path_mask(params, mask_predicate)
            opt = _masked_opt(_adamw(lr), mask)
            (loss_a, (new_stats, metrics)), grads = jax.value_and_grad(
                loss_merged_fn, has_aux=True
            )(params, stats, k, batch, cid, cots)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            metrics = dict(metrics)
            metrics["loss_tree"] = tree_val
            metrics["total_loss"] = loss_a + tree_val
            return params, new_stats, opt_state, metrics

        return part2bc

    if merged:
        part2b_head = make_part2bc(is_head_path)
        part2b_body = make_part2bc(
            lambda p: (not is_head_path(p)) and (not is_pcs_path(p))
        )
        part2b_full = make_part2bc(lambda p: not is_pcs_path(p))
    else:
        part2b_head = make_part2b(is_head_path)
        part2b_body = make_part2b(
            lambda p: (not is_head_path(p)) and (not is_pcs_path(p))
        )
        part2b_full = make_part2b(lambda p: not is_pcs_path(p))

    def _opt_init(params, predicate):
        mask = path_mask(params, predicate)
        return _masked_opt(_adamw(0.0), mask).init(params)

    def round_fn(state: ClientState, batches: Dict[str, Array], cid):
        from ..losses.tree_energy_host import (
            multi_scale_tree_loss_host,
            multi_scale_tree_loss_host_npacked,
            multi_scale_tree_loss_host_packed,
        )

        params, stats = state.params, state.batch_stats
        it = int(state.current_iter)
        rng = state.rng
        cid_arr = jnp.asarray(cid, jnp.int32)
        n_iters = batches["image"].shape[0]
        n_head = cfg.iters - cfg.rep_iters if cfg.fedicra else 0

        if cfg.fedicra:
            opt_state_h = _opt_init(params, is_head_path)
            opt_state_b = _opt_init(
                params, lambda p: (not is_head_path(p)) and (not is_pcs_path(p))
            )
        else:
            opt_state_f = _opt_init(params, lambda p: not is_pcs_path(p))

        labels_np = np.asarray(batches["label"])
        images_np = np.asarray(batches["image"])
        timing = os.environ.get("FEDICRA_SPLIT_TIMING") == "1"
        # Per-iteration liveness heartbeat (long-run supervision: the first
        # iteration of a launch blocks minutes in the remote compiler, and
        # watchdogs need evidence the child is alive, not wedged)
        verbose = os.environ.get("FEDICRA_VERBOSE") == "1"
        all_metrics = []
        for i in range(n_iters):
            if verbose:
                stage = "partF" if merged else "part2a"
                print(f"[split {time.strftime('%H:%M:%S')} it={it} "
                      f"i={i}/{n_iters}] dispatch {stage}"
                      + (" (may compile)" if i == 0 else ""), flush=True)
            batch = {
                "image": batches["image"][i],
                "label": batches["label"][i],
            }
            rng, k = jax.random.split(rng)
            t0 = time.perf_counter() if timing else 0.0
            if merged:
                # forward-only ship; ALL gradient work happens in part2bc
                p1_out = partF(params, stats, k, batch, cid_arr)
            else:
                # one dispatch computes the tree-independent grads AND the
                # host-transfer tensors from the same forward (no part1)
                grads_a, new_stats, loss_a, metrics_a, p1_out = part2a(
                    params, stats, k, batch, cid_arr
                )
            img_np = images_np[i]
            low = img_np if img_np.shape[-1] == 3 else np.repeat(img_np, 3, -1)
            rois = (labels_np[i] == cfg.num_classes).astype(np.float32)
            if aux_full or native_packed:
                # Pipelined fetch -> host chain -> upload at chunk
                # granularity. The chunk fetches block on part2a's compute
                # (they are its outputs); after that a single worker thread
                # runs the native chain on chunk k while chunk k+1 is still
                # in flight, and each cotangent chunk uploads as soon as it
                # is ready — while the worker filters the next chunk. The
                # ROI normalizer and the per-image loss sum reproduce the
                # unchunked call bit-exactly.
                # NOTE: no copy_to_host_async here — on the tunneled runtime
                # it takes a slow path with multi-second latency spikes
                # (measured 17-08-2026: async-first fetch of two 21MB chunks
                # 5-13s vs 2-3s for plain in-order np.asarray). The blocking
                # per-chunk fetch already overlaps: while the main thread
                # waits on chunk k+1's wire time, the worker below runs the
                # native chain on chunk k.
                bounds = _chunk_bounds(low.shape[0], n_chunks)
                n_roi = float(rois.sum(dtype=np.float32))
                C = cfg.num_classes
                outq: "queue.Queue" = queue.Queue()
                inq: "queue.Queue" = queue.Queue()

                def _worker():
                    while True:
                        item = inq.get()
                        if item is None:
                            return
                        idx, arr, lo, hi = item
                        try:
                            # packed fast path: the chain consumes the
                            # shipped array directly (bf16 rows widen
                            # exactly in the C++ deinterleave) and returns
                            # the cotangents re-packed for one upload — no
                            # numpy channel-slice copies. native_packed
                            # additionally keeps aux blocks at decoder
                            # resolution on the wire (C++ resize+adjoint).
                            if native_packed:
                                # guard against a stale trace-time capture:
                                # ship_shapes is recorded at the FIRST
                                # _pack_ship trace; a retrace at another
                                # spatial resolution must fail loudly here,
                                # not deinterleave into garbage cotangents
                                want = cfg.num_classes * sum(
                                    h * w for h, w in ship_shapes
                                )
                                assert arr.shape[1] == want, (
                                    f"packed wire length {arr.shape[1]} != "
                                    f"{want} from ship_shapes {ship_shapes}"
                                )
                                res = multi_scale_tree_loss_host_npacked(
                                    arr,
                                    low[lo:hi],
                                    rois[lo:hi],
                                    cfg.tree_loss_weight,
                                    list(ship_shapes),
                                    recursive=tree_recursive,
                                    roi_total=n_roi,
                                )
                            else:
                                res = multi_scale_tree_loss_host_packed(
                                    arr,
                                    low[lo:hi],
                                    rois[lo:hi],
                                    cfg.tree_loss_weight,
                                    recursive=tree_recursive,
                                    roi_total=n_roi,
                                )
                        except BaseException as e:  # propagate to main
                            res = e
                        outq.put((idx, res))

                worker = threading.Thread(target=_worker, daemon=True)
                worker.start()
                loss_parts = [None] * len(bounds)
                cot_parts = [None] * len(bounds)

                def _take(idx, res):
                    if isinstance(res, BaseException):
                        raise res
                    li, d_packed = res
                    loss_parts[idx] = li
                    # device_put is async: starting the upload here lets it
                    # ride the wire while the worker chains later chunks /
                    # the main thread fetches them; chunk ORDER on device is
                    # restored by position, so completion order is free
                    cot_parts[idx] = jnp.asarray(d_packed, dtype=tdtype)

                try:
                    try:
                        for idx, (chk, (lo, hi)) in enumerate(
                            zip(p1_out, bounds)
                        ):
                            # fetch in the wire dtype; the packed native
                            # chain widens bf16 rows itself (exact)
                            inq.put((idx, np.asarray(chk), lo, hi))
                            # interleave: upload any chain results that
                            # finished during that fetch instead of letting
                            # them queue behind the remaining fetches
                            while True:
                                try:
                                    j, res = outq.get_nowait()
                                except queue.Empty:
                                    break
                                _take(j, res)
                    finally:
                        inq.put(None)  # always release the worker
                    if timing:
                        t1 = time.perf_counter()
                        if merged:
                            _capture_cost("partF", partF, params, stats, k,
                                          batch, cid_arr)
                        else:
                            _capture_cost("part2a", part2a, params, stats, k,
                                          batch, cid_arr)
                    for _ in range(sum(c is None for c in cot_parts)):
                        j, res = outq.get()
                        _take(j, res)
                finally:
                    worker.join()
                tree_val = float(np.concatenate(loss_parts).sum())
                cots = tuple(cot_parts)
                if timing:
                    t3 = time.perf_counter()
            else:
                probs_h, a1_h, a2_h, a3_h = (
                    np.asarray(t, dtype=np.float32) for t in p1_out
                )
                if timing:
                    t1 = time.perf_counter()
                    if merged:
                        _capture_cost("partF", partF, params, stats, k,
                                      batch, cid_arr)
                    else:
                        _capture_cost("part2a", part2a, params, stats, k,
                                      batch, cid_arr)
                tree_val, dpn, d1n, d2n, d3n = multi_scale_tree_loss_host(
                    probs_h, low, a1_h, a2_h, a3_h, rois,
                    cfg.tree_loss_weight,
                    recursive=tree_recursive,
                )
                if timing:
                    t3 = time.perf_counter()
                cots = tuple(
                    jnp.asarray(c, dtype=tdtype) for c in (dpn, d1n, d2n, d3n)
                )
            lr = poly_lr(cfg.base_lr, it, cfg.max_iterations)
            if merged:
                args = (lr, k, batch, cid_arr, jnp.float32(tree_val), cots)
            else:
                args = (
                    lr, k, batch, cid_arr, grads_a, new_stats, loss_a,
                    metrics_a, jnp.float32(tree_val), cots,
                )
            if cfg.fedicra:
                if i < n_head:
                    part2b, opt_name = part2b_head, "opt_state_h"
                    params, stats, opt_state_h, m = part2b(
                        params, stats, opt_state_h, *args
                    )
                else:
                    part2b, opt_name = part2b_body, "opt_state_b"
                    params, stats, opt_state_b, m = part2b(
                        params, stats, opt_state_b, *args
                    )
            else:
                part2b = part2b_full
                params, stats, opt_state_f, m = part2b(
                    params, stats, opt_state_f, *args
                )
            m = dict(m)
            m["lr"] = jnp.float32(lr)
            if timing:
                float(np.asarray(m["total_loss"]))  # sync part2b
                if cfg.fedicra:
                    opt_for_cost = (
                        opt_state_h if opt_name == "opt_state_h" else opt_state_b
                    )
                else:
                    opt_for_cost = opt_state_f
                _capture_cost("part2bc" if merged else "part2b", part2b,
                              params, stats, opt_for_cost, *args)
                _PHASE_LOG.append({
                    "part2a_fetch": t1 - t0,
                    "host_chain": t3 - t1,
                    "part2b_upload": time.perf_counter() - t3,
                })
            all_metrics.append(m)
            it += 1

        metrics = jax.tree.map(lambda *xs: jnp.stack(xs), *all_metrics)
        new_state = ClientState(
            params=params,
            batch_stats=stats,
            current_iter=jnp.asarray(it, jnp.int32),
            rng=rng,
        )
        return new_state, metrics

    round_fn.is_split = True
    # expose the jitted stages + transfer params for phase-attribution
    # probes (tools/probe_phases.py) — not used by the training path
    round_fn.parts = {
        "part2a": part2a,
        "partF": partF,
        "part2b_full": part2b_full,
        "merged": merged,
        "n_chunks": n_chunks,
        "tdtype": tdtype,
        "aux_full": aux_full,
        "ship_mode": ship_mode,
        "ship_shapes": ship_shapes,
    }
    return round_fn


def build_round_fn(model, cfg: TrainConfig):
    """Select the execution strategy for local rounds:

    - 'ours' on an accelerator whose runtime lacks host callbacks (and with
      the native library present): the split-step trainer;
    - otherwise: the monolithic jitted round (whose tree loss itself
      auto-selects pure_callback host offload when available).
    """
    from .trainer import make_round_fn

    if cfg.procedure in ("ours", "treeenergy_add") and jax.default_backend() in (
        "tpu", "axon",
    ):
        try:
            from .. import native

            native_ok = native.available()
        except Exception:
            native_ok = False
        if native_ok and not supports_host_callbacks():
            return make_split_round_fn(model, cfg)
    return jax.jit(make_round_fn(model, cfg))
