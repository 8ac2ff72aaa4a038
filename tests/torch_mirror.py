"""Functional torch mirror of the reference pCE training procedure.

Independent re-implementation of the semantics of the reference's pCE
trainer (code/flower_pCE_2D.py:51-181) and plain U-Net (code/networks/
unet.py:549-566) in torch, parameterized directly by a flax parameter tree —
no state_dict naming, no module classes. Used by gen_reference_trajectory.py
to produce the committed cross-framework golden, and by
test_reference_parity.py to assert the JAX trainer reproduces it.

Weight layout conversion: flax conv kernels are HWIO; torch wants OIHW.
Input layout: NHWC (JAX) -> NCHW (torch) at the boundary only.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F


def _np(x):
    return np.asarray(x)


def conv_w(tree):
    """flax Conv submodule {conv: {kernel HWIO, bias}} -> torch (OIHW, bias)."""
    k = torch.tensor(_np(tree["conv"]["kernel"]).transpose(3, 2, 0, 1))
    b = torch.tensor(_np(tree["conv"]["bias"]))
    return k, b


class TorchUNet:
    """Plain U-Net: 5-stage encoder, bilinear decoder, 3x3 out conv.

    Matches fedicra_tpu.models.unet.UNet (which itself matches the reference
    unet.py:549-566 with the bilinear-decoder quirk, PARITY.md).
    Dropout rates are honoured only when 0 (the parity configs); nonzero
    rates raise (RNG streams can't match across frameworks).
    """

    def __init__(self, flax_params, flax_stats, dropout=(0,) * 5):
        if any(d != 0 for d in dropout):
            raise ValueError("torch mirror supports only dropout=0 configs")
        self.params = []  # flat list for the optimizer, in deterministic order
        self.tree = self._convert(flax_params)
        self.stats = self._convert_stats(flax_stats)

    # -- conversion ---------------------------------------------------------
    def _reg(self, t):
        t = t.clone().detach().requires_grad_(True)
        self.params.append(t)
        return t

    def _convert_convbnact(self, tree):
        k, b = conv_w(tree["conv"])
        return {
            "k": self._reg(k),
            "b": self._reg(b),
            "scale": self._reg(torch.tensor(_np(tree["norm"]["bn"]["scale"]))),
            "bias": self._reg(torch.tensor(_np(tree["norm"]["bn"]["bias"]))),
        }

    def _convert_block(self, tree):
        return {
            "conv1": self._convert_convbnact(tree["conv1"]),
            "conv2": self._convert_convbnact(tree["conv2"]),
        }

    def _convert(self, p):
        enc = p["encoder"]
        dec = p["decoder"]
        tree = {"encoder": {"in_conv": self._convert_block(enc["in_conv"])}}
        for i in range(1, 5):
            tree["encoder"][f"down{i}"] = self._convert_block(
                enc[f"down{i}"]["block"]
            )
        tree["decoder"] = {}
        for i in range(1, 5):
            up = dec[f"up{i}"]
            k1, b1 = conv_w(up["conv1x1"])
            tree["decoder"][f"up{i}"] = {
                "k1x1": self._reg(k1),
                "b1x1": self._reg(b1),
                "block": self._convert_block(up["block"]),
            }
        ko, bo = conv_w(dec["out_conv"])
        tree["decoder"]["out_conv"] = {"k": self._reg(ko), "b": self._reg(bo)}
        return tree

    def _convert_stats(self, s):
        def bn(tree):
            return {
                "mean": torch.tensor(_np(tree["bn"]["mean"])),
                "var": torch.tensor(_np(tree["bn"]["var"])),
            }

        enc, dec = s["encoder"], s["decoder"]
        out = {"encoder": {}, "decoder": {}}
        out["encoder"]["in_conv"] = {
            "conv1": bn(enc["in_conv"]["conv1"]["norm"]),
            "conv2": bn(enc["in_conv"]["conv2"]["norm"]),
        }
        for i in range(1, 5):
            blk = enc[f"down{i}"]["block"]
            out["encoder"][f"down{i}"] = {
                "conv1": bn(blk["conv1"]["norm"]),
                "conv2": bn(blk["conv2"]["norm"]),
            }
            blk = dec[f"up{i}"]["block"]
            out["decoder"][f"up{i}"] = {
                "conv1": bn(blk["conv1"]["norm"]),
                "conv2": bn(blk["conv2"]["norm"]),
            }
        return out

    # -- forward ------------------------------------------------------------
    @staticmethod
    def _cba(x, p, st, train):
        x = F.conv2d(x, p["k"], p["b"], padding=1)
        x = F.batch_norm(
            x, st["mean"], st["var"], p["scale"], p["bias"],
            training=train, momentum=0.1, eps=1e-5,
        )
        return F.leaky_relu(x, 0.01)

    @classmethod
    def _block(cls, x, p, st, train):
        x = cls._cba(x, p["conv1"], st["conv1"], train)
        return cls._cba(x, p["conv2"], st["conv2"], train)

    def forward(self, x_nhwc: np.ndarray, train: bool = True):
        x = torch.tensor(_np(x_nhwc).transpose(0, 3, 1, 2))
        e, es = self.tree["encoder"], self.stats["encoder"]
        feats = [self._block(x, e["in_conv"], es["in_conv"], train)]
        for i in range(1, 5):
            x = F.max_pool2d(feats[-1], 2)
            feats.append(self._block(x, e[f"down{i}"], es[f"down{i}"], train))
        d, ds = self.tree["decoder"], self.stats["decoder"]
        x = feats[4]
        for i, skip in zip(range(1, 5), (feats[3], feats[2], feats[1], feats[0])):
            up = d[f"up{i}"]
            x = F.conv2d(x, up["k1x1"], up["b1x1"])
            x = F.interpolate(
                x, scale_factor=2, mode="bilinear", align_corners=True
            )
            x = torch.cat([skip, x], dim=1)  # skip first (reference cat order)
            x = self._block(x, up["block"], ds[f"up{i}"], train)
        logits = F.conv2d(x, d["out_conv"]["k"], d["out_conv"]["b"], padding=1)
        return logits  # NCHW

    # -- export -------------------------------------------------------------
    def export_flat(self):
        """All trainable tensors (registration order) + BN stats, as numpy."""
        flat_p = [t.detach().numpy().copy() for t in self.params]
        flat_s = []

        def walk(d):
            for k in sorted(d):
                v = d[k]
                if isinstance(v, dict):
                    walk(v)
                else:
                    flat_s.append(v.numpy().copy())

        walk(self.stats)
        return flat_p, flat_s

    def load_flat(self, flat_p, flat_s):
        with torch.no_grad():
            for t, v in zip(self.params, flat_p):
                t.copy_(torch.tensor(v))
        i = [0]

        def walk(d):
            for k in sorted(d):
                v = d[k]
                if isinstance(v, dict):
                    walk(v)
                else:
                    v.copy_(torch.tensor(flat_s[i[0]]))
                    i[0] += 1

        walk(self.stats)


def poly_lr(base_lr, it, max_iterations):
    return base_lr * (1.0 - it / max_iterations) ** 0.9


def run_torch_sgd_centralized(
    flax_params,
    flax_stats,
    batches,  # {'image': [N, B,H,W,C], 'label': [N, B,H,W]}
    *,
    num_classes: int,
    base_lr: float,
    max_iterations: int,
    iters: int,
):
    """The reference centralized baseline (Unet_pCE.py:63-244) in torch:
    SGD(momentum 0.9, weight_decay 1e-4), per-iteration poly LR, partial CE.
    SGD's update scale tracks |grad|, so unlike Adam it does not amplify
    fp32 sign noise — this trajectory pins the forward/backward/optimizer
    chain to tight tolerance."""
    model = TorchUNet(flax_params, flax_stats)
    opt = torch.optim.SGD(
        model.params, lr=base_lr, momentum=0.9, weight_decay=1e-4
    )
    losses = []
    for it in range(iters):
        for g in opt.param_groups:
            g["lr"] = poly_lr(base_lr, it, max_iterations)
        logits = model.forward(batches["image"][it], train=True)
        loss = F.cross_entropy(
            logits,
            torch.tensor(_np(batches["label"][it])).long(),
            ignore_index=num_classes,
        )
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    final_p, _ = model.export_flat()
    return losses, final_p


def run_torch_pce_federation(
    flax_params,
    flax_stats,
    client_batches,  # list over clients of {'image': [R, iters, B,H,W,C], 'label': ...}
    *,
    num_classes: int,
    base_lr: float,
    max_iterations: int,
    rounds: int,
    iters: int,
):
    """The reference pCE federated loop (FedAvg), in torch.

    Per round: each client trains ``iters`` AdamW steps from the global
    weights (optimizer recreated per round — reference quirk, ..._Ours.py:56;
    per-iteration poly LR, :179-182); server aggregates params AND BN stats
    with equal weights (equal batch counts here; flower_common.py:72 uses
    batch counts). Returns losses[client][global_iter] and the final global
    flat params.
    """
    torch.manual_seed(0)  # inert (no dropout), pinned for determinism anyway
    K = len(client_batches)
    model = TorchUNet(flax_params, flax_stats)
    global_p, global_s = model.export_flat()
    losses = [[] for _ in range(K)]

    it_global = 0
    for r in range(rounds):
        results = []
        for cid in range(K):
            model.load_flat(global_p, global_s)
            opt = torch.optim.AdamW(
                model.params,
                lr=poly_lr(base_lr, it_global, max_iterations),
                betas=(0.9, 0.999),
                eps=1e-8,
                weight_decay=1e-2,
            )
            it = it_global
            for i in range(iters):
                for g in opt.param_groups:
                    g["lr"] = poly_lr(base_lr, it, max_iterations)
                img = client_batches[cid]["image"][r, i]
                lab = client_batches[cid]["label"][r, i]
                logits = model.forward(img, train=True)
                loss = F.cross_entropy(
                    logits,
                    torch.tensor(_np(lab)).long(),
                    ignore_index=num_classes,
                )
                opt.zero_grad()
                loss.backward()
                opt.step()
                losses[cid].append(float(loss.detach()))
                it += 1
            results.append(model.export_flat())
        global_p = [
            np.mean([res[0][j] for res in results], axis=0)
            for j in range(len(global_p))
        ]
        global_s = [
            np.mean([res[1][j] for res in results], axis=0)
            for j in range(len(global_s))
        ]
        it_global += iters
    return losses, global_p
