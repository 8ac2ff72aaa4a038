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
            # size= (not scale_factor=2): identical at every even size (the
            # real 384/256 configs) and well-defined at odd sizes (small
            # experiment grids like 24^2), matching the flax UpBlock's
            # resize-to-skip-shape semantics
            x = F.interpolate(
                x, size=skip.shape[2:], mode="bilinear", align_corners=True
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


class TorchFedICRAUNet:
    """Torch mirror of the FedICRA flagship model (unet_lc_multihead):
    LCEncoder with one PCS module at the bottleneck + bilinear decoder +
    3x3 out conv (reference networks/unet.py:701-722, 103-203).

    The three DSN aux heads are converted when present in the flax tree and
    computed only under ``forward(..., return_aux=True)`` (the tree-live
    oracle). Under the ours-minus-tree objective (tree weight 0) they never
    enter the loss: their parameters receive no updates on the JAX side
    (engine/trainer.py excludes them from the optimizer in that
    configuration, matching torch's None-grad skip), and their BN running
    stats feed nothing trainable — train-mode forwards normalize with batch
    statistics, so running-stat drift (e.g. from the contrast's foreign
    forwards, which this mirror skips the aux heads in) never reaches any
    mirrored loss or the param checksum.

    PCS parameters are held as plain tensors with requires_grad=False:
    the reference stores PCS modules in an unregistered Python list
    (unet.py:172-177) so they are absent from parameters()/state_dict() —
    frozen random projections that gradients flow *through*, never into.
    """

    def __init__(self, flax_params, flax_stats, num_clients, client_id):
        self.num_clients = num_clients
        self.client_id = client_id
        self.params = []  # trainable tensors, registration order
        self.names = []  # torch-style dotted names, parallel to params
        self.tree = self._convert(flax_params)
        pcs = flax_params["encoder"]["pcs0"]
        self.pcs = {
            k: torch.tensor(
                _np(pcs[k]["conv"]["kernel"]).transpose(3, 2, 0, 1)
            )
            for k in ("fc1_a", "fc1_b", "fc2_a", "fc2_b")
        }
        self.stats = self._convert_stats(flax_stats)

    # -- conversion (name-threaded) -----------------------------------------
    def _reg(self, t, name):
        t = t.clone().detach().requires_grad_(True)
        self.params.append(t)
        self.names.append(name)
        return t

    def _convert_convbnact(self, tree, prefix):
        k, b = conv_w(tree["conv"])
        return {
            "k": self._reg(k, f"{prefix}.conv.weight"),
            "b": self._reg(b, f"{prefix}.conv.bias"),
            "scale": self._reg(
                torch.tensor(_np(tree["norm"]["bn"]["scale"])),
                f"{prefix}.bn.weight",
            ),
            "bias": self._reg(
                torch.tensor(_np(tree["norm"]["bn"]["bias"])),
                f"{prefix}.bn.bias",
            ),
        }

    def _convert_block(self, tree, prefix):
        return {
            "conv1": self._convert_convbnact(tree["conv1"], f"{prefix}.conv1"),
            "conv2": self._convert_convbnact(tree["conv2"], f"{prefix}.conv2"),
        }

    def _convert(self, p):
        enc, dec = p["encoder"], p["decoder"]
        tree = {
            "encoder": {
                "in_conv": self._convert_block(
                    enc["in_conv"], "encoder.in_conv"
                )
            }
        }
        for i in range(1, 5):
            tree["encoder"][f"down{i}"] = self._convert_block(
                enc[f"down{i}"]["block"], f"encoder.down{i}"
            )
        tree["decoder"] = {}
        for i in range(1, 5):
            up = dec[f"up{i}"]
            k1, b1 = conv_w(up["conv1x1"])
            tree["decoder"][f"up{i}"] = {
                "k1x1": self._reg(k1, f"decoder.up{i}.conv1x1.weight"),
                "b1x1": self._reg(b1, f"decoder.up{i}.conv1x1.bias"),
                "block": self._convert_block(
                    up["block"], f"decoder.up{i}.block"
                ),
            }
        ko, bo = conv_w(dec["out_conv"])
        tree["decoder"]["out_conv"] = {
            "k": self._reg(ko, "decoder.out_conv.weight"),
            "b": self._reg(bo, "decoder.out_conv.bias"),
        }
        # DSN aux heads (unet.py:264-270): Conv3x3(512)+BN+ReLU+Dropout2d
        # +Conv1x1 no-bias. Names deliberately avoid the 'out_conv'/'up*'
        # substrings so they are neither head-phase nor ALA-gated params,
        # mirroring fedicra_tpu.models.params_filters semantics.
        for i in (1, 2, 3):
            hd = dec.get(f"dsn_head{i}")
            if hd is None:
                continue
            pre = f"decoder.dsn_head{i}"
            kk = torch.tensor(_np(hd["conv_kernel"]).transpose(3, 2, 0, 1))
            ok = torch.tensor(_np(hd["out_kernel"]).transpose(3, 2, 0, 1))
            tree["decoder"][f"dsn_head{i}"] = {
                "k": self._reg(kk, f"{pre}.conv.weight"),
                "b": self._reg(
                    torch.tensor(_np(hd["conv_bias"])), f"{pre}.conv.bias"
                ),
                "scale": self._reg(
                    torch.tensor(_np(hd["bn_scale"])), f"{pre}.bn.weight"
                ),
                "bias": self._reg(
                    torch.tensor(_np(hd["bn_bias"])), f"{pre}.bn.bias"
                ),
                "ok": self._reg(ok, f"{pre}.out.weight"),
            }
        return tree

    def _convert_stats(self, s):
        out = TorchUNet.__dict__["_convert_stats"](self, s)
        for i in (1, 2, 3):
            hd = s["decoder"].get(f"dsn_head{i}")
            if hd is not None:
                out["decoder"][f"dsn_head{i}"] = {
                    "mean": torch.tensor(_np(hd["mean"])),
                    "var": torch.tensor(_np(hd["var"])),
                }
        return out

    _cba = TorchUNet.__dict__["_cba"]
    _block = TorchUNet.__dict__["_block"]
    export_flat = TorchUNet.__dict__["export_flat"]
    load_flat = TorchUNet.__dict__["load_flat"]

    # -- forward ------------------------------------------------------------
    def _pcs_forward(self, x, emb):
        """PCS channel attention (unet.py:103-144); returns (x, hmap)."""
        avg = x.mean(dim=(2, 3), keepdim=True)
        mx = x.amax(dim=(2, 3), keepdim=True)
        e = emb.view(emb.shape[0], -1, 1, 1)
        e = F.conv2d(e, self.pcs["fc1_a"])
        e = F.relu(e)
        e = F.conv2d(e, self.pcs["fc1_b"])

        def fc2(t):
            return F.conv2d(F.relu(F.conv2d(t, self.pcs["fc2_a"])), self.pcs["fc2_b"])

        hmap = torch.sigmoid(fc2(torch.cat([avg, e], 1)) + fc2(torch.cat([mx, e], 1)))
        return x * hmap + x, hmap

    def forward(self, x_nhwc, emb_idx=None, train=True, stats=None,
                return_aux=False):
        """Returns (logits NCHW, bottleneck heatmap (B,C,1,1))[, aux list].

        Reference quirk (unet.py:186-189): emb_idx of None *or 0* falls back
        to the model's own client id. ``stats``: override the BN running
        stats dict (train-mode F.batch_norm updates it in place — pass a
        clone to discard updates, e.g. for the ALA gate-learning forwards).
        ``return_aux``: also compute the DSN heads on (de2, de3, de4) and
        return their logits (decoder-native resolutions), matching
        DecoderMultiHead (fedicra unet.py:179-208 / reference :288-398).
        """
        if emb_idx is None or emb_idx == 0:
            emb_idx = self.client_id
        stats = self.stats if stats is None else stats
        x = torch.as_tensor(_np(x_nhwc).transpose(0, 3, 1, 2))
        B = x.shape[0]
        emb = torch.zeros((B, self.num_clients))
        emb[:, emb_idx] = 1.0
        e, es = self.tree["encoder"], stats["encoder"]
        feats = [self._block(x, e["in_conv"], es["in_conv"], train)]
        for i in range(1, 5):
            x = F.max_pool2d(feats[-1], 2)
            feats.append(self._block(x, e[f"down{i}"], es[f"down{i}"], train))
        feats[4], hmap = self._pcs_forward(feats[4], emb)
        d, ds = self.tree["decoder"], stats["decoder"]
        x = feats[4]
        des = []
        for i, skip in zip(range(1, 5), (feats[3], feats[2], feats[1], feats[0])):
            up = d[f"up{i}"]
            x = F.conv2d(x, up["k1x1"], up["b1x1"])
            # size= (not scale_factor=2): identical at every even size (the
            # real 384/256 configs) and well-defined at odd sizes (small
            # experiment grids like 24^2), matching the flax UpBlock's
            # resize-to-skip-shape semantics
            x = F.interpolate(
                x, size=skip.shape[2:], mode="bilinear", align_corners=True
            )
            x = torch.cat([skip, x], dim=1)
            x = self._block(x, up["block"], ds[f"up{i}"], train)
            des.append(x)
        logits = F.conv2d(x, d["out_conv"]["k"], d["out_conv"]["b"], padding=1)
        if not return_aux:
            return logits, hmap
        aux = []
        for i, src in enumerate((des[1], des[2], des[3]), start=1):
            p, st = d[f"dsn_head{i}"], stats["decoder"][f"dsn_head{i}"]
            h = F.conv2d(src, p["k"], p["b"], padding=1)
            h = F.batch_norm(
                h, st["mean"], st["var"], p["scale"], p["bias"],
                training=train, momentum=0.1, eps=1e-5,
            )
            h = F.relu(h)
            # Dropout2d(0.1) in the reference; parity configs run the flax
            # model with dsn_dropout=0, so no mask here (RNG can't match)
            aux.append(F.conv2d(h, p["ok"]))
        return logits, hmap, aux

    def clone_stats(self):
        def walk(d):
            return {
                k: (walk(v) if isinstance(v, dict) else v.clone())
                for k, v in d.items()
            }

        return walk(self.stats)


def gated_crf_torch(y_soft, img, radius, sigma_xy=6.0, sigma_rgb=0.1):
    """Differentiable Potts gated CRF (gate_crf_loss.py:5-205 live config:
    one kernel {weight 1, xy 6, rgb 0.1}, radius 5, no masks)."""
    B, C, H, W = y_soft.shape
    d = 2 * radius + 1
    cols = torch.arange(W, dtype=torch.float32).view(1, 1, 1, W).expand(B, 1, H, W)
    rows = torch.arange(H, dtype=torch.float32).view(1, 1, H, 1).expand(B, 1, H, W)
    feat = torch.cat([cols / sigma_xy, rows / sigma_xy, img / sigma_rgb], dim=1)

    def unfold(t):
        n, c = t.shape[:2]
        return F.unfold(t, d, 1, radius).view(n, c, d, d, H, W)

    fu = unfold(feat.detach())
    diff = fu - feat.detach().view(B, -1, 1, 1, H, W)
    kern = torch.exp(-0.5 * (diff ** 2).sum(dim=1, keepdim=True))
    kern[:, :, radius, radius] = 0
    yu = unfold(y_soft)
    prod = (kern * yu).view(B, C, d * d, H, W).sum(dim=2)
    return (kern.sum() - (prod * y_soft).sum()) / float(B * H * W)


# --- dense tree-energy oracle (torch) ---------------------------------------
#
# An O(V^2) pairwise path-product tree filter, independent of every repo
# implementation (the JAX lifting primitives, the host C++ two-pass, the
# split-step injection): M[i,j] = prod of per-edge weights along the tree
# path i..j, y = (M x)/(M 1) — the definition refine_forward implements
# (reference refine.cu:201-249). Differentiable through x always and through
# the edge weights for high-level trees (functions/refine.py:32-38).


def _kruskal_bfs_parent(feats, h, w):
    """MST of the 4-connected grid under the (||dfeat||^2 + 1, edge index)
    strict total order (== ops/mst.boruvka_mst's tie-break; the MST is unique
    under a strict order, so Kruskal and Boruvka agree), BFS-rooted at vertex
    0. feats: [V, D] float32 numpy (detached). Returns parent int64 [V] with
    parent[0] == 0. Edge order: vertical then horizontal (ops/mst.grid_edges).
    """
    V = h * w
    idx = np.arange(V, dtype=np.int32).reshape(h, w)
    eu = np.concatenate([idx[:-1, :].reshape(-1), idx[:, :-1].reshape(-1)])
    ev = np.concatenate([idx[1:, :].reshape(-1), idx[:, 1:].reshape(-1)])
    wts = ((feats[eu] - feats[ev]) ** 2).sum(-1).astype(np.float32) + np.float32(1.0)
    order = np.lexsort((np.arange(len(wts)), wts))
    uf = np.arange(V)

    def find(a):
        root = a
        while uf[root] != root:
            root = uf[root]
        while uf[a] != root:
            uf[a], a = root, uf[a]
        return root

    adj = [[] for _ in range(V)]
    taken = 0
    for e in order:
        ra, rb = find(int(eu[e])), find(int(ev[e]))
        if ra != rb:
            uf[ra] = rb
            adj[int(eu[e])].append(int(ev[e]))
            adj[int(ev[e])].append(int(eu[e]))
            taken += 1
            if taken == V - 1:
                break
    parent = np.zeros(V, dtype=np.int64)
    parent[0] = 0
    seen = np.zeros(V, dtype=bool)
    seen[0] = True
    frontier = [0]
    while frontier:
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if not seen[v]:
                    seen[v] = True
                    parent[v] = u
                    nxt.append(v)
        frontier = nxt
    assert seen.all(), "MST does not span the grid"
    return parent


def _dense_tree_structure_ref(parent):
    """O(V^3) reference construction of the dense-filter structure (kept as
    the oracle for _dense_tree_structure's Euler-tour fast path — see
    tests/test_torch_oracles.py)."""
    V = len(parent)
    anc = np.zeros((V, V), dtype=bool)
    depth = np.zeros(V, dtype=np.int64)
    for v in range(V):
        u = v
        d = 0
        while True:
            anc[v, u] = True
            if parent[u] == u:
                break
            u = parent[u]
            d += 1
        depth[v] = d
    L = np.empty((V, V), dtype=np.int64)
    for i in range(V):
        common = anc & anc[i]  # [V, V]: common[j, u] = u ancestor of both
        L[i] = np.where(common, depth[None, :], -1).argmax(1)
    return anc.astype(np.float64), L


def _dense_tree_structure(parent):
    """Static (weight-independent) structure for the dense filter: returns
    (P float64 [V,V] ancestor-or-self indicator, L int64 [V,V] LCA index).
    With g = P @ logw (logw[root] = 0 since its self-edge has zero feature
    difference), the path-sum between i and j is g[i] + g[j] - 2 g[L[i,j]].

    All-pairs LCA via an iterative Euler tour + sparse-table RMQ
    (O(V^2 log V) instead of the naive O(V^3) common-ancestor argmax, which
    dominated the dense oracle's cost at V >= 24^2); the ancestor-or-self
    matrix by vectorized pointer walking. Output equals
    _dense_tree_structure_ref exactly (the LCA of a pair in a rooted tree
    is unique, so every correct method agrees elementwise).
    """
    parent = np.asarray(parent, dtype=np.int64)
    V = len(parent)
    root = int(np.nonzero(parent == np.arange(V))[0][0])
    kids = [[] for _ in range(V)]
    for v in range(V):
        if v != root:
            kids[int(parent[v])].append(v)
    # iterative Euler tour: node appended at first visit and after each
    # child's subtree returns -> length 2V-1
    M = 2 * V - 1
    E = np.empty(M, dtype=np.int64)
    D = np.empty(M, dtype=np.int64)
    F = np.empty(V, dtype=np.int64)  # first occurrence of v in E
    stack = [(root, iter(kids[root]))]
    F[root] = 0
    E[0], D[0] = root, 0
    pos = 1
    while stack:
        node, child_it = stack[-1]
        child = next(child_it, None)
        if child is None:
            stack.pop()
            if stack:
                E[pos], D[pos] = stack[-1][0], len(stack) - 1
                pos += 1
        else:
            F[child] = pos
            E[pos], D[pos] = child, len(stack)
            pos += 1
            stack.append((child, iter(kids[child])))
    assert pos == M
    # sparse table of argmin-depth positions over E
    nlev = max(1, M.bit_length())
    SP = np.zeros((nlev, M), dtype=np.int64)
    SP[0] = np.arange(M)
    for j in range(1, nlev):
        half = 1 << (j - 1)
        n = M - (1 << j) + 1
        if n <= 0:
            SP[j] = SP[j - 1]
            continue
        a = SP[j - 1, :n]
        b = SP[j - 1, half:half + n]
        SP[j, :n] = np.where(D[a] <= D[b], a, b)
        SP[j, n:] = SP[j - 1, n:]
    lo = np.minimum(F[:, None], F[None, :])
    hi = np.maximum(F[:, None], F[None, :])
    # exact integer floor(log2): a float log2 of a power of two can land
    # epsilon below the integer and floor to k-1
    logt = np.zeros(M + 1, dtype=np.int64)
    for i in range(2, M + 1):
        logt[i] = logt[i >> 1] + 1
    k = logt[hi - lo + 1]
    a = SP[k, lo]
    b = SP[k, hi - (1 << k) + 1]
    L = E[np.where(D[a] <= D[b], a, b)]
    # ancestor-or-self indicator by pointer walking (all rows at once)
    anc = np.zeros((V, V), dtype=bool)
    rows = np.arange(V)
    cur = rows.copy()
    anc[rows, cur] = True
    while True:
        nxt = parent[cur]
        if (nxt == cur).all():
            break
        cur = nxt
        anc[rows, cur] = True
    return anc.astype(np.float64), L


def dense_tree_filter_torch(x, embed, parent, struct, *, sigma, low_tree):
    """y = (M x)/(M 1) over the rooted tree, fp64 internals (oracle role).

    x: [V, C] torch; embed: [V, D] torch guide; edge weight to parent is
    exp(-||d||^2 / sigma) for the low tree (detached, like
    functions/refine.py:32-38) and exp(-||d||^2) for high trees
    (weight-gradients live).
    """
    P, L = struct
    pt = torch.as_tensor(parent)
    d2 = ((embed - embed[pt]) ** 2).sum(-1).double()  # root entry == 0
    logw = -d2 / sigma if low_tree else -d2
    if low_tree:
        logw = logw.detach()
    g = torch.as_tensor(P) @ logw  # [V]
    S = g[:, None] + g[None, :] - 2.0 * g[torch.as_tensor(L)]
    M = torch.exp(S)
    num = M @ x.double()
    den = (M @ torch.ones(x.shape[0], 1, dtype=torch.float64))
    return (num / den).float()


def mscale_recurve_tree_loss_torch(
    logits, img, aux1, aux2, aux3, rois, weight, *, sigma=0.02
):
    """MScaleRecurveTreeEnergyLoss (flower_common.py:756-818) on the dense
    oracle filter: low-level filtering of the softmax probs guided by the
    (detached) image, then the chained high-level refinements guided by the
    three resized aux logits; loss = weight * sum(ROI |prob - AS_3|)/sum(ROI).

    logits/aux: NCHW torch; img: NCHW (already at logits resolution);
    rois: [B, H, W] float torch.
    """
    B, C, H, W = logits.shape
    prob = torch.softmax(logits, dim=1)
    low = img.detach()
    highs = [
        F.interpolate(a, size=(H, W), mode="bilinear", align_corners=False)
        for a in (aux1, aux2, aux3)
    ]

    def flat(t_b):  # [C,H,W] -> [V, C] row-major over (H, W)
        return t_b.permute(1, 2, 0).reshape(H * W, -1)

    total = logits.new_zeros(())
    for b in range(B):
        pb = flat(prob[b])
        lowb = flat(low[b])
        parent = _kruskal_bfs_parent(
            lowb.detach().numpy().astype(np.float32), H, W
        )
        cur = dense_tree_filter_torch(
            pb, lowb, parent, _dense_tree_structure(parent),
            sigma=sigma, low_tree=True,
        )
        for hf in highs:
            hb = flat(hf[b])
            parent_h = _kruskal_bfs_parent(
                hb.detach().numpy().astype(np.float32), H, W
            )
            cur = dense_tree_filter_torch(
                cur, hb, parent_h, _dense_tree_structure(parent_h),
                sigma=sigma, low_tree=False,
            )
        total = total + (
            rois[b][:, :, None] * (prob[b].permute(1, 2, 0)
                                   - cur.reshape(H, W, C)).abs()
        ).sum()
    n = rois.sum()
    loss = total / torch.clamp(n, min=1.0) if float(n) > 0 else total
    return weight * loss


def _ours_minus_tree_loss(model, img, lab, num_classes, alpha,
                          gatecrf_weight, radius, tree_weight=0.0,
                          tree_sigma=0.02):
    """One training iteration's loss (…_Ours.py:110-164): pCE + tree_weight *
    MScaleRecurveTree + 0.1*gatedCRF + alpha*loss_lc, with the contrast's K-1
    foreign no-grad forwards run in train mode AFTER the main forward — each
    updates the BN running stats in place, exactly the reference's
    sequential stat threading. tree_weight=0 (the original oracle config)
    skips the tree term and the aux-head computation, matching
    engine/objective.py:132-137."""
    if tree_weight:
        logits, hmap, aux = model.forward(img, train=True, return_aux=True)
    else:
        logits, hmap = model.forward(img, train=True)
    probs = torch.softmax(logits, dim=1)
    loss_ce = F.cross_entropy(
        logits, torch.as_tensor(_np(lab)).long(), ignore_index=num_classes
    )
    img_nchw = torch.as_tensor(_np(img).transpose(0, 3, 1, 2))
    if tree_weight:
        rois = torch.as_tensor(
            (_np(lab) == num_classes).astype(np.float32)
        )
        three = (
            img_nchw if img_nchw.shape[1] == 3
            else img_nchw.repeat(1, 3, 1, 1)
        )
        loss_tree = mscale_recurve_tree_loss_torch(
            logits, three, aux[0], aux[1], aux[2], rois, tree_weight,
            sigma=tree_sigma,
        )
    else:
        loss_tree = torch.zeros(())
    loss_crf = gated_crf_torch(probs, img_nchw, radius)
    loss_lc = 0.0
    for other in range(model.num_clients):
        if other == model.client_id:
            continue
        with torch.no_grad():
            _, hm_o = model.forward(img, emb_idx=other, train=True)
        loss_lc = loss_lc + F.mse_loss(hmap, hm_o.detach())
    loss_lc = -loss_lc / (model.num_clients - 1)
    loss = (loss_ce + loss_tree + gatecrf_weight * loss_crf
            + alpha * loss_lc)
    return loss, float(loss_ce.detach()), float(loss_lc.detach())


def torch_ala_set_weights(
    model,
    local_flat,
    global_p,
    global_s,
    ala_batches_fn,
    *,
    num_classes,
    iter_global,
    ala_skip_iters,
    start_phase,
    max_epochs=50,
):
    """Reference MyModel.set_weights (flower_common.py:491-633) in torch.

    ``local_flat`` = the client's previous local params (flat list);
    ``global_p/global_s`` = the aggregated payload; ``ala_batches_fn(epoch)``
    yields that epoch's batches. Returns the new start_phase. The model ends
    holding: global weights everywhere, ALA-blended values on the gated
    ('higher') params, global BN stats (the temp model's stat updates are
    discarded — only param data is copied back, :617-620).
    """
    import copy

    diff = sum(
        float(np.abs(g - l).sum()) for g, l in zip(global_p, local_flat)
    )
    model.load_flat(global_p, global_s)
    if diff == 0.0 or iter_global <= ala_skip_iters:
        return start_phase

    gated_keys = ("out_conv", "up4", "up3", "up2", "up1")
    gated = [
        i
        for i, n in enumerate(model.names)
        if any(k in n for k in gated_keys)
    ]
    local_t = [torch.tensor(local_flat[i]) for i in gated]
    global_t = [torch.tensor(global_p[i]) for i in gated]
    gates = [torch.ones_like(t) for t in local_t]  # quirk #3: fresh each round

    losses = []
    epoch = 0
    while True:
        batches = ala_batches_fn(epoch)
        for img, lab in zip(batches["image"], batches["label"]):
            # blend into the model's gated params (temp model)
            with torch.no_grad():
                for j, i in enumerate(gated):
                    model.params[i].copy_(
                        global_t[j] + (local_t[j] - global_t[j]) * gates[j]
                    )
            stats = model.clone_stats()  # discard BN stat updates
            logits, _ = model.forward(img, train=True, stats=stats)
            loss = F.cross_entropy(
                logits,
                torch.as_tensor(_np(lab)).long(),
                ignore_index=num_classes,
            )
            for i in gated:
                if model.params[i].grad is not None:
                    model.params[i].grad = None
            loss.backward()
            with torch.no_grad():
                for j, i in enumerate(gated):
                    g = model.params[i].grad
                    if g is None:
                        continue
                    # reference update (:596-597) with the quirk-#4 naming
                    # inversion resolved: 'server_param - param' is
                    # local - global
                    gates[j] = torch.clamp(
                        gates[j] - g * (local_t[j] - global_t[j]), 0, 1
                    )
        losses.append(float(loss.detach()))
        epoch += 1
        if not start_phase:
            break
        if len(losses) > 10 and float(np.std(losses[-10:])) < 0.1:
            break
        if epoch >= max_epochs:
            break

    with torch.no_grad():
        for j, i in enumerate(gated):
            model.params[i].copy_(
                global_t[j] + (local_t[j] - global_t[j]) * gates[j]
            )
            model.params[i].grad = None
    return False


def run_torch_fedicra_ours(
    flax_params,
    flax_stats,
    client_batches,  # list over clients of {'image': [R, iters, B,H,W,C], ...}
    ala_batches,  # list over clients of {'image': [nb, B,H,W,C], ...} per epoch
    *,
    num_classes,
    num_clients,
    base_lr,
    max_iterations,
    rounds,
    iters,
    rep_iters,
    alpha,
    gatecrf_weight,
    radius,
    ala_skip_iters,
    tree_weight=0.0,
    tree_sigma=0.02,
    probe_fn=None,
):
    """The full FedICRA federated loop in torch: per-round ALA merge +
    head/body alternating AdamW phases + contrast + CRF + pCE (+ the dense-
    oracle MScaleRecurve tree term when tree_weight > 0), FedAvg aggregation
    of params and BN stats. Returns
    (losses[cid][global_iter], final global flat params, gated param count).

    ``probe_fn(models, it_global)``: optional observer called after every
    round's aggregation (used by tools/collapse_xfw.py to record per-client
    foreground-probability / dice trajectories without perturbing the loop)."""
    K = num_clients
    models = [
        TorchFedICRAUNet(flax_params, flax_stats, K, cid) for cid in range(K)
    ]
    global_p, global_s = models[0].export_flat()
    local_flats = [[p.copy() for p in global_p] for _ in range(K)]
    start_phases = [True] * K
    losses = [[] for _ in range(K)]

    head_names = {"decoder.out_conv.weight", "decoder.out_conv.bias"}
    it_global = 0
    for r in range(rounds):
        results = []
        for cid in range(K):
            model = models[cid]
            start_phases[cid] = torch_ala_set_weights(
                model,
                local_flats[cid],
                global_p,
                global_s,
                lambda _e, c=cid: {
                    "image": ala_batches[c]["image"],
                    "label": ala_batches[c]["label"],
                },
                num_classes=num_classes,
                iter_global=it_global + iters,  # fit_config iter_global
                ala_skip_iters=ala_skip_iters,
                start_phase=start_phases[cid],
            )
            opt = torch.optim.AdamW(
                model.params,
                lr=poly_lr(base_lr, it_global, max_iterations),
                betas=(0.9, 0.999),
                eps=1e-8,
                weight_decay=1e-2,
            )
            it = it_global
            for i in range(iters):
                head_phase = i < iters - rep_iters
                for n, p in zip(model.names, model.params):
                    p.requires_grad_(
                        (n in head_names) if head_phase else (n not in head_names)
                    )
                for g in opt.param_groups:
                    g["lr"] = poly_lr(base_lr, it, max_iterations)
                img = client_batches[cid]["image"][r, i]
                lab = client_batches[cid]["label"][r, i]
                loss, _, _ = _ours_minus_tree_loss(
                    model, img, lab, num_classes, alpha, gatecrf_weight,
                    radius, tree_weight=tree_weight, tree_sigma=tree_sigma,
                )
                opt.zero_grad()
                loss.backward()
                opt.step()
                losses[cid].append(float(loss.detach()))
                it += 1
            for p in model.params:
                p.requires_grad_(True)
            local_flats[cid] = [p.copy() for p in model.export_flat()[0]]
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
        if probe_fn is not None:
            probe_fn(models, it_global)
    return losses, global_p


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
