"""End-to-end federation tests on tiny synthetic data (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow
from flax import traverse_util

from fedicra_tpu.engine import TrainConfig
from fedicra_tpu.federation import build_experiment, get_strategy, weighted_tree_mean
from fedicra_tpu.federation.ala import ala_set_weights, make_ala_epoch_fn
from fedicra_tpu.models.params_filters import is_ala_gated_path, is_pcs_path


def _tiny_cfg(**kw):
    base = dict(
        img_size=16,
        batch_size=2,
        iters=2,
        rep_iters=1,
        eval_iters=4,
        max_iterations=8,
        num_clients=5,
    )
    base.update(kw)
    return TrainConfig.for_task("odoc", **base)


def test_fedavg_two_rounds_runs_and_aggregates():
    cfg = _tiny_cfg(strategy="FedAvg", procedure="pce", model="unet_lc_multihead")
    server = build_experiment(cfg, limit_per_client=4, synthetic=True)
    history = server.run(num_rounds=4, progress=False)
    assert len(history) == 2
    # eval round happened at iter 4
    assert any("val_mean_dice" in h for h in history)
    # payload finite
    for leaf in jax.tree.leaves(server.global_payload["params"]):
        assert np.isfinite(np.asarray(leaf)).all()


def test_central_evaluate_for_centralized_strategies():
    """CENTRALIZED_FL strategies evaluate the AGGREGATED model server-side
    on the client_all val union every eval round (get_evaluate_fn,
    flower_common.py:139-151, called at :288-301); PERSONALIZED_FL (FedICRA)
    must skip it — the reference guards on `strategy not in PERSONALIZED_FL`."""
    cfg = _tiny_cfg(strategy="FedAvg", procedure="pce", model="unet_lc_multihead")
    server = build_experiment(cfg, limit_per_client=4, synthetic=True)
    assert server.central_eval_fn is not None
    history = server.run(num_rounds=4, progress=False)
    evald = [h for h in history if "central_val_mean_dice" in h]
    assert evald, history
    for h in evald:
        # full central metric surface: per-class + mean, same names as the
        # per-client eval, under the central_ prefix
        assert "central_val_1_dice" in h and "central_val_mean_hd95" in h
        assert np.isfinite(h["central_val_mean_dice"])

    cfg_p = _tiny_cfg(strategy="FedICRA", procedure="pce")
    server_p = build_experiment(cfg_p, limit_per_client=4, synthetic=True)
    assert server_p.central_eval_fn is None


def test_fedicra_round_with_ala_skip_then_train():
    cfg = _tiny_cfg(strategy="FedICRA", procedure="pce", iters=2, rep_iters=1)
    server = build_experiment(cfg, limit_per_client=4, synthetic=True)
    history = server.run(num_rounds=4, progress=False)
    assert len(history) == 2
    # with iter_global <= 50 every client should have adopted global weights
    # (ALA skip) so its params equal the aggregated payload BEFORE training,
    # but after local training they differ
    for c in server.clients:
        assert c.start_phase  # ALA never actually ran in the skip regime


def test_ala_gate_learning_blends_towards_local():
    """With iter_global > 50 ALA must run; gates in [0,1], lower layers take
    the global weights, gated layers land between global and local."""
    cfg = _tiny_cfg(strategy="FedICRA", procedure="pce")
    server = build_experiment(cfg, limit_per_client=4, synthetic=True)
    client = server.clients[0]
    model = client.model

    local = client.state.params
    # make a distinct fake global
    global_p = jax.tree.map(lambda x: x + 0.05, local)
    payload = {"params": global_p, "batch_stats": client.state.batch_stats}

    ala_fn = make_ala_epoch_fn(model, cfg)

    def provider(_e):
        imgs, labs = client.batcher.epoch_arrays(0)
        return {"image": imgs, "label": labs}

    params, stats, start_phase = ala_set_weights(
        model, cfg, ala_fn, local, global_p, client.state.batch_stats,
        provider, jax.random.PRNGKey(0), cid=0, iter_global=60, start_phase=False,
    )
    assert start_phase is False
    flat_new = traverse_util.flatten_dict(params)
    flat_local = traverse_util.flatten_dict(local)
    flat_global = traverse_util.flatten_dict(global_p)
    for k in flat_new:
        lo = np.minimum(np.asarray(flat_local[k]), np.asarray(flat_global[k]))
        hi = np.maximum(np.asarray(flat_local[k]), np.asarray(flat_global[k]))
        if is_ala_gated_path(k):
            # blend stays inside the [global, local] interval elementwise
            assert (np.asarray(flat_new[k]) >= lo - 1e-6).all()
            assert (np.asarray(flat_new[k]) <= hi + 1e-6).all()
        else:
            np.testing.assert_allclose(
                np.asarray(flat_new[k]), np.asarray(flat_global[k])
            )


def test_ala_skip_under_50_iters():
    cfg = _tiny_cfg(strategy="FedICRA", procedure="pce")
    server = build_experiment(cfg, limit_per_client=4, synthetic=True)
    client = server.clients[1]
    local = client.state.params
    global_p = jax.tree.map(lambda x: x + 0.1, local)
    ala_fn = make_ala_epoch_fn(client.model, cfg)
    params, _, sp = ala_set_weights(
        client.model, cfg, ala_fn, local, global_p, client.state.batch_stats,
        lambda e: None, jax.random.PRNGKey(0), cid=1, iter_global=50,
        start_phase=True,
    )
    # wholesale adoption of the global weights
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(global_p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert sp is True


def test_strategies_fedopt_update():
    tree = {"w": jnp.zeros((3,))}
    clients = [{"w": jnp.ones((3,))}, {"w": 3 * jnp.ones((3,))}]
    avg = weighted_tree_mean(clients, [1.0, 1.0])
    np.testing.assert_allclose(np.asarray(avg["w"]), 2.0)
    # weighted by batch counts
    avg2 = weighted_tree_mean(clients, [3.0, 1.0])
    np.testing.assert_allclose(np.asarray(avg2["w"]), 1.5)

    for name in ("FedAdagrad", "FedAdam", "FedYogi"):
        s = get_strategy(name)
        out = s.aggregate(tree, clients, [1.0, 1.0])
        assert np.isfinite(np.asarray(out["w"])).all()
        # server opt moves toward the aggregate (positive delta)
        assert (np.asarray(out["w"]) > 0).all()


def test_fedicra_personalization_diverges_heads(monkeypatch):
    """With ALA active (skip horizon forced to 0), client head params
    personalize: the gate blend keeps them anchored near their local values
    so they differ across clients after the round's evaluate merge.

    (In the untouched reference regime, iter_global <= 50 skips ALA and every
    evaluate equalizes all clients to the aggregate — covered by
    test_fedicra_round_with_ala_skip_then_train.)"""
    import fedicra_tpu.federation.ala as ala_mod

    monkeypatch.setattr(ala_mod, "ALA_MAX_EPOCHS", 2)
    # freeze gate learning so gates stay exactly 1: the merge then anchors the
    # gated layers at each client's LOCAL weights deterministically (with
    # learning enabled the gates may legitimately converge to adopt-global,
    # which made this assertion trajectory-dependent)
    monkeypatch.setattr(ala_mod, "ALA_ETA", 0.0)
    # the skip horizon comes from cfg (cfg.ala_skip_iters wins over the
    # module constant — monkeypatching ALA_SKIP_ITERS here would be dead)
    cfg = _tiny_cfg(strategy="FedICRA", procedure="pce", max_iterations=8,
                    ala_skip_iters=0)
    server = build_experiment(cfg, limit_per_client=4, synthetic=True)
    server.run(num_rounds=8, progress=False)
    heads = []
    for c in server.clients:
        flat = traverse_util.flatten_dict(c.state.params)
        heads.append(np.asarray(flat[("decoder", "out_conv", "conv", "kernel")]))
    assert not np.allclose(heads[0], heads[1])


def test_fit_fault_aborts_round_without_contamination():
    """In-process fault injection (VERDICT r3 #6): a client raising mid-fit
    must abort THAT round — the global payload stays bitwise untouched, no
    partial aggregation — and the next round proceeds normally. Mirrors the
    reference's accept_failures=False: a failed fit_round returns None and
    MyServer logs + continues (flower_common.py:263-265, ..._Ours.py:377)."""
    cfg = _tiny_cfg(strategy="FedAvg", procedure="pce",
                    model="unet_lc_multihead")
    server = build_experiment(cfg, limit_per_client=4, synthetic=True)
    victim = server.clients[2]
    real_fit = victim.fit

    m = server.fit_round(2)
    assert m is not None
    snap = jax.tree.map(np.asarray, server.global_payload)

    def crashing_fit(ins):
        # mutate local client state first (a genuinely *mid*-fit failure),
        # then die: the abort must still leave the global payload untouched
        victim.state = victim.state._replace(
            current_iter=victim.state.current_iter + 1
        )
        raise RuntimeError("simulated mid-fit crash")

    victim.fit = crashing_fit
    assert server.fit_round(4) is None
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b),
        server.global_payload, snap,
    )

    # client recovers -> the next round trains and aggregates again
    victim.fit = real_fit
    m = server.fit_round(6)
    assert m is not None
    for leaf in jax.tree.leaves(server.global_payload["params"]):
        assert np.isfinite(np.asarray(leaf)).all()


def test_evaluate_fault_skips_eval_round_and_continues():
    """A client raising mid-evaluate skips that eval (no val metrics, no
    best-checkpoint update) but neither aborts training nor corrupts the
    loop — the reference logs 'evaluate failed' and continues
    (flower_common.py:303-306)."""
    cfg = _tiny_cfg(strategy="FedAvg", procedure="pce",
                    model="unet_lc_multihead")
    server = build_experiment(cfg, limit_per_client=4, synthetic=True)
    victim = server.clients[1]

    calls = {"n": 0}
    real_evaluate = victim.evaluate

    def flaky_evaluate(ins):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated mid-evaluate crash")
        return real_evaluate(ins)

    victim.evaluate = flaky_evaluate
    history = server.run(num_rounds=8, progress=False)
    assert len(history) == 4 and not any(h.get("aborted") for h in history)
    # eval rounds are 4 and 8; the first one died -> no val metrics, no best
    evals = [h for h in history if "val_mean_dice" in h]
    assert [h["round"] for h in evals] == [8]
    assert calls["n"] == 2  # failed at round 4, succeeded at round 8
    assert server.best_dice == pytest.approx(evals[0]["val_mean_dice"])


def test_server_stops_after_consecutive_failures():
    """A persistently failing backend must stop the run instead of burning
    the whole round budget on aborted rounds (greenfield safety; the
    reference's MyServer continues forever, flower_common.py:263-265)."""
    from fedicra_tpu.federation.server import FederatedServer

    cfg = _tiny_cfg(max_iterations=100, max_consecutive_failures=3)

    class DeadClient:
        cid = 0
        state = None

        def fit(self, ins):
            raise RuntimeError("RESOURCE_EXHAUSTED (simulated)")

    server = FederatedServer(cfg, [DeadClient()], strategy=None,
                             initial_payload=None)
    server.run(progress=False)
    aborted = [r for r in server.history if r.get("aborted")]
    assert len(aborted) == 3  # stopped at the cap, not 50 rounds


def test_server_resume_continues_identically(tmp_path):
    """Kill-and-resume must reproduce the uninterrupted trajectory exactly:
    the resume snapshot carries server progress, client states, ALA phase,
    and client rngs (greenfield capability; the reference cannot resume)."""
    mk = lambda: _tiny_cfg(
        strategy="FedAvg", procedure="pce", model="unet_lc_multihead",
        iters=2, eval_iters=1000, ckpt_iters=4, max_iterations=1000,
    )

    # uninterrupted: 8 iterations
    s_full = build_experiment(mk(), limit_per_client=4, synthetic=True)
    h_full = s_full.run(num_rounds=8, progress=False)

    # interrupted: 4 iterations, snapshot, fresh process-equivalent, resume
    d = str(tmp_path / "snap")
    s_a = build_experiment(mk(), snapshot_dir=d, limit_per_client=4, synthetic=True)
    s_a.run(num_rounds=4, progress=False)

    s_b = build_experiment(mk(), snapshot_dir=d, limit_per_client=4, synthetic=True)
    assert s_b.try_resume()
    assert s_b.current_round == 4
    h_b = s_b.run(num_rounds=8, progress=False)

    last_full = {k: v for k, v in h_full[-1].items()
                 if isinstance(v, float) and "loss" in k}
    last_b = {k: v for k, v in h_b[-1].items()
              if isinstance(v, float) and "loss" in k}
    assert last_full.keys() == last_b.keys() and len(last_full) > 0
    for k in last_full:
        np.testing.assert_allclose(last_b[k], last_full[k], rtol=1e-5,
                                   atol=1e-6, err_msg=k)


def test_client_side_own_best_checkpoints(tmp_path, monkeypatch):
    """Reference semantics (flower_common.py:106-114): each client saves ITS
    OWN state at ITS OWN best val_mean_dice, from its own evaluate call —
    NOT a server-side snapshot at the aggregate-best round. Scripted dice
    values verify the persisted checkpoint is the state the client held at
    its own peak, that a worse eval does not overwrite it, and that the
    server's aggregate-best artifact is global-payload-only."""
    from fedicra_tpu.federation import client as client_mod
    from fedicra_tpu.federation.api import EvaluateIns

    cfg = _tiny_cfg(strategy="FedAvg", procedure="pce",
                    model="unet_lc_multihead")
    d = str(tmp_path / "snap")
    server = build_experiment(cfg, snapshot_dir=d, limit_per_client=4, synthetic=True)
    cl = server.clients[0]
    assert cl.ckpt is not None

    scripted = {"dice": 0.0}

    def fake_eval(model, params, stats, images, labels, num_classes,
                  emb_idx=0):
        return {"mean_dice": scripted["dice"]}

    monkeypatch.setattr(client_mod, "evaluate_client", fake_eval)

    def payload_const(c):
        return {
            "params": jax.tree.map(
                lambda x: jnp.full_like(x, c), server.global_payload["params"]
            ),
            "batch_stats": server.global_payload["batch_stats"],
        }

    # first eval: dice 0.3 at iter 20 with params=1 -> saved
    scripted["dice"] = 0.3
    cl.evaluate(EvaluateIns(payload_const(1.0), {"iter_global": 20}))
    # worse eval: dice 0.2 with params=2 -> NOT saved
    scripted["dice"] = 0.2
    cl.evaluate(EvaluateIns(payload_const(2.0), {"iter_global": 40}))
    got = cl.ckpt.restore_best_client(0, cl.state._asdict())
    for leaf in jax.tree.leaves(got["params"]):
        np.testing.assert_array_equal(np.asarray(leaf), 1.0)
    # better eval: dice 0.5 with params=3 -> overwritten
    scripted["dice"] = 0.5
    cl.evaluate(EvaluateIns(payload_const(3.0), {"iter_global": 60}))
    got = cl.ckpt.restore_best_client(0, cl.state._asdict())
    for leaf in jax.tree.leaves(got["params"]):
        np.testing.assert_array_equal(np.asarray(leaf), 3.0)
    info = (tmp_path / "snap" / "best_client_0_info.txt").read_text()
    assert info.splitlines() == ["iter=20 dice=0.300000",
                                 "iter=60 dice=0.500000"]
    # the server's aggregate-best artifact stays global-only: save_best
    # writes best_global + best_info, never best_client_*
    import os as _os

    server.ckpt.save_best(server.global_payload, 60, 0.5)
    assert (tmp_path / "snap" / "best_global").exists()
    assert not _os.path.exists(tmp_path / "snap" / "best_client_1")


def test_server_graceful_stop_fn(tmp_path):
    """run(stop_fn=...) ends the loop at a round boundary with a fresh
    resume snapshot (the watchdog-quiesce cooperative-stop path; round-4
    forensics showed the SIGKILL alternative losing up to ckpt_iters of
    work and recording rc=-9)."""
    cfg = _tiny_cfg(strategy="FedAvg", procedure="pce",
                    model="unet_lc_multihead", ckpt_iters=1000)
    d = str(tmp_path / "snap")
    server = build_experiment(cfg, snapshot_dir=d, limit_per_client=4, synthetic=True)
    calls = {"n": 0}

    def stop_after_one():
        calls["n"] += 1
        return calls["n"] > 1  # allow round 1, stop before round 2

    server.run(num_rounds=100, progress=False, stop_fn=stop_after_one)
    assert server.current_round == cfg.iters  # exactly one round ran
    # the stop path wrote a resume snapshot despite ckpt_iters never firing
    s2 = build_experiment(cfg, snapshot_dir=d, limit_per_client=4, synthetic=True)
    assert s2.try_resume()
    assert s2.current_round == cfg.iters
