"""Engine tests: round function semantics (phases, PCS freezing, LR)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow
from flax import traverse_util

from fedicra_tpu.data import EpochBatcher, make_synthetic_split
from fedicra_tpu.engine import TrainConfig, init_client_state, make_round_fn, poly_lr
from fedicra_tpu.models import net_factory
from fedicra_tpu.models.params_filters import is_head_path, is_pcs_path


def _setup(procedure="ours", strategy="FedICRA", iters=3, rep_iters=1, size=16):
    cfg = TrainConfig.for_task(
        "odoc",
        img_size=size,
        batch_size=2,
        iters=iters,
        rep_iters=rep_iters,
        max_iterations=60,
        procedure=procedure,
        strategy=strategy,
        model="unet_lc_multihead",
    )
    model = net_factory(
        cfg.model, in_chns=cfg.in_chns, class_num=cfg.num_classes,
        num_clients=cfg.num_clients,
    )
    state = init_client_state(model, cfg)
    split = make_synthetic_split(4, size, size, cfg.in_chns, cfg.num_classes, seed=1)
    batcher = EpochBatcher(split, cfg.batch_size, cfg.num_classes, "odoc", seed=5)
    return cfg, model, state, batcher


def test_fedicra_phases_update_disjoint_params():
    cfg, model, state, batcher = _setup(iters=2, rep_iters=1)
    round_fn = jax.jit(make_round_fn(model, cfg))

    # run a 2-iter round: 1 head-only step then 1 body-only step.
    # Track which params changed after a 1-head-only config instead:
    cfg_head_only = cfg.replace(iters=1, rep_iters=0)
    rf_head = jax.jit(make_round_fn(model, cfg_head_only))
    batches = batcher.batches_for_round(0, 1)
    s2, _ = rf_head(state, batches, jnp.int32(1))

    before = traverse_util.flatten_dict(state.params)
    after = traverse_util.flatten_dict(s2.params)
    for k in before:
        changed = not np.allclose(np.asarray(before[k]), np.asarray(after[k]))
        if is_head_path(k):
            assert changed, f"head param {k} should change in head phase"
        else:
            assert not changed, f"non-head param {k} changed in head phase"


def test_body_phase_freezes_head_and_pcs():
    cfg, model, state, batcher = _setup(iters=1, rep_iters=1)  # body-only round
    round_fn = jax.jit(make_round_fn(model, cfg))
    batches = batcher.batches_for_round(0, 1)
    s2, _ = round_fn(state, batches, jnp.int32(1))
    before = traverse_util.flatten_dict(state.params)
    after = traverse_util.flatten_dict(s2.params)
    n_changed = 0
    for k in before:
        changed = not np.allclose(np.asarray(before[k]), np.asarray(after[k]))
        if is_head_path(k) or is_pcs_path(k):
            assert not changed, f"{k} must be frozen in body phase"
        elif changed:
            n_changed += 1
    assert n_changed > 0


def test_pce_procedure_and_metrics():
    cfg, model, state, batcher = _setup(procedure="pce", iters=2, rep_iters=1)
    round_fn = jax.jit(make_round_fn(model, cfg))
    s2, metrics = round_fn(state, batcher.batches_for_round(0, 2), jnp.int32(0))
    assert "loss_ce" in metrics and "loss_lc" in metrics
    assert np.isfinite(np.asarray(metrics["total_loss"])).all()
    assert int(s2.current_iter) == 2


def test_fedavg_updates_everything_but_pcs():
    cfg, model, state, batcher = _setup(
        procedure="pce", strategy="FedAvg", iters=2, rep_iters=1
    )
    cfg = cfg.replace(model="unet_lc_multihead")
    round_fn = jax.jit(make_round_fn(model, cfg))
    s2, _ = round_fn(state, batcher.batches_for_round(0, 2), jnp.int32(1))
    before = traverse_util.flatten_dict(state.params)
    after = traverse_util.flatten_dict(s2.params)
    for k in before:
        changed = not np.allclose(np.asarray(before[k]), np.asarray(after[k]))
        if is_pcs_path(k):
            assert not changed
    # most params should move
    moved = sum(
        not np.allclose(np.asarray(before[k]), np.asarray(after[k])) for k in before
    )
    assert moved > len(before) // 2


def test_poly_lr_schedule():
    assert poly_lr(0.01, 0, 30000) == pytest.approx(0.01)
    assert poly_lr(0.01, 15000, 30000) == pytest.approx(0.01 * 0.5 ** 0.9)


def test_batcher_replay_and_epoch_regen():
    split = make_synthetic_split(5, 8, 8, 1, 2, seed=0)
    b = EpochBatcher(split, 2, 2, "faz", seed=3)
    assert b.num_batches == 3
    x0 = np.asarray(b.batch_at(0)["image"])
    x0_again = np.asarray(b.batch_at(0)["image"])
    np.testing.assert_array_equal(x0, x0_again)
    # next epoch differs (new permutation/augment)
    x_next_epoch = np.asarray(b.batch_at(3)["image"])
    assert not np.array_equal(x0, x_next_epoch)
    # label ignore-fill stays within [0, num_classes]
    lab = np.asarray(b.batch_at(1)["label"])
    assert lab.max() <= 2


def test_synthetic_sup_type_shapes():
    """Each synthetic sup type yields a validly-shaped partial label:
    values in {0, 1, ignore}, labeled-pixel counts matching the type
    (keypoint << scribble << block/box)."""
    import numpy as np

    nc = 2
    counts = {}
    for sup in ("scribble", "scribble_noisy", "keypoint", "box", "block"):
        split = make_synthetic_split(3, 64, 64, 3, nc, seed=7, sup_type=sup)
        lab = split.labels
        assert set(np.unique(lab)) <= {0, 1, nc}
        labeled = (lab != nc).sum(axis=(1, 2))
        assert (labeled > 0).all(), sup
        counts[sup] = labeled.mean()
    assert counts["keypoint"] < counts["scribble"] <= counts["scribble_noisy"] * 1.01
    # box labels the whole outside-bbox region; block a full quadrant
    assert counts["box"] > counts["scribble"] * 10
    assert counts["block"] == 64 * 64 / 4
    # box: no foreground labels (bbox weak label marks background only)
    box = make_synthetic_split(3, 64, 64, 3, nc, seed=7, sup_type="box")
    assert (box.labels != 1).all()
    # noisy scribble differs from clean scribble on some labeled pixels
    a = make_synthetic_split(2, 64, 64, 3, nc, seed=9, sup_type="scribble")
    b = make_synthetic_split(2, 64, 64, 3, nc, seed=9, sup_type="scribble_noisy")
    assert (a.labels != b.labels).any()


def test_dataset_disk_cache_roundtrip(tmp_path, monkeypatch):
    """The decoded-split disk cache returns identical data on a warm load,
    and any change to a source H5 (size/mtime digest) misses the cache."""
    import h5py
    import numpy as np

    from fedicra_tpu.data.h5io import load_client_split

    root = tmp_path / "root"
    ddir = root / "Domain1" / "train"
    ddir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(3):
        with h5py.File(ddir / f"case{i}.h5", "w") as f:
            f["image"] = rng.random((8, 8, 3)).astype("float32")
            f["scribble"] = rng.integers(0, 3, size=(8, 8)).astype("uint8")
    cache_dir = tmp_path / "cache"
    monkeypatch.setenv("FEDICRA_DATASET_CACHE_DIR", str(cache_dir))

    a = load_client_split(str(root), "client1", "train", "scribble")
    assert len(list(cache_dir.glob("*.npz"))) == 1
    b = load_client_split(str(root), "client1", "train", "scribble")
    np.testing.assert_array_equal(a.images, b.images)
    np.testing.assert_array_equal(a.labels, b.labels)
    assert a.case_names == b.case_names

    # mutate one source file -> digest changes -> cache misses, data fresh
    with h5py.File(ddir / "case0.h5", "w") as f:
        f["image"] = np.zeros((8, 8, 3), "float32")
        f["scribble"] = np.zeros((8, 8), "uint8")
    c = load_client_split(str(root), "client1", "train", "scribble")
    assert len(list(cache_dir.glob("*.npz"))) == 2
    assert float(c.images[0].sum()) == 0.0
