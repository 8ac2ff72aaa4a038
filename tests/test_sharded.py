"""Sharded SPMD federation tests on the virtual CPU mesh (8 devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from fedicra_tpu.engine import TrainConfig
from fedicra_tpu.federation.sharded_experiment import ShardedFederation
from fedicra_tpu.parallel.mesh import make_mesh


def test_make_mesh_shapes():
    m = make_mesh(n_devices=8, num_clients=4)
    assert m.devices.shape == (4, 2)
    assert m.axis_names == ("client", "data")
    m2 = make_mesh(n_devices=8, num_clients=5)
    assert m2.devices.shape in ((4, 2), (2, 4), (1, 8))  # largest divisor <= 5


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 devices")
def test_sharded_federation_fedavg_round():
    cfg = TrainConfig.for_task(
        "odoc",
        img_size=16,
        batch_size=4,
        iters=2,
        rep_iters=1,
        eval_iters=2,
        max_iterations=4,
        strategy="FedAvg",
        procedure="pce",
        model="unet_lc_multihead",
    ).replace(num_clients=4)
    mesh = make_mesh(n_devices=8, num_clients=4)
    fed = ShardedFederation(cfg, mesh=mesh, limit_per_client=4, synthetic=True)
    hist = fed.run(progress=False)
    assert len(hist) == 2
    for leaf in jax.tree.leaves(fed.global_payload["params"]):
        assert np.isfinite(np.asarray(leaf)).all()
    # client iter counters advanced
    np.testing.assert_array_equal(np.asarray(fed.states.current_iter), 4)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 devices")
def test_sharded_matches_sequential_fedavg_one_round():
    """The SPMD round must agree with a per-client sequential computation."""
    from fedicra_tpu.engine.trainer import init_client_state, make_round_fn
    from fedicra_tpu.federation.strategies import weighted_tree_mean
    from fedicra_tpu.models import net_factory

    cfg = TrainConfig.for_task(
        "odoc",
        img_size=16,
        batch_size=2,
        iters=2,
        rep_iters=1,
        max_iterations=8,
        strategy="FedAvg",
        procedure="pce",
        model="unet_lc_multihead",
    ).replace(num_clients=2)
    mesh = make_mesh(n_devices=2, num_clients=2)
    fed = ShardedFederation(cfg, mesh=mesh, limit_per_client=2, synthetic=True)
    # snapshot inputs for the sequential replay
    start = np.asarray(fed.states.current_iter)
    batches = fed._stack_round_batches(start)
    states0 = jax.tree.map(lambda x: np.asarray(x), fed.states)
    payload0 = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)),
                            fed.global_payload)

    m = fed.run_round()
    sharded_params = jax.tree.map(np.asarray, fed.global_payload["params"])

    # sequential replay with the plain round_fn
    model = fed.model
    round_fn = jax.jit(make_round_fn(model, cfg))
    client_params = []
    for cid in range(2):
        st = jax.tree.map(jnp.asarray, fed_states_slice(states0, cid))
        b = jax.tree.map(lambda x: x[cid], batches)
        st = st._replace(
            params=payload0["params"],
            batch_stats=payload0["batch_stats"],
        )
        st2, _ = round_fn(st, b, jnp.asarray(cid, jnp.int32))
        client_params.append(st2.params)
    expect = weighted_tree_mean(client_params, [float(w) for w in fed.weights])
    for a, b in zip(jax.tree.leaves(sharded_params), jax.tree.leaves(expect)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


def fed_states_slice(states, cid):
    return jax.tree.map(lambda x: x[cid], states)
