"""Mesh/sharding tests on the 8-device virtual CPU platform: data
parallel + tensor parallel train step compiles, executes, and matches
the single-device result."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from imagecaptioning_tpu.config import get_transformer_config
from imagecaptioning_tpu.models.captioners import TransformerCaptioner
from imagecaptioning_tpu.parallel import mesh as meshlib
from imagecaptioning_tpu.train import optim, step as steplib


def _tiny_setup(batch):
    v, t = 32, 6
    model = TransformerCaptioner(vocab_size=v, max_length=t, embed_size=32,
                                 num_layers=1, heads=4, dropout=0.0,
                                 backbone_stages=(1, 1, 1, 1))
    cfg = get_transformer_config().replace(batch_size=batch)
    tx = optim.make_optimizer(cfg, total_steps=100, finetune_start_step=4)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(batch, 64, 64, 3).astype(np.float32))
    gt = jnp.asarray(rng.randint(1, v + 1, size=(batch, t)).astype(np.int32))
    state, _ = steplib.create_train_state(model, tx, images, gt)
    return model, tx, state, images, gt


def test_mesh_creation():
    m = meshlib.create_mesh((-1,), ("data",))
    assert m.shape["data"] == len(jax.devices())
    m2 = meshlib.create_mesh((2, -1), ("data", "model"))
    assert m2.shape["data"] * m2.shape["model"] == len(jax.devices())


def test_partition_rules_divisible_and_fallback():
    mesh = meshlib.create_mesh((4, 2), ("data", "model"))
    model, tx, state, *_ = _tiny_setup(8)
    sh = meshlib.infer_param_shardings(state.params, mesh)
    flat = jax.tree_util.tree_leaves_with_path(sh)
    # at least one param actually tensor-split
    split = [s for _, s in flat if s.spec != jax.sharding.PartitionSpec()]
    assert len(split) > 0


def test_dp_tp_step_matches_single_device():
    model, tx, state0, images, gt = _tiny_setup(8)
    # single-device reference step
    plain = jax.jit(steplib.make_train_step(model, tx))
    s1, m1 = plain(state0, images, gt)

    # dp×tp sharded step from the same initial state
    model, tx, state0, images, gt = _tiny_setup(8)
    mesh = meshlib.create_mesh((4, 2), ("data", "model"))
    shardings = meshlib.infer_param_shardings(state0.params, mesh)
    params = jax.tree.map(jax.device_put, state0.params, shardings)
    state0 = state0._replace(params=params)
    step = steplib.shard_train_step(steplib.make_train_step(model, tx),
                                    mesh, param_shardings=shardings,
                                    state_template=state0)
    data = meshlib.data_sharding(mesh)
    s2, m2 = step(state0, jax.device_put(images, data),
                  jax.device_put(gt, data))
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-4)
    # params after update agree
    d1 = jax.tree.leaves(s1.params)
    d2 = jax.tree.leaves(s2.params)
    for a, b in zip(d1, d2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


def test_graft_entry_dryrun():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_mesh_for_batch_divisibility():
    from imagecaptioning_tpu.parallel import mesh as meshlib
    # 8 virtual devices; batch 6 → largest divisor ≤ 8 is 6
    m = meshlib.mesh_for_batch(6)
    assert m.shape["data"] in (1, 2, 3, 6)
    assert 6 % m.shape["data"] == 0
    m8 = meshlib.mesh_for_batch(16)
    assert m8.shape["data"] == 8
    m1 = meshlib.mesh_for_batch(1)
    assert m1.shape["data"] == 1
