"""Mesh runtime + training step tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from ocr_inference_tpu.models import Easter2
from ocr_inference_tpu.parallel import (
    DataParallelRunner,
    host_shard,
    make_mesh,
    pad_to_multiple_of,
    shard_batch,
    tp_shardings,
)
from ocr_inference_tpu.training import (
    init_train_state,
    make_optimizer,
    make_train_step,
    synthetic_ctc_batch,
)


def test_make_mesh_shapes(cpu_devices):
    mesh = make_mesh(devices=cpu_devices)
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(devices=cpu_devices, model_parallel=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_shard_batch_places_on_mesh(cpu_devices):
    mesh = make_mesh(devices=cpu_devices)
    batch = np.zeros((16, 4), np.float32)
    sharded = shard_batch(mesh, batch)
    assert sharded.sharding.num_devices == 8


def test_pad_to_multiple_of():
    arr, pad = pad_to_multiple_of(np.ones((5, 3)), 8)
    assert arr.shape == (8, 3) and pad == 3
    arr, pad = pad_to_multiple_of(np.ones((8, 3)), 8)
    assert pad == 0


def test_host_shard():
    items = list(range(10))
    assert host_shard(items, 0, 4) == [0, 4, 8]
    assert host_shard(items, 3, 4) == [3, 7]
    all_items = sorted(x for p in range(4) for x in host_shard(items, p, 4))
    assert all_items == items


def test_data_parallel_runner_matches_single_device(cpu_devices):
    mesh = make_mesh(devices=cpu_devices)
    w = np.arange(12, dtype=np.float32).reshape(4, 3)

    def fn(params, batch):
        return batch @ params

    runner = DataParallelRunner(mesh, fn)
    batch = np.random.default_rng(0).normal(size=(10, 4)).astype(np.float32)
    out = np.asarray(runner(w, batch))
    np.testing.assert_allclose(out, batch @ w, rtol=1e-5)
    assert out.shape == (10, 3)


def test_train_step_runs_and_reduces_loss(cpu_devices):
    mesh = make_mesh(devices=cpu_devices)
    vocab = 12
    model = Easter2(vocab_size=vocab, dtype=jnp.float32)
    optimizer = make_optimizer(learning_rate=1e-3, total_steps=100)
    state = init_train_state(model, optimizer, 32, 64)
    step = make_train_step(model, optimizer, mesh)

    batch = synthetic_ctc_batch(8, 32, 64, vocab)
    state_t = state.as_tuple()
    state_t, loss0 = step(state_t, batch)
    losses = [float(loss0)]
    for _ in range(4):
        state_t, loss = step(state_t, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # memorizes a fixed batch
    assert int(state_t[3]) == 5


def test_tp_shardings_shard_head_by_path_only(cpu_devices):
    """Only the head module's leaves get the model axis — matched by param
    path, so hidden layers whose width happens to equal the vocab size
    (here vocab 128 == Easter2 stem width 128) are never sharded."""
    mesh = make_mesh(devices=cpu_devices, model_parallel=2)
    vocab = 128  # collides with stem_features=128 on purpose
    model = Easter2(vocab_size=vocab, dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 64), jnp.float32), train=False
    )
    shardings = tp_shardings(mesh, variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(shardings)[0]
    sharded = [
        jax.tree_util.keystr(path)
        for path, s in flat
        if s.spec and s.spec[-1] == "model"
    ]
    assert sharded, "head leaves must be TP-sharded"
    for name in sharded:
        assert "Conv_0" in name, f"non-head leaf sharded: {name}"
    # both head kernel and bias covered
    assert any("kernel" in n for n in sharded)
    assert any("bias" in n for n in sharded)
    # a stem leaf with last dim == vocab stays replicated
    stem_leaves = [
        (path, s) for path, s in flat if "ConvBN1D_0" in jax.tree_util.keystr(path)
    ]
    assert stem_leaves
    assert all(s.spec == () or all(a is None for a in s.spec) for _, s in stem_leaves)


def test_dryrun_multichip_entrypoint(cpu_devices):
    """The driver's multichip dryrun must pass on the virtual CPU mesh."""
    import importlib.util
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    spec = importlib.util.spec_from_file_location(
        "graft_entry", root / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_train_step_single_device_equivalence():
    vocab = 8
    model = Easter2(vocab_size=vocab, dtype=jnp.float32)
    optimizer = make_optimizer()
    state = init_train_state(model, optimizer, 32, 64)
    step = make_train_step(model, optimizer, mesh=None)
    batch = synthetic_ctc_batch(4, 32, 64, vocab)
    _, loss = step(state.as_tuple(), batch)
    assert np.isfinite(float(loss))
