"""Determinism checks (SURVEY §5.2): the TPU build's answer to race
detection is bit-identical outputs across runs and across shardings."""

import jax
import jax.numpy as jnp
import numpy as np

from ocr_inference_tpu.models import Easter2
from ocr_inference_tpu.models.params import init_recognizer
from ocr_inference_tpu.parallel import DataParallelRunner, make_mesh


def test_forward_bit_identical_across_runs():
    model = Easter2(vocab_size=16, dtype=jnp.float32)
    variables = init_recognizer(model, 32, 128)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 32, 128)).astype(np.float32)
    )
    f = jax.jit(lambda v, a: model.apply(v, a, train=False))
    out1 = np.asarray(f(variables, x))
    out2 = np.asarray(f(variables, x))
    np.testing.assert_array_equal(out1, out2)


def test_forward_equivalent_across_shardings(cpu_devices):
    """Same batch, 1-device vs 8-device data-parallel: numerically
    equivalent logits. (Bit-identity is NOT expected across different
    shardings — XLA fuses/reassociates differently per shard shape; the
    guarantee is identity across runs of the same program plus float-level
    agreement across shardings.)"""
    model = Easter2(vocab_size=12, dtype=jnp.float32)
    variables = init_recognizer(model, 32, 64)
    batch = np.random.default_rng(1).normal(size=(8, 32, 64)).astype(np.float32)

    def fwd(v, x):
        return model.apply(v, x, train=False)

    single = np.asarray(jax.jit(fwd)(variables, batch))

    mesh = make_mesh(devices=cpu_devices)
    runner = DataParallelRunner(mesh, fwd)
    sharded = np.asarray(runner(variables, batch))
    np.testing.assert_allclose(single, sharded, rtol=2e-3, atol=2e-5)


def test_greedy_decode_deterministic():
    from ocr_inference_tpu.decode import greedy_decode

    logits = np.random.default_rng(2).normal(size=(4, 50, 20)).astype(np.float32)
    a = greedy_decode(jnp.asarray(logits))
    b = greedy_decode(jnp.asarray(logits))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
