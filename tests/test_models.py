"""Model-zoo tests: forward shapes and exact parameter-count parity with the
reference architectures (counts measured from the reference torch models;
SURVEY.md §2.6 calls out CIFAR-ResNet fidelity as convergence-critical)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gqx.models import create_model

# (network, input shape NHWC, total trainable params in the reference torch model)
CASES = [
    ("fcn", (2, 28, 28, 1), 203530),
    ("cnn", (2, 28, 28, 1), 431080),
    ("resnet18", (2, 32, 32, 3), 11173962),
    ("resnet34", (2, 32, 32, 3), 21282122),
    ("resnet50", (2, 32, 32, 3), 23520842),
    ("vgg11", (2, 32, 32, 3), 9231114),
    ("vgg16", (2, 32, 32, 3), 14728266),
    ("dense", (2, 32, 32, 3), 1000618),
]


def param_count(params):
    return sum(int(p.size) for p in jax.tree.leaves(params))


@pytest.mark.parametrize("name,shape,want_params", CASES)
def test_forward_shape_and_param_count(name, shape, want_params):
    model = create_model(name, num_classes=10)
    x = jnp.zeros(shape, jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (shape[0], 10)
    assert param_count(variables["params"]) == want_params


def test_batchnorm_stats_update():
    model = create_model("resnet18", num_classes=10)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=True)
    assert "batch_stats" in variables
    out, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    # running stats must actually move
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_scan_blocks_resnet_equivalent_structure():
    """scan_blocks traces repeated blocks once; parameter totals and the
    per-layer passthrough/compressed split must match the unscanned layout."""
    from gqx.config import GQConfig
    from gqx.parallel.packing import plan_units

    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    cfg = GQConfig(quantizer="hsq", c_dim=16, k_bit=8, n_bit=6, dataset="synthetic")

    totals = {}
    for scan in (False, True):
        model = create_model("resnet50", 10, scan_blocks=scan)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        assert param_count(variables["params"]) == 23520842
        plan = plan_units(variables["params"], cfg)
        compressed = sum(
            u.size for u in plan.units
            if type(u.compressor).__name__ != "IdenticalCompressor"
        )
        totals[scan] = compressed
        out = model.apply(variables, x, train=False)
        assert out.shape == (1, 10)
    # same number of compressed elements in both layouts
    assert totals[False] == totals[True], totals


def test_big_models_construct():
    for name in ("resnet101", "resnet152", "vgg13", "vgg19"):
        model = create_model(name, num_classes=100)
        x = jnp.zeros((1, 32, 32, 3), jnp.float32)
        variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x, train=False))
        assert "params" in variables


@pytest.mark.parametrize("name", ["fcn", "resnet18", "vgg11", "dense"])
def test_bfloat16_compute_keeps_fp32_params(name):
    """bfloat16 compute dtype: params (and therefore gradients feeding the
    compression pipeline) stay float32; logits are cast back to float32 and
    stay close to the fp32 forward."""
    shape = (2, 28, 28, 1) if name == "fcn" else (2, 32, 32, 3)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(shape), jnp.float32)

    m32 = create_model(name, num_classes=10)
    mbf = create_model(name, num_classes=10, dtype="bfloat16")
    v = m32.init(jax.random.PRNGKey(0), x, train=False)
    vb = mbf.init(jax.random.PRNGKey(0), x, train=False)
    for p in jax.tree.leaves(vb["params"]):
        assert p.dtype == jnp.float32
    # identical init given identical keys
    for a, b in zip(jax.tree.leaves(v["params"]), jax.tree.leaves(vb["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    out32 = m32.apply(v, x, train=False)
    outbf = mbf.apply(vb, x, train=False)
    assert outbf.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out32), np.asarray(outbf), atol=0.15, rtol=0.1)

    # gradients are float32 (compression pipeline contract)
    def loss_fn(params):
        out = mbf.apply({**vb, "params": params}, x, train=False)
        return jnp.mean(out.astype(jnp.float32) ** 2)

    grads = jax.grad(loss_fn)(vb["params"])
    for g in jax.tree.leaves(grads):
        assert g.dtype == jnp.float32
