"""End-to-end training tests: the synthetic-data FCN slice must converge
under each aggregation mode (the reference validates by convergence curves —
SURVEY.md §4; here it's an automated assertion), plus checkpoint roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gqx.checkpoint import restore_checkpoint, save_checkpoint
from gqx.config import GQConfig
from gqx.data import Pipeline
from gqx.models import create_model
from gqx.runner import run_training
from gqx.train import create_train_state, evaluate, make_eval_step, make_train_step


def small_cfg(**kw):
    base = dict(
        network="fcn",
        dataset="synthetic",
        quantizer="qsgd",
        mode="ps",
        c_dim=128,
        n_bit=4,
        num_users=4,
        batch_size=16,
        test_batch_size=256,
        seed=3,
        log_epoch=1,
        eval_batch_count=2,
    )
    base.update(kw)
    return GQConfig(**base)


def test_fcn_synthetic_learns_qsgd():
    cfg = small_cfg()
    state, acc = run_training(cfg, epochs_override=3, progress=False)
    # synthetic data is template+noise: 10-class accuracy must beat chance by a lot
    assert acc > 0.5, f"accuracy {acc}"


def test_fcn_synthetic_learns_hsq_ring_ef():
    cfg = small_cfg(quantizer="hsq", mode="ring", c_dim=16, k_bit=6, n_bit=6, ef=True)
    state, acc = run_training(cfg, epochs_override=3, progress=False)
    assert acc > 0.5, f"accuracy {acc}"


def test_resnet_one_step_runs():
    cfg = small_cfg(network="resnet18", quantizer="hsq", c_dim=16, k_bit=6, n_bit=6,
                    num_users=2, batch_size=4)
    state, acc = run_training(cfg, epochs_override=1, max_steps=1, progress=False)
    assert np.all(np.isfinite(np.asarray(jax.tree.leaves(state.params)[0])))


def test_checkpoint_roundtrip(tmp_path):
    cfg = small_cfg()
    pipeline = Pipeline(cfg)
    model = create_model(cfg.network, cfg.num_classes)
    sample = jnp.zeros((cfg.batch_size,) + pipeline.image_shape, jnp.float32)
    state, comps, tx = create_train_state(cfg, model, sample, jax.random.PRNGKey(0))
    path = save_checkpoint(str(tmp_path), state, step=0)
    # mutate, then restore into the template
    state2 = state._replace(params=jax.tree.map(lambda p: p + 1.0, state.params))
    restored = restore_checkpoint(path, state2)
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sign_sgd_schedule_applied():
    from gqx.config import resolve_schedule

    cfg = small_cfg(quantizer="sign")
    epochs, base_lr, boundaries, lrs, momentum, wd = resolve_schedule(cfg)
    # reference main.py:149-157
    assert (base_lr, momentum, wd) == (1e-3, 0.0, 0.1)
    assert boundaries == (51, 71) and lrs == (0.0005, 0.0001)


def test_wd_rehardcoded_at_boundaries():
    """Reference quirk (main.py:160-163): every LR-boundary optimizer swap
    sets weight_decay=5e-4, even for SignSGD whose initial wd is 0.1."""
    from gqx.config import wd_at_epoch

    assert wd_at_epoch(1, 0.1, (51, 71)) == 0.1
    assert wd_at_epoch(50, 0.1, (51, 71)) == 0.1
    assert wd_at_epoch(51, 0.1, (51, 71)) == 5e-4
    assert wd_at_epoch(120, 0.1, (51, 71)) == 5e-4
    # mnist: no boundaries -> wd never changes
    assert wd_at_epoch(20, 5e-4, ()) == 5e-4


def test_num_classes_user_override():
    """--num-classes beats the dataset registry (reference main.py:85),
    while the default resolves from the dataset (main.py:61-76)."""
    from gqx.config import GQConfig

    assert GQConfig(dataset="cifar100").num_classes == 100
    assert GQConfig(dataset="cifar100", num_classes=7).num_classes == 7
    from gqx.cli import build_parser, config_from_args

    args = build_parser().parse_args(["--dataset", "cifar100"])
    assert config_from_args(args).num_classes == 100
    args = build_parser().parse_args(["--dataset", "cifar100", "--num-classes", "7"])
    assert config_from_args(args).num_classes == 7
