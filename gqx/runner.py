"""End-to-end training loop (the reference's ``main`` + ``train`` drivers,
reference main.py:79-213, re-designed around a single jitted step).

Log cadence parity: evaluate ``log_epoch`` times per epoch and emit ``loss`` /
``accuracy(%)`` at global step iteration*(epoch-1)+batch_idx
(reference main.py:183,197-211).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gqx.config import GQConfig, lr_at_epoch, resolve_schedule, wd_at_epoch
from gqx.data import Pipeline
from gqx.metrics import MetricLogger
from gqx.models import create_model
from gqx.train import create_train_state, evaluate, make_eval_step, make_train_step


def run_training(
    config: GQConfig,
    epochs_override: Optional[int] = None,
    max_steps: Optional[int] = None,
    progress: bool = True,
    resume: bool = False,
):
    """Train per the reference schedules; returns (state, final_accuracy).

    With ``resume=True`` and a checkpoint in ``config.logdir``, training
    restarts from the epoch after the checkpointed one with full state
    (params, BN stats, momentum, EF) — a capability the reference lacks
    (its main.py:170-172 is save-only)."""
    from gqx.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    epochs, base_lr, boundaries, lrs, _, initial_wd = resolve_schedule(config)
    if epochs_override is not None:
        epochs = epochs_override
    else:
        # reference quirk: the epoch loop is range(1, epochs + 2)
        # (reference main.py:159) — one extra epoch beyond the schedule table
        epochs = epochs + 1

    pipeline = Pipeline(config)
    model = create_model(config.network, config.num_classes, config.scan_blocks,
                         dtype=config.compute_dtype)

    sample = jnp.zeros((config.batch_size,) + pipeline.image_shape, jnp.float32)
    init_key = jax.random.PRNGKey(config.seed)

    if config.use_pallas is None:
        config.use_pallas = jax.default_backend() == "tpu"

    state, plan, tx = create_train_state(config, model, sample, init_key)

    start_epoch = 1
    if resume and config.logdir:
        from gqx.checkpoint import latest_checkpoint, restore_checkpoint

        ckpt = latest_checkpoint(config.logdir)
        if ckpt is not None:
            state = restore_checkpoint(ckpt, state)
            start_epoch = 1 + int(state.step) // max(1, pipeline.steps_per_epoch)
            if progress:
                print(f"resumed from {ckpt} at epoch {start_epoch}")

    to_global = jnp.asarray
    if config.backend == "mesh":
        from gqx.parallel.collectives import make_mesh_train_step, warn_chain_ring_scale

        warn_chain_ring_scale(config)
        train_step, state = make_mesh_train_step(config, model, plan, tx, state)
        if jax.process_count() > 1:
            # multi-host: every process computes the same global batch order
            # and contributes its local users' rows (SURVEY.md §2.10)
            import functools

            from gqx.parallel.distributed import global_user_batch

            to_global = functools.partial(global_user_batch, train_step.mesh)
    else:
        train_step = make_train_step(config, model, plan, tx)
    eval_step = make_eval_step(model)

    is_main = jax.process_index() == 0
    progress = progress and is_main
    logger = MetricLogger(config.logdir if is_main else None)

    # bytes-on-wire accounting (packed payload sizes, gqx.ops.wire) — the
    # reference only ever reports logical ratios (SURVEY.md §2.5)
    total_params = sum(int(p.size) for p in jax.tree.leaves(state.params))
    wire = plan.wire_bytes()
    logger.scalars(
        {"wire_bytes_per_user_step": wire,
         "compression_ratio_vs_fp32": (4.0 * total_params) / max(wire, 1)},
        0,
    )
    if progress:
        print(f"wire: {wire/1e6:.3f} MB/user/step "
              f"({4.0*total_params/max(wire,1):.1f}x vs fp32)")

    step_key = jax.random.PRNGKey(config.seed + 17)

    iteration = pipeline.steps_per_epoch
    accuracy = 0.0
    total_steps = 0
    # xprof trace of steady-state steps (skips step 1 = compile); the named
    # scopes in train.py/aggregate.py label fwd/bwd, encode/decode, reduce
    profile_at = 2 if config.profile_dir else None
    profiling = False
    t_start = time.time()

    for epoch in range(start_epoch, epochs + 1):
        lr = jnp.float32(lr_at_epoch(epoch, base_lr, boundaries, lrs))
        wd = jnp.float32(wd_at_epoch(epoch, initial_wd, boundaries))
        scale = jnp.float32(config.ef_scale(epoch))
        log_points = {
            iteration // config.log_epoch * (i + 1) for i in range(config.log_epoch)
        }
        for batch_idx, (x, y) in enumerate(pipeline.train_epoch(epoch)):
            step_key, k = jax.random.split(step_key)
            if profile_at is not None and total_steps + 1 == profile_at:
                jax.block_until_ready(state.params)
                jax.profiler.start_trace(config.profile_dir)
                profiling = True
            state, loss = train_step(state, to_global(x), to_global(y), scale, lr, wd, k)
            total_steps += 1
            if profiling and total_steps >= profile_at + config.profile_steps - 1:
                jax.block_until_ready(loss)
                jax.profiler.stop_trace()
                profiling, profile_at = False, None
                if progress:
                    print(f"xprof trace written to {config.profile_dir}")
            if (batch_idx + 1) in log_points:
                test_loss, accuracy = evaluate(
                    eval_step, state,
                    pipeline.test_batches(limit=config.eval_batch_count),
                )
                step = iteration * (epoch - 1) + batch_idx
                logger.scalars(
                    {"loss": float(loss), "accuracy(%)": accuracy * 100.0}, step
                )
                if progress:
                    print(
                        f"Train Epoch: {epoch} [{(batch_idx+1)*config.batch_size*config.num_users}/"
                        f"{pipeline.steps_per_epoch*config.batch_size*config.num_users}]\t"
                        f"Loss: {float(loss):.6f}\t Test Accuracy: {accuracy*100:.2f}%"
                    )
            if max_steps is not None and total_steps >= max_steps:
                break
        if config.save_model and config.logdir and is_main:
            from gqx.checkpoint import save_checkpoint

            save_checkpoint(config.logdir, state, step=int(state.step))
        if max_steps is not None and total_steps >= max_steps:
            break

    if profiling:
        jax.profiler.stop_trace()
    if progress:
        dt = time.time() - t_start
        print(f"done: {total_steps} steps in {dt:.1f}s ({total_steps/max(dt,1e-9):.2f} steps/s)")
    if config.save_model and config.logdir and is_main:
        from gqx.checkpoint import save_checkpoint

        save_checkpoint(config.logdir, state, step=int(state.step))
    logger.close()
    return state, accuracy
