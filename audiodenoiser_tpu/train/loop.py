"""Jitted training loop with mesh-aware data parallelism.

Capability-parity with ``/root/reference/code/train.py`` — AdamW(lr=1e-4,
torch defaults), global-norm grad clipping at 1.0 (``train.py:70,124``),
90/10 split, per-epoch train/val averages, TensorBoard scalars, best-val
checkpointing — redesigned as a single donated jitted step:

- forward + combined loss + backward + clip + AdamW update + BatchNorm
  running-stat update all compile into ONE XLA program (the reference
  launches the mel loss per-sample from Python, ``loss.py:60-65``, and syncs
  ``loss.item()`` every batch, ``train.py:72``);
- input batches can come from disk (``SpectrogramPairs``) or be synthesized
  on device (``OnDeviceMixer``) with zero host traffic;
- when a ``jax.sharding.Mesh`` is supplied, the batch is sharded over the
  ``data`` axis and parameters follow the rules in
  ``audiodenoiser_tpu.parallel`` — XLA inserts the gradient all-reduce over
  ICI (SURVEY.md §2 parallelism plan).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from audiodenoiser_tpu.losses import CombinedLossOutput, combined_perceptual_loss
from audiodenoiser_tpu.models import UNet
from audiodenoiser_tpu.train import checkpoints as ckpt_lib
from audiodenoiser_tpu.train.logging_utils import ScalarWriter, setup_logger


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)


def make_optimizer(
    learning_rate: float,
    weight_decay: float = 0.01,
    clip_norm: float = 1.0,
    schedule: str = "constant",
    warmup_steps: int = 0,
    total_steps: int = 0,
    grad_accum: int = 1,
) -> optax.GradientTransformation:
    """clip_by_global_norm(1.0) -> AdamW with torch defaults.

    torch.optim.AdamW defaults (train.py:124): betas (0.9, 0.999), eps 1e-8,
    weight_decay 0.01 applied to ALL parameters (torch does not exempt
    norm/bias params, so neither do we). The reference uses a constant LR;
    ``schedule='cosine'`` (with optional linear warmup) and micro-batch
    gradient accumulation are production extensions.
    """
    if schedule == "constant":
        lr = (
            optax.linear_schedule(0.0, learning_rate, warmup_steps)
            if warmup_steps
            else learning_rate
        )
    elif schedule == "cosine":
        if total_steps <= 0:
            raise ValueError("cosine schedule requires total_steps > 0")
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=learning_rate,
            warmup_steps=max(1, warmup_steps),
            decay_steps=total_steps,
        )
    else:
        raise ValueError(f"unknown schedule {schedule!r}")
    tx = optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay),
    )
    if grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum)
    return tx


@partial(jax.jit, static_argnames=("model", "input_shape"))
def init_variables(model, key: jax.Array, input_shape: tuple):
    """Jit-cached model init: flax Modules hash by configuration, so
    re-creating the same architecture reuses the compiled initializer
    instead of re-tracing per call site."""
    return model.init(key, jnp.zeros(input_shape, jnp.float32), train=False)


def create_train_state(
    key: jax.Array,
    model: UNet | None = None,
    learning_rate: float = 1e-4,
    weight_decay: float = 0.01,
    clip_norm: float = 1.0,
    input_shape: tuple = (1, 256, 64, 1),
    **opt_kwargs,
) -> TrainState:
    model = UNet() if model is None else model
    variables = init_variables(model, key, tuple(input_shape))
    tx = make_optimizer(learning_rate, weight_decay, clip_norm, **opt_kwargs)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        tx=tx,
        apply_fn=model.apply,
    )


def _loss_and_updates(state: TrainState, noisy, clean):
    def loss_fn(params):
        out, mutated = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            noisy,
            train=True,
            mutable=["batch_stats"],
        )
        losses = combined_perceptual_loss(out, clean)
        return losses.total, (losses, mutated["batch_stats"])

    (_, (losses, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    return losses, new_bs, grads


@partial(jax.jit, donate_argnums=0)
def train_step(state: TrainState, noisy: jax.Array, clean: jax.Array):
    losses, new_bs, grads = _loss_and_updates(state, noisy, clean)
    updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = state.replace(
        step=state.step + 1,
        params=new_params,
        batch_stats=new_bs,
        opt_state=new_opt,
    )
    return new_state, losses


@jax.jit
def eval_step(state: TrainState, noisy: jax.Array, clean: jax.Array):
    out = state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        noisy,
        train=False,
    )
    return combined_perceptual_loss(out, clean)


@dataclass
class FitConfig:
    run_name: str = ""
    output_path: str = "./training_outputs_unet"
    epochs: int = 50
    batch_size: int = 16
    learning_rate: float = 1e-4
    val_split: float = 0.1
    seed: int = 0
    precision: str = "bf16"  # "bf16" | "f32"
    resume: bool = False
    steps_per_epoch: int | None = None  # only for on-device pipeline mode
    log_every: int = 50
    lr_schedule: str = "constant"  # "constant" | "cosine"
    warmup_steps: int = 0
    total_steps: int = 0  # required for cosine decay
    grad_accum: int = 1
    remat: bool = False
    model_parallel: int = 1
    use_mesh: bool | None = None  # None: auto (mesh iff >1 device visible)
    fsdp: bool = False  # shard params + optimizer state over the data axis
    ckpt_every: int = 1  # write the orbax resume state every N epochs
    # (plus always after the final epoch). On a slow-IO host the full-state
    # save can dominate short epochs; best-model exports are unaffected.
    ema_decay: float | None = None  # e.g. 0.999: track an exponential
    # moving average of the params, validate it each epoch, and export the
    # best-EMA checkpoint alongside the raw best
    width_mult: float = 1.0  # channel-width multiplier for the compact
    # student family (models.unet.scaled_widths); 1.0 is the reference
    # 31 M-param architecture
    attn_bottleneck: bool = False  # insert the residual self-attention
    # block after the bottleneck (models.unet.BottleneckAttention);
    # recorded in the checkpoint sidecar like width_mult
    s2d_stem: bool = False  # space-to-depth stem + sub-pixel head (the
    # first U-Net level runs at half spatial resolution); recorded in
    # the checkpoint sidecar like width_mult
    s2d_skip: int = 0  # with s2d_stem: width of the full-resolution
    # refinement path (models.unet.UNet.s2d_skip); sidecar-recorded
    extra_config: dict = field(default_factory=dict)


@partial(jax.jit, donate_argnums=0)
def _ema_update(ema, params, decay):
    """ema <- decay*ema + (1-decay)*params (production smoothing; the
    reference has no equivalent). ``decay`` is traced so one compile
    serves any setting."""
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p.astype(e.dtype), ema, params
    )


def _epoch_mean(losses: list[CombinedLossOutput]) -> float:
    return float(np.mean([float(l.total) for l in losses])) if losses else float("nan")


def fit(
    config: FitConfig,
    train_batches: Callable[[int], Iterator[tuple[np.ndarray, np.ndarray]]],
    val_batches: Callable[[], Iterator[tuple[np.ndarray, np.ndarray]]],
    state_factory: Callable[[], "TrainState"] | None = None,
    steps: tuple[Callable, Callable] | None = None,
) -> dict:
    """Run the training loop; returns a summary dict.

    ``train_batches(epoch)`` / ``val_batches()`` yield (noisy, clean) NHWC
    arrays — either host batches (disk datasets) or device arrays (the
    on-device mixer). Follows the reference loop structure (train.py:129-147):
    per-epoch train + validate, TB scalars, best-val export.
    """
    run_name = config.run_name or f"UNET_Run_{int(time.time())}"
    run_dir = os.path.join(config.output_path, run_name)
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    logger = setup_logger(os.path.join(run_dir, "training.log"))
    logger.info(f"--- Starting U-NET Run: {run_name} ---")
    cfg_dump = {**config.__dict__}
    cfg_dump.pop("extra_config", None)
    cfg_dump.update(config.extra_config)
    logger.info(f"Full configuration: \n{json.dumps(cfg_dump, indent=2, default=str)}")
    logger.info(f"Using device: {jax.devices()[0]}")

    # Device mesh (SURVEY.md §2 parallelism plan): shard the batch over
    # 'data' and wide conv kernels over 'model'; XLA SPMD inserts the
    # gradient all-reduce / channel collectives over ICI. On one chip this
    # degenerates to no mesh at all — identical program to round 1.
    use_mesh = (
        config.use_mesh
        if config.use_mesh is not None
        else (jax.device_count() > 1 or config.model_parallel > 1)
    )
    mesh = None
    if use_mesh:
        from audiodenoiser_tpu.parallel import (
            make_mesh,
            shard_batch,
            shard_train_state,
        )

        mesh = make_mesh(model_parallel=max(1, config.model_parallel))
        logger.info(f"Device mesh: {dict(mesh.shape)}")

    def place(x):
        """Shard a (noisy|clean) batch over the data axis, wrap-padding a
        ragged final batch up to a multiple of the axis size (the padded
        rows re-use leading samples; epoch means already weight per-batch,
        so the bias matches the existing ragged-batch averaging)."""
        x = jnp.asarray(x)
        if mesh is None:
            return x
        d = mesh.shape["data"]
        target = -(-x.shape[0] // d) * d
        if target != x.shape[0]:
            x = x[jnp.arange(target) % x.shape[0]]
        return shard_batch(x, mesh)

    step_fn, eval_fn = steps if steps is not None else (train_step, eval_step)
    if state_factory is not None:
        state = state_factory()
    else:
        from audiodenoiser_tpu.models.unet import width_kwargs

        model = UNet(
            dtype=jnp.bfloat16 if config.precision == "bf16" else jnp.float32,
            remat=config.remat,
            # only pass when set: keeps the default construction signature
            # stable for callers/tests that substitute a narrower model
            **({"attn_bottleneck": True} if config.attn_bottleneck else {}),
            **({"s2d_stem": True} if config.s2d_stem else {}),
            **({"s2d_skip": config.s2d_skip} if config.s2d_skip else {}),
            **width_kwargs(config.width_mult),
        )
        state = create_train_state(
            jax.random.key(config.seed),
            model,
            learning_rate=config.learning_rate,
            schedule=config.lr_schedule,
            warmup_steps=config.warmup_steps,
            total_steps=config.total_steps,
            grad_accum=config.grad_accum,
        )
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(state.params))
    logger.info(f"U-NET Model initialized. Trainable parameters: {n_params:,}")
    if mesh is not None:
        state = shard_train_state(state, mesh, fsdp=config.fsdp)

    start_epoch = 0
    best_val = float("inf")
    ema_params = None
    best_ema_val = float("inf")
    resumed_step = 0
    did_restore = False
    resume_dir = os.path.join(ckpt_dir, "train_state")
    if config.resume and os.path.exists(resume_dir):
        did_restore = True
        saved = ckpt_lib.saved_keys(resume_dir)

        def try_restore(with_ema: bool, with_step: bool):
            template = {
                "state": jax.device_get(state),
                "epoch": 0,
                "best_val": 0.0,
            }
            if with_ema:
                template["ema"] = jax.device_get(state.params)
                template["best_ema_val"] = 0.0
            if with_step:
                template["global_step"] = 0
            return ckpt_lib.restore_train_state(resume_dir, template)

        # checkpoints written with --ema_decay carry the EMA average; pick
        # the matching template by inspecting the checkpoint's saved keys
        # (orbax metadata) so a genuine restore failure surfaces instead of
        # being swallowed by a blanket fallback (ADVICE r2)
        restored = try_restore("ema" in saved, "global_step" in saved)
        state = restored["state"]
        if mesh is not None:
            state = shard_train_state(state, mesh, fsdp=config.fsdp)
        start_epoch = int(restored["epoch"]) + 1
        best_val = float(restored["best_val"])
        resumed_step = int(restored.get("global_step", 0))
        if config.ema_decay and "ema" in restored:
            ema_params = jax.tree_util.tree_map(jnp.asarray, restored["ema"])
            best_ema_val = float(restored["best_ema_val"])
        logger.info(f"Resumed from epoch {start_epoch} (best val {best_val:.6f})")

    writer = ScalarWriter(os.path.join(run_dir, "tensorboard_logs"))
    best_path = os.path.join(ckpt_dir, "best_model.ckpt")
    best_ema_path = os.path.join(ckpt_dir, "best_model_ema.ckpt")
    if did_restore:
        # the restored best_val can be stale relative to an already-written
        # better export (--ckpt_every); the sidecar keeps it honest.
        # Applied only after an ACTUAL restore — a fresh start must not
        # inherit a floor from some earlier run's sidecar, which may be on
        # a different loss scale and would suppress every export.
        best_val = ckpt_lib.best_val_floor(best_path, best_val)
        best_ema_val = ckpt_lib.best_val_floor(best_ema_path, best_ema_val)
    if config.ema_decay:
        if ema_params is None:
            ema_params = jax.tree_util.tree_map(lambda p: p + 0, state.params)
        ema_decay = jnp.float32(config.ema_decay)

    logger.info("--- Starting Training Loop ---")
    history = []
    exported_best = False
    exported_best_ema = False
    global_step = resumed_step  # TB step series stays monotonic on resume
    for epoch in range(start_epoch, config.epochs):
        t0 = time.perf_counter()
        # reset per-epoch so the first steps/s figure doesn't amortize the
        # previous epoch's validation + checkpoint time; count the steps
        # actually timed so the figure stays honest when log_every does
        # not divide steps_per_epoch (or after a misaligned resume)
        log_t0 = t0
        steps_since_log = 0
        train_losses = []
        for noisy, clean in train_batches(epoch):
            state, losses = step_fn(state, place(noisy), place(clean))
            train_losses.append(losses)
            if ema_params is not None:
                ema_params = _ema_update(ema_params, state.params, ema_decay)
            global_step += 1
            steps_since_log += 1
            if config.log_every and global_step % config.log_every == 0:
                # intra-epoch progress (the reference shows a tqdm bar per
                # batch, train.py:64,82): running loss + steps/s every
                # log_every steps. float() fetch doubles as the only host
                # sync in the hot loop.
                now = time.perf_counter()
                sps = steps_since_log / max(now - log_t0, 1e-9)
                log_t0 = now
                steps_since_log = 0
                running = float(losses.total)
                writer.add_scalar("Loss/train_batch", running, global_step)
                logger.info(
                    f"  step {global_step} (epoch {epoch + 1}) | "
                    f"loss {running:.6f} | {sps:.1f} steps/s"
                )
        train_loss = _epoch_mean(train_losses)
        writer.add_scalar("Loss/train", train_loss, epoch)

        val_losses = []
        for noisy, clean in val_batches():
            val_losses.append(eval_fn(state, place(noisy), place(clean)))
        val_loss = _epoch_mean(val_losses)
        if not val_losses:
            # empty validation split (tiny dataset): fall back to the train
            # loss as the checkpoint-selection criterion
            logger.warning("Validation split is empty; using train loss for selection.")
            val_loss = train_loss
        writer.add_scalar("Loss/validation", val_loss, epoch)

        ema_val = None
        if ema_params is not None:
            ema_state = state.replace(params=ema_params)
            ema_losses = [
                eval_fn(ema_state, place(noisy), place(clean))
                for noisy, clean in val_batches()
            ]
            ema_val = _epoch_mean(ema_losses) if ema_losses else val_loss
            writer.add_scalar("Loss/validation_ema", ema_val, epoch)

        dt = time.perf_counter() - t0
        logger.info(
            f"Epoch {epoch + 1}/{config.epochs} -> Train Loss: {train_loss:.6f} | "
            f"Validation Loss: {val_loss:.6f}"
            + (f" | EMA Val Loss: {ema_val:.6f}" if ema_val is not None else "")
            + f" | {dt:.1f}s"
        )
        if not np.isfinite(train_loss):
            # failure detection (SURVEY.md §5): stop before writing a
            # poisoned checkpoint; the last good orbax state allows --resume
            logger.error("Non-finite training loss; aborting run.")
            raise FloatingPointError(
                f"training diverged at epoch {epoch} (loss={train_loss})"
            )
        history.append({"epoch": epoch, "train": train_loss, "val": val_loss})

        if val_loss < best_val:
            best_val = val_loss
            ckpt_lib.export_model(
                best_path, jax.device_get(state.params), jax.device_get(state.batch_stats)
            )
            ckpt_lib.record_best_val(best_path, best_val, epoch)
            exported_best = True
            logger.info(
                f"New best model saved to {best_path} (Val Loss: {best_val:.6f})"
            )
        if ema_val is not None and ema_val < best_ema_val:
            best_ema_val = ema_val
            ckpt_lib.export_model(
                best_ema_path,
                jax.device_get(ema_params),
                jax.device_get(state.batch_stats),
            )
            ckpt_lib.record_best_val(best_ema_path, best_ema_val, epoch)
            exported_best_ema = True
            logger.info(
                f"New best EMA model saved to {best_ema_path} "
                f"(EMA Val Loss: {best_ema_val:.6f})"
            )
        if (
            (epoch + 1) % max(1, config.ckpt_every) == 0
            or epoch == config.epochs - 1
        ):
            payload = {
                "state": jax.device_get(state),
                "epoch": epoch,
                "best_val": best_val,
                "global_step": global_step,
            }
            if ema_params is not None:
                payload["ema"] = jax.device_get(ema_params)
                payload["best_ema_val"] = best_ema_val
            ckpt_lib.save_train_state(resume_dir, payload)

    writer.close()
    logger.info("--- Training Finished ---")
    logger.info(f"Final best model saved at: {best_path}")
    result = {
        "best_val": best_val,
        "best_path": best_path,
        "run_dir": run_dir,
        "history": history,
        "state": state,
        # False when a resumed run never beat the restored best: the ckpt
        # on disk is from an EARLIER run and callers must not re-stamp it
        # with this run's hyperparameters (mask sidecar)
        "exported_best": exported_best,
    }
    if config.ema_decay:
        result["best_ema_val"] = best_ema_val
        result["best_ema_path"] = best_ema_path
        result["exported_best_ema"] = exported_best_ema
    return result
