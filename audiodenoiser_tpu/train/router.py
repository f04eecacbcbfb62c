"""Training for the noise-type router (models/router.NoiseClassifier).

The labeled stream comes straight from the on-device mixed pipeline
(``OnDeviceMixer.sample_labeled``): every step corrupts a fresh clean batch
with a per-example random corruption and keeps the corruption index as the
class label — no dataset files, no host round-trips; the whole
sample->corrupt->STFT->classify->update step is one compiled program.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from audiodenoiser_tpu.models.router import NoiseClassifier
from audiodenoiser_tpu.train.loop import TrainState, make_optimizer


def create_router_state(
    key: jax.Array,
    model: Optional[NoiseClassifier] = None,
    learning_rate: float = 1e-3,
    input_shape: tuple = (1, 256, 64, 1),
    **opt_kwargs,
) -> TrainState:
    model = NoiseClassifier() if model is None else model
    variables = jax.jit(
        lambda k: model.init(k, jnp.zeros(tuple(input_shape), jnp.float32))
    )(key)
    tx = make_optimizer(learning_rate, **opt_kwargs)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats={},  # GroupNorm: no running statistics
        opt_state=tx.init(variables["params"]),
        tx=tx,
        apply_fn=model.apply,
    )


def _logits_loss(state: TrainState, params, specs, labels):
    logits = state.apply_fn({"params": params}, specs)
    loss = optax.softmax_cross_entropy_with_integer_labels(
        logits, labels
    ).mean()
    acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
    return loss, acc


@partial(jax.jit, donate_argnums=0)
def router_train_step(state: TrainState, specs: jax.Array, labels: jax.Array):
    (loss, acc), grads = jax.value_and_grad(
        lambda p: _logits_loss(state, p, specs, labels), has_aux=True
    )(state.params)
    updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return (
        state.replace(step=state.step + 1, params=new_params, opt_state=new_opt),
        loss,
        acc,
    )


@jax.jit
def router_eval_step(state: TrainState, specs: jax.Array, labels: jax.Array):
    return _logits_loss(state, state.params, specs, labels)


def fit_router(
    mixer,
    steps: int = 600,
    batch_size: int = 64,
    learning_rate: float = 1e-3,
    key: Optional[jax.Array] = None,
    log_every: int = 100,
    log=print,
) -> tuple[TrainState, float]:
    """Train a router on ``mixer`` (must be ``noise_type='mixed'``).

    Returns ``(state, held_out_accuracy)`` where accuracy is measured on
    fresh (never-trained) labeled batches.
    """
    key = jax.random.key(0) if key is None else key
    state = create_router_state(jax.random.fold_in(key, 0),
                                learning_rate=learning_rate)
    for step in range(steps):
        noisy, _, labels = mixer.sample_labeled(
            jax.random.fold_in(key, 1 + step), batch_size
        )
        state, loss, acc = router_train_step(state, noisy, labels)
        if log_every and (step + 1) % log_every == 0:
            log(f"router step {step + 1}/{steps}: "
                f"loss {float(loss):.4f} acc {float(acc):.3f}")
    # held-out accuracy on a disjoint key stream
    accs = []
    for i in range(4):
        noisy, _, labels = mixer.sample_labeled(
            jax.random.fold_in(key, 10_000_000 + i), batch_size
        )
        _, acc = router_eval_step(state, noisy, labels)
        accs.append(float(acc))
    return state, float(jnp.mean(jnp.asarray(accs)))
