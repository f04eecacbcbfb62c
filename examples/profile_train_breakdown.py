"""Wall-clock decomposition of the donated training step.

``bench.py`` reports one aggregate number for the train step (157 ms /
111 TFLOP/s at batch 256 in round 3 — ~56% of v5e bf16 peak, vs 62% for
inference). This harness answers *where the training milliseconds go* by
timing a nested ladder of separately-jitted programs at the exact shapes
``train_step`` runs (train/loop.py:139-151):

  1. eval forward            model.apply(train=False)
  2. train forward + loss    same graph + BN batch-stat mutation + the
                             combined perceptual loss (losses/spectral.py)
  3. forward + backward      jax.value_and_grad of (2)
  4. full train step         (3) + AdamW + global-norm clip + param update

Differences between rungs isolate each phase: (2)-(1) = loss+BN-update
cost, (3)-(2) = backward pass, (4)-(3) = optimizer. Each rung is one
compiled XLA program, so the deltas reflect what fusion actually buys —
not Python overhead. Ladder steps are *not* donated (the full step is),
so rung 4 vs the bench's own train_step number also shows what donation
is worth.

The reference decomposes nothing — its loop is opaque module calls
(``/root/reference/code/train.py:61-76``), and its per-sample mel-loss
Python loop (``loss.py:60-65``) would dominate any such profile.

Usage: python examples/profile_train_breakdown.py [--batch_size 256]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


_probe = jax.jit(lambda a: jnp.real(a).ravel()[0])


def _barrier(out):
    # host scalar fetch via a separate cached program: reliable completion
    # barrier on the axon relay where block_until_ready can return early
    # (same pattern as examples/profile_breakdown.py)
    return float(_probe(jax.tree_util.tree_leaves(out)[0]))


def timed(fn, *args, iters=10, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _barrier(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _barrier(out)
    return (time.perf_counter() - t0) / iters


def _flops(lowerable, *args):
    try:
        cost = jax.jit(lowerable).lower(*args).compile().cost_analysis()
        if cost:
            return float(cost.get("flops", 0.0)) or None
    except Exception:
        pass
    return None


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args(argv)

    from audiodenoiser_tpu.utils.backend import require_device
    from audiodenoiser_tpu.utils.cache import enable_persistent_cache

    require_device(who="profile_train_breakdown")
    enable_persistent_cache()

    from audiodenoiser_tpu.losses import combined_perceptual_loss
    from audiodenoiser_tpu.models import UNet
    from audiodenoiser_tpu.train.loop import create_train_state, train_step

    model = UNet(dtype=jnp.bfloat16)
    state = create_train_state(jax.random.key(0), model,
                               input_shape=(1, 256, 64, 1))
    rng = np.random.default_rng(0)
    b = args.batch_size
    noisy = jnp.asarray(np.abs(rng.standard_normal((b, 256, 64, 1))),
                        jnp.float32)
    clean = noisy * 0.8

    params, batch_stats, tx, opt_state = (
        state.params, state.batch_stats, state.tx, state.opt_state
    )

    # rung 1: eval forward
    def fwd_eval(p_, x):
        return model.apply({"params": p_, "batch_stats": batch_stats},
                           x, train=False)

    # rung 2: train forward + loss (BN stats mutated, like training)
    def fwd_loss(p_, x, y):
        out, mutated = model.apply(
            {"params": p_, "batch_stats": batch_stats},
            x, train=True, mutable=["batch_stats"],
        )
        losses = combined_perceptual_loss(out, y)
        return losses.total, mutated["batch_stats"]

    # rung 3: forward + backward
    def fwd_bwd(p_, x, y):
        (total, bs), grads = jax.value_and_grad(
            fwd_loss, has_aux=True)(p_, x, y)
        return total, bs, grads

    # rung 4: full step (not donated — the delta vs bench train_step shows
    # what donation buys)
    def full_step(p_, o_, x, y):
        (total, bs), grads = jax.value_and_grad(
            fwd_loss, has_aux=True)(p_, x, y)
        updates, new_o = tx.update(grads, o_, p_)
        import optax

        new_p = optax.apply_updates(p_, updates)
        return total, bs, new_p, new_o

    rows = []

    def rung(name, fn, *a):
        jfn = jax.jit(fn)
        jfn(*a)  # compile
        dt = timed(jfn, *a, iters=args.iters)
        fl = _flops(fn, *a)
        rows.append((name, dt, fl))
        print(f"  measured {name}: {dt*1e3:.2f} ms", flush=True)
        return dt

    t1 = rung("1 eval forward", fwd_eval, params, noisy)
    t2 = rung("2 train fwd + loss + BN", fwd_loss, params, noisy, clean)
    t3 = rung("3 fwd + bwd", fwd_bwd, params, noisy, clean)
    t4 = rung("4 fwd + bwd + AdamW (undonated)", full_step,
              params, opt_state, noisy, clean)

    # the production step, donated, exactly as the bench measures it
    st = state
    for _ in range(2):
        st, losses = train_step(st, noisy, clean)
    float(losses.total)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        st, losses = train_step(st, noisy, clean)
    float(losses.total)
    t5 = (time.perf_counter() - t0) / args.iters
    rows.append(("5 production train_step (donated)", t5, None))
    print(f"  measured 5 production train_step: {t5*1e3:.2f} ms", flush=True)

    print(f"\n{'program':<38} {'ms':>8} {'TFLOP/s':>9} {'%peak':>6}")
    for name, dt, fl in rows:
        tf = f"{fl/dt/1e12:9.1f}" if fl else f"{'—':>9}"
        pk = f"{100*fl/dt/1e12/197:6.1f}" if fl else f"{'—':>6}"
        print(f"{name:<38} {dt*1e3:8.2f} {tf} {pk}")

    print("\nphase deltas (ladder differences):")
    print(f"  loss + BN-update     {1e3*(t2-t1):8.2f} ms")
    print(f"  backward pass        {1e3*(t3-t2):8.2f} ms")
    print(f"  AdamW + clip + apply {1e3*(t4-t3):8.2f} ms")
    print(f"  donation saves       {1e3*(t4-t5):8.2f} ms "
          f"({100*(t4-t5)/t4:.0f}% of the undonated step)")


if __name__ == "__main__":
    main()
