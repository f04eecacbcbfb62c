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

``--per_stage`` adds a second table: each DoubleConv level's standalone
train-mode forward AND backward (jax.grad wrt params+input of a scalar
head, BN batch stats mutating like training) at the exact train-step
shapes, with analytic conv FLOPs (bwd = 2x fwd: dgrad + wgrad) and a
roofline bound per stage — the backward analogue of
examples/profile_breakdown.py, used to locate/prove where the measured
~54%-of-peak backward loses vs the ~69% forward.

Usage: python examples/profile_train_breakdown.py [--batch_size 256]
       [--per_stage]
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


def per_stage_backward(b: int, iters: int):
    """Forward vs backward wall per DoubleConv level at train shapes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from audiodenoiser_tpu.models.unet import DoubleConv

    PEAK, BW = 197e12, 819e9
    shapes = []  # (name, h, w, cin, feats) at the (256, 64) train crop
    h, w, cin = 256, 64, 1
    for i, f in enumerate((64, 128, 256, 512)):
        shapes.append((f"down{i}", h, w, cin, f))
        h, w, cin = h // 2, w // 2, f
    shapes.append(("bottleneck", h, w, 512, 1024))
    h, w = 32, 8
    for i, f in enumerate((512, 256, 128, 64)):
        shapes.append((f"up{i}_conv", h, w, 2 * f, f))
        h, w = h * 2, w * 2

    rng = np.random.default_rng(0)
    print(f"\n{'stage':<28} {'fwd ms':>8} {'fwd%pk':>7} {'bwd ms':>8} "
          f"{'bwd%pk':>7} {'bwdSOL':>7} {'xSOL':>5}")
    tot_f = tot_b = tot_sol = 0.0
    for name, h, w, cin, f in shapes:
        mod = DoubleConv(f, dtype=jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.bfloat16)
        variables = mod.init(jax.random.key(0), x[:1], True)

        def fwd(p_, x_):
            out, mut = mod.apply(
                {"params": p_, "batch_stats": variables["batch_stats"]},
                x_, True, mutable=["batch_stats"],
            )
            return jnp.sum(out.astype(jnp.float32)), mut

        jf = jax.jit(lambda p_, x_: fwd(p_, x_)[0])
        jb = jax.jit(jax.grad(lambda p_, x_: fwd(p_, x_)[0], argnums=(0, 1)))
        jf(variables["params"], x), jb(variables["params"], x)
        tf_ = timed(jf, variables["params"], x, iters=iters)
        tb = timed(jb, variables["params"], x, iters=iters)
        fl_fwd = 2 * b * h * w * 9 * (cin * f + f * f)
        fl_bwd = 2 * fl_fwd  # dgrad + wgrad, each a conv-sized contraction
        # bwd traffic: read x + both saved activations + both cotangents
        # (write+read) + write dx — per element 2 B bf16
        by_bwd = 2 * b * h * w * (2 * cin + 7 * f)
        sol = max(fl_bwd / PEAK, by_bwd / BW)
        tot_f, tot_b, tot_sol = tot_f + tf_, tot_b + tb, tot_sol + sol
        print(f"{name + f' ({cin}->{f}) @{h}x{w}':<28} {tf_*1e3:8.2f} "
              f"{100*fl_fwd/tf_/PEAK:7.1f} {tb*1e3:8.2f} "
              f"{100*fl_bwd/tb/PEAK:7.1f} {sol*1e3:7.2f} {tb/sol:5.2f}")
    print(f"{'SUM':<28} {tot_f*1e3:8.2f} {'':>7} {tot_b*1e3:8.2f} {'':>7} "
          f"{tot_sol*1e3:7.2f} {tot_b/tot_sol:5.2f}")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch_size", type=int, default=256)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--per_stage", action="store_true")
    args = p.parse_args(argv)

    from audiodenoiser_tpu.utils.backend import require_device
    from audiodenoiser_tpu.utils.cache import enable_persistent_cache

    require_device(who="profile_train_breakdown")
    enable_persistent_cache()

    if args.per_stage:
        per_stage_backward(args.batch_size, args.iters)
        return

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
