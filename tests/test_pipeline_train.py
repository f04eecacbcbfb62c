"""1F1B pipeline-parallel training: per-step equality with monolithic
gradient accumulation (VERDICT r2 next-round #2).

The semantic contract of ``parallel.pipeline_train``: a pipelined step
with M microbatches == sequential per-microbatch gradient accumulation on
the monolithic model — same mean loss, same AdamW-updated parameters, same
BatchNorm running stats. Verified on the virtual 8-CPU mesh for a
stage-only mesh and for the dp x pp composition.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from audiodenoiser_tpu.losses import combined_perceptual_loss
from audiodenoiser_tpu.models.unet import UNet
from audiodenoiser_tpu.parallel.pipeline_train import (
    PipelineTrainer,
    schedule_1f1b,
    schedule_forward,
)
import optax

FEATURES = (4, 8)
BOTTLENECK = 16
IN_SHAPE = (32, 16, 1)
LR = 1e-3
# eps=1e-3 in BOTH implementations: with the production 1e-8, Adam's
# m/(sqrt(v)+eps) amplifies float-order noise on near-zero bias gradients
# into direction flips, making post-update param equality ill-conditioned
# regardless of implementation correctness. The larger eps keeps the test
# a sharp probe of the gradient math itself.
EPS = 1e-3


def _model():
    return UNet(features=FEATURES, bottleneck=BOTTLENECK, dtype=jnp.float32)


def _batch(rng, n_micro, batch):
    noisy = np.abs(
        rng.standard_normal((n_micro, batch, *IN_SHAPE))
    ).astype(np.float32)
    clean = (noisy * 0.8).astype(np.float32)
    return jnp.asarray(noisy), jnp.asarray(clean)


def _mono_steps(variables, noisy, clean, n_steps, data_shards=1):
    """Sequential grad-accumulation reference matching pipeline semantics:
    each data shard runs its own microbatch sequence (BN normalizes the
    LOCAL shard batch and threads its own running stats), grads/losses
    average over (microbatch, shard), BN stats pmean over shards at the
    end of each step — exactly what the dp x pp program computes."""
    model = _model()
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(LR, b1=0.9, b2=0.999, eps=EPS, weight_decay=0.01),
    )
    params = variables["params"]
    bn = variables["batch_stats"]
    opt_state = tx.init(params)
    M = noisy.shape[0]
    D = data_shards
    shard = noisy.shape[1] // D
    losses = []
    for _ in range(n_steps):
        grads = jax.tree_util.tree_map(jnp.zeros_like, params)
        loss_acc = 0.0
        bn_out = []
        for d in range(D):
            bn_d = bn
            for m in range(M):
                sl = slice(d * shard, (d + 1) * shard)

                def loss_fn(p, bn_d=bn_d, m=m, sl=sl):
                    out, mut = model.apply(
                        {"params": p, "batch_stats": bn_d}, noisy[m, sl],
                        train=True, mutable=["batch_stats"],
                    )
                    return (
                        combined_perceptual_loss(out, clean[m, sl]).total,
                        mut["batch_stats"],
                    )

                (l, bn_d), g = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params)
                grads = jax.tree_util.tree_map(
                    lambda a, b: a + b / (M * D), grads, g
                )
                loss_acc += float(l) / (M * D)
            bn_out.append(bn_d)
        bn = jax.tree_util.tree_map(
            lambda *xs: sum(xs) / D, *bn_out
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        losses.append(loss_acc)
    return {"params": params, "batch_stats": bn}, losses


class TestSchedule:
    @pytest.mark.parametrize("S,M", [(2, 2), (4, 4), (4, 7), (3, 8)])
    def test_1f1b_valid(self, S, M):
        fwd, bwd = schedule_1f1b(S, M)
        tick_f, tick_b = {}, {}
        for t in range(fwd.shape[0]):
            for s in range(S):
                if fwd[t, s] >= 0:
                    tick_f[(int(fwd[t, s]), s)] = t
                if bwd[t, s] >= 0:
                    tick_b[(int(bwd[t, s]), s)] = t
        # every microbatch forwards and backwards through every stage
        assert len(tick_f) == S * M and len(tick_b) == S * M
        inflight_max = [0] * S
        for m in range(M):
            for s in range(S):
                if s > 0:
                    assert tick_f[(m, s)] > tick_f[(m, s - 1)]
                if s < S - 1:
                    assert tick_b[(m, s)] > tick_b[(m, s + 1)]
                else:
                    assert tick_b[(m, s)] >= tick_f[(m, s)]
        # the 1F1B in-flight cap: stage s never holds more than S-s
        for s in range(S):
            events = sorted(
                [(tick_f[(m, s)], 1) for m in range(M)]
                + [(tick_b[(m, s)], -1) for m in range(M)],
                key=lambda e: (e[0], -e[1]),
            )
            cur = 0
            for _, delta in events:
                cur += delta
                inflight_max[s] = max(inflight_max[s], cur)
            assert inflight_max[s] <= S - s

    def test_forward_wavefront(self):
        tbl = schedule_forward(3, 5)
        assert tbl.shape == (7, 3)
        for m in range(5):
            for s in range(3):
                assert tbl[m + s, s] == m


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 devices")
class TestPipelineTrain:
    def _trainer(self, mesh, n_micro=4, micro_batch=2):
        return PipelineTrainer(
            mesh,
            micro_batch=micro_batch,
            n_micro=n_micro,
            input_shape=IN_SHAPE,
            features=FEATURES,
            bottleneck=BOTTLENECK,
            learning_rate=LR,
            eps=EPS,
        )

    def test_stage_only_equality(self, rng):
        devices = np.asarray(jax.devices()[:4])
        mesh = Mesh(devices, ("stage",))
        model = _model()
        variables = model.init(
            jax.random.key(0), jnp.zeros((1, *IN_SHAPE), jnp.float32)
        )
        trainer = self._trainer(mesh)
        state = trainer.init(variables)
        noisy, clean = _batch(rng, 4, 2)

        mono_vars, mono_losses = _mono_steps(variables, noisy, clean, 2)
        for step in range(2):
            state, loss = trainer.step(state, noisy, clean)
            np.testing.assert_allclose(
                float(loss), mono_losses[step], rtol=1e-5, atol=1e-6
            )
        got = trainer.unpack_state(state)
        key_fn = lambda kv: str(kv[0])  # noqa: E731
        for (ka, a), (kb, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(got["params"]),
                   key=key_fn),
            sorted(jax.tree_util.tree_leaves_with_path(mono_vars["params"]),
                   key=key_fn),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6,
                err_msg=str(ka),
            )
        for a, b in zip(
            jax.tree_util.tree_leaves(got["batch_stats"]),
            jax.tree_util.tree_leaves(mono_vars["batch_stats"]),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            )

    def test_dp_pp_composition(self, rng):
        """('data', 'stage') 2x4: pipelined dp-composed step equals the
        monolithic accumulation over the full (2x wider) microbatches."""
        devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
        mesh = Mesh(devices, ("data", "stage"))
        model = _model()
        variables = model.init(
            jax.random.key(0), jnp.zeros((1, *IN_SHAPE), jnp.float32)
        )
        trainer = self._trainer(mesh, n_micro=3, micro_batch=2)
        state = trainer.init(variables)
        noisy, clean = _batch(rng, 3, 4)  # 2 per data slice

        mono_vars, mono_losses = _mono_steps(
            variables, noisy, clean, 1, data_shards=2
        )
        state, loss = trainer.step(state, noisy, clean)
        np.testing.assert_allclose(
            float(loss), mono_losses[0], rtol=1e-5, atol=1e-6
        )
        got = trainer.unpack_state(state)
        for a, b in zip(
            jax.tree_util.tree_leaves(got["params"]),
            jax.tree_util.tree_leaves(mono_vars["params"]),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
            )

    def test_pipelined_forward_matches_monolithic(self, rng):
        devices = np.asarray(jax.devices()[:4])
        mesh = Mesh(devices, ("stage",))
        model = _model()
        variables = model.init(
            jax.random.key(0), jnp.zeros((1, *IN_SHAPE), jnp.float32)
        )
        trainer = self._trainer(mesh, n_micro=3)
        state = trainer.init(variables)
        xs = jnp.asarray(
            np.abs(rng.standard_normal((3, 2, *IN_SHAPE))).astype(np.float32)
        )
        got = trainer.forward(state, xs)
        want = jax.vmap(
            lambda x: model.apply(variables, x, train=False)
        )(xs)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )

    def test_more_microbatches_than_stages(self, rng):
        """M > S exercises the receive rings + in-flight cap for real
        (slot reuse m and m+S); still equals monolithic accumulation."""
        devices = np.asarray(jax.devices()[:4])
        mesh = Mesh(devices, ("stage",))
        model = _model()
        variables = model.init(
            jax.random.key(0), jnp.zeros((1, *IN_SHAPE), jnp.float32)
        )
        trainer = self._trainer(mesh, n_micro=6, micro_batch=1)
        state = trainer.init(variables)
        noisy, clean = _batch(rng, 6, 1)
        mono_vars, mono_losses = _mono_steps(variables, noisy, clean, 1)
        state, loss = trainer.step(state, noisy, clean)
        np.testing.assert_allclose(
            float(loss), mono_losses[0], rtol=1e-5, atol=1e-6
        )
        got = trainer.unpack_state(state)
        for a, b in zip(
            jax.tree_util.tree_leaves(got["params"]),
            jax.tree_util.tree_leaves(mono_vars["params"]),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
            )

    def test_pack_unpack_roundtrip(self):
        devices = np.asarray(jax.devices()[:4])
        mesh = Mesh(devices, ("stage",))
        model = _model()
        variables = model.init(
            jax.random.key(1), jnp.zeros((1, *IN_SHAPE), jnp.float32)
        )
        trainer = self._trainer(mesh)
        state = trainer.init(variables)
        got = trainer.unpack_state(state)
        for a, b in zip(
            jax.tree_util.tree_leaves(got),
            jax.tree_util.tree_leaves(
                {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]}
            ),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
