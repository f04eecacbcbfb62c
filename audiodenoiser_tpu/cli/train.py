"""CLI: train a U-Net denoiser (flag-compatible with the reference).

Reproduces every flag of ``/root/reference/code/train.py:41-59`` with
identical defaults (``run_name`` = ``UNET_Run_{unix_time}``, epochs 50,
batch 16, lr 1e-4, ``num_workers``, ``subset_fraction``) and resolves the
reference's two integration breakages (SURVEY.md §1): a ``--noise_type``
flag selects the ``train_processed/{nt}`` subfolder and names the exported
model ``unet_denoiser_{nt}.ckpt``, and ``subset_fraction`` is actually
honored by the dataset.

Extensions over the reference: ``--pipeline on_device`` trains against
fresh noise synthesized on the TPU every step (no .npy files needed, the
BASELINE north star), ``--precision``, ``--resume``, and ``--seed``.

Usage: ``python -m audiodenoiser_tpu.cli.train --base_dataset_path ...``
"""

from __future__ import annotations

import argparse
import json
import os
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="U-NET Audio Denoising Training Script")
    run_group = p.add_argument_group("Run & Path Configuration")
    run_group.add_argument(
        "--run_name", type=str, default=f"UNET_Run_{int(time.time())}",
        help="A unique name for the training run.",
    )
    run_group.add_argument(
        "--base_dataset_path", type=str, required=True,
        help="Dataset root: a folder of clean/noisy .npy pairs, a "
        "train_processed root with per-noise-type subfolders, or (with "
        "--pipeline on_device) a folder of clean/noise wavs.",
    )
    run_group.add_argument(
        "--output_path", type=str, default="./training_outputs_unet",
        help="Directory to save models and logs.",
    )
    hyper = p.add_argument_group("Training Hyperparameters")
    hyper.add_argument("--epochs", type=int, default=50)
    hyper.add_argument("--batch_size", type=int, default=16)
    hyper.add_argument("--learning_rate", type=float, default=1e-4)
    hyper.add_argument(
        "--num_workers", type=int, default=4,
        help="Host prefetch depth (kept for reference-CLI compatibility).",
    )
    hyper.add_argument(
        "--subset_fraction", type=float, default=1.0,
        help="Fraction of the dataset to use (e.g., 0.1 for 10%%).",
    )
    ext = p.add_argument_group("TPU-native extensions")
    ext.add_argument(
        "--noise_type", type=str, default=None,
        choices=["white", "urban", "reverb", "noise_cancellation", "all",
                 "mixed"],
        help="Train the specialized model for this noise type ('all' trains "
        "the full four-model ensemble sequentially; 'mixed' trains ONE "
        "universal model on a per-example mixture of all four corruptions — "
        "requires --pipeline on_device).",
    )
    ext.add_argument(
        "--pipeline", choices=["npy", "on_device"], default="npy",
        help="npy: load prebuilt spectrogram pairs; on_device: synthesize "
        "noise + STFT inside the jitted step from clean wavs.",
    )
    ext.add_argument(
        "--model", choices=["unet", "complex_mask", "router"], default="unet",
        help="unet: magnitude regression (reference parity); complex_mask: "
        "complex-ratio-mask variant (requires --pipeline on_device); "
        "router: the noise-type classifier that makes the 4-specialist "
        "ensemble self-routing (requires --pipeline on_device "
        "--noise_type mixed; see cli.test --auto_route).",
    )
    ext.add_argument("--precision", choices=["bf16", "f32"], default="bf16")
    ext.add_argument("--resume", action="store_true")
    ext.add_argument("--seed", type=int, default=0)
    ext.add_argument(
        "--lr_schedule", choices=["constant", "cosine"], default="constant",
        help="constant matches the reference; cosine adds warmup+decay.",
    )
    ext.add_argument("--warmup_steps", type=int, default=0)
    ext.add_argument(
        "--grad_accum", type=int, default=1,
        help="accumulate gradients over N micro-batches per optimizer step.",
    )
    ext.add_argument(
        "--model_parallel", type=int, default=1,
        help="channel-TP degree on the device mesh; the data axis takes the "
        "remaining devices automatically (n_devices / model_parallel).",
    )
    ext.add_argument(
        "--mesh", choices=["auto", "on", "off"], default="auto",
        help="auto: shard over a ('data','model') mesh iff >1 device is "
        "visible; on/off force it.",
    )
    ext.add_argument(
        "--ema_decay", type=float, default=None,
        help="track an exponential moving average of the weights (e.g. "
        "0.999), validate it each epoch, and export best_model_ema.ckpt "
        "alongside the raw best checkpoint.",
    )
    ext.add_argument(
        "--fsdp", action="store_true",
        help="FSDP/ZeRO layout: additionally shard wide conv kernels and "
        "their AdamW moments over the data axis (per-chip param+optimizer "
        "memory drops ~data-parallel-degree-fold; XLA inserts the "
        "all-gathers and reduce-scatters).",
    )
    ext.add_argument(
        "--pp_stages", type=int, default=0,
        help="pipeline-parallel TRAINING: split the U-Net block sequence "
        "into N stages over a ('data','stage') mesh (devices/N data "
        "replicas) and train with the single-program 1F1B schedule "
        "(parallel/pipeline_train.py). Constant LR only; magnitude (unet) "
        "family.",
    )
    ext.add_argument(
        "--pp_microbatches", type=int, default=4,
        help="microbatches per 1F1B step (batch_size must divide by "
        "pp_microbatches * data replicas).",
    )
    ext.add_argument(
        "--width_mult", type=float, default=1.0,
        help="channel-width multiplier for a compact student model "
        "(0.5 -> 7.8M params, 0.25 -> 2.0M; widths round to multiples of "
        "8 for MXU lanes). Recorded in the checkpoint sidecar so eval/"
        "serve rebuild the right architecture. 1.0 = reference 31M-param "
        "U-Net.",
    )
    ext.add_argument(
        "--attn_bottleneck", action="store_true",
        help="insert one residual self-attention block after the U-Net "
        "bottleneck (global clip context — aimed at reverb, whose IR "
        "smears energy across the whole window). Zero-init projection: "
        "a fresh run starts forward-identical to the plain U-Net. "
        "Recorded in the checkpoint sidecar so eval/serve rebuild it. "
        "Works with both families and --width_mult; not supported with "
        "--pp_stages (the 1F1B stage splitter is convolutional-only).",
    )
    ext.add_argument(
        "--s2d_stem", action="store_true",
        help="space-to-depth stem + sub-pixel output head: pack 2x2 input "
        "blocks into channels so the whole first U-Net level runs at half "
        "spatial resolution (4x fewer level-0 activation bytes — the "
        "HBM-bound full-res stem is the fused graph's measured residual "
        "bottleneck). An architecture change (quality re-established per "
        "recipe, throughput A/B in examples/bench_s2d_stem.py). Recorded "
        "in the checkpoint sidecar so eval/serve rebuild it. Works with "
        "both families and --width_mult; not supported with --pp_stages.",
    )
    ext.add_argument(
        "--s2d_skip", type=int, default=0,
        help="with --s2d_stem: width of a full-resolution refinement path "
        "(one BN-free Conv3x3->ReLU over the full-res input, concatenated "
        "with the sub-pixel head features, final full-res Conv3x3). The "
        "s2d tier's quality gap is architecture-bound fine spectral "
        "structure (round-5 distillation study); this buys it back with a "
        "few full-res channels at ~1%% of the FLOPs the half-res pyramid "
        "saves. Sidecar-recorded; 0 disables.",
    )
    ext.add_argument(
        "--remat", action="store_true",
        help="rematerialize U-Net blocks to cut activation memory "
        "(enables much larger per-chip batches).",
    )
    ext.add_argument(
        "--steps_per_epoch", type=int, default=None,
        help="on_device pipeline: steps per epoch (default: n_chunks/batch).",
    )
    ext.add_argument(
        "--sample_rate", type=int, default=8000,
        help="on_device pipeline: audio sample rate (default: the "
        "reference's 8 kHz, create_train_dataset.py:204). Clean/noise "
        "wavs are resampled on ingest; the STFT constants (n_fft 512, "
        "hop 128) are unchanged, so e.g. 16 kHz halves the per-frame "
        "time span and doubles the per-second frame rate. The rate is "
        "recorded in the checkpoint sidecar; pass the matching "
        "--sample_rate to cli.test / cli.serve when evaluating. The npy "
        "pipeline carries its own rate (set at featurize time).",
    )
    ext.add_argument(
        "--chunk_seconds", type=float, default=2.0,
        help="on_device pipeline: training-window length in seconds "
        "(default: the reference's 2 s chunks, "
        "create_train_dataset.py:21-33). Longer windows give the model "
        "analysis context past a corruption's time constant — reverb's "
        "JUCE tail (room_size 0.9) rings past 2 s, so a 4 s window lets "
        "the network see dry-signal evidence and the late tail of the "
        "SAME event in one receptive field. The U-Net is fully "
        "convolutional and the noise kernels are length-generic, so "
        "checkpoints trained at any window length load everywhere "
        "(eval/serve/streaming are unaffected).",
    )
    ext.add_argument(
        "--snr_min", type=float, default=None,
        help="on_device pipeline: with --snr_max, train with a per-example "
        "uniform SNR curriculum in [snr_min, snr_max] dB instead of the "
        "reference's fixed 8 dB (validation stays at the fixed level).",
    )
    ext.add_argument("--snr_max", type=float, default=None)
    ext.add_argument(
        "--augment", action="store_true",
        help="on_device pipeline: random gain (+-6 dB), polarity, and "
        "circular time shift on each clean chunk before corruption "
        "(on-device, zero host cost) — multiplies effective data for "
        "small clean libraries. Validation stays un-augmented.",
    )
    ext.add_argument(
        "--si_sdr_weight", type=float, default=None,
        help="complex_mask family: weight of the negative-SI-SDR waveform "
        "term in the training objective (default 0.5 — train on the metric "
        "the eval gate scores; 0 restores the spectral-only objective).",
    )
    ext.add_argument(
        "--si_sdr_clamp", type=float, default=30.0,
        help="complex_mask family: saturate the per-example SI-SDR reward "
        "at this many dB (<=0 disables). Without it, corruptions that "
        "leave some chunks untouched (noise_cancellation's p=0.8 gate) "
        "let ~110 dB pass-through clips dominate the mean and the "
        "optimum is the identity mask — measured round 3. 30 dB is where "
        "SI-SDR is perceptually saturated (same threshold as the eval "
        "aggregate).",
    )
    ext.add_argument(
        "--mask_bound", type=float, default=None,
        help="complex_mask family: tanh bound K of the complex ratio mask "
        "(|Mr|,|Mi| <= K). Default 2.0, except 8.0 for noise_cancellation "
        "— undoing its 0.2x amplitude attenuation needs ~5x gain, which a "
        "bound-2 mask cannot express. Recorded in the checkpoint sidecar "
        "so eval rebuilds the same head.",
    )
    ext.add_argument(
        "--mask_residual", choices=["on", "off"], default="on",
        help="complex_mask family: parametrize the mask as identity + "
        "bounded deviation (M = 1 + K tanh(out)), so untouched audio "
        "passes through exactly at init and identity preservation is the "
        "easy direction. Recorded in the sidecar.",
    )
    ext.add_argument(
        "--distill_from", type=str, default=None,
        help="complex_mask family: path to a frozen teacher checkpoint "
        "(mask_denoiser_*.ckpt; its .json sidecar rebuilds the teacher "
        "architecture). Adds an L1 term matching the teacher's masked "
        "spectrum — pair with --width_mult to distill the 31M universal "
        "model into a compact low-latency student.",
    )
    ext.add_argument(
        "--distill_weight", type=float, default=0.5,
        help="weight of the teacher-matching distillation term "
        "(with --distill_from).",
    )
    ext.add_argument(
        "--distill_features", type=float, default=0.0,
        help="weight of the feature-level distillation term (attention "
        "transfer): the student matches the teacher's normalized spatial "
        "attention map at the U-Net bottleneck. Channel-count-independent, "
        "so it works across --width_mult with no projection head and adds "
        "zero parameters. 0 disables (with --distill_from).",
    )
    ext.add_argument(
        "--ckpt_every", type=int, default=1,
        help="write the orbax resume state every N epochs (always after "
        "the last). The full-state save can dominate short epochs on "
        "slow-IO hosts; best-model exports are unaffected.",
    )
    ext.add_argument(
        "--profile_dir", type=str, default=None,
        help="Capture a jax.profiler trace of the run into this directory.",
    )
    ext.add_argument(
        "--export_quantized", action="store_true",
        help="re-export the best model with int8 conv kernels (~4x smaller).",
    )
    ext.add_argument(
        "--export_dir", type=str, default=None,
        help="Also export the best model as unet_denoiser_{noise_type}.ckpt "
        "into this directory (the saved_models/ workflow of test.py).",
    )
    return p.parse_args(argv)


def _resolve_npy_dir(base: str, noise_type: str | None) -> str:
    """Find the folder of .npy pairs, resolving reference path conventions."""
    candidates = []
    if noise_type:
        candidates += [
            os.path.join(base, noise_type),
            os.path.join(base, "train_processed", noise_type),
            os.path.join(base, "train", noise_type),
        ]
    candidates += [base, os.path.join(base, "train")]
    for c in candidates:
        if os.path.isdir(c) and any(f.endswith(".npy") for f in os.listdir(c)):
            return c
    raise FileNotFoundError(
        f"no .npy spectrogram pairs found under {base!r} "
        f"(noise_type={noise_type!r}); run create_train_dataset first"
    )


def _train_pp(args, cfg, train_batches, val_batches):
    """1F1B pipeline-parallel training loop (``--pp_stages``).

    A lean driver around :class:`~audiodenoiser_tpu.parallel.pipeline_train.
    PipelineTrainer`: reshapes each (B, F, T, C) host batch into
    (n_micro, B/n_micro, ...) microbatches, runs the single-program 1F1B
    step, validates with the pipelined forward, and exports the best model
    in the standard single-file format (the pp flat state unpacks back to
    ordinary U-Net variables, so eval/serve load it unchanged).
    """
    import time as _time

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    import audiodenoiser_tpu.train.loop as loop_mod
    from audiodenoiser_tpu.losses import combined_perceptual_loss
    from audiodenoiser_tpu.parallel.pipeline_train import PipelineTrainer
    from audiodenoiser_tpu.train.checkpoints import export_model
    from audiodenoiser_tpu.train.logging_utils import ScalarWriter, setup_logger

    S = args.pp_stages
    nd = jax.device_count()
    if nd % S:
        raise SystemExit(f"--pp_stages {S} does not divide {nd} devices")
    dp = nd // S
    M = args.pp_microbatches
    if cfg.batch_size % (M * dp):
        raise SystemExit(
            f"batch_size {cfg.batch_size} must divide by "
            f"pp_microbatches*data ({M}*{dp})"
        )
    mb = cfg.batch_size // (M * dp)
    mesh = Mesh(np.asarray(jax.devices()).reshape(dp, S), ("data", "stage"))

    run_dir = os.path.join(cfg.output_path, cfg.run_name)
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    os.makedirs(ckpt_dir, exist_ok=True)
    logger = setup_logger(os.path.join(run_dir, "training.log"))
    logger.info(
        f"--- 1F1B pipeline-parallel run: mesh {dict(mesh.shape)}, "
        f"{M} microbatches x {mb} per replica ---"
    )

    # peek one batch for the spectrogram shape; the model template comes
    # from loop.UNet so the architecture matches the monolithic path
    it0 = iter(train_batches(0))
    first = next(it0)
    f_dim, t_dim, c_dim = np.asarray(first[0]).shape[1:]
    dtype = jnp.bfloat16 if cfg.precision == "bf16" else jnp.float32
    from audiodenoiser_tpu.models.unet import width_kwargs

    model = loop_mod.UNet(
        dtype=dtype, remat=False, **width_kwargs(cfg.width_mult)
    )
    variables = model.init(
        jax.random.key(cfg.seed), jnp.zeros((1, f_dim, t_dim, c_dim))
    )
    trainer = PipelineTrainer(
        mesh,
        micro_batch=mb,
        n_micro=M,
        input_shape=(f_dim, t_dim, c_dim),
        features=tuple(model.features),
        bottleneck=model.bottleneck,
        out_channels=model.out_channels,
        dtype=dtype,
        learning_rate=cfg.learning_rate,
    )
    state = trainer.init(variables)
    n_params = sum(
        int(np.prod(p.shape))
        for p in jax.tree_util.tree_leaves(variables["params"])
    )
    logger.info(f"U-NET Model initialized. Trainable parameters: {n_params:,}")

    from audiodenoiser_tpu.train import checkpoints as ckpt_lib

    start_epoch = 0
    best_val = float("inf")
    exported_best = False
    best_path = os.path.join(ckpt_dir, "best_model.ckpt")
    resume_dir = os.path.join(ckpt_dir, "pp_train_state")
    if cfg.resume and os.path.exists(resume_dir):
        # PipeTrainState is a plain pytree of arrays: the standard orbax
        # round-trip applies (full optimizer moments + step included)
        template = {
            "state": jax.device_get(state),
            "epoch": 0,
            "best_val": 0.0,
        }
        restored = ckpt_lib.restore_train_state(resume_dir, template)
        state = jax.device_put(
            restored["state"], trainer._state_sharding()
        )
        start_epoch = int(restored["epoch"]) + 1
        best_val = float(restored["best_val"])
        # --ckpt_every makes the resume state coarser than the per-epoch
        # best export; the best sidecar keeps best_val honest (see fit())
        best_val = ckpt_lib.best_val_floor(best_path, best_val)
        logger.info(
            f"Resumed from epoch {start_epoch} (best val {best_val:.6f})"
        )

    eff = M * mb * dp

    def prep(x):
        """Pack a host batch into (M, mb*dp, ...) microbatch layout.

        Ragged batches are wrap-padded to the static shape; the returned
        real-row count lets callers drop (train) or trim (val) the
        duplicated rows instead of silently double-weighting them."""
        x = np.asarray(x, np.float32)
        n = x.shape[0]
        if n != eff:
            x = x[np.arange(eff) % n]
        return jnp.asarray(x.reshape(M, mb * dp, *x.shape[1:])), n

    @jax.jit
    def val_loss_fn(out, clean):
        return combined_perceptual_loss(out, clean).total

    writer = ScalarWriter(os.path.join(run_dir, "tensorboard_logs"))
    history = []
    from itertools import chain

    for epoch in range(start_epoch, cfg.epochs):
        t0 = _time.perf_counter()
        batches_iter = (
            chain([first], it0) if epoch == 0 else train_batches(epoch)
        )
        train_losses = []
        for noisy, clean in batches_iter:
            pn, n = prep(noisy)
            pc, _ = prep(clean)
            if n != eff and train_losses:
                # ragged final batch: wrap-padding would give repeated
                # rows up to eff/n times their gradient weight — drop it
                # (standard drop-tail) since full batches exist this epoch
                logger.info(
                    f"  dropping ragged final batch ({n} < {eff} rows)"
                )
                continue
            state, loss = trainer.step(state, pn, pc)
            train_losses.append(float(loss))
        train_loss = float(np.mean(train_losses)) if train_losses else float("nan")
        writer.add_scalar("Loss/train", train_loss, epoch)
        val_losses = []  # (batch loss over REAL rows, n_real)
        for noisy, clean in val_batches():
            pn, n = prep(noisy)
            pc, _ = prep(clean)
            out = trainer.forward(state, pn)
            flat = out.reshape(-1, *out.shape[2:])[:n]
            flat_c = pc.reshape(-1, *out.shape[2:])[:n]
            val_losses.append((float(val_loss_fn(flat, flat_c)), n))
        val_loss = (
            float(
                np.average(
                    [v for v, _ in val_losses],
                    weights=[n for _, n in val_losses],
                )
            )
            if val_losses
            else train_loss
        )
        writer.add_scalar("Loss/validation", val_loss, epoch)
        dt = _time.perf_counter() - t0
        logger.info(
            f"Epoch {epoch + 1}/{cfg.epochs} -> Train Loss: {train_loss:.6f}"
            f" | Validation Loss: {val_loss:.6f} | {dt:.1f}s"
        )
        if not np.isfinite(train_loss):
            logger.error("Non-finite training loss; aborting run.")
            raise FloatingPointError(f"diverged at epoch {epoch}")
        history.append({"epoch": epoch, "train": train_loss, "val": val_loss})
        if val_loss < best_val:
            best_val = val_loss
            full = trainer.unpack_state(state)
            export_model(best_path, full["params"], full["batch_stats"])
            exported_best = True
            ckpt_lib.record_best_val(best_path, best_val, epoch)
            if cfg.width_mult != 1.0:
                # sidecar beside the run-dir checkpoint too: without it a
                # width-scaled best_model.ckpt loaded directly (not via
                # --export_dir) rebuilds at reference width and fails
                import json as _json

                with open(
                    os.path.splitext(best_path)[0] + ".json", "w"
                ) as f:
                    _json.dump({"width_mult": cfg.width_mult}, f)
            logger.info(
                f"New best model saved to {best_path} (Val Loss: {best_val:.6f})"
            )
        if (
            (epoch + 1) % max(1, cfg.ckpt_every) == 0
            or epoch == cfg.epochs - 1
        ):
            # honor --ckpt_every like the monolithic path: full-state
            # orbax saves dominated short epochs on the slow-IO host
            ckpt_lib.save_train_state(
                resume_dir,
                {
                    "state": jax.device_get(state),
                    "epoch": epoch,
                    "best_val": best_val,
                },
            )
    writer.close()
    logger.info("--- Training Finished ---")
    if args.export_dir and args.noise_type:
        import shutil

        os.makedirs(args.export_dir, exist_ok=True)
        dst = os.path.join(
            args.export_dir, f"unet_denoiser_{args.noise_type}.ckpt"
        )
        if os.path.exists(best_path):
            shutil.copyfile(best_path, dst)
            # compact-student sidecar: copy the run-dir sidecar (the truth
            # about the weights being shipped — a resumed run that never
            # beat the restored best still ships an older checkpoint whose
            # sidecar was written when IT exported)
            run_sidecar = os.path.splitext(best_path)[0] + ".json"
            if os.path.exists(run_sidecar):
                shutil.copyfile(
                    run_sidecar, os.path.splitext(dst)[0] + ".json"
                )
            elif cfg.width_mult != 1.0:
                print(
                    "WARNING: shipping a checkpoint with no recorded width "
                    "sidecar; loaders will rebuild it at reference width."
                )
            print(f"Exported best model to {dst}")
    return {
        "best_val": best_val,
        "best_path": best_path,
        "run_dir": run_dir,
        "history": history,
        "state": state,
        "exported_best": exported_best,
    }


def main(argv=None):
    args = parse_args(argv)
    from audiodenoiser_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from audiodenoiser_tpu.utils.backend import require_device

    require_device(who="train")

    if args.noise_type == "all":
        # the reference's implied workflow (SURVEY.md §1 breakage 2): one
        # specialized training run per noise type

        def replace_flag(tokens, flag, update):
            out = []
            i = 0
            while i < len(tokens):
                t = tokens[i]
                if t == flag and i + 1 < len(tokens):
                    out += [t, update(tokens[i + 1])]
                    i += 2
                elif t.startswith(flag + "="):
                    out.append(f"{flag}={update(t.split('=', 1)[1])}")
                    i += 1
                else:
                    out.append(t)
                    i += 1
            return out

        argv = argv if argv is not None else __import__("sys").argv[1:]
        results = {}
        for nt in ("white", "urban", "reverb", "noise_cancellation"):
            sub = replace_flag(list(argv), "--noise_type", lambda _: nt)
            sub = replace_flag(sub, "--run_name", lambda v: f"{v}_{nt}")
            results[nt] = main(sub)
        return results

    import jax

    from audiodenoiser_tpu.parallel.distributed import maybe_initialize
    from audiodenoiser_tpu.train.loop import FitConfig, fit

    maybe_initialize()  # no-op on single host

    cfg = FitConfig(
        run_name=args.run_name,
        output_path=args.output_path,
        epochs=args.epochs,
        batch_size=args.batch_size,
        learning_rate=args.learning_rate,
        seed=args.seed,
        precision=args.precision,
        resume=args.resume,
        lr_schedule=args.lr_schedule,
        warmup_steps=args.warmup_steps,
        grad_accum=args.grad_accum,
        remat=args.remat,
        fsdp=args.fsdp,
        ckpt_every=args.ckpt_every,
        ema_decay=args.ema_decay,
        model_parallel=args.model_parallel,
        use_mesh={"auto": None, "on": True, "off": False}[args.mesh],
        width_mult=args.width_mult,
        attn_bottleneck=args.attn_bottleneck,
        s2d_stem=args.s2d_stem,
        s2d_skip=args.s2d_skip,
        extra_config=vars(args),
    )
    if args.s2d_skip and not args.s2d_stem:
        raise SystemExit("--s2d_skip requires --s2d_stem (it refines the "
                         "sub-pixel head)")

    if args.model == "complex_mask" and args.pipeline != "on_device":
        raise SystemExit("--model complex_mask requires --pipeline on_device "
                         "(it trains on waveform pairs)")
    if args.distill_from and args.model != "complex_mask":
        raise SystemExit("--distill_from supports --model complex_mask only "
                         "(the teacher term matches masked spectra)")
    if args.distill_features and not args.distill_from:
        raise SystemExit("--distill_features requires --distill_from "
                         "(there is no teacher to match without it)")
    if args.model == "router" and (
        args.pipeline != "on_device" or args.noise_type != "mixed"
    ):
        raise SystemExit("--model router requires --pipeline on_device "
                         "--noise_type mixed (labels come from the "
                         "per-example corruption draw)")
    if args.noise_type == "mixed" and args.pipeline != "on_device":
        raise SystemExit("--noise_type mixed requires --pipeline on_device "
                         "(the corruption mixture is synthesized per step)")
    if args.augment and args.pipeline != "on_device":
        raise SystemExit("--augment requires --pipeline on_device (the "
                         "augmentations run inside the jitted mixer); the "
                         "precomputed npy pipeline would silently ignore it")
    if args.chunk_seconds != 2.0 and args.pipeline != "on_device":
        raise SystemExit("--chunk_seconds requires --pipeline on_device "
                         "(the npy pipeline's chunking happened at dataset "
                         "build time)")
    if args.sample_rate != 8000 and args.pipeline != "on_device":
        raise SystemExit("--sample_rate requires --pipeline on_device (npy "
                         "datasets bake their rate in at featurize time — "
                         "pass --sample_rate to cli.create_train_dataset "
                         "instead)")

    if args.pipeline == "npy":
        from audiodenoiser_tpu.data import SpectrogramPairs, batches, split_train_val

        data_dir = _resolve_npy_dir(args.base_dataset_path, args.noise_type)
        ds = SpectrogramPairs(
            data_dir, subset_fraction=args.subset_fraction, seed=args.seed
        )
        tr_idx, va_idx = split_train_val(len(ds), 0.1, seed=args.seed)
        print(
            f"Dataset split: {len(tr_idx)} training samples, "
            f"{len(va_idx)} validation samples."
        )

        def train_batches(epoch):
            return batches(
                ds, tr_idx, args.batch_size, shuffle=True,
                seed=args.seed + epoch, prefetch=max(1, args.num_workers),
            )

        def val_batches():
            return batches(ds, va_idx, args.batch_size, shuffle=False)

        steps_per_epoch = max(1, -(-len(tr_idx) // args.batch_size))

    else:  # on_device
        from audiodenoiser_tpu.data import NoiseBank, OnDeviceMixer
        from audiodenoiser_tpu.data.builders import load_clean_chunks
        from audiodenoiser_tpu.data.wav_io import load_wav_list, read_wav

        if args.noise_type is None:
            raise SystemExit("--pipeline on_device requires --noise_type")
        clean_dir = os.path.join(args.base_dataset_path, "clean")
        noise_dir = os.path.join(args.base_dataset_path, "noise")
        if not os.path.isdir(clean_dir):
            clean_dir = args.base_dataset_path
        chunk_samples = int(round(args.sample_rate * args.chunk_seconds))
        chunks = load_clean_chunks(
            load_wav_list(clean_dir), args.sample_rate, chunk_samples
        )
        if args.subset_fraction < 1.0:
            keep = max(1, int(len(chunks) * args.subset_fraction))
            chunks = chunks[:keep]
        bank = None
        if args.noise_type in ("urban", "mixed"):
            clips = [
                read_wav(f, sample_rate=args.sample_rate)[0]
                for f in load_wav_list(noise_dir)
            ]
            # segments must match the training window: the default 2 s
            # @8 kHz bank breaks under --chunk_seconds / --sample_rate
            bank = NoiseBank(clips, target_len=chunk_samples)
        # held-out 90/10 split over the CLEAN CHUNKS (mirrors the
        # reference's random_split, train.py:111-114): the val mixer draws
        # from chunks training never sees
        from audiodenoiser_tpu.data import split_train_val

        tr_idx, va_idx = split_train_val(len(chunks), 0.1, seed=args.seed)
        if len(va_idx) == 0:
            va_idx = tr_idx[:1]
        snr_kwargs = {}
        if args.snr_min is not None and args.snr_max is not None:
            snr_kwargs["snr_db"] = (args.snr_min, args.snr_max)
        mixer = OnDeviceMixer(
            chunks[tr_idx], args.noise_type, noise_bank=bank,
            augment=args.augment, sample_rate=args.sample_rate, **snr_kwargs
        )
        # validation stays at the reference's fixed SNR for comparability
        val_mixer = OnDeviceMixer(chunks[va_idx], args.noise_type,
                                  noise_bank=bank,
                                  sample_rate=args.sample_rate)
        n_steps = args.steps_per_epoch or max(1, len(mixer) // args.batch_size)
        val_steps = max(1, n_steps // 10)
        base_key = jax.random.key(args.seed)
        attr = "sample_audio" if args.model == "complex_mask" else "sample"
        draw = getattr(mixer, attr)
        val_draw = getattr(val_mixer, attr)

        def train_batches(epoch):
            k = jax.random.fold_in(base_key, epoch)
            for s in range(n_steps):
                yield draw(jax.random.fold_in(k, s), args.batch_size)

        def val_batches():
            k = jax.random.fold_in(base_key, 10_000_019)
            for s in range(val_steps):
                yield val_draw(jax.random.fold_in(k, s), args.batch_size)

        print(
            f"On-device pipeline: {len(mixer)} clean chunks, "
            f"{n_steps} steps/epoch, noise type {args.noise_type}."
        )
        steps_per_epoch = n_steps

    from audiodenoiser_tpu.utils.profiling import maybe_trace

    if args.model == "router":
        # lightweight classifier training: no val-loss checkpoint loop, just
        # fit on the labeled mixed stream and export
        from audiodenoiser_tpu.train.checkpoints import export_model
        from audiodenoiser_tpu.train.router import fit_router

        steps = args.epochs * steps_per_epoch
        with maybe_trace(args.profile_dir):
            state, acc = fit_router(
                mixer,
                steps=steps,
                batch_size=args.batch_size,
                learning_rate=args.learning_rate,
                key=jax.random.key(args.seed),
            )
        print(f"Router held-out accuracy: {acc:.3f}")

        def export_router(path):
            export_model(path, jax.device_get(state.params), {})
            # record the training crop so windowed eval scoring matches a
            # non-default target_size (load_mixture reads this sidecar)
            with open(os.path.splitext(path)[0] + ".json", "w") as f:
                json.dump({"window": list(mixer.cfg["target_size"])}, f)

        run_dir = os.path.join(args.output_path, args.run_name)
        best = os.path.join(run_dir, "checkpoints", "noise_router.ckpt")
        export_router(best)
        if args.export_dir:
            os.makedirs(args.export_dir, exist_ok=True)
            dst = os.path.join(args.export_dir, "noise_router.ckpt")
            export_router(dst)
            print(f"Exported router to {dst}")
        return {"best_path": best, "router_accuracy": acc}

    if args.pp_stages:
        if args.model != "unet":
            raise SystemExit("--pp_stages supports the unet family only")
        if args.attn_bottleneck:
            raise SystemExit("--pp_stages does not support "
                             "--attn_bottleneck (the 1F1B stage splitter "
                             "carries convolutional blocks only)")
        if args.s2d_stem:
            raise SystemExit("--pp_stages does not support --s2d_stem "
                             "(the 1F1B stage splitter assumes the plain "
                             "full-resolution stem/head)")
        if args.lr_schedule != "constant" or args.ema_decay or args.fsdp:
            raise SystemExit(
                "--pp_stages supports the constant-LR AdamW path only "
                "(drop --lr_schedule/--ema_decay/--fsdp)"
            )
        return _train_pp(args, cfg, train_batches, val_batches)

    if args.lr_schedule == "cosine" and cfg.total_steps == 0:
        cfg.total_steps = args.epochs * steps_per_epoch

    fit_kwargs = {}
    mask_meta = None
    if args.model == "complex_mask":
        import jax.numpy as jnp

        from audiodenoiser_tpu.models.complex_mask import ComplexMaskUNet
        from audiodenoiser_tpu.train.mask import (
            create_mask_train_state,
            make_mask_steps,
        )

        # per-type defaults (VERDICT r2 weak #1): train on the deployed
        # SI-SDR metric, and give the noise_cancellation specialist a mask
        # bound wide enough to invert its 0.2x attenuation
        si_w = 0.5 if args.si_sdr_weight is None else args.si_sdr_weight
        si_clamp = args.si_sdr_clamp if args.si_sdr_clamp > 0 else None
        bound = args.mask_bound
        if bound is None:
            # the mixed (universal) stream includes noise_cancellation, so
            # it needs the same wide bound as the nc specialist
            bound = (
                8.0
                if args.noise_type in ("noise_cancellation", "mixed")
                else 2.0
            )
        residual = args.mask_residual == "on"
        mask_meta = {"mask_bound": bound, "si_sdr_weight": si_w,
                     "si_sdr_clamp": si_clamp, "residual": residual}
        from audiodenoiser_tpu.models.unet import width_kwargs

        if args.width_mult != 1.0:
            mask_meta["width_mult"] = args.width_mult
        if args.attn_bottleneck:
            mask_meta["attn_bottleneck"] = True
        if args.s2d_stem:
            mask_meta["s2d_stem"] = True
        if args.s2d_skip:
            mask_meta["s2d_skip"] = args.s2d_skip
        if args.sample_rate != 8000:
            mask_meta["sample_rate"] = args.sample_rate
        dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
        teacher = None
        if args.distill_from:
            from audiodenoiser_tpu.eval.runner import load_model_from_path

            t_model, t_vars = load_model_from_path(
                args.distill_from, dtype=dtype, stem="mask_denoiser"
            )
            teacher = (t_model.apply, t_vars)
            mask_meta["distilled_from"] = args.distill_from
            if args.distill_features:
                mask_meta["distill_features"] = args.distill_features
        fit_kwargs = dict(
            state_factory=lambda: create_mask_train_state(
                jax.random.key(args.seed),
                ComplexMaskUNet(dtype=dtype, mask_bound=bound,
                                residual=residual,
                                zero_out_init=residual,
                                attn_bottleneck=args.attn_bottleneck,
                                s2d_stem=args.s2d_stem,
                                s2d_skip=args.s2d_skip,
                                **width_kwargs(args.width_mult)),
                learning_rate=args.learning_rate,
                schedule=args.lr_schedule,
                warmup_steps=args.warmup_steps,
                total_steps=cfg.total_steps,
                grad_accum=args.grad_accum,
            ),
            steps=make_mask_steps(si_w, si_sdr_clamp=si_clamp,
                                  teacher=teacher,
                                  distill_weight=args.distill_weight,
                                  distill_feat_weight=args.distill_features),
        )
    elif args.model == "unet" and (
        args.width_mult != 1.0 or args.attn_bottleneck or args.s2d_stem
        or args.sample_rate != 8000
    ):
        # magnitude-family architecture variants: the loader needs these
        # to rebuild the model (same sidecar flow the mask head uses)
        mask_meta = {"width_mult": args.width_mult}
        if args.attn_bottleneck:
            mask_meta["attn_bottleneck"] = True
        if args.s2d_stem:
            mask_meta["s2d_stem"] = True
        if args.s2d_skip:
            mask_meta["s2d_skip"] = args.s2d_skip
        if args.sample_rate != 8000:
            mask_meta["sample_rate"] = args.sample_rate

    with maybe_trace(args.profile_dir):
        result = fit(cfg, train_batches, val_batches, **fit_kwargs)

    run_meta = os.path.splitext(result["best_path"])[0] + ".json"
    if mask_meta is not None and result.get("exported_best"):
        # sidecar BESIDE the run-dir checkpoint too: anyone loading
        # best_model.ckpt directly (not via --export_dir) must be able to
        # rebuild the trained mask head (bound/residual), else the loader
        # silently instantiates the default head against these weights.
        # Written ONLY when THIS run (re)exported the checkpoint — a
        # resumed run with changed mask flags that never beat the restored
        # best must not re-stamp the old weights with new hyperparameters.
        with open(run_meta, "w") as f:
            json.dump(mask_meta, f)
    if mask_meta is not None and result.get("exported_best_ema"):
        # the EMA export is a separate checkpoint with the same head
        # hyperparameters — without its own sidecar a width-scaled or
        # custom-bound best_model_ema.ckpt cannot be rebuilt by loaders
        ema_meta = (
            os.path.splitext(result["best_ema_path"])[0] + ".json"
        )
        with open(ema_meta, "w") as f:
            json.dump(mask_meta, f)

    if args.export_dir and args.noise_type:
        import shutil

        os.makedirs(args.export_dir, exist_ok=True)
        stem = "unet_denoiser" if args.model == "unet" else "mask_denoiser"
        dst = os.path.join(args.export_dir, f"{stem}_{args.noise_type}.ckpt")
        if mask_meta is not None:
            # sidecar: the head hyperparameters of the weights actually
            # being shipped — this run's flags if it exported, else the
            # run-dir sidecar describing the earlier run's checkpoint.
            # If the shipped weights predate sidecars entirely (no
            # run_meta and nothing exported this run), their true config
            # is unknown: stamping this run's flags on them would be the
            # exact mismatch bug the sidecars exist to prevent — warn and
            # write nothing (the loader falls back to defaults).
            if result.get("exported_best"):
                meta_payload = mask_meta
            elif os.path.exists(run_meta):
                with open(run_meta) as f:
                    meta_payload = json.load(f)
            else:
                meta_payload = None
                print(
                    "WARNING: exporting a checkpoint from an earlier run "
                    "with no recorded model sidecar; its head config is "
                    "unknown, so no sidecar is written (loader will use "
                    "defaults)."
                )
            if meta_payload is not None:
                with open(os.path.splitext(dst)[0] + ".json", "w") as f:
                    json.dump(meta_payload, f)
        if os.path.exists(result["best_path"]):
            if args.export_quantized:
                from audiodenoiser_tpu.train.checkpoints import (
                    export_model,
                    load_exported,
                )

                payload = load_exported(result["best_path"])
                export_model(dst, payload["params"], payload["batch_stats"],
                             quantize=True)
                print(f"Exported int8-quantized best model to {dst}")
            else:
                shutil.copyfile(result["best_path"], dst)
                print(f"Exported best model to {dst}")
    return result


if __name__ == "__main__":
    main()
