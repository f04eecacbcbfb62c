"""CLI: per-noise-type ensemble evaluation (reference-compatible).

Mirrors ``/root/reference/code/test.py:181-199``: for each noise type, load
the specialized checkpoint from ``saved_models/`` (skip with a message if
missing) and evaluate on ``test_processed/``, emitting wavs, metrics txt,
and spectrogram PNGs with reference-identical filenames.

Usage: ``python -m audiodenoiser_tpu.cli.test [flags]``
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Specialized per-noise-type evaluation")
    p.add_argument("--test_data_dir", default="./data/test_processed")
    p.add_argument("--saved_models_dir", default="./saved_models")
    p.add_argument("--output_dir", default="./data/test_output_ensemble")
    p.add_argument("--sample_rate", type=int, default=8000)
    p.add_argument("--n_fft", type=int, default=512)
    p.add_argument("--hop_length", type=int, default=128)
    p.add_argument(
        "--noise_types",
        nargs="+",
        default=["white", "urban", "reverb", "noise_cancellation"],
    )
    p.add_argument("--num_audio_examples", type=int, default=5)
    p.add_argument(
        "--gl_mode",
        choices=["reference_gl", "griffin_lim"],
        default="reference_gl",
        help="reference_gl replicates test.py:39-46; griffin_lim is the "
        "correct magnitude-reimposing algorithm.",
    )
    p.add_argument("--precision", choices=["bf16", "f32"], default="bf16")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--model", choices=["unet", "complex_mask"], default="unet",
        help="unet: magnitude ensemble over test_processed npy artifacts "
        "(reference parity); complex_mask: waveform-domain eval of the "
        "mask_denoiser ensemble over --clean_dir/--noise_dir wavs.",
    )
    p.add_argument("--clean_dir", default="./data/test/clean")
    p.add_argument("--noise_dir", default="./data/test/noise")
    p.add_argument(
        "--universal", action="store_true",
        help="evaluate the single universal model ({stem}_mixed.ckpt, "
        "trained with cli.train --noise_type mixed) on every "
        "--noise_types entry, instead of one specialized model per type.",
    )
    p.add_argument(
        "--auto_route", action="store_true",
        help="evaluate the self-routing mixture of denoisers: the trained "
        "noise_router.ckpt classifies each test clip's corruption and "
        "dispatches it to the matching specialist — no per-noise-type "
        "model selection needed (reports routing accuracy per type).",
    )
    p.add_argument(
        "--ep", choices=["auto", "dense", "off"], default="auto",
        help="--auto_route expert dispatch when >=4 devices are visible: "
        "auto = capacity-based all_to_all routed compute (each clip "
        "forwarded exactly once, on-device overflow passes); dense = "
        "every-expert-computes one-hot psum; off = host-bucketed.",
    )
    p.add_argument(
        "--mesh", choices=["auto", "on", "off"], default="auto",
        help="auto: shard eval batches over a ('data','model') device mesh "
        "iff >1 device is visible; on: force; off: single device. Same "
        "semantics as cli.train.",
    )
    p.add_argument(
        "--model_parallel", type=int, default=1,
        help="channel-TP degree on the device mesh; the data axis takes "
        "the remaining devices (n_devices / model_parallel).",
    )
    p.add_argument(
        "--n_seeds", type=int, default=1,
        help="waveform-domain evals only: repeat the eval with seeds "
        "seed..seed+n-1 (fresh corruption draws) and report mean +- std "
        "of every metric ({nt}_metrics_multiseed.txt) — error bars "
        "instead of a single corruption draw.",
    )
    p.add_argument(
        "--bypass_db", type=float, default=40.0,
        help="identity-bypass gate for waveform-domain evals (complex_mask "
        "and routed-waveform): clips whose relative model-change energy is "
        "below -bypass_db are emitted bit-exactly as the input (the model "
        "judged them clean). <=0 disables.",
    )
    return p.parse_args(argv)


def _build_mesh(args):
    import jax

    use = {"auto": None, "on": True, "off": False}[args.mesh]
    if use is None:
        use = jax.device_count() > 1 or args.model_parallel > 1
    if not use:
        return None
    from audiodenoiser_tpu.parallel import make_mesh

    mesh = make_mesh(model_parallel=max(1, args.model_parallel))
    print(f"Device mesh: {dict(mesh.shape)}")
    return mesh


def main(argv=None):
    args = parse_args(argv)
    from audiodenoiser_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from audiodenoiser_tpu.utils.backend import require_device

    require_device(who="test")

    import os

    import jax.numpy as jnp

    from audiodenoiser_tpu.eval.runner import (
        load_model_for_noise,
        test_single_noise_type,
    )

    print("Starting specialized test for each noise type...")
    os.makedirs(args.output_dir, exist_ok=True)
    results = {}
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    if args.auto_route:
        if args.mesh == "on" or args.model_parallel > 1:
            # routed eval shards over its own ('data','expert') mesh when
            # >=4 devices are visible; a ('data','model') TP mesh does not
            # apply to it — error instead of silently ignoring the flags
            # (ADVICE r2)
            raise SystemExit(
                "--auto_route builds its own expert-parallel mesh and does "
                "not honor --mesh on/--model_parallel; drop those flags"
            )
        import jax

        from audiodenoiser_tpu.eval.ensemble import (
            evaluate_routed,
            evaluate_routed_waveform,
            load_mixture,
            make_ep_mesh,
        )

        stem = (
            "mask_denoiser" if args.model == "complex_mask" else "unet_denoiser"
        )
        mixture = load_mixture(
            args.saved_models_dir, dtype=dtype, stem=stem,
            n_fft=args.n_fft, hop_length=args.hop_length,
        )
        if args.model == "complex_mask":
            # mask experts consume complex STFTs: routed eval runs in the
            # waveform domain over the test wavs (like --model complex_mask
            # without routing)
            return evaluate_routed_waveform(
                mixture, args.clean_dir, args.noise_dir, args.output_dir,
                noise_types=args.noise_types, sample_rate=args.sample_rate,
                seed=args.seed, bypass_db=args.bypass_db,
            )
        from audiodenoiser_tpu.eval.ensemble import make_a2a_mesh

        ep_mesh = None
        if args.ep != "off" and jax.device_count() >= 4:
            if args.ep == "dense":
                if jax.device_count() % 4 == 0:
                    ep_mesh = make_ep_mesh()
            else:  # auto: routed all_to_all compute is the default
                ep_mesh = make_a2a_mesh()
            if ep_mesh is not None:
                print(f"Expert-parallel mesh: {dict(ep_mesh.shape)} "
                      f"({'dense' if args.ep == 'dense' else 'a2a'})")
        return evaluate_routed(
            mixture, args.test_data_dir, args.output_dir,
            noise_types=args.noise_types, ep_mesh=ep_mesh,
        )
    mesh = _build_mesh(args)
    # --universal: one mixed-corruption model evaluated on every noise type
    loaded = None
    if args.universal:
        stem = "mask_denoiser" if args.model == "complex_mask" else "unet_denoiser"
        try:
            loaded = load_model_for_noise(
                "mixed", args.saved_models_dir, dtype=dtype, stem=stem
            )
        except FileNotFoundError:
            print(f"Universal model '{stem}_mixed' not found. Nothing to do.")
            return results
    if args.model == "complex_mask":
        from audiodenoiser_tpu.eval.runner import (
            DenoiserRunner,
            test_noise_type_waveform,
        )

        # one runner per distinct model: DenoiserRunner jits with static
        # self, so per-seed (or, with --universal, per-noise-type)
        # construction would re-pay the full XLA compile of the fused
        # graph for identical shapes
        runner = None
        if loaded is not None:  # --universal: one model for every type
            runner = DenoiserRunner(
                loaded[0], loaded[1], args.n_fft, args.hop_length, mesh=mesh
            )
        for noise_type in args.noise_types:
            try:
                model, variables = loaded or load_model_for_noise(
                    noise_type, args.saved_models_dir, dtype=dtype,
                    stem="mask_denoiser",
                )
            except FileNotFoundError:
                print(f"Model for noise type '{noise_type}' not found. Skipping.")
                continue
            if loaded is None:
                runner = DenoiserRunner(
                    model, variables, args.n_fft, args.hop_length, mesh=mesh
                )
            per_seed = []
            for k in range(max(1, args.n_seeds)):
                m = test_noise_type_waveform(
                    model, variables, noise_type,
                    clean_dir=args.clean_dir, noise_dir=args.noise_dir,
                    output_dir=args.output_dir, sample_rate=args.sample_rate,
                    n_fft=args.n_fft, hop_length=args.hop_length,
                    num_audio_examples=args.num_audio_examples,
                    seed=args.seed + k, mesh=mesh, bypass_db=args.bypass_db,
                    write_artifacts=(k == 0), runner=runner,
                )
                if m is not None:
                    per_seed.append(m)
            if not per_seed:
                continue
            results[noise_type] = per_seed[0]
            if len(per_seed) > 1:
                import numpy as np

                keys = sorted(
                    set.intersection(*(set(m) for m in per_seed))
                )
                agg = {
                    k: (
                        float(np.mean([m[k] for m in per_seed])),
                        float(np.std([m[k] for m in per_seed])),
                    )
                    for k in keys
                }
                results[noise_type] = {
                    k: mu for k, (mu, _) in agg.items()
                } | {f"{k}_std": sd for k, (_, sd) in agg.items()}
                path = os.path.join(
                    args.output_dir,
                    f"{noise_type}_metrics_multiseed.txt",
                )
                with open(path, "w") as f:
                    f.write(
                        f"Multi-seed ({len(per_seed)} corruption draws) "
                        f"waveform metrics for '{noise_type}' "
                        f"(mean +- std):\n"
                    )
                    for k in keys:
                        mu, sd = agg[k]
                        # pesq_* is the calibrated approximation, not
                        # conformant P.862 — name it so in the artifact
                        disp = k.replace("pesq", "pesq_approx")
                        f.write(f"{disp}: {mu:.3f} +- {sd:.3f}\n")
                print(
                    f"multi-seed ({len(per_seed)}x): SI-SDR "
                    f"{agg['si_sdr_noisy'][0]:.2f} -> "
                    f"{agg['si_sdr'][0]:.2f} +- {agg['si_sdr'][1]:.2f} dB"
                )
        return results
    for noise_type in args.noise_types:
        try:
            model, variables = loaded or load_model_for_noise(
                noise_type,
                args.saved_models_dir,
                dtype=dtype,
            )
        except FileNotFoundError:
            print(f"Model for noise type '{noise_type}' not found. Skipping.")
            continue
        results[noise_type] = test_single_noise_type(
            model,
            variables,
            noise_type,
            test_data_dir=args.test_data_dir,
            output_dir=args.output_dir,
            sample_rate=args.sample_rate,
            n_fft=args.n_fft,
            hop_length=args.hop_length,
            num_audio_examples=args.num_audio_examples,
            gl_mode=args.gl_mode,
            seed=args.seed,
            mesh=mesh,
        )
    return results


if __name__ == "__main__":
    main()
