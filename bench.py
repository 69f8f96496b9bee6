"""Benchmark: occupancy-path training-step throughput (rays/sec/chip).

Headline: the TPU-tuned flagship config — tri-plane field (--grid_type
triplane, scatter-free MXU backward, ops/triplane.py), (128,512)×(16,8)
planes, 40 kept samples/ray — on the occupancy fast path (-O), with 8 steps
per dispatch (lax.scan) amortizing the 100-250 ms tunnel dispatch latency,
measuring the full train step: march + fused field + composite + losses +
backward + Adam.  Every flagship knob is quality-gated on the bear-class
fixture (±0.5 dB of the reference-parity field — docs/PERF.md).

Diagnostics (stderr): the reference-parity 16×2 tiled grid (the round-1
headline), the 8×4 TPU-tuned grid, and the dense -O2 path.

vs_baseline: the reference publishes no numbers (BASELINE.md).  We anchor on
1.0e6 rays/s as an assumed reference-GPU full-train-step rate (typical
instant-ngp-style training on a 3090-class GPU at ~10^5-10^6 rays/s);
vs_baseline = value / 1.0e6, so ≥5.0 meets the BASELINE.json target.

Perf state + measured breakdowns: docs/PERF.md.
"""

import json
import os
import sys
import time

import numpy as np

# Wall-clock budget discipline (round-4 lesson: the driver's timeout killed
# bench.py during the editing bench's cold UNet compile and the round's
# official perf record was `parsed: null`).  The headline JSON line is now
# printed IMMEDIATELY after the headline measurement; everything after it
# (diagnostics, editing) is budget-gated and best-effort.
_T0 = time.monotonic()
_BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "1500"))


def _remaining():
    return _BUDGET_S - (time.monotonic() - _T0)


def _rays(n_rays):
    rng = np.random.RandomState(0)
    o = np.tile(np.asarray([[0.0, 0.0, -1.5]], np.float32), (n_rays, 1))
    d = rng.randn(n_rays, 3).astype(np.float32) * 0.1 + np.asarray(
        [0, 0, 1], np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    target = rng.rand(n_rays, 3).astype(np.float32)
    tmask = (rng.rand(n_rays) > 0.5).astype(np.float32)
    return o, d, target, tmask


def _enable_compile_cache():
    """Persistent compile cache (same dir as main.py): tunnel first-compiles
    cost minutes and the driver re-runs this bench every round."""
    import jax
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               os.path.expanduser("~/.cache/customnerf_jax"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def _print_stale_fallback(reason):
    """Emit the last successful headline (marked stale) so the round keeps a
    machine-readable record even when the chip is unreachable.  Returns True
    if a line was printed."""
    print(f"[bench] {reason}", file=sys.stderr)
    try:
        with open("BENCH_LAST_GOOD.json") as f:
            out = json.load(f)
        out["stale"] = True
        out["stale_reason"] = reason
        print(json.dumps(out), flush=True)
        return True
    except OSError:
        print("[bench] no BENCH_LAST_GOOD.json to fall back to",
              file=sys.stderr)
        return False


def _probe_backend_or_fallback():
    """The axon TPU plugin HANGS retrying when the tunnel is down (hours-long
    outages observed) — jax.devices() then never returns (and holds the GIL,
    so an in-process watchdog thread starves) and the driver's timeout would
    kill bench.py with no artifact (the round-4 lost-record failure mode, by
    a different path).  Probe backend init in a SUBPROCESS with a hard
    timeout; if it never comes up, emit the last successful headline (marked
    "stale": true) and exit 0 so the round keeps a machine-readable record.
    """
    import subprocess

    if os.environ.get("BENCH_SKIP_PROBE"):   # testing: exercise supervisor
        return
    timeout_s = float(os.environ.get("BENCH_INIT_TIMEOUT_S", "600"))
    try:
        # device ENUMERATION can succeed while the tunnel's compile/execute
        # service is wedged (observed) — probe an actual tiny computation
        subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; jax.devices(); "
             "assert float(jnp.ones((8, 128)).sum()) == 1024.0"],
            timeout=timeout_s, check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        return
    except subprocess.TimeoutExpired:
        reason = f"tpu backend init exceeded {timeout_s:.0f}s (tunnel down)"
    except subprocess.CalledProcessError as e:
        reason = f"backend probe failed rc={e.returncode}"
    _print_stale_fallback(reason)
    sys.exit(0)


def main():
    """Supervisor: probe the tunnel, then run the real bench in a CHILD
    process under hard deadlines.

    The wedge mode observed in round 5 is the dangerous one: the probe can
    SUCCEED and the tunnel wedge moments later, mid-compile — the hang holds
    the GIL, so no in-process watchdog can fire, and the driver's timeout
    would kill bench.py with nothing on stdout (the round-4 lost-record
    failure, by a new path).  A supervisor process holds no JAX state and
    cannot wedge: it streams the child's stdout, watches for the headline
    JSON line, and on deadline kills the child (exact PID) and falls back to
    the stale headline — rc=0 and one parseable line in every outcome.
    """
    import subprocess
    import threading

    _probe_backend_or_fallback()
    if os.environ.get("BENCH_NO_SUPERVISE"):
        return _bench_main()

    headline_deadline = float(
        os.environ.get("BENCH_HEADLINE_DEADLINE_S", "1200"))
    total_deadline = _BUDGET_S + float(
        os.environ.get("BENCH_TOTAL_GRACE_S", "300"))

    # BENCH_FAKE_CHILD (testing): a python -c body standing in for the real
    # bench child, so the supervisor's deadline/fallback paths are testable
    # offline (tests/test_bench_supervisor.py)
    fake = os.environ.get("BENCH_FAKE_CHILD")
    argv = ([sys.executable, "-c", fake] if fake
            else [sys.executable, os.path.abspath(__file__), "--run"])
    child = subprocess.Popen(argv, stdout=subprocess.PIPE, text=True)
    saw_json = threading.Event()

    def pump():
        for line in child.stdout:
            sys.stdout.write(line)
            sys.stdout.flush()
            s = line.strip()
            if s.startswith("{") and '"metric"' in s:
                saw_json.set()

    pump_t = threading.Thread(target=pump, daemon=True)
    pump_t.start()

    def kill_child(reason):
        print(f"[bench] supervisor: killing bench child ({reason})",
              file=sys.stderr)
        try:
            child.kill()
            child.wait(timeout=30)
        except Exception:
            pass
        pump_t.join(timeout=10)

    start = time.monotonic()
    while True:
        rc = child.poll()
        if rc is not None:
            pump_t.join(timeout=10)
            break
        elapsed = time.monotonic() - start
        if not saw_json.is_set() and elapsed > headline_deadline:
            kill_child(f"no headline within {headline_deadline:.0f}s — "
                       "mid-bench tunnel wedge?")
            if not saw_json.is_set():
                _print_stale_fallback(
                    f"bench hung before headline ({headline_deadline:.0f}s); "
                    "tunnel wedged mid-run")
            sys.exit(0)
        if elapsed > total_deadline:
            kill_child(f"total deadline {total_deadline:.0f}s exceeded")
            if not saw_json.is_set():
                _print_stale_fallback(
                    f"bench exceeded total deadline {total_deadline:.0f}s")
            sys.exit(0)
        time.sleep(2)

    if saw_json.is_set() or rc == 0:
        sys.exit(0)
    # child died early with nothing on stdout (e.g. import error): surface it
    if _print_stale_fallback(f"bench child exited rc={rc} with no headline"):
        sys.exit(0)
    sys.exit(rc)


def _bench_main():
    import jax
    import jax.numpy as jnp
    import optax

    _enable_compile_cache()

    from customnerf_tpu.models.field import FieldConfig, NeRFField
    from customnerf_tpu.models.renderer import (RenderSettings, render_rays,
                                                render_rays_fast)
    from customnerf_tpu.ops.grid import GridSpec
    from customnerf_tpu.ops.occupancy import init_state, state_from_grid
    from customnerf_tpu.ops.triplane import TriplaneSpec

    platform = jax.devices()[0].platform
    on_accel = platform != "cpu"
    # Headline batch: 16384 rays.  Flagship throughput IMPROVES with batch
    # (4096 → 223.5k, 8192 → 227.8k, 16384 → 236.1k rays/s — docs/PERF.md
    # scaling sweep): compaction shrinks everything downstream of the march,
    # so larger batches amortize fixed costs.  Large-batch training is the
    # TPU-idiomatic regime; per-ray work is identical to the quality-gated
    # bear config.  Diagnostics keep the 4096-ray shape comparable with the
    # round-1/2/3 tables in docs/PERF.md.
    n_rays = int(os.environ.get("BENCH_NRAYS", 0)) or (
        16384 if on_accel else 128)
    n_rays_diag = 4096 if on_accel else 128
    iters = 3 if on_accel else 1          # dispatches; each scans spd steps
    spd = 8 if on_accel else 2            # steps per dispatch (lax.scan)
    compute = "bfloat16" if on_accel else "float32"

    batches = {n: tuple(map(jnp.asarray, _rays(n)))
               for n in {n_rays, n_rays_diag}}

    # Two occupancy workloads:
    #  * occ: 12.8% occupied cells — matched to the TRAINED bear-fixture
    #    grid (measured 12.8% cells / ~32% slab fill, docs/PERF.md fill
    #    probe).  This is what real captures look like, and what the
    #    reference's CUDA compaction march exploits (raymarching.cu:312-480
    #    evaluates only marched samples) — the headline runs here, with the
    #    quality-gated cross-ray compaction enabled.
    #  * occ_dense: 50% occupied — dense-fill worst case where compaction
    #    cannot win (every ray fills its keep budget); kept as a diagnostic.
    rng = np.random.RandomState(0)
    g0 = init_state(cascade=2, grid_size=128 if on_accel else 32)

    def make_occ(frac):
        dens = (rng.rand(*g0.density_grid.shape) < frac).astype(
            np.float32) * 100.0
        return state_from_grid(dens, 1.0, density_thresh=10.0,
                               grid_size=g0.grid_size)

    occ = make_occ(0.128)
    occ_dense = make_occ(0.5)

    fast_settings = RenderSettings(bound=2.0, num_steps=64, upsample_steps=0,
                                   soft_mask=True)
    dense_settings = RenderSettings(bound=2.0, num_steps=64, upsample_steps=64,
                                    soft_mask=True)
    tx = optax.adam(5e-4, b1=0.9, b2=0.99, eps=1e-15)

    def make_field(grid):
        field = NeRFField(FieldConfig(bound=2.0, grid=grid,
                                      compute_dtype=compute))
        return field, field.init_params(jax.random.PRNGKey(0))

    def make_scan_step(field, render_fn, batch):
        """One dispatch = lax.scan of spd full train steps (the trainer's
        --steps_per_dispatch path; amortizes tunnel dispatch latency)."""
        o, d, target, tmask = batch

        @jax.jit
        def dispatch(params, opt_state, keys):
            def body(carry, key):
                params, opt_state = carry

                def loss_fn(p):
                    out = render_fn(field, p, key, o, d)
                    loss = jnp.mean((out["image"] - target) ** 2)
                    loss += 0.01 * jnp.mean(
                        (out["render_mask"][..., 0] - tmask) ** 2)
                    return loss

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = tx.update(grads, opt_state)
                return (optax.apply_updates(params, updates), opt_state), loss

            (params, opt_state), losses = jax.lax.scan(body,
                                                       (params, opt_state),
                                                       keys)
            return params, opt_state, losses[-1]

        return dispatch

    def run(field, params, render_fn, tag, n=n_rays_diag):
        step = make_scan_step(field, render_fn, batches[n])
        opt_state = tx.init(params)
        p = params
        key = jax.random.PRNGKey(0)

        def keys():
            nonlocal key
            key, *subs = jax.random.split(key, spd + 1)
            return jnp.stack(subs)

        p, opt_state, loss = step(p, opt_state, keys())
        _ = float(loss)  # materialize; block_until_ready unreliable on tunnels
        t0 = time.perf_counter()
        for _ in range(iters):
            p, opt_state, loss = step(p, opt_state, keys())
        _ = float(loss)
        dt = time.perf_counter() - t0
        rps = n * iters * spd / dt
        print(f"[bench] {tag}: {rps:.1f} rays/s "
              f"({dt / (iters * spd) * 1e3:.0f} ms/step, {spd} steps/dispatch)",
              file=sys.stderr)
        return rps

    # flagship sample budget: 40 kept samples/ray (n_coarse = 2×n_keep, the
    # trainer's fast-path ratio).  Bear-fixture quality gate at this budget:
    # 25.15 dB vs 25.55 parity anchor — inside the ±0.5 dB band (PERF.md
    # n_keep sweep; 32 keep measures faster but fails the gate).  The
    # flagship also enables cross-ray compaction (--compact_frac 0.35
    # --compact_block 64 = 14 slots/ray, gated at 25.34 dB on the full bear
    # run; 12 slots/ray fails by 0.01 dB — docs/PERF.md round-5 budget
    # quantization section).
    def fast(field, p, key, o, d, n_keep=40, occ_state=None, frac=0.35,
             layout="planes"):
        return render_rays_fast(field, p, o, d,
                                occ_state if occ_state is not None else occ,
                                key, fast_settings,
                                n_coarse=2 * n_keep, n_keep=n_keep,
                                train=True, perturb=True,
                                compact_frac=frac, compact_block=64,
                                compact_layout=layout)

    def dense(field, p, key, o, d):
        return render_rays(field, p, o, d, key, dense_settings,
                           train=True, perturb=True)

    # ---- headline: tri-plane flagship on the fast path -------------------
    # (128,512)×(16,8): keeps the 512 fine resolution (25.27 dB bear-fixture
    # vs 25.38 at ×16) while halving the dominant R²·C backward matmul
    tri = TriplaneSpec(resolutions=(128, 512) if on_accel else (16, 32),
                       channels=(16, 8) if on_accel else 4, bwd="matmul")
    field_tri, params_tri = make_field(tri)
    headline = run(field_tri, params_tri, fast,
                   f"fast(-O) triplane 128+512x(16,8) keep40 @{n_rays} rays",
                   n=n_rays)

    # Print the driver's JSON line NOW — before any diagnostic or editing
    # stage can blow the driver's timeout (round 4 lost its official record
    # exactly that way).  An enriched final line is re-printed at the end if
    # everything completes; both are valid headline records.
    baseline = 1.0e6
    out = {
        "metric": "train_step_rays_per_sec_per_chip",
        "value": round(headline, 1),
        "unit": "rays/s",
        "vs_baseline": round(headline / baseline, 4),
    }
    print(json.dumps(out), flush=True)
    if on_accel:
        try:
            with open("BENCH_LAST_GOOD.json", "w") as f:
                json.dump(out, f)
        except OSError:
            pass

    # ---- diagnostics (budget-gated, best-effort) --------------------------
    def diag(fn, tag, need_s=120.0):
        if _remaining() < need_s:
            print(f"[bench] skipping {tag} diagnostic "
                  f"({_remaining():.0f}s budget left < {need_s:.0f}s)",
                  file=sys.stderr)
            return
        try:
            fn()
        except Exception as e:
            print(f"[bench] {tag} diagnostic failed: {e}", file=sys.stderr)

    def fast64(f, p, key, o, d):
        # historical 64-keep budget on the dense-fill grid, no compaction —
        # keeps the grid diagnostics comparable with the round-1/2 numbers
        # in docs/PERF.md
        return fast(f, p, key, o, d, n_keep=64, occ_state=occ_dense, frac=0.0)

    def parity_grid():
        grid = GridSpec(num_levels=16, level_dim=2, base_resolution=16,
                        log2_hashmap_size=21 if on_accel else 10,
                        desired_resolution=8192 if on_accel else 64,
                        gridtype="tiled")
        f, p = make_field(grid)
        run(f, p, fast64, "fast(-O) parity tiledgrid 16x2 keep64")

    def tuned_grid():
        grid = GridSpec(num_levels=8, level_dim=4, base_resolution=16,
                        log2_hashmap_size=21 if on_accel else 10,
                        desired_resolution=8192 if on_accel else 64,
                        gridtype="tiled")
        f, p = make_field(grid)
        run(f, p, fast64, "fast(-O) tuned tiledgrid 8x4 keep64")

    def dense_tri():
        run(field_tri, params_tri, dense, "dense(-O2) triplane")

    def keep64_tri():
        run(field_tri, params_tri, fast64,
            "fast(-O) triplane keep64 densefill (round-2/3 budget)")

    def no_compact():
        run(field_tri, params_tri,
            lambda f, p, key, o, d: fast(f, p, key, o, d, frac=0.0),
            "fast(-O) triplane keep40 realistic-fill, compaction OFF")

    def wide_layout():
        # round-3 [N, K, C] compaction layout (A/B vs the round-5 planes
        # default — the headline above)
        run(field_tri, params_tri,
            lambda f, p, key, o, d: fast(f, p, key, o, d, layout="wide"),
            f"fast(-O) triplane keep40 compact-layout WIDE @{n_rays} rays",
            n=n_rays)

    def dense_fill():
        run(field_tri, params_tri,
            lambda f, p, key, o, d: fast(f, p, key, o, d, occ_state=occ_dense,
                                         frac=0.0),
            "fast(-O) triplane keep40 densefill worst-case")

    if on_accel:
        # The editing bench matters more than grid-family diagnostics: run it
        # FIRST while budget is plentiful (its cold compile is the expensive
        # unknown — 23 s warm-cache, ~10+ min cold), then spend what's left
        # on diagnostics.
        pass

    # ---- editing-step rate (BASELINE.md "SDS edit iteration rate") -------
    edit_out = None
    if (on_accel and not os.environ.get("BENCH_SKIP_EDITING")
            and _remaining() > float(os.environ.get("BENCH_EDIT_MIN_S",
                                                    "240"))):
        import contextlib
        try:
            # trainer/guidance INFO prints go to stderr — stdout must stay
            # JSON-lines-only for the driver
            with contextlib.redirect_stdout(sys.stderr):
                edit_out = bench_editing()
        except Exception as e:
            print(f"[bench] editing bench failed: {e}", file=sys.stderr)
        if edit_out is not None:
            # side artifact so the editing numbers survive even if a later
            # stage (or the enriched re-print) is cut off
            try:
                with open("BENCH_EDITING.json", "w") as f:
                    json.dump(edit_out, f, indent=1)
            except OSError as e:
                print(f"[bench] BENCH_EDITING.json write failed: {e}",
                      file=sys.stderr)
    elif on_accel:
        print(f"[bench] skipping editing bench "
              f"(budget left {_remaining():.0f}s or BENCH_SKIP_EDITING)",
              file=sys.stderr)

    if on_accel:
        diag(wide_layout, "wide-layout")
        diag(no_compact, "no-compact")
        diag(dense_fill, "dense-fill")
        diag(keep64_tri, "keep64-triplane")
        diag(parity_grid, "parity-grid", need_s=180.0)
        diag(tuned_grid, "tuned-grid")
        diag(dense_tri, "dense-triplane")

    if edit_out is not None:
        out["editing_iters_per_sec"] = round(edit_out["fused_compact_128"]
                                             or edit_out["fused_128"], 3)
        if edit_out.get("fused_shipped_res") is not None:
            out["editing_iters_per_sec_shipped_res"] = round(
                edit_out["fused_shipped_res"], 3)
        print(json.dumps(out), flush=True)


def bench_editing():
    """Full-size SDS editing step rate (random SD weights — throughput only).

    Measures the editing drive modes on two frame geometries:
      * 128×128 synthetic view (comparable with the round-2..4 tables);
      * the SHIPPED recipe's frame geometry — bear_tpu.sh phase 2 edits
        the bear-class fixture (400×300) at --train_resolution_level 7,
        i.e. 57×42 = 2394-ray full-image steps (VERDICT r4 weak #3).
    Modes: split 3-program step (render→latents / UNet ε / surrogate bwd,
    3 dispatches) vs fused scan (``editing_steps_many``, K steps/dispatch,
    render once, UNet inline), with cross-ray compaction 0.35/64 on the fused
    path unless BENCH_SKIP_EDIT_COMPACT=1 (compaction is the recommended
    editing config — docs/PERF.md "Editing + compaction").

    Returns a dict {split_128, fused_128, fused_compact_128,
    fused_shipped_res} (missing stages → None)."""
    import shutil

    import jax

    from customnerf_tpu.config import Config
    from customnerf_tpu.data.base import NeRFDataset
    from customnerf_tpu.engine import editing as ed
    from customnerf_tpu.engine.trainer import Trainer
    from customnerf_tpu.guidance.sds import StableDiffusionGuidance

    res = {"split_128": None, "fused_128": None, "fused_compact_128": None,
           "fused_shipped_res": None}

    def make_trainer(h, w, compact):
        ws = "/tmp/bench_edit_ws"
        shutil.rmtree(ws, ignore_errors=True)
        opt = Config(
            data_type="synthetic", workspace=ws, O=True, iters=1000,
            pretrained=True, allow_random_guidance=True, use_ckpt="scratch",
            lambda_sd=0.01, keep_bg=1000.0, cfg=100.0, random_bg_c=True,
            detach_bg=True, soft_mask=True, stage_time=True,
            text="a corgi", text_fg="a corgi", grid_type="triplane",
            num_steps=40, upsample_steps=0, train_size=8, h=h, w=w)
        if compact:
            opt.compact_frac, opt.compact_block = 0.35, 64
        guidance = StableDiffusionGuidance(opt)
        trainer = Trainer("bench_edit", opt, guidance=guidance,
                          use_checkpoint="scratch")
        loader = NeRFDataset(opt, type="train").dataloader()
        return trainer, loader.item(0), opt

    trainer, batch, opt = make_trainer(128, 128, compact=False)

    def tick():
        # materialize a param leaf — block_until_ready is unreliable through
        # the tunnel (CLAUDE.md)
        jax.tree_util.tree_leaves(trainer.params)[0].sum().item()
        return time.perf_counter()

    # split path (3 dispatches / step)
    trainer.global_step = 1
    ed.editing_step(trainer, batch, jax.random.PRNGKey(0))  # compile
    t0 = tick()
    n_split = 3
    for i in range(n_split):
        ed.editing_step(trainer, batch, jax.random.PRNGKey(i + 1))
    res["split_128"] = n_split / (tick() - t0)
    print(f"[bench] editing split 3-program: {res['split_128']:.3f} iters/s",
          file=sys.stderr)

    # fused scan path (K steps / dispatch)
    K = 4
    n_rep = 2

    def run_fused(key0):
        keys = list(jax.random.split(jax.random.PRNGKey(key0), K))
        ed.editing_steps_many(trainer, [batch] * K, keys)  # compile
        t0 = tick()
        for i in range(n_rep):
            keys = list(jax.random.split(jax.random.PRNGKey(key0 + 1 + i), K))
            ed.editing_steps_many(trainer, [batch] * K, keys)
        return n_rep * K / (tick() - t0)

    res["fused_128"] = run_fused(7)
    print(f"[bench] editing fused scan (K={K}): "
          f"{res['fused_128']:.3f} iters/s", file=sys.stderr)

    # compacted editing render — the recommended editing config since
    # session 3d: compact_remat keeps the one-hot matrices out of the fused
    # graph's residuals, so the compile is ~2 min (measured 117 s on chip;
    # it was >25 min without remat) and the rate is +45% (4.59 vs 3.17
    # iters/s).  BENCH_SKIP_EDIT_COMPACT=1 opts out.
    if (not os.environ.get("BENCH_SKIP_EDIT_COMPACT")
            and _remaining() > 180):
        opt.compact_frac, opt.compact_block = 0.35, 64
        trainer._compiled.pop("editing_many", None)  # force a re-build
        t0c = time.perf_counter()
        res["fused_compact_128"] = run_fused(23)
        print(f"[bench] editing fused scan + compaction 0.35/64: "
              f"{res['fused_compact_128']:.3f} iters/s "
              f"(incl. compile {time.perf_counter() - t0c:.0f}s in stage)",
              file=sys.stderr)

    # shipped-recipe frame geometry (bear_tpu.sh phase 2 on the bear-class
    # fixture: 400×300 images at train_resolution_level 7 → 57×42 frames)
    if _remaining() > 180:
        trainer, batch, opt = make_trainer(
            42, 57,
            compact=not os.environ.get("BENCH_SKIP_EDIT_COMPACT"))
        trainer.global_step = 1
        res["fused_shipped_res"] = run_fused(41)
        print(f"[bench] editing fused scan @57x42 shipped-res"
              f"{' + compaction' if opt.compact_frac else ''}: "
              f"{res['fused_shipped_res']:.3f} iters/s", file=sys.stderr)
    return res


if __name__ == "__main__":
    if "--run" in sys.argv[1:]:
        _bench_main()          # child: the actual measurement process
    else:
        main()                 # supervisor (probe + deadlines + fallback)
