"""Benchmark: full differentiable train step (project -> pair expand -> sort
-> tile blend -> loss -> backward -> Adam) on one chip, synthetic scene.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The headline value is the MEDIAN of several timing windows (the tunneled
chip is shared and throttles; the best window and all windows are reported
in detail).  vs_baseline divides by BASELINE_ITERS_PER_SEC.

Baseline anchor: the reference itself publishes no numbers (BASELINE.md).
Two triangulation points for its full train step at 100k Gaussians /
~0.49 Mpix:
  * Official 3DGS (Kerbl et al. 2023, Table 1) trains garden for 30k iters
    in ~36 min on an RTX A6000 at 1297x840 (~1.09 Mpix) with N growing to
    millions — ~14 iters/s, i.e. ~15 Mpix/s of train throughput on a
    ~310 W / 768 GB/s GPU.  Scaled to this workload's 0.49 Mpix that is
    ~31 iters/s — but on hardware with ~4x an Apple M-chip's bandwidth and
    far more compute.
  * The reference's own pipeline is structurally slower than official 3DGS
    (>=6 blocking command buffers per step plus a CPU 8-thread radix sort
    of ~1-2M pairs per frame, tiled_rasterizer.mm:27-102 & SURVEY.md §3.2).
10 iters/s = official-3DGS throughput scaled by ~1/3 for Apple-silicon
bandwidth/compute, i.e. a deliberately generous estimate of the Metal
trainer this framework must beat at equal workload on one TPU v5e chip.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_ITERS_PER_SEC = 10.0


def _lkg_path() -> str:
    """Last-known-good record location (env-overridable for tests)."""
    return os.environ.get(
        "GS_BENCH_LKG_PATH",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench_lkg.json"),
    )


def _save_lkg(record: dict) -> None:
    """Persist a successful measurement so a later pool outage degrades to
    a stale-but-real number instead of 0.0 (VERDICT r4 weak #1)."""
    import subprocess

    try:
        commit = subprocess.run(
            ["git", "-C", os.path.dirname(os.path.abspath(__file__)),
             "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        commit = "unknown"
    try:
        with open(_lkg_path(), "w") as f:
            json.dump({
                "record": record,
                "commit": commit,
                "measured_at": time.strftime(
                    "%Y-%m-%dT%H:%M:%SZ", time.gmtime()
                ),
            }, f, indent=1)
            f.write("\n")
    except OSError:
        pass  # a read-only checkout must not fail the bench


def _claim_failed_diag(timeout: float, attempts: int = 1,
                       smoke: bool = False) -> str:
    """JSON line for a failed device claim.  If a last-known-good
    measurement exists, re-emit it flagged stale (with its commit + date)
    plus the outage diagnostic — two rounds of `value: 0.0` records
    misrepresented a working 6.9 it/s system (VERDICT r4 weak #1).
    A --smoke outage keeps its own metric (pass/fail is not a throughput;
    a stale train-step record there would mislead)."""
    err = (
        f"TPU device claim did not complete within {timeout:.0f}s "
        f"across {attempts} attempt(s) (axon pool unavailable); "
        "no fresh measurement possible"
    )
    if smoke:
        return json.dumps({
            "metric": "tpu_kernel_smoke_pass",
            "value": 0.0,
            "unit": "bool",
            "vs_baseline": 0.0,
            "detail": {"error": err},
        })
    try:
        with open(_lkg_path()) as f:
            lkg = json.load(f)
        record = dict(lkg["record"])
        detail = dict(record.get("detail") or {})
        # only substitute a stale record for the SAME workload/config —
        # an A/B arm (small size, f32 payload, pack_positions, dssim)
        # must not silently report the headline config's number
        small = bool(int(os.environ.get("GS_BENCH_SMALL", "0")))
        want = {
            "n_gaussians": 10_000 if small else 100_000,
            "payload_dtype": os.environ.get("GS_BENCH_PAYLOAD", "bf16"),
            "pack_positions": bool(
                int(os.environ.get("GS_BENCH_PACK_POS", "0"))
            ),
            "dssim_in_grad": bool(
                int(os.environ.get("GS_BENCH_DSSIM_GRAD", "0"))
            ),
        }
        for k, v in want.items():
            if k in detail and detail[k] != v:
                raise KeyError(f"lkg config mismatch: {k}")
        detail.update({
            "stale": True,
            "measured_at": lkg.get("measured_at"),
            "commit": lkg.get("commit"),
            "outage": err,
        })
        record["detail"] = detail
        return json.dumps(record)
    except (OSError, ValueError, KeyError, TypeError):
        return json.dumps({
            "metric": "train_step_iters_per_sec",
            "value": 0.0,
            "unit": "iters/s",
            "vs_baseline": 0.0,
            "detail": {"error": err},
        })


def _arm_device_watchdog(smoke: bool = False) -> "object":
    """The tunneled chip claim can hang indefinitely when the shared pool
    is unavailable (observed: multi-hour outages).  Rather than hanging the
    whole bench run silently, exit rc=3 after GS_BENCH_DEVICE_TIMEOUT
    seconds (default 600) unless disarmed.  Under the retry supervisor
    (see _supervise) the diagnostic goes to stderr and the supervisor
    retries; standalone, the diagnostic JSON line goes to stdout."""
    import sys
    import threading

    timeout = float(os.environ.get("GS_BENCH_DEVICE_TIMEOUT", "600"))
    child = bool(int(os.environ.get("GS_BENCH_CHILD", "0")))
    ev = threading.Event()

    def fire():
        if ev.wait(timeout):
            return
        out = sys.stderr if child else sys.stdout
        print(_claim_failed_diag(timeout, smoke=smoke), file=out, flush=True)
        os._exit(3)

    threading.Thread(target=fire, daemon=True).start()
    return ev


def smoke() -> None:
    """On-chip kernel smoke (~2 min incl. compile, VERDICT r3 item 5): compile
    and run the REAL windowed Mosaic kernels — block=128, chunked grid, both
    f32 and bf16 payload — and check the rendered image and parameter
    gradients against the independent XLA blend path on the same device.
    CPU tests only ever exercise Pallas in interpret mode at pair_block=16,
    so this is the only guard against a Mosaic compile/numerics regression
    short of the full bench.  Prints ONE JSON line; exit 0 iff all checks
    pass."""
    # force the chunked-grid code shape at smoke scale (several calls of
    # <=512 blocks instead of one big grid)
    os.environ.setdefault("GS_MAX_CALL_BLOCKS", "512")

    import jax

    watchdog = _arm_device_watchdog(smoke=True)
    jax.devices()
    watchdog.set()

    import jax.numpy as jnp

    from gaussiansplatting_tpu.config import Config, RasterConfig
    from gaussiansplatting_tpu.ops.losses import photometric_loss
    from gaussiansplatting_tpu.ops.rasterize import render
    from gaussiansplatting_tpu.train import optimizer
    from gaussiansplatting_tpu.utils import synthetic

    n_gauss, width, height = 20_000, 512, 384
    pair_cap = 1 << 18
    params = synthetic.make_scene(n=n_gauss, seed=0)
    camera = synthetic.make_canonical_camera(width=width, height=height)
    gt = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (height, width, 3)), np.float32
    )

    def run(blend_impl: str, payload: str, pack_pos: bool = False):
        cfg = Config(raster=RasterConfig(
            pair_capacity=pair_cap, pair_block=128,
            blend_impl=blend_impl, payload_dtype=payload,
            pack_positions=pack_pos,
        ))

        def loss_fn(trainable):
            p = params.replace(**trainable)
            img, aux = render(p, camera, cfg.raster)
            rep = photometric_loss(img, gt, cfg.loss)
            return rep.grad_loss, (img, aux)

        trainable = {f: getattr(params, f) for f in optimizer.TRAINABLE}
        (loss, (img, aux)), grads = jax.jit(
            jax.value_and_grad(loss_fn, has_aux=True)
        )(trainable)
        jax.block_until_ready(grads)
        return np.asarray(img), {k: np.asarray(v) for k, v in grads.items()}, aux

    t0 = time.perf_counter()
    img_xla, g_xla, _ = run("xla", "f32")
    img_p32, g_p32, aux = run("pallas", "f32")
    img_p16, g_p16, _ = run("pallas", "bf16")
    # tile-relative bf16 position packing (pack_positions, roadmap #5):
    # one fewer fat-sort operand; same bf16 envelope
    img_pp, g_pp, _ = run("pallas", "bf16", pack_pos=True)

    def gdiff(ga, gb):
        # worst relative-norm error across parameter groups
        out = 0.0
        for k in ga:
            na = float(np.linalg.norm(ga[k] - gb[k]))
            nb = float(np.linalg.norm(ga[k])) + 1e-12
            out = max(out, na / nb)
        return out

    img_diff_f32 = float(np.abs(img_p32 - img_xla).max())
    img_diff_bf16 = float(np.abs(img_p16 - img_xla).max())
    img_diff_pp = float(np.abs(img_pp - img_xla).max())
    grad_rel_f32 = gdiff(g_xla, g_p32)
    grad_rel_bf16 = gdiff(g_xla, g_p16)
    grad_rel_pp = gdiff(g_xla, g_pp)
    # envelopes: f32 paths are the same math (tolerance = accumulation
    # order); bf16 payload is the tests/test_packing.py envelope;
    # pack_positions adds radius-bounded position quantization (~0.035
    # worst-case power error) on top of it
    ok = (
        img_diff_f32 < 1e-3 and grad_rel_f32 < 1e-2
        and img_diff_bf16 < 0.06 and grad_rel_bf16 < 0.08
        and img_diff_pp < 0.08 and grad_rel_pp < 0.10
        and np.isfinite(img_p32).all() and np.isfinite(img_p16).all()
        and np.isfinite(img_pp).all()
    )
    print(json.dumps({
        "metric": "tpu_kernel_smoke_pass",
        "value": 1.0 if ok else 0.0,
        "unit": "bool",
        "vs_baseline": 1.0 if ok else 0.0,
        "detail": {
            "device": str(jax.devices()[0]),
            "backend": jax.default_backend(),
            "seconds": round(time.perf_counter() - t0, 1),
            "n_gaussians": n_gauss,
            "resolution": [width, height],
            "num_pairs": int(aux.num_pairs),
            "pair_block": 128,
            "max_call_blocks": int(os.environ["GS_MAX_CALL_BLOCKS"]),
            "img_maxdiff_pallas_f32_vs_xla": round(img_diff_f32, 7),
            "img_maxdiff_pallas_bf16_vs_xla": round(img_diff_bf16, 5),
            "img_maxdiff_pack_positions_vs_xla": round(img_diff_pp, 5),
            "grad_relnorm_f32": round(grad_rel_f32, 6),
            "grad_relnorm_bf16": round(grad_rel_bf16, 5),
            "grad_relnorm_pack_positions": round(grad_rel_pp, 5),
        },
    }), flush=True)
    raise SystemExit(0 if ok else 1)


def _supervise() -> None:
    """Retry-until-claimed wrapper (VERDICT r3 weak #6): a transient pool
    outage must not zero a whole round's evidence.  Re-attempts the bench
    in a fresh subprocess (a hung jax runtime cannot recover in-process)
    every GS_BENCH_RETRY_SLEEP s until GS_BENCH_RETRY_BUDGET s elapse;
    each attempt's own claim window is GS_BENCH_DEVICE_TIMEOUT s."""
    import subprocess
    import sys

    budget = float(os.environ.get("GS_BENCH_RETRY_BUDGET", "7200"))
    sleep_s = float(os.environ.get("GS_BENCH_RETRY_SLEEP", "120"))
    t0 = time.monotonic()
    env = dict(os.environ, GS_BENCH_CHILD="1")
    attempts = 0
    while True:
        attempts += 1
        rc = subprocess.call(
            [sys.executable, os.path.abspath(__file__)] + sys.argv[1:], env=env
        )
        if rc != 3:
            raise SystemExit(rc)
        elapsed = time.monotonic() - t0
        print(
            f"bench: claim attempt {attempts} timed out "
            f"({elapsed:.0f}s/{budget:.0f}s of retry budget used)",
            file=sys.stderr, flush=True,
        )
        if elapsed + sleep_s >= budget:
            is_smoke = "--smoke" in sys.argv or bool(
                int(os.environ.get("GS_BENCH_SMOKE", "0"))
            )
            print(
                _claim_failed_diag(elapsed, attempts, smoke=is_smoke),
                flush=True,
            )
            raise SystemExit(3)
        time.sleep(sleep_s)


def main() -> None:
    small = bool(int(os.environ.get("GS_BENCH_SMALL", "0")))
    n_gauss = 10_000 if small else 100_000
    width, height = (256, 192) if small else (800, 608)
    pair_cap = (1 << 17) if small else (1 << 21)
    steps = 5 if small else 8

    import jax

    watchdog = _arm_device_watchdog()
    jax.devices()              # the claim either completes or the watchdog fires
    watchdog.set()

    import jax.numpy as jnp

    from gaussiansplatting_tpu.config import Config, LossConfig, RasterConfig
    from gaussiansplatting_tpu.train import state as train_state
    from gaussiansplatting_tpu.train.trainer import train_step, train_steps
    from gaussiansplatting_tpu.utils import synthetic

    # Reference-gradient parity: the Metal trainer this bench compares
    # against backpropagates pure L1 and uses D-SSIM only as a reported
    # metric (tiled_shaders.metal:417-423) — so the benchmarked step does
    # the same.  GS_BENCH_DSSIM_GRAD=1 measures the beyond-reference mode
    # (differentiated D-SSIM, the framework default for training quality).
    dssim_in_grad = bool(int(os.environ.get("GS_BENCH_DSSIM_GRAD", "0")))
    # bf16 sort-payload packing + bf16 MXU prefix matmuls by default: the
    # reference itself blends in HALF precision (tiled_shaders.metal:
    # 326-328), so sub-f32 render-data/cotangent precision is inside its
    # numerical envelope (VERDICT r2 item 1a).  GS_BENCH_PAYLOAD=f32
    # measures the full-precision mode.
    payload = os.environ.get("GS_BENCH_PAYLOAD", "bf16")
    # tile-relative bf16 position packing (pack_positions, roadmap #5):
    # GS_BENCH_PACK_POS=1 measures the 7-operand fat sort
    pack_pos = bool(int(os.environ.get("GS_BENCH_PACK_POS", "0")))
    cfg = Config(
        raster=RasterConfig(
            pair_capacity=pair_cap, pair_block=128, payload_dtype=payload,
            pack_positions=pack_pos,
        ),
        loss=LossConfig(dssim_in_grad=dssim_in_grad),
    )
    params = synthetic.make_scene(n=n_gauss, seed=0)
    camera = synthetic.make_canonical_camera(width=width, height=height)
    gt = np.asarray(
        np.random.default_rng(1).uniform(0, 1, (height, width, 3)), np.float32
    )

    st = train_state.create(params)
    # warmup / compile
    st, metrics = train_step(st, camera, gt, cfg, 30_000)
    jax.block_until_ready(st)

    # The timed unit is the framework's real training dispatch: train_steps
    # scans `steps` optimization steps (one per view) into ONE device
    # program, exactly as train_loop(scan_steps=...) dispatches between
    # schedule events.  The reference's loop pays >=6 blocking syncs per
    # step (SURVEY.md §3.2); per-single-step dispatch wall is reported in
    # detail for comparison.
    cams_k = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *([camera] * steps)
    )
    gts_k = jnp.broadcast_to(jnp.asarray(gt), (steps,) + gt.shape)
    st, ms = train_steps(st, cams_k, gts_k, cfg, 30_000)  # compile
    metrics = jax.tree_util.tree_map(lambda x: x[-1], ms)
    jax.block_until_ready(st)

    windows = []
    for _ in range(5):
        t0 = time.perf_counter()
        st, ms = train_steps(st, cams_k, gts_k, cfg, 30_000)
        jax.block_until_ready(st)
        windows.append(steps / (time.perf_counter() - t0))

    # per-single-dispatch rate (the round-2 measurement mode): best of 3
    # windows (the shared chip throttles — CLAUDE.md)
    pd = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            st, _m1 = train_step(st, camera, gt, cfg, 30_000)
        jax.block_until_ready(st)
        pd.append(steps / (time.perf_counter() - t0))
    per_dispatch_ips = max(pd)

    # headline = median (robust to the shared chip's throttling dips);
    # best-of-N reported as detail (closest to the hardware's own rate)
    srt = sorted(windows)
    median_ips = srt[len(srt) // 2]
    best_ips = srt[-1]
    mpix_per_sec = median_ips * width * height / 1e6

    # distance to speed of light (utils/sol.py): single-touch bytes + MXU
    # flops at the dispatched static shapes vs the measured step time
    from gaussiansplatting_tpu.utils import sol

    m = sol.step_model(
        n_gauss, pair_cap, height, width,
        packed=cfg.raster.payload_dtype == "bf16",
        pack_positions=cfg.raster.pack_positions,
    )
    step_ms = 1e3 / best_ips     # best window ~= the hardware's own rate
    sol_detail = {
        "hbm_gbps_achieved": round(m["bytes_total"] / step_ms / 1e6, 1),
        "mfu_pct": round(
            m["mxu_flops"] / (step_ms * 1e-3) / (sol.V5E_F32_TFLOPS * 1e12)
            * 100.0, 2,
        ),
        "model_bound_fraction": round(m["floor_ms"] / step_ms, 3),
        "floor_ms_single_touch": round(m["floor_ms"], 2),
        "note": (
            "single-touch byte model (lax.sort really multi-pass, ~9x "
            "per operand) — achieved GB/s understates truth; see "
            "utils/sol.py + docs/DESIGN.md"
        ),
    }

    # per-stage split (the reference's per-100-frame stage printout,
    # tiled_rasterizer.mm:639-671): cumulative stages measured with the same
    # fori-loop differencing as tools/profile.py.  OPT-IN (GS_BENCH_STAGES=1):
    # it recompiles three more full-size programs (~90 s each on the tunneled
    # remote compiler, measured 2026-08-18), which pushed the whole bench past
    # the driver's timeout — and CLAUDE.md documents that differently-DCE'd
    # cumulative probes mislead by 2-5x anyway; tools/trace.py is the real
    # per-op profiler.
    stages = {}
    if not small and bool(int(os.environ.get("GS_BENCH_STAGES", "0"))):
        from gaussiansplatting_tpu.tools.profile import stage_times

        # pairs pipeline / +blend / full step (cumulative); loss ~= step-fwd
        # residual.  train_step reuses the already-compiled program above.
        stages = stage_times(
            n=n_gauss, width=width, height=height,
            pair_capacity=pair_cap, pair_block=128,
            names=("project_pairs", "forward", "train_step"),
        )

    record = (
            {
                "metric": f"train_step_iters_per_sec_{n_gauss // 1000}k_{width}x{height}",
                "value": round(median_ips, 3),
                "unit": "iters/s",
                "vs_baseline": round(median_ips / BASELINE_ITERS_PER_SEC, 3),
                "detail": {
                    "n_gaussians": n_gauss,
                    "resolution": [width, height],
                    "train_mpix_per_sec": round(mpix_per_sec, 2),
                    "best_iters_per_sec": round(best_ips, 3),
                    "per_dispatch_iters_per_sec": round(per_dispatch_ips, 3),
                    "scan_steps": steps,
                    "windows": [round(w, 3) for w in windows],
                    "num_pairs": int(metrics.num_pairs),
                    "payload_dtype": payload,
                    "pack_positions": pack_pos,
                    "dssim_in_grad": dssim_in_grad,
                    "loss_semantics": (
                        "reference parity: L1-only backward "
                        "(tiled_shaders.metal:417-423); D-SSIM metric-only"
                        if not dssim_in_grad
                        else "beyond-reference: D-SSIM differentiated"
                    ),
                    "stages_ms_cumulative": {
                        k: round(v, 2) for k, v in stages.items()
                    },
                    "speed_of_light": sol_detail,
                    "baseline_anchor": (
                        "10 iters/s: official-3DGS A6000 rate (~14 it/s @ "
                        "1.09 Mpix = ~31 it/s @ this 0.49 Mpix) scaled ~1/3 "
                        "for the Metal reference's Apple-silicon target; see "
                        "bench.py docstring"
                    ),
                    "device": str(jax.devices()[0]),
                },
            }
    )
    print(json.dumps(record))
    if not small:
        _save_lkg(record)


if __name__ == "__main__":
    import sys

    _smoke = "--smoke" in sys.argv or bool(
        int(os.environ.get("GS_BENCH_SMOKE", "0"))
    )
    if bool(int(os.environ.get("GS_BENCH_CHILD", "0"))) or bool(
        int(os.environ.get("GS_BENCH_NO_RETRY", "0"))
    ):
        smoke() if _smoke else main()
    else:
        _supervise()
