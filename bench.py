#!/usr/bin/env python
"""Headline benchmark: training throughput of the canonical unrolled-ResNet
workload (configs/basic/example.yaml: 5 unrolls x 2 resblocks x 64 features,
cine slices of 20 phases x 180 x 64, 8 coils, 2 emaps). The headline point
batches 16 slices with per-unroll remat — the TPU operating point — and
reports per-sample throughput; the reference-protocol bs=1 point rides the
same line as bs1_* (BENCH_BATCH pins an explicit batch instead).

Baseline: the reference's only committed throughput number — ~1.0 it/s for
exactly this workload (bs=1) on its CUDA GPU (reference nohup.out epoch
lines; see BASELINE.md). Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "it/s", "vs_baseline": N}

BENCH_WORKLOAD selects the workload:
  (default)  unrolled-ResNet train step          [the driver-recorded metric]
  recon      unrolled-ResNet inference frames/s  (north-star metric)
  recon_e2e  deployment-path frames/s incl. host prep + transfer
  recon_e2e_compact  same, over the packed acquired-lines wire format
                     (BENCH_WIRE: flat [default] | dict | flat16)
  recon_e2e_wire     all three wire encodings, interleaved in one process
  mesh       mesh-scaling sweep over (data, fsdp, model) factorizations
             of the visible devices (BENCH_MESH / BENCH_MESH_WORKLOAD)
  swin       unrolled-Swin train step            (configs/config_swin.yaml)
  gan        SwinGAN adversarial train step      (configs/config_swingan.yaml)
  dit        DiT DDPM_X diffusion train step     (configs/config_dit.yaml)
  latte      Latte DDPM_X diffusion train step   (configs/config_latte.yaml)
  dslr       DSLR low-rank train step            (configs/config_dslr.yaml)

Every mode also reports achieved TFLOP/s and MFU: FLOPs come from XLA's
compiled cost analysis (fallback: absent on backends that don't expose it),
peak is the v5e chip's 197 TFLOP/s (bf16/f32 MXU issue rate; convs here are
f32, so MFU is conservative).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_IT_S = 1.0  # reference nohup.out: "Epoch 1: ... 1.00it/s"
# reference validation/inference throughput: 2.85 it/s over cine slices of
# ~20 frames (nohup.out "Validating: ... 2.85it/s") -> ~57 frames/s
BASELINE_RECON_FPS = 2.85 * 20
V5E_PEAK_FLOPS = 197e12  # TPU v5e MXU peak (bf16) per chip


# Single-owner discipline for the shared TPU pool: only one process can use
# the chip effectively, so a quality trainer left running by the supervisor
# chain would starve the bench and the recorded number would measure the
# contention, not the framework. train_watchdog.sh records its trainer child
# in TRAINER_PIDFILE and holds (re)launches while BENCH_LOCK exists.
TRAINER_PIDFILE = "/tmp/dl_swin_gan_trainer.pid"
BENCH_LOCK = "/tmp/dl_swin_gan_bench.lock"


def _tpu_arbitration():
    """Context manager: take the bench lock and pause any live trainer.

    While the bench runs: (a) BENCH_LOCK tells train_watchdog.sh to hold
    trainer (re)launches, (b) a trainer recorded in TRAINER_PIDFILE is
    SIGSTOPped, and SIGCONTed on exit. If a supervisor stall-reaper kills
    the stopped trainer meanwhile (the signal lands at SIGCONT), the
    watchdog resumes it from its orbax checkpoint once the lock clears —
    equivalent to one more pool crash, which quality runs already survive.
    Best-effort and disabled by BENCH_NO_ARBITRATION=1; never raises.
    """
    import contextlib
    import signal

    @contextlib.contextmanager
    def _arb():
        if os.environ.get("BENCH_NO_ARBITRATION"):
            yield
            return
        stopped = None
        locked = False
        try:
            with open(BENCH_LOCK, "w") as f:
                f.write(str(os.getpid()))
            locked = True
            with open(TRAINER_PIDFILE) as f:
                pid = int(f.read().strip())
            # only pause a live python trainer, never a recycled pid.
            # /proc/<pid>/cmdline is EMPTY between fork and exec — and the
            # watchdog records the pid right at launch — so retry briefly
            # instead of skipping a trainer that hasn't exec'd yet.
            for _ in range(20):
                with open(f"/proc/{pid}/cmdline", "rb") as f:
                    cmdline = f.read()
                if cmdline:
                    break
                time.sleep(0.05)
            if b"python" in cmdline:
                os.kill(pid, signal.SIGSTOP)
                stopped = pid
        except Exception:
            pass
        try:
            yield
        finally:
            if stopped is not None:
                try:
                    os.kill(stopped, signal.SIGCONT)
                except Exception:
                    pass
            if locked:
                try:
                    os.remove(BENCH_LOCK)
                except Exception:
                    pass

    return _arb()


def _flops_per_call(jitted, *args):
    """FLOPs estimate for one call from the compiled executable."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        f = float(ca.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def _emit(metric, value, unit, baseline=None, flops=None, dt_per_it=None,
          extra=None):
    rec = {"metric": metric, "value": value, "unit": unit,
           "vs_baseline": (round(value / baseline, 3) if baseline else None)}
    if flops and dt_per_it:
        tflops = flops / dt_per_it / 1e12
        rec["tflops"] = round(tflops, 2)
        rec["mfu"] = round(tflops * 1e12 / V5E_PEAK_FLOPS, 4)
    rec.update(extra or {})
    print(json.dumps(rec))


def bench_recon():
    """Reconstruction throughput in frames/sec (BASELINE.md north star:
    >=5x the reference's single-GPU recon throughput)."""
    import jax
    import numpy as np

    from dl_swin_gan_tpu.utils.headline import headline_cfg, headline_shape
    from dl_swin_gan_tpu.data.preprocess import CinePreprocess
    from dl_swin_gan_tpu.data.synthetic import make_cine_example
    from dl_swin_gan_tpu.models import build_denoiser
    from dl_swin_gan_tpu.solvers import build_solver
    from dl_swin_gan_tpu.train import packing

    cfg = headline_cfg()
    if os.environ.get("BENCH_DTYPE"):  # trunk compute dtype (FFT/DC stay f32)
        cfg.MODEL.PARAMETERS.CONV_BLOCK.DTYPE = os.environ["BENCH_DTYPE"]

    T, Y, X, C, E = headline_shape()
    B = int(os.environ.get("BENCH_BATCH", "4"))
    pre = CinePreprocess(cfg, use_seed=True)
    exs = []
    for b in range(B):
        k, m, t = make_cine_example(T=T, Y=Y, X=X, C=C, E=E, seed=b)
        exs.append(pre(k, m, t, f"bench_{b}"))
    batch = packing.pack({key: np.stack([e[key] for e in exs])
                          for key in exs[0]})

    # device-resident batch: the axon relay's host->device path is ~40 MB/s,
    # so re-uploading the batch per call would measure the relay, not the TPU
    batch = jax.tree.map(jax.device_put, batch)

    model = build_solver(cfg, lambda: build_denoiser(cfg))
    params = jax.jit(lambda p_: model.init(
        jax.random.PRNGKey(0), packing.unpack(p_)["kspace"],
        packing.unpack(p_)["maps"], packing.unpack(p_)["mask"],
        x0=packing.unpack(p_)["init_image"])["params"])(batch)

    @jax.jit
    def recon(params, packed):
        b = packing.unpack(packed)
        pred = model.apply({"params": params}, b["kspace"], b["maps"],
                           b["mask"], x0=b["init_image"])
        return packing.pack_jnp(pred)

    def sync(t):
        np.asarray(jax.tree.leaves(t)[0].ravel()[0])

    out = recon(params, batch)
    sync(out)
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    best = float("inf")
    for _ in range(int(os.environ.get("BENCH_REPEATS", "6"))):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = recon(params, batch)
        sync(out)
        best = min(best, time.perf_counter() - t0)

    fps = iters * B * T / best
    _emit("unrolled_resnet_recon_throughput", round(fps, 1), "frames/s",
          baseline=BASELINE_RECON_FPS,
          flops=_flops_per_call(recon, params, batch), dt_per_it=best / iters)


def bench_recon_e2e():
    """Deployment-path reconstruction throughput: frames/s INCLUDING host
    preprocessing (VDkt re-undersampling + normalization + slwin init) and
    host<->device transfer, with the host work prefetch-overlapped against
    device compute — the timing semantics of reference
    `scripts/reconstruct.py:211-240`. The plain `recon` workload is the
    device-resident upper bound; the gap between the two is the input
    pipeline + relay overhead."""
    from concurrent.futures import ThreadPoolExecutor

    import jax
    import numpy as np

    from dl_swin_gan_tpu.utils.headline import headline_cfg, headline_shape
    from dl_swin_gan_tpu.data.synthetic import make_cine_example
    from dl_swin_gan_tpu.infer.reconstruct import Reconstructor
    from dl_swin_gan_tpu.infer.transforms import ResampleTransform

    cfg = headline_cfg()
    cfg.AUG_TRAIN.CROP_READOUT = 0

    T, Y, X, C, E = headline_shape()
    S = int(os.environ.get("BENCH_SLICES", "16"))
    raw = [make_cine_example(T=T, Y=Y, X=X, C=C, E=E, seed=s)[:2]
           for s in range(S)]
    transform = ResampleTransform(12.0, cfg)   # the 12x parity protocol

    first = transform(*raw[0])
    batch0 = {k: np.asarray(v)[None] for k, v in first.items()}

    # params: untrained init (throughput is architecture-, not value-bound)
    from dl_swin_gan_tpu.models import build_denoiser
    from dl_swin_gan_tpu.solvers import build_solver
    from dl_swin_gan_tpu.train import packing
    model = build_solver(cfg, lambda: build_denoiser(cfg))
    params = jax.jit(lambda p: model.init(
        jax.random.PRNGKey(0), packing.unpack(p)["kspace"],
        packing.unpack(p)["maps"], packing.unpack(p)["mask"],
        x0=packing.unpack(p)["init_image"])["params"])(packing.pack(batch0))

    recon = Reconstructor(cfg, params)
    _ = recon(batch0)  # compile + warm

    def run_once():
        with ThreadPoolExecutor(max_workers=2) as pool:
            futs = [pool.submit(
                lambda r: {k: np.asarray(v)[None]
                           for k, v in transform(*r).items()}, r)
                for r in raw]
            t0 = time.perf_counter()
            out = [recon(f.result()) for f in futs]
            _ = np.asarray(out[-1]).ravel()[0]
            return time.perf_counter() - t0

    best = min(run_once() for _ in
               range(int(os.environ.get("BENCH_REPEATS", "3"))))
    fps = S * T / best
    _emit("unrolled_resnet_recon_e2e_throughput", round(fps, 1), "frames/s",
          baseline=BASELINE_RECON_FPS)


def _compact_e2e_variants(wanted):
    """Build the compact e2e workload for the requested wire variants.

    Returns (S, T, variants) where variants is a list of
    (name, make_batch(raw_slice) -> device input, reconstructor, mb/slice).
    Wire variants (infer/compact.py):
      dict    7 arrays/slice (packing.pack'd example dict)
      flat    ONE f32 buffer/slice (bit-lossless; kills per-array latency)
      flat16  ONE f16 buffer/slice (half the bytes; ~1e-3 quantization)
    """
    import numpy as np

    from dl_swin_gan_tpu.utils.headline import headline_cfg, headline_shape
    from dl_swin_gan_tpu.data.synthetic import make_cine_example
    from dl_swin_gan_tpu.infer.compact import (
        CompactReconstructor, CompactTransform, FlatWire, pad_lines,
        wire_bytes)

    cfg = headline_cfg()
    cfg.AUG_TRAIN.CROP_READOUT = 0

    T, Y, X, C, E = headline_shape()
    S = int(os.environ.get("BENCH_SLICES", "16"))
    raw = [make_cine_example(T=T, Y=Y, X=X, C=C, E=E, seed=s)[:2]
           for s in range(S)]
    transform = CompactTransform(cfg, acceleration=12.0)  # 12x protocol

    # static line budget: global max over the set, rounded up (recompile
    # only if a future slice exceeds it)
    probe = [transform(*r) for r in raw]
    n_max = -(-max(p["line_idx"].shape[-1] for p in probe) // 4) * 4
    probe = [pad_lines(p, n_max) for p in probe]

    batch0 = {k: np.asarray(v)[None] for k, v in probe[0].items()}
    recon_dict = CompactReconstructor(cfg, None, ny=Y)
    params = recon_dict.init_params(batch0)
    recon_dict.params = params

    variants = []
    for name in wanted:
        if name == "dict":
            def mk(r, _t=transform, _n=n_max):
                return {k: np.asarray(v)[None]
                        for k, v in pad_lines(_t(*r), _n).items()}
            variants.append((name, mk, recon_dict,
                             wire_bytes(probe[0]) / 1e6))
        else:
            wire = FlatWire(probe[0],
                            np.float16 if name == "flat16" else np.float32)
            rc = CompactReconstructor(cfg, params, ny=Y, wire=wire)

            def mk(r, _t=transform, _n=n_max, _w=wire):
                return _w.encode(pad_lines(_t(*r), _n))[None]
            variants.append((name, mk, rc,
                             wire.length * wire.dtype.itemsize / 1e6))
    return S, T, raw, variants


def _compact_run_once(raw, mk, recon):
    from concurrent.futures import ThreadPoolExecutor

    import numpy as np

    with ThreadPoolExecutor(max_workers=2) as pool:
        futs = [pool.submit(mk, r) for r in raw]
        t0 = time.perf_counter()
        out = [recon(f.result()) for f in futs]
        _ = np.asarray(out[-1]).ravel()[0]
        return time.perf_counter() - t0


def bench_recon_e2e_compact(probe_all=False):
    """Deployment-path throughput over the packed acquired-lines wire
    format: the host packs only the ACQUIRED ky lines (+ maps) per slice —
    what a scanner would actually send — and the device rebuilds the dense
    grid, derives the mask, normalizes, inits, and reconstructs in one
    jitted call (infer/compact.py). Same timing semantics as recon_e2e
    (host work prefetch-overlapped, device-to-host sync at the end); the
    delta between the two workloads is pure transfer economics.

    BENCH_WIRE picks the wire encoding (default flat); probe_all=True
    (BENCH_WORKLOAD=recon_e2e_wire) measures all three variants
    INTERLEAVED in this one process — the hazard-2 protocol — and emits
    one line per variant."""
    wanted = (["dict", "flat", "flat16"] if probe_all
              else [os.environ.get("BENCH_WIRE", "flat")])
    S, T, raw, variants = _compact_e2e_variants(wanted)

    reps = int(os.environ.get("BENCH_REPEATS", "3"))
    best = {name: float("inf") for name, *_ in variants}
    for name, mk, rc, _mb in variants:  # compile + warm
        _ = rc(mk(raw[0]))
    for _ in range(reps):  # interleaved: one repeat of each, round-robin
        for name, mk, rc, _mb in variants:
            best[name] = min(best[name], _compact_run_once(raw, mk, rc))

    for name, _mk, _rc, mb in variants:
        suffix = "" if name == "flat" else f"_{name}"
        _emit(f"unrolled_resnet_recon_e2e_compact{suffix}_throughput",
              round(S * T / best[name], 1), "frames/s",
              baseline=BASELINE_RECON_FPS,
              extra={"wire_mb_per_slice": round(mb, 4)})


def bench_trainer_workload(kind: str):
    """Bench the REAL trainer train-step for swin / dit / dslr workloads on
    the canonical cine slice, device-resident, min over repeats."""
    import jax
    import numpy as np

    from dl_swin_gan_tpu.config import load_cfg
    from dl_swin_gan_tpu.data.preprocess import CinePreprocess
    from dl_swin_gan_tpu.data.synthetic import make_cine_example
    from dl_swin_gan_tpu.parallel.mesh import shard_batch
    from dl_swin_gan_tpu.train import packing

    yaml = {"swin": "configs/config_swin.yaml",
            "dit": "configs/config_dit.yaml",
            "latte": "configs/config_latte.yaml",
            "dslr": "configs/config_dslr.yaml",
            "gan": "configs/config_swingan.yaml"}[kind]
    # BENCH_CONFIG points at any config yaml (e.g. configs/quality/*.yaml)
    # to cost a specific run before committing TPU-hours to it
    yaml = os.environ.get("BENCH_CONFIG", yaml)
    cfg = load_cfg(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                yaml), freeze=False)
    cfg.MODEL.STRATEGY = "none"   # single-chip bench
    cfg.OUTPUT_DIR = "/tmp/bench"
    if os.environ.get("BENCH_DTYPE"):  # trunk compute dtype (convs and
        # DiT/Latte attention+MLP both key off CONV_BLOCK.DTYPE)
        cfg.MODEL.PARAMETERS.CONV_BLOCK.DTYPE = os.environ["BENCH_DTYPE"]
    cfg.freeze()

    T, Y, X, C, E = 20, 180, 64, 8, 2
    if os.environ.get("BENCH_SHAPE"):  # "T,Y,X,C" override for smoke tests
        T, Y, X, C = (int(v) for v in os.environ["BENCH_SHAPE"].split(","))
    B = int(os.environ.get("BENCH_BATCH", "1"))

    def measure(B):
        pre = CinePreprocess(cfg, use_seed=True, lr_decom=(kind == "dslr"))
        exs = []
        for b in range(B):
            k, m, t = make_cine_example(T=T, Y=Y, X=X, C=C, E=E, seed=b)
            exs.append(pre(k, m, t, f"bench_{b}"))
        batch = {key: np.stack([e[key] for e in exs]) for key in exs[0]}

        if kind in ("dit", "latte"):
            from dl_swin_gan_tpu.train.diffusion_trainer import DiffusionTrainer
            trainer = DiffusionTrainer(cfg)
            batch = trainer.prepare_batch(batch)
        elif kind == "dslr":
            from dl_swin_gan_tpu.train.dslr_trainer import DSLRTrainer
            trainer = DSLRTrainer(cfg)
        elif kind == "gan":
            from dl_swin_gan_tpu.train.gan_trainer import GANTrainer
            trainer = GANTrainer(cfg)
        else:
            from dl_swin_gan_tpu.train.trainer import Trainer
            trainer = Trainer(cfg)

        state = trainer.init_state(batch)
        trainer._build_steps()
        packed = jax.tree.map(jax.device_put,
                              shard_batch(packing.pack(batch), trainer.mesh))

        def sync(metrics):
            np.asarray(jax.tree.leaves(metrics)[0]).ravel()

        state, metrics = trainer._train_step(state, packed)  # compile
        sync(metrics)
        # AFTER the warm-up: lower().compile() builds a separate executable,
        # so calling it first would pay the (relay) compile twice cold
        flops = _flops_per_call(trainer._train_step, state, packed)
        for _ in range(2):
            state, metrics = trainer._train_step(state, packed)
        sync(metrics)

        iters = int(os.environ.get("BENCH_ITERS", "10"))
        best = float("inf")
        for _ in range(int(os.environ.get("BENCH_REPEATS", "6"))):
            t0 = time.perf_counter()
            for _ in range(iters):
                state, metrics = trainer._train_step(state, packed)
            sync(metrics)  # chained donated state; one D2H read flushes all
            best = min(best, time.perf_counter() - t0)
        return iters * B / best, flops, best / iters

    it_s, flops, dt = measure(B)

    extra = {}
    if kind == "dslr" and B == 1 and not os.environ.get("BENCH_NO_BATCHED"):
        # the reference protocol is bs=1 (train_lr.py squeezes the batch
        # dim); the TPU-sensible DSLR operating point batches slices through
        # the vmapped solver — report both in one line
        try:
            bit_s, bflops, bdt = measure(4)
            extra = {"batched_bs": 4,
                     "batched_samples_per_s": round(bit_s, 2)}
            if bflops:
                btf = bflops / bdt / 1e12
                extra["batched_tflops"] = round(btf, 2)
                extra["batched_mfu"] = round(btf * 1e12 / V5E_PEAK_FLOPS, 4)
        except Exception:
            pass

    _emit(f"unrolled_{kind}_train_throughput", round(it_s, 3), "it/s",
          baseline=BASELINE_IT_S, flops=flops, dt_per_it=dt, extra=extra)


def bench_mesh():
    """Mesh-scaling sweep (BENCH_WORKLOAD=mesh): the REAL train step across
    (data, fsdp, model) factorizations of the visible devices, every point
    built and timed interleaved in ONE process, with per-point throughput
    and scaling efficiency vs the first point.

    env:
      BENCH_MESH          explicit points "8x1x1,4x2x1,2x2x2" (DxFxM);
                          default sweeps data-only, data*fsdp and — for the
                          transformer workloads whose trunks match the TP
                          rules — a model-axis point
      BENCH_MESH_WORKLOAD res (default) | swin | dit | latte | gan | dslr
      BENCH_BATCH         GLOBAL batch (default n_devices; must be
                          divisible by each point's data extent — points
                          that don't divide are skipped with a note)

    On CPU (JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8)
    this is the smoke/dryrun; the SAME command on a real multi-chip TPU
    measures ICI scaling immediately (round-4 verdict #10). The driver's
    dryrun_multichip proves the shardings compile+execute; this measures
    what they're worth.
    """
    import jax
    import numpy as np

    from dl_swin_gan_tpu.config import load_cfg
    from dl_swin_gan_tpu.data.preprocess import CinePreprocess
    from dl_swin_gan_tpu.data.synthetic import make_cine_example
    from dl_swin_gan_tpu.parallel.mesh import shard_batch
    from dl_swin_gan_tpu.train import packing

    kind = os.environ.get("BENCH_MESH_WORKLOAD", "res")
    yaml = {"res": "configs/basic/example.yaml",
            "swin": "configs/config_swin.yaml",
            "dit": "configs/config_dit.yaml",
            "latte": "configs/config_latte.yaml",
            "dslr": "configs/config_dslr.yaml",
            "gan": "configs/config_swingan.yaml"}[kind]
    yaml = os.environ.get("BENCH_CONFIG", yaml)

    n = len(jax.devices())
    if os.environ.get("BENCH_MESH"):
        points = [tuple(int(v) for v in s.split("x"))
                  for s in os.environ["BENCH_MESH"].split(",")]
    else:
        points = [(n, 1, 1)]
        if n % 2 == 0 and n > 1:
            points.append((n // 2, 2, 1))
        if n >= 4:
            points.append((1, n, 1))
        if kind in ("swin", "dit", "latte", "gan") and n % 2 == 0 and n > 1:
            points.append((n // 2, 1, 2))  # megatron TP over 'model'
            if n % 4 == 0:
                points.append((n // 4, 2, 2))

    B = int(os.environ.get("BENCH_BATCH", str(n)))
    T, Y, X, C, E = 20, 180, 64, 8, 2
    if os.environ.get("BENCH_SHAPE"):
        T, Y, X, C = (int(v) for v in os.environ["BENCH_SHAPE"].split(","))

    root = os.path.dirname(os.path.abspath(__file__))
    base_cfg = load_cfg(os.path.join(root, yaml), freeze=False)
    base_cfg.MODEL.STRATEGY = "none"
    base_cfg.OUTPUT_DIR = "/tmp/bench"
    if os.environ.get("BENCH_DTYPE"):
        base_cfg.MODEL.PARAMETERS.CONV_BLOCK.DTYPE = os.environ["BENCH_DTYPE"]

    pre = CinePreprocess(base_cfg, use_seed=True, lr_decom=(kind == "dslr"))
    exs = []
    for b in range(B):
        k, m, t = make_cine_example(T=T, Y=Y, X=X, C=C, E=E, seed=b)
        exs.append(pre(k, m, t, f"mesh_{b}"))
    batch = {key: np.stack([e[key] for e in exs]) for key in exs[0]}

    def build(d, f, m):
        cfg = base_cfg.clone()
        cfg.PARALLEL.DATA_AXIS = d
        cfg.PARALLEL.FSDP_AXIS = f
        cfg.PARALLEL.MODEL_AXIS = m
        cfg.freeze()
        if kind in ("dit", "latte"):
            from dl_swin_gan_tpu.train.diffusion_trainer import DiffusionTrainer
            trainer = DiffusionTrainer(cfg)
            b = trainer.prepare_batch(dict(batch))
        elif kind == "dslr":
            from dl_swin_gan_tpu.train.dslr_trainer import DSLRTrainer
            trainer = DSLRTrainer(cfg)
            b = batch
        elif kind == "gan":
            from dl_swin_gan_tpu.train.gan_trainer import GANTrainer
            trainer = GANTrainer(cfg)
            b = batch
        else:
            from dl_swin_gan_tpu.train.trainer import Trainer
            trainer = Trainer(cfg)
            b = batch
        state = trainer.init_state(b)
        trainer._build_steps()
        packed = jax.tree.map(jax.device_put,
                              shard_batch(packing.pack(b), trainer.mesh))
        return trainer, state, packed

    def sync(metrics):
        np.asarray(jax.tree.leaves(metrics)[0]).ravel()

    built = {}
    for (d, f, m) in points:
        if d * f * m > n or B % d:
            print(json.dumps({"metric": f"mesh_{kind}_{d}x{f}x{m}",
                              "skipped": ("exceeds devices" if d * f * m > n
                                          else f"batch {B} % data {d} != 0")}))
            continue
        try:
            trainer, state, packed = build(d, f, m)
            state, metrics = trainer._train_step(state, packed)  # compile
            sync(metrics)
            built[(d, f, m)] = (trainer, state, packed)
        except Exception as e:  # e.g. model-axis with no TP-matchable params
            print(json.dumps({"metric": f"mesh_{kind}_{d}x{f}x{m}",
                              "skipped": f"{type(e).__name__}: {e}"[:200]}))

    iters = int(os.environ.get("BENCH_ITERS", "5"))
    repeats = int(os.environ.get("BENCH_REPEATS", "4"))
    best = {p: float("inf") for p in built}
    for _ in range(repeats):
        for p, (trainer, state, packed) in built.items():
            t0 = time.perf_counter()
            metrics = None
            for _ in range(iters):
                state, metrics = trainer._train_step(state, packed)
            sync(metrics)
            best[p] = min(best[p], (time.perf_counter() - t0) / iters)
            built[p] = (trainer, state, packed)

    base = None
    for p in points:
        if p not in best:
            continue
        d, f, m = p
        sps = B / best[p]
        base = base if base is not None else sps
        _emit(f"mesh_{kind}_train_throughput", round(sps, 3), "samples/s",
              extra={"mesh": f"{d}x{f}x{m}", "global_batch": B,
                     "devices": n, "ms_per_step": round(best[p] * 1e3, 2),
                     "vs_first_point": round(sps / base, 3)})


def _measure_headline(B, remat, dtype=None):
    """One headline measurement: returns (it_s, flops_per_step, dt_per_it)."""
    import jax
    import numpy as np

    from dl_swin_gan_tpu.utils.headline import headline_cfg, headline_shape
    from dl_swin_gan_tpu.data.preprocess import CinePreprocess
    from dl_swin_gan_tpu.data.synthetic import make_cine_example
    from dl_swin_gan_tpu.models import build_denoiser
    from dl_swin_gan_tpu.solvers import build_solver
    from dl_swin_gan_tpu.train import packing
    from dl_swin_gan_tpu.train.losses import compute_metrics, select_loss
    from dl_swin_gan_tpu.train.train_state import make_optimizer

    # canonical workload (reference configs/basic/example.yaml)
    cfg = headline_cfg()
    cfg.MODEL.RECON_LOSS.RENORMALIZE_DATA = False
    cfg.MODEL.PARAMETERS.GRAD_CHECKPOINT = remat
    if dtype:
        cfg.MODEL.PARAMETERS.CONV_BLOCK.DTYPE = dtype

    T, Y, X, C, E = headline_shape()
    pre = CinePreprocess(cfg, use_seed=True)
    exs = []
    for b in range(B):
        k, m, t = make_cine_example(T=T, Y=Y, X=X, C=C, E=E, seed=b)
        exs.append(pre(k, m, t, f"bench_{b}"))
    batch = packing.pack({key: np.stack([e[key] for e in exs]) for key in exs[0]})

    batch = jax.tree.map(jax.device_put, batch)  # see bench_recon note

    model = build_solver(cfg, lambda: build_denoiser(cfg))
    tx = make_optimizer(cfg)

    def _init(packed):
        b = packing.unpack(packed)
        params = model.init(jax.random.PRNGKey(0), b["kspace"], b["maps"],
                            b["mask"], x0=b["init_image"])["params"]
        return params, tx.init(params)

    params, opt_state = jax.jit(_init)(batch)

    def train_step(params, opt_state, packed):
        b = packing.unpack(packed)

        def loss_fn(p):
            pred = model.apply({"params": p}, b["kspace"], b["maps"],
                               b["mask"], x0=b["init_image"])
            metrics = compute_metrics(pred, b["target"], tag="Train")
            return select_loss(metrics, "complex_l1", "Train")

        grads = jax.grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state

    step = jax.jit(train_step, donate_argnums=(0, 1))

    def sync(tree):
        # block_until_ready does not synchronize on the axon tunnel backend;
        # a device-to-host read of one element does.
        np.asarray(jax.tree.leaves(tree)[0].ravel()[0])

    # warmup (compile) + burn-in
    for _ in range(3):
        params, opt_state = step(params, opt_state, batch)
    sync(params)
    # AFTER the warm-up so the AOT cost-analysis compile hits the cache
    flops = _flops_per_call(step, params, opt_state, batch)

    iters = int(os.environ.get("BENCH_ITERS", "20"))
    repeats = int(os.environ.get("BENCH_REPEATS", "6"))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            params, opt_state = step(params, opt_state, batch)
        sync(params)  # steps are chained via donated params; one read flushes all
        best = min(best, time.perf_counter() - t0)

    return iters * B / best, flops, best / iters


def main():
    dtype = os.environ.get("BENCH_DTYPE")
    env_b = os.environ.get("BENCH_BATCH")
    if env_b:
        # explicit operating point: measure exactly what was asked
        B = int(env_b)
        # batched training does not fit HBM without per-unroll remat
        # (5 unrolls of f32 activations at bs>=4 need ~42G)
        remat = B > 1 or bool(os.environ.get("BENCH_REMAT"))
        it_s, flops, dt = _measure_headline(B, remat, dtype)
        _emit("unrolled_resnet_train_throughput", round(it_s, 3), "it/s",
              baseline=BASELINE_IT_S, flops=flops, dt_per_it=dt,
              extra={"batch": B, "remat": remat})
        return

    # Default headline = the TPU-sensible operating point: B=16 slices with
    # per-unroll remat (the measured-best batched point), bf16 trunk
    # compute (FFT/DC stay f32), reported as per-sample throughput
    # (iters*B/s) — the apples-to-apples "cine slices per second per
    # device" against the reference's committed 1.0 it/s at its bs=1
    # protocol point. bf16 is the shipped default as of round 4: the
    # interleaved probe (runs/profile_conv3d_r4.log) measured it 1.13x at
    # B=16 in ONE process, and the full-budget quality row is lossless
    # (configs/quality/resnet_bf16.yaml: SSIM 0.980 vs 0.975 f32). bs=1
    # serializes the chip behind per-layer latency and is an artifact of
    # the reference's protocol, not a deployment point — but it is measured
    # and carried in the same line (bs1_*) for continuity with BENCH_r01/r02.
    it_s, flops, dt = _measure_headline(16, True, dtype or "bfloat16")
    extra = {"batch": 16, "remat": True, "trunk_dtype": dtype or "bfloat16"}

    # The two companion points below each recompile; on a cold/cranky pool a
    # relay compile can hang long enough to eat the whole bench budget and
    # the headline line above would never print. SIGALRM is best-effort (a
    # stuck RPC may defer the exception) but bounds the common case.
    import contextlib
    import signal

    @contextlib.contextmanager
    def _extras_alarm():
        budget = int(os.environ.get("BENCH_EXTRAS_TIMEOUT", "900"))
        if budget <= 0 or not hasattr(signal, "SIGALRM"):
            yield
            return
        def _raise(signum, frame):
            raise TimeoutError("bench extras timed out")
        prev = signal.signal(signal.SIGALRM, _raise)
        signal.alarm(budget)
        try:
            yield
        finally:
            signal.alarm(0)
            signal.signal(signal.SIGALRM, prev)

    try:
        with _extras_alarm():
            # bs=1 inherits the shipped defaults too: bf16 trunk + the
            # auto conv lowering (tapc at bs=1 — models/layers.py)
            s_it, s_flops, s_dt = _measure_headline(1, False,
                                                    dtype or "bfloat16")
        extra["bs1_it_s"] = round(s_it, 3)
        if s_flops:
            stf = s_flops / s_dt / 1e12
            extra["bs1_tflops"] = round(stf, 2)
            extra["bs1_mfu"] = round(stf * 1e12 / V5E_PEAK_FLOPS, 4)
    except Exception:
        pass
    if not dtype and not os.environ.get("BENCH_NO_F32"):
        # f32 trunk companion at the same batched point (the pre-round-4
        # default, kept for continuity with BENCH_r01-r03)
        try:
            with _extras_alarm():
                bit_s, bflops, bdt = _measure_headline(16, True, "float32")
            extra["f32_samples_per_s"] = round(bit_s, 1)
            if bflops:
                btf = bflops / bdt / 1e12
                extra["f32_tflops"] = round(btf, 2)
                extra["f32_mfu"] = round(btf * 1e12 / V5E_PEAK_FLOPS, 4)
        except Exception:
            pass

    _emit("unrolled_resnet_train_throughput", round(it_s, 3), "it/s",
          baseline=BASELINE_IT_S, flops=flops, dt_per_it=dt, extra=extra)


if __name__ == "__main__":
    wl = os.environ.get("BENCH_WORKLOAD", "")
    with _tpu_arbitration():
        if wl == "recon":
            bench_recon()
        elif wl == "recon_e2e":
            bench_recon_e2e()
        elif wl == "recon_e2e_compact":
            bench_recon_e2e_compact()
        elif wl == "recon_e2e_wire":
            bench_recon_e2e_compact(probe_all=True)
        elif wl == "mesh":
            bench_mesh()
        elif wl in ("swin", "dit", "latte", "dslr", "gan"):
            bench_trainer_workload(wl)
        else:
            main()
