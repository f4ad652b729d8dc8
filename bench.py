#!/usr/bin/env python
"""Headline benchmark: LSTM + ResNet-101 training-step throughput.

Matches the reference's measured configuration — frozen-CNN phase of
`train_LSTM.py`, whose committed logs give a median 103.8 ms / batch-12
step ≈ 115 images/sec on its GPU (BASELINE.md). Here the whole
iteration (uint8→normalized preprocess, ResNet-101 forward, LSTM
teacher-forced decode, backward, Adam update) is one donated XLA
program in bf16 on the TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Built to survive a cold, flaky, or DOWN TPU relay — the capture emits a
parseable JSON line in EVERY relay state:
- an orchestrator/child split: the whole measurement (backend init,
  prewarm, compile, measure) runs in ONE killable child per attempt
  (a hung `jax.devices()` can never be interrupted in-process —
  BENCH_r01 died exactly there; and each extra backend client per
  invocation is another chance to wedge the relay, so there is no
  separate probe process). The orchestrator kills + retries a child
  whose init emits no `backend_up` marker within --probe-timeout;
  the FIRST attempt gets at most half the budget so the retry loop is
  actually reachable on a first-attempt overrun (BENCH_r04 handed
  attempt 1 everything and exited "no budget left" at 1/3 attempts),
  and a child that has passed `backend_up` gets a bounded grace window
  past its budget before being killed (BENCH_r04's child was killed
  16 s after its train-scan compile finally started);
- parameter init happens OFF the relay: eager `model.init` round-trips
  the relay once per op and ate 165 s of BENCH_r04's child budget
  before any measurement could start. `cached_model_init` computes the
  params on the host CPU backend (local compute) with batch-1 inputs
  (param shapes are batch-free), memoizes them to
  runs/bench/init_cache keyed on the model signature, and ships them
  to the device in ONE device_put; optimizer init is one jitted
  program (persistent-cached);
- PROVISIONAL measurement lines stream to stdout after the child's
  FIRST completed call (and again after calibration) — a capture
  killed mid-window still carries a real device number (BENCH_r03
  died with none);
- if the backend never comes up (or the child dies/hangs), the
  orchestrator prints a structured-error JSON line for the requested
  metric and then runs the backend-free host input-pipeline measurement
  so the capture still records a real number;
- persistent XLA compilation cache under runs/xla_cache (a re-run skips
  the ResNet-101 scan compile entirely);
- heartbeat lines on stderr at every phase plus a 30 s watchdog, so a
  timed-out capture's tail says exactly where it died;
- a wall-clock budget (--budget, default 420 s): probes, the child, and
  the measurement window are all sized to fit it — the final stdout
  line is always a parseable measurement;
- every successful run appends its raw result + environment to
  runs/bench/results.jsonl (the committed evidence behind README
  numbers).
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import pickle
import subprocess
import sys
import threading
import time
from functools import partial

T0 = time.time()
REPO = os.path.dirname(os.path.abspath(__file__))
REFERENCE_IMG_PER_SEC = 115.0   # BASELINE.md: 103.8 ms @ bs12
_PHASE = {"name": "startup", "since": T0}
_PREWARM = {"thread": None, "error": None}

# Static metric names + reference baselines (BASELINE.md — the
# reference only timed the LSTM and ViT-B families). Module-level so
# the orchestrator's error path can name the requested metric without
# importing the model stack.
FAMILY_METRICS = {
    "lstm": ("lstm_resnet101_train_images_per_sec", 115.0),
    "attention": ("attention_lstm_resnet101_train_images_per_sec", None),
    "transformer": ("transformer_resnet101_train_images_per_sec", None),
    "vitb": ("vitb16_train_images_per_sec", 14.0),
}


def requested_metric_name(args) -> str:
    """The metric this invocation would have measured (error-line id)."""
    if args.metric == "dense":
        return f"gt_dense_train_regions_per_sec_img{args.image_size}"
    if args.metric == "dense-decode":
        return f"rpn_dense_decode_regions_per_sec_img{args.image_size}"
    if args.metric == "transfer":
        return "host_to_device_put_MB_per_sec"
    name = FAMILY_METRICS[args.family][0]
    if args.metric == "decode":
        return name.replace("_train_images_per_sec",
                            f"_beam{args.beam_size}_captions_per_sec")
    if args.metric == "e2e":
        return name.replace("_train_", "_e2e_train_")
    return name


def _spc_ladder(args):
    """steps-per-call escalation: an explicit --steps-per-call runs
    alone; the default measures at spc=1 first (cheapest legitimate
    device number, emitted before anything expensive compiles) and then
    re-measures at the dispatch-amortized spc=10 with leftover budget."""
    if args.steps_per_call is not None:
        return [max(args.steps_per_call, 1)]
    return [1, 10]


def hb(msg: str) -> None:
    print(f"[bench {time.time() - T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def phase(name: str) -> None:
    _PHASE["name"], _PHASE["since"] = name, time.time()
    hb(name)


def start_watchdog(interval: float = 30.0) -> None:
    """Every `interval` s, report the phase we are (possibly stuck) in —
    a timed-out run's stderr tail then pinpoints the hang."""
    def run():
        while True:
            time.sleep(interval)
            hb(f"watchdog: still in '{_PHASE['name']}' "
               f"({time.time() - _PHASE['since']:.0f}s so far)")
    threading.Thread(target=run, daemon=True).start()


def setup_jax():
    """Compilation cache + platform override, then backend init + a
    one-op prewarm. Emits the `backend_up` / `prewarmed` stderr markers
    the orchestrator watches: no marker within its init timeout → the
    child is hung in backend init and gets killed + retried."""
    phase("importing jax")
    import jax
    # Honor an explicit JAX_PLATFORMS env even when a TPU-tunnel
    # sitecustomize force-set jax_platforms at interpreter start.
    want = os.environ.get("JAX_PLATFORMS")
    if want and (jax.config.jax_platforms or "") != want:
        try:
            jax.config.update("jax_platforms", want)
        except RuntimeError:
            pass
    # Keep the host CPU backend reachable next to the relay platform:
    # `cached_model_init` computes params there (local eager compute, no
    # per-op relay roundtrips). The first-named platform stays the
    # default, so jax.devices() / placement are unchanged.
    plats = jax.config.jax_platforms or ""
    if plats and "cpu" not in plats.split(","):
        try:
            jax.config.update("jax_platforms", plats + ",cpu")
        except RuntimeError:
            pass
    phase("acquiring devices (backend init)")
    devs = jax.devices()
    hb(f"backend_up devices: {devs}")
    if devs[0].platform != "cpu":
        # Persistent compilation cache: a re-run (or the driver's run
        # after ours) skips the whole ResNet-101 scan compile. Set
        # before the first compile; skipped on CPU where XLA:CPU AOT
        # reload across machines is unreliable.
        cache = os.path.join(REPO, "runs", "xla_cache")
        os.makedirs(cache, exist_ok=True)
        for flag, val in (("jax_compilation_cache_dir", cache),
                          ("jax_persistent_cache_min_compile_time_secs", 0.0),
                          ("jax_persistent_cache_min_entry_size_bytes", -1)):
            try:
                jax.config.update(flag, val)
            except (AttributeError, ValueError):
                pass
        hb(f"compilation cache at {cache}")
    # Prewarm: compile+execute+readback one trivial program so a relay
    # that enumerates devices but cannot run programs fails in a cheap
    # spot and not inside the big train scan. Runs in the BACKGROUND:
    # the first program execution on a fresh relay client measures
    # ~50 s even when the relay is warm (per-client session setup), and
    # model construction + host-CPU param init need no device — they
    # overlap it. `join_prewarm()` gates the first real device use.
    phase("prewarm (1-op jit, background)")
    import jax.numpy as jnp

    def _prewarm_run():
        t0 = time.time()
        try:
            val = float(jax.jit(lambda x: x + 1)(jnp.float32(1)))
            hb(f"prewarmed ({val:.0f}) in {time.time() - t0:.1f}s")
        except BaseException as e:        # re-raised at join_prewarm()
            _PREWARM["error"] = e
            hb(f"prewarm FAILED after {time.time() - t0:.1f}s: {e}")
    th = threading.Thread(target=_prewarm_run, daemon=True)
    th.start()
    _PREWARM["thread"] = th
    return jax


def join_prewarm() -> None:
    """Block until the background prewarm completed; raise if it failed
    (a relay that enumerates devices but cannot run programs must abort
    the child before the big compile, same contract as the old inline
    prewarm)."""
    th = _PREWARM.get("thread")
    if th is not None:
        if th.is_alive():
            phase("waiting for background prewarm (1-op jit)")
        th.join()
        _PREWARM["thread"] = None
    if _PREWARM.get("error") is not None:
        raise RuntimeError(f"prewarm failed: {_PREWARM['error']!r}")


def cached_model_init(model, rngs, init_args, init_kwargs, cache_tag: str):
    """`model.init` OFF the relay, then one device_put.

    BENCH_r04's child spent 165 s inside eager `model.init`: every init
    op round-trips the remote relay individually, and it happens before
    any provisional measurement is possible. Here init runs as local
    eager compute on the host CPU backend with batch-1 slices of the
    inputs (parameter shapes do not depend on the batch dimension, and
    JAX PRNG is platform-deterministic, so the values are identical),
    is memoized to runs/bench/init_cache keyed on `cache_tag`, and the
    resulting pytree ships to the default device in ONE device_put.
    Falls back to a single jitted init program (persistent-cached) when
    no CPU backend is reachable."""
    import jax
    import numpy as np
    cache_dir = os.path.join(REPO, "runs", "bench", "init_cache")
    key = hashlib.sha1(cache_tag.encode()).hexdigest()[:16]
    path = os.path.join(cache_dir, f"init_{key}.pkl")
    variables = None
    if os.path.exists(path):
        phase(f"init: loading cached params [{cache_tag}]")
        try:
            with open(path, "rb") as f:
                variables = pickle.load(f)
        except Exception as e:
            hb(f"init cache unreadable ({e}); recomputing")
    if variables is None:
        host_args = tuple(
            np.asarray(a[:1]) if getattr(a, "ndim", 0) > 0 else a
            for a in init_args)
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:
            cpu = None
        if cpu is not None:
            phase(f"init: computing params on host CPU [{cache_tag}]")
            cpu_rngs = jax.tree.map(lambda k: jax.device_put(k, cpu), rngs)
            with jax.default_device(cpu):
                variables = model.init(cpu_rngs, *host_args, **init_kwargs)
        else:
            join_prewarm()
            phase(f"init: jitted init on device [{cache_tag}]")
            variables = jax.jit(
                lambda r, *a: model.init(r, *a, **init_kwargs)
            )(rngs, *host_args)
        variables = jax.tree.map(np.asarray, variables)
        try:
            os.makedirs(cache_dir, exist_ok=True)
            with open(path, "wb") as f:
                pickle.dump(variables, f)
            hb(f"init cache written: {path}")
        except Exception as e:
            hb(f"init cache write failed (non-fatal): {e}")
    # No prewarm join here: device_put + optimizer init are raw relay
    # transfers that proceed (and fail) independently of program
    # execution; measure_chained joins right before the warmup call.
    phase("init: device_put params (one transfer)")
    t0 = time.perf_counter()
    variables = jax.device_put(variables)
    nbytes = sum(getattr(x, "nbytes", 0)
                 for x in jax.tree.leaves(variables))
    hb(f"params on device: {nbytes / 2**20:.0f} MiB in "
       f"{time.perf_counter() - t0:.1f}s")
    return variables


def create_train_state_cached(model, tx, images, gt, cache_tag: str,
                              seed: int = 123):
    """`steplib.create_train_state` with relay-safe init: same PRNG key
    splits (so params match the driver's), params via cached_model_init,
    optimizer state as one jitted program instead of hundreds of eager
    per-leaf zeros_like dispatches."""
    import jax
    import jax.numpy as jnp

    from imagecaptioning_tpu.train.step import TrainState
    root = jax.random.PRNGKey(seed)
    p_rng, d_rng, s_rng = jax.random.split(root, 3)
    variables = cached_model_init(model, {"params": p_rng, "dropout": d_rng},
                                  (images, gt), {"train": True}, cache_tag)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    phase("init: optimizer state (jitted)")
    opt_state = jax.jit(tx.init)(params)
    return TrainState(jnp.array(0, jnp.int32), params, opt_state,
                      batch_stats, s_rng), variables


def emit(payload: dict, args, device_meta: bool = True) -> None:
    """Print THE one JSON line; append the raw evidence artifact.
    `device_meta=False` for host-only metrics: querying jax.devices()
    would INITIALIZE the backend (possibly a cold TPU relay) just to
    stamp metadata on a benchmark that needs no accelerator."""
    if getattr(args, "trace", None):
        # profiler overhead rides the measured window — the number is
        # attribution evidence, not a headline throughput
        payload = {**payload, "traced": True}
    print(json.dumps(payload), flush=True)
    try:
        rec = dict(payload)
        if device_meta:
            import jax
            rec.update({
                "platform": jax.devices()[0].platform,
                "device_kind": jax.devices()[0].device_kind,
                "n_devices": len(jax.devices()),
                "jax": jax.__version__,
            })
        else:
            rec.update({"platform": "host"})
        if rec.get("platform") == "cpu":
            # CPU runs are verification smokes, not perf evidence —
            # print the line but keep the committed artifact TPU/host-only
            hb("cpu platform: line not appended to results artifact")
            return
        rec.update({
            "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "argv": sys.argv[1:],
            "elapsed_s": round(time.time() - T0, 1),
        })
        out = os.path.join(REPO, "runs", "bench")
        os.makedirs(out, exist_ok=True)
        with open(os.path.join(out, "results.jsonl"), "a") as f:
            f.write(json.dumps(rec) + "\n")
        hb(f"result appended to runs/bench/results.jsonl: {payload}")
    except Exception as e:                      # evidence is best-effort
        hb(f"artifact write failed (non-fatal): {e}")


def measure_chained(call, sync, batch_items: int, args, payload_fn=None):
    """Timed measurement of a chained-dispatch `call()` stream.

    `call()` advances the computation one dispatch (carrying device
    state so calls cannot be elided); `sync()` forces completion with a
    real host readback. Returns (items, seconds). Sized adaptively:
    one synced calibration call estimates the per-call cost, then as
    many chained calls as fit the measurement window / budget run with
    a single final sync (per-call syncs would bill relay latency to
    the device).

    Never exits with zero evidence after a completed call: when
    `payload_fn(items, seconds, provisional_reason)` is given, a
    PROVISIONAL measurement line is emitted after the FIRST completed
    call (compile included — an underestimate) and again after the
    calibration call, so a capture killed mid-window still carries a
    real device number (BENCH_r03 died with none exactly here)."""
    deadline = T0 + args.budget
    join_prewarm()
    phase("warmup call")
    t0 = time.perf_counter()
    call(); sync()
    warm_dt = max(time.perf_counter() - t0, 1e-3)
    hb(f"warmup (incl. compile): {warm_dt:.1f}s")
    if payload_fn is not None:
        emit(payload_fn(batch_items, warm_dt, "first_call_incl_compile"),
             args)
    phase("calibration call")
    t0 = time.perf_counter()
    call(); sync()
    est = max(time.perf_counter() - t0, 1e-3)
    hb(f"calibration: {est:.3f}s/call "
       f"(~{batch_items / est:.0f} items/sec incl. sync)")
    if payload_fn is not None:
        emit(payload_fn(batch_items, est, "single_call"), args)
    room = max(deadline - time.time() - 10.0, est)  # keep 10s slack
    n_calls = int(max(1, min(args.max_calls,
                             min(args.measure_s, room) / est)))
    trace_dir = getattr(args, "trace", None)
    if trace_dir:
        # Profiler capture of the measured window (MFU attribution,
        # docs/SCALING.md): device + host timelines land as an
        # .xplane.pb under trace_dir.
        import contextlib
        import jax
        tracer = jax.profiler.trace(trace_dir)
    else:
        import contextlib
        tracer = contextlib.nullcontext()
    phase(f"measuring: {n_calls} chained calls"
          + (f" (traced -> {trace_dir})" if trace_dir else ""))
    t0 = time.perf_counter()
    with tracer:
        for _ in range(n_calls):
            call()
        sync()
    dt = time.perf_counter() - t0
    hb(f"measured {n_calls} calls in {dt:.2f}s")
    return n_calls * batch_items, dt


def bench_decode(args):
    """Secondary metric: captions/sec under fused beam-search decode —
    BASELINE.json names it; the reference never measured its Python beam
    loops, so there is no vs_baseline (reported as null)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagecaptioning_tpu.data import transforms
    from imagecaptioning_tpu.models import api

    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    fam = _family_table(args)[args.family]
    phase(f"building {args.family} model (bs={args.batch_size})")
    model = fam["make"](args.vocab, args.seq_length, dtype)
    rng = np.random.RandomState(0)
    b = args.batch_size
    images_u8 = jnp.asarray(
        rng.randint(0, 256, size=(b, 218, 178, 3), dtype=np.uint8))
    x = transforms.resnet_v2_preprocess(images_u8, dtype=dtype)
    gt = jnp.asarray(rng.randint(1, args.vocab + 1,
                                 size=(b, args.seq_length), dtype=np.int32))
    variables = cached_model_init(
        model, {"params": jax.random.PRNGKey(0),
                "dropout": jax.random.PRNGKey(1)},
        (x, gt), {"train": False},
        cache_tag=f"decode/{args.family}/v{args.vocab}/t{args.seq_length}/"
                  f"hw{x.shape[1]}x{x.shape[2]}/"
                  f"{'fp32' if args.fp32 else 'bf16'}/"
                  f"{fam['experiment'] or 'prod'}")
    beam_unroll = max(args.beam_unroll or 1, 1)
    beam = api.make_beam_fn(model, args.seq_length + 1, args.beam_size,
                            scan_unroll=beam_unroll)

    # Chain every call through a carry scalar so the runtime cannot
    # overlap/elide identical dispatches; synchronize with a real host
    # readback (block_until_ready does not reliably block through
    # remote-relay backends).
    @jax.jit
    def chained(variables, x, carry):
        res = beam(variables, x + carry * 0)
        return res.scores[0, 0] * 0 + carry + 1

    box = {"carry": jnp.float32(0)}
    phase(f"compile: beam decode (beam={args.beam_size})")

    def call():
        box["carry"] = chained(variables, x, box["carry"])

    def sync():
        box["carry"] = jnp.float32(float(box["carry"]))

    items, dt = measure_chained(call, sync, b, args)
    payload = {
        "metric": fam["metric"].replace(
            "_train_images_per_sec",
            f"_beam{args.beam_size}_captions_per_sec"),
        "value": round(items / dt, 2),
        "unit": "captions/sec",
        "vs_baseline": None,
    }
    if args.beam_unroll is not None:
        payload["experiment"] = f"beam_unroll={beam_unroll}"
    emit(payload, args)


def _dense_inputs(args, jnp, np, dtype):
    rng = np.random.RandomState(0)
    b, r, s = args.batch_size, args.max_regions, args.image_size
    images = jnp.asarray(rng.randint(0, 256, size=(b, s, s, 3),
                                     dtype=np.uint8))
    wh = rng.uniform(32, s // 2, size=(b, r, 2))
    cxy = rng.uniform(s * 0.25, s * 0.75, size=(b, r, 2))
    boxes = jnp.asarray(np.concatenate([cxy, wh], -1).astype(np.float32))
    labels = jnp.asarray(rng.randint(1, args.vocab + 1,
                                     size=(b, r, args.seq_length),
                                     dtype=np.int32))
    mask = jnp.ones((b, r), jnp.float32)
    return images, boxes, labels, mask


def bench_dense(args):
    """GT dense-captioning training throughput in regions/sec: batched
    images × padded region slabs through VGG16 → ROI pooling → caption
    head → backward → Adam, one donated program. The reference's
    traingt.py path is locked to one image per step and never published
    a step time, so vs_baseline is null."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagecaptioning_tpu.config.dense_configs import get_gt_config
    from imagecaptioning_tpu.train import dense_driver
    from imagecaptioning_tpu.train.step import TrainState

    b, r, s = args.batch_size, args.max_regions, args.image_size
    cfg = get_gt_config().replace(
        batch_size=b, max_regions=r, use_lstm=True,
        use_pallas_roi=args.pallas_roi,
        compute_dtype="float32" if args.fp32 else "bfloat16")
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    phase(f"building GT dense model (bs={b}, regions={r}, img={s})")
    model = dense_driver.build_gt_model(cfg, vocab_size=args.vocab,
                                        seq_length=args.seq_length)
    tx = dense_driver.make_dense_optimizer(cfg, finetune_start_step=10**9)
    images, boxes, labels, mask = _dense_inputs(args, jnp, np, dtype)

    from imagecaptioning_tpu.data.vg_loader import normalize_images
    x0 = normalize_images(images, dtype=dtype)
    variables = cached_model_init(
        model,
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "sampling": jax.random.PRNGKey(2)},
        (x0, boxes, labels), {"train": True},
        cache_tag=f"dense/gt/v{args.vocab}/t{args.seq_length}/r{r}/img{s}/"
                  f"{'fp32' if args.fp32 else 'bf16'}/"
                  f"pallas{int(args.pallas_roi)}")
    phase("init: optimizer state (jitted)")
    state = TrainState(jnp.array(0, jnp.int32), variables["params"],
                       jax.jit(tx.init)(variables["params"]), {},
                       jax.random.PRNGKey(3))
    step_fn = dense_driver.make_gt_train_step(model, tx,
                                              use_curriculum=False,
                                              dtype=dtype)
    spc = max(args.steps_per_call or 10, 1)

    @partial(jax.jit, donate_argnums=(0,))
    def train_many(state):
        def body(st, _):
            st, metrics = step_fn(st, images, boxes, labels, mask, 1.0)
            return st, metrics["captioning_loss"]
        state, losses = jax.lax.scan(body, state, None, length=spc)
        return state, losses[-1]

    box = {"state": state, "loss": None}
    phase(f"compile: GT dense train scan (spc={spc})")

    def call():
        box["state"], box["loss"] = train_many(box["state"])

    def sync():
        float(box["loss"])

    items, dt = measure_chained(call, sync, spc * b * r, args)
    emit({
        "metric": f"gt_dense_train_regions_per_sec_img{s}",
        "value": round(items / dt, 2),
        "unit": "regions/sec",
        "vs_baseline": None,
    }, args)


def bench_dense_decode(args):
    """Serving path of the RPN DenseCap family: VGG16 trunk → RPN →
    clip → NMS(0.7) → proposal budget → ROI pool → objectness + box
    refinement → final NMS(0.3) → greedy per-region captions, all one
    jitted program (reference: LocalizationLayer.py:195-255 +
    DenseCapModel.py:177-197 — per-image Python, never timed, so
    vs_baseline is null). Reported as surviving regions/sec."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagecaptioning_tpu.config.dense_configs import get_densecap_config
    from imagecaptioning_tpu.train import dense_driver

    b, s = args.batch_size, args.image_size
    cfg = get_densecap_config().replace(
        batch_size=b, use_lstm=True,
        compute_dtype="float32" if args.fp32 else "bfloat16")
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    phase(f"building RPN dense model (bs={b}, img={s})")
    model = dense_driver.build_rpn_model(cfg, vocab_size=args.vocab,
                                         seq_length=args.seq_length)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 256, size=(b, s, s, 3),
                                     dtype=np.uint8))
    from imagecaptioning_tpu.data.vg_loader import normalize_images
    x0 = normalize_images(images, dtype=dtype)
    gt_boxes = jnp.asarray(rng.uniform(100, 200, (b, 4, 4)).astype(
        np.float32))
    gt_mask = jnp.ones((b, 4), jnp.float32)
    gt_labels = jnp.asarray(rng.randint(
        1, args.vocab - 2, size=(b, 4, args.seq_length), dtype=np.int32))
    variables = cached_model_init(
        model,
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "sampling": jax.random.PRNGKey(2)},
        (x0, gt_boxes, gt_mask, gt_labels), {"train": False},
        cache_tag=f"dense/rpn/v{args.vocab}/t{args.seq_length}/img{s}/"
                  f"{'fp32' if args.fp32 else 'bf16'}")

    greedy_steps = args.seq_length + 1

    @jax.jit
    def serve(variables, images_u8, carry):
        x = normalize_images(images_u8 + carry.astype(jnp.uint8) * 0,
                             dtype=dtype)
        boxes, scores, codes, keep = model.apply(
            variables, x, method=model.forward_test)
        toks = model.apply(variables, codes.reshape(-1, codes.shape[-1]),
                           greedy_steps, method=model.generate_captions)
        n_kept = keep.sum()
        return (boxes, toks, n_kept,
                carry + scores[0, 0].astype(jnp.float32) * 0 + 1)

    box = {"carry": jnp.float32(0), "kept": None}
    phase("compile: forward_test + NMS + greedy captions")

    def call():
        _, _, box["kept"], box["carry"] = serve(variables, images,
                                                box["carry"])

    def sync():
        box["carry"] = jnp.float32(float(box["carry"]))

    # items per call = regions that actually survive both NMS passes
    call(); kept = float(box["kept"]); sync()
    hb(f"surviving regions/batch: {kept:.0f} "
       f"(budget {model.test_proposals}/image)")
    items, dt = measure_chained(call, sync, max(kept, 1.0), args)
    emit({
        "metric": f"rpn_dense_decode_regions_per_sec_img{s}",
        "value": round(items / dt, 2),
        "unit": "regions/sec",
        "vs_baseline": None,
    }, args)


def bench_transfer(args):
    """Host→device transfer microbenchmark: `jax.device_put` bandwidth
    at several payload sizes, pipelined at the prefetch queue's depth
    and also fully synced per put. This ATTRIBUTES the streaming-e2e
    number: a bs-128 uint8 Face2Text batch is ~14.2 MiB, so the
    streaming path can never beat (measured MB/s ÷ 0.111 MB/img) img/s
    end-to-end regardless of device speed — the device-resident path
    (--metric e2e) exists exactly because of this ceiling. No reference
    counterpart (vs_baseline null)."""
    import jax
    import numpy as np

    rng = np.random.RandomState(0)
    join_prewarm()
    phase("transfer warmup")
    int(np.asarray(jax.device_put(np.ones(8, np.uint8))[-1]))
    per_size = {}
    deadline = T0 + args.budget - 15.0

    def timed_puts(payload, reps, depth):
        """`reps` device_puts, `depth` in flight (the prefetch queue
        shape), completion forced by a 1-element readback per buffer —
        large device→host readbacks are pathologically slow through
        the relay and would corrupt the measurement."""
        t0 = time.perf_counter()
        pending = []
        for _ in range(reps):
            pending.append(jax.device_put(payload))
            if len(pending) >= depth:
                int(np.asarray(pending.pop(0)[-1]))
        for buf in pending:
            int(np.asarray(buf[-1]))
        return time.perf_counter() - t0

    for mb in (1, 4, 15, 60):
        if time.time() > deadline:
            break
        payload = rng.randint(0, 256, size=(mb * 2**20,), dtype=np.uint8)
        phase(f"transfer: {mb} MB payloads")
        one = timed_puts(payload, 1, 1)          # synced single put
        room = max(deadline - time.time(), one)
        reps = int(max(1, min(16, min(args.measure_s, room) / one)))
        dt = timed_puts(payload, reps, 4)        # pipelined, depth 4
        per_size[f"{mb}MB"] = {
            "pipelined_MB_per_sec": round(mb * reps / dt, 2),
            "single_put_s": round(one, 3),
        }
        hb(f"{mb} MB: {per_size[f'{mb}MB']}")
    key = "15MB" if "15MB" in per_size else sorted(per_size)[-1]
    emit({
        "metric": "host_to_device_put_MB_per_sec",
        "value": per_size[key]["pipelined_MB_per_sec"],
        "unit": "MB/sec",
        "vs_baseline": None,
        "payload": key,
        "per_size": per_size,
    }, args)


def bench_input(args):
    """Host input pipeline: RAM-cached uint8 store -> C++ fastloader
    multi-threaded gather -> stacked batches, via the background
    prefetch thread (the path that feeds the jitted step in training).
    Measured host-side (no device transfer): through the remote TPU
    relay a device_put is tunnel-bound and unrepresentative of a real
    host-attached chip; the train metric already covers on-device
    preprocessing."""
    from imagecaptioning_tpu.data import synthetic
    from imagecaptioning_tpu.data.loader import (AlexDataLoader,
                                                 prefetch_batches)

    phase("building synthetic store")
    arrays, info = synthetic.make_face2text_arrays(
        num_images=args.input_images, seed=0)
    loader = AlexDataLoader(arrays=arrays, info=info)
    b = args.batch_size
    if len(loader.split_ix[0]) < b:
        raise SystemExit(
            f"--input-images {args.input_images} leaves a train split of "
            f"{len(loader.split_ix[0])} images < batch size {b}; "
            "raise --input-images or lower --batch-size")

    def epochs():
        while True:
            yield from loader.epoch_batches(0, b)

    it = prefetch_batches(epochs(), size=4, device_put=lambda x: x)
    phase("warmup")
    for _ in range(args.warmup):
        next(it)
    phase("measuring")
    t0 = time.perf_counter()
    n = 0
    for _ in range(args.steps):
        images, labels = next(it)
        n += images.shape[0]
    dt = time.perf_counter() - t0
    emit({
        "metric": "host_input_pipeline_images_per_sec",
        "value": round(n / dt, 2),
        "unit": "images/sec",
        "vs_baseline": None,
    }, args, device_meta=False)


def bench_e2e(args):
    """Sustained END-TO-END training throughput: the full input path
    feeding the SAME donated train step as --metric train, one fresh
    batch per step. The reference's step time includes its loader
    (`train_LSTM.py:77-90` wraps `get_batch` + the h5 read), so the 115
    img/s baseline IS an end-to-end number and vs_baseline here is the
    like-for-like comparison (the device-only --metric train figure is
    the input-free upper bound).

    Two input paths (`input_path` field in the record):
    - `device_resident` (default, the production path when the dataset
      fits HBM — Face2Text is ~1 GB vs 16 GB): the whole uint8 store is
      staged on device ONCE (`data/device_store.py`, staging time
      recorded); each step ships a (B,)-int32 index batch (512 B) and
      gathers + preprocesses in HBM inside the donated program.
    - `stream` (--e2e-stream, the fallback when the store outgrows
      HBM): host gather (C++ fastloader) → background prefetch thread →
      per-batch `jax.device_put` of ~15 MB uint8. Through the remote
      TPU relay this is transfer-bound (see --metric transfer for the
      measured device_put ceiling)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagecaptioning_tpu.data import (device_store, synthetic,
                                          transforms)
    from imagecaptioning_tpu.data.loader import (AlexDataLoader,
                                                 prefetch_batches)
    from imagecaptioning_tpu.train import optim, step as steplib

    fam = _family_table(args)[args.family]
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    b = args.batch_size
    phase("building synthetic store")
    arrays, info = synthetic.make_face2text_arrays(
        num_images=args.input_images, seed=0)
    loader = AlexDataLoader(arrays=arrays, info=info)
    if len(loader.split_ix[0]) < b:
        raise SystemExit(
            f"--input-images {args.input_images} leaves a train split "
            f"< batch size {b}; raise --input-images")
    v, t = loader.getVocabSize(), loader.getSeqLength()
    phase(f"building {args.family} model (bs={b}, vocab={v})")
    model = fam["make"](v, t, dtype)
    cfg = fam["cfg"]().replace(batch_size=b)
    tx = optim.make_optimizer(cfg, total_steps=10_000,
                              finetune_start_step=1_000_000)

    def preprocess(u8):
        return transforms.resnet_v2_preprocess(u8, dtype=dtype)

    imgs0, gt0 = next(loader.epoch_batches(0, b))
    x0 = preprocess(jnp.asarray(imgs0))
    state, _ = create_train_state_cached(
        model, tx, x0, jnp.asarray(gt0),
        cache_tag=f"train/{args.family}/v{v}/t{t}/"
                  f"hw{x0.shape[1]}x{x0.shape[2]}/"
                  f"{'fp32' if args.fp32 else 'bf16'}/"
                  f"{fam['experiment'] or 'prod'}")
    step_fn = steplib.make_train_step(model, tx, preprocess=preprocess)
    metric = fam["metric"].replace("_train_", "_e2e_train_")
    baseline = fam["baseline"]

    if args.e2e_stream:
        train_one = jax.jit(step_fn, donate_argnums=(0,))

        def epochs():
            while True:
                yield from loader.epoch_batches(0, b)

        it = prefetch_batches(epochs(), size=4)  # host thread+device_put
        payload_fn = _train_payload_fn(
            metric, baseline,
            extra={"input_path": "stream",
                   "baseline_includes_loader": True})

        # Steps chain through the donated TrainState; dispatches run
        # ahead of the device while the prefetch thread keeps producing.
        # One real host readback per measured window.
        box = {"state": state, "loss": None}
        phase("compile: e2e train step (stream input)")

        def call():
            images, gt = next(it)
            box["state"], metrics = train_one(box["state"], images, gt)
            box["loss"] = metrics["loss"]

        def sync():
            float(box["loss"])

        items, dt = measure_chained(call, sync, b, args,
                                    payload_fn=payload_fn)
        emit(payload_fn(items, dt), args)
        return

    # -------- device-resident input path (default) --------
    phase("staging train split in device memory")
    t0 = time.perf_counter()
    store = device_store.stage_split(loader, 0)
    int(np.asarray(store.labels[0, 0]))      # force staging completion
    stage_s = time.perf_counter() - t0
    hb(f"staged {store.nbytes / 2**20:.0f} MiB in {stage_s:.1f}s")
    res_step = device_store.make_resident_train_step(step_fn)
    payload_fn = _train_payload_fn(
        metric, baseline,
        extra={"input_path": "device_resident",
               "staging_s": round(stage_s, 2),
               "store_mib": round(store.nbytes / 2**20, 1),
               "baseline_includes_loader": True})
    idx_it = device_store.index_stream(loader, 0, b, iterate=False)
    box = {"state": state, "loss": None}

    def run_at(spc):
        @partial(jax.jit, donate_argnums=(0,))
        def train_many(st, store, idx):
            def body(st, ib):
                st, metrics = res_step(st, store, ib)
                return st, metrics["loss"]
            st, losses = jax.lax.scan(body, st, idx)
            return st, losses[-1]

        phase(f"compile: resident e2e train scan (spc={spc})")

        def call():
            # fresh epoch-position indices every call — the live input
            # path (index generation + a spc*B int32 transfer per call)
            idx = np.stack([next(idx_it) for _ in range(spc)]) \
                .astype(np.int32)
            box["state"], box["loss"] = train_many(box["state"], store,
                                                   idx)

        def sync():
            float(box["loss"])

        items, dt = measure_chained(call, sync, spc * b, args,
                                    payload_fn=payload_fn)
        emit(payload_fn(items, dt), args)
        return items / dt

    rate = 0.0
    for spc in _spc_ladder(args):
        rate = run_at(spc)
        if T0 + args.budget - time.time() < 60:
            break
    hb(f"final: {rate:.0f} images/sec e2e (device-resident input)")


# Per-family definitions: model factory, default batch, metric name +
# baseline from FAMILY_METRICS.
def _family_table(args=None):
    """Model factories per family. `args` threads the MFU
    counter-experiment knobs (--scan-unroll / --attn-bf16, see
    docs/SCALING.md "Per-family MFU") into the two families they
    falsify; defaults reproduce the production configuration."""
    import jax.numpy as jnp  # noqa: F401

    from imagecaptioning_tpu.config import (
        get_lstm_attention_config, get_lstm_config, get_transformer_config,
        get_vitb_config)
    from imagecaptioning_tpu.models.captioners import (
        AttentionCaptioner, LSTMCaptioner, TransformerCaptioner,
        ViTCaptioner)
    # production default: full unroll (measured +25%, see AttentionHead);
    # an explicit --scan-unroll N pins the experiment variant
    unroll_arg = getattr(args, "scan_unroll", None)
    unroll = True if unroll_arg is None else max(unroll_arg, 1)
    fp32_sm = not getattr(args, "attn_bf16", False)
    table = {
        "lstm": dict(
            make=lambda v, t, d: LSTMCaptioner(
                vocab_size=v, embedding_size=1024, rnn_size=768,
                compute_dtype=d, freeze_encoder=True,
                scan_unroll=unroll),
            cfg=get_lstm_config, batch=128),
        "attention": dict(
            make=lambda v, t, d: AttentionCaptioner(
                vocab_size=v, embedding_size=1024, rnn_size=768,
                dropout=0.5, compute_dtype=d, freeze_encoder=True,
                scan_unroll=unroll),
            cfg=get_lstm_attention_config, batch=128, decode_batch=64),
        "transformer": dict(
            make=lambda v, t, d: TransformerCaptioner(
                vocab_size=v, max_length=t, embed_size=512, num_layers=6,
                heads=8, dropout=0.1, compute_dtype=d, freeze_encoder=True,
                fp32_softmax=fp32_sm),
            cfg=get_transformer_config, batch=128, decode_batch=64),
        "vitb": dict(
            make=lambda v, t, d: ViTCaptioner(
                vocab_size=v, max_length=t, dropout=0.1,
                compute_dtype=d, freeze_encoder=True),
            cfg=get_vitb_config, batch=128, decode_batch=64),
    }
    experiment = []
    if unroll_arg is not None:
        experiment.append(f"scan_unroll={unroll}")
    if not fp32_sm:
        experiment.append("attn_bf16")
    for name, fam in table.items():
        fam["metric"], fam["baseline"] = FAMILY_METRICS[name]
        fam["experiment"] = ",".join(experiment) or None
    return table


def _train_payload_fn(metric: str, baseline, unit="images/sec", extra=None):
    """Measurement line factory shared by the train/e2e paths; a
    non-None `provisional` marks incomplete-measurement lines (first
    call incl. compile / single calibration call)."""
    def payload(items, dt, provisional=None):
        rate = items / dt
        p = {
            "metric": metric,
            "value": round(rate, 2),
            "unit": unit,
            "vs_baseline": (round(rate / baseline, 3) if baseline else None),
        }
        if extra:
            p.update(extra)
        if provisional:
            p["provisional"] = provisional
        return p
    return payload


def bench_train(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from imagecaptioning_tpu.data import transforms
    from imagecaptioning_tpu.train import optim, step as steplib

    fam = _family_table(args)[args.family]
    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    # frozen-encoder phase, exactly the reference's measured
    # configuration (train_LSTM.py:48-54, requires_grad_(False)):
    # gradients stop at the encoder output — no conv backward — and the
    # encoder group receives zero updates.
    phase(f"building {args.family} model (bs={args.batch_size})")
    model = fam["make"](args.vocab, args.seq_length, dtype)
    cfg = fam["cfg"]().replace(batch_size=args.batch_size)
    tx = optim.make_optimizer(cfg, total_steps=10_000,
                              finetune_start_step=1_000_000)

    rng = np.random.RandomState(0)
    b = args.batch_size
    images_u8 = jnp.asarray(
        rng.randint(0, 256, size=(b, 218, 178, 3), dtype=np.uint8))
    gt = jnp.asarray(
        rng.randint(1, args.vocab + 1, size=(b, args.seq_length),
                    dtype=np.int32))

    def preprocess(u8):
        return transforms.resnet_v2_preprocess(u8, dtype=dtype)

    x0 = preprocess(images_u8)
    state, _ = create_train_state_cached(
        model, tx, x0, gt,
        cache_tag=f"train/{args.family}/v{args.vocab}/t{args.seq_length}/"
                  f"hw{x0.shape[1]}x{x0.shape[2]}/"
                  f"{'fp32' if args.fp32 else 'bf16'}/"
                  f"{fam['experiment'] or 'prod'}")
    step_fn = steplib.make_train_step(model, tx, preprocess=preprocess)
    payload_fn = _train_payload_fn(
        fam["metric"], fam["baseline"],
        extra={"experiment": fam["experiment"]} if fam["experiment"]
        else None)

    # Fuse steps-per-call real optimizer steps into one XLA program with
    # lax.scan: host dispatch (expensive through the remote TPU relay)
    # amortizes across the scan. Escalation: measure at spc=1 FIRST (the
    # cheapest program that yields a legitimate number — its lines hit
    # stdout immediately), then re-measure at the amortized spc while
    # budget remains. A kill at any point leaves the best-so-far line.
    # Calls chain through the donated TrainState (carried across ladder
    # stages — the spc=1 program's output state feeds the spc=10 one),
    # so reading the final loss forces every step to have executed.
    # Sync = real host readback (float) — block_until_ready does not
    # reliably block through remote-relay backends.
    box = {"state": state, "loss": None}

    def run_at(spc):
        @partial(jax.jit, donate_argnums=(0,))
        def train_many(st, images, gt):
            def body(st, _):
                st, metrics = step_fn(st, images, gt)
                return st, metrics["loss"]
            st, losses = jax.lax.scan(body, st, None, length=spc)
            return st, losses[-1]

        phase(f"compile: train scan (spc={spc})")

        def call():
            box["state"], box["loss"] = train_many(box["state"],
                                                   images_u8, gt)

        def sync():
            float(box["loss"])

        items, dt = measure_chained(call, sync, spc * b, args,
                                    payload_fn=payload_fn)
        emit(payload_fn(items, dt), args)
        return items / dt

    rate = 0.0
    for spc in _spc_ladder(args):
        rate = run_at(spc)
        if T0 + args.budget - time.time() < 60:
            break               # no room for another compile+measure
    hb(f"final: {rate:.0f} items/sec")


# ------------------------------------------------------------ orchestrator

def run_device_child(args, reserve: float):
    """ONE killable child per attempt does everything — backend init,
    prewarm, compile, measure — in a single process (re-exec with
    --direct). One backend client per attempt matters: the old
    probe-then-measure design opened TWO sequential relay sessions per
    invocation, and a lingering/killed session wedges the next client's
    init (observed repeatedly: `jax.devices()` hangs for minutes right
    after another client was killed, while a quiet relay inits in
    0.1s).

    The orchestrator watches the child's stderr for the `backend_up`
    marker `setup_jax` emits: no marker within --probe-timeout → the
    child is hung in backend init → kill + retry (bounded). Once the
    backend is up the child owns the remaining budget. Measurement
    lines stream to stdout LIVE, so a provisional number emitted after
    the child's first completed call survives any later kill.
    Returns (ok, attempts, detail)."""
    attempts, detail = 0, ""
    while attempts < args.probe_attempts:
        remaining = T0 + args.budget - reserve - time.time()
        if remaining < 30:
            return False, attempts, detail or "no budget left"
        attempts += 1
        # Attempt 1 gets at most HALF the remaining budget: BENCH_r04
        # handed it everything, so when it overran there was no budget
        # left and the advertised retry loop exited at 1/3 attempts.
        # A floor of 150 s keeps the first attempt viable (init cache +
        # persistent XLA cache put a warm run well under that).
        child_budget = remaining
        if attempts == 1 and args.probe_attempts > 1:
            child_budget = max(remaining * 0.5, min(remaining, 150.0))
        argv = [sys.executable, os.path.abspath(__file__), *sys.argv[1:],
                "--direct", "--budget", str(round(child_budget, 1))]
        phase(f"device child {attempts}/{args.probe_attempts} "
              f"(budget {child_budget:.0f}s of {remaining:.0f}s left)")
        child = subprocess.Popen(argv, stdout=subprocess.PIPE,
                                 stderr=subprocess.PIPE, text=True,
                                 bufsize=1)
        got = {"value": False}
        seen = {"backend_up": False}

        def fwd_stdout(pipe=child.stdout):
            for line in pipe:
                line = line.rstrip("\n")
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if isinstance(rec, dict) and "metric" in rec:
                    print(line, flush=True)
                    if rec.get("value") is not None:
                        got["value"] = True

        def fwd_stderr(pipe=child.stderr):
            for line in pipe:
                if "backend_up" in line:
                    seen["backend_up"] = True
                sys.stderr.write(line)
                sys.stderr.flush()

        readers = [threading.Thread(target=fwd_stdout, daemon=True),
                   threading.Thread(target=fwd_stderr, daemon=True)]
        for r in readers:
            r.start()
        start = time.time()
        hung = False
        while child.poll() is None:
            now = time.time()
            if not seen["backend_up"] and now - start > args.probe_timeout:
                hung = True
                detail = (f"backend init hung >{args.probe_timeout:.0f}s "
                          f"(child {attempts} killed)")
                break
            # Grace window: a child past backend_up is inside
            # compile/warmup/measure — killing it at the nominal budget
            # throws away a nearly-complete measurement (BENCH_r04's
            # child was killed 16 s after its train-scan compile
            # started). 45 s of grace rides the fallback reserve; the
            # host fallback itself needs only a few seconds of it.
            grace = 45.0 if seen["backend_up"] else 0.0
            if now - start > child_budget + 30 + grace:
                detail = ("child overran its budget"
                          + (" + grace" if grace else "")
                          + " and was killed")
                break
            time.sleep(1.0)
        if child.poll() is None:
            child.kill()
            child.wait()
            hb(detail)
        for r in readers:
            r.join(timeout=10)
        if got["value"]:
            return True, attempts, ""
        overran = "overran" in detail
        if not hung and not overran:
            detail = detail or (f"child rc={child.returncode}, "
                                "no measurement line")
            # backend came up and the child DIED ON ITS OWN (real
            # program error): retrying won't get a different program —
            # stop and fall back. A budget overrun is different: the
            # kill left the relay + caches warm, so the same program
            # runs much faster on the next attempt (measured: first
            # 1-op jit through a cold relay 186 s, warm <1 s).
            if seen["backend_up"]:
                return False, attempts, detail
        hb(f"attempt {attempts} failed: {detail}")
    return False, attempts, detail


def emit_fallback(args, error: str, attempts: int, detail: str) -> None:
    """The requested metric could not be measured: print its
    structured-error line, then run the backend-free host input-pipeline
    measurement so the capture's LAST stdout line is a real number."""
    emit({
        "metric": requested_metric_name(args),
        "value": None,
        "unit": None,
        "vs_baseline": None,
        "error": error,
        "attempts": attempts,
        "detail": detail[-300:],
    }, args, device_meta=False)
    phase("fallback: host input-pipeline metric")
    args.metric = "input"
    args.batch_size = 128
    try:
        bench_input(args)
    except Exception as e:     # the capture still has the error line
        hb(f"fallback input metric failed too: {e}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=None,
                    help="default: per-family (128 lstm, 64 others)")
    ap.add_argument("--family",
                    choices=["lstm", "attention", "transformer", "vitb"],
                    default="lstm")
    ap.add_argument("--budget", type=float,
                    default=float(os.environ.get("BENCH_BUDGET_S", 420)),
                    help="wall-clock budget (s); measurement degrades to "
                         "a single call rather than blowing it")
    ap.add_argument("--measure-s", type=float, default=8.0,
                    help="target steady-state measurement window")
    ap.add_argument("--max-calls", type=int, default=50)
    ap.add_argument("--steps", type=int, default=100,
                    help="input metric only")
    ap.add_argument("--warmup", type=int, default=10,
                    help="input metric only")
    ap.add_argument("--vocab", type=int, default=2048)
    ap.add_argument("--seq-length", type=int, default=16)
    ap.add_argument("--beam-size", type=int, default=3)
    ap.add_argument("--fp32", action="store_true")
    ap.add_argument("--metric",
                    choices=["train", "decode", "dense", "dense-decode",
                             "input", "e2e", "transfer"],
                    default="train")
    ap.add_argument("--e2e-stream", action="store_true",
                    help="e2e metric: force the streaming input path "
                         "(host gather + prefetch + per-batch "
                         "device_put) instead of the device-resident "
                         "store")
    ap.add_argument("--input-images", type=int, default=2048,
                    help="input/e2e metrics: synthetic store size")
    ap.add_argument("--scan-unroll", type=int, default=None,
                    help="attention family MFU experiment: unroll "
                         "factor for the decoder recurrence scan "
                         "(stamped as 'experiment' in the record); "
                         "default = the production full unroll")
    ap.add_argument("--beam-unroll", type=int, default=None,
                    help="decode metric experiment: unroll factor for "
                         "the beam-search step scan (stamped as "
                         "'experiment'); default = rolled scan")
    ap.add_argument("--attn-bf16", action="store_true",
                    help="transformer/vitb MFU experiment: attention "
                         "scores+softmax in compute dtype instead of "
                         "fp32 (stamped as 'experiment' in the record)")
    ap.add_argument("--trace", type=str, default=None,
                    help="capture a jax.profiler trace of the measured "
                         "window into this directory")
    ap.add_argument("--max-regions", type=int, default=32)
    ap.add_argument("--pallas-roi", action="store_true",
                    help="dense metric: explicit Pallas ROI kernel "
                         "instead of the einsum form")
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--steps-per-call", type=int, default=None,
                    help="train steps fused into one XLA program via "
                         "lax.scan — amortizes host dispatch, which "
                         "dominates through the remote TPU relay. "
                         "Default: escalate 1 → 10 (emit a cheap "
                         "legitimate number first, refine with budget)")
    ap.add_argument("--probe-attempts", type=int, default=3,
                    help="device-child attempts (each killed if its "
                         "backend init hangs) before falling back to "
                         "the host metric")
    ap.add_argument("--probe-timeout", type=float, default=70.0,
                    help="per-child backend-init timeout (s): kill + "
                         "retry if no backend_up marker appears in time")
    ap.add_argument("--direct", action="store_true",
                    help="measure in-process (no orchestrator); used by "
                         "the orchestrator's own child")
    args = ap.parse_args()
    start_watchdog()
    defaults = {"dense": 8, "dense-decode": 4, "input": 128}
    if args.batch_size is None and args.metric in defaults:
        args.batch_size = defaults[args.metric]
    if args.metric == "input":
        return bench_input(args)

    if not args.direct:
        # Orchestrator: run the whole measurement in ONE killable child
        # per attempt (backend init watched via the backend_up marker,
        # hung inits killed + retried); degrade to a structured-error
        # line + the host input metric if every attempt fails. The
        # capture parses in EVERY relay state.
        reserve = 60.0          # room for the host fallback measurement
        ok, attempts, detail = run_device_child(args, reserve)
        if ok:
            return
        error = ("backend_unavailable" if "backend init hung" in detail
                 else "device_run_failed")
        return emit_fallback(args, error, attempts, detail)

    setup_jax()
    if args.metric == "transfer":
        return bench_transfer(args)
    if args.metric == "dense":
        return bench_dense(args)
    if args.metric == "dense-decode":
        return bench_dense_decode(args)
    fam = _family_table(args)[args.family]
    if args.batch_size is None:
        args.batch_size = (fam.get("decode_batch", fam["batch"])
                           if args.metric == "decode" else fam["batch"])
    if args.metric == "decode":
        return bench_decode(args)
    if args.metric == "e2e":
        if args.input_images < 16 * args.batch_size:
            # the store must be big enough that gathers don't all hit
            # one cache line — and leave a real train split
            args.input_images = 16 * args.batch_size
        return bench_e2e(args)
    return bench_train(args)


if __name__ == "__main__":
    main()
