"""Headline benchmark: CLIP ViT-B/16 image feature extraction throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
Baseline target (BASELINE.json north star): 5000 img/s/chip on TPU v5e.

Budget contract (round 4): the WHOLE bench fits a global wall-clock budget
(``UML_BENCH_TOTAL_BUDGET_S``, default 1200 s) so the driver's capture
window always receives the JSON line — round 3's bench could exceed 40 min
in bad relay weather (420 s health probe + unbounded core + 1900 s family
budget with retries) and the driver killed it at timeout, capturing
nothing.  Structure now:

  * the parent process is a pure orchestrator — it never touches the
    device; every measurement runs in a timeout-bounded child process;
  * children STREAM each metric as its own JSON line the moment it is
    measured, and the parent merges whatever arrived even when a child
    is killed at its timeout — a stall costs the un-emitted lines, never
    the accumulated ones;
  * ALL measurements ride ONE full child process, in priority order:
    bf16 headline -> int8 serving line (the headline candidate) ->
    train step -> pipeline -> family survey -> text towers.  The relay
    charges a ~200-230 s first-program handshake to EVERY process
    regardless of compile-cache state (measured: a trivial matmul's
    first call costs 228 s in a fresh process), so per-group child
    processes — round 3's layout — were the single most expensive item
    in the budget and are exactly why family lines shed;
  * the relay health probe runs ONLY if the full child comes back empty
    (a healthy probe costs ~3.5 min of budget: its own handshake);
    missing family keys get ONE follow-up child if >=300 s of budget
    remains (enough for the handshake plus a measurement); whatever
    still doesn't fit is shed and listed in the record's ``"shed"``
    field — an explicit statement of what was not measured, not a
    silent truncation;
  * the parent ALWAYS prints the JSON line, with ``SAFETY_S`` seconds of
    margin before the budget expires.

Methodology (variance-robust): every number is the MEDIAN of 3 timed runs;
each run enqueues ITERS dispatches back-to-back (as a real double-buffered
extraction pipeline would) and fetches every result at the end, so async
dispatch can't fake timings but fixed per-dispatch relay overhead is
amortized like production serving would.

Primary metric (``value``): device-resident uint8 batch -> ViT-B/16
forward under jit, in the framework's FASTEST SERVING CONFIGURATION —
the int8 W8A8 half-block kernels (``--quant int8``, ops.quant) when that
line measured faster than bf16 in the same bench (it does: Mosaic int8
MXU dots run at a measured 1.555x the bf16 rate on this chip —
tools/exp_int8_rate_pallas.py; feature fidelity vs bf16 is cosine
>0.999, tests/test_quant.py).  The parity-exact bf16 path (CLIP
normalization folded into the patch embedding, fused bf16 half-block
kernels) is ALWAYS reported alongside as ``extract_bf16_img_per_s`` with
its roofline fraction.  If the int8 line fails or regresses below bf16,
``value`` falls back to the bf16 number.

Extras: per-encoder-family extraction lines (CLIP ViT-L/14, DINOv2
ViT-B/14 and ViT-L/14, DINO ViT-B/8, CLIP RN50 — the reference's other
first-class encoder choices, engine/config/__init__.py:76-89), text-tower
lines (sentences/s through the causal CLIP text transformer at its
77-token context — the other half of features.py's extraction,
prepare_text_features features.py:186-223), the full-model finetune step
at bs128/bs512 (finetune.py:120-288 semantics), and the end-to-end
extraction pipeline (jpeg decode -> transfer -> forward -> fetch,
cli/features.py's hot loop) with per-stage rates and the same-episode
link-bound ratio ``pipeline_vs_link_bound``.

Relay rules (tools/exp_poison_trigger.py, exp_poison_bisect2.py,
exp_fetch_flush.py): through the axon tunnel, the FIRST device->host
fetch of a process flips it into a post-fetch regime — H2D puts drop
from ~1400 MB/s to ~30 MB/s for the rest of the process, the switch
itself flushing ~proportionally to all bytes staged so far; before it,
compile/dispatch/synced-puts are fast but execution is deferred and
``block_until_ready`` on compute results is a no-op.  Hence: init args
are created inside the cpu context (init_on_cpu takes a thunk), weights
stage through host numpy, every device input is pre-staged while the
link is in its fast regime, and each child process pays the regime
switch exactly once.  The core child orders headline/train BEFORE the
pipeline: the pipeline's steady state is the post-fetch regime anyway
(a real extraction service fetches features every batch), so only the
regime-A transfer diagnostic is lost by running it after the first
fetch — and the composition-quality signal (``pipeline_vs_link_bound``)
divides by the SAME episode's post-fetch link cap, which is unaffected.

The persistent JAX compilation cache (~/.cache/uml_tpu_xla, enabled by
``import uml_tpu``) means the driver's capture run on the same machine
hits the cache primed by the previous in-session run — its budget is
spent measuring, not compiling.
"""

import json
import os
import subprocess
import sys
import time

# NOTE: the persistent XLA compile cache (~/.cache/uml_tpu_xla) is enabled
# by ``import uml_tpu`` in every child — warm-cache compiles take seconds
# vs 1-3 min through the remote-compile relay, so a bench run right after
# an in-session priming run spends its budget measuring, not compiling.

BASELINE_IMG_PER_S = 5000.0
# Measured roofline (tools/roofline_clip.py on the v5e chip): the
# extraction forward executes 34.094 GF/img of real MXU work (2 flops/MAC,
# incl. the head-pair score packing; the CLS-only final block counted as
# the kernels execute it) against the chip's 197 TF/s bf16 peak — speed
# of light 5778 img/s.
EXTRACTION_GFLOP_PER_IMG = 34.094
PEAK_TFLOPS = 197.0
BATCH = int(os.environ.get("UML_BENCH_BATCH", 2048))
ITERS = int(os.environ.get("UML_BENCH_ITERS", 10))
RUNS = int(os.environ.get("UML_BENCH_RUNS", 3))
PIPELINE_BATCH = int(os.environ.get("UML_PIPELINE_BATCH", 512))
# 12 batches: at 4 batches the lag-2 composed loop never reaches steady
# state (decode ramp + pipeline fill are half the run) — v4 measured
# blocked_decode 0.35 with an isolated decode rate 2.3x the composed
# rate, pure fill/ramp artifact
PIPELINE_IMAGES = int(os.environ.get("UML_PIPELINE_IMAGES", 6144))
# extraction-service batch for the family lines: composition efficiency
# scales with per-dispatch work, so families bench at the headline batch
FAMILY_BATCH = int(os.environ.get("UML_FAMILY_BATCH", 2048))
SKIP_FAMILIES = os.environ.get("UML_BENCH_FAST") == "1"

TOTAL_BUDGET_S = float(os.environ.get("UML_BENCH_TOTAL_BUDGET_S", 1200))
SAFETY_S = 15.0
_START = time.time()

# survey family lines use a shorter dispatch window than the headline —
# EXCEPT the fast towers (<~600 ms/batch), where the relay's fixed
# per-run dispatch/fetch overhead is a measurable fraction of a 3-iter
# window: the text tower read 23.7k sent/s at 3 iters vs 25.4k at 10
# in back-to-back episodes (tools/exp_text_tower.py vs the r5 bench
# probe).  Fast towers use the headline's ITERS so every family line is
# measured under the same protocol; the ≥1 s/batch towers already
# amortize the overhead at 3 iters and keep the survey in budget.
SURVEY_ITERS = 3
FAST_SURVEY_KEYS = frozenset((
    "extract_text_bf16_sent_per_s",
    "extract_text_int8_sent_per_s",
    "extract_dinov2_vitb14_img_per_s",
    "extract_clip_rn50_img_per_s",
))

CORE_KEYS = (
    "extract_bf16_img_per_s",
    "train_full_finetune_img_per_s",
    "train_full_finetune_bs512_img_per_s",
    "pipeline_img_per_s",
)

# survey keys after the int8 serving line, priority-ordered; all run in
# the ONE full core child (the relay charges ~200-230 s of first-program
# handshake per process, so extra children are the single most expensive
# thing a bench can spend budget on)
# priority order under budget pressure: the text bf16 line carries its
# own perf criterion (>=80% of the text roofline) and costs ~5 s of
# measurement once built, so it rides directly after the B/14 line and
# BEFORE the ~1s/batch ViT-L towers — a watchdog restart (r5: one 480 s
# no-first-light episode) then sheds the SoL-less extras (B/8, RN50),
# not a criterion carrier
FAMILY_SURVEY_ORDER = (
    "extract_dinov2_vitb14_img_per_s",
    "extract_text_bf16_sent_per_s",
    "extract_text_int8_sent_per_s",
    "extract_dinov2_vitl14_img_per_s",
    "extract_clip_vitl14_img_per_s",
    "extract_dino_vitb8_img_per_s",
    "extract_clip_rn50_img_per_s",
)
ALL_FAMILY_KEYS = ("extract_int8_vitb16_img_per_s",) + FAMILY_SURVEY_ORDER

# Analytic speed-of-light per family line (img/s or sent/s on one v5e
# chip), from `UML_ROOFLINE_MEASURE=0 python tools/roofline_families.py`
# — same FLOP accounting as EXTRACTION_GFLOP_PER_IMG (2 flops/MAC,
# pair-packed scores counted as executed, CLS-only final block; int8
# rows at the MEASURED 209-TOPS Mosaic rate).  compose_record emits
# `<key>_roofline_fraction` for every measured line so the per-family
# criterion is machine-checkable from this JSON, not COVERAGE.md prose.
# RN50 has no analytic row (conv profile): measured-only.
FAMILY_SOL = {
    "extract_bf16_img_per_s": 5778.2,
    "extract_int8_vitb16_img_per_s": 8511.5,
    "extract_clip_vitl14_img_per_s": 1210.4,
    "extract_text_bf16_sent_per_s": 32267.3,
    "extract_text_int8_sent_per_s": 48878.4,
    "extract_dinov2_vitb14_img_per_s": 4337.3,
    "extract_dinov2_vitl14_img_per_s": 1210.4,
    "extract_dino_vitb8_img_per_s": 1186.2,
}


def _remaining():
    return TOTAL_BUDGET_S - (time.time() - _START) - SAFETY_S


def median(xs):
    return sorted(xs)[len(xs) // 2]


def _emit(d):
    """Child-side: stream one metric dict as its own stdout JSON line."""
    print(json.dumps(d), flush=True)


def _mark(label, _t0=[None]):
    """Child-side stage clock (stderr): where does the child's time go?"""
    if _t0[0] is None:
        _t0[0] = _START
    now = time.time()
    print(f"bench-child: +{now - _t0[0]:6.1f}s {label}",
          file=sys.stderr, flush=True)
    _t0[0] = now


# ---------------------------------------------------------------------------
# measurement primitives (child-side only — these import jax)
# ---------------------------------------------------------------------------


def init_on_cpu(init_thunk, keep_host=False):
    """Model init on the host CPU backend, then one bulk transfer: a
    jitted init compiles in seconds on CPU, vs ~10 min for the same
    program through the remote-compile relay (and ~1 min eagerly).

    ``init_thunk`` takes no args and must CREATE its example inputs
    itself — it runs entirely inside the cpu default-device context.
    Args built at the call site would land on the TPU and the cpu jit
    would pull them device->host, and through the axon relay the FIRST
    D2H fetch of a process permanently collapses every later H2D put
    ~1400 -> ~35 MB/s (bisected in tools/exp_poison_bisect2.py).
    Staging then goes through host numpy, synced — cheap host copies,
    one bulk fast-path put.  ``keep_host=True`` returns (device_tree,
    host_numpy_tree) so donated device buffers can be re-staged later."""
    import jax
    import numpy as np

    with jax.default_device(jax.devices("cpu")[0]):
        variables = jax.jit(init_thunk)()
    host_tree = jax.tree.map(np.asarray, variables)
    dev = jax.block_until_ready(
        jax.device_put(host_tree, jax.devices()[0]))
    return (dev, host_tree) if keep_host else dev


def make_extract(model):
    import jax

    @jax.jit
    def extract_sum(v, u8):
        feats = model.apply(v, u8, method=lambda m, x: m.encode_image_u8(x))
        return feats.sum()

    return extract_sum


def stage_input(batch, flat_dim):
    # flat [B, H*W*3]: a 4D uint8 layout pads the 3-lane dim 42x on TPU.
    # Synced put: see init_on_cpu — unsynced staging trickles ~50x slower
    # and stalls every later transfer behind it.
    import jax
    import jax.numpy as jnp
    import numpy as np

    d = jax.device_put(jnp.asarray(
        np.random.default_rng(0).integers(
            0, 256, (batch, flat_dim), dtype=np.uint8)))
    d.block_until_ready()
    return d


def stage_tokens(batch):
    """int32 [B, 77] token batch for the text-tower lines.  Random ids
    with a forced max in the last column so the EOT argmax-pool gathers
    the same position pattern real tokenized prompts produce (tokenize
    puts the EOT id — the vocab max — at the sequence end)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    toks = rng.integers(1, 49407, (batch, 77), dtype=np.int32)
    toks[:, -1] = 49407
    d = jax.device_put(jnp.asarray(toks))
    d.block_until_ready()
    return d


def device_bench(extract_sum, variables, imgs, iters=ITERS, runs=RUNS):
    batch = imgs.shape[0]
    float(extract_sum(variables, imgs))  # compile
    _mark("  compile+first-dispatch done")
    rates = []
    for _ in range(runs):
        t0 = time.time()
        outs = [extract_sum(variables, imgs) for _ in range(iters)]
        _ = [float(o) for o in outs]  # fetch everything: full completion
        rates.append(batch * iters / (time.time() - t0))
    return median(rates)


def _dino_builder(name):
    def build():
        import jax
        import jax.numpy as jnp

        from uml_tpu.models.dino import DINO_CONFIGS, DinoViT

        cfg, _ = DINO_CONFIGS[name]
        model = DinoViT(cfg, dtype=jnp.bfloat16)
        variables = init_on_cpu(lambda: model.init(
            jax.random.key(0),
            jnp.zeros((1, 224, 224, 3), jnp.float32)))
        return model, variables, lambda m, x: m(x, from_uint8=True)
    return build


def _clip_builder(name, reshape=False, quant="none"):
    def build():
        import jax
        import jax.numpy as jnp

        from uml_tpu.models.clip import build_clip

        model = build_clip(name, dtype=jnp.bfloat16, quant=quant)
        variables = init_on_cpu(lambda: model.init(
            jax.random.key(0),
            jnp.zeros((1, 224, 224, 3), jnp.float32),
            jnp.zeros((1, 77), jnp.int32)))
        if reshape:  # the RN stem takes [B, H, W, 3]
            method = lambda m, x: m.encode_image_u8(
                x.reshape(x.shape[0], 224, 224, 3))
        else:
            method = lambda m, x: m.encode_image_u8(x)
        return model, variables, method
    return build


def _clip_text_builder(name, quant="none"):
    """Text-tower extraction (features.py's OTHER hot path — template and
    CUPL-descriptor text features, prepare_text_features
    features.py:186-223; imagenet CUPL alone is ~30k sentences)."""
    def build():
        import jax
        import jax.numpy as jnp

        from uml_tpu.models.clip import build_clip

        model = build_clip(name, dtype=jnp.bfloat16, quant=quant)
        variables = init_on_cpu(lambda: model.init(
            jax.random.key(0),
            jnp.zeros((1, 224, 224, 3), jnp.float32),
            jnp.zeros((1, 77), jnp.int32)))
        return model, variables, lambda m, t: m.encode_text(t)
    return build


FAMILY_BUILDERS = {
    # W8A8 serving mode (ops.quant): int8 MXU dots at the MEASURED
    # 209-TOPS Mosaic rate — 1.555x bf16, not the 394-TOPS spec
    # (tools/exp_int8_rate_pallas.py).  Analytic speed of light for
    # this mode at the measured rate: 8512 img/s
    # (tools/roofline_families.py).  Feature fidelity vs bf16 is
    # cosine >0.999 (tests/test_quant.py).
    "extract_int8_vitb16_img_per_s": _clip_builder("ViT-B/16", quant="int8"),
    "extract_clip_vitl14_img_per_s": _clip_builder("ViT-L/14"),
    "extract_dinov2_vitb14_img_per_s":
        _dino_builder("vit_base_patch14_dinov2.lvd142m"),
    "extract_dinov2_vitl14_img_per_s":
        _dino_builder("vit_large_patch14_dinov2.lvd142m"),
    "extract_dino_vitb8_img_per_s": _dino_builder("vit_base_patch8_224_dino"),
    "extract_clip_rn50_img_per_s": _clip_builder("RN50", reshape=True),
    # text-tower lines: sentences/s through the causal text transformer
    "extract_text_bf16_sent_per_s": _clip_text_builder("ViT-B/16"),
    "extract_text_int8_sent_per_s": _clip_text_builder("ViT-B/16",
                                                       quant="int8"),
}
TEXT_FAMILIES = ("extract_text_bf16_sent_per_s",
                 "extract_text_int8_sent_per_s")


# ---------------------------------------------------------------------------
# child entry points
# ---------------------------------------------------------------------------


def run_probe():
    """Child-process entry: one trivial put + jit + fetch, prints ok."""
    import jax
    import jax.numpy as jnp

    x = jax.device_put(jnp.ones((256, 256), jnp.float32))
    print("ok", float(jax.jit(lambda a: (a @ a).sum())(x)))


def run_core():
    """Child: the proven single-process measurement path (the shape of the
    round-2 bench that captured fine) — stage everything in the fast
    pre-fetch regime, then headline bf16 -> train bs128 -> train bs512 ->
    pipeline, streaming each metric as soon as it is measured and
    checking the child budget (``UML_CORE_BUDGET_S``) before each
    optional segment.

    When ``UML_CORE_FULL=1`` (the default orchestration), the SAME child
    continues into the int8 serving line, the family survey, and the
    text towers — the relay charges ~200-230 s of first-program
    handshake to EVERY process regardless of compile cache state
    (measured: a trivial pre-compiled matmul's first call costs 228 s in
    a fresh process; the old per-group child layout paid that up to six
    times, which is exactly why round-3 style runs shed the survey).
    One process pays the handshake once; a mid-run stall costs the
    un-emitted lines only, and the parent re-runs ONLY the missing keys
    in a follow-up child when budget remains."""
    t_child = time.time()
    budget = float(os.environ.get("UML_CORE_BUDGET_S", 1e9))
    lean = os.environ.get("UML_CORE_LEAN") == "1"
    full = os.environ.get("UML_CORE_FULL") == "1"

    def left():
        return budget - (time.time() - t_child)

    import jax
    import jax.numpy as jnp

    from uml_tpu.models.clip import build_clip

    _mark("core: imports done")
    model = build_clip("ViT-B/16", dtype=jnp.bfloat16,
                       attn_impl=os.environ.get("UML_ATTN", "auto"))
    variables, host_vars = init_on_cpu(lambda: model.init(
        jax.random.key(0),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32),
    ), keep_host=True)
    _mark("core: init+staged")
    extract_sum = make_extract(model)
    extract_pipe = make_extract(model)  # separate jit cache entry per shape

    # pre-stage every device input while the H2D link is fast
    headline_imgs = stage_input(BATCH, 224 * 224 * 3)
    train_u8 = stage_input(128, 224 * 224 * 3)
    train_u8_512 = None if lean else stage_input(512, 224 * 224 * 3)
    _mark("core: inputs staged")

    _emit({"extract_bf16_img_per_s":
           round(device_bench(extract_sum, variables, headline_imgs), 1)})
    _mark("core: bf16 headline measured")

    if full and left() > 150:
        # the serving headline candidate rides in the SAME process right
        # after the bf16 line (highest-priority family key)
        _measure_family("extract_int8_vitb16_img_per_s", headline_imgs)

    do_512 = train_u8_512 is not None and left() > 240
    rates = train_bench(model, variables,
                        [train_u8] + ([train_u8_512] if do_512 else []))
    _emit({"train_full_finetune_img_per_s": round(rates[0], 1)})
    if do_512:
        _emit({"train_full_finetune_bs512_img_per_s": round(rates[1], 1)})
        marg = train_marginal(rates[0], rates[1])
        if marg:
            _emit(marg)
    _mark("core: train measured")

    if not lean and left() > 120:
        # the train step DONATED the visual params (deleting those device
        # buffers) — re-stage them from the kept host copy (~6 s at the
        # post-fetch link rate, far cheaper than a fresh device init)
        visual = jax.device_put(host_vars["params"]["visual"],
                                jax.devices()[0])
        variables = {**variables,
                     "params": {**variables["params"], "visual": visual}}
        pipe = pipeline_bench(extract_pipe, variables)
        if pipe is not None:
            _emit(pipe)
        _mark("core: pipeline measured")
    else:
        print("core: pipeline skipped (budget)", file=sys.stderr)

    if full:
        # family survey + text towers, priority order, budget-guarded:
        # each key needs build+stage+warm-compile+measure (~40-120 s
        # post-handshake)
        for key in FAMILY_SURVEY_ORDER:
            if left() < 110:
                print(f"core: {key} skipped (budget)", file=sys.stderr)
                continue
            _measure_family(key, headline_imgs)


def _measure_family(key, staged_imgs=None):
    """Build + measure one family tower, streaming its JSON line.  A
    per-key exception costs that key only.  ``staged_imgs``: an already-
    staged uint8 batch to reuse (saves a post-fetch-regime put)."""
    try:
        model, variables, method = FAMILY_BUILDERS[key]()
        _mark(f"{key}: built+staged")
        import jax

        @jax.jit
        def extract(v, u8, model=model, method=method):
            return model.apply(v, u8, method=method).sum()

        if key in TEXT_FAMILIES:
            imgs = stage_tokens(FAMILY_BATCH)
        elif (staged_imgs is not None
              and staged_imgs.shape[0] == FAMILY_BATCH):
            imgs = staged_imgs
        else:
            imgs = stage_input(FAMILY_BATCH, 224 * 224 * 3)
        iters = (ITERS if key == "extract_int8_vitb16_img_per_s"
                 or key in FAST_SURVEY_KEYS else SURVEY_ITERS)
        _emit({key: round(
            device_bench(extract, variables, imgs, iters=iters), 1)})
        _mark(f"{key}: measured")
    except Exception as e:  # pragma: no cover - device-path only
        print(f"family: {key} failed: {type(e).__name__}: {e}",
              file=sys.stderr)
    finally:
        # free this tower's weights eagerly: a survey child measures up
        # to 7 towers (incl. two full CLIPs for the text lines) in one
        # process, and lazy GC let their HBM buffers pile up into a
        # RESOURCE_EXHAUSTED on the conv tower (v5 run)
        import gc

        # rebinding the locals drops this call's references; the reused
        # staged_imgs stays alive at the caller
        model = variables = extract = imgs = None  # noqa: F841
        gc.collect()


def run_families_child(keys):
    """Child: build + measure the listed family towers sequentially,
    streaming one JSON line per key (the follow-up path for keys the
    full core child did not reach)."""
    budget = float(os.environ.get("UML_FAMILY_CHILD_BUDGET_S", 1e9))
    t_child = time.time()
    for key in keys:
        if time.time() - t_child > budget:
            print(f"family child: {key} skipped (budget)", file=sys.stderr)
            continue
        _measure_family(key)


def pipeline_bench(extract_sum, variables):
    """Synthetic JPEGs -> process-pool decode -> transfer thread -> forward
    -> per-batch feature fetch (exactly cli/features.py's hot loop).

    Runs after the process's first fetch (the headline measured first),
    so the whole pipeline lives in the relay's post-fetch regime — which
    is also a real extraction service's steady state (it fetches features
    every batch).  The composed loop is FEEDER-structured: a dedicated
    thread owns decode iteration + put submission, so a decode stall can
    never idle the H2D link (r4's lag-2 main-thread loop measured
    put_active 0.61 vs 0.73 for the feeder under the same link weather,
    tools/exp_pipeline_ledger.py).

    The relay's H2D cap both moves run-to-run (16-41 MB/s on identical
    code) and DECAYS within an episode (a 24.5 -> 12.3 MB/s pre/post
    bracket measured in one ledger run), so a single-put cap sample
    overstates what the loop could have used.  This emits a per-stage
    ledger instead: bracketed cap samples (``pipeline_cap_{pre,post}_
    MBps``), the rate the link actually delivered while a put was in
    flight (``pipeline_inloop_put_MBps`` — the in-episode achievable
    link rate), and the fraction of the wall with a put in flight
    (``pipeline_put_active_frac``).  ``pipeline_vs_link_bound`` divides
    the composed rate by min(in-loop link rate, saturated decode rate):
    framework composition quality, de-weathered; the bracket + blocked
    fractions let a reader audit the residual."""
    import tempfile
    from concurrent.futures import ThreadPoolExecutor

    import jax
    import numpy as np

    from uml_tpu.data.loader import ImageBatchLoader

    try:
        from PIL import Image
    except ImportError:
        return None
    d = tempfile.mkdtemp(prefix="uml_bench_jpg_")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(128):
        arr = rng.integers(0, 256, (224, 224, 3), dtype=np.uint8)
        p = os.path.join(d, f"{i}.jpg")
        Image.fromarray(arr).save(p, quality=90)
        paths.append(p)
    # note: 128 distinct files cycled — after the first cycle the OS page
    # cache holds them all, so the decode rate here is an upper bound vs a
    # cold dataset sweep (decode CPU cost dominates in this container)
    items = [{"impath": paths[i % len(paths)], "label": 0}
             for i in range(PIPELINE_IMAGES)]
    batch_mb = PIPELINE_BATCH * 224 * 224 * 3 / 2**20

    # host decode stage rate, measured past a 2-batch warm-up prefix.
    # Timing a short pass whole folds in the worker-pool spin-up (the
    # composed loop then EXCEEDS its own "bound" — a >1.0 ratio), and
    # timing post-first-batch only races the prefetch queue (the
    # remaining batches are already decoded, reading as millions of
    # img/s).  Timing the post-warm-up batches of a longer streaming
    # pass measures the pool's saturated arrival rate — the actual
    # decode supply ceiling the composed loop sees.
    # thread decode, 4 workers: on this 1-core host the process pool's
    # 75 MB-per-batch pickle transport costs 2.4-2.7x (185.5 vs 69-70
    # img/s composed, tools/exp_pipe_1core.py same-window sweep); thread
    # decode shares the native decoder's released-GIL sections instead
    kind = os.environ.get("UML_PIPELINE_DECODE", "thread")
    n_work = int(os.environ.get("UML_PIPELINE_DECODE_WORKERS", "4"))
    warm = items[:2 * PIPELINE_BATCH]
    loader = ImageBatchLoader(warm + items, "crop", PIPELINE_BATCH,
                              num_workers=n_work, prefetch=max(n_work, 4),
                              worker_kind=kind)
    first_batch, n_seen = None, 0
    t0 = time.time()
    half_t = None
    for b in loader:
        n_seen += len(b[1])
        if first_batch is None:
            first_batch = b[0].reshape(len(b[1]), -1)
        if half_t is None and n_seen >= len(warm):
            half_t, half_n = time.time(), n_seen
    steady_n = n_seen - half_n
    steady_s = time.time() - half_t
    decode_rate = (steady_n / steady_s if steady_n > 0 and steady_s > 0
                   else n_seen / (time.time() - t0))

    put_log = []

    def xfer(f):
        # synced put (unsynced ones trickle and queue later transfers
        # behind them); syncing on the TRANSFER THREAD still overlaps
        # the device's in-flight forwards
        t0 = time.time()
        d = jax.device_put(f)
        d.block_until_ready()
        put_log.append((t0, time.time()))
        return d

    def cap_sample(n=3):
        # bracketing link-cap sample: median of n synced fresh-buffer puts
        rates = []
        rng = np.random.default_rng(2)
        for _ in range(n):
            a = rng.integers(0, 255, (PIPELINE_BATCH, 224 * 224 * 3),
                             dtype=np.uint8)
            t0 = time.time()
            d = jax.device_put(a)
            d.block_until_ready()
            rates.append(batch_mb / (time.time() - t0))
            del d
        return float(np.median(rates))

    # compile the pipeline-shape forward (post-fetch regime: the process
    # fetched during the headline)
    staged0 = xfer(first_batch)
    float(extract_sum(variables, staged0))
    cap_pre = cap_sample()

    # steady-state composed pipeline, feeder-structured: a feeder thread
    # iterates the decode pool and submits puts to the transfer thread
    # (bounded queue of 3 staged batches caps device staging RAM); the
    # main thread only waits on staged batches, dispatches the forward,
    # and fetches features one batch behind.  The loop self-attributes
    # its wall-clock: main blocked on staged batches (link-bound), on
    # the per-batch feature fetch; feeder blocked on the decode iterator.
    import queue

    loader = ImageBatchLoader(items, "crop", PIPELINE_BATCH,
                              num_workers=n_work, prefetch=max(n_work, 4),
                              worker_kind=kind)
    put_log.clear()
    staged_q = queue.Queue(maxsize=3)
    t_decode_box = [0.0]

    def feed():
        with ThreadPoolExecutor(max_workers=1) as pool:
            it = iter(loader)
            while True:
                td = time.time()
                batch = next(it, None)
                t_decode_box[0] += time.time() - td
                if batch is None:
                    break
                imgs = batch[0]
                staged_q.put(pool.submit(
                    xfer, imgs.reshape(imgs.shape[0], -1)))
            staged_q.put(None)

    t_wait = t_fetch = 0.0
    with ThreadPoolExecutor(max_workers=1) as feeder:
        t0 = time.time()
        feeder.submit(feed)
        outs, fetched = [], 0
        while True:
            tw = time.time()
            fut = staged_q.get()
            if fut is None:
                break
            staged = fut.result()
            t_wait += time.time() - tw
            outs.append(extract_sum(variables, staged))
            if len(outs) - fetched >= 2:
                tf = time.time()
                float(outs[fetched])  # fetch-behind, like cli/features.py
                t_fetch += time.time() - tf
                fetched += 1
        for o in outs[fetched:]:
            tf = time.time()
            float(o)
            t_fetch += time.time() - tf
        total = time.time() - t0
        pipe_rate = PIPELINE_IMAGES / total
    cap_post = cap_sample()

    # in-loop link ledger: what the link delivered while a put was in
    # flight, and how much of the wall had one in flight
    t_put = sum(b - a for a, b in put_log)
    inloop_mbps = (len(put_log) * batch_mb / t_put) if t_put else 0.0
    put_active = t_put / total
    link_bound = inloop_mbps * 2**20 / (224 * 224 * 3)
    # the composed loop's ceiling in THIS episode: the link rate the
    # loop ACTUALLY achieved while a put was in flight (the bracketed
    # pre/post cap samples show how far the tunnel's cap moved around
    # it) composed with the decode supply.  On a multi-core host decode
    # and transfer overlap, so the BINDING stage bounds (min); on a
    # 1-core host (this container: os.cpu_count()==1) every host stage
    # time-shares the core, so the serial composition 1/(1/link +
    # 1/decode) is the physics — decode cycles and put cycles cannot
    # coexist
    cores = os.cpu_count() or 1
    if cores > 1:
        bound = min(link_bound, decode_rate)
    else:
        bound = 1.0 / (1.0 / max(link_bound, 1e-9)
                       + 1.0 / max(decode_rate, 1e-9))
    return {
        "pipeline_img_per_s": round(pipe_rate, 1),
        "pipeline_host_decode_img_per_s": round(decode_rate, 1),
        "pipeline_host_cores": cores,
        "pipeline_cap_pre_MBps": round(cap_pre, 1),
        "pipeline_cap_post_MBps": round(cap_post, 1),
        "pipeline_inloop_put_MBps": round(inloop_mbps, 1),
        "pipeline_put_active_frac": round(put_active, 2),
        "pipeline_link_bound_img_per_s": round(link_bound, 1),
        "pipeline_bound_img_per_s": round(bound, 1),
        "pipeline_vs_link_bound": round(pipe_rate / bound, 2),
        # wall-clock self-attribution of the composed loop: main thread
        # blocked on the staged-batch queue (link-bound) / the per-batch
        # feature fetch; feeder thread blocked on the decode iterator
        "pipeline_blocked_transfer_frac": round(t_wait / total, 2),
        "pipeline_blocked_fetch_frac": round(t_fetch / total, 2),
        "pipeline_blocked_decode_frac": round(t_decode_box[0] / total, 2),
    }


def train_marginal(rate_128, rate_512):
    """Two-point decomposition of the train step: t(B) = f + c*B across
    the bs128/bs512 pair (bs512 runs 4 stash-friendly microbatches in
    ONE dispatch, so it amortizes everything per-step-fixed).  The
    marginal rate 1/c is the framework's steady-state per-image cost;
    f bundles the per-step fixed work plus the relay's per-dispatch
    round trip (donated steps cannot dispatch ahead: the next step
    waits on the donated buffer handoff), which a real TPU host pays
    in microseconds, not milliseconds.  Returns {} when the pair is
    degenerate (bs512 not slower in absolute step time)."""
    t128, t512 = 128.0 / rate_128, 512.0 / rate_512
    if t512 <= t128:
        return {}
    c = (t512 - t128) / 384.0
    return {"train_full_finetune_marginal_img_per_s": round(1.0 / c, 1),
            "train_step_fixed_overhead_ms":
            round((t128 - 128.0 * c) * 1e3, 1)}


def train_bench(model, variables, u8_batches):
    """Full-model finetune step (fwd+bwd+adamw through the ViT tower) —
    the reference's flagship training path (finetune.py:120-288 with
    full_ds_full_model_finetune, 64-image batches; bs128 is the primary
    line, bs512 the composition-friendly extra).

    ``u8_batches``: list of staged uint8 inputs; one rate per entry.
    The step donates params+opt (like the real train loop), which
    invalidates the donated buffers — so both batch sizes run inside
    ONE call, threading the evolving params through, and ``variables``'
    visual tree must not be used in-process afterwards.

    The optimizer covers the image tower + classifier head ONLY — the
    reference's actual finetune surface (finetune.py:337-346 builds
    UMLClip from the image encoder; text enters as precomputed .pth
    features and the text transformer is never trained)."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    rng = np.random.default_rng(0)
    head = jnp.asarray(rng.standard_normal((512, 100)) * 0.01, jnp.float32)
    frozen = {k: v for k, v in variables["params"].items() if k != "visual"}
    params = {"visual": variables["params"]["visual"], "head": head}
    tx = optax.adamw(1e-5)
    opt = tx.init(params)

    def loss_fn(p, u8, labels):
        feats = model.apply({"params": {**frozen, "visual": p["visual"]}},
                            u8, method=lambda m, x: m.encode_image_u8(x))
        logits = feats @ p["head"]
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()

    # donate params+opt state like the real train loop (train/supervised
    # step donates): avoids fresh allocations + copies every step.
    # Batches past the stash-friendly size run as a lax.scan of
    # microbatches with fp32 grad accumulation (train/accum.py): each
    # slice executes the bs<=256-shaped program with the forward-stash
    # backwards ON, so big batches inherit the small batch's per-image
    # rate instead of falling back to the recompute backward.
    from uml_tpu.train.accum import microbatched_value_and_grad, pick_microbatch

    cfg = model.config

    # mb is a STATIC jit arg (the cache keys on it) — same rule as the
    # kernel G/IL flags (ADVICE r4: no trace-time reads of mutable state)
    @functools.partial(jax.jit, static_argnums=(4,), donate_argnums=(0, 1))
    def step(p, o, u8, labels, mb):
        vg = microbatched_value_and_grad(loss_fn, mb)
        loss, grads = vg(p, u8, labels)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), o, loss

    seq = cfg.grid_size ** 2 + 1
    p, o = params, opt
    iters = 5
    out = []
    for u8 in u8_batches:
        b = u8.shape[0]
        mb = pick_microbatch(b, seq, 3 * cfg.vision_width,
                             4 * cfg.vision_width)
        labels = jnp.asarray(rng.integers(0, 100, (b,)), jnp.int32)
        p, o, l = step(p, o, u8, labels, mb)
        float(l)  # compile + sync
        rates = []
        for _ in range(RUNS):
            t0 = time.time()
            for _ in range(iters):
                p, o, l = step(p, o, u8, labels, mb)
            float(l)
            rates.append(b * iters / (time.time() - t0))
        out.append(median(rates))
    return out


# ---------------------------------------------------------------------------
# parent orchestrator
# ---------------------------------------------------------------------------


def _parse_stream(text):
    """Merge every JSON-dict line a child emitted (ignores warnings)."""
    out = {}
    for line in (text or "").splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                d = json.loads(line)
            except ValueError:
                continue
            if isinstance(d, dict):
                out.update(d)
    return out


def run_child(extra_env, timeout_s, first_light_s=None):
    """Launch this file as a child with ``extra_env``; return
    (merged_metrics, status).  A timeout kill still yields whatever
    metric lines the child streamed before dying.

    ``first_light_s``: the relay has documented stall episodes where a
    fresh process's FIRST dispatch hangs 15+ min even on warm-cache
    programs (one such episode consumed a whole 1140 s core window).
    Stalls are per-process — a fresh process usually gets a fresh
    handshake — so if the child streams NO metric line within this
    window (the bf16 headline normally lands by ~330 s: ~230 s
    handshake + init + measure), it is killed with status
    ``no-first-light`` and the parent relaunches once."""
    import threading

    env = {**os.environ, **extra_env}
    name = extra_env.get("UML_BENCH_FAMILY") or next(iter(extra_env))
    t0 = time.time()
    try:
        proc = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)
    except Exception as e:  # pragma: no cover
        return {}, f"error: {type(e).__name__}: {e}"
    out_lines, err_parts = [], []
    got_line = threading.Event()

    def _read_out():
        for ln in proc.stdout:
            out_lines.append(ln)
            if ln.lstrip().startswith("{"):
                got_line.set()

    def _read_err():
        err_parts.append(proc.stderr.read())

    to = threading.Thread(target=_read_out, daemon=True)
    te = threading.Thread(target=_read_err, daemon=True)
    to.start()
    te.start()
    status = None
    while status is None:
        if proc.poll() is not None:
            status = "ok" if proc.returncode == 0 else f"rc={proc.returncode}"
        elif (first_light_s is not None and not got_line.is_set()
                and time.time() - t0 > first_light_s):
            proc.kill()
            status = "no-first-light"
        elif time.time() - t0 > timeout_s:
            proc.kill()
            status = "timeout"
        else:
            time.sleep(0.5)
    proc.wait()
    to.join(timeout=3)
    te.join(timeout=3)
    stderr = "".join(err_parts)
    if stderr:  # the stage marks say where the budget went
        sys.stderr.write(stderr[-6000:])
    print(f"bench: child {name} {status} in {time.time() - t0:.0f}s "
          f"(timeout {timeout_s:.0f}s, total elapsed "
          f"{time.time() - _START:.0f}s)", file=sys.stderr)
    return _parse_stream("".join(out_lines)), status


def probe_relay():
    """Health-probe the device path in a bounded child.  The relay has
    documented stall episodes where even previously-compiled trivial
    programs hang 15+ min; when that happens the bench must print an
    explicit error record, not hang past the driver's patience.  Runs
    ONLY after a failed core child (a healthy probe costs ~3 min of
    budget through this relay, 18% of the whole window)."""
    timeout_s = min(float(os.environ.get("UML_PROBE_TIMEOUT_S", 270)),
                    max(60.0, _remaining() - 30))
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env={**os.environ, "UML_BENCH_PROBE": "1"},
            capture_output=True, text=True, timeout=timeout_s)
        return r.returncode == 0 and "ok" in r.stdout
    except Exception:
        return False


def family_followup(missing, deadline_fn=_remaining):
    """One follow-up child for keys the full core child did not reach —
    only worth launching when the remaining budget covers the ~200-230 s
    per-process relay handshake plus at least one measurement."""
    metrics = {}
    rem = deadline_fn()
    if not missing or rem < 300:
        return metrics
    timeout_s = rem - 10
    env = {"UML_BENCH_FAMILY": ",".join(missing),
           "UML_FAMILY_CHILD_BUDGET_S": str(timeout_s - 5)}
    got, _status = run_child(env, timeout_s)
    metrics.update(got)
    return metrics


def compose_record(metrics, shed=()):
    """Assemble the one-line bench JSON (unit-tested: the primary value
    is the fastest serving configuration measured in THIS bench — the
    int8 W8A8 line when it beats bf16, with the bf16 parity-exact number
    always alongside; a missing int8 line falls back to bf16)."""
    speed_of_light = PEAK_TFLOPS * 1e3 / EXTRACTION_GFLOP_PER_IMG
    bf16 = metrics.get("extract_bf16_img_per_s")
    int8 = metrics.get("extract_int8_vitb16_img_per_s")
    int8 = int8 if isinstance(int8, (int, float)) else None
    bf16 = bf16 if isinstance(bf16, (int, float)) else None
    if int8 is not None and (bf16 is None or int8 > bf16):
        value, serving = int8, (
            "int8 W8A8 half-block kernels (--quant int8, ops.quant): "
            "feature cosine >0.999 vs bf16 (tests/test_quant.py); the "
            "parity-exact bf16 path is extract_bf16_img_per_s")
    elif bf16 is not None:
        value, serving = bf16, (
            "bf16 fused half-block kernels (the parity-exact path)")
    else:
        value, serving = 0.0, "error: no extraction line measured"
    record = {
        "metric": "clip_vitb16_feature_extraction_throughput",
        "value": round(value, 1),
        "unit": "img/s/chip",
        "vs_baseline": round(value / BASELINE_IMG_PER_S, 4),
        "serving_config": serving,
        "methodology": f"median of {RUNS} runs x {ITERS} dispatches; "
                       f"global budget {int(TOTAL_BUDGET_S)}s",
    }
    if bf16 is not None:
        record.update({
            "bf16_vs_baseline": round(bf16 / BASELINE_IMG_PER_S, 4),
            "bf16_roofline_fraction": round(bf16 / speed_of_light, 3),
            "bf16_speed_of_light_img_per_s": round(speed_of_light, 0),
            "roofline_note": (
                "measured 34.094 GF/img real MXU work vs 197 TF/s bf16 "
                "peak (tools/roofline_clip.py); 100% bf16 roofline = "
                "5778 img/s on one v5e chip; the int8 serving mode's "
                "speed of light is 8512 img/s at the MEASURED 209-TOPS "
                "Mosaic int8 MXU rate (1.555x bf16, not the 394-TOPS "
                "spec — tools/exp_int8_rate_pallas.py)"),
        })
    record.update(metrics)
    for key, sol in FAMILY_SOL.items():
        v = record.get(key)
        if isinstance(v, (int, float)) and v > 0:
            record[key + "_roofline_fraction"] = round(v / sol, 3)
    if "pipeline_img_per_s" in record:
        record["pipeline_note"] = (
            "jpeg decode->transfer->forward->fetch streaming "
            "(cli/features.py's hot loop); steady state sits in the "
            "relay's post-fetch regime, H2D capped ~12-40 MB/s by the "
            "tunnel and moving within an episode (cap_pre vs cap_post "
            "bracket) — pipeline_vs_link_bound is the composed rate vs "
            "the in-episode bound: min(in-loop link rate, decode rate) "
            "on a multi-core host, their SERIAL composition 1/(1/link+"
            "1/decode) on this 1-core container (host_cores field) "
            "where decode and transfer cannot overlap; put_active_frac "
            "+ blocked fracs are the per-stage ledger")
    if shed:
        record["shed"] = sorted(shed)
    record["elapsed_s"] = round(time.time() - _START, 1)
    return record


def main():
    metrics, shed = {}, []

    # ONE full measurement child: headline bf16 -> int8 serving line ->
    # train -> pipeline -> family survey -> text towers, all streaming.
    # The relay's ~200-230 s per-process first-program handshake makes
    # extra children the most expensive budget item, so everything rides
    # one process and the parent merges whatever streamed even on a
    # timeout kill.  No up-front health probe: the probe runs only if
    # the child comes back empty, to distinguish a relay outage from a
    # framework regression.
    first_light = float(os.environ.get("UML_FIRST_LIGHT_S", 480))
    core_timeout = min(float(os.environ.get("UML_CORE_TIMEOUT_S", 1140)),
                       max(120.0, _remaining() - 30))
    got, status = run_child(
        {"UML_BENCH_CORE": "1", "UML_CORE_FULL": "0" if SKIP_FAMILIES
         else "1", "UML_CORE_BUDGET_S": str(core_timeout - 5)},
        core_timeout, first_light_s=first_light)
    metrics.update(got)
    if status == "no-first-light" and _remaining() > 300:
        # per-process relay stall: a fresh process usually gets a fresh
        # handshake — relaunch the full child into the remaining budget
        retry_timeout = _remaining() - 20
        got, status = run_child(
            {"UML_BENCH_CORE": "1", "UML_CORE_FULL": "0" if SKIP_FAMILIES
             else "1", "UML_CORE_BUDGET_S": str(retry_timeout - 5)},
            retry_timeout)
        metrics.update(got)
    if not metrics:
        if not probe_relay():
            print(json.dumps({
                "metric": "clip_vitb16_feature_extraction_throughput",
                "value": 0.0, "unit": "img/s/chip", "vs_baseline": 0.0,
                "error": (
                    "device relay unresponsive: the core measurement "
                    "child produced nothing and a trivial put+jit+fetch "
                    "in a fresh subprocess did not complete within the "
                    "probe timeout — environment outage, not a framework "
                    "regression (last good: 6620 img/s int8 serving, "
                    "~5018 img/s bf16 = ~87% of the 5778 img/s bf16 "
                    "roofline)")}))
            return
        if _remaining() > 420:
            # relay is alive but the core died: one lean retry
            # (headline + train only)
            got, status = run_child(
                {"UML_BENCH_CORE": "1", "UML_CORE_LEAN": "1",
                 "UML_CORE_BUDGET_S": str(min(390.0, _remaining() - 200))},
                min(400.0, _remaining() - 190))
            metrics.update(got)
    shed.extend(k for k in CORE_KEYS if k not in metrics)

    missing = [k for k in ALL_FAMILY_KEYS if k not in metrics]
    if not SKIP_FAMILIES:
        metrics.update(family_followup(missing))
    shed.extend(k for k in ALL_FAMILY_KEYS if k not in metrics)

    print(json.dumps(compose_record(metrics, shed)))


if __name__ == "__main__":
    if os.environ.get("UML_BENCH_PROBE"):
        run_probe()
    elif os.environ.get("UML_BENCH_CORE"):
        run_core()
    elif os.environ.get("UML_BENCH_FAMILY"):
        run_families_child(os.environ["UML_BENCH_FAMILY"].split(","))
    else:
        main()
