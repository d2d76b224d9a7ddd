"""Profiling helpers: device traces + top-op summaries.

The reference's observability is wandb scalars + ad-hoc timers (SURVEY §5);
here ``trace_and_summarize`` wraps ``jax.profiler.trace`` (verified working
through the axon TPU relay) and digests the Perfetto JSON into per-op
device-time totals — the workflow that located the ViT forward's cost
centers (LayerNorm fusions / transposes / patch conv).
"""

from __future__ import annotations

import contextlib
import glob
import gzip
import json
from collections import defaultdict


def summarize_trace(trace_dir: str, top: int = 15, per_iter: int = 1):
    """-> [(op_group, total_ms/per_iter, count/per_iter)] sorted by time."""
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    if not files:
        raise FileNotFoundError(f"no trace json under {trace_dir}")
    data = json.load(gzip.open(sorted(files)[-1]))
    agg = defaultdict(lambda: [0.0, 0])
    skip_prefixes = ("$", "np.", "jit_", "Pjit", "Parse", "Python", "Thread")
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and e.get("dur") and \
                not e["name"].startswith(skip_prefixes):
            group = e["name"].rsplit(".", 1)[0]
            agg[group][0] += e["dur"]
            agg[group][1] += 1
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]
    return [(name, dur / 1e3 / per_iter, cnt // per_iter)
            for name, (dur, cnt) in rows]


@contextlib.contextmanager
def trace_and_summarize(trace_dir: str, iters: int = 1, top: int = 15,
                        quiet: bool = False):
    """Context manager: profile the body, print a top-op table.

        with trace_and_summarize("/tmp/tr", iters=3):
            for _ in range(3):
                val = float(step(...))
    """
    import jax

    with jax.profiler.trace(trace_dir):
        yield
    rows = summarize_trace(trace_dir, top=top, per_iter=iters)
    if not quiet:
        print(f"--- device top ops ({trace_dir}, per-iter) ---")
        for name, ms, cnt in rows:
            print(f"{ms:9.2f} ms  x{cnt:4d}  {name}")
