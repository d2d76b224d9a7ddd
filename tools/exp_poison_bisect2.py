"""Bisect WHAT inside (synced) staging degrades the relay's H2D fast path.

exp_transfer_health.py: 193 MB of synced probe puts keep the link at
~1100 MB/s, but staging ViT-B/16 (CPU-jit init -> ~300 MB tree put,
synced) + a 308 MB input put drops every later put to ~36 MB/s — with the
host idle.  Candidate triggers: cumulative transferred bytes, a
many-leaf tree put, the CPU-backend jit/AOT machinery, or one huge array.

Usage: EXP_MODE=<bulk|tree|cpujit|input|all> timeout 900 \
       python tools/exp_poison_bisect2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MODE = os.environ.get("EXP_MODE", "all")

import jax
import jax.numpy as jnp

import uml_tpu  # noqa: F401

_rng = np.random.default_rng(1)
_keep = []


def t_put(tag, mb=19):
    h = _rng.integers(0, 256, (mb * 2**20,), dtype=np.uint8)
    t0 = time.time()
    d = jax.device_put(h)
    d.block_until_ready()
    dt = time.time() - t0
    print(f"{tag:40s}: {mb}MB in {dt:6.3f}s ({mb / dt:7.1f} MB/s)",
          flush=True)
    _keep.append(d)


def phase_bulk():
    """4 x 150 MB single-array synced puts — cumulative-bytes probe."""
    for i in range(4):
        h = _rng.integers(0, 256, (150 * 2**20,), dtype=np.uint8)
        t0 = time.time()
        d = jax.device_put(h)
        d.block_until_ready()
        print(f"   bulk put #{i}: {150 / (time.time() - t0):7.1f} MB/s",
              flush=True)
        _keep.append(d)
        t_put(f"B{i} probe post bulk #{i}")


def phase_tree():
    """~200-leaf dict totaling ~300 MB, one synced tree put."""
    tree = {f"w{i}": _rng.standard_normal(196608).astype(np.float32)
            for i in range(200)}       # 200 x 768 KB = 150 MB
    tree2 = {f"b{i}": _rng.standard_normal(196608).astype(np.float32)
             for i in range(200)}
    t0 = time.time()
    d = jax.block_until_ready(jax.device_put((tree, tree2)))
    print(f"   tree put (400 leaves, 300MB): "
          f"{300 / (time.time() - t0):7.1f} MB/s", flush=True)
    _keep.append(d)
    t_put("T probe post tree put")


def phase_cpujit():
    """CPU-backend jit init of ViT-B/16 WITHOUT any device put."""
    from uml_tpu.models.clip import build_clip

    model = build_clip("ViT-B/16", dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = jax.jit(model.init)(
            jax.random.key(0),
            jnp.zeros((1, 224, 224, 3), jnp.float32),
            jnp.zeros((1, 77), jnp.int32))
    _keep.append(variables)
    t_put("C probe post cpu-jit init (no put)")
    del variables


def phase_input():
    """One 308 MB uint8 array, synced put (bench.stage_input's shape)."""
    h = _rng.integers(0, 256, (2048, 224 * 224 * 3), dtype=np.uint8)
    t0 = time.time()
    d = jax.device_put(jnp.asarray(h))
    d.block_until_ready()
    print(f"   input put (308MB single): "
          f"{308 / (time.time() - t0):7.1f} MB/s", flush=True)
    _keep.append(d)
    t_put("I probe post 308MB put")


def phase_cpuarrs():
    """CPU-BACKEND jax arrays (not numpy) -> device_put to the TPU.

    This is what bench.init_on_cpu ships: leaves living on the cpu
    backend, so the put is a cross-backend transfer — possibly a
    different relay path than numpy -> device."""
    cpu = jax.devices("cpu")[0]
    tree = {f"w{i}": jax.device_put(
        _rng.standard_normal(196608).astype(np.float32), cpu)
        for i in range(200)}
    jax.block_until_ready(tree)
    t0 = time.time()
    d = jax.block_until_ready(jax.device_put(tree, jax.devices()[0]))
    print(f"   cpu-jax tree put (200 leaves, 150MB): "
          f"{150 / (time.time() - t0):7.1f} MB/s", flush=True)
    _keep.append(d)
    t_put("J probe post cpu-jax tree put")
    t_put("J probe (rep)")


def phase_combo():
    """Positive control: exactly exp_transfer_health's staging —
    bench.init_on_cpu(ViT-B/16) + bench.stage_input(2048)."""
    import bench

    model = bench.build_clip("ViT-B/16", dtype=jnp.bfloat16)
    variables = bench.init_on_cpu(lambda: model.init(
        jax.random.key(0),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32)))
    _keep.append(variables)
    t_put("K probe post init_on_cpu")
    _keep.append(bench.stage_input(2048, 224 * 224 * 3))
    t_put("K probe post stage_input")
    t_put("K probe (rep)")


def phase_combo_np():
    """Real ViT-B/16 init tree, but leaves converted to host numpy
    BEFORE the put (numpy trees measured fast in MODE=tree)."""
    import bench

    model = bench.build_clip("ViT-B/16", dtype=jnp.bfloat16)
    with jax.default_device(jax.devices("cpu")[0]):
        variables = jax.jit(model.init)(
            jax.random.key(0),
            jnp.zeros((1, 224, 224, 3), jnp.float32),
            jnp.zeros((1, 77), jnp.int32))
    variables = jax.tree.map(np.asarray, variables)
    t0 = time.time()
    d = jax.block_until_ready(
        jax.device_put(variables, jax.devices()[0]))
    print(f"   numpy-ified init tree put: {time.time() - t0:6.3f}s",
          flush=True)
    _keep.append(d)
    t_put("N probe post numpy-tree put")
    t_put("N probe (rep)")


def phase_bf16():
    """200 x 768KB bf16 CPU-jax leaves -> device (dtype hypothesis)."""
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        tree = {f"w{i}": jnp.asarray(
            _rng.standard_normal(393216), jnp.bfloat16)
            for i in range(200)}
    jax.block_until_ready(tree)
    t0 = time.time()
    d = jax.block_until_ready(jax.device_put(tree, jax.devices()[0]))
    print(f"   bf16 cpu-jax tree put (150MB): "
          f"{150 / (time.time() - t0):7.1f} MB/s", flush=True)
    _keep.append(d)
    t_put("F probe post bf16 tree put")
    t_put("F probe (rep)")


def phase_smalls():
    """Many tiny + odd-shaped leaves incl. a scalar (shape hypothesis)."""
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        tree = {f"b{i}": jnp.asarray(
            _rng.standard_normal(768), jnp.float32) for i in range(150)}
        tree["logit_scale"] = jnp.asarray(2.6593, jnp.float32)  # scalar
        tree["conv"] = jnp.asarray(
            _rng.standard_normal((16, 16, 3, 768)), jnp.bfloat16)
    jax.block_until_ready(tree)
    t0 = time.time()
    d = jax.block_until_ready(jax.device_put(tree, jax.devices()[0]))
    print(f"   smalls tree put (151 tiny + conv): {time.time() - t0:6.3f}s",
          flush=True)
    _keep.append(d)
    t_put("S probe post smalls put")
    t_put("S probe (rep)")


def main():
    t_put("A0 fresh")
    t_put("A0 fresh (rep)")
    phases = {"bulk": phase_bulk, "tree": phase_tree,
              "cpujit": phase_cpujit, "input": phase_input,
              "cpuarrs": phase_cpuarrs, "combo": phase_combo,
              "combo_np": phase_combo_np, "bf16": phase_bf16,
              "smalls": phase_smalls}
    if MODE == "all":
        for name in ("cpujit", "tree", "input", "bulk"):
            print(f"--- {name}", flush=True)
            phases[name]()
    else:
        phases[MODE]()
    print("done", flush=True)


if __name__ == "__main__":
    main()
