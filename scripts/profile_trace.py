"""Capture a jax.profiler device trace of a step and aggregate per-op time.

Usage:
    python scripts/profile_trace.py unet_aug|unet_bare|phase2|encoder_fwd_bwd

Methodology (docs/PERF.md): through the TPU tunnel only a D2H fetch
synchronizes, so the capture brackets N steps and the parser aggregates
device-track event durations from the chrome-trace json the profiler
writes (``*.trace.json.gz``), bucketing by op category. Host-side wall
timing of individual dispatches is NOT meaningful here.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile


def capture(fn, logdir=None, steps=3):
    """Run ``fn()`` ``steps`` times inside a profiler trace; return logdir."""
    import jax

    logdir = logdir or tempfile.mkdtemp(prefix="mia_trace_")
    jax.profiler.start_trace(logdir)
    for _ in range(steps):
        fn()
    jax.profiler.stop_trace()
    return logdir


_FMT = re.compile(
    r"fusion|copy|transpose|bitcast|reshape|convert|slice|pad|concatenate"
)


def load_events(logdir):
    """Complete events ('ph' == 'X') plus pid/tid name maps."""
    paths = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True)
    paths += glob.glob(os.path.join(logdir, "**", "*.trace.json"), recursive=True)
    events, pid_names, tid_names = [], {}, {}
    for p in paths:
        op = gzip.open if p.endswith(".gz") else open
        with op(p, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                pid_names[ev.get("pid")] = ev.get("args", {}).get("name", "")
            elif ev.get("ph") == "M" and ev.get("name") == "thread_name":
                tid_names[(ev.get("pid"), ev.get("tid"))] = ev.get("args", {}).get(
                    "name", ""
                )
            elif ev.get("ph") == "X":
                events.append(ev)
    return events, pid_names, tid_names


def device_op_times(logdir, steps=1):
    """Aggregate 'XLA Ops'-track durations (us) by op name; returns
    (per_op dict name -> us/step, total_us/step)."""
    events, pid_names, tid_names = load_events(logdir)
    op_tracks = {
        key
        for key, name in tid_names.items()
        if name == "XLA Ops" and "TPU" in pid_names.get(key[0], "")
    }
    per_op = collections.Counter()
    for ev in events:
        if (ev.get("pid"), ev.get("tid")) in op_tracks and "dur" in ev:
            per_op[ev["name"]] += ev["dur"]
    for k in per_op:
        per_op[k] /= steps
    return dict(per_op), sum(per_op.values())


def bucket(per_op):
    """Group op names into coarse buckets for a readable report."""
    buckets = collections.Counter()
    for name, us in per_op.items():
        n = name.lower()
        if "conv" in n:
            b = "convolution"
        elif any(k in n for k in ("dot", "einsum", "gemm", "matmul")):
            b = "matmul"
        elif n.startswith("while") or ".while" in n:
            b = "while"
        elif "custom-call" in n or "pallas" in n or "tpu_custom_call" in n:
            b = "custom_call(pallas)"
        elif any(k in n for k in ("dynamic-slice", "dynamic_update", "gather", "scatter")):
            b = "gather/scatter"
        elif "fusion" in n or "loop_" in n:
            b = "fusion(loop/elementwise)"
        elif _FMT.search(n):
            b = "data_formatting"
        elif "rng" in n or "threefry" in n:
            b = "rng"
        elif "reduce" in n:
            b = "reduce"
        elif "all-reduce" in n or "all-gather" in n:
            b = "collective"
        else:
            b = "other"
        buckets[b] += us
    return buckets


def report(logdir, steps, top=40, hlo_text=None):
    per_op, total = device_op_times(logdir, steps)
    print(f"total device busy: {total/1e3:.2f} ms/step")
    print("-- buckets --")
    for b, us in bucket(per_op).most_common():
        print(f"  {b:28s} {us/1e3:9.3f} ms  ({100*us/max(total,1):.1f}%)")
    print(f"-- top {top} ops --")
    for name, us in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {us/1e3:9.3f} ms  {name[:120]}")
    if hlo_text:
        print("-- attribution by op_name metadata --")
        for grp, us in attribute(per_op, hlo_text).most_common(30):
            print(f"  {us/1e3:9.3f} ms  {grp[:140]}")


def _shorten_opname(op: str) -> str:
    """Compress a jit op_name path to a readable attribution group:
    direction (fwd/bwd) + the innermost module-ish path segments, with
    repeated-submodule indices collapsed (block7 → block*)."""
    direction = "bwd" if "transpose(" in op else "fwd"
    op = re.sub(r"\b(block|mask_decoder|layer|up|norm|hyper_mlp)\d+\b", r"\1*", op)
    parts = [
        p
        for p in op.replace("transpose(jvp(", "").replace("jvp(", "").split("/")
        if p and not p.startswith("jit(")
    ]
    # drop the HLO-leaf op (add/dot_general/...) to group by module
    keep = parts[:-1] if len(parts) > 1 else parts
    tail = "/".join(keep[-3:])
    return f"{direction} {tail}"


def attribute(per_op, hlo_text):
    """Aggregate per-op device time by the HLO metadata op_name groups."""
    meta = {}
    pat = re.compile(r"^\s*(?:ROOT )?%?([A-Za-z0-9_.\-]+) = .*op_name=\"([^\"]*)\"")
    for line in hlo_text.splitlines():
        m = pat.match(line)
        if m:
            meta[m.group(1)] = m.group(2)
    groups = collections.Counter()
    for name, us in per_op.items():
        op = meta.get(name)
        groups[_shorten_opname(op) if op else f"<no-metadata> {name.split('.')[0]}"] += us
    return groups


# ---------------------------------------------------------------- targets


def _target_unet(augmented):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench as B
    import jax

    step, state, images, labels = B._build_unet_step(augmented)
    key = jax.random.PRNGKey(1)
    holder = {"state": state}

    def one():
        holder["state"], m = step(holder["state"], images, labels, key)
        B._sync(m["loss"])

    return one


def _target_phase(phase2: bool):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench as B
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mia_tpu.memories import init_feature_memory
    from mia_tpu.training.cpcsam_trainer import CPCSAMConfig, CPCSAMTrainer

    cfg = CPCSAMConfig(
        batch_size=8, labeled_batch_ratio=0.5, image_size=512, num_classes=3,
        compute_dtype="bfloat16", max_iter=1000, warmup_iter=10,
        use_contrastive_loss=False, use_adv_loss=False,
    )
    tr = CPCSAMTrainer(work_path="/tmp/prof_cpcsam", config=cfg, verbose=False)
    tr.initialize(); tr._setup_loss(); tr._setup_optimizer(); tr._make_programs()
    tr.memory = init_feature_memory(cfg.num_classes, 2 * (256 // 16))
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((cfg.batch_size, 512, 512, 3), np.float32))
    labels = jnp.asarray(
        rng.integers(0, cfg.num_classes + 1, (cfg.batch_size, 512, 512)), jnp.int32)
    key = jax.random.PRNGKey(0)
    step_fn = tr._step_phase2 if phase2 else tr._step_phase1
    st = {"p": tr.params, "o": tr.opt_state, "m": tr.memory, "i": 0}

    def one():
        st["p"], st["o"], st["m"], metrics = step_fn(
            st["p"], st["o"], st["m"], images, labels, key, jnp.asarray(st["i"]))
        st["i"] += 1
        B._sync(metrics["loss"])

    def hlo_text():
        return step_fn.lower(
            st["p"], st["o"], st["m"], images, labels, key, jnp.asarray(0)
        ).compile().as_text()

    one.hlo_text = hlo_text
    return one


def _target_encoder():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench as B
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mia_tpu.models.sam.image_encoder import ImageEncoderViT

    enc = ImageEncoderViT(
        img_size=512, embed_dim=768, depth=12, num_heads=12, use_rel_pos=True,
        window_size=14, global_attn_indexes=(2, 5, 8, 11), dtype=jnp.bfloat16)
    x = jnp.asarray(np.random.default_rng(0).random((8, 512, 512, 3), np.float32))
    variables = jax.tree.map(
        lambda s: jnp.zeros(s.shape, s.dtype),
        jax.eval_shape(lambda: enc.init(jax.random.PRNGKey(0), x[:1])))
    bwd = jax.jit(jax.grad(
        lambda v, x: jnp.sum(enc.apply(v, x).astype(jnp.float32) ** 2)))

    def one():
        o = bwd(variables, x)
        B._sync(jax.tree.leaves(o)[0])

    return one


TARGETS = {
    "unet_aug": lambda: _target_unet(True),
    "unet_bare": lambda: _target_unet(False),
    "phase1": lambda: _target_phase(False),
    "phase2": lambda: _target_phase(True),
    "encoder_fwd_bwd": _target_encoder,
}


if __name__ == "__main__":
    name = sys.argv[1]
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    one = TARGETS[name]()
    one()  # compile + warm
    one()
    logdir = capture(one, steps=steps)
    print("trace:", logdir)
    hlo = one.hlo_text() if hasattr(one, "hlo_text") else None
    report(logdir, steps, hlo_text=hlo)
