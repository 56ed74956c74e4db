"""Tracing & profiling: jax.profiler traces, stage timers, FLOPs estimates,
HBM-model AutoBatch.

Behavioral spec (SURVEY.md §5 'Tracing/profiling'): the reference wraps
stages in CUDA-synced Profile timers (ops.py:17), offers per-layer thop
profiling (tasks.py:189) and mem-profile-driven AutoBatch (autobatch.py:14).
TPU equivalents: jax.profiler trace context (xplane, viewable in
TensorBoard/XProf), jitted-fn cost_analysis for FLOPs, and a static
HBM-budget batch estimate from compile-time memory analysis.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path

from edgeyolo_tpu.utils import LOGGER, colorstr


@contextlib.contextmanager
def trace(log_dir: str | Path = "runs/profile"):
    """Capture a jax.profiler trace (xplane) for the enclosed region."""
    import jax

    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        LOGGER.info(f"{colorstr('profiler:')} trace written to {log_dir}")


def cost_analysis(fn, *example_args) -> dict:
    """Compile-time FLOPs / bytes-accessed estimate of a jitted function."""
    import jax

    lowered = jax.jit(fn).lower(*example_args)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):
        costs = costs[0] if costs else {}
    return {
        "flops": costs.get("flops", 0.0),
        "bytes_accessed": costs.get("bytes accessed", costs.get("bytes_accessed", 0.0)),
        "transcendentals": costs.get("transcendentals", 0.0),
    }


def memory_analysis(fn, *example_args) -> dict:
    """Compile-time memory footprint of a jitted function (bytes)."""
    import jax

    compiled = jax.jit(fn).lower(*example_args).compile()
    mem = compiled.memory_analysis()
    if mem is None:
        return {}
    return {
        "temp_bytes": getattr(mem, "temp_size_in_bytes", 0),
        "argument_bytes": getattr(mem, "argument_size_in_bytes", 0),
        "output_bytes": getattr(mem, "output_size_in_bytes", 0),
        "peak_bytes": getattr(mem, "peak_memory_in_bytes", 0)
        or getattr(mem, "temp_size_in_bytes", 0) + getattr(mem, "argument_size_in_bytes", 0),
    }


def autobatch(model, imgsz: int = 640, fraction: float = 0.60, hbm_bytes: int | None = None,
              candidates=(1, 2, 4, 8, 16, 32, 64), train: bool = False) -> int:
    """Pick the largest batch whose compile-time memory fits `fraction` of HBM.

    The reference binary-searches CUDA memory at runtime with a fwd+bwd probe
    (autobatch.py:14-40, torch_utils.profile); XLA gives the footprint
    statically, so this never OOMs a real device. train=True probes a
    fwd+grad program (the trainer's batch=-1 path); train=False probes
    inference only. Raises RuntimeError when no candidate can be analyzed —
    the reference's silent default-batch fallback hides real failures.
    """
    import jax
    import jax.numpy as jnp

    if hbm_bytes is None:
        try:
            stats = jax.devices()[0].memory_stats() or {}
            hbm_bytes = stats.get("bytes_limit", 16 * 1024**3)
        except Exception:
            hbm_bytes = 16 * 1024**3  # v5e default
    budget = hbm_bytes * fraction
    if model.variables is None:
        model.init(0, imgsz=imgsz, batch=1)
    variables = model.variables
    p_spec = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables["params"])
    best, errors = None, []
    for b in candidates:
        x = jax.ShapeDtypeStruct((b, imgsz, imgsz, 3), jnp.float32)

        def fwd(img):
            return model.net.apply(variables, img, train=False)["pred"]

        def loss_of(p, img):
            out = model.net.apply({**variables, "params": p}, img,
                                  train=False)["pred"]
            return sum(jnp.sum(jnp.square(o))
                       for o in jax.tree_util.tree_leaves(out))

        try:
            mem = (memory_analysis(jax.grad(loss_of), p_spec, x) if train
                   else memory_analysis(fwd, x))
            peak = mem.get("peak_bytes") or 0
            if peak and peak <= budget:
                best = b
            elif peak:
                break
        except Exception as e:
            errors.append(f"b={b}: {e}")
            break
    if best is None:
        raise RuntimeError(
            f"autobatch: could not size a batch for imgsz={imgsz} within "
            f"{budget/1e9:.1f} GB ({'; '.join(errors) or 'no candidate fits'}); "
            f"pass an explicit batch=")
    LOGGER.info(f"{colorstr('autobatch:')} batch={best} for imgsz={imgsz} "
                f"(budget {budget/1e9:.1f} GB of {hbm_bytes/1e9:.1f} GB HBM, "
                f"{'train' if train else 'inference'} probe)")
    return best


class StageTimer:
    """Named stage timers producing a speed dict (the Results.speed shape)."""

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def speeds_ms(self) -> dict:
        return {k: self.totals[k] / max(self.counts[k], 1) * 1000 for k in self.totals}
