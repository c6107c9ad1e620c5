"""Runtime utilities: profiling, compile cache, device info.

The slice of the reference's ``OpenCLBasic`` runtime layer (``oclbasic.{h,cpp}``)
that still has meaning on TPU: per-stage timing (the analogue of CL event
profiling, ``oclbasic.cpp:232-247`` ``timeCost``), a device-info dump
(``oclbasic.cpp:265-267``), plus TPU-era niceties — a persistent compilation
cache (JIT compiles are the TPU analogue of the reference's runtime
``clBuildProgram``, ``oclbasic.cpp:134-152``, and worth caching across
processes) and throughput accounting.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict


def enable_compile_cache(path: str | None = None) -> str:
    """Persist XLA compilations across processes (first compile of the render
    program takes tens of seconds; cached reloads take ~100 ms)."""
    import jax

    path = path or os.path.join(
        os.path.expanduser("~"), ".cache", "mcpt-jax-cache"
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path


def device_info() -> str:
    """Human-readable device summary (reference device-info dump analogue)."""
    import jax

    lines = [f"backend: {jax.default_backend()}"]
    for d in jax.devices():
        mem = getattr(d, "memory_stats", lambda: None)()
        memline = ""
        if mem:
            total = mem.get("bytes_limit", 0) / 2**30
            used = mem.get("bytes_in_use", 0) / 2**30
            memline = f", hbm {used:.2f}/{total:.2f} GiB"
        lines.append(
            f"  {d.device_kind} id={d.id} process={d.process_index}{memline}"
        )
    return "\n".join(lines)


class StageTimer:
    """Accumulating per-stage wall timer with forced device sync.

    The TPU analogue of the reference's profiling-enabled queue + ``timeCost``:
    JAX dispatch is async (and the axon relay makes ``block_until_ready`` alone
    unreliable), so each stage closes over a scalar readback.

        timer = StageTimer()
        with timer.stage("intersect"):
            out = f(x)
            timer.sync(out)
        print(timer.report())
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        yield
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    @staticmethod
    def sync(tree) -> None:
        """Force completion: jax.block_until_ready + a scalar readback."""
        import jax
        import jax.numpy as jnp
        import numpy as np

        leaves = jax.tree.leaves(tree)
        if leaves:
            jax.block_until_ready(leaves)
            np.asarray(jnp.ravel(leaves[0])[0])  # definitive sync

    def report(self) -> str:
        width = max((len(k) for k in self.totals), default=0)
        lines = []
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(
                f"{name:<{width}}  {total*1e3:9.2f} ms total  "
                f"{total/n*1e3:9.2f} ms/call  ×{n}"
            )
        return "\n".join(lines)


def mrays(segments: float, seconds: float) -> float:
    return segments / max(seconds, 1e-12) / 1e6


def _vpu_peak_cache_path() -> str:
    return os.path.join(os.path.expanduser("~"), ".cache",
                        "mcpt-vpu-peak.json")


def load_cached_vpu_peak() -> float | None:
    """Last measured VPU peak for the attached device kind, or None.

    The peak is a hardware constant, so a prior measurement is a valid MFU
    denominator when a fresh one can't land — e.g. when the tunnelled chip
    is mid-reclaim from a previous process and the first device op blocks
    for minutes (the round-4 bench killer; see bench.py's attach phase).
    """
    import json

    import jax

    try:
        with open(_vpu_peak_cache_path()) as f:
            data = json.load(f)
        kind = jax.devices()[0].device_kind
        val = data.get(kind)
        return float(val) if val else None
    except Exception:  # noqa: BLE001 - cache is best-effort
        return None


def save_cached_vpu_peak(peak: float) -> None:
    import json

    import jax

    path = _vpu_peak_cache_path()
    try:
        try:
            with open(path) as f:
                data = json.load(f)
        except Exception:  # noqa: BLE001
            data = {}
        data[jax.devices()[0].device_kind] = peak
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(data, f)
    except Exception:  # noqa: BLE001 - cache is best-effort
        pass


def measure_vpu_peak(repeats: int = 3) -> float:
    """Empirical f32 VPU FMA peak of the attached chip, in FLOP/s.

    The MFU denominator for ``bench.py``: a Pallas kernel chains UNROLL
    dependent FMAs per element on a VMEM-resident block (arithmetic intensity
    ≈ 128 flop/byte — far past the HBM roofline knee, so this measures the
    vector units, not bandwidth).  The path tracer is VPU-bound elementwise
    code, so the relevant roofline is this number, not the MXU TFLOPs on the
    spec sheet.  Returns the best of ``repeats`` timed runs.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # ~0.5 TFLOP per timed call so the tunnelled-chip dispatch latency
    # (tens of ms per round trip) is noise, not the measurement
    SUB, UNROLL, LOOPS, GRID = 256, 256, 32, 512

    def kernel(x_ref, o_ref):
        a = x_ref[0, 0] * 1e-8 + 1.0000001
        b = x_ref[0, 1] * 1e-8 + 1e-9

        def body(_, v):
            for _ in range(UNROLL):
                v = v * a + b
            return v

        o_ref[:] = jax.lax.fori_loop(0, LOOPS, body, x_ref[:])

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(GRID,),
            out_shape=jax.ShapeDtypeStruct((GRID * SUB, 128), jnp.float32),
            in_specs=[pl.BlockSpec((SUB, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((SUB, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        )(x)

    x = jnp.ones((GRID * SUB, 128), jnp.float32)
    StageTimer.sync(run(x))  # compile + warm
    best = 0.0
    flops = 2.0 * GRID * SUB * 128 * UNROLL * LOOPS
    for _ in range(repeats):
        t0 = time.perf_counter()
        StageTimer.sync(run(x))
        best = max(best, flops / (time.perf_counter() - t0))
    return best
