"""Interpret-flavor selection for the Pallas kernels on CPU hosts.

Pallas has two CPU interpreters:

- ``interpret=True`` — the *classic* interpreter: the kernel body is traced
  as ordinary JAX ops and compiled by XLA:CPU.  No threads, no callbacks;
  runs anywhere (including under ``shard_map`` over a virtual device mesh)
  and is the fastest way to execute a kernel off-TPU.
- ``pltpu.InterpretParams()`` — the *Mosaic TPU* interpreter: simulates TPU
  cores/memory spaces with per-device Python threads, ordered
  ``io_callback``s and cross-device ``threading.Barrier``s.  More faithful
  to TPU semantics, but under ``shard_map`` it **deadlocks** whenever a
  kernel operand exceeds the CPU runtime's inline-transfer size (measured:
  ≥128 KiB per device hangs at 8 virtual devices on a 1-core host — device
  threads block inside ``np.array(operand)`` while one thread waits on the
  kernel-entry barrier; jax 0.9.0, ``interpret_pallas_call.py:1881``).

Every kernel here is portable across both (no ``pltpu.prng_random_bits``,
no DMA/semaphore primitives — see megakernel's RNG note), verified bit-equal
on the hybrid engine.  So the default CPU flavor is the classic interpreter;
the Mosaic one stays reachable with ``interpret="mosaic"`` for single-device
faithfulness checks (``tests/test_cluster_megakernel.py`` keeps one).
"""

from __future__ import annotations

from jax.experimental.pallas import tpu as pltpu


def interp_mode(interpret):
    """Map an engine-level ``interpret`` flag to ``pallas_call``'s argument.

    ``False`` → compiled (TPU); ``"mosaic"`` → the Mosaic TPU interpreter;
    anything else truthy → the classic (traced/XLA-compiled) interpreter.
    """
    if not interpret:
        return False
    if interpret == "mosaic":
        return pltpu.InterpretParams()
    return True
