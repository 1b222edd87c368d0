"""Compile-budget controls: shape unification for small domains.

XLA:CPU compiles each distinct (graph, shape) pair from scratch; on the
1-core hosts that run the CPU test suite and the multi-chip dry run, every
big field/EC graph costs 30 s – 3 min to compile. The prover's phases call
the same kernels (batched MSM, batched NTT) with many *slightly different*
batch sizes, so a cold k=6 toy prove used to compile ~10 distinct MSM/NTT
graphs (~9 CPU-minutes of pure compilation, VERDICT round-2 weak #2/#8).

At small domain sizes the runtime cost of padding is trivial, so we pad
every batched MSM/NTT call to a common batch size (PAD_B) and let the
XLA compile cache collapse them to ONE graph each. Large domains (the real
TPU prove path) are never padded — runtime throughput wins there, and the
TPU compile cache is persistent.

Env knobs:
  ZKODST_SMALL_GRAPH_N   unify when the domain size n <= this (default 4096)
  ZKODST_PAD_B           the common batch size (default 4 — smaller graphs
                         compile faster on the 1-core hosts; batches above
                         it run in PAD_B-sized chunks)
"""

from __future__ import annotations

import os

import jax.numpy as jnp


def small_n() -> int:
    return int(os.environ.get("ZKODST_SMALL_GRAPH_N", "4096"))


def unify(n: int) -> bool:
    """True when batch shapes at domain size n should be unified."""
    return n <= small_n()


def pad_b() -> int:
    return int(os.environ.get("ZKODST_PAD_B", "4"))


def chunked_call(batch, fn):
    """Apply `fn` over PAD_B-sized chunks of axis 0 (zero-padded), concat
    the results and slice back to the original length — every call site
    shares ONE (PAD_B, ...) compiled graph regardless of batch size."""
    padded, b = pad_batch(batch)
    w = pad_b()
    outs = [fn(padded[i: i + w]) for i in range(0, padded.shape[0], w)]
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    return out[:b]


def pad_batch(batch, fill=None):
    """Pad axis 0 of `batch` up to the next multiple of PAD_B.

    Returns (padded, original_B). Zero padding is semantically safe for
    both MSM scalars (zero scalar -> identity point, sliced off) and NTT
    columns (the zero polynomial transforms to zeros, sliced off)."""
    b = batch.shape[0]
    pb = (-b) % pad_b()
    if not pb:
        return batch, b
    if fill is None:
        pad = jnp.zeros((pb,) + batch.shape[1:], batch.dtype)
    else:
        pad = jnp.broadcast_to(fill, (pb,) + batch.shape[1:])
    return jnp.concatenate([batch, pad], axis=0), b
