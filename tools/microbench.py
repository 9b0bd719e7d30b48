"""Reliable kernel timing through the remote-TPU tunnel.

Two properties of the axon platform break naive timing loops:

  * ``block_until_ready``/fetch carry a ~30 ms round-trip latency, so
    single-call timings are latency, not compute;
  * repeated dispatch of the same (executable, argument buffers) pair can be
    served from a client-side cache, so "n iterations of the same call"
    can report arbitrarily fast nonsense (measured: a 134 MB-output kernel
    "running" in 16 µs).

``chained_timeit`` defeats both: every iteration's input is perturbed by a
zero scalar *derived from the previous output*, forcing fresh buffers and a
serial dependency chain, and the single final block amortises the round trip
across n iterations.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def _zero_scalar_from(out) -> jax.Array:
    """A scalar that is always 0.0f but data-depends on ``out``."""
    leaf = next(
        a for a in jax.tree.leaves(out) if isinstance(a, jax.Array) and a.size
    )
    flat = jnp.ravel(leaf)[0]
    # The optimization barrier stops XLA from value-analysing the operand
    # (`int * 0` folds; even `convert(int) * 0.0` is foldable since the
    # convert is provably finite) and dead-code-eliminating the entire
    # kernel being timed.  After the barrier the value is opaque, so the
    # float multiply survives and the data dependency is real.
    flat = jax.lax.optimization_barrier(flat.astype(jnp.float32))
    return flat * 0.0


def _perturb(args: tuple, eps: jax.Array) -> tuple:
    """Add ``eps`` (a 0-valued traced scalar) to the first float leaf of args."""
    done = [False]

    def visit(a):
        if (
            not done[0]
            and isinstance(a, jax.Array)
            and a.dtype != jnp.bool_
        ):
            done[0] = True
            return a + eps.astype(a.dtype)
        return a

    out = jax.tree.map(visit, args)
    if not done[0]:
        raise ValueError("chained_timeit needs at least one numeric array argument")
    return out


def chained_timeit(fn: Callable, *args, n: int = 16, warmup: int = 2) -> float:
    """Mean seconds per call of ``fn(*args)``, serialised via data dependency.

    Reliable only when a single call costs well above the ~30 ms tunnel
    round trip (each chain link pays ``max(compute, round_trip)``); for
    cheaper kernels use :func:`repeat_timeit`.
    """
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    eps = _zero_scalar_from(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*_perturb(args, eps))
        eps = _zero_scalar_from(out)
    jax.block_until_ready(eps)
    return (time.perf_counter() - t0) / n


def repeat_timeit(
    fn: Callable, *args, reps: int = 64, n: int = 4, warmup: int = 1
) -> float:
    """Mean seconds per call of ``fn(*args)`` for sub-round-trip kernels.

    Runs ``reps`` serially-dependent iterations of ``fn`` inside ONE jitted
    ``lax.scan`` dispatch (each iteration's input is perturbed by a zero
    scalar derived from the previous output, so nothing can be CSE'd or
    memoised), then chains ``n`` such dispatches.  Choose ``reps`` so that
    ``reps × expected_cost ≳ 50 ms``.
    """

    @jax.jit
    def scanned(eps0, args):
        def body(eps, _):
            out = fn(*_perturb(args, eps))
            return _zero_scalar_from(out), None
        eps, _ = jax.lax.scan(body, eps0, None, length=reps)
        return eps

    eps = jnp.float32(0.0)
    for _ in range(warmup):
        eps = scanned(eps, args)
    jax.block_until_ready(eps)
    t0 = time.perf_counter()
    for _ in range(n):
        eps = scanned(eps, args)
    jax.block_until_ready(eps)
    return (time.perf_counter() - t0) / (n * reps)
