# -*- coding:utf-8 -*-
"""Shared measurement discipline for train-step throughput benchmarks.

Method (the "pipelined-fetch" methodology, established in round 2):

- the jitted unit of dispatch is ONE long ``lax.scan`` chunk of
  ``steps_per_chunk`` train steps cycling over a device-resident rotation of
  batches, with the (params, batch_stats, opt_state) carry **donated** —
  this amortises the ~25 ms per-dispatch tunnel round-trip to <3% of the
  timed window;
- completion is proven by **host fetches** of the per-step losses, not
  ``block_until_ready`` (observed to return early on the tunneled platform,
  inflating async-loop timings by >50×);
- fetches are pipelined: dispatch chunk k, then fetch chunk k-1's losses
  while k executes.  Chunks form a serial dependency chain through the
  donated params, so the final fetch proves every counted step executed.

Also provides the roofline accounting: XLA's own per-chunk cost analysis
(flops / bytes accessed) divided into per-step numbers and compared against
the chip's peak FLOP/s and HBM bandwidth.
"""

import time

import numpy as np

# Peak specs by jax device_kind. v5e: 197 bf16 TFLOP/s (MXU), 16 GB HBM at
# 819 GB/s (public TPU v5e system specs).
CHIP_PEAKS = {
    'TPU v5 lite': {'bf16_flops': 197e12, 'hbm_bytes_per_s': 819e9},
    'TPU v5e': {'bf16_flops': 197e12, 'hbm_bytes_per_s': 819e9},
    'TPU v4': {'bf16_flops': 275e12, 'hbm_bytes_per_s': 1228e9},
    'TPU v6 lite': {'bf16_flops': 918e12, 'hbm_bytes_per_s': 1640e9},
}


def make_train_chunk(train_step, n_batches, steps_per_chunk):
    """Wrap a per-batch ``train_step`` into a scan-chunk function.

    ``train_step(params, batch_stats, opt_state, batch, yb, rng)`` must
    return ``(params, batch_stats, opt_state, loss)``.
    """
    import jax
    import jax.numpy as jnp

    def train_chunk(params, batch_stats, opt_state, batches, ys, rng):
        idx = jnp.arange(steps_per_chunk, dtype=jnp.int32) % n_batches

        def body(carry, i):
            p, bs, o = carry
            b = jax.tree_util.tree_map(lambda a: a[i], batches)
            p, bs, o, loss = train_step(p, bs, o, b, ys[i], rng)
            return (p, bs, o), loss

        (params, batch_stats, opt_state), losses = jax.lax.scan(
            body, (params, batch_stats, opt_state), idx)
        return params, batch_stats, opt_state, losses

    return train_chunk


def measure_chunked(chunk_jit, params, bstats, opt_state, stacked, rng,
                    batch_size, steps_per_chunk, bench_seconds=5.0):
    """Run the pipelined-fetch timing loop.  Returns a result dict.

    ``chunk_jit`` is the jitted (donating) chunk; ``stacked`` is the
    (batches_pytree, ys) pair of device-resident stacked batches.
    """
    import jax

    # Warmup: compile + one full chunk; host-fetch to ensure completion.
    params, bstats, opt_state, losses = chunk_jit(params, bstats, opt_state,
                                                  *stacked, rng)
    np.asarray(losses)

    steps = 0
    prev_losses = None
    t0 = time.perf_counter()
    while True:
        params, bstats, opt_state, losses = chunk_jit(
            params, bstats, opt_state, *stacked, rng)
        if prev_losses is not None:
            np.asarray(prev_losses)  # overlap fetch k-1 with compute k
        prev_losses = losses
        steps += steps_per_chunk
        if time.perf_counter() - t0 >= bench_seconds:
            break
    losses_host = np.asarray(prev_losses)  # final fetch = completion proof
    elapsed = time.perf_counter() - t0
    finite = bool(np.all(np.isfinite(losses_host)))
    return {
        'examples_per_sec': steps * batch_size / elapsed,
        'step_seconds': elapsed / steps,
        'steps': steps,
        'finite': finite,
    }


def step_cost_analysis(train_step, params, bstats, opt_state, batch, yb,
                       rng):
    """XLA cost analysis of ONE jitted train step (never the scan chunk:
    XLA counts a loop body once, so a chunk's numbers are not per-step).

    Returns {'flops': f, 'bytes': b}, or None if unavailable.  Lowers on
    shape structs so donated/executed buffers are never touched.
    """
    import jax

    def _aval(tree):
        return jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(np.shape(a), a.dtype), tree)

    try:
        lowered = jax.jit(train_step).lower(
            _aval(params), _aval(bstats), _aval(opt_state), _aval(batch),
            _aval(yb), _aval(rng))
        ca = lowered.compile().cost_analysis()
        if isinstance(ca, list):  # older jax returns one dict per device
            ca = ca[0]
        if not ca:
            return None
        return {'flops': float(ca.get('flops', 0.0)),
                'bytes': float(ca.get('bytes accessed', 0.0))}
    except Exception:
        return None


def roofline(step_seconds, flops_per_step, bytes_per_step, device_kind=None):
    """Which bound (MXU vs HBM) the step hits and how close it is.

    Returns a dict with the two bound times, the binding resource, and the
    fraction of the roofline achieved (measured vs best-possible step time).

    Caveat: XLA's 'bytes accessed' counts every op's operand/result bytes,
    including buffers that fusion keeps in registers/VMEM — it is an UPPER
    bound on true HBM traffic, so ``roofline_fraction`` can exceed 1 when
    fusion removes most of the counted traffic.  Treat the flops-side bound
    as exact and the bytes-side bound as pessimistic; BASELINE.md carries
    the hand-computed traffic for the headline configs.
    """
    import jax
    if device_kind is None:
        device_kind = jax.devices()[0].device_kind
    peaks = CHIP_PEAKS.get(device_kind)
    if peaks is None:
        return {'device_kind': device_kind, 'known_peaks': False}
    t_mxu = flops_per_step / peaks['bf16_flops']
    t_hbm = bytes_per_step / peaks['hbm_bytes_per_s']
    bound = 'HBM' if t_hbm >= t_mxu else 'MXU'
    t_bound = max(t_hbm, t_mxu)
    return {
        'device_kind': device_kind,
        'known_peaks': True,
        'mxu_bound_ms': t_mxu * 1e3,
        'hbm_bound_ms': t_hbm * 1e3,
        'bound': bound,
        'roofline_fraction': (t_bound / step_seconds)
        if step_seconds > 0 else 0.0,
    }
