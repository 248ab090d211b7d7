# -*- coding:utf-8 -*-
"""Per-call micro-benchmark of the fused CIN backward kernel
(ops/kernels/cin_bwd.py) at the xDeepFM bench shapes, vs the XLA 'bm'
formulation.  Micro numbers guide tuning only — adoption decisions come
from the full-step A/B (benchmarks/profile_cin_bwd.py; BASELINE.md rule).

Usage: python benchmarks/micro_cin.py [block_lanes]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, iters=64, rounds=3):
    import jax
    import jax.numpy as jnp

    def chunk(acc):
        def body(acc, _):
            outs = fn(*args)  # closed over (static kwargs stay static)
            # fold every output into the carry so nothing is DCE'd
            for o in jax.tree_util.tree_leaves(outs):
                acc = acc + o.ravel()[:1].astype(jnp.float32)
            return acc, ()
        acc, _ = jax.lax.scan(body, acc, None, length=iters)
        return acc

    cj = jax.jit(chunk)
    acc = jnp.zeros((1,), jnp.float32)
    np.asarray(cj(acc))
    t0 = time.perf_counter()
    for _ in range(rounds):
        np.asarray(cj(acc))
    return (time.perf_counter() - t0) / (rounds * iters)


def main():
    import jax
    import jax.numpy as jnp

    from deeptables_tpu.ops.kernels.cin_bwd import cin_bwd_pallas
    from deeptables_tpu.ops import cin_grad

    block = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    B, D = 8192, 16
    rng = np.random.default_rng(0)
    for (F, G, L) in [(26, 26, 128), (26, 64, 128)]:
        db = B * D
        x0T = jnp.asarray(rng.normal(size=(F, db)).astype(np.float32),
                          dtype=jnp.bfloat16)
        hT = jnp.asarray(rng.normal(size=(G, db)).astype(np.float32),
                         dtype=jnp.bfloat16)
        w2 = jnp.asarray(rng.normal(size=(L, F * G)).astype(np.float32),
                         dtype=jnp.bfloat16)
        dzT = jnp.asarray(rng.normal(size=(L, db)).astype(np.float32),
                          dtype=jnp.bfloat16)
        flops = 2 * 2 * db * L * F * G  # dpair dot + dW dot
        # (block_lanes, chunk_f) combos: 0 = auto / whole-F
        combos = [(block or None, 0), (block or None, 'auto'),
                  (512, 8), (1024, 8), (1024, 16)]
        from deeptables_tpu.ops.kernels.cin_bwd import _chunk_plan
        Gp = -(-G // 8) * 8
        for bl, cf in combos:
            # label with the EFFECTIVE plan: _chunk_plan may reject a
            # requested chunk size (tail-alignment rule) and fall back to
            # the whole-F kernel — a row claiming fc=8 while measuring
            # whole-F misleads the decline record (review r5 finding)
            if cf in (0, 'auto'):
                eff = cf
            else:
                plan = _chunk_plan(F, Gp, want=cf)
                eff = cf if plan is not None else f'{cf}→whole-F(rejected)'
            try:
                t = timed(cin_bwd_pallas, x0T, hT, w2, dzT, False, bl, cf)
            except Exception as e:
                print(f'pallas F={F} G={G} nb={bl} fc={eff}: FAILED '
                      f'{type(e).__name__}: {str(e)[:120]}', flush=True)
                continue
            print(f'pallas F={F} G={G} nb={bl} fc={eff}: {t*1e6:9.1f} us  '
                  f'{flops/t/1e12:6.1f} TFLOP/s', flush=True)

        # XLA bm backward for contrast (same math through the custom VJP)
        x0 = x0T.reshape(F, D, B).transpose(2, 0, 1)
        h = hT.reshape(G, D, B).transpose(2, 0, 1)
        w = w2.astype(jnp.float32).reshape(L, F, G)
        dz = dzT.reshape(L, D, B).transpose(2, 0, 1).astype(jnp.float32)

        def bm_bwd(x0, h, w, dz):
            return cin_grad._bwd_bm((x0, h, w), dz)

        t2 = timed(bm_bwd, x0, h, w, dz)
        print(f'xla-bm F={F} G={G}: {t2*1e6:9.1f} us  '
              f'{flops/t2/1e12:6.1f} TFLOP/s', flush=True)


if __name__ == '__main__':
    main()
