# -*- coding:utf-8 -*-
"""Per-call microbenchmarks: Pallas interaction kernels vs the XLA
formulations, at the production shapes bench.py uses.  Writes
``benchmarks/micro_interactions.json`` so every kernel in ``ops/kernels``
has a recorded measurement (wired or not).

Usage: python benchmarks/micro_interactions.py [batch_size]
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.micro_emb import timed  # noqa: E402

_OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    'micro_interactions.json')


def main():
    import jax.numpy as jnp

    from deeptables_tpu.ops.kernels.fm import fm_pallas

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    F, D, G, L = 26, 16, 64, 128
    rng = np.random.default_rng(0)
    results = {}

    def report(name, sec):
        results[name] = round(sec * 1e6, 1)
        print(f'{name:40s} {sec * 1e6:9.1f} us', flush=True)

    for dtype in (jnp.float32, jnp.bfloat16):
        tag = jnp.dtype(dtype).name
        x = jnp.asarray(rng.normal(size=(B, F, D)), dtype)

        def fm_xla(x=x):
            sq = jnp.square(jnp.sum(x, axis=1))
            ss = jnp.sum(x * x, axis=1)
            return 0.5 * jnp.sum(sq - ss, axis=1, keepdims=True)

        report(f'fm xla {tag}', timed(fm_xla, ()))
        report(f'fm pallas {tag}', timed(lambda x=x: fm_pallas(x), ()))

        x0 = jnp.asarray(rng.normal(size=(B, F, D)), dtype)
        h = jnp.asarray(rng.normal(size=(B, G, D)), dtype)
        w = jnp.asarray(rng.normal(size=(L, F, G)), dtype)

        def cin_xla(x0=x0, h=h, w=w):
            return jnp.einsum('bfd,bgd,lfg->bld', x0, h, w,
                              preferred_element_type=jnp.float32)

        report(f'cin xla einsum {tag}', timed(cin_xla, ()))
        # (legacy per-layer pallas CIN removed round 5 after two declines;
        # the batch-minor fused fwd/bwd kernels are measured by micro_cin)

    with open(_OUT, 'w') as f:
        json.dump({'batch': B, 'shapes': {'F': F, 'D': D, 'G': G, 'L': L},
                   'per_call_us': results}, f, indent=1)
    print(f'wrote {_OUT}')


if __name__ == '__main__':
    main()
