"""Measure the pdf-stage alternatives on the real TPU (VERDICT r3 #8).

Compares, at the train step's importance-sampling shape:
  A. sample_pdf_merged        — sort-native bracketing (r3 shipped path)
  B. sample_pdf_merged_dense  — dense masked-reduction bracketing + one
                                (R, N+K) merge sort (bit-identical output)

Timing uses data-fetch barriers (a scalar sum of the result), median of
``--loops`` after one warmup.  Also asserts bit-identity on-device.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/pdf_dense_bench.py
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pcnerf_tpu.ops.sampling import sample_pdf_merged, sample_pdf_merged_dense


def timed(fn, loops):
    """Median seconds per call.  Each measured fetch covers a CHAIN of
    ``inner`` data-dependent applications inside one jit, so the ~26 ms
    tunnel round-trip amortizes 1/inner instead of dominating a per-call
    fetch (the first draft of this bench measured 29 vs 27 ms for ops whose
    real costs are 13 vs 3 ms — pure latency)."""
    fn()                      # warmup (compile)
    ts = []
    for _ in range(loops):
        t0 = time.time()
        float(fn())           # data fetch = the only reliable barrier here
        ts.append(time.time() - t0)
    return float(np.median(ts))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rays", type=int, default=1024)
    p.add_argument("--n-samples", type=int, default=768)
    p.add_argument("--n-importance", type=int, default=1536)
    p.add_argument("--loops", type=int, default=20)
    p.add_argument("--det", action="store_true")
    a = p.parse_args()

    rng = np.random.default_rng(3)
    R, N, K = a.rays, a.n_samples, a.n_importance
    z = np.sort(rng.uniform(0.5, 60.0, (R, N)), -1).astype(np.float32)
    mids = 0.5 * (z[:, 1:] + z[:, :-1])
    w = rng.uniform(0, 1, (R, N - 2)).astype(np.float32)
    key = jax.random.PRNGKey(9)
    zj, mj, wj = jnp.asarray(z), jnp.asarray(mids), jnp.asarray(w)

    INNER = 16

    def chain(op):
        # data-dependent chain: each iteration's weights are perturbed by
        # the previous output's sum so XLA cannot hoist or dedupe the calls
        def body(c, _):
            out = op(key, zj, mj, wj + c * 1e-12, K, a.det)
            return jnp.sum(out) * 1e-20, None

        def run():
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=INNER)
            return c
        return jax.jit(run)

    sort_fn = chain(sample_pdf_merged)
    dense_fn = chain(sample_pdf_merged_dense)

    # bit-identity on the real device
    got = jax.jit(lambda: sample_pdf_merged_dense(key, zj, mj, wj, K, a.det))()
    want = jax.jit(lambda: sample_pdf_merged(key, zj, mj, wj, K, a.det))()
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    t_sort = timed(sort_fn, a.loops) / INNER
    t_dense = timed(dense_fn, a.loops) / INNER
    print(json.dumps({
        "shape": {"rays": R, "n_samples": N, "n_importance": K,
                  "det": a.det},
        "inner_chain": INNER,
        "sort_ms": round(t_sort * 1e3, 2),
        "dense_ms": round(t_dense * 1e3, 2),
        "speedup": round(t_sort / t_dense, 2),
        "bit_identical": True,
        "device": str(jax.devices()[0]),
    }), flush=True)


if __name__ == "__main__":
    main()
