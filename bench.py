"""Benchmark: univariate LMM Wald throughput (SNPs/sec/chip).

North-star metric from BASELINE.json.  Reference point: GEMMA
0.98.5-pre1 does mouse_hs1940 -lmm 1 in 8.38 s ≈ 1,285 SNPs/s
end-to-end on an 8-core desktop (test/performance/releases.org:24-40).

This measures the steady-state device pipeline on mouse-scale data
(n=1940 analyzed individuals, 1 covariate): rotation U'X + batched
REML lambda (grid scan + Brent + Newton) + Wald statistics, identical
math to the -lmm 1 path validated by the BXD golden tests.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

BASELINE_SNPS_PER_SEC = 1285.0


def main():
    import jax
    import jax.numpy as jnp
    from gemma_tpu.models.lmm.engine import assoc_block_impl

    platform = jax.default_backend()
    dtype = jnp.float32 if platform in ("tpu", "axon") else jnp.float64

    n = 1940           # mouse_hs1940 scale
    n_cvt = 1
    S = 8192           # SNPs per device block
    n_blocks = 6

    rng = np.random.default_rng(0)
    eval_ = np.sort(np.abs(rng.gamma(1.5, 1.2, n)))
    eval_[:2] = 0.0
    UtW = rng.normal(0.9, 0.2, size=(n, n_cvt))
    Uty = rng.normal(size=n) * np.sqrt(2.0 * eval_ + 1.0)
    U = np.linalg.qr(rng.normal(size=(n, n)))[0]

    eval_d = jnp.asarray(eval_, dtype)
    UtW_d = jnp.asarray(UtW, dtype)
    Uty_d = jnp.asarray(Uty, dtype)
    U_d = jnp.asarray(U, dtype)
    l_mle_null = jnp.asarray(1.0, dtype)
    logl_mle = jnp.asarray(-2000.0, dtype)

    @jax.jit
    def step(X_block):
        Utx = jnp.matmul(X_block, U_d, preferred_element_type=dtype)
        st = assoc_block_impl(eval_d, UtW_d, Uty_d, Utx, l_mle_null,
                              logl_mle, n_cvt=n_cvt, mode=1)
        return st.p_wald, st.beta, st.se, st.lambda_remle, st.logl_H1

    blocks = [
        jnp.asarray(rng.binomial(2, rng.uniform(0.05, 0.5, size=(S, 1)),
                                 size=(S, n)).astype(np.float32), dtype)
        for _ in range(n_blocks)
    ]

    # warmup/compile
    out = step(blocks[0])
    out[0].block_until_ready()

    t0 = time.time()
    for b in blocks:
        out = step(b)
    out[0].block_until_ready()
    dt = time.time() - t0

    snps_per_sec = n_blocks * S / dt
    print(json.dumps({
        "metric": "univariate_lmm_wald_snps_per_sec_per_chip",
        "value": round(snps_per_sec, 1),
        "unit": "SNPs/s",
        "vs_baseline": round(snps_per_sec / BASELINE_SNPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
