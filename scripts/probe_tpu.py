"""One-off device characterization probes for the axon-tunneled TPU.

Measures the quantities the large-n eigendecomposition design depends
on: tunnel bandwidth, device eigh/QR/matmul wall times.  Run with an
otherwise-idle host (tunnel latency degrades badly under CPU load).

    python scripts/probe_tpu.py [--n 4096]
"""

import argparse
import sys
import os
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="*",
                    default=[1024, 2048, 4096])
    a = ap.parse_args()

    import numpy as np
    import gemma_tpu  # noqa: F401 (compile cache)
    import jax
    import jax.numpy as jnp

    print("backend:", jax.default_backend(), jax.devices(), flush=True)

    # tunnel bandwidth
    M = np.random.default_rng(0).normal(size=(8192, 8192)).astype(np.float32)
    t0 = time.time()
    Md = jax.device_put(M)
    Md.block_until_ready()
    up = M.nbytes / (time.time() - t0) / 1e6
    t0 = time.time()
    _ = np.asarray(jax.device_get(Md))
    down = M.nbytes / (time.time() - t0) / 1e6
    print(f"tunnel: up {up:.0f} MB/s, down {down:.0f} MB/s", flush=True)

    # matmul throughput
    f = jax.jit(lambda x: x @ x)
    out = f(Md)
    out.block_until_ready()
    t0 = time.time()
    out = f(Md)
    out.block_until_ready()
    dt = time.time() - t0
    print(f"matmul 8192 f32: {dt*1e3:.0f} ms "
          f"({2*8192**3/dt/1e12:.1f} TFLOP/s)", flush=True)

    # QR of [2n, n]
    for n in a.sizes:
        A = jnp.asarray(np.random.default_rng(1).normal(
            size=(2 * n, n)).astype(np.float32))
        qr = jax.jit(lambda x: jnp.linalg.qr(x)[0])
        out = qr(A)
        out.block_until_ready()
        t0 = time.time()
        out = qr(A)
        out.block_until_ready()
        print(f"qr [{2*n},{n}] f32: {time.time()-t0:.2f}s", flush=True)

    # device eigh
    for n in a.sizes:
        rng = np.random.default_rng(2)
        B = rng.normal(size=(n, n)).astype(np.float32)
        S = (B @ B.T / n).astype(np.float32)
        Sd = jax.device_put(jnp.asarray(S))
        eigh = jax.jit(jnp.linalg.eigh)
        w, V = eigh(Sd)
        w.block_until_ready()
        t0 = time.time()
        w, V = eigh(Sd)
        w.block_until_ready()
        dt = time.time() - t0
        # accuracy vs host
        w0 = np.linalg.eigvalsh(S.astype(np.float64))
        err = np.abs(np.sort(np.asarray(w)) - w0).max() / np.abs(w0).max()
        print(f"device eigh n={n} f32: {dt:.2f}s (rel err {err:.1e})",
              flush=True)

    # polar (the QDWH-DC split primitive)
    for n in a.sizes:
        rng = np.random.default_rng(3)
        B = rng.normal(size=(n, n)).astype(np.float32)
        S = (B @ B.T / n - 0.5 * np.eye(n)).astype(np.float32)
        Sd = jax.device_put(jnp.asarray(S))
        pol = jax.jit(lambda x: jax.scipy.linalg.polar(x)[0])
        U = pol(Sd)
        U.block_until_ready()
        t0 = time.time()
        U = pol(Sd)
        U.block_until_ready()
        print(f"polar n={n} f32: {time.time()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
