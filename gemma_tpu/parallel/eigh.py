"""Device-resident spectral divide-and-conquer eigendecomposition.

The reference calls LAPACK DSYEVR on one node (lapack.cpp:205-222).
On TPU, XLA's own eigensolver is fast at moderate sizes (0.72 s at
n=4096 f32 on v5e, rel err ~1.5e-6) but its COMPILE time explodes
past ~6k (254 s at n=6144; remote-compile OOM at n=10000), and
jax.scipy.linalg.polar's QDWH runs out of HBM at n=10k.  This module
therefore implements spectral divide-and-conquer whose only heavy
primitives are matmuls (Nakatsukasa & Higham 2013 family):

  1. shift by a spectral-median estimate sigma,
  2. sign(A - sigma I) via scaled Newton-Schulz (pure matmuls, three
     n^2 live buffers), P = (S + I)/2 is the projector onto the
     invariant subspace with eigenvalues > sigma,
  3. split with randomized range finding (QR of P @ Omega),
  4. recurse on V' A V until blocks fit the device eigensolver.

Shape bucketing: split sizes are data-dependent, so every expensive
kernel (Newton-Schulz sign, QR, leaf eigh) is evaluated on a
zero/blockdiag-padded operand rounded up to a 512 multiple — the
padding is EXACT (blockdiag decouples; zero-padded QR columns trail
the true ones), and compile keys stay bounded and disk-cacheable
instead of recompiling for every dataset's split ranks.

Host-side recursion, device-side math; factors never cross the
host<->device tunnel (measured ~1-4 MB/s device->host on axon).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_BUCKET = 512


def _bucket(k: int) -> int:
    return max(_BUCKET, -(-k // _BUCKET) * _BUCKET)


def _leaf_eigh(A):
    """Leaf solver on a bucket-padded operand: embed the k×k block as
    blockdiag(A, c_hi I) with markers strictly above the spectrum, run
    the device eigensolver at the bucketed size, slice the true pairs
    (ascending order puts the markers last; blockdiag decouples
    exactly, so true eigenvectors live in the first k coordinates)."""
    k = A.shape[0]
    kb = _bucket(k)
    if kb == k:
        with jax.default_matmul_precision("float32"):
            return jnp.linalg.eigh(A)
    c_hi = 2.0 * jnp.max(jnp.sum(jnp.abs(A), axis=1)) + 1.0
    Ap = jnp.zeros((kb, kb), A.dtype)
    Ap = Ap.at[:k, :k].set(A)
    Ap = Ap.at[jnp.arange(k, kb), jnp.arange(k, kb)].set(c_hi)
    with jax.default_matmul_precision("float32"):
        w, U = jnp.linalg.eigh(Ap)
    return w[:k], U[:k, :k]


@functools.partial(jax.jit, static_argnames=("max_iter", "shard"))
def _sign_ns_jit(M, max_iter: int = 80, shard=None):
    """Scaled Newton-Schulz S <- 1.5 S - 0.5 S^3 for the matrix sign
    of symmetric M; three n^2 live buffers, pure MXU matmuls.

    Full-f32 matmul precision is essential: TPU f32 matmuls default to
    bf16 multiplies (~8 mantissa bits), which cannot resolve the
    ~1e-5-relative eigenvalue gaps at the split point — measured
    projector defect 0.15 at n=10k under the default vs 8e-6 at full
    precision.

    `shard` (a NamedSharding, static) pins every while_loop iterate
    row-sharded over the mesh — without the constraint GSPMD is free
    to replicate the loop carry, and three replicated n² buffers is
    exactly what the n-axis scale-out exists to avoid."""
    m = M.shape[0]

    def pin(x):
        return jax.lax.with_sharding_constraint(x, shard) if shard else x

    M = pin(M)
    norm = jnp.maximum(jnp.max(jnp.sum(jnp.abs(M), axis=1)),
                       jnp.finfo(M.dtype).tiny)
    # 1.01 safety margin keeps rho(S0) strictly below 1 so round-off
    # drift cannot push iterates into the divergent |x| > sqrt(3) zone
    S0 = pin(M / (1.01 * norm))
    eye = jnp.eye(m, dtype=M.dtype)
    # convergence of the NORMALIZED Frobenius defect ||S^2-I||_F/sqrt(m)
    # is size-independent; scaling the tolerance with m (a factor 10^4
    # at n=10k f32) lets barely-converged projectors through and costs
    # two digits of eigenvector accuracy
    tol = 40 * jnp.finfo(M.dtype).eps

    def cond(carry):
        S, err, t = carry
        return (t < max_iter) & (err > tol)

    hp = jax.lax.Precision.HIGHEST

    def body(carry):
        S, _, t = carry
        S2 = pin(jnp.matmul(S, S, precision=hp))
        S_new = pin(1.5 * S - 0.5 * jnp.matmul(S2, S, precision=hp))
        err = jnp.linalg.norm(S2 - eye) / jnp.sqrt(jnp.asarray(m, M.dtype))
        return S_new, err, t + 1

    S, _, _ = jax.lax.while_loop(
        cond, body, (S0, jnp.asarray(jnp.inf, M.dtype), 0))
    return S


def _sign_newton_schulz(M, max_iter: int = 80, shard=None):
    """Bucket-padded sign: embed k×k M as blockdiag(M, s I) (pads have
    sign +1 and converge immediately); slice the true block."""
    k = M.shape[0]
    kb = _bucket(k)
    if kb != k:
        s = jnp.max(jnp.sum(jnp.abs(M), axis=1)) + 1.0
        Mp = jnp.zeros((kb, kb), M.dtype)
        Mp = Mp.at[:k, :k].set(M)
        Mp = Mp.at[jnp.arange(k, kb), jnp.arange(k, kb)].set(s)
        return _sign_ns_jit(Mp, max_iter=max_iter, shard=shard)[:k, :k]
    return _sign_ns_jit(M, max_iter=max_iter, shard=shard)


def _polar_projector(A, sigma, shard=None):
    """P projecting onto the eigenspace of A with eigenvalues > sigma."""
    n = A.shape[0]
    S = _sign_newton_schulz(A - sigma * jnp.eye(n, dtype=A.dtype),
                            shard=shard)
    return 0.5 * (S + jnp.eye(n, dtype=A.dtype))


@jax.jit
def _qr_q(Y):
    with jax.default_matmul_precision("float32"):
        return jnp.linalg.qr(Y)[0]


def _qr_bucketed(Y, k_cols: int):
    """Q of the first k_cols columns, computed at a bucketed shape:
    zero-padding trailing COLUMNS leaves the leading columns of Q
    exact (Householder processes left to right); zero-padded ROWS map
    to zero rows of Q."""
    n, _ = Y.shape
    cb = _bucket(k_cols)
    nb = _bucket(n)
    Yp = jnp.zeros((nb, min(cb, nb)), Y.dtype)
    Yp = Yp.at[:n, :k_cols].set(Y[:, :k_cols])
    Q = _qr_q(Yp)
    return Q[:n, :k_cols]


@functools.partial(jax.jit, static_argnames=("shard",))
def _cholqr2_jit(Y, shard=None):
    """Orthonormalise the columns of row-sharded Y via CholeskyQR2:
    G = Y'Y (sharded contraction → replicated k×k), L = chol(G),
    Q = Y L^{-T} (independent per row block — perfectly SPMD), run
    twice for f32 stability.  Householder QR is not partitionable in
    XLA (it would gather the (n, k) operand to one device — the exact
    buffer the n-axis scale-out must never materialise); CholeskyQR2
    is all matmuls/solves and Y here is a projected Gaussian with
    condition ~(√n+√k)/(√n−√k) = O(1), far inside CholeskyQR2's
    stability region."""
    hp = jax.lax.Precision.HIGHEST

    def pin(x):
        return jax.lax.with_sharding_constraint(x, shard) if shard else x

    Y = pin(Y)
    for _ in range(2):
        G = jnp.matmul(Y.T, Y, precision=hp)          # (k, k) replicated
        L = jnp.linalg.cholesky(G)
        Y = pin(jax.lax.linalg.triangular_solve(
            L, Y, left_side=False, lower=True, transpose_a=True))
    return Y


def _split_basis(Pproj, k, key, shard=None):
    """Orthonormal bases (V1 (n,k), V2 (n,n-k)) of range(P) and its
    complement via randomized range finding (exact for projectors).
    The n×n products PG and G-PG keep compile shapes fixed per level;
    only the bucketed QR sees the data-dependent rank.  Sharded mode
    swaps Householder QR for CholeskyQR2 (see _cholqr2_jit) so the
    (n, k) factors stay row-partitioned."""
    n = Pproj.shape[0]
    G = jax.random.normal(key, (n, n), Pproj.dtype)
    # full precision: V1 must span range(P) to f32 accuracy, and the
    # defect check upstream relies on the same fidelity
    PG = jnp.matmul(Pproj, G, precision=jax.lax.Precision.HIGHEST)
    if shard is not None:
        V1 = (_cholqr2_jit(PG[:, :k], shard=shard) if k > 0
              else jnp.zeros((n, 0), Pproj.dtype))
        V2 = (_cholqr2_jit((G - PG)[:, :n - k], shard=shard) if n - k > 0
              else jnp.zeros((n, 0), Pproj.dtype))
        return V1, V2
    V1 = (_qr_bucketed(PG, k) if k > 0
          else jnp.zeros((n, 0), Pproj.dtype))
    V2 = (_qr_bucketed(G - PG, n - k) if n - k > 0
          else jnp.zeros((n, 0), Pproj.dtype))
    return V1, V2


@functools.partial(jax.jit, static_argnames=("shard",))
def _project_jit(A, Vp, shard=None):
    hp = jax.lax.Precision.HIGHEST
    if shard is not None:
        A = jax.lax.with_sharding_constraint(A, shard)
        Vp = jax.lax.with_sharding_constraint(Vp, shard)
    B = jnp.matmul(A, Vp, precision=hp)
    # (k, k) result: contraction over the sharded rows → replicated
    return jnp.matmul(Vp.T, B, precision=hp)


def _project_bucketed(A, V, shard=None):
    """V' A V computed at fully bucketed shapes (both operands
    zero-padded; the pads contribute exact zeros, sliced off)."""
    n, k = V.shape
    nb, kb = _bucket(n), _bucket(k)
    if nb == n and kb == k:
        return _project_jit(A, V, shard=shard)
    Ap = jnp.zeros((nb, nb), A.dtype)
    Ap = Ap.at[:n, :n].set(A)
    Vp = jnp.zeros((nb, kb), V.dtype)
    Vp = Vp.at[:n, :k].set(V)
    return _project_jit(Ap, Vp, shard=shard)[:k, :k]


@functools.partial(jax.jit, static_argnames=("shard",))
def _assemble_jit(V, U, shard=None):
    if shard is not None:
        V = jax.lax.with_sharding_constraint(V, shard)
    out = jnp.matmul(V, U, precision=jax.lax.Precision.HIGHEST)
    return (jax.lax.with_sharding_constraint(out, shard)
            if shard is not None else out)


def _assemble_bucketed(V, U, shard=None):
    """(n,k)(k,k) product at fully bucketed shapes."""
    n, k = V.shape
    nb, kb = _bucket(n), _bucket(k)
    if nb == n and kb == k:
        return _assemble_jit(V, U, shard=shard)
    Vp = jnp.zeros((nb, kb), V.dtype)
    Vp = Vp.at[:n, :k].set(V)
    Up = jnp.zeros((kb, kb), U.dtype)
    Up = Up.at[:k, :k].set(U)
    return _assemble_jit(Vp, Up, shard=shard)[:n, :k]


def eigh_dc(A, min_block: int = 512, key=None, _depth: int = 0,
            shard=None):
    """Spectral divide-and-conquer eigh.  Returns (eigenvalues
    ascending, eigenvectors as columns), like jnp.linalg.eigh.

    `shard` (NamedSharding over the row axis) keeps every n²-sized
    intermediate — the sign iterates, the projector, the random range
    probes, the assembled factors — row-partitioned over the mesh;
    only ≤min_block leaves and k×k Gram matrices are replicated."""
    n = A.shape[0]
    if key is None:
        key = jax.random.PRNGKey(0)
    if n <= min_block or _depth > 40:
        return _leaf_eigh(A)

    def _split_rank(Pproj):
        """round(trace(P)) with quality checks.  A far-from-integer
        trace OR a large idempotency defect ||P^2-P||_F means the sign
        iteration stalled on eigenvalues at the split point (a pair of
        stalled 0.5-directions keeps the trace integral but mixes the
        subspaces, silently corrupting the split) — treat as a failed
        split (None)."""
        tr = float(jnp.trace(Pproj))
        if not np.isfinite(tr):
            return None
        k = int(np.clip(round(tr), 0, n))
        if abs(tr - k) > 0.45:
            return None
        defect = float(jnp.linalg.norm(
            jnp.matmul(Pproj, Pproj,
                       precision=jax.lax.Precision.HIGHEST) - Pproj))
        if not np.isfinite(defect) or defect > 0.05:
            return None
        return k

    diag = jnp.diag(A)
    lo, hi = float(jnp.min(diag)), float(jnp.max(diag))
    spread = max(hi - lo, 1e-30)
    k = None
    # median of the diagonal, then the midpoint, then random nudges —
    # eigenvalue clusters sitting exactly at a candidate split point
    # stall the sign iteration, so probe a few nearby shifts before
    # giving up on splitting this block
    candidates = [float(jnp.median(diag)), 0.5 * (lo + hi)]
    rng_sigma = np.random.default_rng(_depth + 17)
    candidates += list(
        candidates[0] + spread * rng_sigma.uniform(-0.2, 0.2, 2))
    import os
    debug = os.environ.get("GEMMA_TPU_EIGH_DEBUG")
    for sigma in candidates:
        Pproj = _polar_projector(A, sigma, shard=shard)
        k = _split_rank(Pproj)
        if debug:
            tr = float(jnp.trace(Pproj))
            dft = float(jnp.linalg.norm(
                jnp.matmul(Pproj, Pproj,
                           precision=jax.lax.Precision.HIGHEST) - Pproj))
            print(f"eigh_dc n={n} sigma={sigma:.4g} tr={tr:.3f} "
                  f"defect={dft:.3e} -> k={k}", flush=True)
        if k is not None and 0 < k < n:
            break
    else:
        if debug:
            print(f"eigh_dc n={n}: all splits failed -> leaf", flush=True)
        return _leaf_eigh(A)   # effectively degenerate block

    key, k1, k2, k3 = jax.random.split(key, 4)
    V1, V2 = _split_basis(Pproj, k, k1, shard=shard)
    A1 = _project_bucketed(A, V1, shard=shard)
    A2 = _project_bucketed(A, V2, shard=shard)

    if shard is not None:
        # sub-blocks come back replicated (k×k Gram-sized); re-shard
        # before recursing so every level keeps its n² objects
        # partitioned.  Explicit shardings need mesh-divisible shapes,
        # so pad to the 512-bucket with above-spectrum markers
        # (_pad_marked) — markers split off exactly and are sliced
        # away from the recursion's ascending-ordered output.
        w1, U1 = _recurse_sharded(A1, min_block, k2, _depth + 1, shard)
        w2, U2 = _recurse_sharded(A2, min_block, k3, _depth + 1, shard)
    else:
        w1, U1 = eigh_dc(A1, min_block, k2, _depth + 1)
        w2, U2 = eigh_dc(A2, min_block, k3, _depth + 1)

    w = jnp.concatenate([w2, w1])            # w2 below sigma, w1 above
    U = jnp.concatenate(
        [_assemble_bucketed(V2, U2, shard=shard),
         _assemble_bucketed(V1, U1, shard=shard)], axis=1)
    order = jnp.argsort(w)
    return w[order], U[:, order]


def _pad_marked(A):
    """Embed k×k A as blockdiag(A, c_hi I) at the 512-bucketed size
    with markers strictly above the spectrum: the padded matrix's
    bottom k eigenpairs are exactly A's (blockdiag decouples; the
    markers are the top kb-k pairs and true eigenvectors live in the
    first k coordinates).  Returns (padded, k)."""
    k = A.shape[0]
    kb = _bucket(k)
    if kb == k:
        return A, k
    c_hi = 2.0 * jnp.max(jnp.sum(jnp.abs(A), axis=1)) + 1.0
    Ap = jnp.zeros((kb, kb), A.dtype)
    Ap = Ap.at[:k, :k].set(A)
    Ap = Ap.at[jnp.arange(k, kb), jnp.arange(k, kb)].set(c_hi)
    return Ap, k


def _recurse_sharded(Asub, min_block, key, depth, shard):
    """Recurse on a replicated sub-block, re-sharding it (marker-
    padded to a mesh-divisible size) when it is still large enough to
    matter.  Blocks at or below max(min_block, _BUCKET) recurse
    replicated: the marker padding rounds up to 512-multiples, so
    re-sharding a small block would inflate every level of its
    recursion to ≥512² sign iterations — far more work than the
    replication it avoids (n² at these sizes is KBs, not GBs)."""
    k = Asub.shape[0]
    msize = shard.mesh.shape[shard.spec[0]]
    if k > min_block and k % msize == 0:
        # mesh-divisible: shard directly, no padding needed
        return eigh_dc(jax.device_put(Asub, shard), min_block, key,
                       depth, shard=shard)
    if k <= max(min_block, _BUCKET):
        return eigh_dc(Asub, min_block, key, depth)
    Ap, k = _pad_marked(Asub)
    if Ap.shape[0] % msize != 0:
        return eigh_dc(Asub, min_block, key, depth)
    Ap = jax.device_put(Ap, shard)
    w, U = eigh_dc(Ap, min_block, key, depth, shard=shard)
    # ascending order puts the c_hi markers last; true vectors have
    # support only in the first k coordinates
    return w[:k], U[:k, :k]


def eigh_sharded(A, mesh: Mesh, min_block: int = 2048, axis=None):
    """eigh_dc with the matrix laid out row-sharded over one mesh axis
    (default: the mesh's last axis — "ind" on the 2-D kinship mesh).

    Every n²-sized intermediate carries an explicit sharding
    constraint (see eigh_dc/_sign_ns_jit/_cholqr2_jit): the sign
    iterates stay partitioned through the while_loop, range finding
    uses CholeskyQR2 instead of the non-partitionable Householder QR,
    and recursion re-shards each sub-block (marker-padded to a
    mesh-divisible size, see _pad_marked).  Only ≤min_block leaves and
    k×k Gram matrices replicate.  Returns (w, U) with U row-sharded —
    downstream rotations (U'W, U'y, x@U) consume it in place via
    GSPMD.
    """
    axis = axis or mesh.axis_names[-1]
    sharding = NamedSharding(mesh, P(axis, None))
    msize = mesh.shape[axis]
    if A.shape[0] % msize == 0:
        # mesh-divisible input shards directly, no padding
        A = jax.device_put(A, sharding)
        return eigh_dc(A, min_block=min_block, shard=sharding)
    Ap, k = _pad_marked(A)
    if Ap.shape[0] % msize != 0 or A.shape[0] <= min_block:
        # non-power-of-two mesh axes beyond the 512 bucket: replicated
        # fallback (correct, just not partitioned)
        return eigh_dc(A, min_block=min_block)
    Ap = jax.device_put(Ap, sharding)
    w, U = eigh_dc(Ap, min_block=min_block, shard=sharding)
    return w[:k], U[:k, :k]
