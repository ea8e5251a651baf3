"""Conjugate gradient and power method under jit.

TPU-native counterpart of reference `dl_cs/mri/algorithms.py:11-102`
(ConjugateGradient, PowerMethod). Iteration counts are static so XLA
unrolls/scans with fixed shapes; reverse-mode autodiff flows through the
loop exactly as the reference backprops through unrolled CG.
"""

from typing import Callable

import jax
import jax.numpy as jnp


def zdot(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Complex inner product <x1, x2> = sum(conj(x1) * x2).

    Reference `ConjugateGradient.zdot` (`algorithms.py:32-36`).
    """
    return jnp.sum(jnp.conj(x1) * x2)


def zdot_single(x: jnp.ndarray) -> jnp.ndarray:
    """Real-valued <x, x> (`algorithms.py:38-42`)."""
    return jnp.real(zdot(x, x))


def conjugate_gradient(A: Callable, x0: jnp.ndarray, y: jnp.ndarray,
                       num_iter: int, unroll: bool = None) -> jnp.ndarray:
    """Solve A x = y for SPD (normal-equation) operator A, fixed iterations.

    Matches reference semantics (`algorithms.py:44-73`): no early exit, no
    preconditioner, complex dot products. Uses lax.fori_loop with a static
    bound, which XLA converts to a differentiable scan.

    unroll=True (default: env DL_SWIN_GAN_CG_UNROLL=1) trace-unrolls the
    iterations instead — identical floating-point sequence, but XLA sees one
    flat graph it can fuse/pipeline across iterations rather than a
    sequential scan with per-step dispatch. Pays off when A is a chain of
    small ops (the DSLR factor normal equations); costs compile time.
    """
    if unroll is None:
        import os
        unroll = bool(int(os.environ.get("DL_SWIN_GAN_CG_UNROLL", "0")))
    r0 = y - A(x0)

    def body(_, state):
        x, p, r, rsold = state
        Ap = A(p)
        pAp = zdot(p, Ap)
        alpha = rsold / pAp
        x = x + alpha * p
        r = r - alpha * Ap
        rsnew = zdot_single(r)
        beta = rsnew / rsold
        p = beta * p + r
        return (x, p, r, rsnew)

    state = (x0, r0, r0, zdot_single(r0))
    if unroll:
        for i in range(num_iter):
            state = body(i, state)
        return state[0]
    x, _, _, _ = jax.lax.fori_loop(0, num_iter, body, state)
    return x


def paired_conjugate_gradient(A2: Callable, x0a: jnp.ndarray,
                              x0b: jnp.ndarray, ya: jnp.ndarray,
                              yb: jnp.ndarray, num_iter: int):
    """Two INDEPENDENT CG solves advanced in lockstep, one batched operator
    call per iteration.

    A2(pa, pb) -> (Apa, Apb) must evaluate both systems' operators in a
    single fused/batched application — that is the whole point: the DSLR
    alt-min chain is latency-bound on ~ms-scale sequential normal-op
    round-trips (runs/profile_dslr.log), so fusing the L-system and
    R-system applications halves the sequential depth without changing
    either solve (each keeps its own alpha/beta/residual scalars; the
    iterates are bitwise the two separate CGs up to batched-FFT layout).

    No reference counterpart — this backs the opt-in non-parity
    `dslr-cg-jacobi` fast mode (solvers/dslr.py).
    """
    Ax0a, Ax0b = A2(x0a, x0b)
    ra, rb = ya - Ax0a, yb - Ax0b

    def body(_, state):
        xa, pa, ra, rsa, xb, pb, rb, rsb = state
        Apa, Apb = A2(pa, pb)
        alpha_a = rsa / zdot(pa, Apa)
        alpha_b = rsb / zdot(pb, Apb)
        xa = xa + alpha_a * pa
        xb = xb + alpha_b * pb
        ra = ra - alpha_a * Apa
        rb = rb - alpha_b * Apb
        rsa_new = zdot_single(ra)
        rsb_new = zdot_single(rb)
        pa = (rsa_new / rsa) * pa + ra
        pb = (rsb_new / rsb) * pb + rb
        return (xa, pa, ra, rsa_new, xb, pb, rb, rsb_new)

    state = (x0a, ra, ra, zdot_single(ra),
             x0b, rb, rb, zdot_single(rb))
    state = jax.lax.fori_loop(0, num_iter, body, state)
    return state[0], state[4]


def power_method(A: jnp.ndarray, num_iter: int, key: jax.Array,
                 eps: float = 1e-6) -> jnp.ndarray:
    """Largest singular value of each matrix in a batch [B, m, n].

    Reference `PowerMethod` (`algorithms.py:76-102`): iterate v <- A^H A v,
    track ||v||. Returns [B] singular-value estimates.
    """
    b, m, n = A.shape
    v = jax.random.uniform(key, (b, n, 1), dtype=jnp.float32).astype(A.dtype)
    AhA = jnp.einsum("bmn,bmk->bnk", jnp.conj(A), A)

    def body(_, state):
        v, _ = state
        v = jnp.einsum("bnk,bkl->bnl", AhA, v)
        ev = jnp.sqrt(jnp.sum(jnp.abs(v) ** 2, axis=1, keepdims=True))
        return (v / (ev + eps), ev)

    _, ev = jax.lax.fori_loop(0, num_iter, body, (v, jnp.zeros((b, 1, 1))))
    return ev.reshape(b)
