"""DSLR: unrolled alternating-minimization solvers over LLR factors (L, R).

TPU-native counterpart of reference `dl_cs/models/dslr.py`:

  dslr-pgd    AltMinPGD — gradient steps on L and R with power-method step
              sizes (:173-255)
  dslr-cg-v1  AltMinCGv1 — CG on each factor's normal equations, L and R DC
              both before the CNN updates (:258-341)
  dslr-cg-v2  AltMinCGv2 — interleaved: L-DC, L-CNN, R-DC, R-CNN (:344-425)
  modslr-v1   AltMinMoDLv1 — MoDL penalties lambda_l/lambda_r; DC solves
              (A^H A + lam) factor = rhs with the CNN output as prior
              (:428-520)
  modslr-v2   AltMinMoDLv2 — variant carrying (L, zL, R, zR); composes the
              final image from (zL, zR) (:523-635)

Shapes: L [N, e*b^2, r], R [N, t, r]; spatial CNN runs a 2D ResNet on
[N, r*e, b, b], temporal CNN a 1D ResNet on [N, r, t] (reference :139-164).
"""


import jax
import jax.numpy as jnp
from flax import linen as nn

from dl_swin_gan_tpu.models.resnet import ResNet1D, ResNet2D
from dl_swin_gan_tpu.models.rnn import RNN
from dl_swin_gan_tpu.ops.cg import conjugate_gradient, power_method
from dl_swin_gan_tpu.ops.llr import BlockOp, btranspose, compose


class UnrolledLR(nn.Module):
    """All five alt-min variants behind one `mode` switch.

    Call: solver(y, maps, mask, L0, R0, block_op) — block_op is a BlockOp
    closed over the (static) image shape, built by the caller like the
    reference builds ArrayToBlocks per step (train_lr.py:121-122).
    """
    mode: str = "dslr-cg-v1"
    num_unrolls: int = 5
    num_resblocks: int = 2
    num_features: int = 64
    kernel_size: int = 3
    num_emaps: int = 1
    num_basis: int = 8
    block_size: int = 16
    use_complex_layers: bool = True
    circular_pad: bool = True
    share_weights: bool = False
    fix_step_size: bool = False
    num_cg_steps: int = 10
    use_rnn_temporal: bool = False   # reference defines but never wires RNNs
    remat: bool = False

    # -- CNN updates (reference :139-164) ---------------------------------
    def _cnn_L(self, net, L):
        n, eb2, r = L.shape
        b, e = self.block_size, self.num_emaps
        h = L.transpose(0, 2, 1).reshape(n, r * e, b, b)
        h = net(h)
        return h.reshape(n, r, eb2).transpose(0, 2, 1)

    def _cnn_R(self, net, R):
        h = R.transpose(0, 2, 1)  # [N, r, t]
        if self.use_rnn_temporal:
            h = net(h.transpose(0, 2, 1)).transpose(0, 2, 1)
        else:
            h = net(h)
        return h.transpose(0, 2, 1)

    @nn.compact
    def __call__(self, y, maps, mask, L0, R0, block_op: BlockOp):
        from dl_swin_gan_tpu.ops.sense import SenseOp
        A = SenseOp(maps, mask)

        n_nets = 1 if self.share_weights else self.num_unrolls
        common = dict(num_resblocks=self.num_resblocks,
                      num_features=self.num_features,
                      kernel_size=self.kernel_size,
                      use_complex_layers=self.use_complex_layers)
        spatial = [ResNet2D(circular_pad=False, **common)
                   for _ in range(n_nets)]
        if self.use_rnn_temporal:
            temporal = [RNN(hidden_size=self.num_features)
                        for _ in range(n_nets)]
        else:
            temporal = [ResNet1D(circular_pad=self.circular_pad, **common)
                        for _ in range(n_nets)]

        def net(i, nets):
            return nets[0 if self.share_weights else i]

        comp = lambda L, R: compose(L, R, block_op)

        def cnn_L(i, L):
            if self.remat:
                return nn.remat(lambda m, v: self._cnn_L(m, v))(
                    net(i, spatial), L)
            return self._cnn_L(net(i, spatial), L)

        def cnn_R(i, R):
            if self.remat:
                return nn.remat(lambda m, v: self._cnn_R(m, v))(
                    net(i, temporal), R)
            return self._cnn_R(net(i, temporal), R)

        mode = self.mode

        # Fused Pallas path (DL_SWIN_GAN_PALLAS_DSLR=1): the hot chain
        # block_op(A.normal(comp(., .))) as ONE kernel per (system, frame)
        # with every intermediate VMEM-resident (kernels/llr_normal.py).
        from dl_swin_gan_tpu.kernels.llr_normal import (
            fusable, make_fused_block_normal, use_pallas_llr,
        )
        fused = (make_fused_block_normal(block_op, maps, mask)
                 if use_pallas_llr() and fusable(maps, mask) else None)

        if mode == "dslr-pgd":
            pm_key = jax.random.PRNGKey(0)  # fixed like torch.rand w/o seed? deterministic here

            def step_sizes(L, R, alpha=0.9):
                eL = power_method(R, 10, pm_key)
                eR = power_method(L, 10, pm_key)
                return -alpha / eL.max(), -alpha / eR.max()

            ATy = A(y, adjoint=True)
            ATy_blk = block_op(ATy)
            L, R = L0, R0
            for i in range(self.num_unrolls):
                if fused is not None:
                    # extract is linear: block_op(N(comp) - ATy) ==
                    # fused(LR^H) - block_op(ATy)
                    grad_x = fused(L @ btranspose(R)) - ATy_blk
                else:
                    grad_x = block_op(A.normal(comp(L, R)) - ATy)
                grad_L = grad_x @ R
                grad_R = btranspose(grad_x) @ L
                sL, sR = step_sizes(L, R)
                L = L + sL * grad_L
                R = R + sR * grad_R
                L = cnn_L(i, L)
                R = cnn_R(i, R)
            return comp(L, R)

        ATy_b = block_op(A(y, adjoint=True))  # [N, e*b^2, t]

        def normal_L(L, R_fixed):
            if fused is not None:
                return fused(L @ btranspose(R_fixed)) @ R_fixed
            x = block_op(A.normal(comp(L, R_fixed)))
            return x @ R_fixed

        def normal_R(R, L_fixed):
            if fused is not None:
                return btranspose(fused(L_fixed @ btranspose(R))) @ L_fixed
            x = block_op(A.normal(comp(L_fixed, R)))
            return btranspose(x) @ L_fixed

        if mode in ("dslr-cg-v1", "dslr-cg-v2"):
            L, R = L0, R0
            for i in range(self.num_unrolls):
                if mode == "dslr-cg-v1":
                    L = conjugate_gradient(lambda v: normal_L(v, R), L,
                                           ATy_b @ R, self.num_cg_steps)
                    R = conjugate_gradient(lambda v: normal_R(v, L), R,
                                           btranspose(ATy_b) @ L,
                                           self.num_cg_steps)
                    L = cnn_L(i, L)
                    R = cnn_R(i, R)
                else:
                    L = conjugate_gradient(lambda v: normal_L(v, R), L,
                                           ATy_b @ R, self.num_cg_steps)
                    L = cnn_L(i, L)
                    R = conjugate_gradient(lambda v: normal_R(v, L), R,
                                           btranspose(ATy_b) @ L,
                                           self.num_cg_steps)
                    R = cnn_R(i, R)
            return comp(L, R)

        if mode == "dslr-cg-jacobi":
            # Opt-in NON-PARITY fast mode (round-4 verdict #8); no reference
            # counterpart. Two changes vs the golden-pinned dslr-cg-v1
            # (reference dslr.py:258-341):
            #   1. Jacobi instead of Gauss-Seidel coupling: both factor
            #      solves run against the PREVIOUS unroll's (L, R) instead
            #      of R's solve seeing the freshly-updated L. This makes the
            #      two CG chains independent...
            #   2. ...so each CG iteration evaluates BOTH normal operators
            #      in one batch-2 SENSE call (paired_conjugate_gradient):
            #      the sequential chain shrinks from
            #      unrolls*(2 solves)*(cg_steps) small round-trips to
            #      unrolls*cg_steps twice-as-heavy ones — exactly the lever
            #      the profile says this latency-bound solver needs
            #      (runs/profile_dslr.log: ~100 sequential ~3 ms ops).
            # Quality is re-established empirically by its own row
            # (configs/quality/dslr_fast.yaml), never assumed from parity.
            from dl_swin_gan_tpu.ops.cg import paired_conjugate_gradient

            maps2 = jnp.concatenate([maps, maps], axis=0)
            mask2 = (None if mask is None
                     else jnp.concatenate([mask, mask], axis=0))
            A2 = SenseOp(maps2, mask2)

            L, R = L0, R0
            for i in range(self.num_unrolls):
                Lf, Rf = L, R  # frozen iterate for both solves (Jacobi)

                def normal_pair(vL, vR, Lf=Lf, Rf=Rf):
                    if fused is not None:
                        # both systems in ONE kernel launch (grid S=2)
                        oL, oR = fused(vL @ btranspose(Rf),
                                       Lf @ btranspose(vR))
                        return oL @ Rf, btranspose(oR) @ Lf
                    x2 = jnp.concatenate([comp(vL, Rf), comp(Lf, vR)],
                                         axis=0)
                    n2 = A2.normal(x2)
                    nL = block_op(n2[0:1]) @ Rf
                    nR = btranspose(block_op(n2[1:2])) @ Lf
                    return nL, nR

                L, R = paired_conjugate_gradient(
                    normal_pair, L, R, ATy_b @ Rf,
                    btranspose(ATy_b) @ Lf, self.num_cg_steps)
                L = cnn_L(i, L)
                R = cnn_R(i, R)
            return comp(L, R)

        if mode in ("modslr-v1", "modslr-v2"):
            # v1: lambdas used directly, init (1.0, 2.0) (reference
            # dslr.py:447-449). v2: both init 5e-3 and the effective
            # penalty is lambda_scale * clamp(lambda, min=0) with
            # lambda_scale = 1e2 — a learning-rate trick for the lambda
            # parameters (reference dslr.py:544-548, 555, 575).
            if mode == "modslr-v1":
                init_l, init_r = 1.0, 2.0
            else:
                init_l = init_r = 5e-3
            lam_l = self.param("lambda_l", nn.initializers.constant(init_l),
                               (1,), jnp.float32)
            lam_r = self.param("lambda_r", nn.initializers.constant(init_r),
                               (1,), jnp.float32)
            if self.fix_step_size:
                lam_l = jax.lax.stop_gradient(lam_l)
                lam_r = jax.lax.stop_gradient(lam_r)
            if mode == "modslr-v1":
                ll, lr = lam_l[0], lam_r[0]
            else:
                ll = 1e2 * jnp.maximum(lam_l[0], 0.0)
                lr = 1e2 * jnp.maximum(lam_r[0], 0.0)

            def dc_L(L, zL, R_fixed):
                normal = lambda v: ll * v + normal_L(v, R_fixed)
                rhs = ll * zL + ATy_b @ R_fixed
                return conjugate_gradient(normal, L, rhs, self.num_cg_steps)

            def dc_R(R, zR, L_fixed):
                normal = lambda v: lr * v + normal_R(v, L_fixed)
                rhs = lr * zR + btranspose(ATy_b) @ L_fixed
                return conjugate_gradient(normal, R, rhs, self.num_cg_steps)

            if mode == "modslr-v1":
                L, R = L0, R0
                for i in range(self.num_unrolls):
                    zL = cnn_L(i, L)
                    L = dc_L(L, zL, R)
                    zR = cnn_R(i, R)
                    R = dc_R(R, zR, L)
                return comp(L, R)

            # modslr-v2 carries (L, zL, R, zR); final image from (zL, zR)
            # (reference :588-635: first iter fixes R0, later iters fix zR)
            L, R = L0, R0
            zL, zR = jnp.zeros_like(L0), jnp.zeros_like(R0)
            for i in range(self.num_unrolls):
                # at loop top zR still holds the previous iteration's value
                L = dc_L(L, zL, R if i == 0 else zR)
                zL = cnn_L(i, L)
                R = dc_R(R, zR, zL)
                zR = cnn_R(i, R)
            return comp(zL, zR)

        raise ValueError(f"Unknown DSLR mode: {self.mode}")


_DSLR_MODES = ("dslr-pgd", "dslr-cg-v1", "dslr-cg-v2",
               "dslr-cg-jacobi", "modslr-v1", "modslr-v2")


def build_dslr_solver(cfg) -> UnrolledLR:
    """META_ARCHITECTURE dispatch mirroring train_lr.py:39-50.

    Noted divergence: the reference dispatcher routes 'dslr-cg-v2' to
    AltMinCGv1 (train_lr.py:43-44 — the AltMinCGv2 class exists at
    dslr.py:344 but is unreachable from the trainer, an apparent
    copy-paste slip). Here 'dslr-cg-v2' runs the real CGv2 interleaving,
    which is golden-parity-tested against the reference AltMinCGv2 CLASS
    (tests/test_dslr_solver_parity.py).
    """
    p = cfg.MODEL.PARAMETERS
    meta = cfg.MODEL.META_ARCHITECTURE.lower()
    if meta not in _DSLR_MODES:
        raise ValueError(f"Unknown DSLR META_ARCHITECTURE: {meta}")
    return UnrolledLR(
        mode=meta,
        num_unrolls=p.NUM_UNROLLS,
        num_resblocks=p.NUM_RESBLOCKS,
        num_features=p.NUM_FEATURES,
        kernel_size=p.CONV_BLOCK.KERNEL_SIZE[0],
        num_emaps=p.NUM_EMAPS,
        num_basis=p.DSLR.NUM_BASIS,
        block_size=p.DSLR.BLOCK_SIZE,
        use_complex_layers=p.CONV_BLOCK.COMPLEX,
        circular_pad=p.CONV_BLOCK.CIRCULAR_PAD,
        share_weights=p.SHARE_WEIGHTS,
        fix_step_size=p.FIX_STEP_SIZE,
        num_cg_steps=p.DSLR.NUM_CG_STEPS,
        remat=p.GRAD_CHECKPOINT,
    )
