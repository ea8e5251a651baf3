"""DSLR trainer: unrolled low-rank alt-min models over (L, R) factors.

TPU-native counterpart of reference `scripts/train_lr.py`: the preprocess
runs with lr_decom=True (L_init/R_init from a truncated SVD of the
sliding-window init), the BlockOp is built per image shape (train_lr.py
builds ArrayToBlocks per step, :121-122 — here it's a trace-time object),
and lambda_l / lambda_r scalars are logged like the reference does
(:80-113).
"""

from dl_swin_gan_tpu.data import CinePreprocess
from dl_swin_gan_tpu.ops.llr import BlockOp
from dl_swin_gan_tpu.solvers.dslr import build_dslr_solver
from dl_swin_gan_tpu.train.trainer import Trainer


class DSLRTrainer(Trainer):
    def _device_pipeline_kwargs(self):
        # L_init/R_init via the on-device truncated block SVD
        # (train_lr.py:188,204 semantics; jnp.linalg.svd runs on TPU)
        return {"lr_decom": True}

    def __init__(self, cfg, **kw):
        super().__init__(cfg, **kw)
        self.block_size = cfg.MODEL.PARAMETERS.DSLR.BLOCK_SIZE
        self.overlapping = cfg.MODEL.PARAMETERS.DSLR.OVERLAPPING

    def _build_models(self, cfg):
        self.model = build_dslr_solver(cfg)
        self.train_model = self.model  # no dropout in the DSLR nets

    def make_preprocess(self, aug_node=None, use_seed=False):
        return CinePreprocess(self.cfg, aug_node=aug_node, use_seed=use_seed,
                              lr_decom=True)

    def _apply(self, params, batch, train: bool = False, rngs=None):
        # The reference is strictly bs=1 (train_lr.py:125 squeezes the batch
        # dim off L_init); the single-example path reproduces that. For B>1
        # — a TPU-native extension the reference lacks — vmap the whole
        # solver over the batch: every example runs the same static-shape
        # alt-min program, so XLA batches the many small FFTs/bmms instead
        # of dispatching them one example at a time.
        shape1 = (1,) + tuple(batch["target"].shape[1:])
        block_op = BlockOp(self.block_size, shape1,
                           overlapping=self.overlapping)
        if batch["target"].shape[0] == 1:
            return self.model.apply(
                {"params": params}, batch["kspace"], batch["maps"],
                batch["mask"], batch["L_init"][0], batch["R_init"][0],
                block_op)
        import jax

        def one(k, m, ms, L, R):
            return self.model.apply({"params": params}, k[None], m[None],
                                    ms[None], L, R, block_op)[0]

        return jax.vmap(one)(batch["kspace"], batch["maps"], batch["mask"],
                             batch["L_init"], batch["R_init"])

    def init_state(self, sample_batch, seed=None):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from dl_swin_gan_tpu.parallel.mesh import fsdp_shardings, shard_batch
        from dl_swin_gan_tpu.train import packing
        from dl_swin_gan_tpu.train.train_state import TrainState

        seed = self.cfg.SEED if seed is None else seed
        packed = packing.pack(sample_batch)

        def _init(packed_batch):
            b = packing.unpack(packed_batch)
            # init on one example (params are batch-independent; _apply
            # vmaps the solver when B>1)
            block_op = BlockOp(self.block_size,
                               (1,) + tuple(b["target"].shape[1:]),
                               overlapping=self.overlapping)
            params = self.model.init(
                jax.random.PRNGKey(seed), b["kspace"][:1], b["maps"][:1],
                b["mask"][:1], b["L_init"][0], b["R_init"][0],
                block_op)["params"]
            opt_state = self.tx.init(params)
            return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                              opt_state=opt_state, ema_params={})

        abstract = jax.eval_shape(_init, packed)
        shardings = fsdp_shardings(abstract, self.mesh)
        state = jax.jit(_init, out_shardings=shardings)(
            shard_batch(packed, self.mesh))
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(abstract.params))
        import logging
        logging.getLogger(__name__).info("DSLR %s: %.3fM params",
                                         self.cfg.MODEL.META_ARCHITECTURE,
                                         n / 1e6)
        return state
