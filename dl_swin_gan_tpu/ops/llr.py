"""Locally-low-rank (LLR) block operators + truncated SVD factorization.

TPU-native counterpart of reference `dl_cs/mri/lowrank.py`:

  - `BlockOp` (ArrayToBlocks, :13-187): overlapping block extract/combine
    with a sqrt-Hann window; the custom complex overlap-add fold via four
    strided groups (:98-147) and normalization weights = combine(extract(1))
    (:59-60).
  - `decompose` / `compose` (Decompose, :190-262): truncated SVD of each
    block into L [N, b^2*e, r] and R [N, t, r]. The reference pins this to
    CPU because torch 1.9 lacked complex GPU SVD (:207); jnp.linalg.svd
    runs on TPU, removing the constraint. A numpy path (xp=numpy) serves the
    host-side input pipeline.

Functions are written against an array-module parameter `xp` (jnp by
default, numpy for the loader) — the math is identical.
"""

from typing import Tuple

import numpy as np
import jax.numpy as jnp


def _hann_sqrt_window(block_size: int, ne: int, xp) -> "xp.ndarray":
    """sqrt(Hann)^ per-axis window flattened like the reference (:37-39).
    torch.hann_window is periodic=True by default: w[n]=0.5(1-cos(2pi n/N))."""
    n = np.arange(block_size)
    win1d = (0.5 * (1 - np.cos(2 * np.pi * n / block_size))) ** 0.5
    win = win1d[:, None] * win1d[None, :]
    win = np.tile(win[None], (ne, 1, 1)).reshape(1, ne * block_size ** 2, 1)
    return xp.asarray(win.astype(np.float32))


class BlockOp:
    """Array <-> overlapping blocks linear operator.

    extract():  [1, e, t, y, x] -> [N, e*b^2, t]
    combine():  [N, e*b^2, t]   -> [1, e, t, y, x]
    Callable like the reference module: op(x) extracts, op(b, adjoint=True)
    combines. Only the overlapping (stride b/2) mode exists upstream.
    """

    def __init__(self, block_size: int, image_shape, overlapping: bool = True,
                 xp=jnp):
        assert overlapping is True, "reference supports only overlapping blocks"
        self.xp = xp
        self.block_size = b = block_size
        self.stride = s = block_size // 2
        _, self.ne, self.nt, self.ny, self.nx = image_shape
        self.win = _hann_sqrt_window(b, self.ne, xp)

        # pad so an odd number of blocks fits per dim (reference :62-77)
        nbx_coarse = self.nx // b + 1
        nby_coarse = self.ny // b + 1
        pxl = (b * nbx_coarse - self.nx) // 2
        pxr = pxl if self.nx % 2 == 0 else pxl + 1
        pyl = (b * nby_coarse - self.ny) // 2
        pyr = pyl if self.ny % 2 == 0 else pyl + 1
        self.pad_x, self.pad_y = (pxl, pxr), (pyl, pyr)
        self.nx_pad = pxl + self.nx + pxr
        self.ny_pad = pyl + self.ny + pyr
        self.num_blocks_x = (self.nx_pad - b) // s + 1
        self.num_blocks_y = (self.ny_pad - b) // s + 1
        self.num_blocks = self.num_blocks_x * self.num_blocks_y

        # normalization weights: combine(extract(ones)) (reference :59-60)
        self.weights = None
        ones = xp.ones(tuple(image_shape), dtype=xp.complex64)
        self.weights = self.combine(self.extract(ones))

    # -- unfold ---------------------------------------------------------------
    def _unfold(self, images):
        """[1, e, t, ny_pad, nx_pad] -> [N, e*b^2, t] in (by, bx) row-major
        block order (reference :79-96).

        Stride = b/2, so each block is a pair of adjacent stride-s tiles per
        axis: reshape into tiles and concatenate the shifted tile views —
        2 slices + 1 concat per axis instead of num_blocks strided slices
        (bit-identical output, far fewer copy ops for XLA to schedule)."""
        xp = self.xp
        b, s = self.block_size, self.stride
        x = images[0]  # [e, t, Ypad, Xpad]
        e, t, yp, xpad = x.shape
        v = x.reshape(e, t, yp // s, s, xpad)
        y_pairs = xp.concatenate([v[:, :, :-1], v[:, :, 1:]], axis=3)
        w = y_pairs.reshape(e, t, self.num_blocks_y, b, xpad // s, s)
        x_pairs = xp.concatenate([w[..., :-1, :], w[..., 1:, :]], axis=-1)
        # [e, t, nby, by, nbx, bx] -> (nby, nbx, e, by, bx, t) -> [N, e*b*b, t]
        out = x_pairs.transpose(2, 4, 0, 3, 5, 1)
        return out.reshape(self.num_blocks, self.ne * b * b, self.nt)

    def _fold(self, blocks):
        """Overlap-add inverse of _unfold (reference :98-147 computes the
        same sum via four strided groups).

        Each block contributes its first stride-s half at offset i*s and its
        second half at i*s+s; within each half-set the tiles abut without
        overlap, so per axis the overlap-add is two contiguous-half reshapes
        + one shifted pad + one add (vs four strided 7-d gathers upstream)."""
        xp = self.xp
        b, s = self.block_size, self.stride
        nby, nbx = self.num_blocks_y, self.num_blocks_x
        e, t = self.ne, self.nt
        blk = blocks.reshape(nby, nbx, e, b, b, t)
        blk = blk.transpose(2, 5, 0, 3, 1, 4)  # [e, t, nby, by, nbx, bx]

        # x axis: [e, t, nby, by, nbx, bx] -> [e, t, nby, by, nx_pad]
        x1 = blk[..., :s].reshape(e, t, nby, b, nbx * s)
        x2 = blk[..., s:].reshape(e, t, nby, b, nbx * s)
        pad4 = [(0, 0)] * 4
        x = xp.pad(x1, pad4 + [(0, s)]) + xp.pad(x2, pad4 + [(s, 0)])

        # y axis: [e, t, nby, by, X] -> [e, t, ny_pad, X]
        y1 = x[..., :s, :].reshape(e, t, nby * s, self.nx_pad)
        y2 = x[..., s:, :].reshape(e, t, nby * s, self.nx_pad)
        pad2 = [(0, 0)] * 2
        out = (xp.pad(y1, pad2 + [(0, s), (0, 0)])
               + xp.pad(y2, pad2 + [(s, 0), (0, 0)]))
        return out[None]

    # -- public ------------------------------------------------------------------
    def extract(self, data):
        xp = self.xp
        pads = [(0, 0)] * 3 + [self.pad_y, self.pad_x]
        data = xp.pad(data, pads)
        return self._unfold(data) * self.win

    def combine(self, data):
        data = data * self.win
        images = self._fold(data)
        # center crop the padding away (reference :173)
        ys = (self.ny_pad - self.ny) // 2
        xs = (self.nx_pad - self.nx) // 2
        images = images[..., ys:ys + self.ny, xs:xs + self.nx]
        if self.weights is not None:
            images = images / (self.weights + 1e-8)
        return images

    def __call__(self, data, adjoint: bool = False):
        return self.combine(data) if adjoint else self.extract(data)


def btranspose(m):
    """Hermitian transpose of a batch of matrices (reference :240-245)."""
    return m.conj().transpose(0, 2, 1) if isinstance(m, np.ndarray) \
        else jnp.conj(m).transpose(0, 2, 1)


def decompose(blocks, rank: int, xp=jnp) -> Tuple:
    """Truncated SVD of [N, e*b^2, t] blocks -> (L [N, e*b^2, r], R [N, t, r])
    with sqrt(S) split between factors (reference :213-238)."""
    U, S, Vh = (np.linalg.svd(blocks, full_matrices=False) if xp is np
                else jnp.linalg.svd(blocks, full_matrices=False))
    V = btranspose(Vh)
    U = U[:, :, :rank]
    S = S[:, :rank]
    V = V[:, :, :rank]
    s_sqrt = xp.sqrt(S)[:, None, :]
    return U * s_sqrt, V * s_sqrt


def compose(L, R, block_op: BlockOp):
    """LR^H -> blocks -> image (reference :247-253)."""
    blocks = L @ btranspose(R)
    return block_op(blocks, adjoint=True)


def decompose_init(init_image: np.ndarray, block_size: int, rank: int,
                   overlapping: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side (numpy) L0/R0 initialization for the loader
    (reference preprocess.py:166-168)."""
    img = np.asarray(init_image)
    op = BlockOp(block_size, img.shape, overlapping, xp=np)
    blocks = op.extract(img)
    L, R = decompose(blocks, rank, xp=np)
    return L.astype(np.complex64), R.astype(np.complex64)
