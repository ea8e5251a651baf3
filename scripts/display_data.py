#!/usr/bin/env python
"""CFL viewer: save magnitude/phase animations or frame grids of a
reconstruction. TPU-native counterpart of reference `display_data.py`
(matplotlib animation/GIF of slices/phases).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_cfl_images(path):
    from dl_swin_gan_tpu.data import cfl
    im = cfl.read(path, order="F")
    im = im.reshape(im.shape[:5])            # [x, y, sl, emap, ph]
    return np.transpose(im, (2, 3, 4, 1, 0))  # [sl, emap, ph, y, x]


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("file", help="CFL basename (no extension)")
    parser.add_argument("--slice", type=int, default=0)
    parser.add_argument("--emap", type=int, default=0)
    parser.add_argument("--phase", action="store_true", help="show phase")
    parser.add_argument("--gif", default=None, help="write animated GIF here")
    parser.add_argument("--out", default=None, help="write PNG frame grid here")
    args = parser.parse_args(argv)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    im = load_cfl_images(args.file)[args.slice, args.emap]  # [ph, y, x]
    frames = np.angle(im) if args.phase else np.abs(im)

    if args.gif:
        from matplotlib import animation
        fig, ax = plt.subplots()
        ax.axis("off")
        art = ax.imshow(frames[0], cmap="gray")
        def update(i):
            art.set_data(frames[i])
            return [art]
        ani = animation.FuncAnimation(fig, update, frames=len(frames),
                                      interval=80, blit=True)
        ani.save(args.gif, writer="pillow")
        print(args.gif)
        plt.close(fig)
        if not args.out:
            return

    out = args.out or (args.file + ("_phase.png" if args.phase else "_mag.png"))
    n = len(frames)
    cols = min(n, 8)
    rows = (n + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(2 * cols, 2 * rows))
    for i, ax in enumerate(np.atleast_1d(axes).ravel()):
        ax.axis("off")
        if i < n:
            ax.imshow(frames[i], cmap="gray")
            ax.set_title(f"ph {i}", fontsize=7)
    fig.tight_layout()
    fig.savefig(out, dpi=120)
    print(out)


if __name__ == "__main__":
    main()
