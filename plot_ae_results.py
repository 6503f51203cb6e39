#!/usr/bin/env python
"""Plot moving-averaged AE training curves from the saved JSON history.

Equivalent of the reference ``plot_ae_results.py`` (reference:
plot_ae_results.py:1-30): moving average window 128 over train/perceptual/
validation loss, three subplots — rendered to a file instead of a GUI.
"""

import argparse
import json

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def moving_average(x, w=128):
    x = np.asarray(x, dtype=np.float64)
    if len(x) < w:
        return x
    return np.convolve(x, np.ones(w), "valid") / w


def main(args):
    with open(args.history) as f:
        train_dict = json.load(f)

    fig, axs = plt.subplots(1, 3, figsize=(16, 5))
    panels = [
        ("train_loss", "Reconstruction loss"),
        ("perp_loss", "Perceptual loss"),
        ("val_loss", "Validation L1"),
    ]
    for ax, (key, title) in zip(axs, panels):
        ys = moving_average(train_dict.get(key, []), args.window)
        ax.plot(ys)
        ax.set_title(title)
        ax.set_xlabel("iteration")
    fig.tight_layout()
    fig.savefig(args.output, dpi=120)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--history", default="models/auto_encoder/train_dict.json")
    parser.add_argument("--output", default="ae_results.png")
    parser.add_argument("--window", type=int, default=128)
    main(parser.parse_args())
