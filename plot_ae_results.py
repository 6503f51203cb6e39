#!/usr/bin/env python
"""Plot moving-averaged AE training curves from the saved JSON history.

Equivalent of the reference ``plot_ae_results.py`` (reference:
plot_ae_results.py:1-30): seaborn darkgrid styling (reference line 1-6),
moving average window 128, three stacked subplots (train/perceptual/
validation loss), and the reference's ``[32000:]`` warm-up skip on the
train-loss series (reference line 18) — rendered to a file instead of a
GUI.
"""

import argparse
import json

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

try:  # seaborn is styling-only; degrade gracefully without it
    import seaborn as sns

    sns.set(style="darkgrid")
except ImportError:  # pragma: no cover
    sns = None


def moving_average(x, w=128):
    x = np.asarray(x, dtype=np.float64)
    if len(x) < w:
        return x
    return np.convolve(x, np.ones(w), "valid") / w


def main(args):
    with open(args.history) as f:
        train_dict = json.load(f)

    fig, axs = plt.subplots(3, figsize=(8, 10))
    panels = [
        # (key, ylabel, head-skip) — the reference drops the first 32000
        # train-loss entries (warm-up transient) and plots the other two
        # series in full (reference plot_ae_results.py:18,22,26).
        ("train_loss", "Training L1 Loss", args.skip_train),
        ("perp_loss", "Perceptual Loss", 0),
        ("val_loss", "Validation L1 Loss", 0),
    ]
    for ax, (key, ylabel, skip) in zip(axs, panels):
        ys = moving_average(train_dict.get(key, [])[skip:], args.window)
        ax.plot(ys)
        ax.set(xlabel="Train Iter", ylabel=ylabel)
    fig.tight_layout()
    fig.savefig(args.output, dpi=120)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--history", default="models/auto_encoder/train_dict.json")
    parser.add_argument("--output", default="ae_results.png")
    parser.add_argument("--window", type=int, default=128)
    parser.add_argument(
        "--skip_train", type=int, default=32000,
        help="Head entries dropped from the train-loss series before "
             "averaging (reference plot_ae_results.py:18).")
    main(parser.parse_args())
