#!/usr/bin/env python
"""Generate a small synthetic image-folder dataset for on-chip smoke
training (the serving-proof workflow: brief AE + AST training at a real
resolution, recalibration, fused-engine bench from the trained
checkpoint — VERDICT r5 item 5).

Images are structured (smooth color gradients + shapes + texture noise),
not pure noise, so BatchNorm statistics and the perceptual losses see
natural-image-like ranges.  Mirrors the role of the reference's
hardcoded dataset dirs (reference conf.py:121-122) without shipping any
real data.
"""

import argparse
from pathlib import Path

import numpy as np
from PIL import Image


def synth_image(rng: np.random.Generator, size: int) -> np.ndarray:
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    phase = rng.uniform(0, 2 * np.pi, 3)
    freq = rng.uniform(1.0, 6.0, 3)
    base = np.stack(
        [
            0.5 + 0.5 * np.sin(2 * np.pi * f * (xx * rng.uniform(-1, 1)
                                                + yy * rng.uniform(-1, 1))
                               + p)
            for f, p in zip(freq, phase)
        ],
        axis=-1,
    )
    # a few random rectangles / circles for edges
    for _ in range(rng.integers(2, 6)):
        cx, cy = rng.uniform(0.1, 0.9, 2) * size
        r = rng.uniform(0.05, 0.3) * size
        color = rng.uniform(0, 1, 3)
        if rng.random() < 0.5:
            mask = ((xx * size - cx) ** 2 + (yy * size - cy) ** 2) < r * r
        else:
            mask = (np.abs(xx * size - cx) < r) & (np.abs(yy * size - cy) < r)
        base[mask] = 0.6 * base[mask] + 0.4 * color
    base += rng.normal(0, 0.03, base.shape)
    return (np.clip(base, 0, 1) * 255).astype(np.uint8)


def main(args):
    rng = np.random.default_rng(args.seed)
    for sub in ("content", "style"):
        d = Path(args.out) / sub
        d.mkdir(parents=True, exist_ok=True)
        for i in range(args.n):
            img = synth_image(rng, args.size)
            Image.fromarray(img).save(d / f"{sub}_{i:03d}.jpg", quality=92)
    print(f"wrote 2x{args.n} {args.size}px images under {args.out}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/ast_synth")
    p.add_argument("--n", type=int, default=48)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    main(p.parse_args())
