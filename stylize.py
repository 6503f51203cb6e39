#!/usr/bin/env python
"""Standalone stylization inference CLI.

The reference has no serve/infer script — inference lives inside the train
loop's preview block (reference: train.py:380-395) and the
``AST(exporting=True)`` export path (models.py:395,528-529).  This CLI is the
standalone equivalent: load a trained AST checkpoint, stylize a content
image with a style image at a given alpha, write a PNG.
"""

import argparse

import numpy as np
from PIL import Image

from arbitrarystyletransfer_tpu.config import IMSIZE, ModelConfig
from arbitrarystyletransfer_tpu.data.pipeline import image_loader
from arbitrarystyletransfer_tpu.infer import StylePipeline


def main(args):
    from arbitrarystyletransfer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    # imsize shapes only the image loaders; the pipeline itself compiles
    # one executable per input shape.
    cfg = ModelConfig(encoder_eval_stats=args.encoder_eval_stats)
    recalibrate_with = None
    if args.recalibrate_dir:
        # BN recalibration: rebuild encoder running stats from real images
        # so a default-trained (batch-stats) checkpoint can be served by
        # the fused engine (train/recalibrate.py).
        from arbitrarystyletransfer_tpu.data.pipeline import (
            ContentBatchLoader,
            FlatFolderDatasetAE,
        )

        dataset = FlatFolderDatasetAE(args.recalibrate_dir, seed=0)
        loader = ContentBatchLoader(
            dataset, batch_size=8, imsize=args.imsize, num_workers=2,
            seed=0, augment=False, worker_mode="thread",
        )
        it = iter(loader)
        recalibrate_with = [next(it) for _ in range(args.recalibrate_batches)]
        loader.close()
    pipeline = StylePipeline.from_checkpoint(
        args.model, model_cfg=cfg, engine=args.engine,
        decoder_impl=args.decoder, encoder_impl=args.encoder,
        recalibrate_with=recalibrate_with,
    )
    content = image_loader(args.content, args.imsize)
    style = image_loader(args.style, args.imsize)
    out = pipeline.stylize(content, style, alpha=args.alpha)
    img = (np.clip(np.asarray(out[0]), 0, 1) * 255).astype(np.uint8)
    Image.fromarray(img).save(args.output)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--content", required=True, help="Content image path.")
    parser.add_argument("--style", required=True, help="Style image path.")
    parser.add_argument("--output", default="stylized.png")
    parser.add_argument("--model", default="models/ast/ast",
            help="AST checkpoint path.")
    parser.add_argument("--alpha", type=float, default=1.0,
            help="Style interpolation strength (0 = content identity).")
    parser.add_argument("--imsize", type=int, default=IMSIZE,
            help="Inference resolution (conf.py:8).")
    parser.add_argument("--decoder", default="auto",
            choices=["fused", "mega", "flat", "flat-all", "auto"],
            help="Fused-engine decoder dispatch (see engine.stylize_fused; "
                 "'auto' plans the chain over the tuned table).")
    parser.add_argument("--encoder", default="auto",
            choices=["fused", "mega", "flat", "flat-all", "auto"],
            help="Fused-engine encoder dispatch (same choices).")
    parser.add_argument("--engine", default="flax", choices=["flax", "fused"],
            help="Inference engine: flax/XLA graph or the fused Pallas "
                 "engine (running-stats encoder semantics; requires "
                 "--encoder_eval_stats).")
    parser.add_argument("--recalibrate_dir", nargs="*", default=[],
            help="Image directories for BN recalibration: rebuilds the "
                 "encoder's running statistics from real batches so a "
                 "default-trained checkpoint can use --engine fused.")
    parser.add_argument("--recalibrate_batches", type=int, default=16,
            help="Number of batch-8 recalibration batches.")
    parser.add_argument("--encoder_eval_stats",
            action=argparse.BooleanOptionalAction, default=False,
            help="Normalize encoder BN with running statistics (reference "
                 "eval() parity).  Must match how the checkpoint was "
                 "trained; required for --engine fused.")
    main(parser.parse_args())
