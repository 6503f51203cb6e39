#!/usr/bin/env python
"""Stage-1 autoencoder pretraining CLI.

Entry-point parity with the reference ``train_autoencoder.py``
(reference: train_autoencoder.py:248-266): same flag names and defaults.
Extra flags cover what the reference hardcodes (dataset directories in
conf.py:121-122, worker counts, VGG weight file).
"""

import argparse

from arbitrarystyletransfer_tpu.config import (
    AETrainConfig,
    IMG_SIZES,
    ModelConfig,
)
from arbitrarystyletransfer_tpu.data.pipeline import (
    ContentBatchLoader,
    FlatFolderDatasetAE,
)
from arbitrarystyletransfer_tpu.train.ae_trainer import AutoencoderTrainer


def main(args):
    from arbitrarystyletransfer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    # The reference trains the AE over content + style directories combined
    # (train_autoencoder.py:186).
    content_dirs = args.content_dir + args.style_dir
    dataset = FlatFolderDatasetAE(content_dirs, seed=args.seed)
    content_iter = ContentBatchLoader(
        dataset,
        batch_size=args.batch_size,
        imsize=args.imsize,
        num_workers=args.num_workers,
        seed=args.seed,
        augment=False,  # reference uses the plain transform for AE training
        worker_mode=args.worker_mode,
    )
    val_loader = None
    if args.val_dir:
        val_dataset = FlatFolderDatasetAE(args.val_dir, seed=args.seed + 1)
        val_loader = ContentBatchLoader(
            val_dataset,
            batch_size=args.batch_size,
            imsize=args.imsize,
            num_workers=2,
            seed=args.seed + 1,
            augment=True,  # reference's val loader augments
            worker_mode=args.worker_mode,
        )

    cfg = AETrainConfig(
        train_iter=args.train_iter,
        batch_size=args.batch_size,
        lr=args.lr,
        save_dir=args.save_dir,
        load=args.load,
        recon_lam=args.recon_lam,
        perp_lam=args.perp_lam,
        ae_imsize=args.imsize,
    )
    model_cfg = ModelConfig(
        compute_dtype=args.dtype, depthwise_impl=args.dw_impl
    )
    trainer = AutoencoderTrainer(
        cfg, content_iter, val_loader, model_cfg=model_cfg,
        seed=args.seed, vgg_weights=args.vgg_weights,
    )
    try:
        trainer.train()
    finally:
        content_iter.close()
        if val_loader is not None:
            val_loader.close()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    # Reference flags (train_autoencoder.py:249-264).
    parser.add_argument("--train_iter", type=int, default=8192,
            help="Number of train iteration (batches of examples).")
    parser.add_argument("--batch_size", type=int, default=16,
            help="Number of train iteration (batches of examples).")
    parser.add_argument("--lr", type=float, default=2e-4,
            help="Learning rate.")
    parser.add_argument("--save_dir", default="models/auto_encoder/",
            help="Directory to save the model.")
    parser.add_argument("--load", action="store_true",
            help="Load model.")
    parser.add_argument("--recon_lam", type=float, default=100.0,
            help="Reconstruction loss weight.")
    parser.add_argument("--perp_lam", type=float, default=0.01,
            help="Reconstruction loss weight.")
    # Knobs the reference hardcodes in conf.py.
    parser.add_argument("--content_dir", nargs="+",
            default=["temp_dataset/content/"],
            help="Content image directories (conf.py:121).")
    parser.add_argument("--style_dir", nargs="+",
            default=["temp_dataset/style/"],
            help="Style image directories (conf.py:122).")
    parser.add_argument("--val_dir", nargs="*", default=[],
            help="Validation image directories.")
    parser.add_argument("--imsize", type=int, default=256,
            help="AE training resolution.")
    parser.add_argument("--num_workers", type=int, default=8)
    parser.add_argument("--worker_mode", default="process",
            choices=["process", "thread"],
            help="Data-loader workers: processes (scales with cores) or "
                 "threads (GIL-capped; tests/small runs).")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--vgg_weights", default=None,
            help="Path to torchvision vgg19 weights (.pth or .npz).")
    # TPU fast path (ModelConfig passthrough).
    parser.add_argument("--dtype", default="float32",
            choices=["float32", "bfloat16"],
            help="Compute dtype for the conv path (params stay float32).")
    parser.add_argument("--dw_impl", default="conv",
            choices=["conv", "shifts"],
            help="Depthwise-conv lowering (see blocks.DepthwiseConv2D).")
    main(parser.parse_args())
