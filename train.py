#!/usr/bin/env python
"""Stage-2 AST training CLI.

Entry-point parity with the reference ``train.py`` (reference:
train.py:405-440): same flag names and defaults, plus explicit flags for
what the reference hardcodes (dataset directories, preview output).
"""

import argparse

from arbitrarystyletransfer_tpu.config import ASTTrainConfig, ModelConfig
from arbitrarystyletransfer_tpu.data.pipeline import (
    FlatFolderDataset,
    PairedBatchLoader,
)
from arbitrarystyletransfer_tpu.train.ast_trainer import ASTTrainer


def main(args):
    from arbitrarystyletransfer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    dataset = FlatFolderDataset(args.content_dir, args.style_dir, seed=args.seed)
    content_iter = PairedBatchLoader(
        dataset,
        batch_size=args.batch_size,
        img_sizes=tuple(args.img_sizes),
        num_workers=args.num_workers,
        seed=args.seed,
        worker_mode=args.worker_mode,
    )

    cfg = ASTTrainConfig(
        train_iter=args.train_iter,
        batch_size=args.batch_size,
        lr=args.lr,
        dis_lr=args.dis_lr,
        dis_lam=args.dis_lam,
        content_lam=args.content_lam,
        org_img_lam=args.org_img_lam,
        style_lam=args.style_lam,
        tv_lam=args.tv_lam,
        lf_lam=args.lf_lam,
        r1_lam=args.r1_lam,
        save_dir=args.save_dir,
        ae_model=args.ae_model,
        load=args.load,
        recon_lam=args.recon_lam,
        perp_lam=args.perp_lam,
        use_dis=args.use_dis,
    )
    model_cfg = ModelConfig(
        compute_dtype=args.dtype,
        use_pallas_adaattn=args.pallas,
        depthwise_impl=args.dw_impl,
    )
    trainer = ASTTrainer(
        cfg,
        content_iter,
        model_cfg=model_cfg,
        seed=args.seed,
        vgg_weights=args.vgg_weights,
        preview_dir=args.preview_dir,
        debug_stats=args.debug_stats,
    )
    try:
        trainer.train()
    finally:
        content_iter.close()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    # Reference flags (train.py:405-437).
    parser.add_argument("--train_iter", type=int, default=2048000,
            help="Number of train iteration (batches of examples).")
    parser.add_argument("--batch_size", type=int, default=8,
            help="Number of train iteration (batches of examples).")
    parser.add_argument("--lr", type=float, default=2e-4,
            help="Learning rate.")
    parser.add_argument("--dis_lr", type=float, default=1e-5,
            help="Learning rate for the discriminator.")
    parser.add_argument("--dis_lam", type=float, default=1e-3,
            help="Weight for discriminator.")
    parser.add_argument("--content_lam", type=float, default=1.25,
            help="Weight for content loss.")
    parser.add_argument("--org_img_lam", type=float, default=0.5,
            help="Weight for reconstruction loss.")
    parser.add_argument("--style_lam", type=float, default=0.5,
            help="Weight for style loss.")
    parser.add_argument("--tv_lam", type=float, default=0.0006,
            help="Weight for tv loss.")
    parser.add_argument("--lf_lam", type=float, default=1.0,
            help="Weight for lf loss.")
    parser.add_argument("--r1_lam", type=float, default=5.0,
            help="Weight for r1 loss.")
    parser.add_argument("--use_dis", action="store_true",
            help="Enable adversarial training: discriminator step + "
                 "dis_lam-weighted generator fooling loss (the reference's "
                 "GAN experiment, disabled at its HEAD, train.py:160-204).")
    parser.add_argument("--save_dir", default="models/ast/",
            help="Directory to save the model.")
    parser.add_argument("--ae_model", default="models/auto_encoder/ae",
            help="Path of the pretrained auto-encoder checkpoint.")
    parser.add_argument("--load", action="store_true",
            help="Load model.")
    parser.add_argument("--recon_lam", type=float, default=100.0,
            help="Reconstruction loss weight.")
    parser.add_argument("--perp_lam", type=float, default=0.01,
            help="Reconstruction loss weight.")
    # Knobs the reference hardcodes.
    parser.add_argument("--content_dir", nargs="+",
            default=["temp_dataset/content/"],
            help="Content image directories (conf.py:121).")
    parser.add_argument("--style_dir", nargs="+",
            default=["temp_dataset/style/"],
            help="Style image directories (conf.py:122).")
    parser.add_argument("--img_sizes", type=int, nargs="+",
            default=[96, 128, 160],
            help="Multi-resolution training bucket sizes (conf.py:4).")
    parser.add_argument("--num_workers", type=int, default=4)
    parser.add_argument("--worker_mode", default="process",
            choices=["process", "thread"],
            help="Data-loader workers: processes (scales with cores, the "
                 "reference's semantics, train.py:66-75) or threads "
                 "(GIL-capped; tests/small runs).")
    parser.add_argument("--seed", type=int, default=0)
    # TPU fast path (ModelConfig passthrough).
    parser.add_argument("--dtype", default="float32",
            choices=["float32", "bfloat16"],
            help="Compute dtype for the conv path (params stay float32; "
                 "bfloat16 engages the MXU's native dtype).")
    parser.add_argument("--pallas", action="store_true",
            help="Use the fused flash-style AdaAttN Pallas kernel "
                 "(forward AND backward under jit grad) instead of the "
                 "einsum attention chain.  TPU only.")
    parser.add_argument("--dw_impl", default="conv",
            choices=["conv", "shifts"],
            help="Depthwise-conv lowering (see blocks.DepthwiseConv2D).")
    parser.add_argument("--debug_stats", action="store_true",
            help="Log tensor-range diagnostics and per-parameter |grad| "
                 "means every log boundary (reference train.py:294-298,"
                 "334-336).")
    parser.add_argument("--vgg_weights", default=None,
            help="Path to torchvision vgg19 weights (.pth or .npz).")
    parser.add_argument("--preview_dir", default="previews/",
            help="Directory for alpha-{0,.5,1} preview strips "
                 "(the reference's matplotlib GUI, rendered to files).")
    main(parser.parse_args())
