"""Fused TPU inference engine: the full stylize path over Pallas kernels.

A functional (parameter-tree in, image out) re-composition of
``AST.stylize`` (models/ast.py; reference preview/export path,
train.py:380-391 + models.py:479-529) built for speed-of-light 512px
batched inference:

  * encoder / decoder / ada_out blocks run through the fused
    inverted-residual kernel (ops/pallas/fused_block.py): expand + depthwise
    + SE-sums in one pass, gate + project as one matmul;
  * encoder BatchNorm running statistics are folded into conv weights —
    the reference's ``enc.eval()`` inference semantics (models.py:539-547,
    ``ModelConfig.encoder_eval_stats=True``);
  * AdaAttN runs the streaming flash-style statistics kernel
    (ops/pallas/adaattn_kernel.py) — O(Nc*C) memory at any resolution.

The engine consumes the standard flax checkpoint ``variables`` tree — the
fused path is an inference-engine concern, not a training-graph or
checkpoint concern.  For the batch-statistics robustness mode
(``encoder_eval_stats=False``, see ModelConfig) use the flax graph; the
engine is defined by the running-stats semantics that make BN foldable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.sharding import PartitionSpec as P

from .config import ModelConfig
from .ops.pallas.fused_block import (
    MIN_FUSED_SIZE,
    block_apply,
    decode_fused,
    encode_fused,
)
from .ops.stats import instance_norm

# decoder_impl/encoder_impl -> flatblock chain mode ("auto" = consult the
# autotuned per-block policy table, see ops/pallas/policy.py).
_FLAT_MODE = {"flat": "tail", "flat-all": "all", "auto": "auto"}


def adaattn_apply(
    att_params,
    content_map: jnp.ndarray,
    style_map: jnp.ndarray,
    use_pallas: bool = True,
    dtype=jnp.bfloat16,
):
    """Functional AdaAttN (models/adaattn.py; reference models.py:70-115):
    1x1 q/k/v projections + attention-weighted style mean/std +
    renormalization of the content map."""
    b, h, w, c = content_map.shape
    _, sh, sw, _ = style_map.shape
    normed_content = instance_norm(content_map)
    normed_style = instance_norm(style_map)
    wq = att_params["W_q"]["kernel"][0, 0].astype(dtype)
    wk = att_params["W_k"]["kernel"][0, 0].astype(dtype)
    wv = att_params["W_v"]["kernel"][0, 0].astype(dtype)
    q = (normed_content.astype(dtype) @ wq).reshape(b, h * w, c)
    k = (normed_style.astype(dtype) @ wk).reshape(b, sh * sw, c)
    v = (style_map.astype(dtype) @ wv).reshape(b, sh * sw, c)
    if use_pallas:
        from .ops.pallas.adaattn_kernel import adaattn_statistics_pallas

        mean, std = adaattn_statistics_pallas(q, k, v)
    else:
        from .models.adaattn import adaattn_statistics

        mean, std = adaattn_statistics(q, k, v)
    mean = mean.reshape(b, h, w, c).astype(jnp.float32)
    std = std.reshape(b, h, w, c).astype(jnp.float32)
    return std * normed_content + mean


def adaattn_apply_pair(
    att1_params,
    att2_params,
    content_maps,
    style_maps,
    use_pallas: bool = True,
    dtype=jnp.bfloat16,
):
    """Both AdaAttN modules in one batched attention call.

    The two taps have identical shapes (B, H, W, 128); stacking them along
    the batch axis runs one q/k/v projection (per-image weights) and ONE
    streaming attention kernel over 2B images instead of two — identical
    per-image math, half the dispatches."""
    b, h, w, c = content_maps[0].shape
    cm = jnp.concatenate(content_maps, axis=0)
    sm = jnp.concatenate(style_maps, axis=0)
    normed_c = instance_norm(cm)
    normed_s = instance_norm(sm)

    def wpair(name):
        w1 = att1_params[name]["kernel"][0, 0]
        w2 = att2_params[name]["kernel"][0, 0]
        return jnp.stack([w1, w2]).astype(dtype)  # (2, C, C)

    def project(x, wk):  # per-half weights without materializing (2B,C,C)
        x2 = x.astype(dtype).reshape(2, b, h * w, c)
        return jnp.einsum(
            "pbnc,pcd->pbnd", x2, wk, preferred_element_type=jnp.float32
        ).astype(dtype).reshape(2 * b, h * w, c)

    q = project(normed_c, wpair("W_q"))
    k = project(normed_s, wpair("W_k"))
    v = project(sm, wpair("W_v"))
    if use_pallas:
        from .ops.pallas.adaattn_kernel import adaattn_statistics_pallas

        mean, std = adaattn_statistics_pallas(q, k, v)
    else:
        from .models.adaattn import adaattn_statistics

        mean, std = adaattn_statistics(q, k, v)
    mean = mean.reshape(2 * b, h, w, c).astype(jnp.float32)
    std = std.reshape(2 * b, h, w, c).astype(jnp.float32)
    out = std * normed_c + mean
    return out[:b], out[b:]


def stylize_fused_sharded(
    variables,
    content_img: jnp.ndarray,
    style_img: jnp.ndarray,
    alpha: float,
    mesh,
    cfg: ModelConfig = ModelConfig(),
    interpret: bool = False,
    dtype=jnp.bfloat16,
    min_fused_size: int = MIN_FUSED_SIZE,
    axis: str = "data",
    decoder_impl: str = "fused",
    encoder_impl: str = "fused",
):
    """``stylize_fused`` pinned per-device with ``shard_map``.

    Batch stylization is embarrassingly parallel over the data axis, but
    GSPMD treats ``pallas_call`` as an opaque custom call and MAY insert
    all-gathers of image-sized operands around it, which would kill the
    x8 aggregate throughput target (BASELINE.json: >1000 img/s on v5e-8).
    ``shard_map`` removes that freedom: each device runs the full fused
    engine on its batch shard and NO collectives can be inserted — the
    compiled HLO is collective-free by construction (pinned by
    tests/test_parallel.py::test_sharded_fused_engine_hlo_has_no_collectives).

    The batch must be divisible by the mesh size.
    """
    fn = functools.partial(
        stylize_fused, alpha=alpha, cfg=cfg, interpret=interpret,
        dtype=dtype, min_fused_size=min_fused_size,
        decoder_impl=decoder_impl, encoder_impl=encoder_impl,
    )
    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )(variables, content_img, style_img)


def stylize_fused(
    variables,
    content_img: jnp.ndarray,
    style_img: jnp.ndarray,
    alpha: float = 1.0,
    cfg: ModelConfig = ModelConfig(),
    interpret: bool = False,
    dtype=jnp.bfloat16,
    min_fused_size: int = MIN_FUSED_SIZE,
    decoder_impl: str = "fused",
    encoder_impl: str = "fused",
):
    """Alpha-interpolated stylization through the fused engine.

    Math-identical to ``AST.stylize`` with ``encoder_eval_stats=True``
    (single content encode, alpha feature blend, export clamp — see
    models/ast.py:144-177 and the reference preview path train.py:380-391).
    Blocks dispatch fused-vs-XLA per the measured policy (see
    ops/pallas/fused_block.block_apply).

    ``decoder_impl``: "fused" = round-2 per-block kernel + XLA epilogue;
    "mega" = persistent-VMEM transposed megakernel chain
    (ops/pallas/megablock.decode_mega); "flat" = flat-lane NCHW
    megakernel chain (ops/pallas/flatblock.decode_flat) for the
    lane-aligned high-res decoder sections.  ``encoder_impl``: same
    choice for the encoder's high-res stride-1 blocks.
    """
    params = variables["params"]
    stats = variables["batch_stats"]
    taps = cfg.enc_out_layers

    # One encoder pass over the stacked [content; style] batch: every
    # per-image op (folded BN, SE, instance norm) is batch-independent, so
    # the math is identical while the small 1/8-resolution layers run at
    # twice the batch (better MXU/VPU utilization, half the dispatches).
    b = content_img.shape[0]
    both = jnp.concatenate([content_img, style_img], axis=0)
    if encoder_impl in ("flat", "flat-all", "auto"):
        from .ops.pallas.flatblock import encode_flat

        both_maps = encode_flat(
            params["enc"], stats["enc"], both, cfg.enc_conv_shapes, taps,
            expand_ratio=cfg.expand_ratio, interpret=interpret, dtype=dtype,
            flat_blocks=_FLAT_MODE[encoder_impl],
        )
    elif encoder_impl == "mega":
        from .ops.pallas.megablock import encode_mega

        both_maps = encode_mega(
            params["enc"], stats["enc"], both, cfg.enc_conv_shapes, taps,
            expand_ratio=cfg.expand_ratio, interpret=interpret, dtype=dtype,
        )
    else:
        both_maps = encode_fused(
            params["enc"], stats["enc"], both, cfg.enc_conv_shapes, taps,
            expand_ratio=cfg.expand_ratio, interpret=interpret, dtype=dtype,
            min_fused_size=min_fused_size,
        )
    content_maps = [m[:b] for m in both_maps]
    style_maps = [m[b:] for m in both_maps]

    sm1, sm2 = adaattn_apply_pair(
        params["ada_att_1"], params["ada_att_2"], content_maps, style_maps,
        use_pallas=cfg.use_pallas_adaattn and not interpret, dtype=dtype,
    )

    # One ada_out pass over the stacked [stylized; content] maps: the
    # block is batch-independent (no BN; SE gates per-image), so fusing
    # the two calls halves the 1/8-resolution dispatches — same trick as
    # the stacked encoder above.
    fuse_in = jnp.concatenate(
        [
            jnp.concatenate([sm1, sm2], axis=-1),
            jnp.concatenate(list(content_maps), axis=-1),
        ],
        axis=0,
    )
    fused = block_apply(
        params["ada_out"], fuse_in, 3, cfg.expand_ratio,
        use_identity=False, interpret=interpret, dtype=dtype,
        min_fused_size=min_fused_size,
    )
    t, content_map = fused[:b], fused[b:]
    t = alpha * t + (1.0 - alpha) * content_map
    if decoder_impl in ("flat", "flat-all", "auto"):
        from .ops.pallas.flatblock import decode_flat

        return decode_flat(
            params["dec"], t, cfg.decoder_conv_shapes,
            exporting=True, interpret=interpret, dtype=dtype,
            flat_blocks=_FLAT_MODE[decoder_impl],
        )
    if decoder_impl == "mega":
        from .ops.pallas.megablock import decode_mega

        return decode_mega(
            params["dec"], t, cfg.decoder_conv_shapes,
            exporting=True, interpret=interpret, dtype=dtype,
        )
    return decode_fused(
        params["dec"], t, cfg.decoder_conv_shapes,
        exporting=True, interpret=interpret, dtype=dtype,
        min_fused_size=min_fused_size,
    )
