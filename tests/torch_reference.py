"""The *repaired* reference, reimplemented in torch (CPU), for fidelity tests.

The reference tree does not run at HEAD (SURVEY.md "Known defects": the AST
forward has a syntax error, ada_att_2/ada_out are commented out, etc.), so
loss-curve fidelity can only be claimed against the *intended* semantics.
This module reconstructs that intended program in torch — written from
SURVEY.md's pinned semantics with reference citations, not copied (the
reference is unrunnable imperative NCHW code; this is a fresh NCHW
implementation whose sole purpose is to be numerically comparable).

Repairs baked in (SURVEY.md "Known defects" 1-5):
  1. AST.forward unpacks ``sm1, sm2, t = encode(..., return_maps=True)``
     (models.py:459 intended reading).
  2. ``ada_att_2 = AdaAttN(128)`` and ``ada_out = DepthWiseConv(256,128,...)``
     exist (models.py:407,410 vs 555,566,470).
  5. The soft histogram normalizes by the true element count (the reference's
     ``x.size(1)*x.size(2)`` normalizer is off by W; the TPU build corrects
     it, so the torch side must too for curve comparison).

Weight-porting helpers map the flax (NHWC) parameter tree of the TPU build
onto these torch modules so both sides start from identical weights.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# Blocks (reference: mobilenetv2.py)
# ---------------------------------------------------------------------------


def make_divisible(v, divisor=8, min_value=None):
    # mobilenetv2.py:18-35
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class SELayer(nn.Module):
    """Squeeze-excite with Hardtanh(0,1) gate (mobilenetv2.py:63-81)."""

    def __init__(self, channel, reduction=4):
        super().__init__()
        hidden = make_divisible(channel // reduction, 8)
        self.fc1 = nn.Linear(channel, hidden)
        self.fc2 = nn.Linear(hidden, channel)

    def forward(self, x):
        y = x.mean(dim=(2, 3))  # global average pool
        y = torch.clamp(self.fc2(F.relu(self.fc1(y))), 0.0, 1.0)
        return x * y[:, :, None, None]


class ConvStem(nn.Module):
    """conv_3x3_bn: reflect-pad conv + Hardswish, no BN
    (mobilenetv2.py:38-43, BN commented out)."""

    def __init__(self, c_in, c_out, stride=1):
        super().__init__()
        self.pad = nn.ReflectionPad2d(1)
        self.conv = nn.Conv2d(c_in, c_out, 3, stride, bias=False)

    def forward(self, x):
        return F.hardswish(self.conv(self.pad(x)))


class DepthWiseConv(nn.Module):
    """Inverted-residual block with SE (mobilenetv2.py:95-165)."""

    def __init__(self, c_in, c_out, stride=1, expand_ratio=1, kernel_size=3,
                 use_norm=False, use_identity=True):
        super().__init__()
        hidden = round(c_in * expand_ratio)
        self.expand = expand_ratio != 1
        self.use_norm = use_norm
        self.identity = stride == 1 and c_in == c_out and use_identity
        pad = (kernel_size - 1) // 2
        self.dw = nn.Conv2d(
            hidden, hidden, kernel_size, stride, padding=pad,
            padding_mode="reflect", groups=hidden, bias=False,
        )
        self.se = SELayer(hidden)
        if self.expand:
            self.pw_expand = nn.Conv2d(c_in, hidden, 1, bias=False)
        self.pw_project = nn.Conv2d(hidden, c_out, 1, bias=False)
        if use_norm:
            self.bn0 = nn.BatchNorm2d(hidden)
            self.bn1 = nn.BatchNorm2d(hidden)
            self.bn2 = nn.BatchNorm2d(c_out)

    def forward(self, x):
        org = x
        if self.expand:
            x = self.pw_expand(x)
            if self.use_norm:
                x = self.bn0(x)
            x = F.hardswish(x)
            x = self.dw(x)
            if self.use_norm:
                x = self.bn1(x)
            x = F.hardswish(x)
            x = self.se(x)
            x = self.pw_project(x)
            if self.use_norm:
                x = self.bn2(x)
        else:
            x = self.dw(x)
            if self.use_norm:
                x = self.bn0(x)
            x = F.hardswish(x)
            x = self.se(x)
            x = self.pw_project(x)
            if self.use_norm:
                x = self.bn1(x)
        return x + org if self.identity else x


# ---------------------------------------------------------------------------
# Model graphs (reference: models.py)
# ---------------------------------------------------------------------------


class Encoder(nn.Module):
    """15 blocks, stride-2 at 2/4/7, taps at out_layers (models.py:140-184)."""

    def __init__(self, enc_conv_shapes, expand_ratio):
        super().__init__()
        shapes = enc_conv_shapes
        blocks = [ConvStem(shapes[0][0], shapes[0][1], shapes[0][2])]
        for c_in, c_out, stride, k, t in shapes[1:-1]:
            blocks.append(DepthWiseConv(c_in, c_out, stride, t, k, use_norm=True))
        c_in, c_out, stride = shapes[-1][:3]
        # Final block (models.py:154, SURVEY defect 6 resolution).
        blocks.append(
            DepthWiseConv(c_in, c_out, stride, expand_ratio, 3, use_norm=True)
        )
        self.mob_net = nn.ModuleList(blocks)

    def forward(self, x, out_layers=(12, 14)):
        outs = []
        for i, block in enumerate(self.mob_net):
            x = block(x)
            if i in out_layers:
                outs.append(x)
        return outs


class DecoderBlock(nn.Module):
    """DepthWiseConv (no BN) + optional nearest x2 upsample + smoothing
    (models.py:242-272)."""

    def __init__(self, c_in, c_out, stride, kernel_size, expand_ratio, upsample):
        super().__init__()
        self.block = DepthWiseConv(
            c_in, c_out, stride, expand_ratio, kernel_size, use_norm=False
        )
        self.upsample = upsample
        if upsample:
            self.up = nn.Upsample(scale_factor=2, mode="nearest")
            self.smooth = DepthWiseConv(c_out, c_out, 1, 1, 3, use_norm=False)

    def forward(self, x):
        x = self.block(x)
        if self.upsample:
            x = self.smooth(self.up(x))
        return x


class Decoder(nn.Module):
    def __init__(self, decoder_conv_shapes):
        super().__init__()
        shapes = decoder_conv_shapes
        blocks = []
        for i, shape in enumerate(shapes[:-1]):
            should_upsample = shape[0] != shape[1] and i + 6 < len(shapes)
            blocks.append(
                DecoderBlock(shape[0], shape[1], shape[2], shape[3], shape[4],
                             should_upsample)
            )
        self.blocks = nn.ModuleList(blocks)
        self.out_pad = nn.ReflectionPad2d(1)
        self.img_out = nn.Conv2d(shapes[-1][0], shapes[-1][1], 3)

    def forward(self, x, exporting=False):
        for block in self.blocks:
            x = block(x)
        x = self.img_out(self.out_pad(x))
        return torch.clamp(x, 0.0, 1.0) if exporting else x


class AdaAttN(nn.Module):
    """Attention-weighted AdaIN (models.py:70-115): unscaled-logit softmax
    attention over flattened spatial positions; per-position style mean and
    std = sqrt(relu(A v^2 - mean^2))."""

    def __init__(self, c):
        super().__init__()
        self.W_q = nn.Conv2d(c, c, 1, bias=False)
        self.W_k = nn.Conv2d(c, c, 1, bias=False)
        self.W_v = nn.Conv2d(c, c, 1, bias=False)
        self.inorm = nn.InstanceNorm2d(c)
        self.c = c

    def forward(self, content_map, style_map):
        b, _, h, w = content_map.shape
        q = self.W_q(self.inorm(content_map)).flatten(2).permute(0, 2, 1)
        k = self.W_k(self.inorm(style_map)).flatten(2)
        v = self.W_v(style_map).flatten(2).permute(0, 2, 1)
        attn = torch.softmax(torch.bmm(q, k), dim=-1)
        mean = torch.bmm(attn, v)
        std = torch.sqrt(F.relu(torch.bmm(attn, v ** 2) - mean ** 2))
        mean = mean.view(b, h, w, self.c).permute(0, 3, 1, 2)
        std = std.view(b, h, w, self.c).permute(0, 3, 1, 2)
        return std * self.inorm(content_map) + mean


class AutoEncoder(nn.Module):
    """Encoder -> concat taps -> ada_out fuse -> Decoder (models.py:322-338)."""

    def __init__(self, enc_shapes, dec_shapes, expand_ratio, out_layers=(12, 14)):
        super().__init__()
        self.encoder = Encoder(enc_shapes, expand_ratio)
        self.ada_out = DepthWiseConv(
            256, 128, 1, expand_ratio, 3, use_norm=False, use_identity=False
        )
        self.decoder = Decoder(dec_shapes)
        self.out_layers = out_layers

    def forward(self, x):
        taps = self.encoder(x, self.out_layers)
        return self.decoder(self.ada_out(torch.cat(taps, dim=1)))


class AST(nn.Module):
    """Full AST model, repaired semantics (models.py:393-582 + SURVEY
    defects 1-2)."""

    def __init__(self, enc_shapes, dec_shapes, expand_ratio, out_layers=(12, 14)):
        super().__init__()
        self.enc = Encoder(enc_shapes, expand_ratio)
        self.dec = Decoder(dec_shapes)
        self.ada_att_1 = AdaAttN(128)
        self.ada_att_2 = AdaAttN(128)
        self.ada_out = DepthWiseConv(
            256, 128, 1, expand_ratio, 3, use_norm=False, use_identity=False
        )
        self.out_layers = out_layers

    def encode(self, content, style, detach=False, return_maps=False):
        # models.py:535-572: detach => eval-mode encoder + detached taps.
        if detach:
            was_training = self.enc.training
            self.enc.eval()
            with torch.no_grad():
                content_maps = self.enc(content, self.out_layers)
                style_maps = self.enc(style, self.out_layers)
            self.enc.train(was_training)
        else:
            content_maps = self.enc(content, self.out_layers)
            style_maps = self.enc(style, self.out_layers)
        sm1 = self.ada_att_1(content_maps[0], style_maps[0])
        sm2 = self.ada_att_2(content_maps[1], style_maps[1])
        fused = self.ada_out(torch.cat([sm1, sm2], dim=1))
        if return_maps:
            return sm1, sm2, fused
        return fused

    def forward(self, content, style, alpha=1.0):
        # models.py:425-533 repaired: training path.
        sm1, sm2, t = self.encode(content, style, detach=True, return_maps=True)
        content_maps = self.enc(content, self.out_layers)  # train-mode BN
        content_map = self.ada_out(torch.cat(content_maps, dim=1))
        t = alpha * t + (1.0 - alpha) * content_map
        org_out = self.dec(content_map)
        t_cs = self.dec(t)
        return t_cs, (sm1, sm2), org_out


# ---------------------------------------------------------------------------
# Stats + losses (reference: model_util.py, models.py:54-68, losses.py,
# train.py:216-283)
# ---------------------------------------------------------------------------


def channel_stats(x):
    # model_util.py:3-8: unbiased std, no eps.
    mean = x.mean(dim=(2, 3), keepdim=True)
    std = x.std(dim=(2, 3), keepdim=True)
    return mean, std


def mean_variance_norm(x):
    # models.py:54-68: unbiased var + 1e-5 then sqrt.
    mean = x.mean(dim=(2, 3), keepdim=True)
    std = torch.sqrt(x.var(dim=(2, 3), keepdim=True, unbiased=True) + 1e-5)
    return (x - mean) / std


def gram_matrix(x):
    # losses.py:105-109
    b, c, h, w = x.shape
    flat = x.flatten(2)
    return torch.bmm(flat, flat.transpose(1, 2)) / (c * h * w)


def compute_style_loss(t_map, s_map):
    # losses.py:128-139
    em, es = channel_stats(t_map)
    sm, ss = channel_stats(s_map)
    return (
        F.huber_loss(em, sm) * 1.25
        + F.huber_loss(es, ss) * 1.25
        + F.huber_loss(gram_matrix(t_map), gram_matrix(s_map)) * 10.0
    )


def tv_loss(img):
    # losses.py:90-103: sum reduction.
    w_var = torch.sum((img[:, :, :, :-1] - img[:, :, :, 1:]) ** 2)
    h_var = torch.sum((img[:, :, :-1, :] - img[:, :, 1:, :]) ** 2)
    return h_var + w_var


def soft_histogram(x, k=256):
    # losses.py:24-56 with the corrected normalizer (SURVEY defect 5).
    l = 1.0 / k
    w = l / 2.5
    mu = l * (torch.arange(k, dtype=x.dtype) + 0.5)
    flat = x.reshape(x.shape[0], 1, -1)
    d = flat - mu[None, :, None]
    pj = torch.sigmoid((d + l / 2) / w) - torch.sigmoid((d - l / 2) / w)
    return pj.sum(dim=2) / flat.shape[-1]


def emd(xh, yh):
    # losses.py:8-22 as squared-CDF distance.
    return torch.sum((torch.cumsum(xh, 1) - torch.cumsum(yh, 1)) ** 2, dim=1)


def compute_hist_loss(t_cs, style):
    return emd(soft_histogram(t_cs), soft_histogram(style)).mean()


def ast_loss(cfg, model, vgg_taps_fn, content, style, alpha=1.0):
    """The full Stage-2 objective (train.py:216-283; SURVEY §2.3).

    ``cfg`` is the TPU build's ASTTrainConfig (shared lambda source);
    ``vgg_taps_fn`` maps an image batch to the 6 tap activations.
    Returns (total, aux_dict) with the same aux keys as the TPU step.
    """
    t_cs, (sm1, sm2), org_out = model(content, style, alpha)
    # Re-encode the stylized image, detached (train.py:198,277).
    enc_stylized = [m.detach() for m in model.enc(t_cs.detach(), model.out_layers)]

    maps = {
        name: vgg_taps_fn(img)
        for name, img in (("content", content), ("style", style),
                          ("t_cs", t_cs), ("org_out", org_out))
    }

    content_loss = 0.0
    style_loss = 0.0
    org_img_loss = 0.0
    n = len(maps["t_cs"])
    for i in range(n):
        cm = maps["content"][i].detach()
        sm = maps["style"][i].detach()
        tm = maps["t_cs"][i]
        om = maps["org_out"][i]
        content_loss = content_loss + F.huber_loss(
            mean_variance_norm(tm), mean_variance_norm(cm)
        )
        weight = 0.5 if i == n - 1 else (0.75 if i == n - 2 else 1.0)
        style_loss = style_loss + weight * compute_style_loss(tm, sm)
        org_img_loss = org_img_loss + F.huber_loss(om, cm)

    content_loss = content_loss + F.huber_loss(
        mean_variance_norm(t_cs), mean_variance_norm(content)
    ) * cfg.pixel_content_weight
    out_of_range = F.huber_loss(
        t_cs, torch.clamp(t_cs.detach(), 0.0, 1.0)
    ) * cfg.out_of_range_lam
    hist_loss = compute_hist_loss(t_cs, style) * cfg.hist_lam
    org_img_loss = org_img_loss + F.mse_loss(content, org_out) * cfg.identity_mse_weight
    org_img_loss = org_img_loss * cfg.org_img_lam
    style_loss = style_loss + compute_style_loss(t_cs, style) * cfg.pixel_style_weight

    local_f_loss = 0.0
    for t_map, enc_map in zip((sm1, sm2), enc_stylized):
        local_f_loss = local_f_loss + F.huber_loss(
            mean_variance_norm(t_map), mean_variance_norm(enc_map)
        )

    cur_tv = tv_loss(t_cs)
    total = (
        cfg.content_lam * content_loss
        + cfg.style_lam * style_loss
        + cfg.lf_lam * local_f_loss
        + cfg.tv_lam * cur_tv
        + hist_loss
        + org_img_loss
        + out_of_range
    )
    aux = {
        "content_loss": content_loss,
        "style_loss": style_loss,
        "lf_loss": local_f_loss,
        "tv_loss": cur_tv,
        "org_img_loss": org_img_loss,
        "loss": total,
    }
    return total, aux


# ---------------------------------------------------------------------------
# flax (NHWC) -> torch (NCHW) weight porting
# ---------------------------------------------------------------------------


def _t(a):
    return torch.from_numpy(np.array(a, dtype=np.float32, copy=True))


def _conv(p):  # flax HWIO -> torch OIHW
    return _t(p).permute(3, 2, 0, 1).contiguous()


def _dwconv(p):  # flax (k, k, 1, C) -> torch (C, 1, k, k)
    return _t(p).permute(3, 2, 0, 1).contiguous()


def _linear(mod, p):
    mod.weight.data = _t(p["kernel"]).t().contiguous()
    mod.bias.data = _t(p["bias"])


def port_dwblock(tblock: DepthWiseConv, fp, fs=None):
    """Port one flax DepthWiseConv subtree (+ optional batch_stats subtree)."""
    tblock.dw.weight.data = _dwconv(fp["DepthwiseConv2D_0"]["kernel"])
    _linear(tblock.se.fc1, fp["SELayer_0"]["Dense_0"])
    _linear(tblock.se.fc2, fp["SELayer_0"]["Dense_1"])
    if tblock.expand:
        tblock.pw_expand.weight.data = _conv(fp["Conv_0"]["kernel"])
        tblock.pw_project.weight.data = _conv(fp["Conv_1"]["kernel"])
    else:
        tblock.pw_project.weight.data = _conv(fp["Conv_0"]["kernel"])
    if tblock.use_norm:
        bns = [tblock.bn0, tblock.bn1] + ([tblock.bn2] if tblock.expand else [])
        for i, bn in enumerate(bns):
            sub = fp[f"BatchNorm2D_{i}"]
            bn.weight.data = _t(sub["scale"])
            bn.bias.data = _t(sub["bias"])
            if fs is not None:
                bn.running_mean.data = _t(fs[f"BatchNorm2D_{i}"]["mean"])
                bn.running_var.data = _t(fs[f"BatchNorm2D_{i}"]["var"])


def port_encoder(tenc: Encoder, fp, fs):
    tenc.mob_net[0].conv.weight.data = _conv(fp["mob_net_0"]["Conv_0"]["kernel"])
    for i in range(1, 15):
        port_dwblock(
            tenc.mob_net[i], fp[f"mob_net_{i}"], (fs or {}).get(f"mob_net_{i}")
        )


def port_decoder(tdec: Decoder, fp):
    for i, tb in enumerate(tdec.blocks):
        sub = fp[f"decoder_blocks_{i}"]
        port_dwblock(tb.block, sub["DepthWiseConv_0"])
        if tb.upsample:
            port_dwblock(tb.smooth, sub["DepthWiseConv_1"])
    tdec.img_out.weight.data = _conv(fp["img_out"]["kernel"])
    tdec.img_out.bias.data = _t(fp["img_out"]["bias"])


def port_adaattn(tmod: AdaAttN, fp):
    for name in ("W_q", "W_k", "W_v"):
        getattr(tmod, name).weight.data = _conv(fp[name]["kernel"])


def port_autoencoder(tae: AutoEncoder, params, batch_stats):
    port_encoder(tae.encoder, params["encoder"], batch_stats.get("encoder"))
    port_dwblock(tae.ada_out, params["ada_out"])
    port_decoder(tae.decoder, params["decoder"])


def port_ast(tast: AST, params, batch_stats):
    port_encoder(tast.enc, params["enc"], batch_stats.get("enc"))
    port_adaattn(tast.ada_att_1, params["ada_att_1"])
    port_adaattn(tast.ada_att_2, params["ada_att_2"])
    port_dwblock(tast.ada_out, params["ada_out"])
    port_decoder(tast.dec, params["dec"])


# ---------------------------------------------------------------------------
# Discriminator (reference: models.py:368-388 + mobilenetv2.py:183-314)
# ---------------------------------------------------------------------------


class InvertedResidual(nn.Module):
    """Vanilla MobileNetV2 block: BN always on, no SE, Hardswish
    (reference: mobilenetv2.py:183-221)."""

    def __init__(self, inp, oup, stride, expand_ratio):
        super().__init__()
        hidden = round(inp * expand_ratio)
        self.identity = stride == 1 and inp == oup
        layers = []
        if expand_ratio != 1:
            layers += [
                nn.Conv2d(inp, hidden, 1, 1, 0, bias=False),
                nn.BatchNorm2d(hidden),
                nn.Hardswish(),
            ]
        layers += [
            nn.Conv2d(hidden, hidden, 3, stride, 1, groups=hidden, bias=False),
            nn.BatchNorm2d(hidden),
            nn.Hardswish(),
            nn.Conv2d(hidden, oup, 1, 1, 0, bias=False),
            nn.BatchNorm2d(oup),
        ]
        self.conv = nn.Sequential(*layers)

    def forward(self, x):
        return x + self.conv(x) if self.identity else self.conv(x)


class Discriminator(nn.Module):
    """MobileNetV2(num_classes=1) with the reference Discriminator's norm
    swaps: stem Hardswish -> InstanceNorm2d(32), head BN -> InstanceNorm2d,
    feature-tail Dropout, sigmoid output (models.py:368-388).

    ``dropout`` = 0 gives a deterministic train-mode forward for fidelity
    comparison (matching the flax model's ``dropout_rate=0``).
    """

    CFGS = (
        (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
        (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
    )

    def __init__(self, dropout=0.2):
        super().__init__()
        feats = [
            nn.Sequential(
                nn.Conv2d(3, 32, 3, 2, 1, bias=False, padding_mode="reflect"),
                nn.InstanceNorm2d(32),
            )
        ]
        c_in = 32
        for t, c, n, s in self.CFGS:
            for i in range(n):
                feats.append(InvertedResidual(c_in, c, s if i == 0 else 1, t))
                c_in = c
        feats.append(nn.Dropout(dropout))
        self.features = nn.ModuleList(feats)
        self.conv = nn.Sequential(
            nn.Conv2d(320, 1280, 1, 1, 0, bias=False),
            nn.InstanceNorm2d(1280),
            nn.Dropout(dropout),
            nn.Hardswish(),
        )
        self.classifier = nn.Linear(1280, 1)

    def forward(self, x):
        for layer in self.features:
            x = layer(x)
        x = self.conv(x)
        x = x.mean((2, 3))
        return torch.sigmoid(self.classifier(x))


def _port_bn(bn: nn.BatchNorm2d, fp, fs):
    bn.weight.data = _t(fp["scale"])
    bn.bias.data = _t(fp["bias"])
    bn.running_mean.data = _t(fs["mean"])
    bn.running_var.data = _t(fs["var"])


def port_discriminator(tdis: Discriminator, params, batch_stats):
    """Map the flax Discriminator tree (models/mobilenetv2.py naming) onto
    the torch replica, including BN running statistics."""
    mp, ms = params["mobnet"], batch_stats["mobnet"]
    tdis.features[0][0].weight.data = _conv(mp["stem_conv"]["kernel"])
    for i in range(17):  # 17 inverted-residual blocks
        fb, fsb = mp[f"blocks_{i}"], ms[f"blocks_{i}"]
        tb = tdis.features[1 + i]
        convs = [m for m in tb.conv if isinstance(m, nn.Conv2d)]
        bns = [m for m in tb.conv if isinstance(m, nn.BatchNorm2d)]
        for j, (conv, bn) in enumerate(zip(convs, bns)):
            k = fb[f"Conv_{j}"]["kernel"]
            conv.weight.data = _dwconv(k) if k.shape[2] == 1 and conv.groups > 1 else _conv(k)
            _port_bn(bn, fb[f"BatchNorm2D_{j}"], fsb[f"BatchNorm2D_{j}"])
    tdis.conv[0].weight.data = _conv(mp["head_conv"]["kernel"])
    _linear(tdis.classifier, mp["classifier"])
