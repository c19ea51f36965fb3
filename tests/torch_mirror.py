"""Compact PyTorch oracle for UniDepthV2 parity tests.

A from-scratch torch implementation of the UniDepthV2 forward math (as
documented in SURVEY.md §3.1) with reference-compatible state_dict key
names, so that tests can (a) check unidepth_tpu numerics against torch and
(b) exercise the torch->flax checkpoint converter on realistic key layouts.
Deliberately minimal: no dropout, no training paths, fp32 only.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def _heads(x, h):
    b, n, c = x.shape
    return x.view(b, n, h, c // h).transpose(1, 2)


def _unheads(x):
    b, h, n, d = x.shape
    return x.transpose(1, 2).reshape(b, n, h * d)


class MirrorMLP(nn.Module):
    def __init__(self, dim, expansion=4, output_dim=None):
        super().__init__()
        hidden = int(dim * expansion)
        self.norm = nn.LayerNorm(dim)
        self.proj1 = nn.Linear(dim, hidden)
        self.proj2 = nn.Linear(hidden, output_dim or dim)

    def forward(self, x):
        return self.proj2(F.gelu(self.proj1(self.norm(x))))


class MirrorAttnBlock(nn.Module):
    def __init__(self, dim, num_heads, expansion=4, layer_scale=1.0, use_bias=True, context_dim=None):
        super().__init__()
        ctx = context_dim or dim
        self.num_heads = num_heads
        self.kv = nn.Linear(ctx, 2 * dim, bias=use_bias)
        self.q = nn.Linear(dim, dim, bias=use_bias)
        self.out = nn.Linear(dim, dim, bias=use_bias)
        self.norm_attnx = nn.LayerNorm(dim)
        self.norm_attnctx = nn.LayerNorm(ctx)
        self.mlp = MirrorMLP(dim, expansion)
        self.has_ls = layer_scale > 0
        if self.has_ls:
            self.ls1 = nn.Module()
            self.ls1.gamma = nn.Parameter(layer_scale * torch.ones(dim))
            self.ls2 = nn.Module()
            self.ls2.gamma = nn.Parameter(layer_scale * torch.ones(dim))

    def forward(self, x, context=None, pos_embed=None, pos_embed_context=None):
        ctx = x if context is None else context
        y = self.norm_attnx(x)
        c = self.norm_attnctx(ctx)
        k, v = self.kv(c).chunk(2, dim=-1)
        q = _heads(self.q(y), self.num_heads)
        k = _heads(k, self.num_heads)
        v = _heads(v, self.num_heads)
        if pos_embed is not None:
            q = q + _heads(pos_embed, self.num_heads)
        if pos_embed_context is not None:
            k = k + _heads(pos_embed_context, self.num_heads)
        a = self.out(_unheads(F.scaled_dot_product_attention(q, k, v)))
        if self.has_ls:
            a = a * self.ls1.gamma
        x = x + a
        m = self.mlp(x)
        if self.has_ls:
            m = m * self.ls2.gamma
        return x + m


class MirrorViTBlock(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = nn.Module()
        self.attn.qkv = nn.Linear(dim, 3 * dim)
        self.attn.proj = nn.Linear(dim, dim)
        self.ls1 = nn.Module()
        self.ls1.gamma = nn.Parameter(torch.ones(dim))
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, int(dim * mlp_ratio))
        self.mlp.fc2 = nn.Linear(int(dim * mlp_ratio), dim)
        self.ls2 = nn.Module()
        self.ls2.gamma = nn.Parameter(torch.ones(dim))
        self.heads = heads

    def forward(self, x):
        b, n, c = x.shape
        qkv = self.attn.qkv(self.norm1(x)).reshape(b, n, 3, self.heads, c // self.heads)
        q, k, v = (qkv[:, :, i].transpose(1, 2) for i in range(3))
        a = F.scaled_dot_product_attention(q, k, v).transpose(1, 2).reshape(b, n, c)
        x = x + self.attn.proj(a) * self.ls1.gamma
        m = self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))
        return x + m * self.ls2.gamma


class MirrorViT(nn.Module):
    def __init__(self, dim=64, depth=4, heads=2, patch=14, pos_grid=8, output_idx=(1, 2, 3, 4)):
        super().__init__()
        self.patch = patch
        self.pos_grid = pos_grid
        self.output_idx = output_idx
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch, stride=patch)
        self.cls_token = nn.Parameter(torch.randn(1, 1, dim) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, pos_grid * pos_grid + 1, dim) * 0.02)
        self.blocks = nn.ModuleList([MirrorViTBlock(dim, heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)  # reference dinov2.py:167

    def forward(self, x):
        b, _, H, W = x.shape
        gh, gw = H // self.patch, W // self.patch
        t = self.patch_embed.proj(x).flatten(2).transpose(1, 2)  # (B, N, C)
        pos = self.pos_embed[:, 1:].reshape(1, self.pos_grid, self.pos_grid, -1).permute(0, 3, 1, 2)
        pos = F.interpolate(pos, size=(gh, gw), mode="bicubic", align_corners=False, antialias=False)
        pos = pos.permute(0, 2, 3, 1).reshape(1, gh * gw, -1)
        t = t + pos
        cls = self.cls_token.expand(b, -1, -1) + self.pos_embed[:, :1]
        t = torch.cat([cls, t], dim=1)
        feats, cls_tokens = [], []
        for i, blk in enumerate(self.blocks):
            t = blk(t)
            if (i + 1) in self.output_idx:
                o = self.norm(t)
                cls_tokens.append(o[:, :1])
                feats.append(o[:, 1:].reshape(b, gh, gw, -1))
        return feats, cls_tokens


class MirrorResidualConvUnit(nn.Module):
    def __init__(self, dim, kernel_size=3, layer_scale=1.0):
        super().__init__()
        pad = (kernel_size - 1) // 2
        self.conv1 = nn.Conv2d(dim, dim, kernel_size, padding=pad)
        self.conv2 = nn.Conv2d(dim, dim, kernel_size, padding=pad)
        self.gamma = nn.Parameter(layer_scale * torch.ones(1, dim, 1, 1))

    def forward(self, x):
        out = F.leaky_relu(x)
        out = self.conv1(out)
        out = F.leaky_relu(out)
        out = self.conv2(out)
        return self.gamma * out + x


class MirrorResUpsampleBil(nn.Module):
    def __init__(self, dim, output_dim, num_layers=1, kernel_size=3, layer_scale=1.0):
        super().__init__()
        self.convs = nn.ModuleList(
            [MirrorResidualConvUnit(dim, kernel_size, layer_scale) for _ in range(num_layers)]
        )
        self.up = nn.ModuleList([nn.Conv2d(dim, output_dim, 1)])

    def forward(self, x):
        for c in self.convs:
            x = c(x)
        x = self.up[0](x)
        return F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)


def fourier_feats(x, dim, max_freq):
    num_bands = dim // x.shape[-1]
    scales = 2.0 ** torch.linspace(0.0, math.log2(max_freq), steps=num_bands, dtype=x.dtype)
    xs = x.unsqueeze(-1) * scales * math.pi
    return torch.sin(xs).flatten(-2)


class MirrorV2Decoder(nn.Module):
    def __init__(self, input_dims, hidden_dim, num_heads=2, expansion=4, depths=(1, 1, 1), out_dim=8, kernel_size=3, layer_scale=1.0):
        super().__init__()
        self.hidden_dim = hidden_dim
        self.depths = depths
        mult = 2
        self.input_adapter = nn.Module()
        self.input_adapter.input_adapters = nn.ModuleList(
            [nn.Linear(d, hidden_dim) for d in input_dims]
        )
        self.camera_token_adapter = nn.Module()
        self.camera_token_adapter.input_adapters = nn.ModuleList(
            [nn.Linear(d, hidden_dim) for d in input_dims]
        )
        self.level_embeds = nn.Parameter(torch.randn(1, 1, len(input_dims), hidden_dim))

        cam = nn.Module()
        cam.latents_pos = nn.Parameter(torch.randn(1, 4, hidden_dim))
        cam.project = MirrorMLP(hidden_dim, 1, hidden_dim)
        cam.out_pinhole = MirrorMLP(hidden_dim, 1, 1)
        cam.aggregate1 = MirrorAttnBlock(hidden_dim, num_heads, expansion, layer_scale, use_bias=False)
        cam.aggregate2 = MirrorAttnBlock(hidden_dim, num_heads, expansion, layer_scale, use_bias=False)
        self.camera_layer = cam

        d = nn.Module()
        d.to_latents = nn.Linear(hidden_dim, hidden_dim)
        d.prompt_camera = nn.ModuleList()
        for _ in range(4):
            pc = nn.Module()
            pc.layers = nn.ModuleList(
                [MirrorAttnBlock(hidden_dim, num_heads, expansion, layer_scale=-1.0, use_bias=False)]
            )
            d.prompt_camera.append(pc)
        d.process_features = nn.ModuleList()
        d.ups = nn.ModuleList()
        for i, dep in enumerate(depths):
            cur = min(hidden_dim, mult * hidden_dim // int(2**i))
            nxt = mult * hidden_dim // int(2 ** (i + 1))
            odim = max(nxt, out_dim)
            d.process_features.append(
                nn.ConvTranspose2d(hidden_dim, cur, max(1, 2 * i), stride=max(1, 2 * i))
            )
            d.ups.append(MirrorResUpsampleBil(cur, odim, dep, kernel_size, layer_scale))
        self.final_dim = odim
        d.depth_mlp = nn.ModuleList(
            [nn.Identity() for _ in range(len(depths) - 1)]
            + [nn.Sequential(nn.LayerNorm(nxt), nn.Linear(nxt, odim))]
        )
        d.confidence_mlp = nn.Sequential(nn.LayerNorm(nxt), nn.Linear(nxt, odim))
        d.to_depth_lr = nn.Conv2d(odim, odim // 2, 3, padding=1, padding_mode="reflect")
        d.to_confidence_lr = nn.Conv2d(odim, odim // 2, 3, padding=1, padding_mode="reflect")
        d.to_depth_hr = nn.Sequential(
            nn.Conv2d(odim // 2, 32, 3, padding=1, padding_mode="reflect"),
            nn.LeakyReLU(),
            nn.Conv2d(32, 1, 1),
        )
        d.to_confidence_hr = nn.Sequential(
            nn.Conv2d(odim // 2, 32, 3, padding=1, padding_mode="reflect"),
            nn.LeakyReLU(),
            nn.Conv2d(32, 1, 1),
        )
        self.depth_layer = d

    def forward(self, feats, cls_tokens, image_shape, rays_gt=None):
        H, W = image_shape
        b, gh, gw, _ = feats[0].shape
        feats = [
            ad(f.reshape(b, gh * gw, -1))
            for ad, f in zip(self.input_adapter.input_adapters, feats)
        ]
        cams = [
            ad(t) for ad, t in zip(self.camera_token_adapter.input_adapters, cls_tokens)
        ]
        tokens = torch.cat(cams, dim=1)

        cl = self.camera_layer
        t = cl.project(tokens)
        lp = cl.latents_pos.expand(b, -1, -1)
        t = cl.aggregate1(t, pos_embed=lp)
        t = cl.aggregate2(t, pos_embed=lp)
        x = cl.out_pinhole(t).squeeze(-1)
        diag = (H * H + W * W) ** 0.5
        fx = torch.exp(x[:, 0]) * 0.7 * diag
        fy = torch.exp(x[:, 1]) * 0.7 * diag
        cx = torch.sigmoid(x[:, 2]) * W
        cy = torch.sigmoid(x[:, 3]) * H

        ys, xs = torch.meshgrid(
            torch.linspace(0.5, H - 0.5, H), torch.linspace(0.5, W - 0.5, W), indexing="ij"
        )
        rx = (xs[None] - cx[:, None, None]) / fx[:, None, None]
        ry = (ys[None] - cy[:, None, None]) / fy[:, None, None]
        rays = torch.stack([rx, ry, torch.ones_like(rx)], dim=-1)
        rays = rays / rays.norm(dim=-1, keepdim=True).clamp(min=1e-5)
        rays = rays.reshape(b, H * W, 3)
        if rays_gt is not None:
            rays = rays_gt

        dl = self.depth_layer
        # embed rays at token grid
        r = rays.view(b, H, W, 3).permute(0, 3, 1, 2)
        r = F.interpolate(r, size=(gh, gw), mode="bilinear", align_corners=False, antialias=True)
        r = r.permute(0, 2, 3, 1).reshape(b, gh * gw, 3)
        r = r / r.norm(dim=-1, keepdim=True).clamp(min=1e-4)
        polar = torch.acos(r[..., 2])
        xc = r[..., 0].abs().clamp(min=1e-3) * (2 * (r[..., 0] >= 0).int() - 1)
        azimuth = torch.atan2(r[..., 1], xc)
        remb = fourier_feats(torch.stack([polar, azimuth], dim=-1), self.hidden_dim, max(gh, gw) // 2)

        cond = [pc.layers[0](f, context=remb) for pc, f in zip(dl.prompt_camera, feats)]
        latents = dl.to_latents(cond[0]).view(b, gh, gw, -1).permute(0, 3, 1, 2)
        cond_maps = [c.view(b, gh, gw, -1).permute(0, 3, 1, 2) for c in cond]
        outs = []
        for i, up in enumerate(dl.ups):
            latents = latents + dl.process_features[i](cond_maps[i + 1])
            latents = up(latents)
            outs.append(latents)
        final = outs[-1]
        logd = dl.depth_mlp[-1](final.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        logd = dl.to_depth_lr(logd)
        logd = F.interpolate(logd, size=(H, W), mode="bilinear", align_corners=True)
        logd = dl.to_depth_hr(logd)
        conf = dl.confidence_mlp(final.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        conf = dl.to_confidence_lr(conf)
        conf = F.interpolate(conf, size=(H, W), mode="bilinear", align_corners=True)
        conf = dl.to_confidence_hr(conf)

        K = torch.zeros(b, 3, 3)
        K[:, 0, 0], K[:, 1, 1], K[:, 0, 2], K[:, 1, 2], K[:, 2, 2] = fx, fy, cx, cy, 1.0
        return {
            "radius": torch.exp(logd.clamp(-8, 8) + 2.0),
            "confidence": torch.exp(conf.clamp(-8, 8)),
            "intrinsics": K,
            "rays": rays,
        }


class MirrorUniDepthV2(nn.Module):
    """pixel_encoder + pixel_decoder with reference-style key names."""

    def __init__(self, **kw):
        super().__init__()
        dim = kw.get("dim", 64)
        self.pixel_encoder = MirrorViT(
            dim=dim,
            depth=kw.get("depth", 4),
            heads=kw.get("heads", 2),
            output_idx=kw.get("output_idx", (1, 2, 3, 4)),
        )
        self.pixel_decoder = MirrorV2Decoder(
            input_dims=[dim] * 4,
            hidden_dim=kw.get("hidden_dim", 32),
            num_heads=kw.get("num_heads", 2),
            depths=kw.get("depths", (1, 1, 1)),
            out_dim=kw.get("out_dim", 8),
        )

    def forward(self, image, rays_gt=None):
        feats, cls_tokens = self.pixel_encoder(image)
        out = self.pixel_decoder(
            feats, cls_tokens, image.shape[-2:], rays_gt=rays_gt
        )
        rays = out["rays"].view(image.shape[0], *image.shape[-2:], 3).permute(0, 3, 1, 2)
        pts = rays * out["radius"]
        out["points"] = pts
        out["depth"] = pts[:, -1:]
        return out


# ---------------------------------------------------------------------------
# V1 mirror
# ---------------------------------------------------------------------------


def torch_rsh_cart(xyz, degree=8):
    """Real SH, same convention as torch-spherical-harmonics (CS phase)."""
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    one = torch.ones_like(x)
    c = [one]
    s = [torch.zeros_like(x)]
    for m in range(1, degree + 1):
        c.append(x * c[m - 1] - y * s[m - 1])
        s.append(x * s[m - 1] + y * c[m - 1])
    pt = {(0, 0): one}
    for m in range(1, degree + 1):
        dfact = 1.0
        for i in range(1, 2 * m, 2):
            dfact *= i
        pt[(m, m)] = ((-1.0) ** m * dfact) * one
    for m in range(0, degree):
        pt[(m + 1, m)] = (2 * m + 1) * z * pt[(m, m)]
    for m in range(0, degree + 1):
        for l in range(m + 2, degree + 1):
            pt[(l, m)] = ((2 * l - 1) * z * pt[(l - 1, m)] - (l - 1 + m) * pt[(l - 2, m)]) / (l - m)
    out = []
    for l in range(degree + 1):
        row = {}
        for m in range(0, l + 1):
            k = math.sqrt((2 * l + 1) / (4 * math.pi) * math.factorial(l - m) / math.factorial(l + m))
            if m == 0:
                row[0] = k * pt[(l, 0)]
            else:
                kk = math.sqrt(2.0) * k
                row[m] = kk * pt[(l, m)] * c[m]
                row[-m] = kk * pt[(l, m)] * s[m]
        for m in range(-l, l + 1):
            out.append(row[m])
    return torch.stack(out, dim=-1)


class MirrorAdapterV1(nn.Module):
    def __init__(self, in_dim, hidden):
        super().__init__()
        self.seq = nn.Sequential(nn.LayerNorm(in_dim), nn.Linear(in_dim, hidden), nn.GELU())

    def forward(self, x):
        return self.seq(x)


class MirrorConvUpsample(nn.Module):
    def __init__(self, dim, expansion=4, num_layers=2, kernel_size=7):
        super().__init__()
        self.convs = nn.ModuleList()
        for _ in range(num_layers):
            blk = nn.Module()
            blk.dwconv = nn.Conv2d(dim, dim, kernel_size, padding=kernel_size // 2, groups=dim)
            blk.norm = nn.LayerNorm(dim)  # torch default eps=1e-5, matching reference convnext.py:25
            blk.pwconv1 = nn.Linear(dim, expansion * dim)
            blk.pwconv2 = nn.Linear(expansion * dim, dim)
            blk.gamma = nn.Parameter(torch.ones(dim))
            self.convs.append(blk)
        self.up = nn.ModuleList(
            [nn.Conv2d(dim, dim // 2, 1), nn.Identity(), nn.Conv2d(dim // 2, dim // 2, 3, padding=1)]
        )

    def forward(self, x):
        for blk in self.convs:
            inp = x
            y = blk.dwconv(x).permute(0, 2, 3, 1)
            y = blk.norm(y)
            y = blk.pwconv2(F.gelu(blk.pwconv1(y))) * blk.gamma
            x = inp + y.permute(0, 3, 1, 2)
        x = self.up[0](x)
        x = F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)
        x = self.up[2](x)
        b, ch, h, w = x.shape
        return x.permute(0, 2, 3, 1).reshape(b, h * w, ch)


class MirrorV1Decoder(nn.Module):
    def __init__(self, input_dims, hidden_dim, num_heads=2, expansion=4, depths=(1, 1, 1)):
        super().__init__()
        hd = hidden_dim
        self.hidden_dim = hd
        self.depths = depths
        self.input_adapter = nn.Module()
        self.input_adapter.input_adapters = nn.ModuleList(
            [MirrorAdapterV1(d, hd).seq for d in input_dims]
        )
        self.token_adapter = nn.Module()
        self.token_adapter.input_adapters = nn.ModuleList(
            [MirrorAdapterV1(d, hd).seq for d in input_dims[::-1]]
        )
        self.level_embeds = nn.Parameter(torch.randn(len(input_dims), hd))
        self.level_embed_layer = nn.Sequential(
            nn.Linear(hd, hd), nn.GELU(), nn.Linear(hd, hd), nn.LayerNorm(hd)
        )
        cam = nn.Module()
        cam.latents_pos = nn.Parameter(torch.randn(1, 4, hd))
        cam.cls_project = nn.Sequential(
            nn.LayerNorm(hd), nn.Linear(hd, hd // 2), nn.GELU(), nn.Linear(hd // 2, hd)
        )
        cam.in_features = MirrorMLP(hd, 2)
        cam.aggregate = MirrorAttnBlock(hd, 1, expansion, 1.0)
        cam.layers = nn.ModuleList([MirrorAttnBlock(hd, num_heads, expansion, 1.0) for _ in range(2)])
        cam.out = MirrorMLP(hd, 2, 1)
        self.camera_layer = cam

        d = nn.Module()
        d.project_rays16 = MirrorMLP(81, expansion, hd)
        d.project_rays8 = MirrorMLP(81, expansion, hd // 2)
        d.project_rays4 = MirrorMLP(81, expansion, hd // 4)
        d.to_latents = MirrorMLP(hd, 2)
        d.features_channel_cat = nn.Linear(hd * len(input_dims), hd)
        d.aggregate_16 = MirrorAttnBlock(hd, 1, expansion, 1.0)
        d.prompt_camera = MirrorAttnBlock(hd, 1, expansion, 1.0)
        d.layers_16 = nn.ModuleList([MirrorAttnBlock(hd, num_heads, expansion, 1.0) for _ in range(depths[0])])
        d.layers_8 = nn.ModuleList([MirrorAttnBlock(hd // 2, num_heads // 2, expansion, 1.0) for _ in range(depths[1])])
        d.layers_4 = nn.ModuleList([MirrorAttnBlock(hd // 4, max(1, num_heads // 4), expansion, 1.0) for _ in range(depths[2])])
        d.up8 = MirrorConvUpsample(hd, expansion)
        d.up4 = MirrorConvUpsample(hd // 2, expansion)
        d.up2 = MirrorConvUpsample(hd // 4, expansion)
        d.out8 = nn.Conv2d(hd // 2, 1, 3, padding=1)
        d.out4 = nn.Conv2d(hd // 4, 1, 3, padding=1)
        d.out2 = nn.Conv2d(hd // 8, 1, 3, padding=1)
        self.depth_layer = d

    @staticmethod
    def _pos_sine(h, w, dim):
        mask = torch.zeros(1, h, w, dtype=torch.bool)
        y = (~mask).cumsum(1, dtype=torch.float32)
        x = (~mask).cumsum(2, dtype=torch.float32)
        eps = 1e-6
        scale = 2 * math.pi
        y = y / (y[:, -1:, :] + eps) * scale
        x = x / (x[:, :, -1:] + eps) * scale
        dim_t = torch.arange(dim // 2, dtype=torch.float32)
        dim_t = 10000.0 ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / (dim // 2))
        px = x[..., None] / dim_t
        py = y[..., None] / dim_t
        px = torch.stack((px[..., 0::2].sin(), px[..., 1::2].cos()), dim=4).flatten(3)
        py = torch.stack((py[..., 0::2].sin(), py[..., 1::2].cos()), dim=4).flatten(3)
        return torch.cat((py, px), dim=3).reshape(1, h * w, dim)

    def forward(self, feats, cls_tokens, image_shape, rays_gt=None):
        H, W = image_shape
        b, gh, gw, _ = feats[0].shape
        feats = [
            ad(f.reshape(b, gh * gw, -1))
            for ad, f in zip(self.input_adapter.input_adapters, feats)
        ]
        cams = [ad(t) for ad, t in zip(self.token_adapter.input_adapters, cls_tokens[::-1])]
        cls_cat = torch.cat(cams, dim=1)
        le = self.level_embed_layer(self.level_embeds)
        level_embed = torch.repeat_interleave(le, gh * gw, dim=0)[None].expand(b, -1, -1)
        pos = self._pos_sine(gh, gw, le.shape[-1]).repeat(1, len(feats), 1).expand(b, -1, -1)

        cl = self.camera_layer
        cls_p = cl.cls_project(cls_cat)
        stack = torch.cat(feats, dim=1) + (pos + level_embed)
        stack = cl.in_features(stack)
        ctx = torch.cat([stack, cls_p], dim=1)
        lp = cl.latents_pos.expand(b, -1, -1)
        t = cl.aggregate(cls_p, context=ctx, pos_embed=lp)
        for blk in cl.layers:
            t = blk(t, pos_embed=lp)
        x = cl.out(t).squeeze(-1)
        mx = max(image_shape) / 2
        K = torch.zeros(b, 3, 3)
        K[:, 0, 0] = x[:, 0].exp() * mx
        K[:, 1, 1] = x[:, 1].exp() * mx
        K[:, 0, 2] = x[:, 2].sigmoid() * W
        K[:, 1, 2] = x[:, 3].sigmoid() * H
        K[:, 2, 2] = 1.0

        if rays_gt is None:
            xs = torch.linspace(0.5, W - 0.5, W)
            ys = torch.linspace(0.5, H - 0.5, H)
            gy, gx = torch.meshgrid(ys, xs, indexing="ij")
            rx = (gx[None] - K[:, 0, 2, None, None]) / K[:, 0, 0, None, None]
            ry = (gy[None] - K[:, 1, 2, None, None]) / K[:, 1, 1, None, None]
            rays = torch.stack([rx, ry, torch.ones_like(rx)], dim=-1)
            rays = rays / rays.norm(dim=-1, keepdim=True).clamp(min=1e-12)
            rays = rays.reshape(b, H * W, 3)
        else:
            rays = rays_gt
        rays = rays.detach()

        d = self.depth_layer

        def remb(new, proj):
            r = rays.view(b, H, W, 3).permute(0, 3, 1, 2)
            r = F.interpolate(r, size=new, mode="bilinear", align_corners=False, antialias=True)
            r = r.permute(0, 2, 3, 1).reshape(b, -1, 3)
            r = r / r.norm(dim=-1, keepdim=True).clamp(min=1e-12)
            return proj(torch_rsh_cart(r, 8))

        e16 = remb((gh, gw), d.project_rays16)
        e8 = remb((gh * 2, gw * 2), d.project_rays8)
        e4 = remb((gh * 4, gw * 4), d.project_rays4)

        tokens = torch.cat(feats, dim=1)
        tokens_pos = pos + level_embed
        f16 = d.features_channel_cat(torch.cat(feats, dim=-1))
        lat = d.to_latents(f16)
        lat = d.aggregate_16(lat, context=tokens, pos_embed_context=tokens_pos)
        lat = d.prompt_camera(lat, context=e16)
        outs = []
        shapes = (gh, gw)
        for li, (layers, up, head, e, dim_i) in enumerate(
            zip(
                [d.layers_16, d.layers_8, d.layers_4],
                [d.up8, d.up4, d.up2],
                [d.out8, d.out4, d.out2],
                [e16, e8, e4],
                [None] * 3,
            )
        ):
            for blk in layers:
                lat = blk(lat, pos_embed=e)
            grid = (lat + e).view(b, *shapes, -1).permute(0, 3, 1, 2)
            lat = up(grid)
            shapes = (shapes[0] * 2, shapes[1] * 2)
            o = head(lat.view(b, *shapes, -1).permute(0, 3, 1, 2))
            outs.append(o.clamp(-10, 10).exp())
        return K, outs


# ---------------------------------------------------------------------------
# V2old mirror
# ---------------------------------------------------------------------------


class MirrorShuffleResidualUp(nn.Module):
    def __init__(self, dim, expansion=4, num_layers=2, kernel_size=7):
        super().__init__()
        self.convs = nn.ModuleList()
        for _ in range(num_layers):
            blk = nn.Module()
            blk.dwconv = nn.Conv2d(dim, dim, kernel_size, padding=kernel_size // 2, groups=dim)
            blk.norm = nn.LayerNorm(dim)  # torch default eps=1e-5, matching reference convnext.py:25
            blk.pwconv1 = nn.Linear(dim, expansion * dim)
            blk.pwconv2 = nn.Linear(expansion * dim, dim)
            blk.gamma = nn.Parameter(torch.ones(dim))
            self.convs.append(blk)
        self.up = nn.ModuleList(
            [nn.PixelShuffle(2), nn.Conv2d(dim // 4, dim // 4, 7, padding=3, groups=dim // 4),
             nn.ReLU(), nn.Conv2d(dim // 4, dim // 2, 3, padding=1)]
        )
        self.residual = nn.ModuleList(
            [nn.Conv2d(dim, dim // 2, 1), nn.UpsamplingBilinear2d(scale_factor=2)]
        )

    def forward(self, x):
        for blk in self.convs:
            inp = x
            y = blk.dwconv(x).permute(0, 2, 3, 1)
            y = blk.norm(y)
            y = blk.pwconv2(F.gelu(blk.pwconv1(y))) * blk.gamma
            x = inp + y.permute(0, 3, 1, 2)
        y = self.up[0](x)
        y = self.up[1](y)
        y = self.up[3](F.relu(y))
        res = self.residual[1](self.residual[0](x))
        out = y + res
        b, ch, h, w = out.shape
        return out.permute(0, 2, 3, 1).reshape(b, h * w, ch)


def fourier_feats_cat(x, dim, max_freq):
    num_bands = dim // x.shape[-1]
    scales = 2.0 ** torch.linspace(0.0, math.log2(max_freq), steps=num_bands, dtype=x.dtype)
    xs = x.unsqueeze(-1) * scales * math.pi
    return torch.cat([torch.sin(xs).flatten(-2), x], dim=-1)


class MirrorV2OldDecoder(nn.Module):
    def __init__(self, input_dims, hidden_dim, num_heads=2, expansion=4, depths=(1, 0, 0), camera_dim=24):
        super().__init__()
        hd = hidden_dim
        self.hidden_dim, self.depths, self.camera_dim = hd, depths, camera_dim
        self.input_adapter = nn.Module()
        self.input_adapter.input_adapters = nn.ModuleList(
            [nn.Sequential(nn.LayerNorm(d), nn.Linear(d, hd), nn.GELU()) for d in input_dims]
        )
        self.camera_token_adapter = nn.Module()
        self.camera_token_adapter.input_adapters = nn.ModuleList(
            [nn.Sequential(nn.LayerNorm(d), nn.Linear(d, hd), nn.GELU()) for d in [input_dims[-1]] * 4]
        )
        self.global_token_adapter = nn.Module()
        self.global_token_adapter.input_adapters = nn.ModuleList(
            [nn.Sequential(nn.LayerNorm(d), nn.Linear(d, hd), nn.GELU()) for d in [input_dims[-1]] * 2]
        )
        self.level_embeds = nn.Parameter(torch.randn(len(input_dims), hd))
        self.level_embed_layer = nn.Sequential(
            nn.Linear(hd, hd), nn.GELU(), nn.Linear(hd, hd), nn.LayerNorm(hd)
        )
        cam = nn.Module()
        cam.latents_pos = nn.Parameter(torch.randn(1, 4, hd))
        cam.project_cls = MirrorMLP(hd, 4)
        cam.in_features = MirrorMLP(hd, 2)
        cam.aggregate1 = MirrorAttnBlock(hd, 1, expansion, 1.0)
        cam.aggregate2 = MirrorAttnBlock(hd, 1, expansion, 1.0)
        cam.out = MirrorMLP(hd, 2, 1)
        self.camera_layer = cam
        glob = nn.Module()
        glob.project_cls = MirrorMLP(hd, 4)
        glob.project_rays = nn.Linear(camera_dim + 3, hd)
        glob.in_features = nn.Linear(hd, hd)
        glob.aggregate1 = MirrorAttnBlock(hd, 1, expansion, 1.0)
        glob.aggregate2 = MirrorAttnBlock(hd, 1, expansion, 1.0)
        glob.out = MirrorMLP(hd, 2, 1)
        self.global_layer = glob
        d = nn.Module()
        d.to_latents = MirrorMLP(hd, 2)
        d.features_channel_cat = nn.Linear(hd * len(input_dims), hd)
        d.aggregate_16 = MirrorAttnBlock(hd, 1, expansion, 1.0)
        d.prompt_camera = MirrorAttnBlock(hd, 1, expansion, 1.0)
        d.rays_layers = nn.ModuleList()
        d.process_layers = nn.ModuleList()
        d.ups = nn.ModuleList()
        d.depth_mlp, d.confidence_mlp = nn.ModuleList(), nn.ModuleList()
        for i, dep in enumerate(depths):
            dim_i = hd // 2**i
            d.rays_layers.append(nn.Linear(camera_dim + 3, dim_i))
            d.process_layers.append(
                nn.ModuleList([MirrorAttnBlock(dim_i, max(1, num_heads >> i), expansion, 1.0) for _ in range(dep)])
            )
            d.ups.append(MirrorShuffleResidualUp(dim_i, expansion))
            d.depth_mlp.append(MirrorMLP(dim_i // 2, 1, 16))
            d.confidence_mlp.append(MirrorMLP(dim_i // 2, 1, 16))
        d.to_depth = nn.Conv2d(16 * len(depths), 1, 7, padding=3, padding_mode="reflect")
        d.to_confidence = nn.Conv2d(16 * len(depths), 1, 7, padding=3, padding_mode="reflect")
        self.depth_layer = d

    def forward(self, feats, camera_tokens, global_tokens, image_shape, rays_gt=None):
        H, W = image_shape
        b, gh, gw, _ = feats[0].shape
        feats = [ad(f.reshape(b, gh * gw, -1)) for ad, f in zip(self.input_adapter.input_adapters, feats)]
        cam_cls = torch.cat([ad(t) for ad, t in zip(self.camera_token_adapter.input_adapters, camera_tokens)], dim=1)
        glob_cls = torch.cat([ad(t) for ad, t in zip(self.global_token_adapter.input_adapters, global_tokens)], dim=1)
        le = self.level_embed_layer(self.level_embeds)
        level_embed = torch.repeat_interleave(le, gh * gw, dim=0)[None].expand(b, -1, -1)
        pos = MirrorV1Decoder._pos_sine(gh, gw, le.shape[-1]).repeat(1, len(feats), 1).expand(b, -1, -1)

        cl = self.camera_layer
        cls_p = cl.project_cls(cam_cls)
        lp = cl.latents_pos.expand(b, -1, -1)
        stack = cl.in_features(torch.cat(feats, dim=1) + (pos + level_embed))
        ctx = torch.cat([stack, cls_p], dim=1)
        t = cl.aggregate1(cls_p, context=ctx, pos_embed=lp)
        t = cl.aggregate2(t, context=ctx, pos_embed=lp)
        x = cl.out(t).squeeze(-1)
        mx = max(image_shape) / 2
        K = torch.zeros(b, 3, 3)
        K[:, 0, 0] = x[:, 0].exp() * mx
        K[:, 1, 1] = x[:, 1].exp() * mx
        K[:, 0, 2] = x[:, 2].sigmoid() * W
        K[:, 1, 2] = x[:, 3].sigmoid() * H
        K[:, 2, 2] = 1.0
        if rays_gt is None:
            xs = torch.linspace(0.5, W - 0.5, W)
            ys = torch.linspace(0.5, H - 0.5, H)
            gy, gx = torch.meshgrid(ys, xs, indexing="ij")
            rx = (gx[None] - K[:, 0, 2, None, None]) / K[:, 0, 0, None, None]
            ry = (gy[None] - K[:, 1, 2, None, None]) / K[:, 1, 1, None, None]
            rays = torch.stack([rx, ry, torch.ones_like(rx)], dim=-1)
            rays = (rays / rays.norm(dim=-1, keepdim=True).clamp(min=1e-12)).reshape(b, H * W, 3)
        else:
            rays = rays_gt

        def remb(new, dim):
            r = rays.view(b, H, W, 3).permute(0, 3, 1, 2)
            r = F.interpolate(r, size=new, mode="bilinear", align_corners=False, antialias=True)
            r = r.permute(0, 2, 3, 1).reshape(b, -1, 3)
            r = r / r.norm(dim=-1, keepdim=True).clamp(min=1e-12)
            return fourier_feats_cat(r, self.camera_dim, max(new) // 2)

        gl = self.global_layer
        g_cls = gl.project_cls(glob_cls)
        g_remb = gl.project_rays(remb((gh, gw), None))
        g_remb = g_remb.repeat(1, len(feats), 1)
        g_stack = gl.in_features(torch.cat(feats, dim=1) + g_remb)
        g_ctx = torch.cat([g_stack, g_cls], dim=1)
        g = gl.aggregate1(g_cls, context=g_ctx)
        g = gl.aggregate2(g, context=g_ctx)
        gx2 = gl.out(g).squeeze(-1)
        scale = gx2[:, 0].exp().reshape(-1, 1, 1, 1)
        shift = gx2[:, 1].reshape(-1, 1, 1, 1)

        d = self.depth_layer
        rembs = [d.rays_layers[i](remb((gh * 2**i, gw * 2**i), None)) for i in range(len(self.depths))]
        f16 = d.features_channel_cat(torch.cat(feats, dim=-1))
        lat = f16 + d.to_latents(f16)
        lat = d.aggregate_16(lat, context=torch.cat(feats, dim=1), pos_embed_context=pos + level_embed)
        lat = d.prompt_camera(lat, context=rembs[0])
        out_feats = []
        shapes = (gh, gw)
        for i, layers in enumerate(d.process_layers):
            for blk in layers:
                lat = blk(lat, pos_embed=rembs[i])
            grid = (lat + rembs[i]).view(b, *shapes, -1).permute(0, 3, 1, 2)
            lat = d.ups[i](grid)
            shapes = (shapes[0] * 2, shapes[1] * 2)
            out_feats.append(lat.view(b, *shapes, -1))
        depths_out, confs = [], []
        for i, (layer, feat) in enumerate(zip(d.depth_mlp[::-1], out_feats[::-1])):
            o = layer(feat).permute(0, 3, 1, 2)
            depths_out.append(F.interpolate(o, size=(H, W), mode="bilinear", align_corners=False))
        for i, (layer, feat) in enumerate(zip(d.confidence_mlp[::-1], out_feats[::-1])):
            o = layer(feat).permute(0, 3, 1, 2)
            confs.append(F.interpolate(o, size=(H, W), mode="bilinear", align_corners=False))
        logdepth = d.to_depth(torch.cat(depths_out, dim=1))
        confidence = torch.sigmoid(d.to_confidence(torch.cat(confs, dim=1)))
        shp = [int(s) for s in logdepth.shape[-2:]]
        depth_n = F.layer_norm(logdepth, shp).exp()
        depth = F.softplus((depth_n + shift) * scale, beta=10.0)
        return K, depth, confidence


# ---------------------------------------------------------------------------
# ConvNeXt mirror (timm-style names)
# ---------------------------------------------------------------------------


class MirrorConvNeXt(nn.Module):
    def __init__(self, depths=(1, 1, 2, 1), dims=(16, 32, 64, 128)):
        super().__init__()
        self.depths, self.dims = depths, dims
        self.stem = nn.Sequential(
            nn.Conv2d(3, dims[0], 4, stride=4), nn.LayerNorm(dims[0], eps=1e-6)
        )
        self.stages = nn.ModuleList()
        for s, (dep, dim) in enumerate(zip(depths, dims)):
            stage = nn.Module()
            if s > 0:
                stage.downsample = nn.Sequential(
                    nn.LayerNorm(dims[s - 1], eps=1e-6),
                    nn.Conv2d(dims[s - 1], dim, 2, stride=2),
                )
            blocks = nn.ModuleList()
            for _ in range(dep):
                blk = nn.Module()
                blk.conv_dw = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
                blk.norm = nn.LayerNorm(dim, eps=1e-6)
                blk.mlp = nn.Module()
                blk.mlp.fc1 = nn.Linear(dim, 4 * dim)
                blk.mlp.fc2 = nn.Linear(4 * dim, dim)
                blk.gamma = nn.Parameter(1e-6 * torch.ones(dim))
                blocks.append(blk)
            stage.blocks = blocks
            self.stages.append(stage)

    def forward(self, x):
        x = self.stem[0](x)
        x = self.stem[1](x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
        feats, tokens = [], []
        for s, stage in enumerate(self.stages):
            if s > 0:
                y = stage.downsample[0](x.permute(0, 2, 3, 1)).permute(0, 3, 1, 2)
                x = stage.downsample[1](y)
            for blk in stage.blocks:
                inp = x
                y = blk.conv_dw(x).permute(0, 2, 3, 1)
                y = blk.norm(y)
                y = blk.mlp.fc2(F.gelu(blk.mlp.fc1(y))) * blk.gamma
                x = inp + y.permute(0, 3, 1, 2)
            feats.append(x.permute(0, 2, 3, 1))
            tokens.append(x.mean(dim=(2, 3))[:, None, :])
        return feats, tokens
