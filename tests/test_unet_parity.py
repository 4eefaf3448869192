"""DiffusionUNet numeric parity vs an independent torch mirror.

Covers the timestep embedding, time-conditioned ResBlocks, the spatial
transformer (self-attention + cross-attention + GEGLU FF, pre-LayerNorm),
stride-2 downsampling, skip concatenation, and nearest upsampling — loaded
directly from the Flax parameter tree.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from pti_ldm_vae_tpu.models.unet import DiffusionUNet

CFG = dict(
    in_channels=2, out_channels=2, channels=(8, 16),
    attention_levels=(False, True), num_head_channels=(0, 8),
    num_res_blocks=1, with_conditioning=True, cross_attention_dim=12,
    norm_num_groups=4,
)
EPS = 1e-6


def _t(arr):
    return torch.from_numpy(np.ascontiguousarray(np.asarray(arr)))


def _conv(tree):
    conv = nn.Conv2d(tree["kernel"].shape[2], tree["kernel"].shape[3],
                     tree["kernel"].shape[0],
                     padding=(tree["kernel"].shape[0] - 1) // 2)
    conv.weight.data = _t(np.transpose(tree["kernel"], (3, 2, 0, 1)))
    conv.bias.data = _t(tree["bias"])
    return conv


def _linear(tree, bias=True):
    lin = nn.Linear(tree["kernel"].shape[0], tree["kernel"].shape[1], bias=bias)
    lin.weight.data = _t(np.asarray(tree["kernel"]).T)
    if bias:
        lin.bias.data = _t(tree["bias"])
    return lin


def _gn(scale, bias, groups):
    gn = nn.GroupNorm(groups, scale.shape[0], eps=EPS)
    gn.weight.data = _t(scale)
    gn.bias.data = _t(bias)
    return gn


class TorchTimeRes(nn.Module):
    def __init__(self, p, groups):
        super().__init__()
        self.norm1 = _gn(p["norm1_scale"], p["norm1_bias"], groups)
        self.conv1 = _conv(p["conv1"])
        self.time_proj = _linear(p["time_emb_proj"])
        self.norm2 = _gn(p["norm2_scale"], p["norm2_bias"], groups)
        self.conv2 = _conv(p["conv2"])
        self.skip = _conv(p["skip"]) if "skip" in p else None

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        return (self.skip(x) if self.skip is not None else x) + h


class TorchTransformer(nn.Module):
    def __init__(self, p, groups, heads):
        super().__init__()
        self.heads = heads
        self.norm = _gn(p["norm_scale"], p["norm_bias"], groups)
        self.proj_in = _conv(p["proj_in"])
        blk = p["block"]
        self.ln1 = nn.LayerNorm(self.proj_in.weight.shape[0], eps=1e-6)
        self.ln1.weight.data = _t(blk["norm1"]["scale"])
        self.ln1.bias.data = _t(blk["norm1"]["bias"])
        self.q1 = _linear(blk["attn1_q"], bias=False)
        self.k1 = _linear(blk["attn1_k"], bias=False)
        self.v1 = _linear(blk["attn1_v"], bias=False)
        self.o1 = _linear(blk["attn1_out"])
        self.ln2 = nn.LayerNorm(self.proj_in.weight.shape[0], eps=1e-6)
        self.ln2.weight.data = _t(blk["norm2"]["scale"])
        self.ln2.bias.data = _t(blk["norm2"]["bias"])
        self.q2 = _linear(blk["attn2_q"], bias=False)
        self.k2 = _linear(blk["attn2_k"], bias=False)
        self.v2 = _linear(blk["attn2_v"], bias=False)
        self.o2 = _linear(blk["attn2_out"])
        self.ln3 = nn.LayerNorm(self.proj_in.weight.shape[0], eps=1e-6)
        self.ln3.weight.data = _t(blk["norm3"]["scale"])
        self.ln3.bias.data = _t(blk["norm3"]["bias"])
        self.ff_in = _linear(blk["ff_in"])
        self.ff_out = _linear(blk["ff_out"])
        self.proj_out = _conv(p["proj_out"])

    def _mha(self, q, k, v):
        b, sq, c = q.shape
        sk = k.shape[1]
        hd = c // self.heads
        qh = q.view(b, sq, self.heads, hd).transpose(1, 2)
        kh = k.view(b, sk, self.heads, hd).transpose(1, 2)
        vh = v.view(b, sk, self.heads, hd).transpose(1, 2)
        attn = torch.softmax(qh @ kh.transpose(-1, -2) / math.sqrt(hd), dim=-1) @ vh
        return attn.transpose(1, 2).reshape(b, sq, c)

    def forward(self, x, ctx):
        b, c, h, w = x.shape
        hidden = self.proj_in(self.norm(x)).permute(0, 2, 3, 1).reshape(b, h * w, c)
        t = self.ln1(hidden)
        hidden = hidden + self.o1(self._mha(self.q1(t), self.k1(t), self.v1(t)))
        t = self.ln2(hidden)
        hidden = hidden + self.o2(self._mha(self.q2(t), self.k2(ctx), self.v2(ctx)))
        t = self.ln3(hidden)
        gate = self.ff_in(t)
        a, g = gate.chunk(2, dim=-1)
        hidden = hidden + self.ff_out(a * F.gelu(g))
        hidden = hidden.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return x + self.proj_out(hidden)


def _timestep_embedding_torch(t, dim):
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half)
    args = t.float()[:, None] * freqs[None, :]
    return torch.cat([torch.sin(args), torch.cos(args)], dim=-1)


class TorchUNetMirror(nn.Module):
    def __init__(self, p, cfg):
        super().__init__()
        groups = cfg["norm_num_groups"]
        ch = cfg["channels"]
        self.cfg = cfg
        self.time1 = _linear(p["time_mlp_1"])
        self.time2 = _linear(p["time_mlp_2"])
        self.conv_in = _conv(p["conv_in"])
        self.down_res = nn.ModuleList()
        self.down_attn = nn.ModuleDict()
        self.downsamples = nn.ModuleDict()
        for lvl in range(len(ch)):
            for blk in range(cfg["num_res_blocks"]):
                self.down_res.append(TorchTimeRes(p[f"down_{lvl}_res_{blk}"], groups))
                if cfg["attention_levels"][lvl]:
                    heads = max(1, ch[lvl] // cfg["num_head_channels"][lvl]) if cfg["num_head_channels"][lvl] else 1
                    self.down_attn[f"{lvl}_{blk}"] = TorchTransformer(
                        p[f"down_{lvl}_attn_{blk}"], groups, heads)
            if lvl != len(ch) - 1:
                down = _conv(p[f"down_{lvl}_downsample"])
                down.stride = (2, 2)
                self.downsamples[str(lvl)] = down
        self.mid1 = TorchTimeRes(p["mid_res_1"], groups)
        heads_mid = max(1, ch[-1] // cfg["num_head_channels"][-1]) if cfg["num_head_channels"][-1] else 1
        self.mid_attn = TorchTransformer(p["mid_attn"], groups, heads_mid)
        self.mid2 = TorchTimeRes(p["mid_res_2"], groups)
        self.up_res = nn.ModuleDict()
        self.up_attn = nn.ModuleDict()
        self.upsamples = nn.ModuleDict()
        for lvl in reversed(range(len(ch))):
            for blk in range(cfg["num_res_blocks"] + 1):
                self.up_res[f"{lvl}_{blk}"] = TorchTimeRes(p[f"up_{lvl}_res_{blk}"], groups)
                if cfg["attention_levels"][lvl]:
                    heads = max(1, ch[lvl] // cfg["num_head_channels"][lvl]) if cfg["num_head_channels"][lvl] else 1
                    self.up_attn[f"{lvl}_{blk}"] = TorchTransformer(
                        p[f"up_{lvl}_attn_{blk}"], groups, heads)
            if lvl != 0:
                self.upsamples[str(lvl)] = _conv(p[f"up_{lvl}_upsample"])
        self.norm_out = _gn(p["norm_out_scale"], p["norm_out_bias"], groups)
        self.conv_out = _conv(p["conv_out"])

    def forward(self, x, t, ctx):
        cfg = self.cfg
        ch = cfg["channels"]
        temb = self.time2(F.silu(self.time1(_timestep_embedding_torch(t, ch[0]))))
        h = self.conv_in(x)
        skips = [h]
        res_iter = iter(self.down_res)
        for lvl in range(len(ch)):
            for blk in range(cfg["num_res_blocks"]):
                h = next(res_iter)(h, temb)
                if cfg["attention_levels"][lvl]:
                    h = self.down_attn[f"{lvl}_{blk}"](h, ctx)
                skips.append(h)
            if lvl != len(ch) - 1:
                h = F.conv2d(h, self.downsamples[str(lvl)].weight,
                             self.downsamples[str(lvl)].bias, stride=2, padding=1)
                skips.append(h)
        h = self.mid2(self.mid_attn(self.mid1(h, temb), ctx), temb)
        for lvl in reversed(range(len(ch))):
            for blk in range(cfg["num_res_blocks"] + 1):
                h = torch.cat([h, skips.pop()], dim=1)
                h = self.up_res[f"{lvl}_{blk}"](h, temb)
                if cfg["attention_levels"][lvl]:
                    h = self.up_attn[f"{lvl}_{blk}"](h, ctx)
            if lvl != 0:
                h = F.interpolate(h, scale_factor=2, mode="nearest")
                h = self.upsamples[str(lvl)](h)
        return self.conv_out(F.silu(self.norm_out(h)))


def test_unet_parity():
    unet = DiffusionUNet(**CFG)
    x = np.random.default_rng(0).normal(size=(2, 8, 8, 2)).astype(np.float32)
    t = np.array([7, 423], dtype=np.int32)
    ctx = np.random.default_rng(1).normal(size=(2, 5, 12)).astype(np.float32)
    variables = unet.init(jax.random.key(0), jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx))

    out_j = unet.apply(variables, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx))

    mirror = TorchUNetMirror(
        jax.tree.map(np.asarray, variables["params"]),
        dict(CFG, channels=list(CFG["channels"])),
    ).eval()
    with torch.no_grad():
        out_t = mirror(
            torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(t),
            torch.from_numpy(ctx),
        )
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-4
    )


@pytest.mark.slow
def test_unet_parity_flagship_depth():
    """Mirror parity at the production LDM architecture
    (config/ldm_dente.json diffusion_def: 4 levels [32,64,128,256],
    attention at levels 1-3 with 32 head channels, num_res_blocks=2,
    cross_attention_dim=512) — the depth-4/skip-concat/attention-stack
    composition surface the toy CFG cannot reach. 16² latent input keeps
    the test CPU-cheap while still exercising all three down/upsamples."""
    cfg = dict(
        in_channels=4, out_channels=4, channels=(32, 64, 128, 256),
        attention_levels=(False, True, True, True),
        num_head_channels=(0, 32, 32, 32),
        num_res_blocks=2, with_conditioning=True, cross_attention_dim=512,
        norm_num_groups=32,
    )
    unet = DiffusionUNet(**cfg)
    x = np.random.default_rng(20).normal(size=(2, 16, 16, 4)).astype(np.float32)
    t = np.array([3, 887], dtype=np.int32)
    ctx = np.random.default_rng(21).normal(size=(2, 6, 512)).astype(np.float32)
    variables = unet.init(jax.random.key(9), jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx))

    out_j = unet.apply(variables, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx))

    mirror = TorchUNetMirror(
        jax.tree.map(np.asarray, variables["params"]),
        dict(cfg, channels=list(cfg["channels"])),
    ).eval()
    with torch.no_grad():
        out_t = mirror(
            torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(t),
            torch.from_numpy(ctx),
        )
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-4
    )
