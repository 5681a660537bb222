"""Hand-written torch twins of the diffusers UNet2D(Condition)Model and
AutoencoderKL architectures, used as independent parity oracles.

These mirror the architectures the reference trains (reference:
scripts/train_unet.py:115-159, config/ldm_autoencoder_kl.yaml:18-28) in
plain NCHW torch, with module names chosen so ``state_dict()`` emits the
exact diffusers checkpoint key layout (down_blocks.N.resnets.M.norm1.weight,
...attentions.M.to_out.0.weight, transformer_blocks.0.ff.net.0.proj, ...).
Feeding that state dict through utils/torch_import.convert_unet/convert_vae
and comparing forward outputs validates every layout rule — conv/dense
transposes, attention head partitioning (incl. the diffusers 0.12-0.24
cross-attention head-dim-means-num-heads quirk), GEGLU split order, skip
concat ordering — end to end (VERDICT r1 missing #3; SURVEY.md §7 stage 3).
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding(t, dim, flip_sin_to_cos=True, freq_shift=0.0):
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / (half - freq_shift)
    emb = t.float()[:, None] * torch.exp(exponent)[None, :]
    sin, cos = torch.sin(emb), torch.cos(emb)
    return torch.cat([cos, sin] if flip_sin_to_cos else [sin, cos], dim=-1)


class ResnetBlock(nn.Module):
    def __init__(self, cin, cout, temb_dim=None, groups=32, eps=1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=eps)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        if temb_dim is not None:
            self.time_emb_proj = nn.Linear(temb_dim, cout)
        self.norm2 = nn.GroupNorm(groups, cout, eps=eps)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class SelfAttention(nn.Module):
    """diffusers Attention as used by Attn{Down,Up}Block2D / UNet mid block:
    heads = channels // head_dim."""

    def __init__(self, channels, head_dim=8, groups=32, eps=1e-5):
        super().__init__()
        self.heads = max(channels // head_dim, 1)
        self.group_norm = nn.GroupNorm(groups, channels, eps=eps)
        self.to_q = nn.Linear(channels, channels)
        self.to_k = nn.Linear(channels, channels)
        self.to_v = nn.Linear(channels, channels)
        self.to_out = nn.ModuleList([nn.Linear(channels, channels)])

    def forward(self, x):
        b, c, h, w = x.shape
        res = x
        y = self.group_norm(x).reshape(b, c, h * w).transpose(1, 2)  # (B, N, C)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        q = q.reshape(b, -1, self.heads, c // self.heads).transpose(1, 2)
        k = k.reshape(b, -1, self.heads, c // self.heads).transpose(1, 2)
        v = v.reshape(b, -1, self.heads, c // self.heads).transpose(1, 2)
        o = F.scaled_dot_product_attention(q, k, v)
        o = o.transpose(1, 2).reshape(b, -1, c)
        o = self.to_out[0](o)
        return o.transpose(1, 2).reshape(b, c, h, w) + res


class CrossAttention(nn.Module):
    def __init__(self, query_dim, context_dim, heads, head_dim):
        super().__init__()
        inner = heads * head_dim
        self.heads, self.head_dim = heads, head_dim
        self.to_q = nn.Linear(query_dim, inner, bias=False)
        self.to_k = nn.Linear(context_dim, inner, bias=False)
        self.to_v = nn.Linear(context_dim, inner, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(inner, query_dim)])

    def forward(self, x, context=None):
        context = x if context is None else context
        b, n, _ = x.shape
        q = self.to_q(x).reshape(b, n, self.heads, self.head_dim).transpose(1, 2)
        k = self.to_k(context).reshape(b, -1, self.heads, self.head_dim).transpose(1, 2)
        v = self.to_v(context).reshape(b, -1, self.heads, self.head_dim).transpose(1, 2)
        o = F.scaled_dot_product_attention(q, k, v)
        return self.to_out[0](o.transpose(1, 2).reshape(b, n, self.heads * self.head_dim))


class GEGLU(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * F.gelu(gate)  # exact (erf) gelu, diffusers GEGLU default


class TransformerBlock(nn.Module):
    def __init__(self, dim, context_dim, heads, head_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn1 = CrossAttention(dim, dim, heads, head_dim)
        self.norm2 = nn.LayerNorm(dim)
        self.attn2 = CrossAttention(dim, context_dim, heads, head_dim)
        self.norm3 = nn.LayerNorm(dim)
        inner = dim * 4
        self.ff = nn.ModuleDict({"net": nn.ModuleList([GEGLU(dim, inner), nn.Identity(), nn.Linear(inner, dim)])})

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        x = x + self.ff["net"][2](self.ff["net"][0](self.norm3(x)))
        return x


class Transformer2D(nn.Module):
    """diffusers Transformer2DModel, 1 block, linear projections. Heads follow
    the 0.12-0.24 UNet2DConditionModel quirk: attention_head_dim is the NUMBER
    of heads (head dim = channels // heads)."""

    def __init__(self, channels, context_dim, num_heads, groups=32):
        super().__init__()
        head_dim = max(channels // num_heads, 1)
        self.norm = nn.GroupNorm(groups, channels, eps=1e-6)
        self.proj_in = nn.Linear(channels, channels)
        self.transformer_blocks = nn.ModuleList([TransformerBlock(channels, context_dim, num_heads, head_dim)])
        self.proj_out = nn.Linear(channels, channels)

    def forward(self, x, context):
        b, c, h, w = x.shape
        res = x
        y = self.norm(x).reshape(b, c, h * w).transpose(1, 2)
        y = self.proj_in(y)
        y = self.transformer_blocks[0](y, context)
        y = self.proj_out(y)
        return y.transpose(1, 2).reshape(b, c, h, w) + res


class TorchUNet2D(nn.Module):
    """Twin of audio_diffusion_tpu.models.UNet2D built straight from its
    UNetConfig; state_dict() keys match the diffusers checkpoint layout."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        ch0 = cfg.block_out_channels[0]
        temb_dim = ch0 * 4
        self.time_embedding = nn.ModuleDict(
            {"linear_1": nn.Linear(ch0, temb_dim), "linear_2": nn.Linear(temb_dim, temb_dim)}
        )
        self.conv_in = nn.Conv2d(cfg.in_channels, ch0, 3, padding=1)

        g, eps = cfg.norm_num_groups, cfg.norm_eps
        n = len(cfg.block_out_channels)
        self.down_blocks = nn.ModuleList()
        ch = ch0
        for i, bt in enumerate(cfg.down_block_types):
            out_ch = cfg.block_out_channels[i]
            blk = nn.ModuleDict({"resnets": nn.ModuleList(), "attentions": nn.ModuleList()})
            for _ in range(cfg.layers_per_block):
                blk["resnets"].append(ResnetBlock(ch, out_ch, temb_dim, g, eps))
                ch = out_ch
                if bt == "AttnDownBlock2D":
                    blk["attentions"].append(SelfAttention(out_ch, cfg.attention_head_dim, g, eps))
                elif bt == "CrossAttnDownBlock2D":
                    blk["attentions"].append(
                        Transformer2D(out_ch, cfg.cross_attention_dim, cfg.attention_head_dim, g)
                    )
            if i != n - 1:
                blk["downsamplers"] = nn.ModuleList(
                    [nn.ModuleDict({"conv": nn.Conv2d(out_ch, out_ch, 3, stride=2, padding=1)})]
                )
            self.down_blocks.append(blk)

        mid_ch = cfg.block_out_channels[-1]
        mid_attn = (
            Transformer2D(mid_ch, cfg.cross_attention_dim, cfg.attention_head_dim, g)
            if cfg.is_conditional
            else SelfAttention(mid_ch, cfg.attention_head_dim, g, eps)
        )
        self.mid_block = nn.ModuleDict({
            "resnets": nn.ModuleList([ResnetBlock(mid_ch, mid_ch, temb_dim, g, eps),
                                      ResnetBlock(mid_ch, mid_ch, temb_dim, g, eps)]),
            "attentions": nn.ModuleList([mid_attn]),
        })

        # Skip channel bookkeeping mirrors the flax model: skips are
        # [conv_in] + per-layer outputs + downsample outputs.
        skip_channels = [ch0]
        ch = ch0
        for i, bt in enumerate(cfg.down_block_types):
            out_ch = cfg.block_out_channels[i]
            for _ in range(cfg.layers_per_block):
                skip_channels.append(out_ch)
            ch = out_ch
            if i != n - 1:
                skip_channels.append(out_ch)

        self.up_blocks = nn.ModuleList()
        reversed_ch = tuple(reversed(cfg.block_out_channels))
        ch = mid_ch
        for i, bt in enumerate(cfg.up_block_types):
            out_ch = reversed_ch[i]
            blk = nn.ModuleDict({"resnets": nn.ModuleList(), "attentions": nn.ModuleList()})
            for _ in range(cfg.layers_per_block + 1):
                skip = skip_channels.pop()
                blk["resnets"].append(ResnetBlock(ch + skip, out_ch, temb_dim, g, eps))
                ch = out_ch
                if bt == "AttnUpBlock2D":
                    blk["attentions"].append(SelfAttention(out_ch, cfg.attention_head_dim, g, eps))
                elif bt == "CrossAttnUpBlock2D":
                    blk["attentions"].append(
                        Transformer2D(out_ch, cfg.cross_attention_dim, cfg.attention_head_dim, g)
                    )
            if i != n - 1:
                blk["upsamplers"] = nn.ModuleList(
                    [nn.ModuleDict({"conv": nn.Conv2d(out_ch, out_ch, 3, padding=1)})]
                )
            self.up_blocks.append(blk)

        self.conv_norm_out = nn.GroupNorm(g, cfg.block_out_channels[0], eps=eps)
        self.conv_out = nn.Conv2d(cfg.block_out_channels[0], cfg.out_channels, 3, padding=1)

    def forward(self, sample, timesteps, encoder_hidden_states=None):
        cfg = self.cfg
        temb = timestep_embedding(timesteps, cfg.block_out_channels[0], cfg.flip_sin_to_cos, cfg.freq_shift)
        temb = self.time_embedding["linear_2"](F.silu(self.time_embedding["linear_1"](temb)))

        x = self.conv_in(sample)
        skips = [x]
        n = len(cfg.block_out_channels)
        for i, (bt, blk) in enumerate(zip(cfg.down_block_types, self.down_blocks)):
            for j, res in enumerate(blk["resnets"]):
                x = res(x, temb)
                if bt == "AttnDownBlock2D":
                    x = blk["attentions"][j](x)
                elif bt == "CrossAttnDownBlock2D":
                    x = blk["attentions"][j](x, encoder_hidden_states)
                skips.append(x)
            if i != n - 1:
                x = blk["downsamplers"][0]["conv"](x)
                skips.append(x)

        x = self.mid_block["resnets"][0](x, temb)
        if cfg.is_conditional:
            x = self.mid_block["attentions"][0](x, encoder_hidden_states)
        else:
            x = self.mid_block["attentions"][0](x)
        x = self.mid_block["resnets"][1](x, temb)

        for i, (bt, blk) in enumerate(zip(cfg.up_block_types, self.up_blocks)):
            for j, res in enumerate(blk["resnets"]):
                x = torch.cat([x, skips.pop()], dim=1)
                x = res(x, temb)
                if bt == "AttnUpBlock2D":
                    x = blk["attentions"][j](x)
                elif bt == "CrossAttnUpBlock2D":
                    x = blk["attentions"][j](x, encoder_hidden_states)
            if i != n - 1:
                x = F.interpolate(x, scale_factor=2, mode="nearest")
                x = blk["upsamplers"][0]["conv"](x)

        return self.conv_out(F.silu(self.conv_norm_out(x)))


# ----------------------------------------------------------------------- VAE

class VAEResnet(nn.Module):
    def __init__(self, cin, cout, groups=32):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=1e-6)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = nn.GroupNorm(groups, cout, eps=1e-6)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head mid-block attention."""

    def __init__(self, channels, groups=32):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, channels, eps=1e-6)
        self.to_q = nn.Linear(channels, channels)
        self.to_k = nn.Linear(channels, channels)
        self.to_v = nn.Linear(channels, channels)
        self.to_out = nn.ModuleList([nn.Linear(channels, channels)])

    def forward(self, x):
        b, c, h, w = x.shape
        res = x
        y = self.group_norm(x).reshape(b, c, h * w).transpose(1, 2)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        o = F.scaled_dot_product_attention(q[:, None], k[:, None], v[:, None])[:, 0]
        o = self.to_out[0](o)
        return o.transpose(1, 2).reshape(b, c, h, w) + res


class TorchAutoencoderKL(nn.Module):
    """Twin of audio_diffusion_tpu.models.vae.AutoencoderKL from its VAEConfig;
    state_dict() keys match the diffusers AutoencoderKL layout, including the
    LDM asymmetric ((0,1),(0,1)) downsample padding."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        g = cfg.norm_num_groups
        chs = cfg.block_out_channels
        n = len(chs)

        enc_down = nn.ModuleList()
        ch = chs[0]
        for i, out_ch in enumerate(chs):
            blk = nn.ModuleDict({"resnets": nn.ModuleList()})
            for _ in range(cfg.layers_per_block):
                blk["resnets"].append(VAEResnet(ch, out_ch, g))
                ch = out_ch
            if i != n - 1:
                blk["downsamplers"] = nn.ModuleList(
                    [nn.ModuleDict({"conv": nn.Conv2d(out_ch, out_ch, 3, stride=2, padding=0)})]
                )
            enc_down.append(blk)
        self.encoder = nn.ModuleDict({
            "conv_in": nn.Conv2d(cfg.in_channels, chs[0], 3, padding=1),
            "down_blocks": enc_down,
            "mid_block": nn.ModuleDict({
                "resnets": nn.ModuleList([VAEResnet(chs[-1], chs[-1], g), VAEResnet(chs[-1], chs[-1], g)]),
                "attentions": nn.ModuleList([VAEAttention(chs[-1], g)]),
            }),
            "conv_norm_out": nn.GroupNorm(g, chs[-1], eps=1e-6),
            "conv_out": nn.Conv2d(chs[-1], 2 * cfg.latent_channels, 3, padding=1),
        })

        rev = tuple(reversed(chs))
        dec_up = nn.ModuleList()
        ch = rev[0]
        for i, out_ch in enumerate(rev):
            blk = nn.ModuleDict({"resnets": nn.ModuleList()})
            for _ in range(cfg.layers_per_block + 1):
                blk["resnets"].append(VAEResnet(ch, out_ch, g))
                ch = out_ch
            if i != n - 1:
                blk["upsamplers"] = nn.ModuleList(
                    [nn.ModuleDict({"conv": nn.Conv2d(out_ch, out_ch, 3, padding=1)})]
                )
            dec_up.append(blk)
        self.decoder = nn.ModuleDict({
            "conv_in": nn.Conv2d(cfg.latent_channels, rev[0], 3, padding=1),
            "mid_block": nn.ModuleDict({
                "resnets": nn.ModuleList([VAEResnet(rev[0], rev[0], g), VAEResnet(rev[0], rev[0], g)]),
                "attentions": nn.ModuleList([VAEAttention(rev[0], g)]),
            }),
            "up_blocks": dec_up,
            "conv_norm_out": nn.GroupNorm(g, rev[-1], eps=1e-6),
            "conv_out": nn.Conv2d(rev[-1], cfg.out_channels, 3, padding=1),
        })
        self.quant_conv = nn.Conv2d(2 * cfg.latent_channels, 2 * cfg.latent_channels, 1)
        self.post_quant_conv = nn.Conv2d(cfg.latent_channels, cfg.latent_channels, 1)

    def encode_moments(self, x):
        e = self.encoder
        n = len(self.cfg.block_out_channels)
        x = e["conv_in"](x)
        for i, blk in enumerate(e["down_blocks"]):
            for res in blk["resnets"]:
                x = res(x)
            if i != n - 1:
                x = F.pad(x, (0, 1, 0, 1))  # LDM asymmetric pad (W right, H bottom)
                x = blk["downsamplers"][0]["conv"](x)
        x = e["mid_block"]["resnets"][0](x)
        x = e["mid_block"]["attentions"][0](x)
        x = e["mid_block"]["resnets"][1](x)
        x = e["conv_out"](F.silu(e["conv_norm_out"](x)))
        return self.quant_conv(x)

    def decode(self, z):
        d = self.decoder
        n = len(self.cfg.block_out_channels)
        x = d["conv_in"](self.post_quant_conv(z))
        x = d["mid_block"]["resnets"][0](x)
        x = d["mid_block"]["attentions"][0](x)
        x = d["mid_block"]["resnets"][1](x)
        for i, blk in enumerate(d["up_blocks"]):
            for res in blk["resnets"]:
                x = res(x)
            if i != n - 1:
                x = F.interpolate(x, scale_factor=2, mode="nearest")
                x = blk["upsamplers"][0]["conv"](x)
        return d["conv_out"](F.silu(d["conv_norm_out"](x)))
