"""Torch test oracle for DuoFormer parity tests.

An independent PyTorch implementation of the reference's math, built from
torch.nn primitives only (this environment has no timm/torchvision). It
serves as the parity ground truth standing in for the reference stack:
module/parameter names deliberately match the reference checkpoint layout
(resnet_projector.*, projection.proj_heads{N}, vision_transformer.*) so
`utils/torch_convert.py` consumes its state_dict exactly as it would a real
reference checkpoint.

Behavioral contract being tested (with reference cites):
  * ResNet v1.5 bottleneck/basic trunks tapped at 4 stages
    (resnet50ssl.py:30-45, model_wo_extra_params.py:214-224)
  * 1x1 stage projections (projection_head.py:11-149)
  * channel-token fusion path (projection_head.py:152-268)
  * region regroup incl. the column-major 2x2 quirk Q8 (model.py:106-211)
  * MultiscaleFormer: 12 ScaleBlocks + chained PatchBlocks, fc_norm
    discarded Q7 (scale_attention.py:239-344)
  * MultiscaleTransformer: 2*dim**-0.5 scale Q12, block-11-only region
    pass Q4, squeeze Q13 (multi_vision_transformer.py:114-171,
    multiscale_attn.py:135-304)
"""


import torch
from torch import nn


# ---------------------------------------------------------------------------
# ResNet trunk (torchvision-v1.5-equivalent, written from torch.nn)
# ---------------------------------------------------------------------------

class OracleBottleneck(nn.Module):
    def __init__(self, cin, width, cout, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, width, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(width)
        self.conv2 = nn.Conv2d(width, width, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(width)
        self.conv3 = nn.Conv2d(width, cout, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU()
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                nn.BatchNorm2d(cout))
        else:
            self.downsample = None

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idn)


class OracleBasicBlock(nn.Module):
    def __init__(self, cin, cout, stride):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride=stride, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU()
        if stride != 1 or cin != cout:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, cout, 1, stride=stride, bias=False),
                nn.BatchNorm2d(cout))
        else:
            self.downsample = None

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + idn)


class OracleResNetTrunk(nn.Module):
    """Returns the 4-stage pyramid as a dict {"0".."3"}."""

    def __init__(self, depth=50):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        if depth == 50:
            blocks, make, widths, exp = [3, 4, 6, 3], OracleBottleneck, [64, 128, 256, 512], 4
        else:
            blocks, make, widths, exp = [2, 2, 2, 2], OracleBasicBlock, [64, 128, 256, 512], 1
        cin = 64
        for si in range(4):
            layer = []
            for bi in range(blocks[si]):
                stride = 2 if (si > 0 and bi == 0) else 1
                cout = widths[si] * exp
                if make is OracleBottleneck:
                    layer.append(make(cin, widths[si], cout, stride))
                else:
                    layer.append(make(cin, cout, stride))
                cin = cout
            setattr(self, f"layer{si + 1}", nn.Sequential(*layer))
        # randomize BN stats so inference-mode parity is non-trivial
        for m in self.modules():
            if isinstance(m, nn.BatchNorm2d):
                with torch.no_grad():
                    m.running_mean.normal_(0, 0.1)
                    m.running_var.uniform_(0.5, 1.5)

    def forward(self, x):
        y = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        feats = {}
        for si in range(4):
            y = getattr(self, f"layer{si + 1}")(y)
            feats[str(si)] = y
        return feats


# ---------------------------------------------------------------------------
# Projections / channel token
# ---------------------------------------------------------------------------

STAGE_CH = {50: {"0": 256, "1": 512, "2": 1024, "3": 2048},
            18: {"0": 64, "1": 128, "2": 256, "3": 512}}


class OracleProjection(nn.Module):
    def __init__(self, stages, proj_dim, depth=50):
        super().__init__()
        self.stages = stages
        for s in stages:
            setattr(self, f"proj_heads{s}",
                    nn.Conv2d(STAGE_CH[depth][s], proj_dim, 1))

    def forward(self, feats):
        return {s: getattr(self, f"proj_heads{s}")(feats[s]) for s in self.stages}


class _ConvBN(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm = nn.BatchNorm2d(cout)
        self.activation = nn.ReLU()
        with torch.no_grad():
            self.norm.running_mean.normal_(0, 0.1)
            self.norm.running_var.uniform_(0.5, 1.5)

    def forward(self, x):
        return self.activation(self.norm(self.conv(x)))


class OracleChannelProj1(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv1 = nn.Conv2d(ch, ch, 3, stride=2, padding=1)
        self.conv2 = nn.Conv2d(ch, ch, 3, stride=2, padding=1)
        self.pool = nn.MaxPool2d(2, 2)

    def forward(self, x):
        return self.pool(self.conv2(self.conv1(x)))


class OracleChannelProj2(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv1 = nn.Conv2d(ch, ch, 3, stride=2, padding=1)
        self.pool = nn.MaxPool2d(2, 2)

    def forward(self, x):
        return self.pool(self.conv1(x))


class OracleChannelProjAll(nn.Module):
    def __init__(self, cin, proj_dim):
        super().__init__()
        self.nConvs = nn.Sequential(
            _ConvBN(cin, proj_dim), _ConvBN(proj_dim, proj_dim),
            _ConvBN(proj_dim, proj_dim), _ConvBN(proj_dim, proj_dim))

    def forward(self, x):
        return torch.flatten(self.nConvs(x), start_dim=2)   # [B, C, 49]


# ---------------------------------------------------------------------------
# Attention / blocks (reference math, torch.nn only)
# ---------------------------------------------------------------------------

class OracleAttention(nn.Module):
    """qk_norm: CREATE per-head q/k LayerNorms (the Q9 positional-arg bug
    creates them whenever attn_drop_rate>0, scale_attention.py:25,178).
    apply_qk_norm: whether forward APPLIES them — True only for the patch
    pass (AttentionForPatch.forward, scale_attention.py:201); the scale
    passes never call them (AttentionForScale.forward, :28-45).
    Randomized init so carried-but-unapplied weights are distinguishable
    from identity in parity tests."""

    def __init__(self, dim, num_heads, scale=None, qk_norm=False,
                 apply_qk_norm=False):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = scale if scale is not None else self.head_dim ** -0.5
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)
        self.apply_qk_norm = apply_qk_norm
        if qk_norm:
            self.q_norm = nn.LayerNorm(self.head_dim, eps=1e-6)
            self.k_norm = nn.LayerNorm(self.head_dim, eps=1e-6)
            with torch.no_grad():
                self.q_norm.weight.normal_(1.0, 0.1)
                self.q_norm.bias.normal_(0.0, 0.1)
                self.k_norm.weight.normal_(1.0, 0.1)
                self.k_norm.bias.normal_(0.0, 0.1)
        else:
            self.q_norm = self.k_norm = None

    def forward(self, x):
        *lead, S, C = x.shape
        h = self.qkv(x).reshape(*lead, S, 3, self.num_heads, self.head_dim)
        h = torch.movedim(h, -3, 0)
        h = torch.movedim(h, -2, -3)          # [3, ..., H, S, D]
        q, k, v = h[0], h[1], h[2]
        if self.q_norm is not None and self.apply_qk_norm:
            q, k = self.q_norm(q), self.k_norm(k)
        attn = ((q @ k.transpose(-2, -1)) * self.scale).softmax(dim=-1)
        out = attn @ v
        out = torch.movedim(out, -3, -2).reshape(*lead, S, C)
        return self.proj(out)


class OracleMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.act = nn.GELU()
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(self.act(self.fc1(x)))


class OracleScaleBlock(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio=4.0, init_values=None,
                 scale=None, eps=1e-6, qk_norm=False):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=eps)
        # Q9: q/k norms created (when attn_drop_rate>0) but NEVER applied
        # in the scale pass
        self.attn = OracleAttention(dim, num_heads, scale, qk_norm=qk_norm,
                                    apply_qk_norm=False)
        self.norm2 = nn.LayerNorm(dim, eps=eps)
        self.mlp = OracleMlp(dim, int(dim * mlp_ratio))
        if init_values is not None:
            self.ls1 = nn.Module()
            self.ls1.gamma = nn.Parameter(torch.full((dim,), init_values))
            self.ls2 = nn.Module()
            self.ls2.gamma = nn.Parameter(torch.full((dim,), init_values))
        else:
            self.ls1 = self.ls2 = None

    def forward(self, x):
        h = self.attn(self.norm1(x))
        x = x + (h * self.ls1.gamma if self.ls1 is not None else h)
        h = self.mlp(self.norm2(x))
        x = x + (h * self.ls2.gamma if self.ls2 is not None else h)
        return x


class OraclePatchBlock(nn.Module):
    """Bare attention, no residual/MLP (scale_attention.py:214-236).
    AttentionForPatch DOES apply q/k norms when present (:201)."""

    def __init__(self, dim, num_heads, qk_norm=False):
        super().__init__()
        self.attn = OracleAttention(dim, num_heads, qk_norm=qk_norm,
                                    apply_qk_norm=True)

    def forward(self, x):
        return self.attn(x)


def region_indices():
    """Independent construction of the regroup tables (incl. Q8)."""
    idx = {}
    r = torch.arange(7).repeat_interleave(7)   # region row
    c = torch.arange(7).repeat(7)              # region col
    idx["3"] = (r * 7 + c).unsqueeze(1)
    # Q8: column-major within the 2x2 block
    cols2 = [(2 * r) * 14 + 2 * c, (2 * r + 1) * 14 + 2 * c,
             (2 * r) * 14 + 2 * c + 1, (2 * r + 1) * 14 + 2 * c + 1]
    idx["2"] = torch.stack(cols2, dim=1)
    idx["1"] = torch.stack(
        [(4 * r + i) * 28 + 4 * c + j for i in range(4) for j in range(4)],
        dim=1)
    idx["0"] = torch.stack(
        [(8 * r + i) * 56 + 8 * c + j for i in range(8) for j in range(8)],
        dim=1)
    return idx


def regroup_tokens(proj_feats, stages):
    """[B,C,H,W] dict -> [B,49,S,C] in reference token order."""
    idx = region_indices()
    parts = []
    for s in stages:
        f = proj_feats[s]
        B, C = f.shape[:2]
        flat = f.reshape(B, C, -1)
        parts.append(flat[:, :, idx[s]])       # [B, C, 49, n]
    x = torch.cat(parts, dim=-1)               # [B, C, 49, S]
    return x.permute(0, 2, 3, 1)               # [B, 49, S, C]


# ---------------------------------------------------------------------------
# Transformer cores
# ---------------------------------------------------------------------------

class OracleMultiscaleFormer(nn.Module):
    def __init__(self, depth, scales, num_heads, embed_dim, num_classes,
                 mlp_ratio=4.0, init_values=None, num_patches=49,
                 qk_norm=False):
        super().__init__()
        S1 = 1 + sum(4 ** i for i in range(scales))
        self.scaleBlocks = nn.Sequential(*[
            OracleScaleBlock(embed_dim, num_heads, mlp_ratio, init_values,
                             qk_norm=qk_norm)
            for _ in range(depth)])
        self.blocks = nn.Sequential(*[
            OraclePatchBlock(embed_dim, num_heads, qk_norm=qk_norm)
            for _ in range(depth)])
        self.pos_embed_for_scale = nn.Parameter(torch.randn(1, 1, S1, embed_dim) * 0.04)
        self.cls_token = nn.Parameter(torch.randn(1, 1, embed_dim) * 0.04)
        self.pos_embed = nn.Parameter(torch.randn(1, num_patches + 1, embed_dim) * 0.04)
        self.fc_norm = nn.LayerNorm(embed_dim, eps=1e-6)
        self.head = nn.Linear(embed_dim, num_classes)

    def forward(self, x):
        x = x + self.pos_embed_for_scale
        for blk in self.scaleBlocks:
            x = blk(x)
        tokens = x[:, :, 0, :]
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        tokens = torch.cat([cls, tokens], dim=1) + self.pos_embed
        for blk in self.blocks:
            tokens = blk(tokens)
        cls = tokens[:, 0, :]
        _ = self.fc_norm(cls)                 # Q7: computed and discarded
        return self.head(cls)


class OracleMultiscaleBlock(nn.Module):
    """Two attention param sets; timm-style names qkv1/proj1 + qkv/proj.

    qk_norm=True adds blocks.{i}.attn.q_norm/k_norm (the Q9 bug: MyModel's
    attn_drop_rate=0.1 lands in timm's qk_norm slot, model.py:94,
    multiscale_attn.py:137) with RANDOMIZED weights; region_pass never
    applies them (forward_with_region computes qkv manually,
    multiscale_attn.py:195-219), so parity holds iff the JAX side carries
    them unapplied too."""

    def __init__(self, dim, num_heads, mlp_ratio=4.0, init_values=1e-5,
                 eps=1e-6, qk_norm=True):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=eps)
        self.attn = nn.Module()
        self.attn.qkv1 = nn.Linear(dim, 3 * dim)
        self.attn.proj1 = nn.Linear(dim, dim)
        self.attn.qkv = nn.Linear(dim, 3 * dim)
        self.attn.proj = nn.Linear(dim, dim)
        if qk_norm:
            head_dim = dim // num_heads
            self.attn.q_norm = nn.LayerNorm(head_dim, eps=eps)
            self.attn.k_norm = nn.LayerNorm(head_dim, eps=eps)
            with torch.no_grad():
                self.attn.q_norm.weight.normal_(1.0, 0.1)
                self.attn.q_norm.bias.normal_(0.0, 0.1)
                self.attn.k_norm.weight.normal_(1.0, 0.1)
                self.attn.k_norm.bias.normal_(0.0, 0.1)
        self.norm2 = nn.LayerNorm(dim, eps=eps)
        self.mlp = OracleMlp(dim, int(dim * mlp_ratio))
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = 2 * dim ** -0.5          # Q12
        if init_values is not None:
            self.ls1 = nn.Module()
            self.ls1.gamma = nn.Parameter(torch.full((dim,), init_values))
            self.ls2 = nn.Module()
            self.ls2.gamma = nn.Parameter(torch.full((dim,), init_values))
        else:
            self.ls1 = self.ls2 = None

    def _mhsa(self, x, qkv, proj):
        *lead, S, C = x.shape
        h = qkv(x).reshape(*lead, S, 3, self.num_heads, self.head_dim)
        h = torch.movedim(h, -3, 0)
        h = torch.movedim(h, -2, -3)
        q, k, v = h[0], h[1], h[2]
        attn = ((q @ k.transpose(-2, -1)) * self.scale).softmax(dim=-1)
        out = attn @ v
        out = torch.movedim(out, -3, -2).reshape(*lead, S, C)
        return proj(out)

    def scale_pass(self, x):
        h = self._mhsa(self.norm1(x), self.attn.qkv1, self.attn.proj1)
        x = x + (h * self.ls1.gamma if self.ls1 is not None else h)
        h = self.mlp(self.norm2(x))
        x = x + (h * self.ls2.gamma if self.ls2 is not None else h)
        return x

    def region_pass(self, tokens):
        return self._mhsa(tokens, self.attn.qkv, self.attn.proj)


class OracleMultiscaleTransformer(nn.Module):
    def __init__(self, depth, scales, num_heads, embed_dim, num_classes,
                 mlp_ratio=4.0, init_values=1e-5, num_patches=49,
                 qk_norm=True):
        super().__init__()
        S1 = 1 + sum(4 ** i for i in range(scales))
        self.blocks = nn.Sequential(*[
            OracleMultiscaleBlock(embed_dim, num_heads, mlp_ratio,
                                  init_values, qk_norm=qk_norm)
            for _ in range(depth)])
        self.pos_embed_for_scale = nn.Parameter(torch.randn(1, 1, S1, embed_dim) * 0.04)
        self.cls_token = nn.Parameter(torch.randn(1, 1, embed_dim) * 0.02)
        self.pos_embed = nn.Parameter(torch.randn(1, num_patches + 1, embed_dim) * 0.02)
        self.norm = nn.LayerNorm(embed_dim, eps=1e-6)
        self.head = nn.Linear(embed_dim, num_classes)

    def forward(self, x):
        x = x + self.pos_embed_for_scale
        for blk in self.blocks:
            x = blk.scale_pass(x)
        tokens = x[:, :, 0, :]
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        tokens = torch.cat([cls, tokens], dim=1) + self.pos_embed
        # Q4: block 0 then each of blocks 1..N-1 on block-0's output;
        # only the last block's CLS survives.
        tokens = self.blocks[0].region_pass(tokens)
        cls_out = tokens[:, 0, :]
        for i in range(1, len(self.blocks)):
            cls_out = self.blocks[i].region_pass(tokens)[:, 0, :]
        cls_out = self.norm(cls_out)
        return self.head(cls_out).squeeze()   # Q13


# ---------------------------------------------------------------------------
# Full models
# ---------------------------------------------------------------------------

class OracleDuoFormer(nn.Module):
    """MyModel_no_extra_params twin (state_dict-compatible keys)."""

    def __init__(self, depth=2, embed_dim=96, num_heads=12, num_classes=2,
                 num_layers=2, proj_dim=96, backbone_depth=50,
                 scale_token="random", mlp_ratio=4.0, init_values=None,
                 qk_norm=False):
        super().__init__()
        self.num_layers = num_layers
        self.scale_token = scale_token
        self.stages = ["3", "2", "1", "0"][:num_layers]
        self.resnet_projector = OracleResNetTrunk(backbone_depth)
        self.projection = OracleProjection(self.stages, proj_dim, backbone_depth)
        if scale_token == "random":
            self.channel_token = nn.Parameter(torch.randn(1, 1, 1, proj_dim) * 0.04)
        else:
            ch = STAGE_CH[backbone_depth]
            self.chann_proj1 = OracleChannelProj1(ch["0"])
            self.chann_proj2 = OracleChannelProj2(ch["1"])
            self.chann_proj_all = OracleChannelProjAll(
                ch["0"] + ch["1"] + ch["2"] + ch["3"], proj_dim)
        self.vision_transformer = OracleMultiscaleFormer(
            depth, num_layers, num_heads, embed_dim, num_classes,
            mlp_ratio, init_values, qk_norm=qk_norm)

    def forward(self, x):
        feats = self.resnet_projector(x)
        B = x.shape[0]
        if self.scale_token == "random":
            token = self.channel_token.expand(B, 49, -1, -1)
        else:
            fused = torch.cat([
                self.chann_proj1(feats["0"]), self.chann_proj2(feats["1"]),
                nn.functional.max_pool2d(feats["2"], 2, 2), feats["3"]], dim=1)
            token = self.chann_proj_all(fused).unsqueeze(-1).permute(0, 2, 3, 1)
        proj = self.projection(feats)
        tokens = regroup_tokens(proj, self.stages)
        tokens = torch.cat([token, tokens], dim=2)
        return self.vision_transformer(tokens)


class OracleHybridModel(nn.Module):
    """HybridModel twin (model.py:344-412): r18 trunk -> 1x1 projection ->
    ViT blocks with patch embed bypassed; timm _pos_embed semantics
    (cls prepended, pos added over CLS+patches)."""

    def __init__(self, num_classes=7, num_blocks=2, proj_dim=96, num_heads=12):
        super().__init__()
        self.resnet_projector = OracleResNetTrunk(18)
        self.projection = nn.Module()
        self.projection.proj_heads = nn.Conv2d(512, proj_dim, 1)
        vt = nn.Module()
        vt.cls_token = nn.Parameter(torch.randn(1, 1, proj_dim) * 0.02)
        vt.pos_embed = nn.Parameter(torch.randn(1, 50, proj_dim) * 0.02)
        vt.blocks = nn.Sequential(*[
            OracleScaleBlock(proj_dim, num_heads) for _ in range(num_blocks)])
        vt.norm = nn.LayerNorm(proj_dim, eps=1e-6)
        vt.head = nn.Linear(proj_dim, num_classes)
        self.vision_transformer = vt

    def forward(self, x):
        feats = self.resnet_projector(x)
        y = self.projection.proj_heads(feats["3"])          # [B, C, 7, 7]
        tokens = y.flatten(2).transpose(1, 2)               # [B, 49, C]
        vt = self.vision_transformer
        cls = vt.cls_token.expand(tokens.shape[0], -1, -1)
        tokens = torch.cat([cls, tokens], dim=1) + vt.pos_embed
        for blk in vt.blocks:
            tokens = blk(tokens)
        tokens = vt.norm(tokens)
        return vt.head(tokens[:, 0, :])


# ---------------------------------------------------------------------------
# timm R50/R26-ViT hybrid (ResNetV2 stem: StdConv + GroupNorm + TF-SAME)
# ---------------------------------------------------------------------------

def _same_pad(x, k, s):
    """TF-'SAME' asymmetric padding for a kxk window with stride s."""
    n_h, n_w = x.shape[-2], x.shape[-1]
    def pads(n):
        total = max((-(-n // s) - 1) * s + k - n, 0)
        return total // 2, total - total // 2
    ph = pads(n_h)
    pw = pads(n_w)
    return nn.functional.pad(x, (pw[0], pw[1], ph[0], ph[1]))


class OracleStdConvSame(nn.Conv2d):
    """timm StdConv2dSame: per-out-channel weight standardization
    (eps 1e-8, biased variance) + TF-SAME padding."""

    def __init__(self, cin, cout, k, stride=1):
        super().__init__(cin, cout, k, stride=stride, bias=False)

    def forward(self, x):
        w = self.weight
        mean = w.mean(dim=(1, 2, 3), keepdim=True)
        var = w.var(dim=(1, 2, 3), unbiased=False, keepdim=True)
        w = (w - mean) / torch.sqrt(var + 1e-8)
        x = _same_pad(x, self.kernel_size[0], self.stride[0])
        return nn.functional.conv2d(x, w, None, self.stride)


class OracleV2Bottleneck(nn.Module):
    """timm resnetv2.Bottleneck, preact=False (the ViT-hybrid variant)."""

    def __init__(self, cin, mid, cout, stride):
        super().__init__()
        self.conv1 = OracleStdConvSame(cin, mid, 1)
        self.norm1 = nn.GroupNorm(32, mid)
        self.conv2 = OracleStdConvSame(mid, mid, 3, stride=stride)
        self.norm2 = nn.GroupNorm(32, mid)
        self.conv3 = OracleStdConvSame(mid, cout, 1)
        self.norm3 = nn.GroupNorm(32, cout)
        if stride != 1 or cin != cout:
            ds = nn.Module()
            ds.conv = OracleStdConvSame(cin, cout, 1, stride=stride)
            ds.norm = nn.GroupNorm(32, cout)
            self.downsample = ds
        else:
            self.downsample = None
        self.relu = nn.ReLU()

    def forward(self, x):
        shortcut = x
        if self.downsample is not None:
            shortcut = self.downsample.norm(self.downsample.conv(x))
        y = self.relu(self.norm1(self.conv1(x)))
        y = self.relu(self.norm2(self.conv2(y)))
        y = self.norm3(self.conv3(y))
        return self.relu(y + shortcut)


class OracleResNetV2Trunk(nn.Module):
    def __init__(self, layers=(3, 4, 9)):
        super().__init__()
        stem = nn.Module()
        stem.conv = OracleStdConvSame(3, 64, 7, stride=2)
        stem.norm = nn.GroupNorm(32, 64)
        self.stem = stem
        outs = [256, 512, 1024, 2048][:len(layers)]
        cin = 64
        stages = []
        for si, (n, cout) in enumerate(zip(layers, outs)):
            blocks = []
            for bi in range(n):
                stride = 2 if (si > 0 and bi == 0) else 1
                blocks.append(OracleV2Bottleneck(cin, cout // 4, cout, stride))
                cin = cout
            st = nn.Module()
            st.blocks = nn.Sequential(*blocks)
            stages.append(st)
        self.stages = nn.ModuleList(stages)
        self.relu = nn.ReLU()

    def forward(self, x):
        y = self.relu(self.stem.norm(self.stem.conv(x)))
        y = _same_pad(y, 3, 2)
        y = nn.functional.max_pool2d(y, 3, 2)
        for st in self.stages:
            y = st.blocks(y)
        return y


class OracleTimmHybridViT(nn.Module):
    """vit_base_r50_s16_224 / vit_small_r26_s32_224 structural twin with
    timm state_dict keys (patch_embed.backbone.*, patch_embed.proj,
    cls_token, pos_embed, blocks.{i}, norm, head)."""

    def __init__(self, layers=(3, 4, 9), embed_dim=768, depth=12,
                 num_heads=12, num_classes=10, img_size=224):
        super().__init__()
        pe = nn.Module()
        pe.backbone = OracleResNetV2Trunk(layers)
        cbb = [256, 512, 1024, 2048][len(layers) - 1]
        pe.proj = nn.Conv2d(cbb, embed_dim, 1)
        self.patch_embed = pe
        grid = img_size // (4 * 2 ** (len(layers) - 1))
        self.cls_token = nn.Parameter(torch.randn(1, 1, embed_dim) * 0.02)
        self.pos_embed = nn.Parameter(
            torch.randn(1, grid * grid + 1, embed_dim) * 0.02)
        self.blocks = nn.Sequential(*[
            OracleScaleBlock(embed_dim, num_heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(embed_dim, eps=1e-6)
        self.head = nn.Linear(embed_dim, num_classes)

    def forward(self, x):
        y = self.patch_embed.proj(self.patch_embed.backbone(x))
        tokens = y.flatten(2).transpose(1, 2)
        cls = self.cls_token.expand(tokens.shape[0], -1, -1)
        tokens = torch.cat([cls, tokens], dim=1) + self.pos_embed
        for blk in self.blocks:
            tokens = blk(tokens)
        tokens = self.norm(tokens)
        return self.head(tokens[:, 0, :])


class OracleDuoFormerLegacy(nn.Module):
    """MyModel twin: always-derived channel token + MultiscaleTransformer."""

    def __init__(self, depth=2, embed_dim=96, num_heads=12, num_classes=2,
                 proj_dim=96, init_values=1e-5):
        super().__init__()
        self.stages = ["3", "2"]
        self.resnet_projector = OracleResNetTrunk(50)
        self.projection = OracleProjection(self.stages, proj_dim, 50)
        ch = STAGE_CH[50]
        self.chann_proj1 = OracleChannelProj1(ch["0"])
        self.chann_proj2 = OracleChannelProj2(ch["1"])
        self.chann_proj_all = OracleChannelProjAll(
            ch["0"] + ch["1"] + ch["2"] + ch["3"], proj_dim)
        self.vision_transformer = OracleMultiscaleTransformer(
            depth, 2, num_heads, embed_dim, num_classes,
            init_values=init_values)

    def forward(self, x):
        feats = self.resnet_projector(x)
        fused = torch.cat([
            self.chann_proj1(feats["0"]), self.chann_proj2(feats["1"]),
            nn.functional.max_pool2d(feats["2"], 2, 2), feats["3"]], dim=1)
        token = self.chann_proj_all(fused).unsqueeze(-1).permute(0, 2, 3, 1)
        proj = self.projection(feats)
        tokens = regroup_tokens(proj, self.stages)
        tokens = torch.cat([token, tokens], dim=2)
        return self.vision_transformer(tokens)
