"""Test-only PyTorch replica of the STswin architecture.

The golden oracle for importer/logit parity tests; NOT used by the framework
itself. Structure and parameter naming follow the reference
(`/root/reference/seg18/net/Ours/swin_512.py`) so state_dicts interchange;
the attention forward in particular reproduces the reference's numerics
expression-for-expression (that is its entire job). The replica is itself
machine-checked against the actual reference module and against checked-in
golden outputs in `tests/test_reference_parity.py`.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------- ResNet18-OS8 ----------------

class TBasicBlock(nn.Module):
    def __init__(self, in_ch, ch, stride=1, dilation=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, ch, 3, stride, padding=dilation,
                               dilation=dilation, bias=False)
        self.bn1 = nn.BatchNorm2d(ch)
        self.conv2 = nn.Conv2d(ch, ch, 3, 1, padding=dilation,
                               dilation=dilation, bias=False)
        self.bn2 = nn.BatchNorm2d(ch)
        if stride != 1 or in_ch != ch:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, ch, 1, stride, bias=False),
                nn.BatchNorm2d(ch))
        else:
            self.downsample = nn.Sequential()

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + self.downsample(x))


class TResNetOS8(nn.Module):
    def __init__(self):
        super().__init__()
        # mirrors torchvision children[:-4] packaging: indices 0..5
        self.resnet = nn.Sequential(
            nn.Conv2d(3, 64, 7, 2, 3, bias=False),
            nn.BatchNorm2d(64),
            nn.ReLU(inplace=True),
            nn.MaxPool2d(3, 2, 1),
            nn.Sequential(TBasicBlock(64, 64), TBasicBlock(64, 64)),
            nn.Sequential(TBasicBlock(64, 128, stride=2), TBasicBlock(128, 128)),
        )
        self.layer4 = nn.Sequential(TBasicBlock(128, 256, dilation=2),
                                    TBasicBlock(256, 256, dilation=2))
        self.layer5 = nn.Sequential(TBasicBlock(256, 512, dilation=4),
                                    TBasicBlock(512, 512, dilation=4))

    def forward(self, x):
        return self.layer5(self.layer4(self.resnet(x)))


# ---------------- space-time Swin ----------------

def t_window_partition(x, ws):
    B, H, W, C = x.shape
    x = x.view(B, H // ws, ws, W // ws, ws, C)
    return x.permute(0, 1, 3, 2, 4, 5).contiguous().view(-1, ws, ws, C)


class TWindowAttention(nn.Module):
    def __init__(self, dim, ws, num_heads):
        super().__init__()
        self.dim, self.ws, self.num_heads = dim, ws, num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros((2 * ws - 1) ** 2, num_heads))
        coords = torch.stack(torch.meshgrid(
            [torch.arange(ws), torch.arange(ws)], indexing="ij"))
        cf = torch.flatten(coords, 1)
        rel = (cf[:, :, None] - cf[:, None, :]).permute(1, 2, 0).contiguous()
        rel[:, :, 0] += ws - 1
        rel[:, :, 1] += ws - 1
        rel[:, :, 0] *= 2 * ws - 1
        self.register_buffer("relative_position_index", rel.sum(-1))
        self.qkv = nn.Linear(dim, dim * 3, bias=True)
        self.proj = nn.Linear(dim, dim)
        nn.init.trunc_normal_(self.relative_position_bias_table, std=.02)

    def forward(self, x, mask=None):
        B_, T, N, C = x.shape
        qkv = self.qkv(x.reshape(-1, N, C)).reshape(
            B_, T * N, 3, self.num_heads, C // self.num_heads
        ).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * self.scale) @ k.transpose(-2, -1)
        bias = self.relative_position_bias_table[
            self.relative_position_index.view(-1)
        ].view(N, N, -1).permute(2, 0, 1).contiguous().repeat(1, T, T)
        attn = attn + bias.unsqueeze(0)
        if mask is not None:
            m = mask.repeat(1, T, T)
            nW = m.shape[0]
            attn = attn.view(B_ // nW, nW, self.num_heads, T * N, T * N) \
                + m.unsqueeze(1).unsqueeze(0)
            attn = attn.view(-1, self.num_heads, T * N, T * N)
        attn = F.softmax(attn, dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B_, T, N, C)
        return self.proj(x)


class TSwinBlock(nn.Module):
    def __init__(self, dim, resolution, num_heads, window_size=8, shift_size=0):
        super().__init__()
        self.dim, self.resolution = dim, resolution
        self.ws, self.ss = window_size, shift_size
        if min(resolution) <= self.ws:
            self.ss, self.ws = 0, min(resolution)
        self.norm1 = nn.LayerNorm(dim)
        self.attn = TWindowAttention(dim, self.ws, num_heads)
        self.norm2 = nn.LayerNorm(dim)
        hidden = int(dim * 4.0)
        self.mlp = nn.Sequential()
        self.mlp.fc1 = nn.Linear(dim, hidden)
        self.mlp.act = nn.GELU()
        self.mlp.fc2 = nn.Linear(hidden, dim)
        if self.ss > 0:
            H, W = resolution
            img_mask = torch.zeros((1, H, W, 1))
            cnt = 0
            for h in (slice(0, -self.ws), slice(-self.ws, -self.ss),
                      slice(-self.ss, None)):
                for w in (slice(0, -self.ws), slice(-self.ws, -self.ss),
                          slice(-self.ss, None)):
                    img_mask[:, h, w, :] = cnt
                    cnt += 1
            mw = t_window_partition(img_mask, self.ws).view(-1, self.ws * self.ws)
            am = mw.unsqueeze(1) - mw.unsqueeze(2)
            am = am.masked_fill(am != 0, -100.0).masked_fill(am == 0, 0.0)
            self.register_buffer("attn_mask", am)
        else:
            self.attn_mask = None

    def _mlp(self, x):
        return self.mlp.fc2(self.mlp.act(self.mlp.fc1(x)))

    def forward(self, xv):
        H, W = self.resolution
        B, T, L, C = xv.shape
        shortcut = xv.reshape(B * T, L, C)
        x = xv.reshape(B * T, H, W, C)
        if self.ss > 0:
            x = torch.roll(x, (-self.ss, -self.ss), dims=(1, 2))
        xw = t_window_partition(x, self.ws)
        xw = xw.view(B, T, -1, self.ws * self.ws, C)
        xw = xw.permute(0, 2, 1, 3, 4).contiguous().view(-1, T, self.ws * self.ws, C)
        aw = self.attn(xw, self.attn_mask)
        # reverse
        nW = (H // self.ws) * (W // self.ws)
        x = aw.view(B, nW, T, self.ws, self.ws, C)
        x = x.view(B, H // self.ws, W // self.ws, T, self.ws, self.ws, C)
        x = x.permute(0, 3, 1, 4, 2, 5, 6).contiguous().view(B * T, H, W, C)
        if self.ss > 0:
            x = torch.roll(x, (self.ss, self.ss), dims=(1, 2))
        x = x.view(B * T, L, C)
        # reference's nonstandard norm order
        x = shortcut + x
        x = self.norm1(x + self._mlp(self.norm2(x)))
        return x.view(B, T, L, C)


class TPatchMerging(nn.Module):
    def __init__(self, resolution, dim):
        super().__init__()
        self.resolution = resolution
        self.reduction = nn.Linear(4 * dim, 2 * dim, bias=False)
        self.norm = nn.LayerNorm(4 * dim)

    def forward(self, x):
        H, W = self.resolution
        B, T, L, C = x.shape
        x = x.view(B * T, H, W, C)
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = torch.cat([x0, x1, x2, x3], -1).view(B * T, -1, 4 * C)
        return self.reduction(self.norm(x)).view(B, T, L // 4, 2 * C)


class TSwinStack(nn.Module):
    def __init__(self, dim=512, resolution=(64, 80), num_heads=4):
        super().__init__()
        self.resolution = resolution
        self.pairs = [[slice(0, 2), slice(2, 4)], [slice(1, 3)],
                      [slice(0, 2), slice(2, 4)]]
        self.layers = nn.ModuleList()
        for _ in range(3):
            self.layers.append(nn.Sequential(
                TSwinBlock(dim, resolution, num_heads),
                TSwinBlock(dim, resolution, num_heads, shift_size=4)))
        r2 = (resolution[0] // 2, resolution[1] // 2)
        for _ in range(3):
            self.layers.append(nn.Sequential(
                TSwinBlock(dim * 2, r2, num_heads, window_size=4),
                TSwinBlock(dim * 2, r2, num_heads, window_size=4, shift_size=2)))
        self.downsample = TPatchMerging(resolution, dim)

    def _layer(self, x, pairs, idx):
        y = x.clone()
        for p in pairs:
            y[:, p] = self.layers[idx](x[:, p])
        return y

    def forward(self, x):
        B, T, C, H, W = x.shape
        x = x.permute(0, 1, 3, 4, 2).contiguous().view(B, T, H * W, C)
        for i in range(3):
            x = self._layer(x, self.pairs[i], i)
        s1 = x.permute(0, 1, 3, 2).contiguous().view(B, T, C, H, W)
        x = self.downsample(x)
        for i in range(3):
            x = self._layer(x, self.pairs[i], i + 3)
        s2 = x.permute(0, 1, 3, 2).contiguous().view(B, T, 2 * C, H // 2, W // 2)
        return s1, s2


# ---------------- ASPP + heads ----------------

class TASPP(nn.Module):
    def __init__(self, in_ch=1024, out_ch=256):
        super().__init__()
        mid = in_ch // 2
        self.conv_1x1_1 = nn.Conv2d(in_ch, mid, 1)
        self.bn_conv_1x1_1 = nn.BatchNorm2d(mid)
        self.conv_3x3_1 = nn.Conv2d(in_ch, mid, 3, padding=6, dilation=6)
        self.bn_conv_3x3_1 = nn.BatchNorm2d(mid)
        self.conv_3x3_2 = nn.Conv2d(in_ch, mid, 3, padding=12, dilation=12)
        self.bn_conv_3x3_2 = nn.BatchNorm2d(mid)
        self.conv_3x3_3 = nn.Conv2d(in_ch, mid, 3, padding=18, dilation=18)
        self.bn_conv_3x3_3 = nn.BatchNorm2d(mid)
        self.conv_1x1_2 = nn.Conv2d(in_ch, mid, 1)
        self.bn_conv_1x1_2 = nn.BatchNorm2d(mid)
        self.conv_1x1_3 = nn.Conv2d(mid * 5, mid, 1)
        self.bn_conv_1x1_3 = nn.BatchNorm2d(mid)
        self.conv_1x1_4 = nn.Conv2d(mid, out_ch, 1)

    def forward(self, x):
        h, w = x.shape[2:]
        b0 = F.relu(self.bn_conv_1x1_1(self.conv_1x1_1(x)))
        b1 = F.relu(self.bn_conv_3x3_1(self.conv_3x3_1(x)))
        b2 = F.relu(self.bn_conv_3x3_2(self.conv_3x3_2(x)))
        b3 = F.relu(self.bn_conv_3x3_3(self.conv_3x3_3(x)))
        img = F.adaptive_avg_pool2d(x, 1)
        img = F.relu(self.bn_conv_1x1_2(self.conv_1x1_2(img)))
        img = F.interpolate(img, size=(h, w), mode="bilinear")
        out = torch.cat([b0, b1, b2, b3, img], 1)
        out = F.relu(self.bn_conv_1x1_3(self.conv_1x1_3(out)))
        return self.conv_1x1_4(out)


class TTswinPlus(nn.Module):
    def __init__(self, num_classes, resolution=(64, 80)):
        super().__init__()
        self.swin = TSwinStack(512, resolution, 4)
        self.resnet = TResNetOS8()
        self.aspp = TASPP(1024, 256)

        def proj(in_ch):
            return nn.Sequential(nn.Conv2d(in_ch, 48, 1, bias=False),
                                 nn.BatchNorm2d(48), nn.ReLU(inplace=True))
        self.project1 = proj(512)
        self.project2 = proj(512)
        self.project3 = proj(1024)
        self.classifier = nn.Sequential(
            nn.Conv2d(400, 256, 3, padding=1, bias=False),
            nn.BatchNorm2d(256), nn.ReLU(inplace=True),
            nn.Conv2d(256, num_classes, 1))

    def forward(self, x):
        b, t, _, H, W = x.shape
        seq = [self.resnet(x[:, i]).unsqueeze(1) for i in range(t)]
        tem = torch.cat(seq, dim=1)
        res_last = tem[:, -1]
        s1, s2 = self.swin(tem)
        o1, o2 = s1[:, -1], s2[:, -1]
        aspp = self.aspp(o2)
        p1 = self.project1(res_last)
        p2 = self.project2(o1)
        p3 = F.interpolate(self.project3(o2), size=p1.shape[2:],
                           mode="bilinear", align_corners=False)
        aspp = F.interpolate(aspp, size=p1.shape[2:], mode="bilinear",
                             align_corners=False)
        out = self.classifier(torch.cat([p1, p2, p3, aspp], dim=1))
        return F.interpolate(out, (H, W), mode="bilinear")
