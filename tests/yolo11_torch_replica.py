"""Torch replica of the ultralytics YOLO11-pose layer stack.

Used by tests to validate pose3d_tpu.stage1.yolo11 + yolo_port without the
ultralytics package or network access: the replica reproduces the upstream
module graph AND state_dict naming (ultralytics/nn/modules/{conv,block,
head}.py, yolo11-pose.yaml), so a random-init replica checkpoint ports
through the production mapper exactly like a real ``yolo11x-pose.pt``.

This is test scaffolding, not product code — numerics follow the upstream
definitions (BN eps 1e-3 per ultralytics initialize_weights), inference
path only.
"""

import math

import torch
import torch.nn as nn

SCALES = {
    "n": (0.50, 0.25, 1024),
    "s": (0.50, 0.50, 1024),
    "m": (0.50, 1.00, 512),
    "l": (1.00, 1.00, 512),
    "x": (1.00, 1.50, 512),
}


def make_divisible(x, divisor=8):
    return int(math.ceil(x / divisor) * divisor)


def autopad(k):
    return k // 2 if isinstance(k, int) else tuple(x // 2 for x in k)


class Conv(nn.Module):
    def __init__(self, c1, c2, k=1, s=1, g=1, act=True):
        super().__init__()
        self.conv = nn.Conv2d(c1, c2, k, s, autopad(k), groups=g, bias=False)
        self.bn = nn.BatchNorm2d(c2, eps=1e-3, momentum=0.03)
        self.act = nn.SiLU() if act else nn.Identity()

    def forward(self, x):
        return self.act(self.bn(self.conv(x)))


class DWConv(Conv):
    def __init__(self, c1, c2, k=1, s=1, act=True):
        super().__init__(c1, c2, k, s, g=math.gcd(c1, c2), act=act)


class Bottleneck(nn.Module):
    def __init__(self, c1, c2, shortcut=True, g=1, k=(3, 3), e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = Conv(c1, c_, k[0], 1)
        self.cv2 = Conv(c_, c2, k[1], 1, g=g)
        self.add = shortcut and c1 == c2

    def forward(self, x):
        y = self.cv2(self.cv1(x))
        return x + y if self.add else y


class C3(nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5):
        super().__init__()
        c_ = int(c2 * e)
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv(c1, c_, 1, 1)
        self.cv3 = Conv(2 * c_, c2, 1)
        self.m = nn.Sequential(
            *(Bottleneck(c_, c_, shortcut, g, k=((1, 1), (3, 3)), e=1.0)
              for _ in range(n))
        )

    def forward(self, x):
        return self.cv3(torch.cat((self.m(self.cv1(x)), self.cv2(x)), 1))


class C3k(C3):
    def __init__(self, c1, c2, n=1, shortcut=True, g=1, e=0.5, k=3):
        super().__init__(c1, c2, n, shortcut, g, e)
        c_ = int(c2 * e)
        self.m = nn.Sequential(
            *(Bottleneck(c_, c_, shortcut, g, k=(k, k), e=1.0)
              for _ in range(n))
        )


class C2f(nn.Module):
    def __init__(self, c1, c2, n=1, shortcut=False, g=1, e=0.5):
        super().__init__()
        self.c = int(c2 * e)
        self.cv1 = Conv(c1, 2 * self.c, 1, 1)
        self.cv2 = Conv((2 + n) * self.c, c2, 1)
        self.m = nn.ModuleList(
            Bottleneck(self.c, self.c, shortcut, g, k=((3, 3), (3, 3)),
                       e=1.0)
            for _ in range(n)
        )

    def forward(self, x):
        y = list(self.cv1(x).chunk(2, 1))
        y.extend(m(y[-1]) for m in self.m)
        return self.cv2(torch.cat(y, 1))


class C3k2(C2f):
    def __init__(self, c1, c2, n=1, c3k=False, e=0.5, g=1, shortcut=True):
        super().__init__(c1, c2, n, shortcut, g, e)
        self.m = nn.ModuleList(
            C3k(self.c, self.c, 2, shortcut, g) if c3k
            else Bottleneck(self.c, self.c, shortcut, g)
            for _ in range(n)
        )


class SPPF(nn.Module):
    def __init__(self, c1, c2, k=5):
        super().__init__()
        c_ = c1 // 2
        self.cv1 = Conv(c1, c_, 1, 1)
        self.cv2 = Conv(c_ * 4, c2, 1, 1)
        self.m = nn.MaxPool2d(kernel_size=k, stride=1, padding=k // 2)

    def forward(self, x):
        y = [self.cv1(x)]
        y.extend(self.m(y[-1]) for _ in range(3))
        return self.cv2(torch.cat(y, 1))


class Attention(nn.Module):
    def __init__(self, dim, num_heads=8, attn_ratio=0.5):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.key_dim = int(self.head_dim * attn_ratio)
        self.scale = self.key_dim ** -0.5
        nh_kd = self.key_dim * num_heads
        h = dim + nh_kd * 2
        self.qkv = Conv(dim, h, 1, act=False)
        self.proj = Conv(dim, dim, 1, act=False)
        self.pe = Conv(dim, dim, 3, 1, g=dim, act=False)

    def forward(self, x):
        B, C, H, W = x.shape
        N = H * W
        qkv = self.qkv(x)
        q, k, v = qkv.view(
            B, self.num_heads, self.key_dim * 2 + self.head_dim, N
        ).split([self.key_dim, self.key_dim, self.head_dim], dim=2)
        attn = (q.transpose(-2, -1) @ k) * self.scale
        attn = attn.softmax(dim=-1)
        x = (v @ attn.transpose(-2, -1)).view(B, C, H, W) + self.pe(
            v.reshape(B, C, H, W)
        )
        return self.proj(x)


class PSABlock(nn.Module):
    def __init__(self, c, attn_ratio=0.5, num_heads=4, shortcut=True):
        super().__init__()
        self.attn = Attention(c, attn_ratio=attn_ratio, num_heads=num_heads)
        self.ffn = nn.Sequential(
            Conv(c, c * 2, 1), Conv(c * 2, c, 1, act=False)
        )
        self.add = shortcut

    def forward(self, x):
        x = x + self.attn(x) if self.add else self.attn(x)
        x = x + self.ffn(x) if self.add else self.ffn(x)
        return x


class C2PSA(nn.Module):
    def __init__(self, c1, c2, n=1, e=0.5):
        super().__init__()
        assert c1 == c2
        self.c = int(c1 * e)
        self.cv1 = Conv(c1, 2 * self.c, 1, 1)
        self.cv2 = Conv(2 * self.c, c1, 1)
        self.m = nn.Sequential(
            *(PSABlock(self.c, attn_ratio=0.5, num_heads=self.c // 64)
              for _ in range(n))
        )

    def forward(self, x):
        a, b = self.cv1(x).split((self.c, self.c), dim=1)
        b = self.m(b)
        return self.cv2(torch.cat((a, b), 1))


class Concat(nn.Module):
    def __init__(self, d=1):
        super().__init__()
        self.d = d

    def forward(self, xs):
        return torch.cat(xs, self.d)


class DFL(nn.Module):
    def __init__(self, c1=16):
        super().__init__()
        self.conv = nn.Conv2d(c1, 1, 1, bias=False).requires_grad_(False)
        self.conv.weight.data[:] = torch.arange(
            c1, dtype=torch.float
        ).view(1, c1, 1, 1)
        self.c1 = c1

    def forward(self, x):
        b, _, a = x.shape
        return self.conv(
            x.view(b, 4, self.c1, a).transpose(2, 1).softmax(1)
        ).view(b, 4, a)


def make_anchors(feats, strides, grid_cell_offset=0.5):
    anchor_points, stride_tensor = [], []
    for x, stride in zip(feats, strides):
        h, w = x.shape[2], x.shape[3]
        sx = torch.arange(w, dtype=torch.float) + grid_cell_offset
        sy = torch.arange(h, dtype=torch.float) + grid_cell_offset
        sy, sx = torch.meshgrid(sy, sx, indexing="ij")
        anchor_points.append(torch.stack((sx, sy), -1).view(-1, 2))
        stride_tensor.append(
            torch.full((h * w, 1), stride, dtype=torch.float)
        )
    return torch.cat(anchor_points), torch.cat(stride_tensor)


def dist2bbox(distance, anchor_points, xywh=True, dim=-1):
    lt, rb = distance.chunk(2, dim)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if xywh:
        c_xy = (x1y1 + x2y2) / 2
        wh = x2y2 - x1y1
        return torch.cat((c_xy, wh), dim)
    return torch.cat((x1y1, x2y2), dim)


class Pose(nn.Module):
    """Detect + Pose head (inference path, legacy=False / v11 branch)."""

    def __init__(self, nc=1, kpt_shape=(17, 3), ch=()):
        super().__init__()
        self.nc = nc
        self.nl = len(ch)
        self.reg_max = 16
        self.no = nc + self.reg_max * 4
        self.kpt_shape = kpt_shape
        self.nk = kpt_shape[0] * kpt_shape[1]
        c2 = max(16, ch[0] // 4, self.reg_max * 4)
        c3 = max(ch[0], min(self.nc, 100))
        c4 = max(ch[0] // 4, self.nk)
        self.cv2 = nn.ModuleList(
            nn.Sequential(
                Conv(x, c2, 3), Conv(c2, c2, 3),
                nn.Conv2d(c2, 4 * self.reg_max, 1),
            )
            for x in ch
        )
        self.cv3 = nn.ModuleList(
            nn.Sequential(
                nn.Sequential(DWConv(x, x, 3), Conv(x, c3, 1)),
                nn.Sequential(DWConv(c3, c3, 3), Conv(c3, c3, 1)),
                nn.Conv2d(c3, self.nc, 1),
            )
            for x in ch
        )
        self.cv4 = nn.ModuleList(
            nn.Sequential(
                Conv(x, c4, 3), Conv(c4, c4, 3), nn.Conv2d(c4, self.nk, 1)
            )
            for x in ch
        )
        self.dfl = DFL(self.reg_max)
        self.stride = torch.tensor([8.0, 16.0, 32.0])

    def forward_raw(self, feats):
        """Per-level raw (box, cls, kpt), NCHW."""
        return [
            (self.cv2[i](feats[i]), self.cv3[i](feats[i]),
             self.cv4[i](feats[i]))
            for i in range(self.nl)
        ]

    def forward(self, feats):
        """Full inference decode → [B, 4 + nc + nk, A] (head.py Pose)."""
        bs = feats[0].shape[0]
        kpt = torch.cat(
            [self.cv4[i](feats[i]).view(bs, self.nk, -1)
             for i in range(self.nl)],
            -1,
        )
        x = [
            torch.cat((self.cv2[i](feats[i]), self.cv3[i](feats[i])), 1)
            for i in range(self.nl)
        ]
        anchors, strides = (
            t.transpose(0, 1) for t in make_anchors(x, self.stride, 0.5)
        )
        x_cat = torch.cat([xi.view(bs, self.no, -1) for xi in x], 2)
        box, cls = x_cat.split((self.reg_max * 4, self.nc), 1)
        dbox = dist2bbox(
            self.dfl(box), anchors.unsqueeze(0), xywh=True, dim=1
        ) * strides
        det = torch.cat((dbox, cls.sigmoid()), 1)
        pred_kpt = self.kpts_decode(bs, kpt, anchors, strides)
        return torch.cat([det, pred_kpt], 1)

    def kpts_decode(self, bs, kpts, anchors, strides):
        ndim = self.kpt_shape[1]
        y = kpts.clone()
        if ndim == 3:
            y[:, 2::3] = y[:, 2::3].sigmoid()
        y[:, 0::ndim] = (y[:, 0::ndim] * 2.0 + (anchors[0] - 0.5)) * strides
        y[:, 1::ndim] = (y[:, 1::ndim] * 2.0 + (anchors[1] - 0.5)) * strides
        return y


class YOLO11PoseTorch(nn.Module):
    """Full yolo11{scale}-pose graph with upstream state_dict naming."""

    def __init__(self, scale="n", nc=1, kpt_shape=(17, 3)):
        super().__init__()
        d, w, mc = SCALES[scale]

        def c(ch):
            return make_divisible(min(ch, mc) * w)

        rep = max(round(2 * d), 1)
        force = scale in "mlx"
        self.model = nn.ModuleList(
            [
                Conv(3, c(64), 3, 2),                                # 0
                Conv(c(64), c(128), 3, 2),                           # 1
                C3k2(c(128), c(256), rep, force, 0.25),              # 2
                Conv(c(256), c(256), 3, 2),                          # 3
                C3k2(c(256), c(512), rep, force, 0.25),              # 4
                Conv(c(512), c(512), 3, 2),                          # 5
                C3k2(c(512), c(512), rep, True),                     # 6
                Conv(c(512), c(1024), 3, 2),                         # 7
                C3k2(c(1024), c(1024), rep, True),                   # 8
                SPPF(c(1024), c(1024), 5),                           # 9
                C2PSA(c(1024), c(1024), rep),                        # 10
                nn.Upsample(scale_factor=2, mode="nearest"),         # 11
                Concat(),                                            # 12
                C3k2(c(1024) + c(512), c(512), rep, force),          # 13
                nn.Upsample(scale_factor=2, mode="nearest"),         # 14
                Concat(),                                            # 15
                C3k2(c(512) + c(512), c(256), rep, force),           # 16
                Conv(c(256), c(256), 3, 2),                          # 17
                Concat(),                                            # 18
                C3k2(c(256) + c(512), c(512), rep, force),           # 19
                Conv(c(512), c(512), 3, 2),                          # 20
                Concat(),                                            # 21
                C3k2(c(512) + c(1024), c(1024), rep, True),          # 22
                Pose(nc, kpt_shape, (c(256), c(512), c(1024))),      # 23
            ]
        )

    def backbone_and_neck(self, x):
        m = self.model
        x = m[0](x)
        x = m[1](x)
        x = m[2](x)
        x = m[3](x)
        x4 = m[4](x)
        x = m[5](x4)
        x6 = m[6](x)
        x = m[7](x6)
        x = m[8](x)
        x = m[9](x)
        x10 = m[10](x)
        x = m[12]([m[11](x10), x6])
        x13 = m[13](x)
        x = m[15]([m[14](x13), x4])
        x16 = m[16](x)
        x = m[18]([m[17](x16), x13])
        x19 = m[19](x)
        x = m[21]([m[20](x19), x10])
        x22 = m[22](x)
        return x16, x19, x22

    def forward_raw(self, x):
        return self.model[23].forward_raw(self.backbone_and_neck(x))

    def forward(self, x):
        return self.model[23](self.backbone_and_neck(x))


def randomize_bn_stats(model, seed=0):
    """Give running stats non-trivial values so porting them is exercised."""
    g = torch.Generator().manual_seed(seed)
    for mod in model.modules():
        if isinstance(mod, nn.BatchNorm2d):
            mod.running_mean.normal_(0, 0.5, generator=g)
            mod.running_var.uniform_(0.5, 1.5, generator=g)
    return model
