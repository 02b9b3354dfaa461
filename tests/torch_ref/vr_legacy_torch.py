"""Minimal PyTorch mirror of the LEGACY VR-arch CascadedASPPNet (reference
``uvr5/lib_v5/vr_network/nets.py:99-165`` + ``layers.py:7-143``), for
conversion-parity tests. State-dict keys match the reference naming that
``convert_cascaded_aspp`` expects, including the shared-weight conv6/conv7
quirk of the 7-branch ASPP."""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

from tests.torch_ref.vr_torch import Conv2DBNActivTorch


class SeperableConv2DBNActivTorch(nn.Module):
    def __init__(self, nin, nout, ksize=3, stride=1, pad=1, dilation=1,
                 activ=nn.ReLU):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv2d(nin, nin, ksize, stride, pad, dilation, groups=nin,
                      bias=False),
            nn.Conv2d(nin, nout, 1, bias=False),
            nn.BatchNorm2d(nout),
            activ(),
        )

    def forward(self, x):
        return self.conv(x)


class EncoderLegacyTorch(nn.Module):
    """conv1 stride 1 → skip; conv2 strided → down (reference
    ``layers.py:50-62`` — opposite of the new-arch Encoder)."""

    def __init__(self, nin, nout, ksize=3, stride=1, pad=1,
                 activ=nn.LeakyReLU):
        super().__init__()
        self.conv1 = Conv2DBNActivTorch(nin, nout, ksize, 1, pad, activ=activ)
        self.conv2 = Conv2DBNActivTorch(nout, nout, ksize, stride, pad,
                                        activ=activ)

    def forward(self, x):
        skip = self.conv1(x)
        return self.conv2(skip), skip


class DecoderLegacyTorch(nn.Module):
    def __init__(self, nin, nout, ksize=3, stride=1, pad=1, activ=nn.ReLU):
        super().__init__()
        self.conv = Conv2DBNActivTorch(nin, nout, ksize, 1, pad, activ=activ)

    def forward(self, x, skip=None):
        x = F.interpolate(x, scale_factor=2, mode="bilinear",
                          align_corners=True)
        if skip is not None:
            x = x[:, :, : skip.shape[2], : skip.shape[3]]
            s = (skip.shape[3] - x.shape[3]) // 2
            skip = skip[:, :, : x.shape[2], s : s + x.shape[3]]
            x = torch.cat([x, skip], dim=1)
        return self.conv(x)


class ASPPModuleLegacyTorch(nn.Module):
    def __init__(self, nn_architecture, nin, nout, dilations=(4, 8, 16),
                 activ=nn.ReLU):
        super().__init__()
        self.conv1 = nn.Sequential(
            nn.AdaptiveAvgPool2d((1, None)),
            Conv2DBNActivTorch(nin, nin, 1, 1, 0, activ=activ),
        )
        self.six_layer = [129605]
        self.seven_layer = [537238, 537227, 33966]
        extra_conv = SeperableConv2DBNActivTorch(
            nin, nin, 3, 1, dilations[2], dilations[2], activ=activ)
        self.conv2 = Conv2DBNActivTorch(nin, nin, 1, 1, 0, activ=activ)
        self.conv3 = SeperableConv2DBNActivTorch(
            nin, nin, 3, 1, dilations[0], dilations[0], activ=activ)
        self.conv4 = SeperableConv2DBNActivTorch(
            nin, nin, 3, 1, dilations[1], dilations[1], activ=activ)
        self.conv5 = SeperableConv2DBNActivTorch(
            nin, nin, 3, 1, dilations[2], dilations[2], activ=activ)
        if nn_architecture in self.six_layer:
            self.conv6 = extra_conv
            nin_x = 6
        elif nn_architecture in self.seven_layer:
            # the reference assigns ONE module to both names → shared weights
            self.conv6 = extra_conv
            self.conv7 = extra_conv
            nin_x = 7
        else:
            nin_x = 5
        self.nn_architecture = nn_architecture
        self.bottleneck = nn.Sequential(
            Conv2DBNActivTorch(nin * nin_x, nout, 1, 1, 0, activ=activ),
            nn.Dropout2d(0.1),
        )

    def forward(self, x):
        _, _, h, w = x.size()
        feats = [
            F.interpolate(self.conv1(x), size=(h, w), mode="bilinear",
                          align_corners=True),
            self.conv2(x), self.conv3(x), self.conv4(x), self.conv5(x),
        ]
        if self.nn_architecture in self.six_layer:
            feats.append(self.conv6(x))
        elif self.nn_architecture in self.seven_layer:
            feats.extend([self.conv6(x), self.conv7(x)])
        return self.bottleneck(torch.cat(feats, dim=1))


class BaseASPPNetTorch(nn.Module):
    def __init__(self, nn_architecture, nin, ch, dilations=(4, 8, 16)):
        super().__init__()
        self.nn_architecture = nn_architecture
        self.enc1 = EncoderLegacyTorch(nin, ch, 3, 2, 1)
        self.enc2 = EncoderLegacyTorch(ch, ch * 2, 3, 2, 1)
        self.enc3 = EncoderLegacyTorch(ch * 2, ch * 4, 3, 2, 1)
        self.enc4 = EncoderLegacyTorch(ch * 4, ch * 8, 3, 2, 1)
        if nn_architecture == 129605:
            self.enc5 = EncoderLegacyTorch(ch * 8, ch * 16, 3, 2, 1)
            self.aspp = ASPPModuleLegacyTorch(nn_architecture, ch * 16,
                                              ch * 32, dilations)
            self.dec5 = DecoderLegacyTorch(ch * (16 + 32), ch * 16, 3, 1, 1)
        else:
            self.aspp = ASPPModuleLegacyTorch(nn_architecture, ch * 8,
                                              ch * 16, dilations)
        self.dec4 = DecoderLegacyTorch(ch * (8 + 16), ch * 8, 3, 1, 1)
        self.dec3 = DecoderLegacyTorch(ch * (4 + 8), ch * 4, 3, 1, 1)
        self.dec2 = DecoderLegacyTorch(ch * (2 + 4), ch * 2, 3, 1, 1)
        self.dec1 = DecoderLegacyTorch(ch * (1 + 2), ch, 3, 1, 1)

    def forward(self, x):
        h, e1 = self.enc1(x)
        h, e2 = self.enc2(h)
        h, e3 = self.enc3(h)
        h, e4 = self.enc4(h)
        if self.nn_architecture == 129605:
            h, e5 = self.enc5(h)
            h = self.aspp(h)
            h = self.dec5(h, e5)
        else:
            h = self.aspp(h)
        h = self.dec4(h, e4)
        h = self.dec3(h, e3)
        h = self.dec2(h, e2)
        return self.dec1(h, e1)


_CAPACITY = {
    "sp": dict(ch=16),
    "hp": dict(ch=32),
    "hp2": dict(ch=64),
}


class CascadedASPPNetTorch(nn.Module):
    def __init__(self, n_fft, nn_architecture=123821):
        super().__init__()
        if nn_architecture in (31191, 33966, 129605):
            ch = 16
        elif nn_architecture in (123821, 123812):
            ch = 32
        else:
            ch = 64
        self.stg1_low_band_net = BaseASPPNetTorch(nn_architecture, 2, ch)
        self.stg1_high_band_net = BaseASPPNetTorch(nn_architecture, 2, ch)
        self.stg2_bridge = Conv2DBNActivTorch(2 + ch, ch // 2, 1, 1, 0)
        self.stg2_full_band_net = BaseASPPNetTorch(nn_architecture, ch // 2,
                                                   ch)
        self.stg3_bridge = Conv2DBNActivTorch(2 + ch * 2, ch, 1, 1, 0)
        self.stg3_full_band_net = BaseASPPNetTorch(nn_architecture, ch,
                                                   ch * 2)
        self.out = nn.Conv2d(ch * 2, 2, 1, bias=False)
        self.aux1_out = nn.Conv2d(ch, 2, 1, bias=False)
        self.aux2_out = nn.Conv2d(ch, 2, 1, bias=False)
        self.max_bin = n_fft // 2
        self.output_bin = n_fft // 2 + 1
        self.offset = 128

    def forward(self, x):
        x = x[:, :, : self.max_bin]
        bandw = x.size()[2] // 2
        aux1 = torch.cat(
            [self.stg1_low_band_net(x[:, :, :bandw]),
             self.stg1_high_band_net(x[:, :, bandw:])], dim=2)
        h = torch.cat([x, aux1], dim=1)
        aux2 = self.stg2_full_band_net(self.stg2_bridge(h))
        h = torch.cat([x, aux1, aux2], dim=1)
        h = self.stg3_full_band_net(self.stg3_bridge(h))
        mask = torch.sigmoid(self.out(h))
        return F.pad(mask, (0, 0, 0, self.output_bin - mask.size()[2]),
                     mode="replicate")
