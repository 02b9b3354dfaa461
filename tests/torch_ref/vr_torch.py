"""Minimal PyTorch mirror of the VR-arch CascadedNet (reference
``uvr5/lib_v5/vr_network/nets_new.py:41-125`` + ``layers_new.py``), for
conversion-parity tests. State-dict keys match the reference naming that
``convert_cascadednet`` expects."""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class Conv2DBNActivTorch(nn.Module):
    def __init__(self, nin, nout, ksize=3, stride=1, pad=1, dilation=1,
                 activ=nn.ReLU):
        super().__init__()
        self.conv = nn.Sequential(
            nn.Conv2d(nin, nout, ksize, stride, pad, dilation, bias=False),
            nn.BatchNorm2d(nout),
            activ(),
        )

    def forward(self, x):
        return self.conv(x)


class EncoderTorch(nn.Module):
    def __init__(self, nin, nout, ksize=3, stride=1, pad=1,
                 activ=nn.LeakyReLU):
        super().__init__()
        self.conv1 = Conv2DBNActivTorch(nin, nout, ksize, stride, pad,
                                        activ=activ)
        self.conv2 = Conv2DBNActivTorch(nout, nout, ksize, 1, pad, activ=activ)

    def forward(self, x):
        return self.conv2(self.conv1(x))


class DecoderTorch(nn.Module):
    def __init__(self, nin, nout, ksize=3, stride=1, pad=1, activ=nn.ReLU):
        super().__init__()
        self.conv1 = Conv2DBNActivTorch(nin, nout, ksize, 1, pad, activ=activ)

    def forward(self, x, skip=None):
        x = F.interpolate(x, scale_factor=2, mode="bilinear",
                          align_corners=True)
        if skip is not None:
            # crop_center on the (freq) axis like reference spec_utils
            h = x.shape[2]
            hs = skip.shape[2]
            s = (hs - h) // 2
            skip = skip[:, :, s:s + h, :x.shape[3]]
            x = torch.cat([x, skip], dim=1)
        return self.conv1(x)


class ASPPModuleTorch(nn.Module):
    def __init__(self, nin, nout, dilations=((4, 2), (8, 4), (12, 6)),
                 activ=nn.ReLU):
        super().__init__()
        self.conv1 = nn.Sequential(
            nn.AdaptiveAvgPool2d((1, None)),
            Conv2DBNActivTorch(nin, nout, 1, 1, 0, activ=activ),
        )
        self.conv2 = Conv2DBNActivTorch(nin, nout, 1, 1, 0, activ=activ)
        self.conv3 = Conv2DBNActivTorch(nin, nout, 3, 1, dilations[0],
                                        dilations[0], activ=activ)
        self.conv4 = Conv2DBNActivTorch(nin, nout, 3, 1, dilations[1],
                                        dilations[1], activ=activ)
        self.conv5 = Conv2DBNActivTorch(nin, nout, 3, 1, dilations[2],
                                        dilations[2], activ=activ)
        self.bottleneck = Conv2DBNActivTorch(nout * 5, nout, 1, 1, 0,
                                             activ=activ)

    def forward(self, x):
        _, _, h, w = x.size()
        feat1 = F.interpolate(self.conv1(x), size=(h, w), mode="bilinear",
                              align_corners=True)
        out = torch.cat(
            (feat1, self.conv2(x), self.conv3(x), self.conv4(x),
             self.conv5(x)), dim=1)
        return self.bottleneck(out)


class LSTMModuleTorch(nn.Module):
    def __init__(self, nin_conv, nin_lstm, nout_lstm):
        super().__init__()
        self.conv = Conv2DBNActivTorch(nin_conv, 1, 1, 1, 0)
        self.lstm = nn.LSTM(input_size=nin_lstm, hidden_size=nout_lstm // 2,
                            bidirectional=True)
        self.dense = nn.Sequential(
            nn.Linear(nout_lstm, nin_lstm), nn.BatchNorm1d(nin_lstm),
            nn.ReLU())

    def forward(self, x):
        N, _, nbins, nframes = x.size()
        h = self.conv(x)[:, 0]  # N, nbins, nframes
        h = h.permute(2, 0, 1)  # nframes, N, nbins
        h, _ = self.lstm(h)
        h = self.dense(h.reshape(-1, h.size()[-1]))
        h = h.reshape(nframes, N, 1, nbins)
        return h.permute(1, 2, 3, 0)


class BaseNetTorch(nn.Module):
    def __init__(self, nin, nout, nin_lstm, nout_lstm,
                 dilations=((4, 2), (8, 4), (12, 6))):
        super().__init__()
        self.enc1 = Conv2DBNActivTorch(nin, nout, 3, 1, 1)
        self.enc2 = EncoderTorch(nout, nout * 2, 3, 2, 1)
        self.enc3 = EncoderTorch(nout * 2, nout * 4, 3, 2, 1)
        self.enc4 = EncoderTorch(nout * 4, nout * 6, 3, 2, 1)
        self.enc5 = EncoderTorch(nout * 6, nout * 8, 3, 2, 1)
        self.aspp = ASPPModuleTorch(nout * 8, nout * 8, dilations)
        self.dec4 = DecoderTorch(nout * (6 + 8), nout * 6, 3, 1, 1)
        self.dec3 = DecoderTorch(nout * (4 + 6), nout * 4, 3, 1, 1)
        self.dec2 = DecoderTorch(nout * (2 + 4), nout * 2, 3, 1, 1)
        self.lstm_dec2 = LSTMModuleTorch(nout * 2, nin_lstm, nout_lstm)
        self.dec1 = DecoderTorch(nout * (1 + 2) + 1, nout * 1, 3, 1, 1)

    def forward(self, x):
        e1 = self.enc1(x)
        e2 = self.enc2(e1)
        e3 = self.enc3(e2)
        e4 = self.enc4(e3)
        e5 = self.enc5(e4)
        h = self.aspp(e5)
        h = self.dec4(h, e4)
        h = self.dec3(h, e3)
        h = self.dec2(h, e2)
        h = torch.cat([h, self.lstm_dec2(h)], dim=1)
        return self.dec1(h, e1)


class CascadedNetTorch(nn.Module):
    def __init__(self, n_fft, nout=32, nout_lstm=128):
        super().__init__()
        self.max_bin = n_fft // 2
        self.output_bin = n_fft // 2 + 1
        self.nin_lstm = self.max_bin // 2
        self.stg1_low_band_net = nn.Sequential(
            BaseNetTorch(2, nout // 2, self.nin_lstm // 2, nout_lstm),
            Conv2DBNActivTorch(nout // 2, nout // 4, 1, 1, 0),
        )
        self.stg1_high_band_net = BaseNetTorch(
            2, nout // 4, self.nin_lstm // 2, nout_lstm // 2)
        self.stg2_low_band_net = nn.Sequential(
            BaseNetTorch(nout // 4 + 2, nout, self.nin_lstm // 2, nout_lstm),
            Conv2DBNActivTorch(nout, nout // 2, 1, 1, 0),
        )
        self.stg2_high_band_net = BaseNetTorch(
            nout // 4 + 2, nout // 2, self.nin_lstm // 2, nout_lstm // 2)
        self.stg3_full_band_net = BaseNetTorch(
            3 * nout // 4 + 2, nout, self.nin_lstm, nout_lstm)
        self.out = nn.Conv2d(nout, 2, 1, bias=False)
        self.aux_out = nn.Conv2d(3 * nout // 4, 2, 1, bias=False)

    def forward(self, x):
        x = x[:, :, :self.max_bin]
        bandw = x.size()[2] // 2
        l1_in = x[:, :, :bandw]
        h1_in = x[:, :, bandw:]
        l1 = self.stg1_low_band_net(l1_in)
        h1 = self.stg1_high_band_net(h1_in)
        aux1 = torch.cat([l1, h1], dim=2)
        l2 = self.stg2_low_band_net(torch.cat([l1_in, l1], dim=1))
        h2 = self.stg2_high_band_net(torch.cat([h1_in, h1], dim=1))
        aux2 = torch.cat([l2, h2], dim=2)
        f3 = self.stg3_full_band_net(torch.cat([x, aux1, aux2], dim=1))
        mask = torch.sigmoid(self.out(f3))
        return F.pad(mask, (0, 0, 0, self.output_bin - mask.size()[2]),
                     mode="replicate")
