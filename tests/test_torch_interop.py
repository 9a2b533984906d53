"""Numerical parity for the torch->flax weight converter.

torchvision is not available in this image (nor importable from the reference,
which depends on it), so the golden models are built from raw torch.nn
primitives following the standard public ResNet/monodepth2 layouts.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax.numpy as jnp

from improving_segmentation_with_selfsupervised_depth_tpu.engine.torch_interop import (
    convert_depth_decoder,
    convert_pose_decoder,
    convert_resnet_encoder,
)
from improving_segmentation_with_selfsupervised_depth_tpu.models import (
    DepthDecoder,
    PoseDecoder,
    ResNetEncoder,
)


# ---- minimal torch ResNet (standard public architecture) ----
class TBasic(nn.Module):
    expansion = 1

    def __init__(self, inp, planes, stride=1, dilation=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inp, planes, 3, stride, dilation, dilation, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, dilation, dilation, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + idn)


class TBottle(nn.Module):
    expansion = 4

    def __init__(self, inp, planes, stride=1, dilation=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inp, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, dilation, dilation, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = downsample
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idn)


class TResNet(nn.Module):
    def __init__(self, block, layers, dilate=(False, False, False)):
        super().__init__()
        self.inplanes, self.dilation = 64, 1
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make(block, 64, layers[0])
        self.layer2 = self._make(block, 128, layers[1], 2, dilate[0])
        self.layer3 = self._make(block, 256, layers[2], 2, dilate[1])
        self.layer4 = self._make(block, 512, layers[3], 2, dilate[2])

    def _make(self, block, planes, blocks, stride=1, dilate=False):
        downsample = None
        prev_dil = self.dilation
        if dilate:
            self.dilation *= stride
            stride = 1
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * block.expansion, 1, stride, bias=False),
                nn.BatchNorm2d(planes * block.expansion))
        mods = [block(self.inplanes, planes, stride, prev_dil, downsample)]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            mods.append(block(self.inplanes, planes, 1, self.dilation))
        return nn.Sequential(*mods)

    def forward(self, x):
        x = (x - 0.45) / 0.225
        f0 = self.relu(self.bn1(self.conv1(x)))
        f1 = self.layer1(self.maxpool(f0))
        f2 = self.layer2(f1)
        f3 = self.layer3(f2)
        f4 = self.layer4(f3)
        return [f0, f1, f2, f3, f4]


@pytest.mark.parametrize("depth,block,layers,dilate", [
    (18, TBasic, (2, 2, 2, 2), None),
    (50, TBottle, (3, 4, 6, 3), (False, False, True)),
])
def test_resnet_encoder_matches_torch_golden(depth, block, layers, dilate):
    torch.manual_seed(0)
    tnet = TResNet(block, layers, dilate or (False, False, False)).eval()
    # randomize BN stats so eval-mode parity is meaningful
    for m in tnet.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
    sd = {"encoder." + k: v for k, v in tnet.state_dict().items()}
    params, stats = convert_resnet_encoder(sd, depth)

    x = np.random.default_rng(0).uniform(0, 1, (1, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x))

    model = ResNetEncoder(depth=depth, replace_stride_with_dilation=dilate)
    got = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    for i, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_allclose(
            np.asarray(g).transpose(0, 3, 1, 2), r.numpy(), rtol=2e-4, atol=2e-4,
            err_msg=f"feature {i}")


# ---- monodepth2-style decoder golden (public architecture) ----
class TConv3x3(nn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.pad = nn.ReflectionPad2d(1)
        self.conv = nn.Conv2d(i, o, 3)

    def forward(self, x):
        return self.conv(self.pad(x))


class TConvBlock(nn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.block = nn.Sequential(TConv3x3(i, o), nn.Identity(), nn.ELU(inplace=True))

    def forward(self, x):
        return self.block(x)


def test_depth_decoder_conversion_numeric():
    """Assemble a torch decoder with the reference's ModuleList key layout
    (decoder.N.block.0.conv.*) and check disp parity after conversion."""
    torch.manual_seed(1)
    ch_enc = (64, 64, 128, 256, 512)
    ch_dec = (16, 32, 64, 128, 256)
    convs = []
    for i in range(4, -1, -1):
        ci = ch_enc[-1] if i == 4 else ch_dec[i + 1]
        convs.append(TConvBlock(ci, ch_dec[i]))                       # upconv i 0
        ci2 = ch_dec[i] + (ch_enc[i - 1] if i > 0 else 0)
        if i > 0:
            convs.append(nn.Identity())                               # skip_proj
        convs.append(TConvBlock(ci2, ch_dec[i]))                      # upconv i 1
    for s in range(4):
        convs.append(TConv3x3(ch_dec[s], 1))                          # dispconv
    tdec = nn.ModuleList(convs)
    sd = {f"decoder.{n}.{k}": v for n, m in enumerate(tdec)
          for k, v in m.state_dict().items()}

    params, stats = convert_depth_decoder(sd, scales=(0, 1, 2, 3))

    rng = np.random.default_rng(1)
    h, w = 64, 96
    feats = [rng.standard_normal((1, c, h // (2 ** (i + 1) if i else 2),
                                  w // (2 ** (i + 1) if i else 2))).astype(np.float32)
             for i, c in enumerate(ch_enc)]

    # torch forward replicating the decoder dataflow
    def tforward():
        idx = 0
        x = torch.from_numpy(feats[-1])
        outs = {}
        with torch.no_grad():
            for i in range(4, -1, -1):
                x = tdec[idx](x); idx += 1
                x = torch.nn.functional.interpolate(x, scale_factor=2, mode="nearest")
                cat = [x]
                if i > 0:
                    idx += 1  # Identity skip_proj
                    cat.append(torch.from_numpy(feats[i - 1]))
                x = tdec[idx](torch.cat(cat, 1)); idx += 1
                outs[i] = x
            disps = {}
            for s in range(4):
                disps[s] = torch.sigmoid(tdec[idx](outs[s])); idx += 1
        return disps

    ref = tforward()
    dec = DepthDecoder(num_ch_enc=ch_enc, scales=(0, 1, 2, 3))
    got = dec.apply({"params": params, "batch_stats": stats},
                    [jnp.asarray(f.transpose(0, 2, 3, 1)) for f in feats], train=False)
    for s in range(4):
        np.testing.assert_allclose(
            np.asarray(got[f"disp_{s}"]).transpose(0, 3, 1, 2), ref[s].numpy(),
            rtol=1e-3, atol=1e-5, err_msg=f"disp {s}")


def test_pose_decoder_conversion_numeric():
    torch.manual_seed(2)
    net = nn.ModuleList([
        nn.Conv2d(512, 256, 1),
        nn.Conv2d(256, 256, 3, 1, 1),
        nn.Conv2d(256, 256, 3, 1, 1),
        nn.Conv2d(256, 12, 1),
    ])
    sd = {f"net.{i}.{k}": v for i, m in enumerate(net) for k, v in m.state_dict().items()}
    params = convert_pose_decoder(sd)

    rng = np.random.default_rng(2)
    feat = rng.standard_normal((2, 512, 2, 3)).astype(np.float32)
    with torch.no_grad():
        out = torch.relu(net[0](torch.from_numpy(feat)))
        out = torch.relu(net[1](out))
        out = torch.relu(net[2](out))
        out = net[3](out).mean(3).mean(2)
        out = 0.01 * out.view(-1, 2, 1, 6)
        aa_ref, tr_ref = out[..., :3], out[..., 3:]

    dec = PoseDecoder(num_input_features=1, num_frames_to_predict_for=2)
    aa, tr = dec.apply({"params": params}, [[jnp.asarray(feat.transpose(0, 2, 3, 1))]])
    np.testing.assert_allclose(np.asarray(aa), aa_ref.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(tr), tr_ref.numpy(), rtol=1e-4, atol=1e-6)
