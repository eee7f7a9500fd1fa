"""Torch -> flax weight-converter parity oracles.

Builds the REFERENCE torch modules (resnet_backbone / rot_head /
trans_head from /root/reference/EPro-PnP-6DoF/lib/models, with
torchvision-compatible blocks defined here since torchvision is absent),
randomizes their weights AND BatchNorm running stats, converts the state
dict with ``epropnp_tpu.utils.torch_convert``, and asserts feature-level
parity of the flax model in eval mode.
"""

import importlib.util
import os

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from epropnp_tpu.models.backbones.resnet import ResNetBackbone  # noqa: E402
from epropnp_tpu.models.cdpn import CDPN  # noqa: E402
from epropnp_tpu.utils import torch_convert as tc  # noqa: E402

REF_MODELS = '/root/reference/EPro-PnP-6DoF/lib/models'
pytestmark = pytest.mark.skipif(not os.path.isdir(REF_MODELS),
                                reason='reference checkout unavailable')


def _load_ref(name):
    spec = importlib.util.spec_from_file_location(
        f'ref_{name}', os.path.join(REF_MODELS, name + '.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# torchvision-canonical residual blocks (torchvision.models.resnet), the
# `block` argument the reference backbone receives from lib/model.py
class BasicBlock(torch.nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(inplanes, planes, 3, stride, 1,
                                     bias=False)
        self.bn1 = torch.nn.BatchNorm2d(planes)
        self.relu = torch.nn.ReLU(inplace=True)
        self.conv2 = torch.nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class Bottleneck(torch.nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(planes)
        self.conv2 = torch.nn.Conv2d(planes, planes, 3, stride, 1,
                                     bias=False)
        self.bn2 = torch.nn.BatchNorm2d(planes)
        self.conv3 = torch.nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = torch.nn.BatchNorm2d(planes * 4)
        self.relu = torch.nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


def _randomize(module, gen):
    """Non-trivial weights AND running stats (defaults are degenerate)."""
    sd = module.state_dict()
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            if k.endswith('running_var'):
                sd[k] = torch.rand(v.shape, generator=gen) * 2 + 0.5
            else:
                sd[k] = torch.randn(v.shape, generator=gen) * 0.05
        elif k.endswith('num_batches_tracked'):
            sd[k] = torch.ones_like(v)
    module.load_state_dict(sd)


@pytest.mark.parametrize('depth,block,layers', [
    (18, BasicBlock, (2, 2, 2, 2)),
    (50, Bottleneck, (3, 4, 6, 3)),
])
def test_backbone_feature_parity(depth, block, layers):
    ref_bb = _load_ref('resnet_backbone')
    gen = torch.Generator().manual_seed(depth)
    net = ref_bb.ResNetBackboneNet(block, list(layers))
    _randomize(net, gen)
    net.eval()
    x = torch.randn(1, 3, 64, 64, generator=gen)
    with torch.no_grad():
        y_t = net(x).numpy()  # (1, C, 2, 2)

    variables = tc.resnet_backbone_variables(
        {k: v.numpy() for k, v in net.state_dict().items()}, depth)
    model = ResNetBackbone(depth=depth, out_indices=(4,))
    y_j, = model.apply(variables, jnp.asarray(
        x.numpy().transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(y_j).transpose(0, 3, 1, 2),
                               y_t, rtol=1e-4, atol=1e-4)


def test_cdpn_full_parity():
    """Full CDPN: backbone + rot head + trans head, checkpoint naming
    (backbone./rot_head_net./trans_head_net. prefixes as in the released
    files, lib/model.py:35-78)."""
    ref_bb = _load_ref('resnet_backbone')
    ref_rot = _load_ref('resnet_rot_head')
    ref_trans = _load_ref('resnet_trans_head')
    gen = torch.Generator().manual_seed(7)

    class TorchCDPN(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = ref_bb.ResNetBackboneNet(
                BasicBlock, [2, 2, 2, 2])
            self.rot_head_net = ref_rot.RotHeadNet(512)
            self.trans_head_net = ref_trans.TransHeadNet(512)

        def forward(self, x):
            feat = self.backbone(x)
            return self.rot_head_net(feat), self.trans_head_net(feat)

    net = TorchCDPN()
    _randomize(net, gen)
    net.eval()
    x = torch.randn(1, 3, 256, 256, generator=gen)
    with torch.no_grad():
        (x3d_t, w2d_t, scale_t), trans_t = net(x)

    sd = {k: v.numpy() for k, v in net.state_dict().items()}
    variables = tc.cdpn_variables(sd, depth=18)
    model = CDPN(depth=18)
    out = model.apply(variables, jnp.asarray(
        x.numpy().transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(
        np.asarray(out.noc).transpose(0, 3, 1, 2), x3d_t.numpy(),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out.w2d).transpose(0, 3, 1, 2), w2d_t.numpy(),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.scale), scale_t.numpy(),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.trans), trans_t.numpy(),
                               rtol=1e-4, atol=2e-4)


def test_merge_pretrained_backbone_only():
    """ImageNet-style init: graft a converted backbone into fresh CDPN
    variables; heads keep their init (lib/model.py:95-105 semantics)."""
    ref_bb = _load_ref('resnet_backbone')
    gen = torch.Generator().manual_seed(3)
    net = ref_bb.ResNetBackboneNet(BasicBlock, [2, 2, 2, 2])
    _randomize(net, gen)
    bb = tc.resnet_backbone_variables(
        {k: v.numpy() for k, v in net.state_dict().items()}, 18)

    model = CDPN(depth=18)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    fresh_rot = variables['params']['rot_head']['out_layer']['kernel']
    merged = tc.merge_pretrained(
        dict(variables),
        {'params': {'backbone': bb['params']},
         'batch_stats': {'backbone': bb['batch_stats']}})
    np.testing.assert_array_equal(
        merged['params']['backbone']['conv1']['kernel'],
        bb['params']['conv1']['kernel'])
    np.testing.assert_array_equal(
        merged['params']['rot_head']['out_layer']['kernel'], fresh_rot)
    # shape mismatch is refused
    bad = {'params': {'backbone': {'conv1': {
        'kernel': np.zeros((1, 1, 1, 1), np.float32)}}}}
    with pytest.raises(ValueError, match='shape mismatch'):
        tc.merge_pretrained(dict(variables), bad)


def test_det_backbone_fpn_structural_roundtrip():
    """DCN backbone + FPN converters: synthesize an mmdet-style state
    dict with the exact reference naming/shapes, convert, and merge onto
    fresh flax variables with allow_missing=False — proving the mapping
    covers every leaf on both sides (shapes checked by merge)."""
    from epropnp_tpu.models.necks.fpn import FPN
    from epropnp_tpu.models.backbones.resnet import resnet_spec

    depth, dcn_stages = 50, (3, 4)
    rng = np.random.default_rng(0)
    _, stage_sizes, widths = resnet_spec[depth]

    sd = {'backbone.conv1.weight': rng.normal(size=(64, 3, 7, 7)),
          **{f'backbone.bn1.{s}': rng.normal(size=(64,))
             for s in ('weight', 'bias', 'running_mean', 'running_var')}}
    inplanes = 64
    for stage, (n, w) in enumerate(zip(stage_sizes, widths), start=1):
        for i in range(n):
            t = f'backbone.layer{stage}.{i}'
            cin = inplanes if i == 0 else w * 4
            sd[f'{t}.conv1.weight'] = rng.normal(size=(w, cin, 1, 1))
            sd[f'{t}.conv2.weight'] = rng.normal(size=(w, w, 3, 3))
            sd[f'{t}.conv3.weight'] = rng.normal(size=(w * 4, w, 1, 1))
            if stage in dcn_stages:
                sd[f'{t}.conv2.conv_offset.weight'] = \
                    rng.normal(size=(27, w, 3, 3))
                sd[f'{t}.conv2.conv_offset.bias'] = rng.normal(size=(27,))
            for j, ch in ((1, w), (2, w), (3, w * 4)):
                for s in ('weight', 'bias', 'running_mean', 'running_var'):
                    sd[f'{t}.bn{j}.{s}'] = rng.normal(size=(ch,))
            if i == 0:
                sd[f'{t}.downsample.0.weight'] = \
                    rng.normal(size=(w * 4, cin, 1, 1))
                for s in ('weight', 'bias', 'running_mean', 'running_var'):
                    sd[f'{t}.downsample.1.{s}'] = rng.normal(size=(w * 4,))
        inplanes = w * 4
    for i, cin in enumerate((256, 512, 1024, 2048)):
        sd[f'neck.lateral_convs.{i}.conv.weight'] = \
            rng.normal(size=(256, cin, 1, 1))
        sd[f'neck.lateral_convs.{i}.conv.bias'] = rng.normal(size=(256,))
    for i in range(6):
        cin = 256
        k = 3
        sd[f'neck.fpn_convs.{i}.conv.weight'] = \
            rng.normal(size=(256, cin, k, k))
        sd[f'neck.fpn_convs.{i}.conv.bias'] = rng.normal(size=(256,))
    sd = {k: v.astype(np.float32) for k, v in sd.items()}

    bb_conv = tc.det_backbone_variables(sd, depth, dcn_stages)
    fpn_conv = tc.fpn_variables(sd)

    bb = ResNetBackbone(depth=depth, out_indices=(1, 2, 3, 4),
                        dcn_stages=dcn_stages)
    bb_vars = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                      train=False)
    merged = tc.merge_pretrained(dict(bb_vars), bb_conv,
                                 allow_missing=False)
    # DCN offset channel order: per-tap (dy, dx) -> (dx, dy) swap
    off = merged['params']['layer3_block1']['DeformConv_0']['conv_offset']
    t_off = sd['backbone.layer3.1.conv2.conv_offset.weight']
    np.testing.assert_array_equal(
        np.asarray(off['kernel'])[..., 0],
        tc.conv_kernel(t_off)[..., 1])
    np.testing.assert_array_equal(
        np.asarray(off['kernel'])[..., 18:],
        tc.conv_kernel(t_off)[..., 18:])

    fpn = FPN(in_channels=(256, 512, 1024, 2048), out_channels=256,
              num_outs=6)
    feats = tuple(jnp.zeros((1, 16 // s, 16 // s, c), jnp.float32)
                  for s, c in ((1, 256), (2, 512), (4, 1024), (8, 2048)))
    fpn_vars = fpn.init(jax.random.PRNGKey(0), feats)
    tc.merge_pretrained(dict(fpn_vars),
                        {'params': fpn_conv['params']},
                        allow_missing=False)
