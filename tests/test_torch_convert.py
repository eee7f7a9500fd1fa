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


def _synth_backbone_neck_sd(depth=50, dcn_stages=(3, 4), seed=0):
    """mmdet-style backbone(+DCN)+FPN state dict with reference naming."""
    from epropnp_tpu.models.backbones.resnet import resnet_spec

    rng = np.random.default_rng(seed)
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
        sd[f'neck.fpn_convs.{i}.conv.weight'] = \
            rng.normal(size=(256, 256, 3, 3))
        sd[f'neck.fpn_convs.{i}.conv.bias'] = rng.normal(size=(256,))
    return {k: v.astype(np.float32) for k, v in sd.items()}


def test_det_backbone_fpn_structural_roundtrip():
    """DCN backbone + FPN converters: synthesize an mmdet-style state
    dict with the exact reference naming/shapes, convert, and merge onto
    fresh flax variables with allow_missing=False — proving the mapping
    covers every leaf on both sides (shapes checked by merge)."""
    from epropnp_tpu.models.necks.fpn import FPN

    depth, dcn_stages = 50, (3, 4)
    sd = _synth_backbone_neck_sd(depth, dcn_stages)
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


# --------------------------------------------------------------- Det head
# torch replicas with the exact mmcv/mmdet naming of the reference
# DeformPnPHead (deform_pnp_head.py _init_convs/_init_out_layers +
# constructor) so state_dict() produces checkpoint-identical keys/shapes.

def _gn_ch(ch, preferred=32):
    g = min(preferred, ch)
    while ch % g:
        g -= 1
    return g


class _MMConv(torch.nn.Module):
    """mmcv ConvModule: conv (+ optional DCNv2 conv_offset) -> GN -> ReLU."""

    def __init__(self, cin, cout, k=3, dcn=False):
        super().__init__()
        self.conv = torch.nn.Conv2d(cin, cout, k, padding=k // 2, bias=False)
        if dcn:
            self.conv.conv_offset = torch.nn.Conv2d(cin, 27, 3, padding=1)
        self.gn = torch.nn.GroupNorm(_gn_ch(cout), cout)

    def forward(self, x):
        return torch.relu(self.gn(self.conv(x)))


class _ConvOnly(torch.nn.Module):
    """mmcv ConvModule with norm_cfg=None, bias=False: conv -> ReLU."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv = torch.nn.Conv2d(cin, cout, 3, padding=1, bias=False)


class _TorchFCOSEmb(torch.nn.Module):
    """Reference FCOSEmbHead module tree (fcos_emb_head.py:91-146)."""

    def __init__(self, classes, feat, emb, branch, dcn):
        super().__init__()
        ml = torch.nn.ModuleList
        self.cls_convs = ml([_MMConv(feat, feat),
                             _MMConv(feat, feat, dcn=dcn)])
        self.reg_convs = ml([_MMConv(feat, feat),
                             _MMConv(feat, feat, dcn=dcn)])
        self.conv_cls_prev = ml([_MMConv(feat, branch['cls'])])
        self.conv_centerness_prev = ml([_MMConv(feat, branch['ctr'])])
        self.conv_offset_prev = ml([_MMConv(feat, branch['off'])])
        self.conv_emb_prev = ml([_MMConv(feat, branch['emb'])])
        self.conv_cls = torch.nn.Conv2d(branch['cls'], classes, 1)
        self.conv_centerness = torch.nn.Conv2d(branch['ctr'], 1, 1)
        self.conv_offset = torch.nn.Conv2d(branch['off'], 2, 1)
        self.conv_emb = _MMConv(branch['emb'], emb, k=1)

    def forward(self, x, stride):
        """forward_single (fcos_emb_head.py:165-198), no-DCN towers."""
        cls_feat = reg_feat = x
        for m in self.cls_convs:
            cls_feat = m(cls_feat)
        for m in self.reg_convs:
            reg_feat = m(reg_feat)
        cls_score = self.conv_cls(self.conv_cls_prev[0](cls_feat))
        centerness = self.conv_centerness(
            self.conv_centerness_prev[0](reg_feat))
        offset = self.conv_offset(self.conv_offset_prev[0](reg_feat)) * stride
        obj_emb = self.conv_emb(self.conv_emb_prev[0](reg_feat))
        return cls_score, offset, centerness, obj_emb


class _TorchFFN(torch.nn.Module):
    """mmcv FFN naming: layers.0.0 / layers.1 Linears, residual add."""

    def __init__(self, e, h):
        super().__init__()
        self.layers = torch.nn.Sequential(
            torch.nn.Sequential(torch.nn.Linear(e, h), torch.nn.ReLU(),
                                torch.nn.Dropout(0.0)),
            torch.nn.Linear(h, e), torch.nn.Dropout(0.0))

    def forward(self, x, identity=None):
        return (x if identity is None else identity) + self.layers(x)


class _TorchMHA(torch.nn.Module):
    def __init__(self, e):
        super().__init__()
        self.attn = torch.nn.MultiheadAttention(e, 1, batch_first=True)


class _TorchPtsTrans(torch.nn.Module):
    """mmcv BaseTransformerLayer('self_attn', 'norm', 'ffn', 'norm')."""

    def __init__(self, e=32, h=256):
        super().__init__()
        self.attentions = torch.nn.ModuleList([_TorchMHA(e)])
        self.norms = torch.nn.ModuleList(
            [torch.nn.LayerNorm(e), torch.nn.LayerNorm(e)])
        self.ffns = torch.nn.ModuleList([_TorchFFN(e, h)])

    def forward(self, x, pos):
        out, _ = self.attentions[0].attn(x + pos, x + pos, x,
                                         need_weights=False)
        x = self.norms[0](x + out)
        return self.norms[1](self.ffns[0](x, x))


class _TorchScale(torch.nn.Module):
    def __init__(self, v=0.1):
        super().__init__()
        self.scale = torch.nn.Parameter(torch.tensor(float(v)))


class _TorchGroupLinear(torch.nn.Module):
    def __init__(self, i, o, g):
        super().__init__()
        self.weight = torch.nn.Parameter(torch.randn(g, o // g, i // g))
        self.bias = torch.nn.Parameter(torch.randn(g, o // g))


class _TorchSampler(torch.nn.Module):
    """DeformableAttentionSampler module tree (sampler:40-44)."""

    def __init__(self, e=256, heads=8, pts=32, ffn_ch=1024):
        super().__init__()
        self.sampling_offsets = torch.nn.Linear(e, heads * pts * 2)
        self.out_proj = torch.nn.Linear(e, e)
        self.layer_norms = torch.nn.ModuleList(
            [torch.nn.LayerNorm(e), torch.nn.LayerNorm(e)])
        self.ffn = _TorchFFN(e, ffn_ch)


class _TorchDetHead(torch.nn.Module):
    """Full reference DeformPnPHead module tree (naming + shapes)."""

    def __init__(self, classes=10, e=256, heads=8, pts=32,
                 lvl_ch=(256, 128, 128), dense_ch=256, n_attrs=9):
        super().__init__()
        d = e // heads
        self.detector = _TorchFCOSEmb(
            classes, 256, e, dict(cls=256, ctr=64, off=256, emb=256),
            dcn=True)
        convs, cin = [], 256
        for ch in lvl_ch:
            convs.append(_ConvOnly(cin, ch))
            cin = ch
        self.convs = torch.nn.ModuleList(convs)
        self.conv_upsampled = _MMConv(lvl_ch[-1] * 4, dense_ch, k=1)
        self.k_proj = torch.nn.Conv2d(dense_ch + e, e, 1)
        self.v_proj = torch.nn.Conv2d(dense_ch, e, 1)
        self.query_scale = _TorchScale()
        self.query_proj = torch.nn.Linear(e, e)
        self.pred_fc = torch.nn.Sequential(
            torch.nn.Linear(e, e), torch.nn.ReLU(),
            torch.nn.Linear(e, e), torch.nn.ReLU())
        self.dim_branch = torch.nn.Linear(e, classes * 3)
        self.score_branch = torch.nn.Linear(e, 1)
        self.scale_branch = torch.nn.Linear(e, 2)
        self.velo_branch = torch.nn.Linear(e, 2)
        self.attr_branch = torch.nn.Linear(e, n_attrs)
        self.attention_sampler = _TorchSampler(e, heads, pts)
        self.obj_query_scale = torch.nn.ModuleList([_TorchScale()])
        self.pts_trans = torch.nn.ModuleList([_TorchPtsTrans(d, 256)])
        self.x2d_pos_enc = torch.nn.Linear(2, d)
        self.corr_regs = torch.nn.ModuleList(
            [_TorchGroupLinear(e, heads * 5, heads) for _ in range(2)])


def _np_sd(module, prefix=''):
    return {prefix + k: v.numpy() for k, v in module.state_dict().items()}


def test_fcos_emb_head_functional_parity():
    """FCOSEmbHead converter vs a reference-architecture torch module
    (no-DCN towers; the DCN layout is oracle-tested via the backbone
    roundtrip + deform-conv zero-offset test)."""
    from epropnp_tpu.models.dense_heads.fcos_emb_head import FCOSEmbHead

    gen = torch.Generator().manual_seed(11)
    feat = 32
    net = _TorchFCOSEmb(classes=4, feat=feat, emb=32,
                        branch=dict(cls=32, ctr=32, off=32, emb=32),
                        dcn=False)
    _randomize(net, gen)
    net.eval()
    x = torch.randn(2, feat, 8, 12, generator=gen)
    stride = 16
    with torch.no_grad():
        cls_t, off_t, ctr_t, emb_t = net(x, stride)

    conv = tc.fcos_emb_head_variables(_np_sd(net), prefix='',
                                      dcn_on_last_conv=False)
    head = FCOSEmbHead(num_classes=4, in_channels=feat, feat_channels=feat,
                       strides=(stride,), emb_channels=32, cls_branch=(32,),
                       centerness_branch=(32,), offset_branch=(32,),
                       emb_branch=(32,), dcn_on_last_conv=False)
    out, = head.apply({'params': conv['params']},
                      (jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),))

    def chw(a):
        return np.asarray(a).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(chw(out.cls_score), cls_t.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(chw(out.centerness), ctr_t.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(chw(out.obj_emb), emb_t.numpy(),
                               rtol=1e-4, atol=1e-5)
    pts = np.asarray(out.points).reshape(8, 12, 2).transpose(2, 0, 1)
    np.testing.assert_allclose(chw(out.center) - pts[None], off_t.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_pts_transformer_parity():
    """MultiheadAttention in_proj split + mmcv FFN/LN naming vs torch."""
    from epropnp_tpu.models.dense_heads.pts_transformer import (
        PtsTransformerLayer)

    gen = torch.Generator().manual_seed(5)
    net = _TorchPtsTrans(32, 64)
    _randomize(net, gen)
    net.eval()
    x = torch.randn(3, 10, 32, generator=gen)
    pos = torch.randn(3, 10, 32, generator=gen)
    with torch.no_grad():
        y_t = net(x, pos).numpy()

    conv = tc.pts_transformer_variables(_np_sd(net), prefix='')
    layer = PtsTransformerLayer(embed_dims=32, ffn_dims=64)
    y_j = layer.apply(conv, jnp.asarray(x.numpy()), jnp.asarray(pos.numpy()))
    np.testing.assert_allclose(np.asarray(y_j), y_t, rtol=1e-4, atol=1e-5)


def test_attention_sampler_functional_parity():
    """Converted sampler weights drive our flax DeformableAttentionSampler
    to the REFERENCE module's outputs (loaded under the mmcv shim)."""
    from ref_loader import load_reference_det_sampler
    from epropnp_tpu.ops.deformable_attention import (
        DeformableAttentionSampler)

    ref = load_reference_det_sampler()
    if ref is None:
        pytest.skip('reference sampler unavailable')
    e, heads, pts, stride = 32, 4, 6, 4
    net = ref.DeformableAttentionSampler(
        embed_dims=e, num_heads=heads, num_points=pts, stride=stride,
        ffn_cfg=dict(type='FFN', embed_dims=e, feedforward_channels=64,
                     num_fcs=2, ffn_drop=0.0))
    gen = torch.Generator().manual_seed(3)
    _randomize(net, gen)
    net.eval()

    n_img, h, w, n_obj = 2, 6, 9, 5
    query = torch.randn(n_obj, heads, 1, e // heads, generator=gen)
    obj_emb = torch.randn(n_obj, e, generator=gen)
    key = torch.randn(n_img, e, h, w, generator=gen)
    value = torch.randn(n_img, e, h, w, generator=gen)
    x2d = torch.randn(n_img, 2, h, w, generator=gen)
    mask = torch.rand(n_img, 1, h, w, generator=gen)
    # centers inside the image, offsets can still land out of bounds
    xy = torch.rand(n_obj, 2, generator=gen) \
        * torch.tensor([w * stride - 1.0, h * stride - 1.0])
    strides = torch.full((n_obj,), 8.0)
    img_ind = torch.tensor([0, 1, 1, 0, 1])
    with torch.no_grad():
        out_t = net(query, obj_emb, key, value, x2d, mask, xy, strides,
                    img_ind)

    conv = tc.attention_sampler_variables(_np_sd(net), prefix='')
    sampler = DeformableAttentionSampler(embed_dims=e, num_heads=heads,
                                         num_points=pts, stride=stride,
                                         ffn_dim=64)

    def nhwc(t):
        return jnp.asarray(t.numpy().transpose(0, 2, 3, 1))

    out_j = sampler.apply(conv, jnp.asarray(query.numpy()),
                          jnp.asarray(obj_emb.numpy()), nhwc(key),
                          nhwc(value), nhwc(x2d), nhwc(mask),
                          jnp.asarray(xy.numpy()),
                          jnp.asarray(strides.numpy()),
                          jnp.asarray(img_ind.numpy()))
    for ours, theirs in zip(
            (out_j.output, out_j.v_samples, out_j.a_samples,
             out_j.mask_samples, out_j.x2d_samples), out_t):
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                                   rtol=1e-4, atol=1e-4)


def test_det_full_checkpoint_ingestion(tmp_path):
    """Full released-checkpoint ingestion, two-sided: every tensor of a
    synthesized reference checkpoint (backbone.`/`neck.`/`bbox_head.`)
    lands on a model leaf and no model leaf is left unconverted
    (allow_missing=False), then the .pth driver path (init_detector)
    grafts the same values."""
    import dataclasses as dc
    from epropnp_tpu.det.api import build_detector, init_detector
    from epropnp_tpu.det.config import DetConfig

    sd = _synth_backbone_neck_sd(depth=50, dcn_stages=(3, 4))
    head = _TorchDetHead()
    _randomize(head, torch.Generator().manual_seed(2))
    sd.update(_np_sd(head, prefix='bbox_head.'))

    cfg = dc.replace(DetConfig.basic(), backbone_depth=50,
                     dcn_modulation_scale=1.0)
    model = build_detector(cfg)
    variables = dict(model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 128, 256, 3)), (128, 256)))
    conv = tc.det_model_variables(sd, depth=50)
    merged = tc.merge_pretrained(dict(variables), conv, allow_missing=False)
    assert np.asarray(
        merged['params']['head']['query_scale']).item() == pytest.approx(
        sd['bbox_head.query_scale.scale'].item())

    # driver dispatch: torch .pth -> init_detector -> same grafted values
    path = tmp_path / 'released.pth'
    torch.save({'state_dict': {k: torch.from_numpy(v)
                               for k, v in sd.items()}}, path)
    _, vars2 = init_detector(cfg, str(path), img_hw=(128, 256))
    np.testing.assert_allclose(
        np.asarray(vars2['params']['head']['query_proj']['kernel']),
        tc.dense_kernel(sd['bbox_head.query_proj.weight']), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(vars2['params']['backbone']['conv1']['kernel']),
        tc.conv_kernel(sd['backbone.conv1.weight']), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(vars2['params']['head']['detector']['cls_dcn1']
                   ['conv_offset']['bias'])[-9:],
        sd['bbox_head.detector.cls_convs.1.conv.conv_offset.bias'][-9:],
        rtol=1e-6)


def test_load_torch_variables_torchvision_backbone(tmp_path):
    """torchvision ImageNet file (top-level conv1.weight, plain convs,
    + fc.*) grafts the backbone only — the reference's
    init_cfg=Pretrained torchvision://resnet101 (basic.py:18); stage-3/4
    conv2 kernels land in the DeformConv matmul layout with zero offsets,
    and the head keeps its fresh init."""
    import dataclasses as dc
    from epropnp_tpu.det.api import build_detector, load_torch_variables
    from epropnp_tpu.det.config import DetConfig

    sd = {k[len('backbone.'):]: v
          for k, v in _synth_backbone_neck_sd(depth=50, dcn_stages=()).items()
          if k.startswith('backbone.')}
    sd['fc.weight'] = np.zeros((1000, 2048), np.float32)
    sd['fc.bias'] = np.zeros((1000,), np.float32)
    path = tmp_path / 'resnet50.pth'
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)

    cfg = dc.replace(DetConfig.basic(), backbone_depth=50)
    model = build_detector(cfg)
    variables = dict(model.init(jax.random.PRNGKey(0),
                                jnp.zeros((1, 128, 256, 3)), (128, 256)))
    fresh_head = variables['params']['head']['query_proj']['kernel']
    merged = load_torch_variables(cfg, variables, str(path))

    np.testing.assert_allclose(
        np.asarray(merged['params']['backbone']['conv1']['kernel']),
        tc.conv_kernel(sd['conv1.weight']), rtol=1e-6)
    # DCN graft: plain conv2 -> matmul-layout kernel + zero offset conv
    blk = merged['params']['layer3_block0'] \
        if 'layer3_block0' in merged['params'] \
        else merged['params']['backbone']['layer3_block0']
    dcn = blk['DeformConv_0']
    w = sd['layer3.0.conv2.weight']
    np.testing.assert_allclose(
        np.asarray(dcn['kernel']),
        tc.conv_kernel(w).reshape(9 * w.shape[1], w.shape[0]), rtol=1e-6)
    assert not np.any(np.asarray(dcn['conv_offset']['kernel']))
    np.testing.assert_array_equal(
        np.asarray(merged['params']['head']['query_proj']['kernel']),
        np.asarray(fresh_head))
