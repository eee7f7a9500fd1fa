"""Torch -> flax weight conversion (pretrained-weight ingestion).

Every published reference number starts from pretrained torch weights:
torchvision ImageNet init for the 6DoF backbone
(EPro-PnP-6DoF/lib/model.py:95-105), the released CDPN stage-1 checkpoint
for the two best 6DoF configs (EPro-PnP-6DoF/README.md:75-76), and
pretrained R101 for the Det suite. This module converts torch state dicts
(torchvision naming: ``conv1``, ``bn1``, ``layer{s}.{i}.conv{j}``, ...)
into the variable pytrees of ``models/backbones/resnet.py`` and
``models/cdpn.py``.

Layout rules (validated by tests/test_torch_convert.py feature-parity
oracles against the reference torch modules):

- Conv2d weight (O, I, kH, kW)          -> Conv kernel (kH, kW, I, O)
- ConvTranspose2d weight (I, O, kH, kW) -> ConvTranspose kernel
  (kH, kW, I, O) with SPATIALLY FLIPPED taps (flax ``transpose_kernel=
  False`` convolves the kernel directly; torch computes the conv
  gradient, i.e. correlation with the flipped kernel)
- Linear weight (O, I)                  -> Dense kernel (I, O)
- BatchNorm2d weight/bias               -> params scale/bias;
  running_mean/var                      -> batch_stats mean/var

Pure numpy — no torch import needed once the state dict is materialized
(``load_torch_state_dict`` handles .pth loading when torch is present).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from ..models.backbones.resnet import resnet_spec


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint into a flat numpy state dict.

    Accepts raw state dicts and the reference's ``{'model': ...}`` /
    mmcv ``{'state_dict': ...}`` wrappers (EPro-PnP-6DoF/lib/model.py:
    81-92 strips the same); ``module.`` DDP prefixes are removed.
    """
    import torch
    obj = torch.load(path, map_location='cpu', weights_only=True)
    for key in ('state_dict', 'model', 'network'):
        if isinstance(obj, dict) and key in obj \
                and isinstance(obj[key], dict):
            obj = obj[key]
            break
    out = {}
    for k, v in obj.items():
        if k.startswith('module.'):
            k = k[len('module.'):]
        if hasattr(v, 'numpy'):
            out[k] = v.detach().cpu().numpy()
    return out


def conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def conv_transpose_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)).copy()


def dense_kernel(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _bn(sd: Dict, name: str) -> Tuple[Dict, Dict]:
    params = {'scale': sd[f'{name}.weight'], 'bias': sd[f'{name}.bias']}
    stats = {'mean': sd[f'{name}.running_mean'],
             'var': sd[f'{name}.running_var']}
    return params, stats


def resnet_backbone_variables(sd: Dict[str, np.ndarray], depth: int,
                              prefix: str = '') -> Dict:
    """torchvision-style ResNet state dict -> ``ResNetBackbone`` variables.

    ``prefix`` selects a submodule inside a larger checkpoint (e.g.
    ``'backbone.'`` for the CDPN checkpoint). Returns
    ``{'params': ..., 'batch_stats': ...}`` keyed for
    ``models/backbones/resnet.py`` (fc weights, present in torchvision
    zoo files, are ignored — the backbone has no classifier).
    """
    block_name, stage_sizes, _ = resnet_spec[depth]
    p = prefix
    params, stats = {}, {}
    params['conv1'] = {'kernel': conv_kernel(sd[f'{p}conv1.weight'])}
    params['bn1'], stats['bn1'] = _bn(sd, f'{p}bn1')

    # per-block torch->flax name tables (compact auto-numbering in
    # BasicBlock/Bottleneck: convs then the interleaved BatchNorms)
    if block_name == 'basic':
        convs = (('conv1', 'Conv_0'), ('conv2', 'Conv_1'))
        bns = (('bn1', 'BatchNorm_0'), ('bn2', 'BatchNorm_1'))
        ds_bn = 'BatchNorm_2'
    else:
        convs = (('conv1', 'Conv_0'), ('conv2', 'Conv_1'),
                 ('conv3', 'Conv_2'))
        bns = (('bn1', 'BatchNorm_0'), ('bn2', 'BatchNorm_1'),
               ('bn3', 'BatchNorm_2'))
        ds_bn = 'BatchNorm_3'

    for stage, n_blocks in enumerate(stage_sizes, start=1):
        for i in range(n_blocks):
            t = f'{p}layer{stage}.{i}'
            f = f'layer{stage}_block{i}'
            bp, bs = {}, {}
            for tc, fc in convs:
                bp[fc] = {'kernel': conv_kernel(sd[f'{t}.{tc}.weight'])}
            for tb, fb in bns:
                bp[fb], bs[fb] = _bn(sd, f'{t}.{tb}')
            if f'{t}.downsample.0.weight' in sd:
                bp['downsample_conv'] = {
                    'kernel': conv_kernel(sd[f'{t}.downsample.0.weight'])}
                bp[ds_bn], bs[ds_bn] = _bn(sd, f'{t}.downsample.1')
            params[f] = bp
            stats[f] = bs
    return {'params': params, 'batch_stats': stats}


def _rot_head_variables(sd: Dict, prefix: str, num_layers: int = 3) -> Dict:
    """RotHeadNet (resnet_rot_head.py:11-78) -> ``RotHead`` variables.

    torch ``features`` ModuleList index layout per upsample layer i:
    9i ConvTranspose, 9i+1 BN, 9i+3 Conv, 9i+4 BN, 9i+6 Conv, 9i+7 BN
    (ReLUs at 9i+2/5/8). flax compact numbering: ConvTranspose_i,
    BatchNorm_{3i..3i+2}, Conv_{2i}, Conv_{2i+1}.
    """
    p, params, stats = prefix, {}, {}
    for i in range(num_layers):
        params[f'ConvTranspose_{i}'] = {'kernel': conv_transpose_kernel(
            sd[f'{p}features.{9 * i}.weight'])}
        for j, t_idx in enumerate((9 * i + 1, 9 * i + 4, 9 * i + 7)):
            name = f'BatchNorm_{3 * i + j}'
            params[name], stats[name] = _bn(sd, f'{p}features.{t_idx}')
        params[f'Conv_{2 * i}'] = {'kernel': conv_kernel(
            sd[f'{p}features.{9 * i + 3}.weight'])}
        params[f'Conv_{2 * i + 1}'] = {'kernel': conv_kernel(
            sd[f'{p}features.{9 * i + 6}.weight'])}
    params['out_layer'] = {
        'kernel': conv_kernel(sd[f'{p}out_layer.weight']),
        'bias': sd[f'{p}out_layer.bias']}
    params['scale_branch'] = {
        'kernel': dense_kernel(sd[f'{p}scale_branch.weight']),
        'bias': sd[f'{p}scale_branch.bias']}
    return {'params': params, 'batch_stats': stats}


def _trans_head_variables(sd: Dict, prefix: str, num_layers: int = 3,
                          feat_hw: Tuple[int, int] = (8, 8)) -> Dict:
    """TransHeadNet (resnet_trans_head.py:10-67) -> ``TransHead``.

    The first Linear consumes the flattened conv feature: torch flattens
    NCHW (C major), flax flattens NHWC (H major) — the (256*8*8, 4096)
    kernel rows are permuted accordingly.
    """
    p, params, stats = prefix, {}, {}
    for i in range(num_layers):
        params[f'Conv_{i}'] = {'kernel': conv_kernel(
            sd[f'{p}features.{3 * i}.weight'])}
        name = f'BatchNorm_{i}'
        params[name], stats[name] = _bn(sd, f'{p}features.{3 * i + 1}')
    lin0 = dense_kernel(sd[f'{p}linears.0.weight'])  # (C*H*W, 4096)
    h, w = feat_hw
    c = lin0.shape[0] // (h * w)
    lin0 = lin0.reshape(c, h, w, -1).transpose(1, 2, 0, 3).reshape(
        h * w * c, -1)
    params['Dense_0'] = {'kernel': np.ascontiguousarray(lin0),
                         'bias': sd[f'{p}linears.0.bias']}
    params['Dense_1'] = {'kernel': dense_kernel(sd[f'{p}linears.2.weight']),
                         'bias': sd[f'{p}linears.2.bias']}
    params['Dense_2'] = {'kernel': dense_kernel(sd[f'{p}linears.4.weight']),
                         'bias': sd[f'{p}linears.4.bias']}
    return {'params': params, 'batch_stats': stats}


def cdpn_variables(sd: Dict[str, np.ndarray], depth: int = 34) -> Dict:
    """Full CDPN checkpoint (backbone + rot_head_net + trans_head_net,
    lib/models/CDPN.py:12-24) -> ``models/cdpn.py::CDPN`` variables.

    Use with the released CDPN stage-1 / EPro-PnP 6DoF checkpoints after
    ``load_torch_state_dict`` (the ``cdpn_init`` presets,
    sixdof/config.py). The MonteCarloPoseLoss EMA buffer, if present, is
    ignored — it lives in the train state here.
    """
    bb = resnet_backbone_variables(sd, depth, prefix='backbone.')
    rot = _rot_head_variables(sd, 'rot_head_net.')
    trans = _trans_head_variables(sd, 'trans_head_net.')
    return {
        'params': {'backbone': bb['params'], 'rot_head': rot['params'],
                   'trans_head': trans['params']},
        'batch_stats': {'backbone': bb['batch_stats'],
                        'rot_head': rot['batch_stats'],
                        'trans_head': trans['batch_stats']},
    }


def _deform_conv_variables(sd: Dict, t: str, features: int) -> Dict:
    """mmcv ``ModulatedDeformConv2dPack`` (DCNv2) -> ``ops/deform_conv
    .DeformConv`` params.

    mmcv's ``conv_offset`` output channels interleave (dy, dx) per tap
    followed by 9 mask channels; ours are (dx, dy) per tap + masks —
    the output-channel permutation swaps each pair. The dense kernel
    (O, I, 3, 3) flattens tap-major to our (9 * I, O) matmul layout.
    NOTE: converted checkpoints need ``modulation_scale=1.0`` on the
    DeformConv modules (mmcv modulation is plain sigmoid; our
    from-scratch default is sigmoid * 2 for identity-like zero-init).
    """
    w = sd[f'{t}.weight']
    taps = w.shape[2] * w.shape[3]
    kernel = conv_kernel(w).reshape(taps * w.shape[1], w.shape[0])
    bias = sd.get(f'{t}.bias', np.zeros(features, w.dtype))
    if f'{t}.conv_offset.weight' not in sd:
        # plain-conv source (torchvision ImageNet init): zero offset/mask
        # logits reproduce mmcv's zero-init conv_offset (output = sigmoid
        # (0) * modulation_scale * conv = the original dense conv at our
        # from-scratch default scale 2.0, or mmcv's 0.5x at scale 1.0)
        off_w = np.zeros((3 * taps,) + w.shape[1:], w.dtype)
        off_b = np.zeros(3 * taps, w.dtype)
        return {'kernel': np.ascontiguousarray(kernel), 'bias': bias,
                'conv_offset': {'kernel': conv_kernel(off_w),
                                'bias': off_b}}
    off_w = sd[f'{t}.conv_offset.weight']
    off_b = sd[f'{t}.conv_offset.bias']
    perm = [2 * i + (1 - j) for i in range(taps) for j in range(2)] \
        + list(range(2 * taps, 3 * taps))
    return {'kernel': np.ascontiguousarray(kernel), 'bias': bias,
            'conv_offset': {'kernel': conv_kernel(off_w[perm]),
                            'bias': off_b[perm]}}


def det_backbone_variables(sd: Dict[str, np.ndarray], depth: int = 101,
                           dcn_stages=(3, 4), prefix: str = 'backbone.',
                           ) -> Dict:
    """mmdet R-DCN backbone state dict -> ``ResNetBackbone`` variables.

    Same naming as torchvision except the 3x3 ``conv2`` of DCN-stage
    bottlenecks is a ``ModulatedDeformConv2dPack`` (reference
    configs/epropnp_det_basic.py: stage_with_dcn=(F, F, T, T)). In those
    blocks the flax compact numbering shifts: Conv_0 (reduce),
    DeformConv_0 (3x3), Conv_1 (expand), downsample unchanged.
    """
    block_name, stage_sizes, stage_channels = resnet_spec[depth]
    assert block_name == 'bottleneck', 'DCN backbones are bottleneck-based'
    base = resnet_backbone_variables(sd, depth, prefix)
    params, stats = base['params'], base['batch_stats']
    p = prefix
    for stage in dcn_stages:
        n_blocks = stage_sizes[stage - 1]
        width = stage_channels[stage - 1]
        for i in range(n_blocks):
            # ALL blocks of a DCN stage are DCNv2, incl. the stride-2
            # first block (fallback_on_stride=False in every reference
            # config); plain-conv sources get zero-init offsets
            t = f'{p}layer{stage}.{i}'
            f = f'layer{stage}_block{i}'
            bp = params[f]
            bp.pop('Conv_2', None)
            # renumber: expand conv (torch conv3) becomes Conv_1
            bp['Conv_1'] = {'kernel': conv_kernel(sd[f'{t}.conv3.weight'])}
            bp['DeformConv_0'] = _deform_conv_variables(
                sd, f'{t}.conv2', width)
    return {'params': params, 'batch_stats': stats}


def fpn_variables(sd: Dict[str, np.ndarray], num_laterals: int = 4,
                  num_extra: int = 2, prefix: str = 'neck.') -> Dict:
    """mmdet FPN state dict -> ``models/necks/fpn.py::FPN`` params.

    mmdet names: ``lateral_convs.{i}.conv``, ``fpn_convs.{i}.conv`` with
    the extra stride-2 output convs appended to ``fpn_convs``
    (add_extra_convs='on_output', basic.py neck). Ours: ``lateral_{i}``,
    ``fpn_conv_{i}``, ``extra_conv_{i}``.
    """
    p, params = prefix, {}
    for i in range(num_laterals):
        params[f'lateral_{i}'] = {
            'kernel': conv_kernel(sd[f'{p}lateral_convs.{i}.conv.weight']),
            'bias': sd[f'{p}lateral_convs.{i}.conv.bias']}
        params[f'fpn_conv_{i}'] = {
            'kernel': conv_kernel(sd[f'{p}fpn_convs.{i}.conv.weight']),
            'bias': sd[f'{p}fpn_convs.{i}.conv.bias']}
    for j in range(num_extra):
        t = f'{p}fpn_convs.{num_laterals + j}.conv'
        params[f'extra_conv_{j}'] = {
            'kernel': conv_kernel(sd[f'{t}.weight']),
            'bias': sd[f'{t}.bias']}
    return {'params': params}


def _gn(sd: Dict, name: str) -> Dict:
    """mmcv norm layer (GN/LN) -> flax GroupNorm/LayerNorm params."""
    return {'scale': sd[f'{name}.weight'], 'bias': sd[f'{name}.bias']}


def _linear(sd: Dict, name: str) -> Dict:
    return {'kernel': dense_kernel(sd[f'{name}.weight']),
            'bias': sd[f'{name}.bias']}


def _conv(sd: Dict, name: str, bias: bool = True) -> Dict:
    out = {'kernel': conv_kernel(sd[f'{name}.weight'])}
    if bias and f'{name}.bias' in sd:
        out['bias'] = sd[f'{name}.bias']
    return out


def fcos_emb_head_variables(sd: Dict[str, np.ndarray],
                            prefix: str = 'bbox_head.detector.',
                            stacked_convs: int = 2,
                            dcn_on_last_conv: bool = True,
                            branch_lens: Dict[str, int] = None) -> Dict:
    """Reference FCOSEmbHead state dict -> our ``FCOSEmbHead`` params.

    mmdet naming (fcos_emb_head.py ``_init_predictor``/``_init_branch``
    + AnchorFreeHead ``_init_cls_convs``/``_init_reg_convs``):
    ``cls_convs.{i}.conv`` / ``.gn`` towers (last conv = DCNv2 when
    ``dcn_on_last_conv``), ``conv_*_prev.{j}.conv/.gn`` branches, 1x1
    predictors ``conv_cls/conv_centerness/conv_offset`` and the
    GN-wrapped ``conv_emb``. GroupNorm only — no batch_stats.
    """
    p = prefix
    branch_lens = branch_lens or {}
    params = {}
    for tower, ours in (('cls_convs', 'cls'), ('reg_convs', 'reg')):
        for i in range(stacked_convs):
            t = f'{p}{tower}.{i}'
            if dcn_on_last_conv and i == stacked_convs - 1:
                w = sd[f'{t}.conv.weight']
                params[f'{ours}_dcn{i}'] = _deform_conv_variables(
                    sd, f'{t}.conv', w.shape[0])
            else:
                params[f'{ours}_conv{i}'] = _conv(sd, f'{t}.conv',
                                                  bias=False)
            params[f'{ours}_gn{i}'] = _gn(sd, f'{t}.gn')
    for torch_br, ours in (('conv_cls_prev', 'cls_br'),
                           ('conv_centerness_prev', 'ctr_br'),
                           ('conv_offset_prev', 'off_br'),
                           ('conv_emb_prev', 'emb_br')):
        for j in range(branch_lens.get(ours, 1)):
            t = f'{p}{torch_br}.{j}'
            params[f'{ours}_conv{j}'] = _conv(sd, f'{t}.conv', bias=False)
            params[f'{ours}_gn{j}'] = _gn(sd, f'{t}.gn')
    params['conv_cls'] = _conv(sd, f'{p}conv_cls')
    params['conv_centerness'] = _conv(sd, f'{p}conv_centerness')
    params['conv_offset'] = _conv(sd, f'{p}conv_offset')
    params['conv_emb'] = _conv(sd, f'{p}conv_emb.conv', bias=False)
    params['conv_emb_gn'] = _gn(sd, f'{p}conv_emb.gn')
    return {'params': params}


def attention_sampler_variables(sd: Dict[str, np.ndarray],
                                prefix: str = 'bbox_head.attention_sampler.'
                                ) -> Dict:
    """Reference DeformableAttentionSampler state dict -> our params.

    deformable_attention_sampler.py:40-44: ``sampling_offsets``/
    ``out_proj`` Linears, ``layer_norms.{0,1}`` LNs around an mmcv FFN
    (``ffn.layers.0.0`` / ``ffn.layers.1`` Linears).
    """
    p = prefix
    return {'params': {
        'sampling_offsets': _linear(sd, f'{p}sampling_offsets'),
        'out_proj': _linear(sd, f'{p}out_proj'),
        'norm1': _gn(sd, f'{p}layer_norms.0'),
        'ffn1': _linear(sd, f'{p}ffn.layers.0.0'),
        'ffn2': _linear(sd, f'{p}ffn.layers.1'),
        'norm2': _gn(sd, f'{p}layer_norms.1'),
    }}


def pts_transformer_variables(sd: Dict[str, np.ndarray],
                              prefix: str) -> Dict:
    """mmcv BaseTransformerLayer (self_attn, norm, ffn, norm) -> our
    ``PtsTransformerLayer`` params.

    The torch ``nn.MultiheadAttention`` packs q/k/v projections into
    ``in_proj_weight`` (3E, E) rows [q; k; v] — split into our three
    Dense layers. FFN/norm naming per mmcv: ``ffns.0.layers.0.0``,
    ``ffns.0.layers.1``, ``norms.{0,1}``.
    """
    p = prefix
    w = sd[f'{p}attentions.0.attn.in_proj_weight']
    b = sd[f'{p}attentions.0.attn.in_proj_bias']
    e = w.shape[1]
    parts = {}
    for i, name in enumerate(('q_proj', 'k_proj', 'v_proj')):
        parts[name] = {'kernel': dense_kernel(w[i * e:(i + 1) * e]),
                       'bias': b[i * e:(i + 1) * e]}
    parts['out_proj'] = _linear(sd, f'{p}attentions.0.attn.out_proj')
    parts['norm1'] = _gn(sd, f'{p}norms.0')
    parts['ffn1'] = _linear(sd, f'{p}ffns.0.layers.0.0')
    parts['ffn2'] = _linear(sd, f'{p}ffns.0.layers.1')
    parts['norm2'] = _gn(sd, f'{p}norms.1')
    return {'params': parts}


def det_head_variables(sd: Dict[str, np.ndarray],
                       prefix: str = 'bbox_head.',
                       stacked_convs: int = 2,
                       dcn_on_last_conv: bool = True,
                       num_lvl_convs: int = 3,
                       num_pred_fcs: int = 2,
                       num_pts_trans_layers: int = 1) -> Dict:
    """Full reference DeformPnPHead state dict -> our head params.

    Covers every parameterized submodule of deform_pnp_head.py
    ``_init_convs``/``_init_out_layers`` + the constructor modules:
    dense convs, upsample-concat 1x1 + GN, k/v projections, query
    scale/proj, pred FCs, dim/score/scale(/velo/attr) branches, optional
    ``cls_emb``, the attention sampler, per-point transformer stages,
    x2d positional Linear, and the GroupLinear correspondence
    regressors. Presence-dependent pieces (cls_emb, velo/attr) are
    converted iff their keys exist in the checkpoint.
    """
    p = prefix
    params = {
        'detector': fcos_emb_head_variables(
            sd, f'{p}detector.', stacked_convs, dcn_on_last_conv
        )['params'],
        'attention_sampler': attention_sampler_variables(
            sd, f'{p}attention_sampler.')['params'],
        'conv_upsampled': _conv(sd, f'{p}conv_upsampled.conv', bias=False),
        'conv_upsampled_gn': _gn(sd, f'{p}conv_upsampled.gn'),
        'k_proj': _conv(sd, f'{p}k_proj'),
        'v_proj': _conv(sd, f'{p}v_proj'),
        'query_scale': np.asarray(sd[f'{p}query_scale.scale']),
        'query_proj': _linear(sd, f'{p}query_proj'),
        'dim_branch': _linear(sd, f'{p}dim_branch'),
        'score_branch': _linear(sd, f'{p}score_branch'),
        'scale_branch': _linear(sd, f'{p}scale_branch'),
        'x2d_pos_enc': _linear(sd, f'{p}x2d_pos_enc'),
    }
    for i in range(num_lvl_convs):
        params[f'dense_conv{i}'] = _conv(sd, f'{p}convs.{i}.conv',
                                         bias=False)
    for i in range(num_pred_fcs):
        # Sequential(Linear, ReLU, ...) -> indices 0, 2, ...
        params[f'pred_fc{i}'] = _linear(sd, f'{p}pred_fc.{2 * i}')
    for i in range(num_pts_trans_layers):
        params[f'obj_query_scale{i}'] = np.asarray(
            sd[f'{p}obj_query_scale.{i}.scale'])
        params[f'pts_trans{i}'] = pts_transformer_variables(
            sd, f'{p}pts_trans.{i}.')['params']
    for i in range(num_pts_trans_layers + 1):
        params[f'corr_reg{i}'] = {
            'weight': sd[f'{p}corr_regs.{i}.weight'],
            'bias': sd[f'{p}corr_regs.{i}.bias']}
    if f'{p}cls_emb' in sd:
        params['cls_emb'] = sd[f'{p}cls_emb']
    if f'{p}velo_branch.weight' in sd:
        params['velo_branch'] = _linear(sd, f'{p}velo_branch')
    if f'{p}attr_branch.weight' in sd:
        params['attr_branch'] = _linear(sd, f'{p}attr_branch')
    return {'params': params}


def det_model_variables(sd: Dict[str, np.ndarray], depth: int = 101,
                        dcn_stages=(3, 4), num_fpn_laterals: int = 4,
                        num_fpn_extra: int = 2, **head_kwargs) -> Dict:
    """Full released EProPnPDet checkpoint -> our model variables.

    Combines the backbone/FPN/head converters under the reference's
    top-level module names (``backbone.``/``neck.``/``bbox_head.``,
    models/detectors/epropnp_det.py). Feed the result to
    ``merge_pretrained`` over freshly initialized variables; remember to
    build the model with ``dcn_modulation_scale=1.0``.
    """
    bb = det_backbone_variables(sd, depth, dcn_stages, prefix='backbone.')
    neck = fpn_variables(sd, num_fpn_laterals, num_fpn_extra,
                         prefix='neck.')
    head = det_head_variables(sd, prefix='bbox_head.', **head_kwargs)
    return {
        'params': {'backbone': bb['params'], 'neck': neck['params'],
                   'head': head['params']},
        'batch_stats': {'backbone': bb['batch_stats']},
    }


def merge_pretrained(variables: Dict, pretrained: Dict,
                     allow_missing: bool = True) -> Dict:
    """Graft converted subtrees onto freshly initialized variables.

    Walks ``pretrained`` and replaces matching paths in ``variables``
    (shape-checked); leaves everything else (heads the checkpoint lacks,
    e.g. ImageNet init of the backbone only) at its fresh init — the
    filtered-restore semantics of the reference loader
    (lib/model.py:79-105).
    """
    import jax

    flat_p = dict(jax.tree_util.tree_flatten_with_path(pretrained)[0])
    flat_v, treedef = jax.tree_util.tree_flatten_with_path(variables)
    out = []
    matched = 0
    for path, leaf in flat_v:
        if path in flat_p:
            new = np.asarray(flat_p[path])
            if new.shape != tuple(leaf.shape):
                raise ValueError(
                    f'shape mismatch at {path}: checkpoint {new.shape} '
                    f'vs model {tuple(leaf.shape)}')
            out.append(new.astype(leaf.dtype))
            matched += 1
        else:
            if not allow_missing:
                raise KeyError(f'missing in checkpoint: {path}')
            out.append(leaf)
    unused = set(flat_p) - {p for p, _ in flat_v}
    if unused and not allow_missing:
        raise KeyError(f'unused checkpoint entries: {sorted(unused)[:5]}')
    return jax.tree_util.tree_unflatten(treedef, out)
