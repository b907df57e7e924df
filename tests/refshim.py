"""Import shims so REFERENCE torch modules load without mmcv/mmdet/timm.

The parity tests instantiate the actual reference source from
``/root/reference/mmdet3d/...`` (read-only oracle) and compare its forward
pass against this framework's flax modules.  The reference imports mmcv /
mmdet / timm glue that is not installed here; this file provides minimal
torch implementations of exactly the pieces those files touch (standard
layers — Conv/BN/LayerNorm/MultiheadAttention — whose numerics come from
torch itself), plus real reference utilities (gaussian heatmaps,
clip_sigmoid) loaded by path so no reference logic is re-implemented.

Nothing here ships in the package — test-only scaffolding.
"""

from __future__ import annotations

import importlib.util
import math
import sys
import types

import torch
from torch import nn

REF = "/root/reference"

_installed = False


def _module(name):
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    return mod


def _load_by_path(relpath, name=None):
    """Load a reference source file.  When ``name`` is omitted the file is
    registered under its REAL dotted module name (e.g.
    ``mmdet3d.models.necks.view_transformer``) so its relative imports
    resolve against the shim packages installed in sys.modules."""
    if name is None:
        name = relpath[:-3].replace("/", ".")
        # make sure every parent package exists in sys.modules
        parts = name.split(".")
        for i in range(1, len(parts)):
            pkg = _module(".".join(parts[:i]))
            if not hasattr(pkg, "__path__"):
                pkg.__path__ = []
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, f"{REF}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------- mmcv.cnn
def build_norm_layer(cfg, num_features, postfix=""):
    cfg = dict(cfg) if cfg is not None else dict(type="BN")
    t = cfg.pop("type")
    cfg.pop("requires_grad", None)
    if t in ("BN", "BN2d", "SyncBN"):
        layer, abbr = nn.BatchNorm2d(num_features, **cfg), "bn"
    elif t == "BN1d":
        layer, abbr = nn.BatchNorm1d(num_features, **cfg), "bn"
    elif t == "BN3d":
        layer, abbr = nn.BatchNorm3d(num_features, **cfg), "bn"
    elif t == "LN":
        layer, abbr = nn.LayerNorm(num_features, **cfg), "ln"
    elif t == "GN":
        layer, abbr = nn.GroupNorm(cfg.pop("num_groups"), num_features, **cfg), "gn"
    else:
        raise KeyError(t)
    return abbr + str(postfix), layer


def build_conv_layer(cfg, *args, **kwargs):
    cfg = dict(cfg) if cfg is not None else dict(type="Conv2d")
    t = cfg.pop("type")
    kwargs = {**cfg, **kwargs}  # cfg can carry e.g. bias=False (SECOND)
    return {"Conv1d": nn.Conv1d, "Conv2d": nn.Conv2d, "Conv": nn.Conv2d,
            "Conv3d": nn.Conv3d}[t](*args, **kwargs)


def build_upsample_layer(cfg, *args, **kwargs):
    cfg = dict(cfg)
    t = cfg.pop("type")
    cfg.update(kwargs)
    if t == "deconv":
        return nn.ConvTranspose2d(*args, **cfg)
    raise KeyError(t)


def kaiming_init(module, a=0, mode="fan_out", nonlinearity="relu", bias=0,
                 distribution="normal"):
    if distribution == "normal":
        nn.init.kaiming_normal_(module.weight, a=a, mode=mode,
                                nonlinearity=nonlinearity)
    else:
        nn.init.kaiming_uniform_(module.weight, a=a, mode=mode,
                                 nonlinearity=nonlinearity)
    if hasattr(module, "bias") and module.bias is not None:
        nn.init.constant_(module.bias, bias)


class ConvModule(nn.Module):
    """mmcv ConvModule: conv -> norm -> act with bias='auto' semantics."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, dilation=1, groups=1, bias="auto", conv_cfg=None,
                 norm_cfg=None, act_cfg=dict(type="ReLU"), inplace=True,
                 order=("conv", "norm", "act"), **kwargs):
        super().__init__()
        self.order = order
        self.with_norm = norm_cfg is not None
        self.with_activation = act_cfg is not None
        if bias == "auto":
            bias = not self.with_norm
        self.conv = build_conv_layer(
            conv_cfg, in_channels, out_channels, kernel_size, stride=stride,
            padding=padding, dilation=dilation, groups=groups, bias=bias,
        )
        if self.with_norm:
            # mmcv registers the norm under its abbreviated name ('bn'/'gn')
            norm_channels = (
                out_channels if order.index("norm") > order.index("conv")
                else in_channels
            )
            self.norm_name, norm = build_norm_layer(norm_cfg, norm_channels)
            self.add_module(self.norm_name, norm)
        if self.with_activation:
            t = dict(act_cfg)["type"]
            self.activate = {"ReLU": nn.ReLU, "GELU": nn.GELU,
                             "Sigmoid": nn.Sigmoid}[t]()

    @property
    def norm(self):
        return getattr(self, self.norm_name) if self.with_norm else None

    def forward(self, x, activate=True, norm=True):
        for layer in self.order:
            if layer == "conv":
                x = self.conv(x)
            elif layer == "norm" and norm and self.with_norm:
                x = getattr(self, self.norm_name)(x)
            elif layer == "act" and activate and self.with_activation:
                x = self.activate(x)
        return x


# -------------------------------------------------------------- mmcv.runner
class BaseModule(nn.Module):
    def __init__(self, init_cfg=None):
        super().__init__()
        self.init_cfg = init_cfg

    def init_weights(self):
        for m in self.children():
            if hasattr(m, "init_weights"):
                m.init_weights()


def force_fp32(*dargs, **dkwargs):
    def deco(fn):
        return fn
    if len(dargs) == 1 and callable(dargs[0]):
        return dargs[0]
    return deco


auto_fp16 = force_fp32


# ------------------------------------------------- mmcv.cnn.bricks.transformer
class MultiheadAttention(BaseModule):
    """mmcv wrapper over nn.MultiheadAttention (residual inside).

    Matches mmcv/cnn/bricks/transformer.py semantics for the subset the
    reference uses (DMSA: positional args (embed_dims, num_heads, attn_drop),
    batch_first=True, forward(query, attn_mask=...)).
    """

    def __init__(self, embed_dims, num_heads, attn_drop=0.0, proj_drop=0.0,
                 dropout_layer=dict(type="Dropout", drop_prob=0.0),
                 init_cfg=None, batch_first=False, **kwargs):
        super().__init__(init_cfg)
        self.embed_dims = embed_dims
        self.num_heads = num_heads
        self.batch_first = batch_first
        self.attn = nn.MultiheadAttention(embed_dims, num_heads, attn_drop,
                                          **kwargs)
        self.proj_drop = nn.Dropout(proj_drop)
        self.dropout_layer = nn.Dropout(dict(dropout_layer)["drop_prob"]) \
            if dropout_layer else nn.Identity()

    def forward(self, query, key=None, value=None, identity=None,
                query_pos=None, key_pos=None, attn_mask=None,
                key_padding_mask=None, **kwargs):
        if key is None:
            key = query
        if value is None:
            value = key
        if identity is None:
            identity = query
        if key_pos is None and query_pos is not None \
                and query_pos.shape == key.shape:
            key_pos = query_pos
        if query_pos is not None:
            query = query + query_pos
        if key_pos is not None:
            key = key + key_pos
        if self.batch_first:
            query = query.transpose(0, 1)
            key = key.transpose(0, 1)
            value = value.transpose(0, 1)
        out = self.attn(query=query, key=key, value=value,
                        attn_mask=attn_mask,
                        key_padding_mask=key_padding_mask)[0]
        if self.batch_first:
            out = out.transpose(0, 1)
        return identity + self.dropout_layer(self.proj_drop(out))


class FFN(BaseModule):
    def __init__(self, embed_dims=256, feedforward_channels=1024, num_fcs=2,
                 act_cfg=dict(type="ReLU", inplace=True), ffn_drop=0.0,
                 dropout_layer=None, add_identity=True, init_cfg=None,
                 **kwargs):
        super().__init__(init_cfg)
        act = {"ReLU": nn.ReLU, "GELU": nn.GELU}[dict(act_cfg)["type"]]()
        layers = []
        in_c = embed_dims
        for _ in range(num_fcs - 1):
            layers += [nn.Sequential(nn.Linear(in_c, feedforward_channels),
                                     act, nn.Dropout(ffn_drop))]
            in_c = feedforward_channels
        layers += [nn.Linear(feedforward_channels, embed_dims),
                   nn.Dropout(ffn_drop)]
        self.layers = nn.Sequential(*layers)
        self.add_identity = add_identity
        self.dropout_layer = nn.Identity()

    def forward(self, x, identity=None):
        out = self.layers(x)
        if not self.add_identity:
            return self.dropout_layer(out)
        if identity is None:
            identity = x
        return identity + self.dropout_layer(out)


# ----------------------------------------------------------------- timm bits
def to_2tuple(x):
    return x if isinstance(x, tuple) else (x, x)


class DropPath(nn.Module):
    def __init__(self, drop_prob=0.0):
        super().__init__()
        self.drop_prob = drop_prob

    def forward(self, x):
        if self.drop_prob == 0.0 or not self.training:
            return x
        keep = 1 - self.drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = x.new_empty(shape).bernoulli_(keep)
        return x.div(keep) * mask


class TimmMlp(nn.Module):
    def __init__(self, in_features, hidden_features=None, out_features=None,
                 act_layer=nn.GELU, drop=0.0, **kwargs):
        super().__init__()
        out_features = out_features or in_features
        hidden_features = hidden_features or in_features
        self.fc1 = nn.Linear(in_features, hidden_features)
        self.act = act_layer()
        self.drop1 = nn.Dropout(drop)
        self.fc2 = nn.Linear(hidden_features, out_features)
        self.drop2 = nn.Dropout(drop)

    def forward(self, x):
        return self.drop2(self.fc2(self.drop1(self.act(self.fc1(x)))))


# ------------------------------------------------------------- mmdet resnet
class MMDetBasicBlock(nn.Module):
    """mmdet BasicBlock (backbones/resnet.py): 3x3-BN-ReLU-3x3-BN + res."""

    expansion = 1

    def __init__(self, inplanes, planes, stride=1, dilation=1,
                 downsample=None, **kwargs):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride=stride,
                               padding=dilation, dilation=dilation, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample
        self.stride = stride

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class MMDetBottleneck(nn.Module):
    """mmdet ResNet Bottleneck, style='pytorch' (stride on the 3x3 conv2),
    matching torchvision resnet50 — the reference's image backbone comes
    from external mmdet (config rcbevdet-...py:58-68)."""

    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class MMDetResNet(nn.Module):
    """mmdet-compatible ResNet (the subset the RC configs use: depth 50,
    style='pytorch', out_indices, no deep stem).  Param names match mmdet/
    torchvision ('conv1', 'bn1', 'layer{1-4}.{i}.conv{1-3}/bn{1-3}/
    downsample.{0,1}') so the repo's torch->flax name map applies."""

    arch = {18: (MMDetBasicBlock, (2, 2, 2, 2)),
            50: (MMDetBottleneck, (3, 4, 6, 3))}

    def __init__(self, depth=50, out_indices=(2, 3), **kwargs):
        super().__init__()
        block, blocks = self.arch[depth]
        self.out_indices = out_indices
        # mmdet ResNet API surface used by BEVStereo4D_RC's
        # extract_stereo_ref_feat (bevdet_rc.py:873-886)
        self.deep_stem = False
        self.res_layers = [f"layer{i + 1}" for i in range(4)]
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        inplanes = 64
        for stage in range(4):
            planes = 64 * 2 ** stage
            stride = 1 if stage == 0 else 2
            layers = []
            for i in range(blocks[stage]):
                s = stride if i == 0 else 1
                downsample = None
                if i == 0 and (s != 1 or inplanes != planes * block.expansion):
                    downsample = nn.Sequential(
                        nn.Conv2d(inplanes, planes * block.expansion, 1,
                                  stride=s, bias=False),
                        nn.BatchNorm2d(planes * block.expansion),
                    )
                layers.append(block(inplanes, planes, stride=s,
                                    downsample=downsample))
                inplanes = planes * block.expansion
            setattr(self, f"layer{stage + 1}", nn.Sequential(*layers))

    @property
    def norm1(self):
        # mmdet calls its stem BN 'norm1'; alias (property, so state_dict
        # keys stay torchvision-style for the name map)
        return self.bn1

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        outs = []
        for stage in range(4):
            x = getattr(self, f"layer{stage + 1}")(x)
            if stage in self.out_indices:
                outs.append(x)
        return tuple(outs)


# ----------------------------------------------------------------- registries
class Registry:
    """Like mmcv's Registry, but category registries may SHARE one
    module_dict — mirroring the reference where every mmdet3d registry
    aliases a single MODELS registry (mmdet3d/models/builder.py:17-31), so
    e.g. RadarBEVNet registers under BACKBONES yet is built via
    build_voxel_encoder."""

    def __init__(self, name, module_dict=None):
        self.name = name
        self.module_dict = {} if module_dict is None else module_dict

    def register_module(self, name=None, force=False, module=None):
        def _register(cls):
            self.module_dict[name or cls.__name__] = cls
            return cls
        if module is not None:
            return _register(module)
        return _register

    def get(self, key):
        return self.module_dict[key]


def multi_apply(func, *args, **kwargs):
    import functools
    pfunc = functools.partial(func, **kwargs) if kwargs else func
    map_results = map(pfunc, *args)
    return tuple(map(list, zip(*map_results)))


def reduce_mean(tensor):
    return tensor


class _AttrDict(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


def build_bbox_coder(cfg):
    """Builds the REAL reference coder when its class has been loaded into
    BBOX_CODERS (load_bbox_coder), else a dict stub (forward-only tests)."""
    bb = sys.modules.get("mmdet.core.bbox.builder")
    t = cfg.get("type")
    if bb is not None and hasattr(bb, "BBOX_CODERS"):
        try:
            cls = bb.BBOX_CODERS.get(t)
        except KeyError:
            cls = None
        if cls is not None:
            c = dict(cfg)
            c.pop("type")
            try:
                return cls(**c)
            except TypeError:
                # forward-only tests pass minimal coder dicts lacking the
                # real coder's required geometry args — keep the dict stub
                pass
    return _AttrDict(cfg)


class GaussianFocalLoss(nn.Module):
    """mmdet GaussianFocalLoss (CornerNet focal on gaussian heatmaps):
    elementwise pos/neg focal, sum/avg_factor reduction, * loss_weight."""

    def __init__(self, alpha=2.0, gamma=4.0, reduction="mean",
                 loss_weight=1.0):
        super().__init__()
        self.alpha, self.gamma = alpha, gamma
        self.loss_weight = loss_weight

    def forward(self, pred, target, weight=None, avg_factor=None):
        eps = 1e-12
        pos_weights = target.eq(1).float()
        neg_weights = (1 - target).pow(self.gamma)
        pos_loss = -(pred + eps).log() * (1 - pred).pow(self.alpha) \
            * pos_weights
        neg_loss = -(1 - pred + eps).log() * pred.pow(self.alpha) \
            * neg_weights
        loss = pos_loss + neg_loss
        if avg_factor is not None:
            return self.loss_weight * loss.sum() / avg_factor
        return self.loss_weight * loss.mean()


class L1Loss(nn.Module):
    def __init__(self, reduction="mean", loss_weight=1.0):
        super().__init__()
        self.loss_weight = loss_weight

    def forward(self, pred, target, weight=None, avg_factor=None):
        loss = (pred - target).abs()
        if weight is not None:
            loss = loss * weight
        if avg_factor is not None:
            return self.loss_weight * loss.sum() / avg_factor
        return self.loss_weight * loss.mean()


def build_loss(cfg):
    cfg = dict(cfg)
    t = cfg.pop("type")
    if t == "GaussianFocalLoss":
        return GaussianFocalLoss(**cfg)
    if t == "L1Loss":
        return L1Loss(**cfg)
    return nn.Identity()


def _stub(*a, **k):
    raise NotImplementedError("stubbed ext op called in parity test")


def circle_nms(dets, thresh, post_max_size=83):
    """numpy transcription of the reference numba circle_nms
    (core/post_processing/box3d_nms.py:237-283): greedy center-distance
    suppression over score-sorted candidates; ``thresh`` compares against
    SQUARED distance."""
    import numpy as np

    x1, y1, scores = dets[:, 0], dets[:, 1], dets[:, 2]
    order = scores.argsort()[::-1]
    suppressed = np.zeros(len(dets), bool)
    keep = []
    for _i in range(len(dets)):
        i = order[_i]
        if suppressed[i]:
            continue
        keep.append(i)
        for _j in range(_i + 1, len(dets)):
            j = order[_j]
            if suppressed[j]:
                continue
            if (x1[i] - x1[j]) ** 2 + (y1[i] - y1[j]) ** 2 <= thresh:
                suppressed[j] = True
    return keep[:post_max_size]


class HardVoxelization(nn.Module):
    """Torch/numpy oracle for mmcv.ops.Voxelization (hard voxelizer) as the
    reference's radar branch uses it (bevdet_rc.py:106,168-194).

    Semantics of mmcv's deterministic hard_voxelize: points are visited in
    input order; a point outside the range is dropped; voxels are allocated
    in first-appearance order up to max_voxels (eval uses max_voxels[1]);
    within a voxel the first max_num_points points are kept.  Returns
    (voxels [M, K, C] zero-padded, coors [M, 3] int (z, y, x),
    num_points [M])."""

    def __init__(self, voxel_size, point_cloud_range, max_num_points,
                 max_voxels=20000, deterministic=True):
        super().__init__()
        self.voxel_size = list(voxel_size)
        self.point_cloud_range = list(point_cloud_range)
        self.max_num_points = max_num_points
        if isinstance(max_voxels, (tuple, list)):
            self.max_voxels = max_voxels
        else:
            self.max_voxels = (max_voxels, max_voxels)

    def forward(self, points):
        import numpy as np

        max_voxels = self.max_voxels[0 if self.training else 1]
        pts = points.detach().cpu().numpy()
        vx, vy, vz = self.voxel_size
        x0, y0, z0, x1, y1, z1 = self.point_cloud_range
        nx = int(round((x1 - x0) / vx))
        ny = int(round((y1 - y0) / vy))
        nz = int(round((z1 - z0) / vz))
        voxel_of = {}
        feats, coors, counts = [], [], []
        for p in pts:
            cx = int(np.floor((p[0] - x0) / vx))
            cy = int(np.floor((p[1] - y0) / vy))
            cz = int(np.floor((p[2] - z0) / vz))
            if not (0 <= cx < nx and 0 <= cy < ny and 0 <= cz < nz):
                continue
            key = (cz, cy, cx)
            vid = voxel_of.get(key)
            if vid is None:
                if len(feats) >= max_voxels:
                    continue
                vid = len(feats)
                voxel_of[key] = vid
                feats.append(
                    np.zeros((self.max_num_points, pts.shape[1]),
                             np.float32))
                coors.append(key)
                counts.append(0)
            if counts[vid] < self.max_num_points:
                feats[vid][counts[vid]] = p
                counts[vid] += 1
        if not feats:
            c = pts.shape[1]
            return (torch.zeros(0, self.max_num_points, c),
                    torch.zeros(0, 3, dtype=torch.int32),
                    torch.zeros(0, dtype=torch.int32))
        return (torch.tensor(np.stack(feats)),
                torch.tensor(np.asarray(coors, np.int32)),
                torch.tensor(np.asarray(counts, np.int32)))


def bev_pool_v2_torch(depth, feat, ranks_depth, ranks_feat, ranks_bev,
                      bev_feat_shape, interval_starts, interval_lengths):
    """Pure-torch oracle for the reference bev_pool_v2 CUDA op.

    Matches /root/reference/mmdet3d/ops/bev_pool_v2/bev_pool.py:86-93 and
    src/bev_pool_cuda.cu:21-48: for every LSS point i, accumulate
    depth.flatten()[ranks_depth[i]] * feat.view(-1, C)[ranks_feat[i]] into
    out.view(-1, C)[ranks_bev[i]], then permute (B, Z, Y, X, C) ->
    (B, C, Z, Y, X).  interval_starts/lengths partition points by equal
    ranks_bev, so a plain index_add_ over ranks_bev computes the identical
    segment sums; autograd supplies the backward (the CUDA re-sort-by-feat
    backward in bev_pool.py:47-57 computes the same gradients).
    """
    c = feat.shape[-1]
    d = depth.reshape(-1)[ranks_depth.long()]
    f = feat.reshape(-1, c)[ranks_feat.long()]
    prod = d.unsqueeze(-1) * f
    n_cells = 1
    for s in bev_feat_shape[:-1]:
        n_cells *= int(s)
    flat = torch.zeros(n_cells, c, dtype=feat.dtype, device=feat.device)
    flat = flat.index_add(0, ranks_bev.long(), prod)
    out = flat.reshape(tuple(int(s) for s in bev_feat_shape))
    return out.permute(0, 4, 1, 2, 3).contiguous()


def install():
    """Register all shim modules in sys.modules (idempotent)."""
    global _installed
    if _installed:
        return
    mmcv = _module("mmcv")
    cnn = _module("mmcv.cnn")
    cnn.build_norm_layer = build_norm_layer
    cnn.build_conv_layer = build_conv_layer
    cnn.build_upsample_layer = build_upsample_layer
    cnn.ConvModule = ConvModule
    cnn.kaiming_init = kaiming_init
    cnn.xavier_init = lambda m, **k: None
    mmcv.cnn = cnn
    bricks = _module("mmcv.cnn.bricks")
    transformer = _module("mmcv.cnn.bricks.transformer")
    transformer.MultiheadAttention = MultiheadAttention
    transformer.FFN = FFN
    bricks.transformer = transformer
    bricks.__path__ = []  # CustomResNet imports mmcv.cnn.bricks.conv_module
    conv_module = _module("mmcv.cnn.bricks.conv_module")
    conv_module.ConvModule = ConvModule
    bricks.conv_module = conv_module
    cnn.bricks = bricks
    cnn.trunc_normal_init = lambda t, std=0.02, **k: None
    cnn.constant_init = lambda m, val=0, **k: None

    def build_dropout(cfg):
        cfg = dict(cfg) if cfg else dict(type="Dropout", drop_prob=0.0)
        t = cfg.pop("type")
        if t == "DropPath":
            return DropPath(cfg.get("drop_prob", 0.0))
        return nn.Dropout(cfg.get("drop_prob", 0.0))

    transformer.build_dropout = build_dropout
    registry = _module("mmcv.cnn.bricks.registry")
    registry.ATTENTION = Registry("ATTENTION")
    bricks.registry = registry
    utils_mod = _module("mmcv.cnn.utils")
    wi = _module("mmcv.cnn.utils.weight_init")
    wi.constant_init = cnn.constant_init
    wi.trunc_normal_init = cnn.trunc_normal_init
    utils_mod.weight_init = wi
    cnn.utils = utils_mod

    runner = _module("mmcv.runner")
    runner.BaseModule = BaseModule
    runner.force_fp32 = force_fp32
    runner.auto_fp16 = auto_fp16
    runner._load_checkpoint = _stub
    rbm = _module("mmcv.runner.base_module")
    rbm.BaseModule = BaseModule
    rbm.ModuleList = nn.ModuleList
    rbm.Sequential = nn.Sequential
    runner.base_module = rbm
    mmcv.runner = runner

    mmseg = _module("mmseg")
    mmseg_ops = _module("mmseg.ops")
    mmseg_ops.resize = lambda *a, **k: torch.nn.functional.interpolate(*a, **k)
    mmseg.ops = mmseg_ops

    m3d_utils = _module("mmdet3d.utils")
    import logging as _logging

    m3d_utils.get_root_logger = lambda *a, **k: _logging.getLogger("ref")

    timm = _module("timm")
    tmodels = _module("timm.models")
    tlayers = _module("timm.models.layers")
    tlayers.DropPath = DropPath
    tlayers.Mlp = TimmMlp
    tlayers.to_2tuple = to_2tuple
    tlayers.trunc_normal_ = lambda t, std=0.02, **k: t  # init-only (convnext)
    tmodels.layers = tlayers
    timm.models = tmodels

    mmdet = _module("mmdet")
    mutils = _module("mmdet.utils")
    mutils.get_root_logger = lambda *a, **k: _logging.getLogger("ref")
    mmdet.utils = mutils
    mcore = _module("mmdet.core")
    mcore.build_bbox_coder = build_bbox_coder
    mcore.multi_apply = multi_apply
    mcore.reduce_mean = reduce_mean
    mmdet.core = mcore
    mmodels = _module("mmdet.models")
    mbackbones = _module("mmdet.models.backbones")
    mresnet = _module("mmdet.models.backbones.resnet")
    mresnet.BasicBlock = MMDetBasicBlock
    mresnet.Bottleneck = MMDetBottleneck
    mbackbones.resnet = mresnet
    mmodels.backbones = mbackbones
    mmdet.models = mmodels

    # real reference utilities, loaded by path (pure torch/numpy)
    gaussian = _load_by_path("mmdet3d/core/utils/gaussian.py",
                             "_ref_gaussian")
    clip_sig = _load_by_path("mmdet3d/models/utils/clip_sigmoid.py",
                             "_ref_clip_sigmoid")

    m3d = _module("mmdet3d")
    m3dcore = _module("mmdet3d.core")
    m3dcore.draw_heatmap_gaussian = gaussian.draw_heatmap_gaussian
    m3dcore.draw_heatmap_gaussian_feat = gaussian.draw_heatmap_gaussian_feat
    m3dcore.gaussian_radius = gaussian.gaussian_radius
    m3dcore.circle_nms = circle_nms
    m3dcore.oval_nms = _stub

    def xywhr2xyxyr(boxes_xywhr):
        boxes = torch.zeros_like(boxes_xywhr)
        half_w = boxes_xywhr[..., 2] / 2
        half_h = boxes_xywhr[..., 3] / 2
        boxes[..., 0] = boxes_xywhr[..., 0] - half_w
        boxes[..., 1] = boxes_xywhr[..., 1] - half_h
        boxes[..., 2] = boxes_xywhr[..., 0] + half_w
        boxes[..., 3] = boxes_xywhr[..., 1] + half_h
        boxes[..., 4] = boxes_xywhr[..., 4]
        return boxes

    m3dcore.xywhr2xyxyr = xywhr2xyxyr
    m3d.core = m3dcore
    m3dpost = _module("mmdet3d.core.post_processing")
    m3dpost.nms_bev = _stub
    m3dcore.post_processing = m3dpost

    m3dmodels = _module("mmdet3d.models")
    m3dbuilder = _module("mmdet3d.models.builder")
    shared_models = {}  # one MODELS dict behind every category registry
    for reg in ("BACKBONES", "NECKS", "HEADS", "MIDDLE_ENCODERS", "FUSERS",
                "VOXEL_ENCODERS", "DETECTORS", "LOSSES", "SEGMENTORS"):
        setattr(m3dbuilder, reg, Registry(reg, shared_models))
    def _make_build(reg):
        def _build(cfg, **kw):
            cfg = dict(cfg)
            return reg.get(cfg.pop("type"))(**cfg)
        return _build

    m3dbuilder.build_backbone = _make_build(m3dbuilder.BACKBONES)
    m3dbuilder.build_neck = _make_build(m3dbuilder.NECKS)
    m3dbuilder.build_loss = build_loss
    m3dbuilder.build_head = _make_build(m3dbuilder.HEADS)
    # mmdet's registries alias the same shared dict (reference
    # builder.py:34-39 falls back to mmdet's registries; several reference
    # files register via `from mmdet.models import BACKBONES/NECKS`)
    mmodels.BACKBONES = m3dbuilder.BACKBONES
    mmodels.NECKS = m3dbuilder.NECKS
    mmodels.DETECTORS = m3dbuilder.DETECTORS
    m3dbuilder.BACKBONES.register_module(name="ResNet", module=MMDetResNet)
    m3dmodels.builder = m3dbuilder
    m3dmodels.utils = _module("mmdet3d.models.utils")
    m3dmodels.utils.clip_sigmoid = clip_sig.clip_sigmoid
    m3d.models = m3dmodels

    m3dops = _module("mmdet3d.ops")
    bp = _module("mmdet3d.ops.bev_pool_v2")
    bpb = _module("mmdet3d.ops.bev_pool_v2.bev_pool")
    bpb.bev_pool_v2 = bev_pool_v2_torch
    bpb.TRTBEVPoolv2 = _stub
    bp.bev_pool = bpb
    m3dops.bev_pool_v2 = bp
    m3d.ops = m3dops

    # compiled ext imported at module scope by ms_deform_attn_func.py
    _module("MultiScaleDeformableAttention")

    _installed = True


# ------------------------------------------------------- reference loaders
def load_radar_encoder():
    install()
    return _load_by_path("mmdet3d/models/backbones/radar_encoder.py")


def load_view_transformer():
    install()
    return _load_by_path("mmdet3d/models/necks/view_transformer.py")


def load_centerpoint_head():
    install()
    return _load_by_path("mmdet3d/models/dense_heads/centerpoint_head.py")


def load_pillar_scatter():
    install()
    return _load_by_path("mmdet3d/models/middle_encoders/pillar_scatter.py")


def load_second():
    install()
    return _load_by_path("mmdet3d/models/backbones/second.py")


def load_second_fpn():
    install()
    return _load_by_path("mmdet3d/models/necks/second_fpn.py")


def load_ms_deform_attn():
    install()
    funcs = _load_by_path(
        "mmdet3d/models/model_utils/ops/functions/ms_deform_attn_func.py",
        "_ref_msda_func")
    # the modules/__init__ imports `from ..functions import ...`; load the
    # module file directly with its relative imports patched via sys.modules
    pkg = _module("_ref_msda_pkg")
    pkg.__path__ = []
    fpkg = _module("_ref_msda_pkg.functions")
    fpkg.MSDeformAttnFunction = funcs.MSDeformAttnFunction
    spec = importlib.util.spec_from_file_location(
        "_ref_msda_pkg.modules.ms_deform_attn",
        f"{REF}/mmdet3d/models/model_utils/ops/modules/ms_deform_attn.py",
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["_ref_msda_pkg.modules.ms_deform_attn"] = mod
    _module("_ref_msda_pkg.modules").__path__ = []
    spec.loader.exec_module(mod)
    return mod, funcs


def load_bevdet_rc():
    """Load the REFERENCE detector file (bevdet_rc.py) itself.

    The CAMF fusion glue — reduc conv + positional embeds + dense
    reference points + both MSDeformAttn directions + RadarConvFuser —
    lives in BEVDet_RC.extract_feat (bevdet_rc.py:303-357); loading the
    real file lets tests run that glue with canned branch outputs instead
    of re-transcribing it.  The camera/radar branch builders are satisfied
    with registry-registered identity modules by the caller.
    """
    install()
    sys.modules["mmdet3d.ops.bev_pool_v2.bev_pool"].TRTBEVPoolv2 = _stub
    sys.modules["mmcv.cnn"].normal_init = lambda m, **k: None

    mmodels = sys.modules["mmdet.models"]
    if not hasattr(mmodels, "DETECTORS"):
        mmodels.DETECTORS = Registry("DETECTORS")
    mres = sys.modules["mmdet.models.backbones.resnet"]
    if not hasattr(mres, "ResNet"):
        mres.ResNet = type("ResNet", (nn.Module,), {})

    mmcv_ops = _module("mmcv.ops")
    mmcv_ops.Voxelization = HardVoxelization
    sys.modules["mmcv"].ops = mmcv_ops

    b = sys.modules["mmdet3d.models.builder"]

    def _mk(reg):
        def _build(cfg, **kw):
            cfg = dict(cfg)
            return reg.get(cfg.pop("type"))(**cfg)

        return _build

    for name, reg in (("build_voxel_encoder", b.VOXEL_ENCODERS),
                      ("build_middle_encoder", b.MIDDLE_ENCODERS)):
        if not hasattr(b, name):
            setattr(b, name, _mk(reg))

    detpkg = _module("mmdet3d.models.detectors")
    if not hasattr(detpkg, "__path__"):
        detpkg.__path__ = []
    cp = _module("mmdet3d.models.detectors.centerpoint")

    class CenterPoint(nn.Module):
        """Shim of the reference CenterPoint/MVXTwoStageDetector glue the
        RC detectors inherit (centerpoint.py:85-94, mvx_two_stage.py):
        builds img_backbone/img_neck/pts_bbox_head from config and runs
        head forward + get_bboxes in simple_test_pts.  The head, coder and
        NMS it drives are the REAL reference implementations."""

        def __init__(self, img_backbone=None, img_neck=None,
                     pts_bbox_head=None, pts_seg_head=None, train_cfg=None,
                     test_cfg=None, pretrained=None, init_cfg=None, **kw):
            super().__init__()
            bld = sys.modules["mmdet3d.models.builder"]
            if img_backbone is not None:
                c = dict(img_backbone)
                c.pop("pretrained", None)
                self.img_backbone = bld.build_backbone(c)
            if img_neck is not None:
                self.img_neck = bld.build_neck(img_neck)
            if pts_bbox_head is not None:
                c = dict(pts_bbox_head)
                c["train_cfg"] = train_cfg["pts"] if train_cfg else None
                c["test_cfg"] = test_cfg["pts"] if test_cfg else None
                self.pts_bbox_head = bld.build_head(c)
            self.pts_seg_head = None

        @property
        def with_img_backbone(self):
            return getattr(self, "img_backbone", None) is not None

        @property
        def with_img_neck(self):
            return getattr(self, "img_neck", None) is not None

        @property
        def with_pts_bbox(self):
            return getattr(self, "pts_bbox_head", None) is not None

        def init_weights(self):
            pass

        def simple_test_pts(self, x, img_metas, rescale=False):
            # transcribed from reference centerpoint.py:85-94 (bbox3d2result
            # inlined: mmdet3d/core/bbox/transforms.py dict packing)
            outs = self.pts_bbox_head(x)
            bbox_list = self.pts_bbox_head.get_bboxes(
                outs, img_metas, rescale=rescale)
            return [
                dict(boxes_3d=bboxes, scores_3d=scores, labels_3d=labels)
                for bboxes, scores, labels in bbox_list
            ]

    cp.CenterPoint = CenterPoint
    detpkg.centerpoint = cp

    if ("mmdet3d.models.model_utils.ops.modules.ms_deform_attn"
            not in sys.modules):
        funcs = _load_by_path(
            "mmdet3d/models/model_utils/ops/functions/ms_deform_attn_func.py"
        )
        fpkg = _module("mmdet3d.models.model_utils.ops.functions")
        fpkg.MSDeformAttnFunction = funcs.MSDeformAttnFunction
        fpkg.ms_deform_attn_core_pytorch = funcs.ms_deform_attn_core_pytorch
        _load_by_path(
            "mmdet3d/models/model_utils/ops/modules/ms_deform_attn.py"
        )
    return _load_by_path("mmdet3d/models/detectors/bevdet_rc.py")


def load_bbox_coder():
    """Load the reference CenterPointBBoxCoder
    (core/bbox/coders/centerpoint_bbox_coders.py)."""
    install()
    mcore_bbox = _module("mmdet.core.bbox")

    class BaseBBoxCoder:
        def __init__(self, **kw):
            pass

    if not hasattr(mcore_bbox, "BaseBBoxCoder"):
        mcore_bbox.BaseBBoxCoder = BaseBBoxCoder
    bb = _module("mmdet.core.bbox.builder")
    if not hasattr(bb, "BBOX_CODERS"):
        bb.BBOX_CODERS = Registry("BBOX_CODERS")
    mcore_bbox.builder = bb
    sys.modules["mmdet.core"].bbox = mcore_bbox
    return _load_by_path(
        "mmdet3d/core/bbox/coders/centerpoint_bbox_coders.py")


def load_radar_points():
    """Load the reference RadarPoints (core/points/radar_points.py) with
    its real base class and rotation utils (loaded verbatim)."""
    install()
    ac = _load_by_path("mmdet3d/core/utils/array_converter.py")
    cu = _module("mmdet3d.core.utils")
    cu.array_converter = ac.array_converter
    _load_by_path("mmdet3d/core/bbox/structures/utils.py")
    su = sys.modules["mmdet3d.core.bbox.structures.utils"]
    _module("mmdet3d.core.bbox.structures").utils = su
    _load_by_path("mmdet3d/core/points/base_points.py")
    return _load_by_path("mmdet3d/core/points/radar_points.py")


def load_custom_resnet():
    """Load reference CustomResNet (models/backbones/resnet.py) — the BEV
    encoder backbone and the pre_process net."""
    install()
    return _load_by_path("mmdet3d/models/backbones/resnet.py")


def load_custom_fpn():
    """Load reference CustomFPN (models/necks/fpn.py) — the image neck."""
    install()
    return _load_by_path("mmdet3d/models/necks/fpn.py")


def load_fpn_lss():
    """Load reference FPN_LSS (models/necks/lss_fpn.py) — the BEV neck."""
    install()
    load_custom_resnet()  # lss_fpn imports ConvModule from it
    return _load_by_path("mmdet3d/models/necks/lss_fpn.py")


def load_full_rc_detector(model_cfg):
    """Build the ENTIRE reference BEVDepth4D_RC from a config dict, with
    every sub-module the REAL reference implementation (ResNet/ConvModule/
    Voxelization/bev_pool/MSDeformAttnFunction are CPU shims/oracles).

    Loads every module file the RC config names so their register_module
    decorators land in the shared registry, then instantiates the detector
    exactly like the reference's build_model (mmdet3d/models/builder.py) —
    the assembled-parity entry point."""
    mod = load_bevdet_rc()
    load_custom_resnet()
    load_custom_fpn()
    load_fpn_lss()
    load_view_transformer()
    load_centerpoint_head()
    load_radar_encoder()
    load_pillar_scatter()
    load_second()
    load_second_fpn()
    load_bbox_coder()
    cfg = dict(model_cfg)
    t = cfg.pop("type")
    return getattr(mod, t)(**cfg), mod


# ------------------------------------------- detectron2 / EVA shims (ViT)
class D2LayerNorm(nn.Module):
    """detectron2.layers.LayerNorm: channels-FIRST LayerNorm for NCHW
    tensors (normalizes dim 1 per spatial position)."""

    def __init__(self, normalized_shape, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(normalized_shape))
        self.bias = nn.Parameter(torch.zeros(normalized_shape))
        self.eps = eps

    def forward(self, x):
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return self.weight[:, None, None] * x + self.bias[:, None, None]


class FrozenBatchNorm2d(nn.Module):
    """detectron2 FrozenBatchNorm2d: BN with fixed affine + stats."""

    def __init__(self, num_features, eps=1e-5):
        super().__init__()
        self.register_buffer("weight", torch.ones(num_features))
        self.register_buffer("bias", torch.zeros(num_features))
        self.register_buffer("running_mean", torch.zeros(num_features))
        self.register_buffer("running_var", torch.ones(num_features))
        self.eps = eps

    def forward(self, x):
        scale = self.weight * (self.running_var + self.eps).rsqrt()
        bias = self.bias - self.running_mean * scale
        return x * scale[None, :, None, None] + bias[None, :, None, None]


def d2_get_norm(norm, out_channels):
    if norm == "" or norm is None or norm is False:
        return None
    if norm == "LN":
        return D2LayerNorm(out_channels)
    if norm in ("BN", "SyncBN"):
        return nn.BatchNorm2d(out_channels)
    if norm == "FrozenBN":
        return FrozenBatchNorm2d(out_channels)
    raise KeyError(norm)


class D2Conv2d(nn.Conv2d):
    """detectron2.layers.Conv2d: nn.Conv2d with fused norm/activation."""

    def __init__(self, *args, norm=None, activation=None, **kwargs):
        super().__init__(*args, **kwargs)
        self.norm = norm
        self.activation = activation

    def forward(self, x):
        x = super().forward(x)
        if self.norm is not None:
            x = self.norm(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


class D2CNNBlockBase(nn.Module):
    def __init__(self, in_channels, out_channels, stride):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.stride = stride


class D2LastLevelMaxPool(nn.Module):
    num_levels = 1
    in_feature = "p5"

    def forward(self, x):
        return [torch.nn.functional.max_pool2d(x, 1, stride=2, padding=0)]


class D2ShapeSpec:
    def __init__(self, channels=None, stride=None):
        self.channels = channels
        self.stride = stride


class D2PatchEmbed(nn.Module):
    """ViTDet PatchEmbed: conv then NHWC permute."""

    def __init__(self, kernel_size=(16, 16), stride=(16, 16), padding=(0, 0),
                 in_chans=3, embed_dim=768):
        super().__init__()
        self.proj = nn.Conv2d(in_chans, embed_dim, kernel_size=kernel_size,
                              stride=stride, padding=padding)

    def forward(self, x):
        return self.proj(x).permute(0, 2, 3, 1)


def d2_window_partition(x, window_size):
    """ViTDet window partition with zero padding."""
    B, H, W, C = x.shape
    pad_h = (window_size - H % window_size) % window_size
    pad_w = (window_size - W % window_size) % window_size
    if pad_h > 0 or pad_w > 0:
        x = torch.nn.functional.pad(x, (0, 0, 0, pad_w, 0, pad_h))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.view(B, Hp // window_size, window_size, Wp // window_size,
               window_size, C)
    windows = (
        x.permute(0, 1, 3, 2, 4, 5).contiguous()
        .view(-1, window_size, window_size, C)
    )
    return windows, (Hp, Wp)


def d2_window_unpartition(windows, window_size, pad_hw, hw):
    Hp, Wp = pad_hw
    H, W = hw
    B = windows.shape[0] // (Hp * Wp // window_size // window_size)
    x = windows.view(B, Hp // window_size, Wp // window_size, window_size,
                     window_size, -1)
    x = x.permute(0, 1, 3, 2, 4, 5).contiguous().view(B, Hp, Wp, -1)
    if Hp > H or Wp > W:
        x = x[:, :H, :W, :].contiguous()
    return x


def d2_get_abs_pos(abs_pos, has_cls_token, hw):
    """ViTDet get_abs_pos: drop cls token, bicubic resize onto (h, w)."""
    h, w = hw
    if has_cls_token:
        abs_pos = abs_pos[:, 1:]
    xy_num = abs_pos.shape[1]
    size = int(math.sqrt(xy_num))
    assert size * size == xy_num
    if size != h or size != w:
        new_abs_pos = torch.nn.functional.interpolate(
            abs_pos.reshape(1, size, size, -1).permute(0, 3, 1, 2),
            size=(h, w), mode="bicubic", align_corners=False,
        )
        return new_abs_pos.permute(0, 2, 3, 1)
    return abs_pos.reshape(1, h, w, -1)


def _eva_rotate_half(x):
    """EVA rope pair rotation on interleaved pairs."""
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x[..., 0], x[..., 1]
    return torch.stack((-x2, x1), dim=-1).reshape(*x.shape[:-2], -1)


class EVAVisionRotaryEmbeddingFast(nn.Module):
    """EVA-02 VisionRotaryEmbeddingFast (2D axial rope, interleaved
    pairs, fine-tune grid rescaled onto the pretrain sequence length)."""

    def __init__(self, dim, pt_seq_len=16, ft_seq_len=None, theta=10000):
        super().__init__()
        freqs = 1.0 / (
            theta ** (torch.arange(0, dim, 2)[: dim // 2].float() / dim)
        )
        if ft_seq_len is None:
            ft_seq_len = pt_seq_len
        t = torch.arange(ft_seq_len).float() / ft_seq_len * pt_seq_len
        freqs = torch.einsum("i,j->ij", t, freqs)
        freqs = freqs.repeat_interleave(2, dim=-1)  # [ft, dim]
        fh = freqs[:, None, :].expand(ft_seq_len, ft_seq_len, freqs.shape[-1])
        fw = freqs[None, :, :].expand(ft_seq_len, ft_seq_len, freqs.shape[-1])
        full = torch.cat((fh, fw), dim=-1)  # [ft, ft, 2*dim]
        self.register_buffer("freqs_cos", full.cos().view(-1, 2 * dim))
        self.register_buffer("freqs_sin", full.sin().view(-1, 2 * dim))

    def forward(self, t):
        return t * self.freqs_cos + _eva_rotate_half(t) * self.freqs_sin


def load_vit():
    """Load the reference ViT/SimpleFeaturePyramidForViT file
    (models/backbones/vit.py) with its detectron2/EVA dependencies shimmed
    to their public upstream implementations.

    NOTE on the attention core: the file's Attention.forward is flash-attn
    + CUDA only (vit.py:118-124 asserts q.is_cuda), AND its Block.forward
    permutes q/k/v to [B, heads, N, hd] (vit.py:322-325) before a
    rearrange that hands flash-attn the HEAD axis as the sequence axis —
    dead code in the reference repo (ViT is commented out of
    backbones/__init__.py) that was never runnable as shipped.  Parity
    tests therefore patch Attention.forward with a CPU SDPA implementing
    the published ViTDet/EVA semantics (attend over tokens per head),
    which is also what this repo's models/vit.py implements."""
    install()
    fv = _module("fvcore")
    fvnn = _module("fvcore.nn")
    fvwi = _module("fvcore.nn.weight_init")
    fvwi.c2_msra_fill = lambda m: None
    fvnn.weight_init = fvwi
    fv.nn = fvnn

    d2 = _module("detectron2")
    d2l = _module("detectron2.layers")
    d2l.CNNBlockBase = D2CNNBlockBase
    d2l.Conv2d = D2Conv2d
    d2l.get_norm = d2_get_norm
    d2l.ShapeSpec = D2ShapeSpec
    d2.layers = d2l
    d2m = _module("detectron2.modeling")
    d2b = _module("detectron2.modeling.backbone")
    d2fpn = _module("detectron2.modeling.backbone.fpn")
    d2fpn._assert_strides_are_log2_contiguous = lambda strides: None
    d2fpn.LastLevelMaxPool = D2LastLevelMaxPool
    d2u = _module("detectron2.modeling.backbone.utils")
    d2u.PatchEmbed = D2PatchEmbed
    d2u.add_decomposed_rel_pos = _stub
    d2u.get_abs_pos = d2_get_abs_pos
    d2u.window_partition = d2_window_partition
    d2u.window_unpartition = d2_window_unpartition
    d2u.VisionRotaryEmbeddingFast = EVAVisionRotaryEmbeddingFast
    d2b.fpn = d2fpn
    d2b.utils = d2u
    d2m.backbone = d2b
    d2.modeling = d2m

    return _load_by_path("mmdet3d/models/backbones/vit.py")


def load_vovnet():
    """Load the reference VoVNet (models/backbones/vovnet.py) with its
    detectron2/fvcore dependencies shimmed (the V2-99 backbone of the
    larger RC configs; commented out of the registry in the reference,
    backbones/__init__.py:18)."""
    load_vit()  # installs the fvcore/detectron2 shim modules
    d2l = sys.modules["detectron2.layers"]
    d2l.FrozenBatchNorm2d = FrozenBatchNorm2d
    d2l.get_norm = d2_get_norm
    return _load_by_path("mmdet3d/models/backbones/vovnet.py")


# ------------------------------------------------- HoP BiTemporalPredictor
class SinePositionalEncoding(nn.Module):
    """Faithful mmcv SinePositionalEncoding (bricks/transformer/
    positional_encoding) — the HoP decoder's bev_pos (deterministic,
    parameter-free)."""

    def __init__(self, num_feats, temperature=10000, normalize=False,
                 scale=2 * math.pi, eps=1e-6, offset=0.0, init_cfg=None):
        super().__init__()
        self.num_feats = num_feats
        self.temperature = temperature
        self.normalize = normalize
        self.scale = scale
        self.eps = eps
        self.offset = offset

    def forward(self, mask):
        not_mask = 1 - mask.to(torch.int)
        y_embed = not_mask.cumsum(1, dtype=torch.float32)
        x_embed = not_mask.cumsum(2, dtype=torch.float32)
        if self.normalize:
            y_embed = (y_embed + self.offset) / (
                y_embed[:, -1:, :] + self.eps) * self.scale
            x_embed = (x_embed + self.offset) / (
                x_embed[:, :, -1:] + self.eps) * self.scale
        dim_t = torch.arange(self.num_feats, dtype=torch.float32)
        dim_t = self.temperature ** (
            2 * (torch.div(dim_t, 2, rounding_mode="floor")) / self.num_feats)
        pos_x = x_embed[:, :, :, None] / dim_t
        pos_y = y_embed[:, :, :, None] / dim_t
        b, h, w = mask.size()
        pos_x = torch.stack(
            (pos_x[:, :, :, 0::2].sin(), pos_x[:, :, :, 1::2].cos()),
            dim=4).view(b, h, w, -1)
        pos_y = torch.stack(
            (pos_y[:, :, :, 0::2].sin(), pos_y[:, :, :, 1::2].cos()),
            dim=4).view(b, h, w, -1)
        return torch.cat((pos_y, pos_x), dim=3).permute(0, 3, 1, 2)


def _msda_pytorch(value, value_spatial_shapes, sampling_locations,
                  attention_weights):
    """mmcv.ops.multi_scale_deform_attn.multi_scale_deformable_attn_pytorch,
    transcribed faithfully (grid_sample align_corners=False, zero pad)."""
    import torch.nn.functional as F

    bs, _, num_heads, embed_dims = value.shape
    _, num_queries, _, num_levels, num_points, _ = sampling_locations.shape
    value_list = value.split(
        [int(h_) * int(w_) for h_, w_ in value_spatial_shapes], dim=1)
    sampling_grids = 2 * sampling_locations - 1
    sampling_value_list = []
    for level, (h_, w_) in enumerate(value_spatial_shapes):
        value_l_ = value_list[level].flatten(2).transpose(1, 2).reshape(
            bs * num_heads, embed_dims, int(h_), int(w_))
        sampling_grid_l_ = sampling_grids[:, :, :, level].transpose(
            1, 2).flatten(0, 1)
        sampling_value_l_ = F.grid_sample(
            value_l_, sampling_grid_l_, mode="bilinear",
            padding_mode="zeros", align_corners=False)
        sampling_value_list.append(sampling_value_l_)
    attention_weights = attention_weights.transpose(1, 2).reshape(
        bs * num_heads, 1, num_queries, num_levels * num_points)
    output = (torch.stack(sampling_value_list, dim=-2).flatten(-2)
              * attention_weights).sum(-1).view(
                  bs, num_heads * embed_dims, num_queries)
    return output.transpose(1, 2).contiguous()


class TransformerLayerSequence(BaseModule):
    """mmcv.cnn.bricks.transformer.TransformerLayerSequence subset."""

    def __init__(self, transformerlayers=None, num_layers=None,
                 init_cfg=None):
        super().__init__(init_cfg)
        import copy as _copy

        reg = sys.modules["mmcv.cnn.bricks.registry"]
        bf = sys.modules["mmcv.utils"].build_from_cfg
        if isinstance(transformerlayers, dict):
            transformerlayers = [
                _copy.deepcopy(transformerlayers) for _ in range(num_layers)
            ]
        self.num_layers = num_layers
        self.layers = nn.ModuleList(
            bf(transformerlayers[i], reg.TRANSFORMER_LAYER)
            for i in range(num_layers)
        )
        self.embed_dims = self.layers[0].embed_dims
        self.pre_norm = self.layers[0].pre_norm


def load_temporal_backbone():
    """Load the REAL reference HoP stack: MyCustomBaseTransformerLayer +
    TemporalCrossAttention + BEVFormerLayer + TemporalDecoder +
    BiTemporalPredictor (temporal_backbone.py:56-336), with the mmcv
    transformer scaffolding shimmed faithfully (SinePositionalEncoding,
    FFN, TransformerLayerSequence, pytorch deform-attn core)."""
    install()
    mmcv = sys.modules["mmcv"]
    cnn = sys.modules["mmcv.cnn"]
    transformer = sys.modules["mmcv.cnn.bricks.transformer"]
    registry = sys.modules["mmcv.cnn.bricks.registry"]
    for rname in ("TRANSFORMER_LAYER", "TRANSFORMER_LAYER_SEQUENCE",
                  "POSITIONAL_ENCODING", "FEEDFORWARD_NETWORK"):
        if not hasattr(registry, rname):
            setattr(registry, rname, Registry(rname))

    def build_from_cfg(cfg, reg, default_args=None):
        cfg = dict(cfg)
        for k, v in (default_args or {}).items():
            cfg.setdefault(k, v)
        t = cfg.pop("type")
        cls = reg.get(t) if not isinstance(t, type) else t
        return cls(**cfg)

    class ConfigDict(dict):
        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

    def deprecated_api_warning(*da, **dk):
        def deco(fn):
            return fn
        return deco

    mmcv.ConfigDict = ConfigDict
    mmcv.deprecated_api_warning = deprecated_api_warning
    mu = _module("mmcv.utils")
    mu.ConfigDict = ConfigDict
    mu.build_from_cfg = build_from_cfg
    mu.deprecated_api_warning = deprecated_api_warning
    mu.to_2tuple = to_2tuple
    mu.TORCH_VERSION = torch.__version__
    mu.digit_version = lambda v: tuple(
        int(x) for x in str(v).split("+")[0].split(".")[:3] if x.isdigit()
    )

    class _Ext:
        def __getattr__(self, k):
            raise RuntimeError("CUDA ext unavailable on the CPU oracle")

    mu.ext_loader = types.SimpleNamespace(load_ext=lambda *a, **k: _Ext())
    mmcv.utils = mu
    cnn.Linear = nn.Linear
    cnn.build_activation_layer = (
        lambda cfg: {"ReLU": nn.ReLU, "GELU": nn.GELU}[dict(cfg)["type"]]()
    )
    transformer.TransformerLayerSequence = TransformerLayerSequence
    transformer.build_transformer_layer_sequence = lambda cfg: build_from_cfg(
        cfg, registry.TRANSFORMER_LAYER_SEQUENCE)
    transformer.build_attention = lambda cfg: build_from_cfg(
        cfg, registry.ATTENTION)

    def build_feedforward_network(cfg, default_args=None):
        cfg = dict(cfg)
        cfg.pop("type", None)
        for k, v in (default_args or {}).items():
            cfg.setdefault(k, v)
        return FFN(**cfg)

    transformer.build_feedforward_network = build_feedforward_network
    transformer.build_positional_encoding = lambda cfg: build_from_cfg(
        cfg, registry.POSITIONAL_ENCODING)
    drop_mod = _module("mmcv.cnn.bricks.drop")
    drop_mod.build_dropout = transformer.build_dropout
    registry.POSITIONAL_ENCODING.register_module(
        module=SinePositionalEncoding)
    registry.FEEDFORWARD_NETWORK.register_module(module=FFN)

    ops = sys.modules.get("mmcv.ops") or _module("mmcv.ops")
    msda_mod = _module("mmcv.ops.multi_scale_deform_attn")
    msda_mod.multi_scale_deformable_attn_pytorch = _msda_pytorch
    msda_mod.MultiScaleDeformableAttention = type(
        "MultiScaleDeformableAttention", (nn.Module,), {})
    ops.multi_scale_deform_attn = msda_mod
    sys.modules["mmcv"].ops = ops

    # the fp32 CUDA Function is referenced but never reached on CPU
    fn_mod = _module(
        "mmdet3d.models.model_utils.multi_scale_deformable_attn_function")
    fn_mod.MultiScaleDeformableAttnFunction_fp32 = _stub
    fn_mod.MultiScaleDeformableAttnFunction = _stub

    _load_by_path(
        "mmdet3d/models/model_utils/custom_base_transformer_layer.py")
    _load_by_path("mmdet3d/models/model_utils/temporal_cross_attention.py")
    _load_by_path("mmdet3d/models/model_utils/encoder.py")
    return _load_by_path("mmdet3d/models/backbones/temporal_backbone.py")
