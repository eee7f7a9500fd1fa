"""Load the PyTorch reference core from /root/reference as a test oracle.

``load_reference_pnp`` loads the pyro-free modules
(common/camera/cost_fun/levenberg_marquardt). ``load_reference_epropnp``
additionally installs a minimal pyro shim (torch-only
``MultivariateStudentT`` + base-class aliases) so the full probabilistic
layer (distributions/epropnp, reference epropnp/epropnp.py:87-196) is
loadable as an oracle without pyro. Tests that need them must skip when
the reference checkout or torch is unavailable.
"""

import importlib.util
import math
import os
import sys
import types

REF_DIR = "/root/reference/epropnp"
_MODULES = ["common", "camera", "cost_fun", "levenberg_marquardt"]


def load_reference_pnp():
    """Return the synthetic ``refpnp`` package, or None if unavailable."""
    if "refpnp" in sys.modules:
        return sys.modules["refpnp"]
    if not os.path.isdir(REF_DIR):
        return None
    try:
        import torch  # noqa: F401
    except ImportError:
        return None
    pkg = types.ModuleType("refpnp")
    pkg.__path__ = [REF_DIR]
    sys.modules["refpnp"] = pkg
    for name in _MODULES:
        spec = importlib.util.spec_from_file_location(
            f"refpnp.{name}", os.path.join(REF_DIR, name + ".py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refpnp.{name}"] = mod
        spec.loader.exec_module(mod)
        setattr(pkg, name, mod)
    return pkg


def _install_pyro_shim():
    """Register a minimal ``pyro.distributions`` built on plain torch.

    Covers exactly the surface the reference core touches:
    ``TorchDistribution`` (= torch Distribution), ``constraints``,
    ``broadcast_shape`` and ``MultivariateStudentT(df, loc, scale_tril)``
    with ``.sample``/``.log_prob`` (reference epropnp/epropnp.py:10,224,
    distributions.py:11-12).
    """
    if "pyro" in sys.modules:
        return
    import torch

    class MultivariateStudentT:
        def __init__(self, df, loc, scale_tril):
            self.df = df
            self.loc = loc
            self.scale_tril = scale_tril

        def sample(self, sample_shape=()):
            with torch.no_grad():
                shape = tuple(sample_shape) + tuple(
                    torch.broadcast_shapes(self.loc.shape[:-1],
                                           self.scale_tril.shape[:-2])
                ) + self.loc.shape[-1:]
                z = torch.randn(shape, dtype=self.loc.dtype,
                                device=self.loc.device)
                chi2 = torch.distributions.Chi2(
                    torch.tensor(float(self.df), dtype=self.loc.dtype))
                w = chi2.sample(shape[:-1]) / self.df
                return self.loc + (self.scale_tril @ z.unsqueeze(-1)
                                   ).squeeze(-1) / w.sqrt().unsqueeze(-1)

        def log_prob(self, value):
            p = value.shape[-1]
            df = float(self.df)
            diff = (value - self.loc).unsqueeze(-1)
            sol = torch.linalg.solve_triangular(
                torch.broadcast_to(
                    self.scale_tril,
                    torch.broadcast_shapes(
                        self.scale_tril.shape, diff.shape[:-2] + (p, p))),
                diff, upper=False)
            maha = sol.squeeze(-1).pow(2).sum(-1)
            half_log_det = self.scale_tril.diagonal(
                dim1=-2, dim2=-1).log().sum(-1)
            return (math.lgamma(0.5 * (df + p)) - math.lgamma(0.5 * df)
                    - 0.5 * p * math.log(df * math.pi) - half_log_det
                    - 0.5 * (df + p) * torch.log1p(maha / df))

    pyro = types.ModuleType("pyro")
    dist = types.ModuleType("pyro.distributions")
    util = types.ModuleType("pyro.distributions.util")
    dist.TorchDistribution = torch.distributions.Distribution
    dist.constraints = torch.distributions.constraints
    dist.MultivariateStudentT = MultivariateStudentT
    util.broadcast_shape = lambda *shapes: torch.broadcast_shapes(*shapes)
    dist.util = util
    pyro.distributions = dist
    sys.modules["pyro"] = pyro
    sys.modules["pyro.distributions"] = dist
    sys.modules["pyro.distributions.util"] = util


def load_reference_epropnp():
    """Full reference core incl. the probabilistic layer, or None.

    Returns the ``refpnp`` package extended with ``distributions`` and
    ``epropnp`` modules (loaded under the pyro shim).
    """
    pkg = load_reference_pnp()
    if pkg is None:
        return None
    if hasattr(pkg, "epropnp"):
        return pkg
    try:
        import pyro  # noqa: F401  (real pyro wins if present)
    except ImportError:
        _install_pyro_shim()
    for name in ["distributions", "epropnp"]:
        spec = importlib.util.spec_from_file_location(
            f"refpnp.{name}", os.path.join(REF_DIR, name + ".py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refpnp.{name}"] = mod
        spec.loader.exec_module(mod)
        setattr(pkg, name, mod)
    return pkg


def _install_mmcv_shim():
    """Register a minimal ``mmcv.cnn`` built on plain torch.

    Covers exactly the surface deformable_attention_sampler.py imports:
    ``xavier_init``, ``build_norm_layer``, ``build_feedforward_network``
    (mmcv FFN: Sequential(Sequential(Linear, act, drop) x (num_fcs-1),
    Linear, drop) with a residual identity) and the ``ATTENTION``
    registry decorator.
    """
    if "mmcv" in sys.modules:
        return
    import torch

    class FFN(torch.nn.Module):
        def __init__(self, embed_dims=256, feedforward_channels=1024,
                     num_fcs=2, ffn_drop=0.0, **kwargs):
            super().__init__()
            layers, in_c = [], embed_dims
            for _ in range(num_fcs - 1):
                layers.append(torch.nn.Sequential(
                    torch.nn.Linear(in_c, feedforward_channels),
                    torch.nn.ReLU(inplace=True),
                    torch.nn.Dropout(ffn_drop)))
                in_c = feedforward_channels
            layers.append(torch.nn.Linear(in_c, embed_dims))
            layers.append(torch.nn.Dropout(ffn_drop))
            self.layers = torch.nn.Sequential(*layers)

        def forward(self, x, identity=None):
            out = self.layers(x)
            return (x if identity is None else identity) + out

    def build_feedforward_network(cfg, default_args=None):
        cfg = dict(cfg)
        cfg.pop("type", None)
        return FFN(**cfg)

    def build_norm_layer(cfg, num_features):
        assert cfg.get("type", "LN") == "LN"
        return "ln", torch.nn.LayerNorm(num_features)

    def xavier_init(module, gain=1, bias=0, distribution="normal"):
        pass  # tests randomize weights afterwards

    class _Registry:
        def register_module(self, *a, **k):
            return lambda cls: cls

    mmcv = types.ModuleType("mmcv")
    cnn = types.ModuleType("mmcv.cnn")
    bricks = types.ModuleType("mmcv.cnn.bricks")
    transformer = types.ModuleType("mmcv.cnn.bricks.transformer")
    registry = types.ModuleType("mmcv.cnn.bricks.registry")
    cnn.xavier_init = xavier_init
    cnn.build_norm_layer = build_norm_layer
    transformer.build_feedforward_network = build_feedforward_network
    transformer.FFN = FFN
    registry.ATTENTION = _Registry()
    cnn.bricks = bricks
    bricks.transformer = transformer
    bricks.registry = registry
    mmcv.cnn = cnn
    for name, mod in (("mmcv", mmcv), ("mmcv.cnn", cnn),
                      ("mmcv.cnn.bricks", bricks),
                      ("mmcv.cnn.bricks.transformer", transformer),
                      ("mmcv.cnn.bricks.registry", registry)):
        sys.modules[name] = mod


def load_reference_det_sampler():
    """Load the reference DeformableAttentionSampler (pure torch under the
    mmcv shim) as a functional oracle, or None if unavailable."""
    key = "refdet_attention_sampler"
    if key in sys.modules:
        return sys.modules[key]
    path = ("/root/reference/EPro-PnP-Det/epropnp_det/ops/"
            "deformable_attention_sampler.py")
    if not os.path.isfile(path):
        return None
    try:
        import torch  # noqa: F401
    except ImportError:
        return None
    try:
        import mmcv.cnn  # noqa: F401  (real mmcv wins if present)
    except ImportError:
        _install_mmcv_shim()
    spec = importlib.util.spec_from_file_location(key, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[key] = mod
    spec.loader.exec_module(mod)
    return mod


DET_OPS_DIR = "/root/reference/EPro-PnP-Det/epropnp_det/ops"


def load_reference_det_op(name):
    """Load a standalone pure-torch Det-suite op module as an oracle.

    Works for the mmcv-free files (``group_linear``, ``inter_roi_ops``,
    reference EPro-PnP-Det/epropnp_det/ops/{group_linear,inter_roi_ops}.py);
    returns None when the checkout or torch is unavailable.
    """
    key = f"refdetops_{name}"
    if key in sys.modules:
        return sys.modules[key]
    path = os.path.join(DET_OPS_DIR, name + ".py")
    if not os.path.isfile(path):
        return None
    try:
        import torch  # noqa: F401
    except ImportError:
        return None
    spec = importlib.util.spec_from_file_location(key, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[key] = mod
    spec.loader.exec_module(mod)
    return mod
