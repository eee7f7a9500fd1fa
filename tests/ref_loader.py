"""Load the PyTorch reference core from /root/reference as a test oracle.

Only the pyro-free modules (common/camera/cost_fun/levenberg_marquardt) are
loadable in this image. Tests that need them must skip when the reference
checkout or torch is unavailable.
"""

import importlib.util
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
