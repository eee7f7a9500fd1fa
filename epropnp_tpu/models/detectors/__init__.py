from .epropnp_det import EProPnPDet  # noqa: F401
