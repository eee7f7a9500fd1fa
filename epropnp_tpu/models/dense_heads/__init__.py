from .fcos_emb_head import FCOSEmbHead  # noqa: F401
