from .norms import approximate_gelu, l2_normalize_channel, layer_norm, rms_norm
from .rope import apply_rope, build_rope_tables
from .patchify import patchify, unpatchify
from .attention import attention, default_impl, sdpa_bnsd, sdpa_xla

__all__ = [
    "approximate_gelu", "l2_normalize_channel", "layer_norm", "rms_norm",
    "apply_rope", "build_rope_tables", "patchify", "unpatchify",
    "attention", "default_impl", "sdpa_bnsd", "sdpa_xla",
]
