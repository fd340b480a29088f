"""Weight IO: safetensors loading, hash detection, torch-key converters."""
