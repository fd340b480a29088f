"""Model zoo: DiT, VAE, Qwen2.5-VL, DINOv2, adapters, controlnet."""
