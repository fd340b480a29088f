"""Training: losses, train step, trainer loop, datasets, checkpoints."""
