"""Jitted training steps: GAN solver and captioning trainer."""
