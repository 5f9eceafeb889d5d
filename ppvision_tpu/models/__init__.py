"""Flax model zoo: StarGAN-v2 stack, FAN hourglass, captioner, RAFT."""

from .stargan import (  # noqa: F401
    Discriminator,
    Generator,
    MappingNetwork,
    StyleEncoder,
    build_gan_models,
)
