"""ppvision_tpu — TPU-native privacy-preserving vision framework.

A ground-up JAX / XLA / Pallas re-design of the capabilities of
carlosh93/privacy-preserving-vision (learned-optics privacy cameras,
face de-identification GANs, privacy-preserving image captioning),
built TPU-first:

- ``optics``   — differentiable wave-optics camera core (Zernike phase
  masks, scaled-FFT and Fresnel propagators, FFT image formation).
- ``models``   — Flax model zoo: StarGAN-v2 generator stack, FAN
  hourglass heatmap net, ResNet-101 encoder, attention-LSTM captioner,
  RAFT optical flow.
- ``ops``      — TPU compute ops incl. Pallas kernels.
- ``train``    — jitted training steps (GAN solver, captioning).
- ``parallel`` — device-mesh sharding (DP over ICI via shard_map/pjit).
- ``data``     — input pipelines (CelebA-style folders, COCO captions).
- ``metrics``  — FID, LPIPS, PSNR/SSIM, BLEU/METEOR/ROUGE/CIDEr.
- ``utils``    — checkpointing (orbax), logging, config.
"""

__version__ = "0.1.0"
